package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is an operator from SURVEY §2's inventory
  * (or a north-star extension), expressed Spark-first. Each key with a
  * DuckDB-expressible equivalent has a matching `oracleSql` entry whose
  * output columns/values hash-match the Spark result (decimal-exact
  * aggregation, string-formatted timestamps, deterministic ORDER BY —
  * see graft.functions.Deterministic).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ReportJob.run(Tables.events(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference-surface parity (SURVEY §2.1-§2.5) ---
    "q_report_agg" -> ((s, d) => ReportJob.run(Tables.events(s, d))),
    "q_late_split" -> ((s, d) =>
      ReportJob.lateSplit(ReportJob.parse(ReportJob.eventsAsAuditLog(Tables.events(s, d))))),
    "q_clean_enrich" -> ((s, d) => CleanJob.run(s, Tables.events(s, d))),
    "q_clean_json" -> ((s, d) => CleanJob.runJson(s, Tables.events(s, d))),
  )

  def oracleSql: Map[String, String] = Map(
    "q_report_agg" ->
      """WITH parsed AS (
        |  SELECT date_trunc('second', ts) AS ts, event_type AS type,
        |         'AREA_' || CAST(user_id % 5 AS VARCHAR) AS area
        |  FROM events
        |)
        |SELECT strftime(time_bucket(INTERVAL '30 seconds', ts), '%Y-%m-%d %H:%M:%S') AS wstart,
        |       type, area, count(*) AS cnt,
        |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS time
        |FROM parsed GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_late_split" ->
      """WITH parsed AS (
        |  SELECT date_trunc('second', ts) AS ts, event_type AS type,
        |         'AREA_' || CAST(user_id % 5 AS VARCHAR) AS area
        |  FROM events
        |), wm AS (
        |  SELECT to_timestamp(CAST(floor(epoch(max(ts))) AS BIGINT) - 40) AT TIME ZONE 'UTC' AS wm FROM parsed
        |)
        |SELECT CASE WHEN ts < wm THEN 'late' ELSE 'ontime' END AS tag,
        |       type, area, count(*) AS cnt
        |FROM parsed, wm GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_clean_enrich" ->
      """WITH src AS (
        |  SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') AS dt,
        |         ['US','TW','HK','PK','KW','SA','IN','JP'][CAST(user_id % 8 + 1 AS INT)] AS countryCode,
        |         event_id, value
        |  FROM events
        |), exploded AS (
        |  SELECT dt, countryCode,
        |         's' || CAST(event_id % 5 + 1 AS VARCHAR) AS type,
        |         value AS score,
        |         ['A','A+','B','C','D'][CAST(event_id % 5 + 1 AS INT)] AS level
        |  FROM src
        |  UNION ALL
        |  SELECT dt, countryCode,
        |         's' || CAST((event_id + 1) % 5 + 1 AS VARCHAR) AS type,
        |         value * 0.5 AS score,
        |         ['A','A+','B','C','D'][CAST((event_id + 1) % 5 + 1 AS INT)] AS level
        |  FROM src
        |)
        |SELECT dt, countryCode, type, score, level,
        |       CASE WHEN countryCode = 'US' THEN 'AREA_US'
        |            WHEN countryCode IN ('TW','HK') THEN 'AREA_CT'
        |            WHEN countryCode IN ('PK','KW','SA') THEN 'AREA_AR'
        |            WHEN countryCode = 'IN' THEN 'AREA_IN'
        |            ELSE 'other' END AS area
        |FROM exploded ORDER BY dt, countryCode, type, score""".stripMargin,
  )
}
