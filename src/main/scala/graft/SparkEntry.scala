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
    // --- relational fill-out (SURVEY §7 Phase 1.3) ---
    "q1_pricing" -> (Relational.q1Pricing _),
    "q6_revenue" -> (Relational.q6Revenue _),
    "q3_top_orders" -> (Relational.q3TopOrders _),
    "q5_region_revenue" -> (Relational.q5RegionRevenue _),
    "q_semi_join" -> (Relational.qSemiJoin _),
    "q_anti_join" -> (Relational.qAntiJoin _),
    "q_window_topn" -> (Relational.qWindowTopN _),
    "q_running_total" -> (Relational.qRunningTotal _),
    "q_rollup" -> (Relational.qRollup _),
    "q_cube" -> (Relational.qCube _),
    "q_setops" -> (Relational.qSetOps _),
    "q_distinct_agg" -> (Relational.qDistinctAgg _),
    "q_approx_distinct" -> (Relational.qApproxDistinct _),
    "q_scalar_funcs" -> (Relational.qScalarFuncs _),
    "q_date_funcs" -> (Relational.qDateFuncs _),
    "q_json_props" -> (Relational.qJsonProps _),
    "q_higher_order" -> (Relational.qHigherOrder _),
    "q_case_agg" -> (Relational.qCaseAgg _),
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
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST((l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / count(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q6_revenue" ->
      """SELECT CAST(sum(CAST((l_extendedprice * l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q3_top_orders" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_odate,
        |  CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2 ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_semi_join" ->
      """SELECT o_orderpriority, count(*) AS cnt FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_anti_join" ->
      """SELECT c_mktsegment, count(*) AS cnt FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_window_topn" ->
      """SELECT p_brand, p_partkey, p_retailprice, rn FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |         row_number() OVER (PARTITION BY p_brand
        |                            ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part) t
        |WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin,
    "q_running_total" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_odate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name) ORDER BY 1, 2""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY 1, 2""".stripMargin,
    "q_setops" ->
      """SELECT * FROM (
        |  SELECT 'click_not_error' AS tag, user_id FROM (
        |    SELECT user_id FROM events WHERE event_type = 'click'
        |    EXCEPT SELECT user_id FROM events WHERE event_type = 'error')
        |  UNION ALL
        |  SELECT 'click_and_purchase' AS tag, user_id FROM (
        |    SELECT user_id FROM events WHERE event_type = 'click'
        |    INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase')
        |  UNION ALL
        |  SELECT 'signup_or_error' AS tag, user_id FROM (
        |    SELECT user_id FROM events WHERE event_type = 'signup'
        |    UNION SELECT user_id FROM events WHERE event_type = 'error')
        |) ORDER BY tag, user_id""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_parts,
        |  count(DISTINCT l_suppkey) AS nd_supps, count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_scalar_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u, lower(p_type) AS type_l,
        |  substr(p_name, 1, 8) AS name8, CAST(length(p_name) AS BIGINT) AS name_len,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  regexp_replace(p_type, '[aeiou]', '', 'g') AS type_novowel,
        |  CAST(p_size % 7 AS BIGINT) AS size_mod,
        |  abs(p_retailprice - 950.0) AS price_dev,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
        |  round(p_retailprice / 7, 2) AS price_div_round,
        |  sqrt(p_retailprice) AS price_sqrt
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  strftime(o_orderdate, '%Y-%m-%d') AS odate,
        |  CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS BIGINT) AS days_to_2002
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_json_props" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_higher_order" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        |  sqrt(CAST((SELECT sum(CAST(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE) AS DECIMAL(38,12)))
        |             FROM unnest(embedding) AS u(x)) AS DOUBLE)) AS l2
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_case_agg" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
        |  CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        |  count(*) AS cnt
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
