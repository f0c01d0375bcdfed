package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch form of the reference's DataClean job (streaming ETL): JSON
  * line -> parse -> explode nested `data` array -> enrich each element
  * with the country->area dimension -> JSON out.
  *
  * Reference semantics reproduced (citations into /root/reference):
  *  - input shape {dt, countryCode, data:[{type,score,level}]}:
  *    DataClean.java:65, kafkaProducer.java:34 (P1).
  *  - 1->N flatten injecting parent fields: DataClean.java:83-90 (P2) —
  *    expressed as Catalyst `explode`, not a UDTF.
  *  - dim lookup with default: DataClean.java:81 vs
  *    DataCleanScala.scala:68 — we adopt the Scala `"other"` default
  *    (safer semantics, SURVEY §2.2 P10) via left join + coalesce.
  *  - the dim fixture (Redis hash `areas`, MyRedisSource.java:16-19)
  *    inverted area->csv-of-codes into (code, area) rows:
  *    MyRedisSource.java:44-51 (P9) — done relationally with
  *    split + explode.
  *  - JSON serialize per output element: DataClean.java:87-89 (P3).
  *
  * Scale notes: the dim is tiny and explicitly `broadcast()` — the
  * enrichment join is a broadcast hash join with NO shuffle of the fact
  * stream, exactly the reference's broadcast-dim topology
  * (DataClean.java:69) and the right plan at 100 TB. The explode is
  * pipelined inside whole-stage codegen; no state, no skew concern.
  */
object CleanJob {

  val cleanSchema: StructType = StructType(Seq(
    StructField("dt", StringType),
    StructField("countryCode", StringType),
    StructField("data", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("score", DoubleType),
      StructField("level", StringType)))))))

  /** The Redis `areas` hash fixture, as stored: area -> csv of country
    * codes (MyRedisSource.java:16-19). */
  val areasFixture: Seq[(String, String)] = Seq(
    "AREA_US" -> "US",
    "AREA_CT" -> "TW,HK",
    "AREA_AR" -> "PK,KW,SA",
    "AREA_IN" -> "IN")

  /** Invert area->"cc,cc" into (countryCode, area) rows — the
    * MyRedisSource.java:44-51 inversion, relationally. */
  def dimTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    areasFixture.toDF("area", "codes")
      .select(explode(split(col("codes"), ",")).as("countryCode"), col("area"))
  }

  /** Country-code pool: the 7 generator codes (kafkaProducer.java:49)
    * plus one code absent from the dim to exercise the "other" path. */
  private val codes = Seq("US", "TW", "HK", "PK", "KW", "SA", "IN", "JP")
  private val levels = Seq("A", "A+", "B", "C", "D")

  /** Render the harness `events` table as DataClean input JSON lines
    * (FIXTURES.md A1): deterministic countryCode/type/score/level pools
    * driven by event columns, two-element `data` array like the
    * generator's. */
  def eventsAsCleanInput(events: DataFrame): DataFrame = {
    val codeArr = array(codes.map(lit): _*)
    val levelArr = array(levels.map(lit): _*)
    events.select(to_json(struct(
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("dt"),
      element_at(codeArr, (col("user_id") % 8 + 1).cast(IntegerType)).as("countryCode"),
      array(
        struct(
          concat(lit("s"), col("event_id") % 5 + 1).as("type"),
          col("value").as("score"),
          element_at(levelArr, (col("event_id") % 5 + 1).cast(IntegerType)).as("level")),
        struct(
          concat(lit("s"), (col("event_id") + 1) % 5 + 1).as("type"),
          (col("value") * 0.5).as("score"),
          element_at(levelArr, ((col("event_id") + 1) % 5 + 1).cast(IntegerType)).as("level"))
      ).as("data"))).as("line"))
  }

  /** Parse -> explode -> broadcast-dim enrich with "other" default.
    * Output one row per `data` element: (dt, countryCode, type, score,
    * level, area). */
  def enrich(lines: DataFrame, dim: DataFrame): DataFrame =
    lines
      .select(from_json(col("line"), cleanSchema).as("j"))
      .select(col("j.dt").as("dt"), col("j.countryCode").as("countryCode"),
        explode(col("j.data")).as("d"))
      .join(broadcast(dim), Seq("countryCode"), "left")
      .select(
        col("dt"), col("countryCode"),
        col("d.type").as("type"), col("d.score").as("score"),
        col("d.level").as("level"),
        coalesce(col("area"), lit("other")).as("area"))

  /** Full batch pipeline over the events table (column output). */
  def run(spark: SparkSession, events: DataFrame): DataFrame =
    enrich(eventsAsCleanInput(events), dimTable(spark))
      .orderBy(col("dt"), col("countryCode"), col("type"), col("score"))

  /** JSON-string output form, the reference's sink payload key set
    * {type,score,level,area,dt} (DataClean.java:87-89). The score is
    * canonicalized to a fixed 6-decimal rendering (floor(x*1e6+0.5)
    * then %.6f — the library's standard cross-engine fixed-point
    * formula) so the payload is bit-identical across engines and the
    * DuckDB oracle hash-checks it; raw double-to-shortest-string
    * rendering is engine-specific and was the one reason this query
    * sat outside the oracle gate. */
  def runJson(spark: SparkSession, events: DataFrame): DataFrame =
    enrich(eventsAsCleanInput(events), dimTable(spark))
      .select(to_json(struct(
        col("type"),
        format_string("%.6f", floor(col("score") * 1e6 + lit(0.5)) / 1e6).as("score"),
        col("level"), col("area"), col("dt"))).as("value"))
      .orderBy(col("value"))
}
