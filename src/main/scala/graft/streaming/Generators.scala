package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Deterministic synthetic generators for the two reference input
  * streams (SURVEY §2.1 S3/S4) — value pools lifted from the
  * generators' source:
  *  - DataClean input: kafkaProducer.java:33-71 (countryCode pool :49,
  *    type s1..s5 :57, score pool :64, level pool :71, 2-element data
  *    array :34)
  *  - DataReport input: kafkaProducerDataReport.java:37-69 (type pool
  *    :61 — including the reference's literal "chlid_shelf" typo —
  *    username pool :69, area pool :53)
  * The reference draws randomly and formats `dt` with the buggy
  * week-year pattern ("YYYY", kafkaProducer.java:44); here selection is
  * a deterministic function of the row id (reproducible fixtures) and
  * the year pattern is the intended "yyyy".
  *
  * Streaming form rides the `rate` source (one row per tick); batch
  * form uses spark.range — both produce identical line shapes, so
  * fixtures and pipelines compose either way.
  */
object Generators {

  val countryCodes: Seq[String] = Seq("US", "TW", "HK", "PK", "KW", "SA", "IN")
  val types: Seq[String] = Seq("s1", "s2", "s3", "s4", "s5")
  val scores: Seq[Double] = Seq(0.3, 0.2, 0.1, 0.5, 0.8)
  val levels: Seq[String] = Seq("A", "A+", "B", "C", "D")
  val auditTypes: Seq[String] =
    Seq("shelf", "unshelf", "black", "chlid_shelf", "child_unshelf")
  val usernames: Seq[String] = (1 to 5).map(i => s"shenhe$i")
  val areas: Seq[String] =
    Seq("AREA_US", "AREA_CT", "AREA_AR", "AREA_IN", "AREA_ID")

  private def pick(pool: Seq[_], id: Column, offset: Int = 0): Column =
    element_at(array(pool.map(v => lit(v)): _*),
      ((id + offset) % pool.size + 1).cast(IntegerType))

  /** One DataClean JSON line per (id, ts). */
  def cleanLine(id: Column, ts: Column): Column =
    to_json(struct(
      date_format(ts, "yyyy-MM-dd HH:mm:ss").as("dt"),
      pick(countryCodes, id).as("countryCode"),
      array(
        struct(pick(types, id).as("type"), pick(scores, id).as("score"),
          pick(levels, id).as("level")),
        struct(pick(types, id, 1).as("type"), pick(scores, id, 1).as("score"),
          pick(levels, id, 1).as("level"))).as("data")))

  /** One DataReport (audit log) JSON line per (id, ts). */
  def auditLine(id: Column, ts: Column): Column =
    to_json(struct(
      date_format(ts, "yyyy-MM-dd HH:mm:ss").as("dt"),
      pick(auditTypes, id).as("type"),
      pick(usernames, id).as("username"),
      pick(areas, id, 2).as("area")))

  /** Streaming generator on the rate source (S3 analog: the reference
    * emits one message per 2 s; rowsPerSecond controls the analog). */
  def cleanInputStream(spark: SparkSession, rowsPerSecond: Int = 1): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(cleanLine(col("value"), col("timestamp")).as("line"))

  /** Streaming generator on the rate source (S4 analog). */
  def auditLogStream(spark: SparkSession, rowsPerSecond: Int = 1): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(auditLine(col("value"), col("timestamp")).as("line"))

  /** Deterministic batch fixtures: n lines, 1-second spacing from a
    * fixed epoch. */
  def cleanInputBatch(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(cleanLine(col("id"),
      timestamp_seconds(lit(1514800000L) + col("id"))).as("line"))

  def auditLogBatch(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(auditLine(col("id"),
      timestamp_seconds(lit(1514800000L) + col("id"))).as("line"))
}
