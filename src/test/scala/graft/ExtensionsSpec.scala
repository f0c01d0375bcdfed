package graft

import org.apache.spark.sql.functions._

/** Custom expressions exposed on the SQL surface via function
  * registration, plus streaming dedup with watermark (the
  * exactly-once-on-read pattern from SURVEY §2.5 K1 notes). */
class ExtensionsSpec extends SparkSpec {

  test("float_dot / float_dot_fixed callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT float_dot(a, b) AS d, float_dot_fixed(a, b) AS dx FROM (
        |  SELECT array(1.0f, 2.0f, 3.0f) AS a, array(4.0f, 5.0f, 6.0f) AS b)""".stripMargin)
      .collect().head
    assert(math.abs(r.getAs[Double]("d") - 32.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("dx") - 32.0) < 1e-9)
  }

  test("simhash_agg callable from SQL and equals the DataFrame-side signature") {
    GraftExtensions.register(spark)
    val d = "/root/testdata/sf0.001"
    Tables.documents(spark, d).createOrReplaceTempView("ext_docs")
    val sql = spark.sql(
      """SELECT doc_id, simhash_agg(xxhash64(tok), 1L) AS sh FROM (
        |  SELECT doc_id, explode(split(trim(lower(text)), '\\s+')) AS tok
        |  FROM ext_docs)
        |GROUP BY doc_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val df = graft.operators.Dedup.simhashSignatures(Tables.documents(spark, d))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sql == df && sql.nonEmpty)
  }

  test("srp_bands callable from SQL and equals the DataFrame-side signature") {
    GraftExtensions.register(spark)
    val d = "/root/testdata/sf0.001"
    Tables.embeddings(spark, d).createOrReplaceTempView("ext_embs")
    val sql = spark.sql(
      "SELECT vec_id, srp_bands(embedding) AS bands FROM ext_embs")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    import graft.functions.expressions.SrpBands.srp_bands
    val df = Tables.embeddings(spark, d)
      .select(col("vec_id"), srp_bands(col("embedding")).as("bands"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(sql == df && sql.nonEmpty)
  }

  test("streaming dropDuplicates with watermark dedups replayed keys") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import scala.collection.mutable.ArrayBuffer
    val input = MemoryStream[(Long, String)]
    val got = ArrayBuffer[Long]()
    val q = input.toDF()
      .select(col("_1").as("id"),
        to_timestamp(col("_2"), "yyyy-MM-dd HH:mm:ss").as("ts"))
      .withWatermark("ts", "1 minute")
      .dropDuplicates("id")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= df.collect().map(_.getAs[Long]("id")) }
        ()
      }.start()
    input.addData((1L, "2018-01-01 10:00:00"), (2L, "2018-01-01 10:00:01"))
    q.processAllAvailable()
    // replay of id=1 (an at-least-once delivery duplicate) is dropped
    input.addData((1L, "2018-01-01 10:00:02"), (3L, "2018-01-01 10:00:03"))
    q.processAllAvailable()
    q.stop()
    assert(got.sorted.toSeq == Seq(1L, 2L, 3L))
  }
}
