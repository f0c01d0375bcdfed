package graft

import java.nio.file.{Files, Paths}

import graft.operators.CleanJob
import graft.streaming.{CleanPipeline, ReportPipeline}
import graft.operators.ReportJob

/** File-source -> pipeline -> file-sink end to end (S1/K1 stand-ins),
  * plus the RocksDB state store (R3) behind the windowed aggregation. */
class FileStreamingSpec extends SparkSpec {

  test("text-dir source through enrichment into exactly-once parquet sink") {
    val in = Files.createTempDirectory("graft-in").toString
    val out = Files.createTempDirectory("graft-out").toString
    val ckpt = Files.createTempDirectory("graft-ck").toString
    Files.writeString(Paths.get(in, "batch1.json"),
      """{"dt":"2018-01-01 10:11:11","countryCode":"US","data":[{"type":"s1","score":0.3,"level":"A"}]}
        |{"dt":"2018-01-01 10:11:12","countryCode":"XX","data":[{"type":"s2","score":0.2,"level":"B"}]}
        |""".stripMargin)
    val q = CleanPipeline.startToParquet(
      CleanPipeline.fromTextDir(spark, in), CleanJob.dimTable(spark), out, ckpt)
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getAs[String]("countryCode"), r.getAs[String]("area"))).sorted
    assert(rows.toSeq == Seq(("US", "AREA_US"), ("XX", "other")))
  }

  test("windowed aggregation runs on the RocksDB state store provider (R3)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[String]
      val sink = new ReportPipeline.KeyedUpsertSink
      val q = ReportPipeline.startAgg(
        input.toDF().withColumnRenamed("value", "line"),
        Files.createTempDirectory("graft-rck").toString, sink)
      input.addData(
        """{"dt":"2018-01-01 10:00:01","type":"shelf","username":"u","area":"AREA_US"}""",
        """{"dt":"2018-01-01 10:00:02","type":"shelf","username":"u","area":"AREA_US"}""")
      q.processAllAvailable()
      q.stop()
      assert(sink.snapshot(("2018-01-01 10:00:00", "shelf", "AREA_US"))._1 == 2L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
