package graft

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{CleanPipeline, ReportPipeline}
import graft.operators.CleanJob

/** Structured Streaming parity tests via MemoryStream — golden event
  * sequences from FIXTURES.md A1/A4. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-ckpt").toString

  test("CleanPipeline enriches a JSON line stream against the dim (S1/S2/J1)") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[String]
    val results = ArrayBuffer[(String, String, Double)]()
    val q = CleanPipeline.start(
      input.toDF().withColumnRenamed("value", "line"),
      CleanJob.dimTable(spark), tmpDir(),
      (df, _) => results.synchronized {
        results ++= df.collect().map(r => (r.getAs[String]("countryCode"),
          r.getAs[String]("area"), r.getAs[Double]("score")))
      })
    input.addData(
      """{"dt":"2018-01-01 10:11:11","countryCode":"US","data":[{"type":"s1","score":0.3,"level":"A"},{"type":"s2","score":0.2,"level":"B"}]}""")
    q.processAllAvailable()
    input.addData(
      """{"dt":"2018-01-01 10:11:13","countryCode":"XX","data":[{"type":"s3","score":0.1,"level":"C"}]}""")
    q.processAllAvailable()
    q.stop()
    assert(results.sortBy(_._3).toSeq == Seq(
      ("XX", "other", 0.1), ("US", "AREA_US", 0.2), ("US", "AREA_US", 0.3)))
  }

  test("ReportPipeline windows update idempotently per key; too-late records side-output (A4-A6/K2)") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[String]
    val sink = new ReportPipeline.KeyedUpsertSink
    val late = ArrayBuffer[String]()
    val router = new ReportPipeline.LateRouter(r => late.synchronized {
      late += r.getAs[String]("line")
    })
    val lines = input.toDF().withColumnRenamed("value", "line")
    val agg = ReportPipeline.startAgg(lines, tmpDir(), sink)
    val side = ReportPipeline.startLateRouter(lines, tmpDir(), router)

    def l(dt: String, tp: String = "shelf") =
      s"""{"dt":"$dt","type":"$tp","username":"u","area":"AREA_US"}"""

    // batch 1: watermark after this batch = 10:00:30 - 40s = 09:59:50
    input.addData(l("2018-01-01 10:00:01"), l("2018-01-01 10:00:05"),
      l("2018-01-01 10:00:30"))
    agg.processAllAvailable(); side.processAllAvailable()
    val k1 = ("2018-01-01 10:00:00", "shelf", "AREA_US")
    assert(sink.snapshot(k1) == (2L, "2018-01-01 10:00:05"))

    // batch 2: a record behind max-ts but within the 40s allowance
    // re-fires its window and overwrites the same key (K2 idempotence)
    input.addData(l("2018-01-01 10:00:09"))
    agg.processAllAvailable(); side.processAllAvailable()
    assert(sink.snapshot(k1) == (3L, "2018-01-01 10:00:09"))

    // batch 3: advance the watermark to 10:01:20 (evicts the first
    // window's state once passed)
    input.addData(l("2018-01-01 10:02:00"))
    agg.processAllAvailable(); side.processAllAvailable()

    // batch 4: >40s behind the high watermark: dropped by the agg,
    // captured by the side output as the reference's TSV line
    input.addData(l("2018-01-01 10:00:20", "black"))
    agg.processAllAvailable(); side.processAllAvailable()
    agg.stop(); side.stop()
    assert(sink.snapshot(k1)._1 == 3L)
    assert(!sink.snapshot.keys.exists(_._2 == "black"))
    assert(late.toSeq == Seq("2018-01-01 10:00:20\tblack\tAREA_US"))
  }

  test("LateRouter watermark survives restart: persisted max keeps the branches consistent") {
    import org.apache.spark.sql.functions._
    val wmDir = tmpDir()
    def batch(rows: (String, String)*) = rows.toSeq.toDF("dts", "type")
      .select(to_timestamp(col("dts")).as("ts"), col("type"),
        lit("AREA_US").as("area"))

    val late1 = ArrayBuffer[String]()
    val r1 = new ReportPipeline.LateRouter(
      r => late1 += r.getAs[String]("line"), None, Some(wmDir))
    r1.route(batch(("2018-01-01 10:02:00", "shelf")), 0L)
    assert(late1.isEmpty)

    // "restart": a NEW router on the same watermark dir must classify
    // a >40s-behind record late on its FIRST batch — the agg side's
    // checkpointed watermark would drop it, and the branches must not
    // diverge across the restart window
    val late2 = ArrayBuffer[String]()
    val r2 = new ReportPipeline.LateRouter(
      r => late2 += r.getAs[String]("line"), None, Some(wmDir))
    r2.route(batch(("2018-01-01 10:00:20", "black")), 1L)
    assert(late2.toSeq == Seq("2018-01-01 10:00:20\tblack\tAREA_US"),
      s"restarted router lost the persisted watermark: $late2")

    // the pre-fix divergence, pinned: a router WITHOUT the durable
    // max sees nothing late on its first batch
    val late3 = ArrayBuffer[String]()
    val r3 = new ReportPipeline.LateRouter(r => late3 += r.getAs[String]("line"))
    r3.route(batch(("2018-01-01 10:00:20", "black")), 1L)
    assert(late3.isEmpty)
  }
}
