package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.ReportPipeline

/** Crash-consistency proof for the exactly-once claim (K1/K2): the
  * durable keyed-upsert sink must survive a crash in the worst window
  * — AFTER the batch's table write hit disk but BEFORE Spark committed
  * the batch to the checkpoint. On restart, Structured Streaming
  * replays the uncommitted batch from the logged offsets; the sink's
  * idempotent key MERGE (the reference's deterministic-ES-doc-id
  * trick, DataReport.java:181) makes the replayed write converge to
  * the same table state a failure-free run produces.
  *
  * DurableUpsertSpec proves clean replay; this spec injects the actual
  * partial failure. */
class CrashConsistencySpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-crash").toString

  private def line(dt: String, tp: String = "shelf") =
    s"""{"dt":"$dt","type":"$tp","username":"u","area":"AREA_US"}"""

  test("crash between sink write and checkpoint commit: restart converges") {
    implicit val sq = spark.sqlContext

    val batch0 = Seq(line("2018-01-01 10:00:01"), line("2018-01-01 10:00:05"))
    val batch1 = Seq(line("2018-01-01 10:00:30"), line("2018-01-01 10:00:09"))

    // ---- failure-free reference run: same lines, no injection ----
    val refTable = tmpDir() + "/report"
    val refSink = new ReportPipeline.DurableKeyedUpsertSink(refTable)
    val refInput = MemoryStream[String]
    val refQ = ReportPipeline.startAggDurable(
      refInput.toDF().withColumnRenamed("value", "line"), tmpDir(), refSink)
    refInput.addData(batch0: _*)
    refQ.processAllAvailable()
    refInput.addData(batch1: _*)
    refQ.processAllAvailable()
    refQ.stop()
    val expected = refSink.snapshot(spark)
    assert(expected.nonEmpty)

    // ---- crashing run: die right after batch 1's durable write ----
    val table = tmpDir() + "/report"
    val checkpoint = tmpDir()
    val sink = new ReportPipeline.DurableKeyedUpsertSink(table)
    val crashArmed = new AtomicBoolean(false)
    val input = MemoryStream[String]
    // crash only on a DATA batch: watermark advancement schedules
    // empty batches too, and crashing one of those would tear nothing
    // (the torn-state assertion below would then fail spuriously)
    def start() = ReportPipeline.startAggDurable(
      input.toDF().withColumnRenamed("value", "line"), checkpoint, sink,
      afterBatch = (df, _) =>
        if (crashArmed.get && !df.isEmpty) throw new IllegalStateException("injected crash"))

    val q1 = start()
    input.addData(batch0: _*)
    q1.processAllAvailable()
    val afterBatch0 = sink.snapshot(spark)

    crashArmed.set(true)
    input.addData(batch1: _*)
    val e = intercept[Exception] { q1.processAllAvailable() }
    assert(e.toString.contains("injected crash") ||
      Option(e.getCause).exists(_.toString.contains("injected crash")),
      s"expected the injected crash to kill the query, got $e")
    assert(!q1.isActive, "query must be dead after the injected crash")

    // the crash window is real: the durable write LANDED before the
    // crash (table moved beyond batch 0) while the checkpoint never
    // committed batch 1 — this is the torn state a restart must heal
    val torn = sink.snapshot(spark)
    assert(torn != afterBatch0, "injection fired before the sink write — not the claimed window")

    // ---- restart from the same checkpoint: batch 1 replays ----
    crashArmed.set(false)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    assert(sink.snapshot(spark) == expected,
      "restarted run diverged from the failure-free reference")
  }
}
