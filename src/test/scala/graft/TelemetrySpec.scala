package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.TelemetryMonitor

/** The streaming telemetry monitor: planted outliers flagged with
  * hand-checkable z, memory ≡ disk stats equivalence, frozen-stats
  * batch-order independence, and the drift wire firing on a shifted
  * regime while staying quiet on a calibrated stream. */
class TelemetrySpec extends SparkSpec {
  import spark.implicits._

  // reference corpus: type "m" with 10 values, mean 10, sd 2
  // (values 8 and 12, five each) — z of a planted 20 is (20-10)/2 = 5
  private val corpus = (1L to 5L).flatMap(i =>
    Seq((i, "m", 8.0), (i + 5, "m", 12.0)))
    .toDF("event_id", "event_type", "value")

  test("planted outlier flagged with the exact z; typed bypass holds") {
    val st = TelemetryMonitor.trainStats(corpus)
    val batch = Seq(
      (100L, "m", 20.0),   // z = 5 -> flagged
      (101L, "m", 11.0),   // z = 0.5 -> passes
      (102L, "new", 99.0)  // no frozen stats row -> passes by omission
    ).toDF("event_id", "event_type", "value")
    val got = TelemetryMonitor.score(batch, st).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq((100L, "m", 20.0, 5.0)), s"got $got")
  }

  test("constant-valued and single-event types carry no verdict") {
    // heartbeat: constant 1.0 (variance exactly 0); lone: one event.
    // Without the degenerate-stats guard z is NaN, SQL's NaN > 3 is
    // TRUE, and every heartbeat event would flag -> permanent drift.
    val st = TelemetryMonitor.trainStats(corpus.unionByName(Seq(
      (20L, "heartbeat", 1.0), (21L, "heartbeat", 1.0),
      (22L, "heartbeat", 1.0), (23L, "lone", 7.0))
      .toDF("event_id", "event_type", "value")))
    val batch = Seq(
      (100L, "heartbeat", 1.0),  // matches the constant exactly
      (101L, "heartbeat", 50.0), // wildly off, but no distribution
      (102L, "lone", 0.0),       // n = 1 -> no distribution
      (103L, "m", 20.0)          // healthy type still flags, z = 5
    ).toDF("event_id", "event_type", "value")
    val got = TelemetryMonitor.score(batch, st).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq((103L, "m", 20.0, 5.0)), s"got $got")
  }

  test("batch analogs: disk-persisted stats score identically to memory") {
    val d = "/root/testdata/sf0.001"
    val mem = TelemetryMonitor.qTelemetry(spark, d).collect().toSeq
    val disk = TelemetryMonitor.qTelemetryDisk(spark, d).collect().toSeq
    assert(mem == disk, "persisted stats diverged from the in-memory stats")
    assert(mem.nonEmpty, "sf0.001 should surface at least one flagged event")
  }

  test("streaming monitor: frozen stats, drift wire fires on a regime shift") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    val flagged = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val drift = new TelemetryMonitor.DriftMonitor(rateThreshold = 0.5, patience = 2)
    val q = TelemetryMonitor.start(
      input.toDF().toDF("event_id", "event_type", "value"), corpus,
      Files.createTempDirectory("graft-telemetry").toString,
      (df, id) => flagged ++= df.collect().map(r => (id, r.getLong(0))),
      drift = drift)
    input.addData((100L, "m", 11.0), (101L, "m", 20.0)) // rate 0.5: not > 0.5
    q.processAllAvailable()
    assert(!drift.stale)
    input.addData((200L, "m", 30.0), (201L, "m", 40.0)) // rate 1.0, hot 1
    q.processAllAvailable()
    assert(!drift.stale, "one hot batch is not a regime")
    input.addData((300L, "m", 30.0)) // rate 1.0 again, hot 2 -> trips
    q.processAllAvailable()
    q.stop()
    assert(drift.stale, "two consecutive over-rate batches must trip the wire")
    // frozen stats: the batch-3 copy of a batch-2 value gets the same
    // verdict — no absorption, verdicts are batch-order-independent
    assert(flagged.toSet == Set((0L, 101L), (1L, 200L), (1L, 201L), (2L, 300L)),
      s"got $flagged")
  }
}
