package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.ReportJob
import graft.streaming.ExactLateness

/** Exact Flink dual-threshold lateness semantics: buffer until the
  * (10 s) watermark passes the window end -> single "fire"; re-fire per
  * allowed-late record for 30 s more; then side-output. Mirrors the
  * reference's EventTimeTrigger + allowedLateness + sideOutputLateData
  * observable behavior. */
class ExactLatenessSpec extends SparkSpec {

  test("fire once on time, refire within lateness, side-output beyond it") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val got = ArrayBuffer[ExactLateness.WinOut]()
    val q = ExactLateness.windows(
        ReportJob.parse(input.toDF().withColumnRenamed("value", "line")))
      .writeStream.outputMode("update")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[ExactLateness.WinOut], _: Long) =>
        got.synchronized { got ++= ds.collect() }
        ()
      }
      .start()
    def l(dt: String, tp: String = "shelf") =
      s"""{"dt":"$dt","type":"$tp","username":"u","area":"AREA_US"}"""
    def w0 = got.filter(o => o.wstart == "2018-01-01 10:00:00" && o.etype == "shelf")

    // batch 1: two records in W0=[10:00:00,10:00:30); no emission yet
    // (Flink buffers until the watermark passes the window end)
    input.addData(l("2018-01-01 10:00:05"), l("2018-01-01 10:00:10"))
    q.processAllAvailable()
    assert(w0.isEmpty)

    // batch 2: maxTs 10:00:45 -> sparkWM after batch = 09:59:35, past
    // W0's fire timer (end-60 = 09:59:30); fire happens NEXT batch
    input.addData(l("2018-01-01 10:00:45"))
    q.processAllAvailable()

    // batch 3: timer fires -> exactly one on-time "fire" with cnt=2
    input.addData(l("2018-01-01 10:00:50"))
    q.processAllAvailable()
    assert(w0.toSeq.map(o => (o.tag, o.cnt)) == Seq(("fire", 2L)))
    assert(w0.head.time == "2018-01-01 10:00:10")

    // batch 4: allowed-late record (flinkWM = 10:00:40 < end+30) ->
    // window re-fires with updated count (reference allowedLateness)
    input.addData(l("2018-01-01 10:00:25"))
    q.processAllAvailable()
    assert(w0.toSeq.map(o => (o.tag, o.cnt)) == Seq(("fire", 2L), ("refire", 3L)))

    // batches 5-6: advance flinkWM beyond end+30 (maxTs 10:02:30 ->
    // sparkWM 10:01:20, cleanup timer end-30 = 10:00:00 passed)
    input.addData(l("2018-01-01 10:02:30"))
    q.processAllAvailable()
    input.addData(l("2018-01-01 10:02:31"))
    q.processAllAvailable()

    // batch 7: two Flink-side-output records. The first (10:00:28) is
    // below even Spark's row-level watermark filter — silently dropped
    // here, which is why the composite pipeline pairs this operator
    // with ReportPipeline.LateRouter (a drop there is still "side
    // output" observably). The second (10:01:25, window end 10:01:30
    // < flinkWM) is above the row filter and gets tagged "late" by the
    // operator itself.
    input.addData(l("2018-01-01 10:00:28", "black"),
      l("2018-01-01 10:01:25", "black"))
    q.processAllAvailable()
    q.stop()
    val lateRows = got.filter(_.tag == "late")
    assert(lateRows.map(o => (o.wstart, o.etype, o.time)).toSeq ==
      Seq(("2018-01-01 10:01:00", "black", "2018-01-01 10:01:25")))
    assert(w0.toSeq.map(o => (o.tag, o.cnt)) == Seq(("fire", 2L), ("refire", 3L)))
    assert(!got.exists(_.time == "2018-01-01 10:00:28"))
  }

  test("refired window still evicts: post-horizon record is late, not a refire") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val got = ArrayBuffer[ExactLateness.WinOut]()
    val q = ExactLateness.windows(
        ReportJob.parse(input.toDF().withColumnRenamed("value", "line")))
      .writeStream.outputMode("update")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[ExactLateness.WinOut], _: Long) =>
        got.synchronized { got ++= ds.collect() }
        ()
      }
      .start()
    def l(dt: String, tp: String = "shelf") =
      s"""{"dt":"$dt","type":"$tp","username":"u","area":"AREA_US"}"""
    def w0 = got.filter(o => o.wstart == "2018-01-01 10:00:00")

    input.addData(l("2018-01-01 10:00:01"))                   // W0 open
    q.processAllAvailable()
    input.addData(l("2018-01-01 10:00:45"))                   // advance
    q.processAllAvailable()
    input.addData(l("2018-01-01 10:00:50"))                   // fire W0
    q.processAllAvailable()
    input.addData(l("2018-01-01 10:00:25"))                   // refire (timer must re-arm!)
    q.processAllAvailable()
    // push the watermark far past W0's lateness horizon
    input.addData(l("2018-01-01 10:03:00"))
    q.processAllAvailable()
    input.addData(l("2018-01-01 10:03:01"))
    q.processAllAvailable()
    // a record for W0 now: must be late/silent, NEVER another refire
    // (before the timer-re-arm fix, W0's state lived forever and this
    // produced refire cnt=3)
    input.addData(l("2018-01-01 10:00:27", "black"))
    q.processAllAvailable()
    q.stop()
    assert(w0.map(o => (o.tag, o.cnt)).toSeq == Seq(("fire", 1L), ("refire", 2L)))
    assert(!got.exists(o => o.tag == "refire" && o.etype == "black"))
  }
}
