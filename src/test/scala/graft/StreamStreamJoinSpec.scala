package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Stream-stream interval join with watermarks on both sides — the
  * remaining Structured Streaming operator class (state on both sides,
  * bounded by the interval condition + watermarks), across the full
  * join-type matrix: inner, left-outer, full-outer. */
class StreamStreamJoinSpec extends SparkSpec {

  private def parse(df: DataFrame, prefix: String): DataFrame =
    df.select(col("_1").as(s"${prefix}_id"),
        to_timestamp(col("_2"), "yyyy-MM-dd HH:mm:ss").as(s"${prefix}_ts"))
      .withWatermark(s"${prefix}_ts", "30 seconds")

  /** Wire two MemoryStreams through the SAME operator method as the
    * batch q_interval_join — on watermarked streams it becomes Spark's
    * stream-stream interval join — and collect each appended row via
    * `collect` into the caller's buffer. */
  private def startJoin[T](
      impressions: MemoryStream[(Long, String)],
      clicks: MemoryStream[(Long, String)],
      joinType: String,
      sink: ArrayBuffer[T])(collect: org.apache.spark.sql.Row => T): StreamingQuery = {
    val joined = graft.operators.IntervalJoin.intervalJoin(
      parse(impressions.toDF(), "imp"), parse(clicks.toDF(), "clk"),
      "imp_id", "clk_id", "imp_ts", "clk_ts", 60, joinType)
    joined.writeStream.outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) =>
        sink.synchronized { sink ++= df.collect().toSeq.map(collect) }
        ()
      }.start()
  }

  private def optLong(r: org.apache.spark.sql.Row, name: String): Option[Long] =
    Option(r.getAs[Any](name)).map(_.asInstanceOf[Long])

  /** Push both watermarks far past every earlier event, twice — the
    * second advance proves evicted state cannot re-emit. */
  private def drainWatermark(
      impressions: MemoryStream[(Long, String)],
      clicks: MemoryStream[(Long, String)],
      q: StreamingQuery): Unit = {
    impressions.addData((90L, "2018-01-01 10:30:00"))
    clicks.addData((91L, "2018-01-01 10:30:00"))
    q.processAllAvailable()
    impressions.addData((92L, "2018-01-01 10:31:00"))
    clicks.addData((93L, "2018-01-01 10:31:00"))
    q.processAllAvailable()
  }

  test("impressions join clicks within a 60s attribution window") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val impressions = MemoryStream[(Long, String)]
    val clicks = MemoryStream[(Long, String)]
    val got = ArrayBuffer[(Long, String, String)]()
    val q = startJoin(impressions, clicks, "inner", got)(r =>
      (r.getAs[Long]("imp_id"),
        r.getAs[java.sql.Timestamp]("imp_ts").toString,
        r.getAs[java.sql.Timestamp]("clk_ts").toString))

    impressions.addData((1L, "2018-01-01 10:00:00"), (2L, "2018-01-01 10:00:05"))
    clicks.addData((1L, "2018-01-01 10:00:30"))          // within window
    q.processAllAvailable()
    clicks.addData((2L, "2018-01-01 10:02:00"))          // outside 60s window
    clicks.addData((3L, "2018-01-01 10:00:10"))          // no impression
    q.processAllAvailable()
    q.stop()

    assert(got.toSeq == Seq((1L, "2018-01-01 10:00:00.0", "2018-01-01 10:00:30.0")))
  }

  test("left-outer interval join emits unmatched rows once on watermark passage") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val impressions = MemoryStream[(Long, String)]
    val clicks = MemoryStream[(Long, String)]
    val got = ArrayBuffer[(Long, Option[Long])]()
    val q = startJoin(impressions, clicks, "left_outer", got)(r =>
      (r.getAs[Long]("imp_id"), optLong(r, "clk_id")))

    // imp 1 gets a click inside the 60s window; imp 2 never matches
    impressions.addData((1L, "2018-01-01 10:00:00"), (2L, "2018-01-01 10:00:05"))
    clicks.addData((1L, "2018-01-01 10:00:30"))
    q.processAllAvailable()
    // the unmatched row must NOT emit while a match could still arrive
    assert(!got.synchronized(got.exists(_._1 == 2L)), "emitted before watermark")
    // advance BOTH watermarks past imp_ts + 60s + 30s delay; the
    // null-padded row for imp 2 then emits exactly once (extra batches
    // must not re-emit it — state was evicted)
    drainWatermark(impressions, clicks, q)
    q.stop()

    val unmatched = got.synchronized(got.filter(_._1 == 2L).toList)
    assert(unmatched == List((2L, None)),
      s"expected exactly one null-padded emission, got $unmatched; all=$got")
    assert(got.synchronized(got.toList).contains((1L, Some(1L))))
  }

  test("full-outer interval join emits unmatched rows from BOTH sides") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val impressions = MemoryStream[(Long, String)]
    val clicks = MemoryStream[(Long, String)]
    val got = ArrayBuffer[(Option[Long], Option[Long])]()
    val q = startJoin(impressions, clicks, "full_outer", got)(r =>
      (optLong(r, "imp_id"), optLong(r, "clk_id")))

    // imp 1 matches; imp 2 has no click; click 3 has no impression
    impressions.addData((1L, "2018-01-01 10:00:00"), (2L, "2018-01-01 10:00:05"))
    clicks.addData((1L, "2018-01-01 10:00:30"), (3L, "2018-01-01 10:00:10"))
    q.processAllAvailable()
    drainWatermark(impressions, clicks, q)
    q.stop()

    val snap = got.synchronized(got.toList)
    assert(snap.contains((Some(1L), Some(1L))))
    assert(snap.count(_ == (Some(2L), None)) == 1, s"left-unmatched: $snap")
    // click 3 has no impression with its id: right-unmatched, once
    assert(snap.count(_ == (None, Some(3L))) == 1, s"right-unmatched: $snap")
  }
}
