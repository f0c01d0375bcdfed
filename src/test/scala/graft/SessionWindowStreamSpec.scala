package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Proves qSessionWindow's claim: the native session_window grouping
  * runs unchanged as a STREAMING session aggregation (merging session
  * state, closed by the watermark) — the capability the lag/sum
  * formulation (qSessionize) structurally cannot have. */
class SessionWindowStreamSpec extends SparkSpec {

  test("streaming session_window merges gap-adjacent events and closes on watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val sessions = input.toDF()
      .select(col("_1").as("user_id"),
        to_timestamp(col("_2"), "yyyy-MM-dd HH:mm:ss").as("ts"))
      .withWatermark("ts", "10 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("sw.start"), "HH:mm:ss").as("s"),
        date_format(col("sw.end"), "HH:mm:ss").as("e"),
        col("n_events"))

    val got = ArrayBuffer[(Long, String, String, Long)]()
    val q = sessions.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= df.collect().map(r => (r.getLong(0), r.getString(1),
            r.getString(2), r.getLong(3)))
        }
        ()
      }.start()

    // two bursts 10 min apart (same session), then a 31-min gap
    input.addData((1L, "2018-01-01 10:00:00"), (1L, "2018-01-01 10:10:00"))
    q.processAllAvailable()
    input.addData((1L, "2018-01-01 10:41:00")) // new session (gap > 30 min... 31 min)
    q.processAllAvailable()
    // advance the watermark far enough to close both sessions
    input.addData((2L, "2018-01-01 13:00:00"))
    q.processAllAvailable()
    q.stop()

    // session 1: [10:00, 10:10+30min); session 2: [10:41, 11:11)
    assert(got.toSet == Set(
      (1L, "10:00:00", "10:40:00", 2L),
      (1L, "10:41:00", "11:11:00", 1L)))
  }
}
