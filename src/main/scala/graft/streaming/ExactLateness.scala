package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** EXACT reproduction of the reference's dual-threshold event-time
  * semantics (SURVEY §2.4 A4-A6 "hard part #1"): Flink separates
  *  - bounded disorder: watermark = maxTs - 10 s (MyWatermark.java:14-21)
  *  - allowedLateness(30 s): window state retained past the on-time
  *    fire; each late-but-allowed record RE-FIRES the window
  *    (DataReport.java:140)
  *  - sideOutputLateData: records beyond watermark+lateness diverted
  *    (DataReport.java:141,146)
  * Spark's single watermark knob cannot express this directly; the
  * update-mode approximation lives in ReportPipeline. This operator
  * reproduces the Flink behavior exactly with flatMapGroupsWithState
  * and event-time timers.
  *
  * Clock translation: the query watermark is maxTs - 70 s. 70 is not
  * arbitrary — it is the smallest delay such that Spark's PER-ROW drop
  * filter (ts < watermark) never drops a row Flink's PER-WINDOW rule
  * (windowEnd + 30 < flinkWM) would keep: a row's ts can be up to 30 s
  * (the window length) older than its window end, and flinkWM runs 10 s
  * behind maxTs, so 30 + 30 + 10 = 70. With flinkWM = sparkWM + 60:
  *  - on-time fire  (flinkWM >= end)      <=> sparkWM >= end - 60
  *  - state cleanup (flinkWM >= end + 30) <=> sparkWM >= end - 30
  *  - too-late      (end + 30 < flinkWM)  <=> end < sparkWM + 30
  * Rows Spark's filter does drop (ts < maxTs - 70) are a strict subset
  * of Flink's side-output set; the remainder are tagged "late" inside
  * the function, so the side output is complete.
  *
  * Scale: state is one (cnt, maxTs, phase) triple per live
  * (type, area, window) — bounded by the cleanup timer, no row
  * buffering (the reference buffered every window's rows). One shuffle
  * on the group key.
  */
object ExactLateness {

  val WindowMs = 30000L
  val DisorderMs = 10000L
  val LatenessMs = 30000L
  /** window length + lateness + disorder — see clock translation above. */
  val SparkDelayMs: Long = WindowMs + LatenessMs + DisorderMs

  case class Ev(ts: java.sql.Timestamp, etype: String, area: String, wstart_ms: Long)
  case class WinState(cnt: Long, maxTsMs: Long, fired: Boolean)
  case class WinOut(wstart: String, etype: String, area: String,
    cnt: Long, time: String, tag: String)

  /** Formats in the SESSION time zone (captured at plan time), so the
    * operator's output strings agree with ReportJob's date_format
    * surfaces on non-UTC sessions. */
  private def fmt(ms: Long, zone: java.time.ZoneId): String =
    java.time.Instant.ofEpochMilli(ms).atZone(zone)
      .toLocalDateTime.format(
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))

  private def out(key: (String, String, Long), s: WinState, tag: String,
      zone: java.time.ZoneId): WinOut =
    WinOut(fmt(key._3, zone), key._1, key._2, s.cnt, fmt(s.maxTsMs, zone), tag)

  private def process(zone: java.time.ZoneId)(
      key: (String, String, Long),
      values: Iterator[Ev],
      state: GroupState[WinState]): Iterator[WinOut] = {
    val endMs = key._3 + WindowMs
    // in spark-watermark clock: fire at end-60s, cleanup at end-30s
    val fireMs = endMs - (DisorderMs + LatenessMs + WindowMs) + DisorderMs // end-60s
    val cleanupMs = endMs - LatenessMs // end-30s
    if (state.hasTimedOut) {
      val s = state.get
      if (!s.fired) {
        // on-time fire: the single emission Flink's EventTimeTrigger
        // produces when the watermark passes the window end
        state.update(s.copy(fired = true))
        if (cleanupMs > state.getCurrentWatermarkMs()) {
          state.setTimeoutTimestamp(cleanupMs)
          Iterator(out(key, s, "fire", zone))
        } else { // watermark leapt past both timers in one batch
          val o = out(key, s, "fire", zone)
          state.remove()
          Iterator(o)
        }
      } else {
        state.remove() // lateness horizon passed: evict, no emission
        Iterator.empty
      }
    } else {
      val wm = state.getCurrentWatermarkMs()
      if (!state.exists && endMs <= wm + LatenessMs) {
        // beyond watermark + allowedLateness in Flink's clock: the
        // side-output path (reference: lateLog topic)
        values.map(v => WinOut(fmt(key._3, zone), key._1, key._2, 1L,
          fmt(v.ts.getTime, zone), "late"))
      } else {
        val batch = values.toSeq
        val prev = state.getOption.getOrElse(WinState(0L, Long.MinValue, fired = false))
        val s = WinState(prev.cnt + batch.size,
          math.max(prev.maxTsMs, batch.map(_.ts.getTime).max), prev.fired)
        if (!s.fired && wm >= fireMs) {
          // first record(s) arrived after the on-time fire point:
          // Flink would fire immediately with what it has
          val fired = s.copy(fired = true)
          state.update(fired)
          if (cleanupMs > wm) state.setTimeoutTimestamp(cleanupMs) else state.remove()
          Iterator(out(key, fired, "fire", zone))
        } else if (!s.fired) {
          state.update(s)
          state.setTimeoutTimestamp(math.max(fireMs, wm + 1))
          Iterator.empty // buffer silently until the watermark fires
        } else if (endMs <= wm + LatenessMs) {
          // the lateness horizon passed while state was still live
          // (records can race the cleanup timer within a batch):
          // Flink would side-output these, not refire
          state.remove()
          batch.iterator.map(v => WinOut(fmt(key._3, zone), key._1, key._2, 1L,
            fmt(v.ts.getTime, zone), "late"))
        } else {
          // allowed-lateness re-fire: one updated emission per batch.
          // CRITICAL: re-arm the cleanup timer — Spark drops a group's
          // timeout unless it is re-set on every invocation, and a
          // dropped timer means the state never evicts.
          state.update(s)
          state.setTimeoutTimestamp(math.max(cleanupMs, wm + 1))
          Iterator(out(key, s, "refire", zone))
        }
      }
    }
  }

  /** parsed (ts, type, area) stream -> exact Flink-semantics window
    * results with tags: "fire" (on-time), "refire" (allowed-late
    * update), "late" (side output). */
  def windows(parsed: DataFrame): Dataset[WinOut] = {
    val spark = parsed.sparkSession
    import spark.implicits._
    val zone = java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)
    parsed
      .withWatermark("ts", s"${SparkDelayMs / 1000} seconds")
      .select(col("ts"), col("type").as("etype"), col("area"),
        (expr("unix_millis(ts) div 30000") * WindowMs).as("wstart_ms"))
      .as[Ev]
      .groupByKey(e => (e.etype, e.area, e.wstart_ms))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(process(zone))
  }
}
