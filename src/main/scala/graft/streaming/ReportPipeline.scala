package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.ReportJob

/** Streaming form of the reference DataReport job
  * (DataReport.java:48-204): audit-log JSON stream -> parse/filter ->
  * event-time 30 s tumbling window keyed by (type, area) -> count +
  * max-ts -> keyed upsert sink; too-late records -> side output.
  *
  * Watermark / lateness design (SURVEY §2.4 A4-A6 decision):
  * the reference separates bounded disorder (10 s watermark,
  * MyWatermark.java:14-21) from allowedLateness (30 s,
  * DataReport.java:140), re-firing windows for late-but-allowed
  * records. Spark has one knob, so the single watermark is widened to
  * 10 + 30 = 40 s and the query runs in UPDATE mode with a keyed
  * upsert sink: every within-lateness record re-emits its window with
  * updated counts, and the deterministic key (time, type, area)
  * overwrites the previous row — byte-for-byte the observable behavior
  * of the reference's ES sink, whose doc id IS that key
  * (DataReport.java:181). Records beyond watermark+lateness go to the
  * side output (A6), here a parallel stateless router.
  *
  * Scale: the windowed agg is an incremental partial+final hash
  * aggregate with state bounded by the watermark (unlike the
  * reference's buffer-the-whole-window WindowFunction); the only
  * shuffle is on the group keys. State store can be RocksDB
  * (R3: spark.sql.streaming.stateStore.providerClass).
  */
object ReportPipeline {

  val WatermarkDelay = "40 seconds" // 10 s disorder + 30 s lateness

  /** Windowed aggregation over a streaming parsed frame — same
    * ReportJob.windowAgg grouping, with the streaming watermark. */
  def aggregate(parsed: DataFrame): DataFrame =
    ReportJob.windowAgg(parsed.withWatermark("ts", WatermarkDelay))

  /** Keyed upsert sink: last-write-wins per (wstart, type, area) —
    * the reference's deterministic-ES-id idempotence (K2). Exposed for
    * tests; production would MERGE into a keyed store the same way. */
  final class KeyedUpsertSink {
    val store = new ConcurrentHashMap[(String, String, String), (Long, String)]()
    def write(batch: DataFrame, batchId: Long): Unit =
      batch.collect().foreach { r =>
        store.put((r.getAs[String]("wstart"), r.getAs[String]("type"),
          r.getAs[String]("area")), (r.getAs[Long]("cnt"), r.getAs[String]("time")))
      }
    def snapshot: Map[(String, String, String), (Long, String)] = {
      import scala.jdk.CollectionConverters._
      store.asScala.toMap
    }
  }

  /** Side-output router (A6): stateless pass that tracks the observed
    * high watermark and diverts exactly the records the windowed agg
    * will never count. The agg drops PER WINDOW (a row is lost iff its
    * window's end <= watermark), so the router classifies on the
    * window end too — a per-row `ts < watermark` test would
    * double-report rows in the final ~30 s of a still-open window
    * (counted by the agg AND flagged late). The reference sends these
    * to a `lateLog` Kafka topic as TSV (DataReport.java:156-161);
    * `lateSink` receives the same formatted lines. */
  final class LateRouter(lateSink: Row => Unit) {
    private val maxTsMicros = new AtomicLong(Long.MinValue)
    private val windowUs = 30L * 1000000
    def route(batch: DataFrame, batchId: Long): Unit = {
      val wm = maxTsMicros.get()
      // one persist, two actions (late filter + max), one computation
      // of the parse subtree per micro-batch
      val cached = batch.persist()
      try {
        // no watermark yet (first batch): nothing can be late — and
        // wm - 40s would underflow Long.MinValue into "everything late"
        if (wm != Long.MinValue) {
          val lateRows = cached
            .withColumn("wend",
              (expr(s"unix_micros(ts) div $windowUs") + 1) * windowUs)
            .filter(col("wend") <= wm - 40L * 1000000)
            .select(concat_ws("\t",
              date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
              col("type"), col("area")).as("line"))
            .collect()
          lateRows.foreach(lateSink)
        }
        val batchMax = cached.agg(max(unix_micros(col("ts")))).collect()
          .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
        batchMax.foreach(m => maxTsMicros.getAndUpdate(cur => math.max(cur, m)))
      } finally cached.unpersist()
    }
  }

  /** Start the windowed-agg query (update mode, keyed upsert). */
  def startAgg(
      lines: DataFrame,
      checkpointDir: String,
      sink: KeyedUpsertSink,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    aggregate(ReportJob.parse(lines)).writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((df: DataFrame, id: Long) => sink.write(df, id))
      .start()

  /** Start the late-record side-output query. */
  def startLateRouter(
      lines: DataFrame,
      checkpointDir: String,
      router: LateRouter,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    ReportJob.parse(lines).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((df: DataFrame, id: Long) => router.route(df, id))
      .start()
}
