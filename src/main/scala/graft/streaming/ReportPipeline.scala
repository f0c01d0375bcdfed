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

  /** S1 proper for DataReport (reference `DataReport.java:73-88`,
    * topic `auditLog`): the kafka-wire DataSourceV2 consumer under
    * the same `line` contract as the test stand-ins. */
  def fromKafkaWire(spark: org.apache.spark.sql.SparkSession,
      host: String, port: Int, topic: String): DataFrame =
    spark.readStream.format("kafka-wire")
      .option("host", host).option("port", port.toString)
      .option("topic", topic)
      .load()
      .selectExpr("value AS line")

  /** The CONFIG-ONLY production swap for DataReport's consumer
    * ([[CleanPipeline.fromKafka]]'s twin — see its note on runtime
    * resolution and the auth surface). */
  def fromKafka(spark: org.apache.spark.sql.SparkSession,
      bootstrap: String, topic: String,
      extraOptions: Map[String, String] = Map.empty): DataFrame =
    CleanPipeline.fromKafka(spark, bootstrap, topic, extraOptions)

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

  /** Durable keyed upsert (K2 production shape): MERGE each micro-batch
    * into a parquet table hash-partitioned by a stable bucket of the
    * key (wstart, type, area) — the on-disk counterpart of the
    * reference ES sink's deterministic doc id (DataReport.java:181).
    *
    * Per batch: bucket every incoming row, read back ONLY the affected
    * bucket partitions (static partition pruning on the collected
    * bucket ids — a bounded, <= nBuckets-int driver value, never rows),
    * drop existing rows whose key is being updated (last-write-wins),
    * union the new rows, and dynamically overwrite just those
    * partitions. Replaying a batch rewrites the same partitions with
    * identical content, so restart/replay is idempotent end-to-end on
    * disk (proven by DurableUpsertSpec).
    *
    * At scale each batch touches at most nBuckets partitions and the
    * rewrite volume is bounded by the affected buckets' size, not the
    * table's; a transactional table format would replace the
    * localCheckpoint lineage cut with a real MERGE, with the same key
    * semantics. The actual ES CLIENT path (chunked `_bulk` upserts
    * over JDK HttpClient, same deterministic ids) is
    * [[EsUpsertSink]] — swap sinks, keep the keys. */
  final class DurableKeyedUpsertSink(tablePath: String, nBuckets: Int = 16) {
    private def hasTable: Boolean = {
      val fs = new java.io.File(tablePath).listFiles()
      fs != null && fs.exists(_.getName.startsWith("bucket="))
    }

    def write(batch: DataFrame, batchId: Long): Unit = {
      val s = batch.sparkSession
      val withBucket = batch.withColumn("bucket",
        pmod(hash(col("wstart"), col("type"), col("area")), lit(nBuckets)))
      val merged =
        if (!hasTable) withBucket
        else {
          val affected = withBucket.select(col("bucket")).distinct()
            .collect().map(_.getInt(0)).toSeq
          if (affected.isEmpty) return
          s.read.parquet(tablePath)
            .filter(col("bucket").isin(affected: _*))
            .join(withBucket.select(col("wstart"), col("type"), col("area")),
              Seq("wstart", "type", "area"), "left_anti")
            .unionByName(withBucket)
        }
      // cut lineage before the overwrite — Spark refuses to overwrite
      // a path that still feeds the write's own plan
      val materialized = merged.localCheckpoint(true)
      // per-writer option, NOT the session conf: two sinks sharing one
      // SparkSession must not race each other into a static overwrite
      // (which would delete every untouched bucket)
      materialized.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket").parquet(tablePath)
    }

    /** Current table state keyed like KeyedUpsertSink.snapshot. */
    def snapshot(s: SparkSession): Map[(String, String, String), (Long, String)] =
      if (!hasTable) Map.empty
      else s.read.parquet(tablePath).collect().map { r =>
        (r.getAs[String]("wstart"), r.getAs[String]("type"),
          r.getAs[String]("area")) -> (r.getAs[Long]("cnt"), r.getAs[String]("time"))
      }.toMap
  }

  /** Side-output router (A6): stateless pass that tracks the observed
    * high watermark and diverts exactly the records the windowed agg
    * will never count. The agg drops PER WINDOW (a row is lost iff its
    * window's end <= watermark), so the router classifies on the
    * window end too — a per-row `ts < watermark` test would
    * double-report rows in the final ~30 s of a still-open window
    * (counted by the agg AND flagged late). The reference sends these
    * to a `lateLog` Kafka topic as TSV (DataReport.java:156-161);
    * `lateSink` receives the same formatted lines.
    *
    * `watermarkPath`: the observed max is PERSISTED (one 8-byte file,
    * atomic tmp+rename per advancing batch) and restored on
    * construction. Without it, a restarted router reports nothing
    * late until it re-observes a max — while the agg side's
    * CHECKPOINTED watermark keeps dropping those rows, so the two
    * branches disagree across the restart window. (The reference's
    * `MyWatermark` resets too — reference-faithful — but our agg side
    * does NOT reset, so the durable form is the consistent one.)
    * Defaults to piggybacking on `latePath` when that is set — the
    * production (distributed-branch) form is restart-consistent out
    * of the box. Two details carry that claim safely:
    *  - the file is `_max_ts_micros` — the underscore prefix keeps it
    *    (and its tmp sibling) invisible to Spark/Hadoop file listing,
    *    so `spark.read.parquet(latePath)` over the `batch_id=` layout
    *    keeps working (a bare-named root file would break partition
    *    discovery);
    *  - all IO goes through the Hadoop FileSystem of the dir's URI
    *    (restored lazily on the first batch, where a session is in
    *    hand), so a remote latePath (hdfs://, s3a://) persists where
    *    the parquet goes — java.nio would have written a bogus local
    *    path and silently lost the restart consistency.
    * Replay-idempotent: a replayed batch rewrites the same max. */
  final class LateRouter(lateSink: Row => Unit, latePath: Option[String] = None,
      watermarkPath: Option[String] = None) {
    private val wmDir: Option[String] = watermarkPath.orElse(latePath)
    private val maxTsMicros = new AtomicLong(Long.MinValue)
    private val restoredOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
    private def wmTarget(dir: String) = new org.apache.hadoop.fs.Path(dir, "_max_ts_micros")

    private def restore(hc: org.apache.hadoop.conf.Configuration): Unit =
      wmDir.foreach { dir =>
        val target = wmTarget(dir)
        val fs = target.getFileSystem(hc)
        // a crash between tmp-create and rename strands the tmp file;
        // it is listing-invisible (underscore) but would accrete over
        // restarts — sweep strays (incl. per-batch-named ones from
        // older layouts) before resuming
        try {
          val strays = fs.globStatus(
            new org.apache.hadoop.fs.Path(dir, "_max_ts_micros.tmp*"))
          if (strays != null) strays.foreach(s => fs.delete(s.getPath, false))
        } catch { case _: java.io.FileNotFoundException => () }
        if (fs.exists(target)) {
          val in = fs.open(target)
          val line = try new java.io.BufferedReader(
            new java.io.InputStreamReader(in, "UTF-8")).readLine()
          finally in.close()
          Option(line).map(_.trim).filter(_.nonEmpty)
            .foreach(s => maxTsMicros.set(s.toLong))
        }
      }

    private def persist(hc: org.apache.hadoop.conf.Configuration): Unit =
      wmDir.foreach { dir =>
        val target = wmTarget(dir)
        // ONE fixed tmp name, created with overwrite: route() runs
        // serially per batch, so there is no concurrent persist to
        // collide with, and a crash-stranded tmp is simply overwritten
        // by the next persist instead of accreting per batch id
        // (restore() additionally sweeps strays on restart)
        val tmp = new org.apache.hadoop.fs.Path(dir, "_max_ts_micros.tmp")
        val fs = target.getFileSystem(hc)
        fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
        val out = fs.create(tmp, true)
        try out.write(maxTsMicros.get().toString.getBytes("UTF-8"))
        finally out.close()
        // OVERWRITE rename: atomic swap on HDFS/local; object stores
        // degrade to copy+delete, which is safe here — the value is a
        // monotone max, so a stale read only widens re-reporting
        org.apache.hadoop.fs.FileContext.getFileContext(target.toUri, hc)
          .rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      }
    private val windowUs = 30L * 1000000
    def route(batch: DataFrame, batchId: Long): Unit = {
      val hadoopConf = batch.sparkSession.sessionState.newHadoopConf()
      if (restoredOnce.compareAndSet(false, true)) restore(hadoopConf)
      val wm = maxTsMicros.get()
      // one persist, two actions (late filter + max), one computation
      // of the parse subtree per micro-batch
      val cached = batch.persist()
      try {
        // no watermark yet (first batch): nothing can be late — and
        // wm - 40s would underflow Long.MinValue into "everything late"
        if (wm != Long.MinValue) {
          val lateDf = cached
            .withColumn("wend",
              (expr(s"unix_micros(ts) div $windowUs") + 1) * windowUs)
            .filter(col("wend") <= wm - 40L * 1000000)
            .select(concat_ws("\t",
              date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
              col("type"), col("area")).as("line"))
          latePath match {
            // production form: the late branch is written DISTRIBUTED
            // (never collected — a replay storm of late records must
            // not land on the driver); one overwritten subdir per
            // batch id keeps replays idempotent
            case Some(p) =>
              // skip empty batches: a long-running stream with rare
              // late data must not accumulate one tiny dir per batch
              if (!lateDf.isEmpty)
                lateDf.write.mode("overwrite").parquet(s"$p/batch_id=$batchId")
            case None =>
              lateDf.collect().foreach(lateSink)
          }
        }
        val batchMax = cached.agg(max(unix_micros(col("ts")))).collect()
          .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
        batchMax.foreach { m =>
          val advanced = maxTsMicros.getAndUpdate(cur => math.max(cur, m)) < m
          // durable watermark: written AFTER the late branch (a crash
          // between the two re-reports some lates on replay — at-least
          // -once, never silently dropped), only when it advanced
          if (advanced) persist(hadoopConf)
        }
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

  /** Start the windowed-agg query against the DURABLE keyed upsert
    * sink — the production K2 shape (partition-overwrite parquet
    * MERGE, replay-idempotent on disk). */
  def startAggDurable(
      lines: DataFrame,
      checkpointDir: String,
      sink: DurableKeyedUpsertSink,
      trigger: Trigger = Trigger.ProcessingTime(0),
      // failure-injection seam (CrashConsistencySpec): runs AFTER the
      // durable write but BEFORE Spark commits the batch to the
      // checkpoint — throwing here is exactly the crash window the
      // exactly-once claim must survive. Receives the batch frame so
      // the injector can target data-carrying batches (watermark
      // advancement schedules empty batches too).
      afterBatch: (DataFrame, Long) => Unit = (_, _) => ()): StreamingQuery =
    aggregate(ReportJob.parse(lines)).writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((df: DataFrame, id: Long) => { sink.write(df, id); afterBatch(df, id) })
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
