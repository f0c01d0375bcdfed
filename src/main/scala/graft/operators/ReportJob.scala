package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch form of the reference's DataReport job (audit-log windowed
  * analytics): JSON line -> parse/filter -> event-time 30 s tumbling
  * window keyed by (type, area) -> count + max event timestamp,
  * formatted back to "yyyy-MM-dd HH:mm:ss".
  *
  * Reference semantics reproduced (citations into /root/reference):
  *  - JSON parse + field extraction: DataReport.java:94-115 (P1/P5)
  *  - timestamp parse, invalid -> filtered: DataReport.java:100-108,
  *    120-129 (P4/P6) — Spark's `to_timestamp` yields null on parse
  *    failure, and we filter nulls (same observable result as the
  *    reference's 0-sentinel + filter).
  *  - keyBy(type, area) + 30 s tumbling window + count/max:
  *    DataReport.java:138-142, MyAggFunction.java:21-51 (A1-A3). The
  *    reference buffers the whole window and sorts to find max; here the
  *    agg is an incremental partial+final hash aggregate — identical
  *    results, no per-window buffering, and it scales: the only shuffle
  *    is the hash repartition on the group keys, with map-side partial
  *    aggregation shrinking it to ~|windows x type x area| rows.
  *  - max-ts formatting: MyAggFunction.java:43-45 (P8).
  *
  * The same `parse` + `windowAgg` transforms are reused unchanged by the
  * streaming pipeline (graft.streaming.ReportPipeline) — DataFrame
  * transforms are batch/stream agnostic.
  */
object ReportJob {

  /** Audit-log line schema, per the generator
    * kafkaProducerDataReport.java:38. */
  val auditSchema: StructType = StructType(Seq(
    StructField("dt", StringType),
    StructField("type", StringType),
    StructField("username", StringType),
    StructField("area", StringType)))

  /** Render the harness `events` table as the reference's audit-log JSON
    * lines (FIXTURES.md A4): dt = formatted event time, type = event
    * type, area derived deterministically from user_id. This feeds the
    * REAL parse path below, so the whole reference chain is exercised
    * end-to-end on oracle-checkable data. */
  def eventsAsAuditLog(events: DataFrame): DataFrame =
    events.select(to_json(struct(
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("dt"),
      col("event_type").as("type"),
      concat(lit("user"), col("user_id")).as("username"),
      concat(lit("AREA_"), col("user_id") % 5).as("area"))).as("line"))

  /** JSON line -> (ts, type, area); invalid timestamps dropped. */
  def parse(lines: DataFrame): DataFrame =
    lines
      .select(from_json(col("line"), auditSchema).as("j"))
      .select(
        // try_to_timestamp, not to_timestamp: under Spark 4's default
        // ANSI mode a malformed dt would throw; the reference instead
        // tags it (time=0) and filters it (DataReport.java:100-108,
        // 120-129) — null + filter is the same observable semantics.
        try_to_timestamp(col("j.dt"), lit("yyyy-MM-dd HH:mm:ss")).as("ts"),
        col("j.type").as("type"),
        col("j.area").as("area"))
      .filter(col("ts").isNotNull)

  /** Tumbling-window count + formatted max event ts per (type, area). */
  def windowAgg(parsed: DataFrame, windowLen: String = "30 seconds"): DataFrame =
    parsed
      .groupBy(window(col("ts"), windowLen).as("w"), col("type"), col("area"))
      .agg(count(lit(1)).as("cnt"), max(col("ts")).as("maxTs"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("type"), col("area"), col("cnt"),
        date_format(col("maxTs"), "yyyy-MM-dd HH:mm:ss").as("time"))

  /** Full batch pipeline over the events table. */
  def run(events: DataFrame): DataFrame = {
    val out = windowAgg(parse(eventsAsAuditLog(events)))
    out.orderBy(col("wstart"), col("type"), col("area"))
  }

  /** Batch analog of the watermark / allowed-lateness / side-output
    * split (A4-A6, DataReport.java:137-146): classify each record
    * against the stream's high watermark = max(ts) - 10 s disorder
    * - 30 s allowed lateness. In the streaming pipeline the same 40 s
    * threshold is the single Spark watermark (SURVEY §2.4 A5 decision);
    * here we compute it with a scalar subquery-style cross join of the
    * global max — one extra tiny agg, no extra shuffle of the fact
    * table (the max is broadcast). */
  def lateSplit(parsed: DataFrame): DataFrame = {
    // ONE scan of the fact: the late/ontime threshold only needs ts
    // granularity, so pre-aggregate to (type, area, ts) partial counts
    // first — |keys x distinct seconds| rows, tiny next to the fact —
    // and derive BOTH the watermark and the tagged re-aggregation from
    // that. Without the pre-agg the parse subtree is evaluated twice
    // (watermark agg + split); Catalyst does not reuse the exchange.
    // localCheckpoint (lazy) rather than persist: blocks are freed by
    // the ContextCleaner when the plan is GC'd — no manual unpersist
    // point is needed in a lazily-returned DataFrame.
    val perTs = parsed.groupBy(col("type"), col("area"), col("ts"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    val wm = perTs.agg((max(col("ts").cast(LongType)) - 40).cast(TimestampType).as("wm"))
    perTs.crossJoin(broadcast(wm))
      .select(col("type"), col("area"), col("cnt"),
        when(col("ts") < col("wm"), lit("late")).otherwise(lit("ontime")).as("tag"))
      .groupBy(col("tag"), col("type"), col("area"))
      .agg(sum(col("cnt")).as("cnt"))
      .orderBy(col("tag"), col("type"), col("area"))
  }
}
