package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.streaming.KafkaWire

/** S1 — the Kafka CONSUMER as a first-class Spark streaming source
  * (reference: `FlinkKafkaConsumer011` bootstrapping both jobs,
  * `DataClean.java:58-66`, `DataReport.java:73-88`), mounted through
  * the public DataSourceV2 seam: `TableProvider` →
  * `SupportsRead(MICRO_BATCH_READ)` → [[KafkaWireMicroBatchStream]].
  * The byte-level consumer underneath is the repo's own wire client —
  * [[KafkaWire.fetchCommitted]], Fetch v4 with
  * isolation_level=read_committed, CRC-32C re-validated per batch —
  * so aborted transactions are invisible end-to-end, matching the
  * reference's exactly-once reading side.
  *
  * Usage (CleanPipeline.fromKafkaWire wraps this):
  * {{{
  * spark.readStream.format("kafka-wire")
  *   .option("host", h).option("port", p).option("topic", t).load()
  * }}}
  * Schema mirrors Spark's own Kafka source surface: (key STRING,
  * value STRING, partition INT, offset LONG).
  *
  * Offsets and exactly-once: the stream's [[Offset]] is the
  * per-partition next-offset map, JSON-serialized into Spark's
  * checkpoint offset log. A restarted query replans the SAME
  * [start, end) range (Structured Streaming's contract), and
  * [[KafkaWire.fetchCommitted]] slices records by offset, so every
  * record lands in exactly one micro-batch across restarts. Paired
  * with [[graft.streaming.KafkaEosSink]] on the write side the whole
  * broker→engine→broker path is exactly-once (KafkaWireSourceSpec
  * proves the composition incl. a replay).
  *
  * Scale shape: one [[InputPartition]] per Kafka partition — the
  * parallelism unit IS the topic's partition count, as with Spark's
  * own connector; each task opens its own socket on its executor and
  * reads only its [start, end) slice. No driver-side record
  * buffering — the driver touches only hwm numbers (latestOffset).
  * `maxOffsetsPerTrigger` caps a micro-batch for backpressure. */
class KafkaWireSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kafka-wire"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaWireSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // properties arrive in original case — normalize (the user writes
    // maxOffsetsPerTrigger, Spark's own Kafka option casing)
    val opts = new CaseInsensitiveStringMap(properties)
    new KafkaWireTable(
      Option(opts.get("host")).getOrElse("127.0.0.1"),
      Option(opts.get("port")).map(_.toInt)
        .getOrElse(sys.error("kafka-wire: option 'port' is required")),
      Option(opts.get("topic"))
        .getOrElse(sys.error("kafka-wire: option 'topic' is required")),
      Option(opts.get("partitions")).map(_.toInt).getOrElse(1),
      Option(opts.get("maxOffsetsPerTrigger")).map(_.toLong),
      Option(opts.get("startingOffsets")).getOrElse("earliest") match {
        case "earliest" => false
        case "latest" => true
        case other => sys.error(
          s"kafka-wire: startingOffsets must be earliest|latest, got '$other'")
      },
      // Spark's Kafka-source option, same default: a planned offset
      // that retention has deleted FAILS the query unless the user
      // explicitly opts into skipping to the earliest retained offset
      Option(opts.get("failOnDataLoss")).forall(_.toBoolean),
      // the reference passes `group.id con1` (DataClean.java:61);
      // when set, batch completion best-effort-commits the group
      // offsets so EXTERNAL lag monitors see the pipeline — progress
      // itself stays in Spark checkpoints (CONNECTORS.md)
      Option(opts.get("groupId")))
  }
}

object KafkaWireSource {
  val Schema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StringType),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false)))
}

final class KafkaWireTable(host: String, port: Int, topic: String,
    partitions: Int, maxPerTrigger: Option[Long], startLatest: Boolean,
    failOnDataLoss: Boolean, groupId: Option[String] = None)
    extends Table with SupportsRead {
  override def name(): String = s"kafka-wire:$topic@$host:$port"
  override def schema(): StructType = KafkaWireSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = KafkaWireSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new KafkaWireMicroBatchStream(host, port, topic, partitions,
            maxPerTrigger, startLatest, failOnDataLoss, groupId)
        override def toBatch: Batch = sys.error(
          "kafka-wire is a streaming source; use readStream")
      }
    }
}

/** Per-partition next-offset map. JSON form: `{"0":12,"1":3}`
  * (partition ids sorted — the string is written into Spark's
  * checkpoint offset log and must be deterministic). */
final case class KafkaWireOffset(offsets: Map[Int, Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

object KafkaWireOffset {
  def parse(json: String): KafkaWireOffset = KafkaWireOffset(
    json.trim.stripPrefix("{").stripSuffix("}").split(",").toSeq
      .filter(_.nonEmpty)
      .map { kv =>
        val Array(k, v) = kv.split(":")
        k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
      }.toMap)
}

final class KafkaWireMicroBatchStream(host: String, port: Int, topic: String,
    partitions: Int, maxPerTrigger: Option[Long], startLatest: Boolean = false,
    failOnDataLoss: Boolean = true, groupId: Option[String] = None)
    extends MicroBatchStream with SupportsAdmissionControl {

  private def parts = 0 until partitions

  /** earliest -> the broker's LOG-START offset via ListOffsets
    * (NOT 0: on a retention-truncated topic offset 0 no longer
    * exists and planning it is OFFSET_OUT_OF_RANGE); latest -> the
    * last stable offset at first plan (records committed before the
    * query started are skipped — the reference's group-managed
    * default). Only consulted when the checkpoint has no offset log
    * yet; restarts always resume from the checkpoint. */
  override def initialOffset(): Offset =
    if (startLatest)
      KafkaWireOffset(parts.map(p => p -> stableOffset(p)).toMap)
    else KafkaWireOffset(parts.map(p =>
      p -> KafkaWire.listOffset(host, port, topic, p, earliest = true)).toMap)

  /** LSO probe that works against a REAL broker, not just the
    * embedded one (round-17, ADVICE r16 #2): resolve the log-end
    * offset via ListOffsets(-1), then fetch AT it — a fetch at the
    * log end is valid on every broker (it is the next-to-be-written
    * offset), returns an empty record set, and still carries the
    * last_stable_offset in its partition header. The previous
    * fetch-at-Long.MaxValue convention was a convention only the
    * embedded broker special-cased; a real broker answers it
    * OFFSET_OUT_OF_RANGE, which would have failed the driver poll
    * every trigger. Two metadata round trips, no record payloads. */
  private def stableOffset(p: Int): Long = {
    val end = KafkaWire.listOffset(host, port, topic, p, earliest = false)
    try KafkaWire.fetchCommitted(host, port, topic, p, end)._1
    catch {
      case e: KafkaWire.WireErrorException
          if e.code == KafkaWire.ErrOffsetOutOfRange =>
        // TOCTOU (ADVICE r17): retention can truncate past `end`
        // between the ListOffsets and the fetch, making this driver
        // poll OFFSET_OUT_OF_RANGE and failing the whole streaming
        // query even with failOnDataLoss=false (the reader-side
        // recovery never sees a driver poll). Re-resolve at the NEW
        // log-start and retry once — the race window is one RTT, a
        // second loss in it means retention is outrunning the poll
        // and failing loudly is right.
        val earliest = KafkaWire.listOffset(host, port, topic, p, earliest = true)
        KafkaWire.fetchCommitted(host, port, topic, p, earliest)._1
    }
  }

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  /** LAST STABLE OFFSET per partition (fetchCommitted._1) — the
    * read_committed admission bound: records above it belong to
    * in-flight transactions and must not be planned into a batch
    * (round-16, ADVICE r15 #1 — the high watermark over-admits).
    * Driver-side metadata only (no records move here). With
    * SupportsAdmissionControl implemented, Spark calls the
    * (start, limit) variant below. */
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  /** Start offset for a partition ABSENT from the checkpointed map —
    * a topic whose partition count grew across a restart. The broker's
    * retained log-start, never a hardcoded 0 (the same retention fix
    * as initialOffset: offset 0 stops existing once retention fires,
    * and planning it would surface a spurious data-loss error for a
    * partition that never lost anything). */
  private def startOf(s: KafkaWireOffset, p: Int): Long =
    s.offsets.getOrElse(p,
      KafkaWire.listOffset(host, port, topic, p, earliest = true))

  /** Backpressure seam: a ReadMaxRows limit caps this trigger's end
    * offsets at start + cap/partitions per partition (the same
    * spread-evenly policy as Spark's Kafka connector). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[KafkaWireOffset]
    val hwm = parts.map(p => p -> stableOffset(p)).toMap
    KafkaWireOffset(limit match {
      case mr: ReadMaxRows =>
        val per = math.max(1L, mr.maxRows / math.max(1, partitions))
        hwm.map { case (p, h) =>
          p -> math.min(h, startOf(s, p) + per) }
      case _ => hwm
    })
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KafkaWireOffset]
    val e = end.asInstanceOf[KafkaWireOffset]
    parts.flatMap { p =>
      val from = startOf(s, p)
      val until = e.offsets.getOrElse(p, from)
      if (until > from) Some(KafkaWireInputPartition(host, port, topic, p, from, until, failOnDataLoss))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KafkaWireReaderFactory

  override def deserializeOffset(json: String): Offset = KafkaWireOffset.parse(json)

  /** Batch-completion hook: when a `groupId` is configured, publish
    * the committed end offsets via OffsetCommit so external lag
    * monitors (group-offset pollers) observe the pipeline — the
    * reference's `group.id con1` surface (DataClean.java:61).
    * BEST-EFFORT by design: Spark's checkpoint offset log is the
    * exactly-once source of truth (this stream never OffsetFetches
    * its own position back), so a failed observability commit logs
    * and moves on rather than failing the query.
    *
    * ASYNC, latest-wins (round-20 / ADVICE r19 #4): the commit runs
    * on a single daemon thread, never on the micro-batch driver loop
    * — with the coordinator down, the synchronous path paid up to 4
    * retries x (connect + read timeouts) x 2 RPCs ≈ a minute of
    * added latency PER BATCH for an observability-only write. If a
    * prior publish is still in flight, this batch's is skipped
    * entirely (no queue growth); the next idle batch publishes
    * strictly newer offsets, which is all a lag monitor needs. */
  private lazy val commitExec = {
    val ex = java.util.concurrent.Executors.newSingleThreadExecutor(r => {
      val t = new Thread(r, "kafka-wire-group-commit")
      t.setDaemon(true); t
    })
    ex
  }
  private val commitBusy = new java.util.concurrent.atomic.AtomicBoolean(false)

  override def commit(end: Offset): Unit =
    groupId.foreach { g =>
      val e = end.asInstanceOf[KafkaWireOffset]
      if (commitBusy.compareAndSet(false, true))
        commitExec.execute(() =>
          try KafkaWire.commitOffsets(host, port, g, topic, e.offsets)
          catch {
            case ex: Exception => System.err.println(
              s"[kafka-wire] group '$g' offset commit failed " +
                s"(observability only, progress unaffected): ${ex.getMessage}")
          } finally commitBusy.set(false))
      else System.err.println(
        s"[kafka-wire] group '$g' offset publish skipped for this batch " +
          "(previous publish still in flight — coordinator degraded?); " +
          "a later batch will publish newer offsets")
    }
  override def stop(): Unit =
    if (groupId.nonEmpty) commitExec.shutdown()
}

final class KafkaWireReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KafkaWirePartitionReader(partition.asInstanceOf[KafkaWireInputPartition])
}

final case class KafkaWireInputPartition(host: String, port: Int,
    topic: String, partition: Int, from: Long, until: Long,
    failOnDataLoss: Boolean) extends InputPartition

/** Executor-side reader: one socket per task, LAZILY paging fetches
  * until the planned [from, until) range is fully read (round-16,
  * ADVICE r15 #2 + review: one 8 MB-capped fetch silently dropped the
  * tail of a large range, and an eager Vector of the whole range
  * would hold an allAvailable backlog in executor memory — the pager
  * holds one fetch page). OFFSET_OUT_OF_RANGE mid-read (retention
  * deleted planned offsets) follows Spark's Kafka-source contract:
  * fail loudly unless failOnDataLoss=false, in which case skip to the
  * earliest retained offset — re-resolved under a bounded retry, so a
  * retention edge racing the recovery converges instead of failing
  * the task the user asked to keep alive. */
final class KafkaWirePartitionReader(p: KafkaWireInputPartition)
    extends PartitionReader[InternalRow] {
  private var pager = new KafkaWire.RangePager(
    p.host, p.port, p.topic, p.partition, p.from, p.until)
  private var current: (Long, String, String) = _
  private var lastEmitted = p.from - 1
  private var resets = 0
  private var emittedAtLastReset = p.from - 1

  // an ITERATIVE retry loop, not a recursive next() (round-17,
  // ADVICE r16 #1): the reset cap intentionally resets to 0 on
  // forward progress, so a long-lived allAvailable task on an
  // aggressively-retained topic can recover many times — each
  // recursive frame would stay on the stack and eventually overflow;
  // the loop re-enters the same frame
  override def next(): Boolean = {
    while (true) {
      try {
        if (pager.hasNext) { current = pager.next(); lastEmitted = current._1; return true }
        else return false
      } catch {
        case e: KafkaWire.WireErrorException
            if e.code == KafkaWire.ErrOffsetOutOfRange =>
          if (p.failOnDataLoss)
            throw new IllegalStateException(
              s"offsets [${p.from}, ${p.until}) of ${p.topic}-${p.partition} " +
                "are partially deleted by retention; set failOnDataLoss=false " +
                "to skip to the earliest retained offset", e)
          // the cap guards NON-CONVERGENCE (stuck at the same point),
          // not total retention races: a long-lived allAvailable task
          // on an aggressively-retained topic can legitimately hit
          // many truncations, each one making forward progress
          if (lastEmitted > emittedAtLastReset) resets = 0
          emittedAtLastReset = lastEmitted
          resets += 1
          if (resets > 5)
            throw new IllegalStateException(
              s"data-loss recovery did not converge after $resets resets " +
                s"(${p.topic}-${p.partition})", e)
          try pager.close() catch { case _: Throwable => () }
          val earliest = KafkaWire.listOffset(
            p.host, p.port, p.topic, p.partition, earliest = true)
          System.err.println(s"[kafka-wire] data loss on ${p.topic}-${p.partition}: " +
            s"read up to $lastEmitted, earliest retained $earliest — skipping ahead")
          val resume = math.max(earliest, lastEmitted + 1)
          if (resume >= p.until) return false
          pager = new KafkaWire.RangePager(
            p.host, p.port, p.topic, p.partition, resume, p.until)
          // loop: retry the rebuilt pager
      }
    }
    false // unreachable
  }

  override def get(): InternalRow = new GenericInternalRow(Array[Any](
    if (current._2 == null) null else UTF8String.fromString(current._2),
    if (current._3 == null) null else UTF8String.fromString(current._3),
    p.partition, current._1))

  override def close(): Unit = pager.close()
}
