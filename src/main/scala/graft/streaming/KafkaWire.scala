package graft.streaming

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.CRC32C

/** K1, narrowed to the wire — the Kafka BINARY PROTOCOL produce path
  * as code (reference: `DataClean.java:99-109` configures a
  * transactional EXACTLY_ONCE producer; `kafkaProducer.java:17-41`
  * the plain one).
  *
  * [[KafkaEosSink]] proves the exactly-once LIFECYCLE against an
  * in-memory fake; this module removes the remaining gap the fake
  * leaves (round-12 "missing" item 1: no broker in the sandbox, so
  * the transport was never exercised) the same way the repo narrowed
  * the Redis and Elasticsearch items: implement the actual public
  * wire protocol over a real JDK TCP socket and exercise it against
  * an embedded server speaking the same protocol — real framing,
  * real RecordBatch v2 encoding with CRC-32C, real producer-epoch
  * fencing as a wire error, no Kafka jar.
  *
  * Protocol surface (public: kafka.apache.org/protocol; KIP-98 for
  * the transactional fields), deliberately pinned to NON-FLEXIBLE
  * versions so the classic INT16-length string / INT32-count array
  * encoding applies throughout:
  *   - FindCoordinator v1  (api 10) — transaction coordinator lookup
  *   - InitProducerId v0   (api 22) — PID + epoch; re-init on the
  *     same transactional.id BUMPS the epoch = zombie fencing
  *   - AddPartitionsToTxn v0 (api 24) — first send to a partition
  *     inside a transaction registers it with the coordinator
  *   - Produce v3          (api 0)  — transactional_id field + a
  *     RecordBatch v2 (magic 2) record set
  *   - EndTxn v0           (api 26) — commit/abort
  *   - Fetch v4            (api 1)  — isolation_level field
  *     (read_committed) for the restart-time progress-marker read
  *
  * RecordBatch v2 layout (KIP-98; the broker re-validates the CRC):
  * {{{
  * baseOffset:i64 batchLength:i32 partitionLeaderEpoch:i32 magic:i8=2
  * crc:u32 (CRC-32C of everything from attributes on)
  * attributes:i16 (bit 4 = transactional) lastOffsetDelta:i32
  * baseTimestamp:i64 maxTimestamp:i64
  * producerId:i64 producerEpoch:i16 baseSequence:i32
  * recordCount:i32 records*
  * record := length:zigzag-varint attrs:i8 tsDelta:zigzag-varlong
  *           offsetDelta:zigzag-varint keyLen:zigzag-varint key
  *           valLen:zigzag-varint val headerCount:zigzag-varint=0
  * }}}
  *
  * 100 TB posture: identical to the real client's — one
  * single-writer transactional producer per sink partition
  * (`transactionalId(ckpt, Some(partition))`), per-partition
  * monotonic sequences give broker-side idempotent dedup of retried
  * produce requests, and the epoch bump on `initTransactions` fences
  * a zombie predecessor at every subsequent request, not just at
  * init. Timestamps in produced batches are a fixed constant (the
  * repo-wide determinism rule); Kafka semantics never depend on them
  * here (LOG_APPEND_TIME brokers overwrite them anyway).
  */
object KafkaWire {

  // ---- api keys / error codes (public protocol constants) ----
  val ApiProduce = 0: Short
  val ApiFetch = 1: Short
  val ApiListOffsets = 2: Short
  val ApiMetadata = 3: Short
  val ApiOffsetCommit = 8: Short
  val ApiOffsetFetch = 9: Short
  val ApiFindCoordinator = 10: Short
  val ApiInitProducerId = 22: Short
  val ApiAddPartitionsToTxn = 24: Short
  val ApiEndTxn = 26: Short

  val ErrNone = 0: Short
  val ErrOffsetOutOfRange = 1: Short // fetch below earliest / beyond log end
  val ErrCorruptMessage = 2: Short // CRC mismatch
  val ErrUnknownTopic = 3: Short // UNKNOWN_TOPIC_OR_PARTITION — topic never produced
  val ErrNotLeader = 6: Short // leadership moved — retriable after re-resolve
  val ErrCoordinatorNotAvailable = 15: Short // retriable (caller-visible; the sink owns this retry)
  val ErrNotCoordinator = 16: Short // coordinator moved — re-resolve via FindCoordinator
  val ErrOutOfOrderSequence = 45: Short
  val ErrInvalidProducerEpoch = 47: Short // fenced

  final class FencedException(msg: String) extends RuntimeException(msg)
  final class WireErrorException(val code: Short, msg: String) extends RuntimeException(msg)

  /** Records per Produce RecordBatch in [[WireProducer.sendAll]] —
    * bounds the frame size (and the work a retried chunk replays)
    * while amortizing the round-trip ~1000x vs per-record sends. */
  val SendBatchRecords = 1000

  // ---- primitive codec: Kafka classic (non-flexible) encoding ----

  final class Writer {
    private var buf = new Array[Byte](256)
    private var pos = 0
    private def ensure(n: Int): Unit =
      if (pos + n > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, pos + n))
    def i8(v: Int): this.type = { ensure(1); buf(pos) = v.toByte; pos += 1; this }
    def i16(v: Int): this.type = { ensure(2); buf(pos) = (v >> 8).toByte; buf(pos + 1) = v.toByte; pos += 2; this }
    def i32(v: Int): this.type = { ensure(4); var i = 0; while (i < 4) { buf(pos + i) = (v >> (24 - 8 * i)).toByte; i += 1 }; pos += 4; this }
    def i64(v: Long): this.type = { ensure(8); var i = 0; while (i < 8) { buf(pos + i) = (v >> (56 - 8 * i)).toByte; i += 1 }; pos += 8; this }
    def bool(v: Boolean): this.type = i8(if (v) 1 else 0)
    def str(s: String): this.type = { val b = s.getBytes(UTF_8); i16(b.length); raw(b) }
    def nstr(s: String): this.type = if (s == null) i16(-1) else str(s)
    def nbytes(b: Array[Byte]): this.type = if (b == null) i32(-1) else { i32(b.length); raw(b) }
    def raw(b: Array[Byte]): this.type = { ensure(b.length); System.arraycopy(b, 0, buf, pos, b.length); pos += b.length; this }
    def varInt(v: Int): this.type = varLong((v.toLong << 1) ^ (v.toLong >> 31))
    def varLongZig(v: Long): this.type = varLong((v << 1) ^ (v >> 63))
    private def varLong(u0: Long): this.type = {
      var u = u0
      while ((u & ~0x7fL) != 0) { i8(((u & 0x7f) | 0x80).toInt); u >>>= 7 }
      i8(u.toInt)
    }
    def size: Int = pos
    /** Patch a previously-written big-endian i32 at `at`. */
    def patchI32(at: Int, v: Int): Unit = { var i = 0; while (i < 4) { buf(at + i) = (v >> (24 - 8 * i)).toByte; i += 1 } }
    def bytes: Array[Byte] = java.util.Arrays.copyOf(buf, pos)
  }

  final class Reader(val buf: Array[Byte], private var pos0: Int = 0) {
    def pos: Int = pos0
    def i8(): Byte = { val v = buf(pos0); pos0 += 1; v }
    def i16(): Short = { val v = (((buf(pos0) & 0xff) << 8) | (buf(pos0 + 1) & 0xff)).toShort; pos0 += 2; v }
    def i32(): Int = { var v = 0; var i = 0; while (i < 4) { v = (v << 8) | (buf(pos0 + i) & 0xff); i += 1 }; pos0 += 4; v }
    def i64(): Long = { var v = 0L; var i = 0; while (i < 8) { v = (v << 8) | (buf(pos0 + i) & 0xff); i += 1 }; pos0 += 8; v }
    def bool(): Boolean = i8() != 0
    def str(): String = { val n = i16(); require(n >= 0, "null string where non-null expected"); strN(n) }
    def nstr(): String = { val n = i16(); if (n < 0) null else strN(n) }
    private def strN(n: Int): String = { val s = new String(buf, pos0, n, UTF_8); pos0 += n; s }
    def nbytes(): Array[Byte] = { val n = i32(); if (n < 0) null else { val b = java.util.Arrays.copyOfRange(buf, pos0, pos0 + n); pos0 += n; b } }
    def varInt(): Int = { val u = varLongU(); ((u >>> 1) ^ -(u & 1)).toInt }
    def varLongZig(): Long = { val u = varLongU(); (u >>> 1) ^ -(u & 1) }
    def skip(n: Int): Unit = pos0 += n
    private def varLongU(): Long = {
      var u = 0L; var shift = 0; var b = 0
      do { b = buf(pos0) & 0xff; pos0 += 1; u |= (b & 0x7fL) << shift; shift += 7 } while ((b & 0x80) != 0)
      u
    }
    def remaining: Int = buf.length - pos0
  }

  // ---- RecordBatch v2 ----

  /** Fixed batch timestamp (determinism rule; see class doc). */
  val BatchTimestamp = 1546300800000L // 2019-01-01T00:00:00Z

  val AttrTransactional = 0x10
  val AttrControl = 0x20

  /** A decoded RecordBatch v2. `recordsWithDelta` carries each
    * record's OWN offsetDelta (compaction leaves gaps — absolute
    * offset is baseOffset + delta, never baseOffset + array index);
    * `control` marks transaction commit/abort markers (never data);
    * `lastOffsetDelta` is the batch's declared span, which survives
    * compaction even when trailing records were removed — the next
    * fetch offset is baseOffset + lastOffsetDelta + 1. (Round-16,
    * ADVICE r15 #1.) */
  case class Batch(baseOffset: Long, producerId: Long, producerEpoch: Short,
                   baseSequence: Int, transactional: Boolean, control: Boolean,
                   lastOffsetDelta: Int,
                   recordsWithDelta: Seq[(Int, String, String)], crcOk: Boolean) {
    def records: Seq[(String, String)] = recordsWithDelta.map(t => (t._2, t._3))
    def nextOffset: Long = baseOffset + lastOffsetDelta + 1
  }

  def encodeBatch(pid: Long, epoch: Short, baseSeq: Int, transactional: Boolean,
                  recs: Seq[(String, String)], baseOffset: Long = 0L,
                  control: Boolean = false): Array[Byte] = {
    val body = new Writer // attributes .. records (the CRC-covered span)
    body.i16((if (transactional) AttrTransactional else 0) |
      (if (control) AttrControl else 0))
    body.i32(recs.size - 1) // lastOffsetDelta
    body.i64(BatchTimestamp).i64(BatchTimestamp)
    body.i64(pid).i16(epoch).i32(baseSeq)
    body.i32(recs.size)
    recs.zipWithIndex.foreach { case ((k, v), i) =>
      val r = new Writer
      r.i8(0) // record attributes
      r.varLongZig(0L) // timestampDelta
      r.varInt(i) // offsetDelta
      val kb = if (k == null) null else k.getBytes(UTF_8)
      val vb = if (v == null) null else v.getBytes(UTF_8)
      if (kb == null) r.varInt(-1) else { r.varInt(kb.length); r.raw(kb) }
      if (vb == null) r.varInt(-1) else { r.varInt(vb.length); r.raw(vb) }
      r.varInt(0) // headers
      body.varInt(r.size); body.raw(r.bytes)
    }
    val bodyBytes = body.bytes
    val crc = new CRC32C; crc.update(bodyBytes)
    val out = new Writer
    out.i64(baseOffset)
    out.i32(4 + 1 + 4 + bodyBytes.length) // batchLength: partitionLeaderEpoch..end
    out.i32(-1) // partitionLeaderEpoch
    out.i8(2) // magic
    out.i32(crc.getValue.toInt)
    out.raw(bodyBytes)
    out.bytes
  }

  /** Decodes ONE batch starting at `r`'s position; re-validates CRC. */
  def decodeBatch(r: Reader): Batch = {
    val baseOffset = r.i64()
    val batchLen = r.i32()
    val afterLen = r.pos
    r.i32() // partitionLeaderEpoch
    val magic = r.i8(); require(magic == 2, s"unsupported magic $magic")
    val crcStored = r.i32()
    val bodyStart = r.pos
    val bodyLen = batchLen - (bodyStart - afterLen)
    val crc = new CRC32C; crc.update(r.buf, bodyStart, bodyLen)
    val crcOk = crc.getValue.toInt == crcStored
    val attrs = r.i16()
    val lastOffsetDelta = r.i32()
    r.i64(); r.i64() // timestamps
    val pid = r.i64(); val epoch = r.i16(); val baseSeq = r.i32()
    val n = r.i32()
    val recs = (0 until n).map { _ =>
      val len = r.varInt(); val end = r.pos + len
      r.i8(); r.varLongZig()
      val delta = r.varInt() // the record's OWN offset delta
      val kl = r.varInt()
      val k = if (kl < 0) null else { val s = new String(r.buf, r.pos, kl, UTF_8); r.skip(kl); s }
      val vl = r.varInt()
      val v = if (vl < 0) null else { val s = new String(r.buf, r.pos, vl, UTF_8); r.skip(vl); s }
      r.skip(end - r.pos) // headers (count + any content)
      (delta, k, v)
    }
    Batch(baseOffset, pid, epoch, baseSeq, (attrs & AttrTransactional) != 0,
      (attrs & AttrControl) != 0, lastOffsetDelta, recs, crcOk)
  }

  // ---- request framing ----

  private def frame(apiKey: Short, apiVersion: Short, correlationId: Int,
                    clientId: String, body: Writer => Unit): Array[Byte] = {
    val w = new Writer
    w.i32(0) // length, patched below
    w.i16(apiKey).i16(apiVersion).i32(correlationId).nstr(clientId)
    body(w)
    w.patchI32(0, w.size - 4)
    w.bytes
  }

  private def readFrame(in: DataInputStream): Array[Byte] = {
    val len = in.readInt()
    require(len >= 0 && len < 64 * 1024 * 1024, s"bad frame length $len")
    val b = new Array[Byte](len); in.readFully(b); b
  }

  // ---- wire client ----

  /** A single connection speaking length-framed request/response. */
  private final class Conn(host: String, port: Int, clientId: String) {
    private val sock = new Socket()
    sock.connect(new InetSocketAddress(host, port), 5000)
    sock.setSoTimeout(10000)
    private val out = new DataOutputStream(sock.getOutputStream)
    private val in = new DataInputStream(sock.getInputStream)
    private var corr = 0
    def request(apiKey: Short, apiVersion: Short)(body: Writer => Unit): Reader = {
      corr += 1
      out.write(frame(apiKey, apiVersion, corr, clientId, body)); out.flush()
      val resp = new Reader(readFrame(in))
      val gotCorr = resp.i32()
      require(gotCorr == corr, s"correlation mismatch: $gotCorr vs $corr")
      resp
    }
    def close(): Unit = sock.close()
  }

  /** The transactional producer over the wire — drop-in
    * [[KafkaEosSink.TxProducer]], so [[KafkaEosSink.Sink]] runs its
    * exactly-once lifecycle over real TCP with zero logic changes. */
  final class WireProducer(host: String, port: Int, transactionalId: String)
      extends KafkaEosSink.TxProducer {
    private var pid = -1L
    private var epoch: Short = -1
    private val seqs = scala.collection.mutable.Map[(String, Int), Int]()
    private val inTxn = scala.collection.mutable.Set[(String, Int)]()
    // ROUTE TABLES, like a real kafka-clients producer (round-18):
    // one connection per broker address, the coordinator resolved via
    // FindCoordinator (re-resolved on NOT_COORDINATOR — the
    // coordinator moves with __transaction_state leadership), data
    // produces routed per partition via Metadata (re-resolved on
    // NOT_LEADER — a retried Produce reuses the same baseSequence, so
    // broker-side idempotent dedup makes the failover exactly-once
    // even if the first attempt landed and only its response died)
    private val conns = scala.collection.mutable.Map[(String, Int), Conn]()
    private var coordAddr: Option[(String, Int)] = None
    private val routes = scala.collection.mutable.Map[(String, Int), (String, Int)]()

    private def connTo(addr: (String, Int)): Conn =
      conns.getOrElseUpdate(addr,
        new Conn(addr._1, addr._2, s"graft-wire-$transactionalId"))

    private def check(code: Short, what: String): Unit = code match {
      case ErrNone => ()
      case ErrInvalidProducerEpoch =>
        throw new FencedException(s"$what: fenced by a newer producer with transactional.id=$transactionalId")
      case c => throw new WireErrorException(c, s"$what failed with error $c")
    }

    /** Coordinator lookup against the BOOTSTRAP (any node answers the
      * lookup; the answer is the coordinator's address). */
    private def findCoordinator(): (String, Int) = {
      val fc = connTo((host, port))
        .request(ApiFindCoordinator, 1) { w => w.str(transactionalId); w.i8(1) }
      fc.i32() // throttle
      check(fc.i16(), "FindCoordinator")
      fc.nstr() // error_message
      fc.i32() // node_id
      val h = fc.str(); val p = fc.i32()
      (h, p)
    }

    /** Run a txn-API request against the current coordinator; on
      * NOT_COORDINATOR (16) re-resolve via FindCoordinator and retry
      * (bounded). COORDINATOR_NOT_AVAILABLE (15) still propagates —
      * that retry belongs to the sink's commit protocol, and
      * swallowing it here would change the exactly-once contract
      * KafkaWireSpec pins. */
    private def onCoordinator[T](what: String)(attempt: Conn => (Short, T)): T = {
      var attempts = 0
      while (true) {
        val addr = coordAddr.getOrElse {
          val a = findCoordinator(); coordAddr = Some(a); a
        }
        val err: Short =
          try {
            val (e, v) = attempt(connTo(addr))
            if (e != ErrNotCoordinator || attempts >= 3) { check(e, what); return v }
            e
          } catch {
            // torn coordinator socket: evict the dead cached Conn and
            // re-resolve — the driver-side EOS sink holds ONE producer
            // across micro-batches, so a poisoned cached connection
            // would fail every subsequent batch even after the broker
            // returns. Safe to retry all three txn APIs: InitProducerId
            // and AddPartitionsToTxn are idempotent at the coordinator,
            // and a replayed EndTxn on an already-finished transaction
            // finds no open batches (an extra control marker is
            // admission-invisible — read_committed skips control
            // batches), matching the real coordinator's dedup.
            case e: java.io.IOException if attempts < 3 =>
              conns.remove(addr).foreach(c =>
                try c.close() catch { case _: Throwable => () })
              ErrNotCoordinator // reuse the re-resolve arm below
          }
        attempts += 1
        coordAddr = None // next loop re-resolves
        System.err.println(s"[kafka-wire] $what re-resolving coordinator " +
          s"(attempt $attempts)")
      }
      throw new IllegalStateException("unreachable")
    }

    def initTransactions(): Unit = {
      val (p, e) = onCoordinator("InitProducerId") { c =>
        val ip = c.request(ApiInitProducerId, 0) { w =>
          w.nstr(transactionalId); w.i32(60000) }
        ip.i32() // throttle
        val err = ip.i16()
        (err, if (err == ErrNone) (ip.i64(), ip.i16()) else (-1L, -1: Short))
      }
      pid = p; epoch = e
      seqs.clear() // fresh PID epoch starts sequences at 0
    }

    def beginTransaction(): Unit = {
      require(pid >= 0, "initTransactions not called")
      inTxn.clear()
    }

    /** Register (topic, 0) with the transaction coordinator on the
      * transaction's first send to it. */
    private def ensureInTxn(topic: String): Unit = {
      val tp = (topic, 0)
      if (!inTxn.contains(tp)) {
        onCoordinator("AddPartitionsToTxn") { c =>
          val ap = c.request(ApiAddPartitionsToTxn, 0) { w =>
            w.str(transactionalId).i64(pid).i16(epoch)
            w.i32(1); w.str(topic); w.i32(1); w.i32(0)
          }
          ap.i32() // throttle
          val nTopics = ap.i32()
          var err: Short = ErrNone
          (0 until nTopics).foreach { _ =>
            ap.str(); val nParts = ap.i32()
            (0 until nParts).foreach { _ => ap.i32(); val e = ap.i16(); if (e != ErrNone) err = e }
          }
          (err, ())
        }
        inTxn += tp
      }
    }

    def send(topic: String, key: String, value: String): Unit =
      sendAll(topic, Seq((key, value)))

    /** One multi-record RecordBatch per [[SendBatchRecords]]-record
      * chunk — N rows cost ceil(N/chunk) Produce round-trips, not N
      * (round-18 review). The batch consumes `records.size` sequence
      * slots, so broker-side idempotent dedup covers a retried chunk
      * exactly as it covers a retried single record. */
    override def sendAll(topic: String, records: Seq[(String, String)]): Unit = {
      if (records.isEmpty) return
      ensureInTxn(topic)
      val tp = (topic, 0)
      records.grouped(SendBatchRecords).foreach { group =>
        val seq = seqs.getOrElse(tp, 0)
        produceRaw(topic, 0,
          encodeBatch(pid, epoch, seq, transactional = true, group))
        seqs(tp) = seq + group.size
      }
    }

    private[graft] def currentPidEpoch: (Long, Short) = (pid, epoch)

    /** One Produce v3 request with a caller-built record set — the
      * seam the spec uses to replay an identical request (broker-side
      * idempotent dedup) and to submit a corrupted batch. Routed to
      * the partition's LEADER; on NOT_LEADER the route is re-resolved
      * via Metadata and the SAME batch is retried (same baseSequence —
      * the broker dedups if the first attempt actually appended), so
      * an election during an open transaction loses nothing and
      * duplicates nothing. */
    private[graft] def produceRaw(topic: String, partition: Int, recordSet: Array[Byte]): Long = {
      val tp = (topic, partition)
      var attempts = 0
      while (true) {
        val addr = routes.getOrElse(tp, (host, port))
        val attempt: Either[Short, Long] =
          try {
            val pr = connTo(addr).request(ApiProduce, 3) { w =>
              w.nstr(transactionalId).i16(-1 /* acks=all */).i32(30000)
              w.i32(1); w.str(topic); w.i32(1); w.i32(partition); w.nbytes(recordSet)
            }
            val nTopics = pr.i32()
            var err: Short = ErrNone; var baseOffset = -1L
            (0 until nTopics).foreach { _ =>
              pr.str(); val nParts = pr.i32()
              (0 until nParts).foreach { _ =>
                pr.i32(); val e = pr.i16(); val off = pr.i64(); pr.i64() // log_append_time
                if (e != ErrNone) err = e else baseOffset = off
              }
            }
            pr.i32() // throttle
            if (err == ErrNone) Right(baseOffset) else Left(err)
          } catch {
            // torn connection: the request may or may not have
            // APPENDED before the socket died (the response-lost-after-
            // append case is THE classic duplicate scenario) — dropping
            // the dead connection and retrying the SAME record set is
            // exactly-once because the broker dedups by (pid,
            // baseSequence); a retried already-appended batch answers
            // ErrNone without appending again
            case e: java.io.IOException if attempts < 5 =>
              conns.remove(addr).foreach(c =>
                try c.close() catch { case _: Throwable => () })
              Left(ErrNotLeader) // reuse the re-resolve + retry arm below
          }
        attempt match {
          case Right(off) => return off
          case Left(err) if err == ErrNotLeader && attempts < 5 =>
            attempts += 1
            resolveLeader(host, port, topic, partition)
              .foreach(routes(tp) = _)
            System.err.println(s"[kafka-wire] $topic-$partition produce " +
              s"retry via ${routes.getOrElse(tp, (host, port))} " +
              s"(attempt $attempts)")
          case Left(err) => check(err, "Produce")
        }
      }
      throw new IllegalStateException("unreachable")
    }

    private def endTxn(committed: Boolean): Unit =
      onCoordinator("EndTxn") { c =>
        val et = c.request(ApiEndTxn, 0) { w =>
          w.str(transactionalId).i64(pid).i16(epoch).bool(committed)
        }
        et.i32() // throttle
        (et.i16(), ())
      }
    def commitTransaction(): Unit = endTxn(committed = true)
    def abortTransaction(): Unit = endTxn(committed = false)
    def close(): Unit = {
      conns.values.foreach(c => try c.close() catch { case _: Throwable => () })
      conns.clear()
    }
  }

  /** One decoded Fetch v4 round-trip: `lso` is the last stable
    * offset (the read_committed admission bound), `records` the
    * admitted (offset, key, value) triples, `next` the offset to
    * continue a multi-fetch scan from (last decoded batch's
    * baseOffset + lastOffsetDelta + 1, or `from` when nothing
    * decoded). */
  private final case class FetchPage(lso: Long,
      records: Vector[(Long, String, String)], next: Long)

  /** The read_committed admission a real broker demands (round-16,
    * ADVICE r15 #1) — everything the previous single-pass decode
    * skipped:
    *  - admit only offsets BELOW last_stable_offset (hwm can exceed
    *    it while transactions are in flight; reading up to hwm would
    *    surface uncommitted data);
    *  - honor the aborted_transactions list: a data batch from
    *    producer P is dropped from the first_offset of P's aborted
    *    span until P's next control marker (Kafka's own consumer
    *    algorithm);
    *  - skip control batches entirely (txn commit/abort markers are
    *    not data);
    *  - per-record offsets from each record's OWN offsetDelta
    *    (compaction leaves gaps — baseOffset + array index is wrong);
    *  - tolerate a truncated trailing batch (a broker honoring
    *    max_bytes may cut the last batch mid-frame; the next fetch
    *    re-reads it). */
  private def fetchOnce(c: Conn, topic: String, partition: Int,
      from: Long): FetchPage = {
    val f = c.request(ApiFetch, 4) { w =>
      w.i32(-1) // replica_id (consumer)
      w.i32(100).i32(1).i32(8 * 1024 * 1024)
      w.i8(1) // isolation_level = read_committed
      w.i32(1); w.str(topic); w.i32(1)
      w.i32(partition); w.i64(from); w.i32(8 * 1024 * 1024)
    }
    f.i32() // throttle
    var lso = 0L
    var next = from
    val out = Vector.newBuilder[(Long, String, String)]
    val nTopics = f.i32()
    (0 until nTopics).foreach { _ =>
      f.str(); val nParts = f.i32()
      (0 until nParts).foreach { _ =>
        f.i32() // partition
        val err = f.i16()
        if (err != ErrNone) throw new WireErrorException(err, s"Fetch error $err")
        f.i64() // high_watermark — NOT the admission bound
        lso = f.i64() // last_stable_offset IS
        val nAborted = f.i32()
        val aborted = (0 until math.max(nAborted, 0))
          .map { _ => (f.i64(), f.i64()) } // (producer_id, first_offset)
          .sortBy(_._2)
        val recordSet = f.nbytes()
        if (recordSet != null && recordSet.nonEmpty) {
          val r = new Reader(recordSet)
          var ai = 0
          val abortedPids = scala.collection.mutable.Set[Long]()
          var truncated = false
          while (!truncated && r.remaining > 0) {
            // a truncated trailing batch (max_bytes cut) is not an
            // error — stop; the NEXT fetch restarts at `next`, which
            // only ever advances past FULLY decoded batches
            if (r.remaining < 12) truncated = true
            else {
              val peek = new Reader(r.buf, r.pos)
              peek.i64() // baseOffset
              val batchLen = peek.i32()
              if (r.remaining < 12 + batchLen) truncated = true
              else {
                val b = decodeBatch(r)
                require(b.crcOk, "corrupt batch in fetch response")
                // enter aborted spans whose first_offset we've reached
                while (ai < aborted.size && aborted(ai)._2 <= b.baseOffset) {
                  abortedPids += aborted(ai)._1; ai += 1
                }
                if (b.control) {
                  // the txn marker ENDS the producer's aborted span;
                  // control records themselves are never data
                  abortedPids -= b.producerId
                } else if (!(b.transactional && abortedPids.contains(b.producerId))) {
                  b.recordsWithDelta.foreach { case (d, k, v) =>
                    val off = b.baseOffset + d
                    if (off >= from && off < lso) out += ((off, k, v))
                  }
                }
                next = math.max(next, b.nextOffset)
              }
            }
          }
        }
      }
    }
    FetchPage(lso, out.result(), next)
  }

  /** Restart-time progress-marker read: Fetch v4 with
    * isolation_level=read_committed over the progress topic, decode
    * the returned RecordBatches, take the last marker for `txId`.
    * The real production consumer is exactly this in kafka-clients
    * form ([[KafkaEosSink.Sink]] doc). Loops pages so a long progress
    * log (or an 8 MB-capped response) is still read to its end. */
  def readLastCommitted(host: String, port: Int, progressTopic: String, txId: String): Long = {
    var last = -1L
    // seed at the broker's log-start, not 0: a progress topic under
    // compact,delete retention has no offset 0 anymore, and a scan
    // from 0 would be OFFSET_OUT_OF_RANGE forever (crash-looping
    // every restart) — the same fix as the source's earliest start
    var cur = listOffset(host, port, progressTopic, 0, earliest = true)
    var done = false
    while (!done) {
      // per page through the shared leader-retry (round-18 review:
      // this restart path previously pinned ONE bootstrap socket — on
      // a cluster whose progress-topic leader is another node, every
      // restart crash-looped on NOT_LEADER)
      val page = withLeaderRetry(host, port, progressTopic, 0,
        s"graft-marker-$txId")(fetchOnce(_, progressTopic, 0, cur))
      page.records.foreach { case (_, k, v) =>
        // a compacted-away marker leaves a null-value tombstone:
        // "no marker anymore", never an NPE
        if (k == txId) last = if (v == null) -1L else v.toLong
      }
      if (page.next <= cur || page.next >= page.lso) done = true else cur = page.next
    }
    last
  }

  /** Fetch v4 with isolation_level=read_committed for ONE
    * topic-partition from offset `from`: returns (last_stable_offset,
    * admitted (offset, key, value) triples at offset >= `from`) from
    * a SINGLE fetch round-trip. The offset bound a caller should use
    * for admission planning is the returned LSO (committed data
    * only). This is the consumer read the reference jobs start from
    * (`DataClean.java:58-66`) — [[graft.sources.KafkaWireSource]]
    * mounts it as a Spark MicroBatchStream; its per-task reader
    * constructs a [[RangePager]] directly (lazy paging until the
    * planned range is covered). */
  /** ONE leader-routed transient-retry posture for every
    * driver/restart-time call (round-18 review: four hand-copied
    * retry loops had drifted — one lacked the IOException arm, two
    * built the Conn outside the guarded region so a connect-time
    * ConnectException bypassed the whole budget). Per attempt: open a
    * fresh connection to the current route INSIDE the guard, run
    * `body`; NOT_LEADER re-resolves the partition leader via the
    * bootstrap's Metadata (an in-flight election or metadata hiccup
    * falls back to retry-in-place); IOException (including connect
    * failures) retries the current route. Everything else — including
    * OFFSET_OUT_OF_RANGE, the data-loss contract — propagates. */
  private def withLeaderRetry[T](bootHost: String, bootPort: Int,
      topic: String, partition: Int, clientId: String,
      maxRetries: Int = 5)(body: Conn => T): T = {
    var (rh, rp) = (bootHost, bootPort)
    var attempts = 0
    while (true) {
      var c: Conn = null
      try {
        c = new Conn(rh, rp, clientId)
        return body(c)
      } catch {
        case e: WireErrorException if e.code == ErrNotLeader &&
            attempts < maxRetries =>
          attempts += 1
          resolveLeader(bootHost, bootPort, topic, partition)
            .foreach { l => rh = l._1; rp = l._2 }
          System.err.println(s"[kafka-wire] $topic-$partition retry via " +
            s"$rh:$rp after NOT_LEADER (attempt $attempts)")
        case e: java.io.IOException if attempts < maxRetries =>
          // a torn socket may mean the LEADER HOST died (connect
          // refused forever), not just a dropped packet — re-resolve
          // via the bootstrap like the NOT_LEADER arm (real
          // kafka-clients refresh metadata on disconnect; round-19
          // advice), so the retry budget is spent on the new leader
          // instead of burned against a dead address. produceRaw gets
          // the same behavior by mapping IOException into its
          // NOT_LEADER re-resolve arm.
          attempts += 1
          resolveLeader(bootHost, bootPort, topic, partition)
            .foreach { l => rh = l._1; rp = l._2 }
          System.err.println(s"[kafka-wire] $topic-$partition retry via " +
            s"$rh:$rp after ${e.getClass.getSimpleName} (attempt $attempts)")
      } finally if (c != null) { try c.close() catch { case _: Throwable => () } }
    }
    throw new IllegalStateException("unreachable")
  }

  def fetchCommitted(host: String, port: Int, topic: String, partition: Int,
      from: Long): (Long, Vector[(Long, String, String)]) =
    // the driver's per-trigger LSO poll rides this: one NOT_LEADER or
    // torn socket must not fail the whole streaming query
    withLeaderRetry(host, port, topic, partition,
        s"graft-fetch-$topic-$partition") { c =>
      val page = fetchOnce(c, topic, partition, from)
      (page.lso, page.records)
    }

  /** ListOffsets v1: the broker's EARLIEST retained offset (timestamp
    * -2) or log-end offset (timestamp -1) for one topic-partition —
    * how a real consumer discovers where a retention-truncated log
    * begins. `startingOffsets=earliest` must start HERE, not at 0:
    * on a topic whose head has been deleted by retention, offset 0 no
    * longer exists and fetching it is OFFSET_OUT_OF_RANGE. */
  def listOffset(host: String, port: Int, topic: String, partition: Int,
      earliest: Boolean): Long =
    // rides the same per-trigger driver poll as fetchCommitted — the
    // shared retry posture (NOT_LEADER re-route + IOException retry)
    withLeaderRetry(host, port, topic, partition,
        s"graft-listoff-$topic-$partition") { c =>
      val r = c.request(ApiListOffsets, 1) { w =>
        w.i32(-1) // replica_id (consumer)
        w.i32(1); w.str(topic); w.i32(1)
        w.i32(partition); w.i64(if (earliest) -2L else -1L)
      }
      var off = -1L
      val nTopics = r.i32()
      (0 until nTopics).foreach { _ =>
        r.str(); val nParts = r.i32()
        (0 until nParts).foreach { _ =>
          r.i32() // partition
          val err = r.i16()
          if (err != ErrNone) throw new WireErrorException(err, s"ListOffsets error $err")
          r.i64() // timestamp
          off = r.i64()
        }
      }
      off
    }

  /** Metadata v1: the partition→leader route a real Kafka client keeps
    * (kafka.apache.org/protocol, Metadata API key 3). Returns the
    * leader broker's (host, port) for one topic-partition, or None if
    * the bootstrap broker doesn't know a live leader (election in
    * flight → leader_id -1). This is what the reference's
    * `FlinkKafkaConsumer011` gets from kafka-clients for free
    * (`DataClean.java:58-66`): on NOT_LEADER the client must ask the
    * CLUSTER where the partition moved, not hammer the same socket —
    * against a real multi-broker cluster a moved leader means the old
    * retry-in-place posture burns its whole budget on the wrong
    * broker. Callers treat the constructor address as the BOOTSTRAP
    * (always queried for metadata) and the resolved address as the
    * current route. */
  /** The GROUP coordinator's address (FindCoordinator v1, key type 0
    * — the group id, per protocol; the embedded cluster places the
    * group coordinator with the txn coordinator, which moveCoordinator
    * moves for both). */
  private def findGroupCoordinator(bootHost: String, bootPort: Int,
      group: String): (String, Int) = {
    val c = new Conn(bootHost, bootPort, s"graft-findcoord-$group")
    try {
      val fc = c.request(ApiFindCoordinator, 1) { w => w.str(group); w.i8(0) }
      fc.i32() // throttle
      val err = fc.i16()
      if (err != ErrNone) throw new WireErrorException(err, s"FindCoordinator error $err")
      fc.nstr() // error_message
      fc.i32() // node_id
      val h = fc.str(); val p = fc.i32()
      (h, p)
    } finally c.close()
  }

  /** Run a group-offset request against the group COORDINATOR — the
    * protocol's routing (a partition leader is the WRONG node for
    * these; round-19 review): resolve via FindCoordinator, on
    * NOT_COORDINATOR or a torn socket re-resolve and retry bounded. */
  private def onGroupCoordinator[T](bootHost: String, bootPort: Int,
      group: String, what: String)(body: Conn => (Short, T)): T = {
    var addr: Option[(String, Int)] = None
    var attempts = 0
    while (attempts <= 3) {
      val a = addr.getOrElse {
        val x = findGroupCoordinator(bootHost, bootPort, group)
        addr = Some(x); x
      }
      var c: Conn = null
      try {
        c = new Conn(a._1, a._2, s"graft-group-$group")
        val (err, v) = body(c)
        if (err == ErrNone) return v
        if (err != ErrNotCoordinator || attempts >= 3)
          throw new WireErrorException(err, s"$what error $err")
        addr = None // coordinator moved — re-resolve
      } catch {
        case _: java.io.IOException if attempts < 3 => addr = None
      } finally if (c != null) { try c.close() catch { case _: Throwable => () } }
      attempts += 1
    }
    throw new IllegalStateException("unreachable")
  }

  /** OffsetCommit v2: publish a consumer group's position so EXTERNAL
    * lag monitors (burrow-style group-offset pollers, `kafka-consumer-
    * groups.sh`) can watch the pipeline. The ENGINE never reads these
    * back for progress — Spark checkpoints are the source of truth
    * (the same posture as Spark's own Kafka source; CONNECTORS.md,
    * consumer-group section). Coordinator-routed with bounded
    * re-resolve, so a moved coordinator or torn socket does not fail
    * an observability write's caller spuriously. */
  def commitOffsets(host: String, port: Int, group: String, topic: String,
      offsets: Map[Int, Long]): Unit =
    onGroupCoordinator(host, port, group, "OffsetCommit") { c =>
      val r = c.request(ApiOffsetCommit, 2) { w =>
        w.str(group).i32(-1).str("").i64(-1L) // generation, member, retention
        w.i32(1); w.str(topic); w.i32(offsets.size)
        offsets.toSeq.sortBy(_._1).foreach { case (p, o) =>
          w.i32(p).i64(o).nstr(null)
        }
      }
      var err: Short = ErrNone
      (0 until r.i32()).foreach { _ =>
        r.str()
        (0 until r.i32()).foreach { _ =>
          r.i32()
          val e = r.i16()
          if (e != ErrNone) err = e
        }
      }
      (err, ())
    }

  /** OffsetFetch v1: a group's committed offsets per partition; -1 =
    * no position committed yet. The read half of the lag-monitor
    * surface (lag = ListOffsets log-end − this). */
  def fetchGroupOffsets(host: String, port: Int, group: String,
      topic: String, parts: Seq[Int]): Map[Int, Long] =
    onGroupCoordinator(host, port, group, "OffsetFetch") { c =>
      val r = c.request(ApiOffsetFetch, 1) { w =>
        w.str(group); w.i32(1); w.str(topic)
        w.i32(parts.size); parts.foreach(w.i32(_))
      }
      var err: Short = ErrNone
      val out = (0 until r.i32()).flatMap { _ =>
        r.str()
        (0 until r.i32()).map { _ =>
          val p = r.i32(); val off = r.i64(); r.nstr()
          val e = r.i16()
          if (e != ErrNone) err = e
          p -> off
        }
      }.toMap
      (err, out)
    }

  /** Broker registry via Metadata with an EMPTY topics array (brokers
    * only — asking for a topic that does not exist yet would answer
    * UNKNOWN_TOPIC). Used by [[defaultLeaderRoute]]. */
  private def metadataBrokers(bootHost: String, bootPort: Int): Map[Int, (String, Int)] = {
    val c = new Conn(bootHost, bootPort, "graft-meta-brokers")
    try {
      val r = c.request(ApiMetadata, 1) { w => w.i32(0) }
      val brokers = (0 until r.i32()).map { _ =>
        val id = r.i32(); val h = r.str(); val p = r.i32(); r.nstr()
        id -> ((h, p))
      }.toMap
      // drain the rest of the response (controller + topics)
      r.i32()
      (0 until r.i32()).foreach { _ =>
        r.i16(); r.str(); r.bool()
        (0 until r.i32()).foreach { _ =>
          r.i16(); r.i32(); r.i32()
          (0 until r.i32()).foreach(_ => r.i32())
          (0 until r.i32()).foreach(_ => r.i32())
        }
      }
      brokers
    } finally c.close()
  }

  /** The cluster's DEFAULT-leader route (lowest node id) — where a
    * topic that does not exist YET will be led once its first produce
    * creates it. The consumer-side compensation for Metadata's honest
    * UNKNOWN_TOPIC answer (round-19 review): a reader polling a
    * not-yet-produced topic from a non-leader bootstrap must route to
    * the node that will lead it, not burn its retry budget in place. */
  private def defaultLeaderRoute(bootHost: String, bootPort: Int): Option[(String, Int)] =
    metadataBrokers(bootHost, bootPort).minByOption(_._1).map(_._2)

  /** [[metadataLeader]] with the UNKNOWN_TOPIC → default-leader
    * fallback; None on any resolution failure (the caller keeps its
    * current route). The shared re-resolve arm for every retry path. */
  private def resolveLeader(bootHost: String, bootPort: Int, topic: String,
      partition: Int): Option[(String, Int)] =
    try metadataLeader(bootHost, bootPort, topic, partition)
    catch {
      case e: WireErrorException if e.code == ErrUnknownTopic =>
        try defaultLeaderRoute(bootHost, bootPort)
        catch { case _: java.io.IOException | _: WireErrorException => None }
      case _: java.io.IOException | _: WireErrorException => None
    }

  def metadataLeader(bootHost: String, bootPort: Int, topic: String,
      partition: Int): Option[(String, Int)] = {
    val c = new Conn(bootHost, bootPort, s"graft-meta-$topic-$partition")
    try {
      val r = c.request(ApiMetadata, 1) { w =>
        w.i32(1); w.str(topic) // topics array, size 1
      }
      // brokers: [node_id host port rack]
      val brokers = (0 until r.i32()).map { _ =>
        val id = r.i32(); val h = r.str(); val p = r.i32(); r.nstr()
        id -> ((h, p))
      }.toMap
      r.i32() // controller_id
      var leader = -1
      (0 until r.i32()).foreach { _ => // topics
        val terr = r.i16(); r.str(); r.bool() // error, name, is_internal
        if (terr != ErrNone) throw new WireErrorException(terr, s"Metadata error $terr")
        (0 until r.i32()).foreach { _ => // partitions
          r.i16() // partition error (leader -1 carries the signal)
          val pt = r.i32(); val ld = r.i32()
          (0 until r.i32()).foreach(_ => r.i32()) // replicas
          (0 until r.i32()).foreach(_ => r.i32()) // isr
          if (pt == partition) leader = ld
        }
      }
      brokers.get(leader)
    } finally c.close()
  }

  /** LAZILY-paged reader of the planned range [from, until): each
    * `hasNext` fetches at most one page from the last fully-decoded
    * offset — the loop Spark's own Kafka reader runs (round-16,
    * ADVICE r15 #2: a single 8 MB-capped fetch silently dropped the
    * tail of a large planned range). Lazy because a planned range can
    * be the whole backlog (ReadLimit.allAvailable) — materializing it
    * into one Vector before emitting the first row would hold GBs on
    * the executor; this holds ONE page. Throws if the broker stops
    * making progress before `until` (a planned range is committed
    * data, so anything short is loss); close() releases the socket. */
  final class RangePager(host: String, port: Int, topic: String,
      partition: Int, from: Long, until: Long)
      extends Iterator[(Long, String, String)] with AutoCloseable {
    // the constructor address is the BOOTSTRAP; (rHost, rPort) is the
    // current partition-leader route, re-resolved via Metadata on
    // NOT_LEADER — the route table a real kafka-clients consumer keeps
    private var rHost = host
    private var rPort = port
    // lazily connected INSIDE fetchPage's guard: a connect-time
    // ConnectException (broker restarting) must consume retry budget,
    // not fail construction / escape the catch (round-18 review)
    private var c: Conn = null
    private var cur = from
    private var buf: Iterator[(Long, String, String)] = Iterator.empty
    private var done = from >= until

    /** Transient-fault budget PER PAGE: NOT_LEADER (leadership moved
      * mid-read — hourly weather on a big cluster) re-resolves the
      * partition's leader via Metadata v1 against the bootstrap and
      * reconnects THERE (round-18, VERDICT r17 missing #1 — the old
      * reconnect-in-place burned the budget against the wrong broker
      * when leadership actually moved); torn connections (broker cut
      * the socket mid-RecordBatch, short read, restart) reconnect to
      * the current route. Fetches are idempotent reads at explicit
      * offsets and `cur` only advances past FULLY decoded pages, so
      * a retried page can neither lose nor duplicate records.
      * OFFSET_OUT_OF_RANGE is NOT retried here — it is the data-loss
      * signal the source's failOnDataLoss contract owns. */
    private val MaxTransientRetries = 5

    private def fetchPage(offset: Long): FetchPage = {
      var attempts = 0
      while (true) {
        try {
          if (c == null) c = new Conn(rHost, rPort, s"graft-fetch-$topic-$partition")
          return fetchOnce(c, topic, partition, offset)
        } catch {
          case e: WireErrorException if e.code == ErrNotLeader &&
              attempts < MaxTransientRetries =>
            attempts += 1
            reroute(s"NOT_LEADER (attempt $attempts)")
          case e: java.io.IOException if attempts < MaxTransientRetries =>
            attempts += 1
            dropConn(s"connection lost: ${e.getClass.getSimpleName} (attempt $attempts)")
        }
      }
      throw new IllegalStateException("unreachable")
    }

    /** NOT_LEADER recovery: ask the bootstrap broker's Metadata where
      * the partition moved; an unreachable bootstrap or an in-flight
      * election (leader -1) falls back to reconnect-in-place — the
      * next attempt re-resolves. */
    private def reroute(why: String): Unit = {
      resolveLeader(host, port, topic, partition) match {
        case Some((lh, lp)) => rHost = lh; rPort = lp
        case None => ()
      }
      dropConn(s"$why → leader $rHost:$rPort")
    }

    /** Drop the (possibly dead) connection; the NEXT fetchPage
      * attempt reconnects INSIDE its guard, so a connect failure
      * during recovery also consumes budget instead of escaping. */
    private def dropConn(why: String): Unit = {
      System.err.println(s"[kafka-wire] $topic-$partition fetch retry after $why")
      if (c != null) { try c.close() catch { case _: Throwable => () }; c = null }
    }

    override def hasNext: Boolean = {
      while (!buf.hasNext && !done) {
        val page = fetchPage(cur)
        buf = page.records.iterator.filter { case (o, _, _) => o >= from && o < until }
        if (page.next >= until) done = true
        else if (page.next <= cur)
          throw new IllegalStateException(
            s"fetch stalled at offset ${page.next} before planned end $until " +
              s"($topic-$partition, lso=${page.lso})")
        else cur = page.next
      }
      buf.hasNext
    }
    override def next(): (Long, String, String) = {
      if (!hasNext) throw new NoSuchElementException("range exhausted")
      buf.next()
    }
    override def close(): Unit = if (c != null) c.close()
  }

  /** Strict form of [[RangePager]]: the whole range as a Vector (spec
    * and bounded-range callers — the progress-marker restore path has
    * its own loop). */
  def fetchCommittedRange(host: String, port: Int, topic: String, partition: Int,
      from: Long, until: Long): Vector[(Long, String, String)] = {
    val pager = new RangePager(host, port, topic, partition, from, until)
    try pager.toVector finally pager.close()
  }

  // ---- embedded broker ----

  /** A single-node broker speaking the six-API surface above, with
    * the REAL log model (round-16): produced batches — including
    * transactional data that will later abort — append to the log
    * immediately and permanently, exactly as a real broker's log
    * works; EndTxn appends a CONTROL batch (commit/abort marker,
    * occupying one offset) and records aborted spans; Fetch reports
    * the true last_stable_offset (min open-transaction offset) and
    * the aborted_transactions index, serves batches FROM the
    * requested offset, and honors a byte cap (`maxFetchBytes`) so
    * pagination is exercised. read_committed is therefore enforced by
    * the CLIENT's admission logic — the thing ADVICE r15 #1 said was
    * previously untestable because the old broker materialized only
    * committed data. Also still: CRC-32C re-validation, producer-
    * epoch fencing, sequence idempotence, and fencing-aborts-the-
    * zombie's-open-transaction on InitProducerId. */
  /** One appended RecordBatch: data (maybe transactional) or a txn
    * control marker. state: 0=stable, 1=open txn, 2=committed,
    * 3=aborted. */
  private final class StoredBatch(val baseOffset: Long, val pid: Long,
      val epoch: Short, val baseSeq: Int, val transactional: Boolean,
      val control: Boolean, val records: Vector[(String, String)]) {
    var state: Int = if (transactional && !control) 1 else 0
    def span: Int = records.size
    def lastOffset: Long = baseOffset + span - 1
  }

  /** The log/txn/leadership state ONE logical cluster shares across
    * its broker frontends: two [[EmbeddedBroker]]s constructed over
    * the same BrokerState are two NODES of one cluster — same log,
    * different sockets, each with its own node_id — so partition
    * leadership can MOVE mid-stream without data loss. That is the
    * multi-broker weather the r17 single-socket chaos could not
    * produce (VERDICT r17 missing #1): a client whose NOT_LEADER
    * recovery is reconnect-in-place burns its whole retry budget on
    * the wrong broker; the Metadata re-resolve path is only provable
    * against a cluster where the answer actually changes. */
  final class BrokerState {
    private[KafkaWire] val lock = new Object
    private[KafkaWire] var nextPid = 1000L
    private[KafkaWire] val txns = scala.collection.mutable.Map[String, (Long, Short)]() // txId -> (pid, epoch)
    private[KafkaWire] val logs = scala.collection.mutable.Map[(String, Int), Vector[StoredBatch]]()
    private[KafkaWire] val abortedSpans = scala.collection.mutable.Map[(String, Int), Vector[(Long, Long, Long)]]() // (pid, firstOffset, abortMarkerOffset)
    private[KafkaWire] val seqState = scala.collection.mutable.Map[(Long, String, Int), Int]() // -> next expected baseSequence
    private[KafkaWire] val earliestOffsets = scala.collection.mutable.Map[(String, Int), Long]()
    /** node_id -> (host, port): every frontend registers itself. */
    private[KafkaWire] val brokers = scala.collection.mutable.Map[Int, (String, Int)]()
    /** (topic, partition) -> leader node_id; a partition absent here
      * is led by the lowest registered node_id. */
    private[KafkaWire] val leaders = scala.collection.mutable.Map[(String, Int), Int]()
    private[KafkaWire] def leaderOf(tp: (String, Int)): Int = lock.synchronized {
      leaders.getOrElse(tp, if (brokers.isEmpty) 0 else brokers.keys.min)
    }
    /** Move (topic, partition) leadership to `node` — the mid-stream
      * election the leader-move chaos spec drives. */
    def moveLeader(topic: String, partition: Int, node: Int): Unit =
      lock.synchronized { leaders((topic, partition)) = node }

    /** Consumer-group committed offsets: (group, topic, partition) ->
      * (offset, metadata). Written by OffsetCommit, read by
      * OffsetFetch — the surface external lag monitors poll. The
      * ENGINE's progress lives in Spark checkpoints (CONNECTORS.md,
      * consumer-group section); these commits are observability. */
    private[KafkaWire] val groupOffsets =
      scala.collection.mutable.Map[(String, String, Int), (Long, String)]()

    /** Transaction-coordinator node; -1 = lowest registered node_id.
      * On a real cluster the coordinator is the leader of the
      * __transaction_state partition the transactional.id hashes to —
      * it MOVES when that leadership does, and txn APIs sent to the
      * old coordinator answer NOT_COORDINATOR (16). */
    @volatile private[KafkaWire] var coordinator: Int = -1
    private[KafkaWire] def coordinatorNode: Int =
      if (coordinator >= 0) coordinator
      else lock.synchronized { if (brokers.isEmpty) 0 else brokers.keys.min }
    /** Move the transaction coordinator — the coordinator-failover
      * election the producer chaos spec drives. */
    def moveCoordinator(node: Int): Unit = coordinator = node
  }

  final class EmbeddedBroker(val nodeId: Int, state: BrokerState) {
    /** Single-node form: a private one-broker cluster (every existing
      * spec and the default harness path). */
    def this() = this(0, new BrokerState)

    private val server = new ServerSocket()
    server.bind(new InetSocketAddress("127.0.0.1", 0))
    def port: Int = server.getLocalPort
    state.lock.synchronized { state.brokers(nodeId) = ("127.0.0.1", port) }

    private def lock = state.lock
    private def txns = state.txns
    private def logs = state.logs
    private def abortedSpans = state.abortedSpans
    private def seqState = state.seqState
    private def isLeader(tp: (String, Int)): Boolean = state.leaderOf(tp) == nodeId
    // test observability / fault knobs
    @volatile var crcValidated = 0
    @volatile var crcRejected = 0
    @volatile var fencedRejections = 0
    @volatile var dedupedProduces = 0
    @volatile var failNextEndTxn = false
    /** Byte cap per fetched record set (at least one full batch is
      * always served) — lets specs force the client's fetch loop. */
    @volatile var maxFetchBytes: Int = Int.MaxValue
    /** When set, a fetch response that hit `maxFetchBytes` also ships
      * the FIRST HALF of the next batch's bytes — the max_bytes-cut
      * trailing partial batch a real broker can emit. */
    @volatile var truncateTailBatch: Boolean = false
    /** Chaos: the next N fetches answer NOT_LEADER (error 6) — the
      * leadership-moved weather a real cluster throws hourly. */
    val notLeaderNextFetches = new java.util.concurrent.atomic.AtomicInteger(0)
    /** Chaos: cut the SOCKET halfway through the next fetch response
      * (mid-RecordBatch) — a broker restart / network partition
      * tearing the connection under the reader. */
    val cutNextFetchResponses = new java.util.concurrent.atomic.AtomicInteger(0)
    /** Chaos: cut the SOCKET halfway through the next Produce
      * RESPONSE — the batch has APPENDED but the producer never
      * learns it: the response-lost-after-append duplicate scenario
      * that sequence-based idempotence exists for. */
    val cutNextProduceResponses = new java.util.concurrent.atomic.AtomicInteger(0)
    /** Chaos: deliver every response in 7-byte TCP dribbles — the
      * fragmentation a real network applies; a client that assumes
      * one read() == one frame corrupts itself. */
    @volatile var dribbleResponses: Boolean = false

    private def nextOffset(tp: (String, Int)): Long =
      // floor at the log-start offset: a FULLY-retained log (truncate
      // deleted every batch) must not regress its log-end to 0 below
      // the log-start — new appends continue at the log-start, and
      // ListOffsets(-1)/hwm stay >= ListOffsets(-2)
      math.max(
        logs.getOrElse(tp, Vector.empty).lastOption
          .map(b => b.baseOffset + b.span).getOrElse(0L),
        earliestOffsets.getOrElse(tp, 0L))

    /** Log-start offsets (> 0 after [[truncate]] — retention). */
    private def earliestOffsets = state.earliestOffsets

    /** Simulate retention: delete every batch wholly below `before`
      * and advance the log-start offset — after this, fetching an
      * offset below `before` is OFFSET_OUT_OF_RANGE, exactly what a
      * retention-truncated real topic serves. */
    def truncate(topic: String, partition: Int, before: Long): Unit =
      lock.synchronized {
        val tp = (topic, partition)
        logs(tp) = logs.getOrElse(tp, Vector.empty).filter(_.lastOffset >= before)
        earliestOffsets(tp) = before
      }

    /** The committed DATA records of a topic's partition 0, in log
      * order — what a read_committed consumer may observe. */
    def committed(topic: String): Vector[(String, String)] =
      lock.synchronized(logs.getOrElse((topic, 0), Vector.empty)
        .filter(b => !b.control && (b.state == 0 || b.state == 2))
        .flatMap(_.records))

    /** End every OPEN batch of `pid`: mark committed/aborted, record
      * the aborted span, append the control marker — the coordinator's
      * write path for both EndTxn and fence-abort. */
    private def finishTxn(pid: Long, epoch: Short, commit: Boolean): Unit = {
      val touched = logs.keys.filter(tp =>
        logs(tp).exists(b => b.pid == pid && b.state == 1)).toSeq
      touched.foreach { tp =>
        val open = logs(tp).filter(b => b.pid == pid && b.state == 1)
        open.foreach(_.state = if (commit) 2 else 3)
        val markerOffset = nextOffset(tp) // the control batch lands here
        if (!commit)
          abortedSpans(tp) = abortedSpans.getOrElse(tp, Vector.empty) :+
            ((pid, open.map(_.baseOffset).min, markerOffset))
        logs(tp) = logs(tp) :+ new StoredBatch(markerOffset, pid, epoch,
          -1, transactional = true, control = true,
          Vector((if (commit) "COMMIT" else "ABORT", null)))
      }
    }

    private def epochOf(pid: Long): Option[Short] =
      txns.values.collectFirst { case (p, e) if p == pid => e }

    @volatile private var running = true
    private val acceptor = new Thread(() => {
      while (running) {
        try {
          val s = server.accept()
          val t = new Thread(() => serve(s), "graft-broker-conn")
          t.setDaemon(true); t.start()
        } catch { case _: Throwable => () }
      }
    }, "graft-broker-accept")
    acceptor.setDaemon(true)
    acceptor.start()

    def stop(): Unit = { running = false; server.close() }

    private def serve(sock: Socket): Unit = {
      try {
        val in = new DataInputStream(sock.getInputStream)
        val out = new DataOutputStream(sock.getOutputStream)
        while (true) {
          val req = new Reader(readFrame(in))
          val apiKey = req.i16(); val apiVersion = req.i16()
          val corr = req.i32(); req.nstr() // client_id
          val resp = new Writer
          resp.i32(0) // length, patched
          resp.i32(corr)
          apiKey match {
            case ApiFindCoordinator => handleFindCoordinator(req, resp)
            case ApiInitProducerId => handleInitProducerId(req, resp)
            case ApiAddPartitionsToTxn => handleAddPartitions(req, resp)
            case ApiProduce => handleProduce(req, resp)
            case ApiEndTxn => handleEndTxn(req, resp)
            case ApiFetch => handleFetch(req, resp)
            case ApiListOffsets => handleListOffsets(req, resp)
            case ApiOffsetCommit => handleOffsetCommit(req, resp)
            case ApiOffsetFetch => handleOffsetFetch(req, resp)
            case ApiMetadata => handleMetadata(req, resp)
            case other => sys.error(s"unsupported api $other v$apiVersion")
          }
          resp.patchI32(0, resp.size - 4)
          val bytes = resp.bytes
          // single CAS-style decrement (ADVICE r17): the old two-step
          // `get() > 0 && getAndDecrement() > 0` raced concurrent
          // fetch handler threads negative, silently disarming later
          // injections — a flake source for multi-reader chaos specs
          if ((apiKey == ApiFetch &&
              cutNextFetchResponses.getAndUpdate(n => if (n > 0) n - 1 else n) > 0) ||
              (apiKey == ApiProduce &&
              cutNextProduceResponses.getAndUpdate(n => if (n > 0) n - 1 else n) > 0)) {
            // chaos: tear the connection mid-RecordBatch — ship half
            // the frame, then cut the socket under the reader
            out.write(bytes, 0, bytes.length / 2); out.flush()
            sock.close()
            return
          }
          if (dribbleResponses) {
            // chaos: worst-case TCP fragmentation — tiny writes with
            // a flush each, so no client read returns a whole frame
            var i = 0
            while (i < bytes.length) {
              val n = math.min(7, bytes.length - i)
              out.write(bytes, i, n); out.flush()
              i += n
            }
          } else out.write(bytes)
          out.flush()
        }
      } catch { case _: Throwable => () } finally sock.close()
    }

    private def handleFindCoordinator(req: Reader, resp: Writer): Unit = {
      req.str(); req.i8() // key, key_type
      // any node can answer the LOOKUP; the answer is the coordinator's
      // registered address (a real broker reads __transaction_state
      // partition leadership — BrokerState.coordinatorNode models it)
      val node = state.coordinatorNode
      val (h, p) = lock.synchronized(
        state.brokers.getOrElse(node, ("127.0.0.1", port)))
      resp.i32(0).i16(ErrNone).nstr(null) // throttle, error, error_message
      resp.i32(node).str(h).i32(p) // node_id, host, port
    }

    /** Txn APIs on a NON-coordinator answer NOT_COORDINATOR (16) —
      * the real broker's answer after the coordinator moved; the
      * client must re-resolve via FindCoordinator, not retry here. */
    private def isCoordinator: Boolean = state.coordinatorNode == nodeId

    private def handleInitProducerId(req: Reader, resp: Writer): Unit = {
      val txId = req.nstr(); req.i32() // txn_timeout
      if (!isCoordinator) {
        resp.i32(0).i16(ErrNotCoordinator).i64(-1L).i16(-1)
        return
      }
      val (pid, epoch) = lock.synchronized {
        txns.get(txId) match {
          case Some((p, e)) =>
            // fencing: same PID, bumped epoch; the zombie's OPEN
            // transaction is aborted by the coordinator — its data
            // stays in the log, marked aborted, behind a real abort
            // marker (the span the read_committed consumer skips)
            finishTxn(p, e, commit = false)
            seqState.filterInPlace { case ((sp, _, _), _) => sp != p }
            val bumped = (p, (e + 1).toShort)
            txns(txId) = bumped; bumped
          case None =>
            val fresh = (state.nextPid, 0: Short)
            state.nextPid += 1
            txns(txId) = fresh; fresh
        }
      }
      resp.i32(0).i16(ErrNone).i64(pid).i16(epoch)
    }

    private def handleAddPartitions(req: Reader, resp: Writer): Unit = {
      val txId = req.str(); val pid = req.i64(); val epoch = req.i16()
      val topics = (0 until req.i32()).map { _ =>
        val t = req.str(); (t, (0 until req.i32()).map(_ => req.i32()))
      }
      if (!isCoordinator) {
        resp.i32(0) // throttle
        resp.i32(topics.size)
        topics.foreach { case (t, parts) =>
          resp.str(t); resp.i32(parts.size)
          parts.foreach { pt => resp.i32(pt).i16(ErrNotCoordinator) }
        }
        return
      }
      val err = lock.synchronized {
        txns.get(txId) match {
          case Some((p, e)) if p == pid && e == epoch =>
            // a partition registered in a transaction EXISTS from here
            // on (the auto-create seam, like a real cluster's producer-
            // driven topic creation): materialize its default
            // leadership so Metadata can route a producer bootstrapped
            // at a NON-leader to it — while topics never registered or
            // produced still answer UNKNOWN_TOPIC (round-19 advice)
            for ((t, parts) <- topics; p0 <- parts)
              state.leaders.getOrElseUpdate((t, p0), state.leaderOf((t, p0)))
            ErrNone
          case Some(_) => fencedRejections += 1; ErrInvalidProducerEpoch
          case None => ErrInvalidProducerEpoch
        }
      }
      resp.i32(0) // throttle
      resp.i32(topics.size)
      topics.foreach { case (t, parts) =>
        resp.str(t); resp.i32(parts.size)
        parts.foreach { pt => resp.i32(pt).i16(err) }
      }
    }

    private def handleProduce(req: Reader, resp: Writer): Unit = {
      req.nstr() // transactional_id (authz only; identity rides in the batch)
      req.i16(); req.i32() // acks, timeout
      val nTopics = req.i32()
      case class PartResult(topic: String, partition: Int, err: Short, baseOffset: Long)
      val results = (0 until nTopics).flatMap { _ =>
        val topic = req.str()
        (0 until req.i32()).map { _ =>
          val partition = req.i32()
          val recordSet = req.nbytes()
          val batch = decodeBatch(new Reader(recordSet))
          lock.synchronized {
            if (!isLeader((topic, partition)))
              PartResult(topic, partition, ErrNotLeader, -1L)
            else if (!batch.crcOk) { crcRejected += 1; PartResult(topic, partition, ErrCorruptMessage, -1L) }
            else {
              crcValidated += 1
              epochOf(batch.producerId) match {
                case Some(cur) if cur != batch.producerEpoch =>
                  fencedRejections += 1
                  PartResult(topic, partition, ErrInvalidProducerEpoch, -1L)
                case None =>
                  PartResult(topic, partition, ErrInvalidProducerEpoch, -1L)
                case Some(_) =>
                  val key = (batch.producerId, topic, partition)
                  val expected = seqState.getOrElse(key, 0)
                  if (batch.baseSequence < expected) {
                    // idempotent dedup of a retried request — answer
                    // the ORIGINAL append's offset, as a real broker
                    // does (round-18 review: 0L misreported the
                    // response-lost-after-append retry). Matched on
                    // epoch too, and from the TAIL: after an epoch
                    // bump the same (pid, baseSequence) can recur, and
                    // the retried batch must report ITS append, not a
                    // prior epoch's (round-19 advice).
                    dedupedProduces += 1
                    val orig = logs.getOrElse((topic, partition), Vector.empty)
                      .reverseIterator
                      .find(b => !b.control && b.pid == batch.producerId &&
                        b.epoch == batch.producerEpoch &&
                        b.baseSeq == batch.baseSequence)
                      .map(_.baseOffset).getOrElse(0L)
                    PartResult(topic, partition, ErrNone, orig)
                  } else if (batch.baseSequence > expected) {
                    PartResult(topic, partition, ErrOutOfOrderSequence, -1L)
                  } else {
                    // the real log model: the batch appends NOW —
                    // visibility is decided later by the txn marker
                    val tp = (topic, partition)
                    val base = nextOffset(tp)
                    logs(tp) = logs.getOrElse(tp, Vector.empty) :+
                      new StoredBatch(base, batch.producerId,
                        batch.producerEpoch, batch.baseSequence,
                        batch.transactional, control = false,
                        batch.records.toVector)
                    seqState(key) = expected + batch.records.size
                    PartResult(topic, partition, ErrNone, base)
                  }
              }
            }
          }
        }
      }
      resp.i32(results.map(_.topic).distinct.size)
      results.groupBy(_.topic).toSeq.sortBy(_._1).foreach { case (t, rs) =>
        resp.str(t); resp.i32(rs.size)
        rs.foreach { r => resp.i32(r.partition).i16(r.err).i64(r.baseOffset).i64(-1L) }
      }
      resp.i32(0) // throttle
    }

    private def handleEndTxn(req: Reader, resp: Writer): Unit = {
      val txId = req.str(); val pid = req.i64(); val epoch = req.i16()
      val committed = req.bool()
      if (!isCoordinator) { resp.i32(0).i16(ErrNotCoordinator); return }
      val err = lock.synchronized {
        if (failNextEndTxn) { failNextEndTxn = false; ErrCoordinatorNotAvailable }
        else txns.get(txId) match {
          case Some((p, e)) if p == pid && e == epoch =>
            finishTxn(pid, epoch, committed)
            ErrNone
          case _ => fencedRejections += 1; ErrInvalidProducerEpoch
        }
      }
      resp.i32(0).i16(err)
    }

    /** ListOffsets v1: timestamp -2 -> log-start (earliest retained),
      * -1 -> log-end. v1 response has NO throttle field. */
    private def handleListOffsets(req: Reader, resp: Writer): Unit = {
      req.i32() // replica_id
      val topics = (0 until req.i32()).map { _ =>
        val t = req.str()
        (t, (0 until req.i32()).map { _ => (req.i32(), req.i64()) })
      }
      resp.i32(topics.size)
      topics.foreach { case (t, parts) =>
        resp.str(t); resp.i32(parts.size)
        parts.foreach { case (pt, ts) =>
          if (!isLeader((t, pt))) {
            // a real broker answers ListOffsets for a partition it no
            // longer leads with NOT_LEADER, same as Fetch
            resp.i32(pt).i16(ErrNotLeader).i64(-1L).i64(-1L)
          } else {
            val (earliest, end) = lock.synchronized {
              (earliestOffsets.getOrElse((t, pt), 0L), nextOffset((t, pt)))
            }
            resp.i32(pt).i16(ErrNone).i64(-1L) // partition, error, timestamp
            resp.i64(if (ts == -2L) earliest else end)
          }
        }
      }
    }

    /** OffsetCommit v2: store (group, topic, partition) -> offset in
      * the cluster's group-offset table. Generation/member/retention
      * fields are read and ignored — this broker has no group-
      * membership protocol (the engine's parallelism is Spark's, not
      * a consumer group's); the commit surface exists so EXTERNAL lag
      * monitors can watch the pipeline (CONNECTORS.md). */
    private def handleOffsetCommit(req: Reader, resp: Writer): Unit = {
      val group = req.str(); req.i32(); req.str(); req.i64() // generation_id, member_id, retention_time
      val topics = (0 until req.i32()).map { _ =>
        val t = req.str()
        (t, (0 until req.i32()).map { _ =>
          val p = req.i32(); val off = req.i64(); val md = req.nstr()
          (p, off, md)
        })
      }
      // group APIs are COORDINATOR-owned, like the txn APIs (a real
      // broker stores them in __consumer_offsets, whose leader IS the
      // group coordinator) — a non-coordinator answers 16 and the
      // client re-resolves via FindCoordinator (round-19 review)
      if (!isCoordinator) {
        resp.i32(topics.size)
        topics.foreach { case (t, ps) =>
          resp.str(t); resp.i32(ps.size)
          ps.foreach { case (pt, _, _) => resp.i32(pt).i16(ErrNotCoordinator) }
        }
        return
      }
      lock.synchronized {
        for ((t, ps) <- topics; (p, off, md) <- ps)
          state.groupOffsets((group, t, p)) = (off, Option(md).getOrElse(""))
      }
      resp.i32(topics.size)
      topics.foreach { case (t, ps) =>
        resp.str(t); resp.i32(ps.size)
        ps.foreach { case (p, _, _) => resp.i32(p).i16(ErrNone) }
      }
    }

    /** OffsetFetch v1: committed group offsets; an uncommitted
      * (group, partition) answers offset -1 with no error, per
      * protocol — a lag monitor reads that as "no position yet". */
    private def handleOffsetFetch(req: Reader, resp: Writer): Unit = {
      val group = req.str()
      val topics = (0 until req.i32()).map { _ =>
        val t = req.str(); (t, (0 until req.i32()).map(_ => req.i32()))
      }
      if (!isCoordinator) { // see handleOffsetCommit
        resp.i32(topics.size)
        topics.foreach { case (t, ps) =>
          resp.str(t); resp.i32(ps.size)
          ps.foreach(p => resp.i32(p).i64(-1L).nstr(null).i16(ErrNotCoordinator))
        }
        return
      }
      val snap = lock.synchronized {
        topics.map { case (t, ps) =>
          t -> ps.map(p => (p, state.groupOffsets.get((group, t, p))))
        }
      }
      resp.i32(snap.size)
      snap.foreach { case (t, ps) =>
        resp.str(t); resp.i32(ps.size)
        ps.foreach { case (p, v) =>
          resp.i32(p).i64(v.map(_._1).getOrElse(-1L))
            .nstr(v.map(_._2).orNull).i16(ErrNone)
        }
      }
    }

    /** Metadata v1: the cluster's broker registry + per-partition
      * leaders — what a real client's route table is built from. A
      * null topics array (-1) means "all known topics", per protocol. */
    private def handleMetadata(req: Reader, resp: Writer): Unit = {
      val nTopics = req.i32()
      val asked = if (nTopics < 0) Seq.empty else (0 until nTopics).map(_ => req.str())
      val (brokers, topicParts) = lock.synchronized {
        val known = (logs.keys ++ state.leaders.keys).toSeq
        val knownNames = known.map(_._1).toSet
        val names =
          if (asked.nonEmpty) asked
          else known.map(_._1).distinct.sorted
        // a topic NEITHER log nor leadership state has seen answers
        // UNKNOWN_TOPIC_OR_PARTITION (3), per protocol — fabricating a
        // confident partition-0 route for it would mask topic-name
        // typos behind an empty-looking stream (round-19 advice)
        val parts = names.map { t =>
          if (!knownNames.contains(t)) t -> None
          else {
            val ps = (known.collect { case (`t`, p) => p } :+ 0).distinct.sorted
            t -> Some(ps.map(p => (p, state.leaderOf((t, p)))))
          }
        }
        (state.brokers.toSeq.sortBy(_._1), parts)
      }
      resp.i32(brokers.size)
      brokers.foreach { case (id, (h, p)) =>
        resp.i32(id).str(h).i32(p).nstr(null) // node_id, host, port, rack
      }
      resp.i32(brokers.map(_._1).min) // controller_id
      resp.i32(topicParts.size)
      topicParts.foreach {
        case (t, None) =>
          resp.i16(ErrUnknownTopic).str(t).bool(false)
          resp.i32(0) // no partitions for an unknown topic
        case (t, Some(ps)) =>
          resp.i16(ErrNone).str(t).bool(false) // error, name, is_internal
          resp.i32(ps.size)
          ps.foreach { case (p, leader) =>
            resp.i16(ErrNone).i32(p).i32(leader)
            resp.i32(1).i32(leader) // replicas = [leader]
            resp.i32(1).i32(leader) // isr = [leader]
          }
      }
    }

    private def handleFetch(req: Reader, resp: Writer): Unit = {
      req.i32(); req.i32(); req.i32(); req.i32() // replica, max_wait, min_bytes, max_bytes
      req.i8() // isolation_level — enforcement is the CLIENT's job
      val topics = (0 until req.i32()).map { _ =>
        val t = req.str()
        (t, (0 until req.i32()).map { _ =>
          val p = req.i32(); val from = req.i64(); req.i32(); (p, from) })
      }
      resp.i32(0) // throttle
      resp.i32(topics.size)
      topics.foreach { case (t, parts) =>
        resp.str(t); resp.i32(parts.size)
        parts.foreach { case (pt, from) =>
          if (notLeaderNextFetches.getAndUpdate(n => if (n > 0) n - 1 else n) > 0
              || !isLeader((t, pt))) {
            // the real broker's answer while a partition's leadership
            // is mid-move — or when this node simply does not lead the
            // partition (BrokerState.moveLeader): error 6, no
            // metadata, null record set
            resp.i32(pt).i16(ErrNotLeader)
            resp.i64(-1L).i64(-1L)
            resp.i32(0) // no aborted list
            resp.i32(-1) // null record set
          } else serveFetchPartition(t, pt, from, resp)
        }
      }
    }

    private def serveFetchPartition(t: String, pt: Int, from: Long,
        resp: Writer): Unit = {
          val (batches, hwm, lso, spans, earliest) = lock.synchronized {
            val log = logs.getOrElse((t, pt), Vector.empty)
            val h = nextOffset((t, pt))
            val open = log.filter(b => !b.control && b.state == 1)
            val l = if (open.isEmpty) h else open.map(_.baseOffset).min
            (log, h, l, abortedSpans.getOrElse((t, pt), Vector.empty),
              earliestOffsets.getOrElse((t, pt), 0L))
          }
          // a retention-truncated offset (or one beyond the log end)
          // is OFFSET_OUT_OF_RANGE — the real broker's answer, with
          // NO special cases: the source's LSO probe fetches at the
          // ListOffsets log end (a valid offset on every broker), so
          // the embedded broker no longer exempts any probe
          // convention a real cluster would reject (ADVICE r16 #2).
          if (from < earliest || from > hwm) {
            resp.i32(pt).i16(ErrOffsetOutOfRange)
            resp.i64(hwm).i64(lso)
            resp.i32(0) // no aborted list
            resp.i32(-1) // null record set
          } else {
            resp.i32(pt).i16(ErrNone)
            resp.i64(hwm).i64(lso)
            // the aborted-transactions index RELEVANT TO THIS FETCH —
            // the client's admission algorithm consumes (pid,
            // first_offset) and exits a span only at that producer's
            // control marker, so a span whose abort marker precedes
            // `from` must NOT be sent (the marker would never be
            // decoded and the producer's LATER committed data would be
            // silently dropped — real brokers filter exactly this way)
            val relevant = spans.filter(_._3 >= from)
            resp.i32(relevant.size)
            relevant.sortBy(_._2).foreach { case (p, off, _) => resp.i64(p).i64(off) }
            // serve batches from the one containing `from`, each with
            // its TRUE baseOffset (offset gaps from markers/aborted
            // data are real), capped at maxFetchBytes like a real
            // broker's max_bytes — at least one batch always ships
            val served = batches.filter(_.lastOffset >= from)
            val out = Vector.newBuilder[Array[Byte]]
            var bytes = 0
            var cut: Array[Byte] = null
            // STOP at the first batch that doesn't fit (round-18
            // review): continuing would (a) emit a NON-CONTIGUOUS
            // record set when a later smaller batch still fits — the
            // client's `next` then silently skips the dropped batch's
            // offsets (a real broker never leaves gaps) — and (b)
            // re-encode the whole remaining log per page, making a
            // capped paging scan O(n²)
            var capped = false
            val it = served.iterator
            while (!capped && it.hasNext) {
              val b = it.next()
              val enc = encodeBatch(b.pid, b.epoch, b.baseSeq, b.transactional,
                b.records, b.baseOffset, b.control)
              if (bytes == 0 || bytes + enc.length <= maxFetchBytes) {
                out += enc; bytes += enc.length
              } else {
                if (truncateTailBatch)
                  cut = java.util.Arrays.copyOf(enc, enc.length / 2)
                capped = true
              }
            }
            val full = out.result()
            if (full.isEmpty && cut == null) resp.i32(-1) // null record set
            else {
              val total = full.map(_.length).sum + (if (cut == null) 0 else cut.length)
              val recordSet = new Array[Byte](total)
              var at = 0
              (full ++ Option(cut)).foreach { a =>
                System.arraycopy(a, 0, recordSet, at, a.length); at += a.length
              }
              resp.nbytes(recordSet)
            }
          }
    }
  }
}
