package graft

import graft.streaming.{KafkaEosSink, KafkaWire}
import graft.streaming.KafkaWire.{EmbeddedBroker, FencedException, WireErrorException, WireProducer}

/** K1 over the WIRE: the exactly-once sink lifecycle running against
  * an embedded broker that speaks the actual Kafka binary protocol
  * over a real TCP socket — framing, RecordBatch v2 with CRC-32C,
  * producer-epoch fencing, sequence idempotence, and the
  * read_committed Fetch for the restart-time marker. Complements
  * KafkaEosSinkSpec (the same lifecycle against an in-memory fake):
  * here nothing is faked below the TxProducer API — every
  * interaction crosses the socket as protocol bytes the broker
  * re-parses and re-validates. */
class KafkaWireSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: (String, String)*) = rows.toSeq.toDF("key", "value")

  private def withBroker(f: EmbeddedBroker => Unit): Unit = {
    val b = new EmbeddedBroker
    try f(b) finally b.stop()
  }

  private def wireSink(b: EmbeddedBroker, txId: String): KafkaEosSink.Sink =
    new KafkaEosSink.Sink("out", "progress", txId,
      () => new WireProducer("127.0.0.1", b.port, txId),
      () => KafkaWire.readLastCommitted("127.0.0.1", b.port, "progress", txId))

  test("record batch codec round-trips and CRC-32C detects corruption") {
    val recs = Seq(("k1", "v1"), (null, "null-key"), ("k3", "longer value é中"))
    val bytes = KafkaWire.encodeBatch(42L, 3, 7, transactional = true, recs)
    val dec = KafkaWire.decodeBatch(new KafkaWire.Reader(bytes))
    assert(dec.crcOk, "fresh batch failed CRC")
    assert(dec.producerId == 42L && dec.producerEpoch == 3 && dec.baseSequence == 7)
    assert(dec.transactional)
    assert(dec.records == recs, s"records mangled: ${dec.records}")
    // flip one payload byte: CRC must catch it
    val corrupt = bytes.clone(); corrupt(corrupt.length - 1) = (corrupt.last ^ 0x01).toByte
    assert(!KafkaWire.decodeBatch(new KafkaWire.Reader(corrupt)).crcOk,
      "corrupted batch passed CRC")
  }

  test("sink commits over the socket; broker re-validates CRC; marker rides the txn") {
    withBroker { b =>
      val txId = "wire-tx-1"
      val sink = wireSink(b, txId)
      sink.write(batch("k1" -> "v1", "k2" -> "v2"), 0L)
      sink.write(batch("k3" -> "v3"), 1L)
      sink.close()
      assert(b.committed("out") == Vector("k1" -> "v1", "k2" -> "v2", "k3" -> "v3"),
        s"wrong committed log: ${b.committed("out")}")
      assert(b.committed("progress").map(_._2) == Vector("0", "1"),
        "progress markers did not commit atomically with their batches")
      // 4 batches: (k1,k2) ship as ONE multi-record batch (sendAll),
      // plus each transaction's marker — one CRC validation per batch
      assert(b.crcValidated >= 4, s"broker validated only ${b.crcValidated} batch CRCs")
      assert(b.crcRejected == 0)
    }
  }

  test("restart reads the marker via read_committed Fetch and skips the replayed batch") {
    withBroker { b =>
      val txId = "wire-tx-2"
      val sink = wireSink(b, txId)
      sink.write(batch("k1" -> "v1"), 0L)
      sink.close() // crash after commit, before Spark's checkpoint commit
      assert(KafkaWire.readLastCommitted("127.0.0.1", b.port, "progress", txId) == 0L)
      val sink2 = wireSink(b, txId) // fresh incarnation, same checkpoint
      sink2.write(batch("k1" -> "v1"), 0L) // foreachBatch replays batch 0
      assert(b.committed("out") == Vector("k1" -> "v1"),
        s"replayed batch re-sent over the wire: ${b.committed("out")}")
      sink2.write(batch("k2" -> "v2"), 1L)
      sink2.close()
      assert(b.committed("out") == Vector("k1" -> "v1", "k2" -> "v2"))
    }
  }

  test("failed commit aborts on the broker — nothing visible, retry commits once") {
    withBroker { b =>
      val txId = "wire-tx-3"
      val sink = wireSink(b, txId)
      sink.write(batch("k0" -> "v0"), 0L)
      b.failNextEndTxn = true
      intercept[WireErrorException] { sink.write(batch("k1" -> "v1"), 1L) }
      assert(b.committed("out") == Vector("k0" -> "v0"),
        s"torn batch visible after failed commit: ${b.committed("out")}")
      sink.write(batch("k1" -> "v1"), 1L) // Spark retry, same id
      sink.close()
      assert(b.committed("out") == Vector("k0" -> "v0", "k1" -> "v1"),
        s"retry did not commit exactly once: ${b.committed("out")}")
    }
  }

  test("a newer incarnation fences the zombie at the protocol level (error 47)") {
    withBroker { b =>
      val txId = "wire-tx-4"
      val zombie = new WireProducer("127.0.0.1", b.port, txId)
      zombie.initTransactions()
      zombie.beginTransaction()
      zombie.send("out", "z1", "zombie-pending") // pending, never committed
      val successor = new WireProducer("127.0.0.1", b.port, txId)
      successor.initTransactions() // bumps the epoch, aborts zombie's pending
      intercept[FencedException] { zombie.send("out", "z2", "post-fence") }
      intercept[FencedException] { zombie.commitTransaction() }
      assert(b.fencedRejections >= 2)
      // the successor operates normally and the zombie's rows are gone
      successor.beginTransaction()
      successor.send("out", "s1", "fresh")
      successor.commitTransaction()
      successor.close(); zombie.close()
      assert(b.committed("out") == Vector("s1" -> "fresh"),
        s"zombie rows leaked: ${b.committed("out")}")
    }
  }

  test("read_committed admission: aborted spans, control batches, LSO bound, true offsets") {
    withBroker { b =>
      // committed(k1@0) marker@1 | aborted(g1@2,g2@3) abort-marker@4 |
      // committed(k2@5) marker@6 — the interleaving a real broker log
      // holds; the CLIENT must reconstruct the committed view
      val good = new WireProducer("127.0.0.1", b.port, "rc-good")
      good.initTransactions(); good.beginTransaction()
      good.send("t", "k1", "v1"); good.commitTransaction()
      val bad = new WireProducer("127.0.0.1", b.port, "rc-bad")
      bad.initTransactions(); bad.beginTransaction()
      bad.send("t", "g1", "ghost1"); bad.send("t", "g2", "ghost2")
      bad.abortTransaction(); bad.close()
      good.beginTransaction()
      good.send("t", "k2", "v2"); good.commitTransaction()

      val (lso, recs) = KafkaWire.fetchCommitted("127.0.0.1", b.port, "t", 0, 0L)
      assert(lso == 7L, s"wrong LSO on a fully-decided log: $lso")
      assert(recs == Vector((0L, "k1", "v1"), (5L, "k2", "v2")),
        s"aborted span / control batches leaked or offsets wrong: $recs")

      // an OPEN transaction caps the LSO below the hwm — nothing at or
      // above it may be admitted (the in-flight data is undecided)
      good.beginTransaction()
      good.send("t", "k3", "pending")
      val (lso2, recs2) = KafkaWire.fetchCommitted("127.0.0.1", b.port, "t", 0, 0L)
      assert(lso2 == 7L, s"open txn did not cap the LSO: $lso2")
      assert(recs2 == Vector((0L, "k1", "v1"), (5L, "k2", "v2")),
        s"undecided records admitted: $recs2")
      good.commitTransaction(); good.close()
    }
  }

  test("fetchCommittedRange pages through a byte-capped broker and tolerates a cut tail batch") {
    withBroker { b =>
      val p = new WireProducer("127.0.0.1", b.port, "page-tx")
      p.initTransactions()
      (0 until 5).foreach { i =>
        p.beginTransaction()
        p.send("t", s"k$i", "x" * 64) // one 64-byte-value batch each
        p.commitTransaction()
      }
      p.close()
      // log: data@0 marker@1 data@2 marker@3 ... data@8 marker@9
      // cap the broker to ~1.5 batches per response AND ship a cut
      // trailing batch — the reader must page, never lose the tail,
      // and never double-read (ADVICE r15 #2's exact failure mode)
      b.maxFetchBytes = 150
      b.truncateTailBatch = true
      val recs = KafkaWire.fetchCommittedRange("127.0.0.1", b.port, "t", 0, 0L, 10L)
      assert(recs.map(r => (r._1, r._2)) ==
        Vector((0L, "k0"), (2L, "k1"), (4L, "k2"), (6L, "k3"), (8L, "k4")),
        s"paged read lost/duplicated records: ${recs.map(r => (r._1, r._2))}")
      // single capped fetch really is partial (the loop was needed)
      val (_, single) = KafkaWire.fetchCommitted("127.0.0.1", b.port, "t", 0, 0L)
      assert(single.size < 5, s"cap not exercised: ${single.size}")
    }
  }

  test("ListOffsets discovers log-start/log-end; retention-deleted offsets are OFFSET_OUT_OF_RANGE") {
    withBroker { b =>
      val p = new WireProducer("127.0.0.1", b.port, "ret-tx")
      p.initTransactions()
      (0 until 4).foreach { i =>
        p.beginTransaction(); p.send("t", s"k$i", s"v$i"); p.commitTransaction()
      }
      p.close()
      // log: data@0 m@1 data@2 m@3 data@4 m@5 data@6 m@7
      assert(KafkaWire.listOffset("127.0.0.1", b.port, "t", 0, earliest = true) == 0L)
      assert(KafkaWire.listOffset("127.0.0.1", b.port, "t", 0, earliest = false) == 8L)
      b.truncate("t", 0, 4L) // retention deletes offsets 0-3
      assert(KafkaWire.listOffset("127.0.0.1", b.port, "t", 0, earliest = true) == 4L,
        "log-start must advance past retention")
      // fetching a deleted offset is the real broker's hard error
      val e = intercept[KafkaWire.WireErrorException] {
        KafkaWire.fetchCommittedRange("127.0.0.1", b.port, "t", 0, 0L, 8L)
      }
      assert(e.code == KafkaWire.ErrOffsetOutOfRange, s"wrong error: ${e.code}")
      // reading from the retained log-start still works and sees only
      // the surviving records
      val recs = KafkaWire.fetchCommittedRange("127.0.0.1", b.port, "t", 0, 4L, 8L)
      assert(recs.map(r => (r._1, r._2)) == Vector((4L, "k2"), (6L, "k3")),
        s"wrong surviving records: $recs")
    }
  }

  test("a producer that aborted EARLIER does not poison its later committed data (span filtering)") {
    withBroker { b =>
      // P aborts txn 1, then commits txn 2. A fetch that starts AFTER
      // the abort marker never decodes that marker — if the broker
      // shipped the stale span anyway, the client would enter it and
      // silently drop P's committed batch (round-16 review #1).
      val p = new WireProducer("127.0.0.1", b.port, "span-tx")
      p.initTransactions()
      p.beginTransaction(); p.send("t", "g", "ghost"); p.abortTransaction()
      // log: ghost@0 abort-marker@1
      p.beginTransaction(); p.send("t", "k1", "v1"); p.commitTransaction()
      // k1@2 marker@3
      p.beginTransaction(); p.send("t", "k2", "v2"); p.commitTransaction()
      p.close() // k2@4 marker@5
      // fetch starting past the abort marker: the committed records
      // from the once-aborted producer MUST surface
      val recs = KafkaWire.fetchCommittedRange("127.0.0.1", b.port, "t", 0, 2L, 6L)
      assert(recs.map(r => (r._1, r._2)) == Vector((2L, "k1"), (4L, "k2")),
        s"stale aborted span poisoned later committed data: $recs")
      // and the marker-restore path survives the same layout: a
      // progress read over a topic where the writer aborted then
      // committed must see the committed marker
      val q = new WireProducer("127.0.0.1", b.port, "span-marker")
      q.initTransactions()
      q.beginTransaction(); q.send("progress", "span-marker", "7"); q.abortTransaction()
      q.beginTransaction(); q.send("progress", "span-marker", "8"); q.commitTransaction()
      q.close()
      assert(KafkaWire.readLastCommitted("127.0.0.1", b.port, "progress", "span-marker") == 8L,
        "marker restore lost the committed marker after an earlier abort")
    }
  }

  test("fully-retained log: log-end never regresses below log-start; marker restore survives retention") {
    withBroker { b =>
      val p = new WireProducer("127.0.0.1", b.port, "full-ret")
      p.initTransactions()
      p.beginTransaction(); p.send("t", "k", "v"); p.commitTransaction()
      p.close() // k@0 m@1
      b.truncate("t", 0, 2L) // retention expires EVERYTHING
      assert(KafkaWire.listOffset("127.0.0.1", b.port, "t", 0, earliest = true) == 2L)
      assert(KafkaWire.listOffset("127.0.0.1", b.port, "t", 0, earliest = false) == 2L,
        "log-end regressed below log-start on a fully-retained log")
      // new produces continue at the log-start, never at 0
      val p2 = new WireProducer("127.0.0.1", b.port, "full-ret-2")
      p2.initTransactions()
      p2.beginTransaction(); p2.send("t", "k2", "v2"); p2.commitTransaction()
      p2.close()
      val recs = KafkaWire.fetchCommittedRange("127.0.0.1", b.port, "t", 0, 2L, 4L)
      assert(recs.map(r => (r._1, r._2)) == Vector((2L, "k2")),
        s"append after full retention landed at the wrong offset: $recs")
      // a progress topic whose head was retained: the marker restore
      // must seed its scan at the log-start, not crash-loop on 0
      val m = new WireProducer("127.0.0.1", b.port, "ret-marker")
      m.initTransactions()
      m.beginTransaction(); m.send("progress", "ret-marker", "3"); m.commitTransaction()
      m.beginTransaction(); m.send("progress", "ret-marker", "4"); m.commitTransaction()
      m.close() // 3@0 m@1 4@2 m@3
      b.truncate("progress", 0, 2L)
      assert(KafkaWire.readLastCommitted("127.0.0.1", b.port, "progress", "ret-marker") == 4L,
        "marker restore failed on a retention-truncated progress topic")
    }
  }

  test("OffsetCommit/OffsetFetch round-trip: last commit wins, unknown answers -1") {
    withBroker { b =>
      // the group-offset surface is independent of the log — commit
      // positions for a topic that exists (produce first so Metadata
      // routes) across two partitions
      val p = new WireProducer("127.0.0.1", b.port, "go-tx")
      p.initTransactions(); p.beginTransaction()
      p.send("t", "k", "v"); p.commitTransaction(); p.close()
      KafkaWire.commitOffsets("127.0.0.1", b.port, "g1", "t", Map(0 -> 3L, 1 -> 7L))
      assert(KafkaWire.fetchGroupOffsets("127.0.0.1", b.port, "g1", "t", Seq(0, 1))
        == Map(0 -> 3L, 1 -> 7L))
      // re-commit overwrites (last write wins, like __consumer_offsets
      // compaction); partitions not re-committed keep their position
      KafkaWire.commitOffsets("127.0.0.1", b.port, "g1", "t", Map(0 -> 9L))
      assert(KafkaWire.fetchGroupOffsets("127.0.0.1", b.port, "g1", "t", Seq(0, 1))
        == Map(0 -> 9L, 1 -> 7L))
      // a group that never committed answers -1 per partition (no
      // position), NOT an error — the monitor's unknown-group read
      assert(KafkaWire.fetchGroupOffsets("127.0.0.1", b.port, "g2", "t", Seq(0))
        == Map(0 -> -1L))
    }
  }

  test("LagMonitor reads per-partition lag from the group-offset surface") {
    withBroker { b =>
      val p = new WireProducer("127.0.0.1", b.port, "lag-tx")
      p.initTransactions(); p.beginTransaction()
      Seq("a", "b", "c").foreach(v => p.send("t", v, v))
      p.commitTransaction(); p.close()
      val end = KafkaWire.listOffset("127.0.0.1", b.port, "t", 0, earliest = false)
      KafkaWire.commitOffsets("127.0.0.1", b.port, "g", "t", Map(0 -> (end - 2)))
      assert(graft.LagMonitor.lagRows("127.0.0.1", b.port, "g", "t", 1)
        == Seq((0, end, end - 2, 2L)))
      // no position yet -> committed/lag are -1 (the monitor's dash)
      assert(graft.LagMonitor.lagRows("127.0.0.1", b.port, "fresh", "t", 1)
        == Seq((0, end, -1L, -1L)))
    }
  }

  test("broker dedups a retried produce request by sequence (idempotence)") {
    withBroker { b =>
      val txId = "wire-tx-5"
      val p = new WireProducer("127.0.0.1", b.port, txId)
      p.initTransactions()
      p.beginTransaction()
      p.send("out", "k1", "v1") // consumes baseSequence 0
      val (pid, epoch) = p.currentPidEpoch
      // a network retry re-delivers the same request bytes
      val replay = KafkaWire.encodeBatch(pid, epoch, 0, transactional = true, Seq(("k1", "v1")))
      p.produceRaw("out", 0, replay)
      assert(b.dedupedProduces == 1, "duplicate sequence was not deduped")
      // a gap (sequence from the future) is rejected, not buffered
      val gap = KafkaWire.encodeBatch(pid, epoch, 5, transactional = true, Seq(("k9", "v9")))
      val err = intercept[WireErrorException] { p.produceRaw("out", 0, gap) }
      assert(err.code == KafkaWire.ErrOutOfOrderSequence)
      // a corrupted batch is rejected with CORRUPT_MESSAGE
      val good = KafkaWire.encodeBatch(pid, epoch, 1, transactional = true, Seq(("k2", "v2")))
      good(good.length - 1) = (good.last ^ 0x01).toByte
      val crcErr = intercept[WireErrorException] { p.produceRaw("out", 0, good) }
      assert(crcErr.code == KafkaWire.ErrCorruptMessage && b.crcRejected == 1)
      p.commitTransaction()
      p.close()
      assert(b.committed("out") == Vector("k1" -> "v1"),
        s"dedup/reject produced wrong log: ${b.committed("out")}")
    }
  }
}
