package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.KafkaWire
import graft.streaming.KafkaWire.{EmbeddedBroker, WireProducer}

/** Fault injection against the wire client — the failures a real
  * cluster throws hourly at 100 TB (round-17, VERDICT r16 #5):
  * leadership moves (NOT_LEADER, error 6), sockets torn
  * mid-RecordBatch (broker restart / network partition), and
  * worst-case TCP fragmentation. The contract under every fault:
  * the planned offset range is read EXACTLY once — no loss, no
  * duplicate admission — because fetches are idempotent reads at
  * explicit offsets and the pager only advances past fully-decoded
  * pages. */
class KafkaWireChaosSpec extends SparkSpec {

  private def withBroker(f: EmbeddedBroker => Unit): Unit = {
    val b = new EmbeddedBroker
    try f(b) finally b.stop()
  }

  private def produce(b: EmbeddedBroker, topic: String, txId: String,
      vals: String*): Unit = {
    val p = new WireProducer("127.0.0.1", b.port, txId)
    p.initTransactions()
    vals.foreach { v =>
      p.beginTransaction(); p.send(topic, v, v); p.commitTransaction()
    }
    p.close()
  }

  // log after produce(5): data@0 m@1 data@2 m@3 ... data@8 m@9
  private val Expect = Vector((0L, "k0"), (2L, "k1"), (4L, "k2"),
    (6L, "k3"), (8L, "k4"))

  test("NOT_LEADER mid-read: reader re-resolves and the range is exact") {
    withBroker { b =>
      produce(b, "t", "nl-tx", "k0", "k1", "k2", "k3", "k4")
      b.notLeaderNextFetches.set(2)
      val recs = KafkaWire.fetchCommittedRange("127.0.0.1", b.port, "t", 0, 0L, 10L)
      assert(recs.map(r => (r._1, r._2)) == Expect,
        s"lost/duplicated under NOT_LEADER: ${recs.map(r => (r._1, r._2))}")
      assert(b.notLeaderNextFetches.get() == 0, "fault not exercised")
    }
  }

  test("NOT_LEADER past the retry budget fails loudly with error 6") {
    withBroker { b =>
      produce(b, "t", "nl2-tx", "k0")
      b.notLeaderNextFetches.set(1000) // never recovers
      val e = intercept[KafkaWire.WireErrorException] {
        KafkaWire.fetchCommittedRange("127.0.0.1", b.port, "t", 0, 0L, 2L)
      }
      assert(e.code == KafkaWire.ErrNotLeader, s"wrong error: ${e.code}")
    }
  }

  test("socket cut mid-RecordBatch: reconnect, re-fetch, exact range") {
    withBroker { b =>
      produce(b, "t", "cut-tx", "k0", "k1", "k2", "k3", "k4")
      // cut TWO responses, on a byte-capped broker so the cuts land
      // on different pages of the same planned range
      b.maxFetchBytes = 150
      b.cutNextFetchResponses.set(2)
      val recs = KafkaWire.fetchCommittedRange("127.0.0.1", b.port, "t", 0, 0L, 10L)
      assert(recs.map(r => (r._1, r._2)) == Expect,
        s"lost/duplicated across socket cuts: ${recs.map(r => (r._1, r._2))}")
      assert(b.cutNextFetchResponses.get() == 0, "fault not exercised")
    }
  }

  test("produce response lost AFTER the append: sequence dedup keeps it exactly-once") {
    withBroker { b =>
      // the classic duplicate scenario idempotence exists for: the
      // broker appends the batch, then the socket dies before the
      // producer reads the ack — the producer MUST retry (it cannot
      // know the append happened), and the broker MUST dedup the
      // retried (pid, baseSequence)
      val p = new WireProducer("127.0.0.1", b.port, "cutp-tx")
      try {
        p.initTransactions(); p.beginTransaction()
        p.send("t", "k0", "v0")
        b.cutNextProduceResponses.set(1)
        p.send("t", "k1", "v1") // appended, ack cut, retried, deduped
        p.commitTransaction()
      } finally p.close()
      assert(b.dedupedProduces >= 1, "the retried batch must hit the dedup path")
      val recs = KafkaWire.fetchCommittedRange("127.0.0.1", b.port, "t", 0, 0L, 3L)
      assert(recs.map(r => (r._1, r._3)) == Vector((0L, "v0"), (1L, "v1")),
        s"lost/duplicated across the torn produce ack: $recs")
    }
  }

  test("short reads (7-byte TCP dribbles): framing survives fragmentation") {
    withBroker { b =>
      produce(b, "t", "drb-tx", "k0", "k1", "k2", "k3", "k4")
      b.dribbleResponses = true
      val recs = KafkaWire.fetchCommittedRange("127.0.0.1", b.port, "t", 0, 0L, 10L)
      assert(recs.map(r => (r._1, r._2)) == Expect,
        s"fragmented read mangled records: ${recs.map(r => (r._1, r._2))}")
      // the EOS marker-restore read crosses the same chaos path
      assert(KafkaWire.listOffset("127.0.0.1", b.port, "t", 0, earliest = false) == 10L)
    }
  }

  test("streaming source through a mid-stream leadership change + socket cut: exactly-once admission") {
    withBroker { b =>
      produce(b, "in", "e2e-tx", "a", "b", "c")
      val df = spark.readStream.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", b.port.toString)
        .option("topic", "in").load()
      val q = df.writeStream.format("memory").queryName("kw_chaos")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-kw-chaos").toString)
        .start()
      try {
        q.processAllAvailable()
        // inject BOTH faults between triggers: the next batch's task
        // reader must recover transparently (no task failure, no
        // duplicate rows in the sink table)
        produce(b, "in", "e2e-tx-2", "d", "e")
        b.notLeaderNextFetches.set(1)
        b.cutNextFetchResponses.set(1)
        q.processAllAvailable()
        val got = spark.table("kw_chaos")
          .select(col("offset"), col("value")).collect()
          .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
        // commit markers occupy 1,3,5 and 7,9 — data at 0,2,4,6,8
        assert(got.toSeq == Seq((0L, "a"), (2L, "b"), (4L, "c"),
          (6L, "d"), (8L, "e")),
          s"chaos broke exactly-once admission: ${got.toSeq}")
      } finally q.stop()
    }
  }
}
