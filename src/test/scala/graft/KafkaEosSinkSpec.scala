package graft

import graft.streaming.KafkaEosSink

/** The K1 exactly-once sink LOGIC, unit-tested against an in-memory
  * transactional fake: atomic visibility (commit/abort), replay
  * skipping via the progress marker, and the marker riding in the
  * same transaction as the data. The production binding swaps only
  * the TxProducer factory (reflection over kafka-clients) — none of
  * the logic under test changes. */
class KafkaEosSinkSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory "broker": records land in `committed` only on
    * commitTransaction — a read_committed consumer's view. */
  private final class FakeProducer extends KafkaEosSink.TxProducer {
    val committed = scala.collection.mutable.ArrayBuffer[(String, String, String)]()
    private val pending = scala.collection.mutable.ArrayBuffer[(String, String, String)]()
    var inits = 0
    var aborts = 0
    var closes = 0
    var failNextCommit = false
    // the ambiguous failure: broker commits, client sees an error
    var failNextCommitAfterLanding = false
    def initTransactions(): Unit = inits += 1
    def beginTransaction(): Unit = pending.clear()
    def send(topic: String, key: String, value: String): Unit =
      pending += ((topic, key, value))
    def commitTransaction(): Unit = {
      if (failNextCommit) { failNextCommit = false; sys.error("broker gone") }
      committed ++= pending; pending.clear()
      if (failNextCommitAfterLanding) {
        failNextCommitAfterLanding = false; sys.error("commit timed out client-side")
      }
    }
    def abortTransaction(): Unit = { aborts += 1; pending.clear() }
    def close(): Unit = closes += 1
    def lastMarker(txId: String): Long = committed
      .collect { case ("progress", k, v) if k == txId => v.toLong }
      .lastOption.getOrElse(-1L)
  }

  private def batch(rows: (String, String)*) = rows.toSeq.toDF("key", "value")

  test("commit is atomic and the progress marker rides in the same transaction") {
    val p = new FakeProducer
    val sink = new KafkaEosSink.Sink("out", "progress", "tx1", () => p, () => -1L)
    sink.write(batch("k1" -> "v1", "k2" -> "v2"), 0L)
    assert(p.inits == 1, "initTransactions (zombie fencing) not called")
    assert(p.committed.count(_._1 == "out") == 2, s"rows missing: ${p.committed}")
    assert(p.lastMarker("tx1") == 0L, "marker did not commit with the batch")
  }

  test("a replayed committed batch is skipped — no duplicate sends") {
    val p = new FakeProducer
    val sink = new KafkaEosSink.Sink("out", "progress", "tx1", () => p, () => -1L)
    sink.write(batch("k1" -> "v1"), 0L)
    val after = p.committed.size
    sink.write(batch("k1" -> "v1"), 0L) // foreachBatch replay, same id
    assert(p.committed.size == after, "replayed batch re-sent rows")
    // and a RESTARTED sink (fresh incarnation) restores the marker and
    // still skips — the crash-after-commit-before-checkpoint window
    val sink2 = new KafkaEosSink.Sink("out", "progress", "tx1",
      () => p, () => p.lastMarker("tx1"))
    sink2.write(batch("k1" -> "v1"), 0L)
    assert(p.committed.size == after, "restarted sink re-sent a committed batch")
    // the NEXT batch goes through
    sink2.write(batch("k3" -> "v3"), 1L)
    assert(p.lastMarker("tx1") == 1L, "next batch after restart did not commit")
  }

  test("a failed batch aborts — nothing becomes visible, retry commits once") {
    val p = new FakeProducer
    val sink = new KafkaEosSink.Sink("out", "progress", "tx1", () => p, () => -1L)
    p.failNextCommit = true
    intercept[RuntimeException] { sink.write(batch("k1" -> "v1"), 0L) }
    assert(p.aborts == 1 && p.committed.isEmpty,
      s"torn batch visible after failure: ${p.committed}")
    // Spark retries the same batch id: fresh transaction, one commit
    sink.write(batch("k1" -> "v1"), 0L)
    assert(p.committed.count(_._1 == "out") == 1 && p.lastMarker("tx1") == 0L,
      "retry after abort did not commit exactly once")
  }

  test("zombie fencing happens BEFORE the progress marker is read") {
    // reading the marker first would leave a window where a zombie's
    // in-flight batch commits after the read — the replay of that
    // batch would then resend (class doc); pin the ordering
    val p = new FakeProducer
    var initsAtMarkerRead = -1
    val sink = new KafkaEosSink.Sink("out", "progress", "tx1", () => p,
      () => { initsAtMarkerRead = p.inits; -1L })
    sink.write(batch("k1" -> "v1"), 0L)
    assert(initsAtMarkerRead == 1,
      s"marker read before initTransactions fenced the zombie (inits=$initsAtMarkerRead)")
  }

  test("ambiguous commit (landed broker-side, failed client-side) does not double-send") {
    val p = new FakeProducer
    val sink = new KafkaEosSink.Sink("out", "progress", "tx1",
      () => p, () => p.lastMarker("tx1"))
    p.failNextCommitAfterLanding = true
    intercept[RuntimeException] { sink.write(batch("k1" -> "v1"), 0L) }
    assert(p.committed.count(_._1 == "out") == 1, "landed commit lost")
    // Spark retries batch 0: the marker re-read resolved the ambiguity,
    // so the retry must SKIP, not commit the rows a second time
    sink.write(batch("k1" -> "v1"), 0L)
    assert(p.committed.count(_._1 == "out") == 1,
      s"ambiguous commit re-sent on retry: ${p.committed}")
    // and the original error was not masked by the guarded abort
    assert(p.aborts == 1, "abort not attempted (or attempted twice)")
  }

  test("close() on a never-written sink does not connect (no fencing of a live writer)") {
    val p = new FakeProducer
    val sink = new KafkaEosSink.Sink("out", "progress", "tx1", () => p, () => -1L)
    sink.close()
    assert(p.inits == 0 && p.closes == 0,
      "close() on an idle sink initialized a producer — would fence the live writer")
  }

  test("transactional id is stable per checkpoint and distinct per partition") {
    val a = KafkaEosSink.transactionalId("/ckpt/clean")
    assert(a == KafkaEosSink.transactionalId("/ckpt/clean"),
      "same checkpoint must reuse the id (zombie fencing depends on it)")
    assert(a != KafkaEosSink.transactionalId("/ckpt/other"),
      "distinct checkpoints must not share a transactional id")
    assert(KafkaEosSink.transactionalId("/ckpt/clean", Some(0)) !=
      KafkaEosSink.transactionalId("/ckpt/clean", Some(1)),
      "partition writers must not share a transactional id")
    // the reference's EOS producer config surface, pinned
    val cfg = KafkaEosSink.producerConfigs("broker:9092", a)
    assert(cfg("transactional.id") == a && cfg("enable.idempotence") == "true"
      && cfg("acks") == "all" && cfg.contains("transaction.timeout.ms"))
  }
}
