package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.DsirGate

/** The DSIR importance gate: exact fixed-point weight arithmetic
  * against hand-computed values, memory ≡ disk model equivalence, and
  * frozen-model semantics through the streaming wrapper (no
  * absorption — verdicts are batch-order-independent). */
class DsirGateSpec extends SparkSpec {
  import spark.implicits._

  // vocab: (a,b)x2 + (b,a)x1 from the en doc, (c,d)x1 from the de doc
  // -> V=3 feats, T=3 target occurrences, R=4 raw occurrences
  private val corpus = Seq(
    (1L, "a b a b", "en"),
    (2L, "c d", "de")
  ).toDF("doc_id", "text", "lang")

  private val ln6 = (k: Long) => Math.round(Math.log(k.toDouble) * 1e6)
  // term(c_tgt, c_raw) with T+V=6, R+V=7
  private def term(cTgt: Long, cRaw: Long): Long =
    (ln6(cTgt + 1) - ln6(6)) - (ln6(cRaw + 1) - ln6(7))

  test("fixed-point weights and verdicts match hand computation") {
    val m = graft.operators.TextAnalysis.dsirTrain(corpus)
    assert((m.tTot, m.rTot, m.v) == ((3L, 4L, 3L)), s"totals ${(m.tTot, m.rTot, m.v)}")
    val batch = Seq(
      (10L, "a b"),  // in-vocab, target-heavy: term(2,2) > 0 -> admit
      (11L, "c d"),  // in-vocab, target-absent: term(0,1) < 0 -> reject
      (12L, "solo"), // < 2 tokens: no verdict row (bypass)
      (13L, "x y")   // out-of-vocab: smoothing-floor term(0,0)
    ).toDF("doc_id", "text")
    val got = DsirGate.score(batch, m).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val want = Seq(
      (10L, 1L, 0L, term(2, 2), term(2, 2), 1L),
      (11L, 1L, 0L, term(0, 1), term(0, 1), 0L),
      (13L, 1L, 1L, term(0, 0), term(0, 0), 1L))
    assert(got == want, s"got $got want $want")
    // the hand values themselves: the target-absent in-vocab feature
    // must be the rejected one, and far below the admit line
    assert(term(0, 1) < DsirGate.AdmitMinX1e6 && term(2, 2) > 0)
  }

  test("batch analogs: disk-persisted model scores identically to memory") {
    val d = "/root/testdata/sf0.001"
    val mem = DsirGate.qDsirGate(spark, d).collect().toSeq
    val disk = DsirGate.qDsirGateDisk(spark, d).collect().toSeq
    assert(mem == disk, "persisted model diverged from the in-memory model")
    val admits = mem.map(_.getLong(5)).toSet
    assert(admits == Set(0L, 1L), "both verdict classes must be populated")
  }

  test("streaming gate: frozen model, batch-order-independent verdicts") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val verdicts = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val q = DsirGate.start(
      input.toDF().toDF("doc_id", "text"), corpus,
      Files.createTempDirectory("graft-dsirgate").toString,
      (df, id) => verdicts ++=
        df.collect().map(r => (id, r.getLong(0), r.getLong(5))))
    input.addData((100L, "c d"))                    // off-target -> rejected
    q.processAllAvailable()
    input.addData((200L, "c d"), (201L, "a b"))     // SAME text again
    q.processAllAvailable()
    q.stop()
    // frozen: the batch-2 copy of the batch-1 doc gets the SAME verdict
    // (no absorption — it stays rejected-because-off-TARGET, not
    // because batch 1 saw it)
    assert(verdicts.toSet ==
      Set((0L, 100L, 0L), (1L, 200L, 0L), (1L, 201L, 1L)), s"got $verdicts")
  }
}
