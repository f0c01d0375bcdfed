package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.QualityGate

/** The LM quality gate: exact fixed-point surprisal arithmetic against
  * hand-computed values, memory ≡ disk model equivalence, frozen-model
  * semantics across batches (no absorption — verdicts are
  * batch-order-independent), and the streaming wrapper end-to-end. */
class QualityGateSpec extends SparkSpec {
  import spark.implicits._

  // 31 distinct tokens, each adjacent bigram once: V = 31, so an
  // unseen bigram scores round(ln(31)*1e6) = 3433987 > the 3420000
  // admit bound — a fully-novel doc is REJECTED, a corpus-like doc
  // (term round(ln(32)*1e6) - round(ln(2)*1e6) = 2772589) is ADMITTED.
  private val corpusText = (1 to 31).map(i => s"t$i").mkString(" ")
  private val corpus = Seq((1L, corpusText)).toDF("doc_id", "text")

  test("fixed-point surprisal and verdicts match hand computation") {
    val lm = QualityGate.trainLm(corpus)
    assert(lm.v == 31L)
    val batch = Seq(
      (10L, "t1 t2"),  // seen bigram: ln(1+31) - ln(1+1) nats
      (11L, "x1 x2"),  // unseen bigram, unseen context: ln(0+31) - ln(1)
      (12L, "solo")    // < 2 tokens: no verdict row (bypass)
    ).toDF("doc_id", "text")
    val got = QualityGate.score(batch, lm).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5))).toSeq
    val lnX = (k: Long) => Math.round(Math.log(k.toDouble) * 1e6)
    val seen = lnX(32) - lnX(2)     // 2772589
    val unseen = lnX(31)            // 3433987
    def r4(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(got == Seq(
      (10L, 1L, 0L, seen, r4(seen / 1e6), 1L),
      (11L, 1L, 1L, unseen, r4(unseen / 1e6), 0L)), s"got $got")
  }

  test("batch analogs: disk-persisted LM scores identically to memory") {
    val d = "/root/testdata/sf0.001"
    val mem = QualityGate.qQualityGate(spark, d).collect().toSeq
    val disk = QualityGate.qQualityGateDisk(spark, d).collect().toSeq
    assert(mem == disk, "persisted LM diverged from the in-memory model")
    val admits = mem.map(_.getLong(5)).toSet
    assert(admits == Set(0L, 1L), "both verdict classes must be populated")
  }

  test("streaming gate: frozen model, batch-order-independent verdicts") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val verdicts = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val q = QualityGate.start(
      input.toDF().toDF("doc_id", "text"), corpus,
      Files.createTempDirectory("graft-qgate").toString,
      (df, id) => verdicts ++=
        df.collect().map(r => (id, r.getLong(0), r.getLong(5))))
    input.addData((100L, "x1 x2"))           // novel -> rejected
    q.processAllAvailable()
    input.addData((200L, "x1 x2"), (201L, "t1 t2")) // SAME novel text again
    q.processAllAvailable()
    q.stop()
    // the model is frozen: the batch-2 copy of the batch-1 doc gets
    // the SAME verdict (no absorption — unlike the dedup gates, where
    // the copy would flip to rejected-because-seen... here it stays
    // rejected-because-novel-to-the-CORPUS, not because of batch 1)
    assert(verdicts.toSet ==
      Set((0L, 100L, 0L), (1L, 200L, 0L), (1L, 201L, 1L)), s"got $verdicts")
  }
}
