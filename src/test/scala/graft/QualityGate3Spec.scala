package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.TextAnalysis.LmBackoffLnX1e6
import graft.streaming.QualityGate

/** The trigram stupid-backoff gate: every backoff level's fixed-point
  * arithmetic against hand-computed values, the admit-by-omission
  * bypass, and frozen-model replay stability — the SAME document
  * re-scored in a later batch gets bit-identical verdict rows. */
class QualityGate3Spec extends SparkSpec {
  import spark.implicits._

  // corpus: "a b c" x3 and "b c" x2 -> trigram (a,b,c) count 3;
  // bigrams: (a,b) 3, (b,c) 5; unigrams: a 3, b 5, c 5; N=13, V=3
  private val corpus = Seq(
    (1L, "a b c"), (2L, "a b c"), (3L, "a b c"),
    (4L, "b c"), (5L, "b c")).toDF("doc_id", "text")

  private val lnX = (k: Long) => Math.round(Math.log(k.toDouble) * 1e6)
  private def r4(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  test("all three backoff levels match hand computation") {
    val lm = QualityGate.trainLm3(corpus)
    assert(lm.n == 13L && lm.v == 3L)
    val batch = Seq(
      (10L, "a b c"),  // trigram hit: ln c12(=3) - ln c123(=3) = 0 nats
      (11L, "x b c"),  // tri miss, bigram (b,c) hit: -ln0.4 + ln c2(=5) - ln c23(=5)
      (12L, "x y c"),  // tri+bi miss, unigram c: -2ln0.4 + ln(N+V=16) - ln(c_uni(5)+1)
      (13L, "x y z"),  // fully unseen: -2ln0.4 + ln 16 - ln(0+1)
      (14L, "a b")     // < 3 tokens: no verdict row (bypass)
    ).toDF("doc_id", "text")
    val got = QualityGate.score3(batch, lm).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getLong(7))).toSeq
    val tri = lnX(3) - lnX(3)                            // 0
    val bi = -LmBackoffLnX1e6 + lnX(5) - lnX(5)          // 916291
    val uniC = -2 * LmBackoffLnX1e6 + lnX(16) - lnX(6)   // seen unigram
    val uniZ = -2 * LmBackoffLnX1e6 + lnX(16) - lnX(1)   // unseen word
    def admit(sur: Long, n: Long): Long =
      if (sur <= QualityGate.AdmitMaxNats3X1e6 * n) 1L else 0L
    assert(got == Seq(
      (10L, 1L, 1L, 0L, 0L, tri, r4(tri / 1e6), admit(tri, 1)),
      (11L, 1L, 0L, 1L, 0L, bi, r4(bi / 1e6), admit(bi, 1)),
      (12L, 1L, 0L, 0L, 1L, uniC, r4(uniC / 1e6), admit(uniC, 1)),
      (13L, 1L, 0L, 0L, 1L, uniZ, r4(uniZ / 1e6), admit(uniZ, 1))), s"got $got")
    // the verdict classes must differ across the levels (the backoff
    // penalties bite): trigram evidence admits, a fully-unseen
    // trigram with the double penalty rejects
    assert(admit(tri, 1) == 1L && admit(uniZ, 1) == 0L)
  }

  test("batch analog populates both verdict classes at sf0.001") {
    val got = QualityGate.qQuality3Gate(spark, "/root/testdata/sf0.001")
      .collect()
    assert(got.map(_.getLong(7)).toSet == Set(0L, 1L),
      "both admit classes must be populated at the calibrated threshold")
  }

  test("streaming gate: replay-stable verdicts (frozen model, no absorption)") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val verdicts = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    val q = QualityGate.start3(
      input.toDF().toDF("doc_id", "text"), corpus,
      Files.createTempDirectory("graft-q3gate").toString,
      (df, id) => verdicts ++= df.collect()
        .map(r => (id, r.getLong(0), r.getLong(5), r.getLong(7))))
    input.addData((10L, "a b c"), (11L, "x y z"))
    q.processAllAvailable()
    // the SAME documents again in a later batch — a frozen model must
    // re-emit bit-identical surprisal and verdicts (no absorption of
    // batch 0's trigrams into the model between triggers)
    input.addData((10L, "a b c"), (11L, "x y z"))
    q.processAllAvailable()
    q.stop()
    val b0 = verdicts.filter(_._1 == 0L).map(t => (t._2, t._3, t._4)).sortBy(_._1)
    val b1 = verdicts.filter(_._1 == 1L).map(t => (t._2, t._3, t._4)).sortBy(_._1)
    assert(b0.nonEmpty && b0 == b1,
      s"replayed batch diverged: batch0 $b0 vs batch1 $b1")
  }
}
