package graft

import org.apache.commons.codec.digest.DigestUtils

import graft.operators.TextAnalysis

/** Priority sampling: the sample must be EXACTLY the top-K of the
  * from-first-principles priorities (recomputed here straight from
  * md5 hex strings, independent of every Spark/DataFrame helper), tau
  * must be the (K+1)-th priority, and each w_hat the estimator's
  * max(w*2^24, tau). */
class PrioritySampleSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("sample = exact top-K; tau and w_hat follow the estimator") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(docs.length > TextAnalysis.SampleK + 1)

    // ground truth from first principles
    def priority(id: Long, w: Long): Long = {
      val v = java.lang.Long.parseLong(
        DigestUtils.md5Hex(id.toString).substring(0, 6), 16)
      (w * (1L << 24)) / (v + 1)
    }
    val ranked = docs.map { case (id, w) => (id, w, priority(id, w)) }
      .sortBy { case (id, _, p) => (-p, id) }
    val expectTau = ranked(TextAnalysis.SampleK)._3

    val got = TextAnalysis.qPrioritySample(spark, d).collect()
    assert(got.length == TextAnalysis.SampleK)
    got.zip(ranked.take(TextAnalysis.SampleK)).zipWithIndex.foreach {
      case ((row, (id, w, p)), i) =>
        assert(row.getAs[Long]("rnk") == i + 1)
        assert(row.getAs[Long]("doc_id") == id, s"rank ${i + 1} mismatch")
        assert(row.getAs[Long]("priority") == p)
        assert(row.getAs[Long]("w_hat") == math.max(w, expectTau))
    }
    // the subset-sum estimate over the WHOLE sample should land near
    // the true corpus weight (deterministic given the corpus; the
    // wide band just guards against a broken estimator, e.g. w_hat
    // missing tau or double-counting)
    val est = got.map(_.getAs[Long]("w_hat").toDouble).sum
    val truth = docs.map(_._2.toDouble).sum
    assert(est > truth / 5 && est < truth * 5,
      s"estimate $est implausibly far from true total $truth")
  }
}
