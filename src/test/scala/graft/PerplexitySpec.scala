package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.security.MessageDigest

import graft.operators.TextAnalysis

/** The bigram-LM perplexity scorer against a from-scratch driver-side
  * reference implementation: tokenization, the md5 13/2/1 split, add-one
  * smoothing, the capped LM, and the fixed-point surprisal arithmetic
  * are all re-derived independently here, so a drift in ANY stage of
  * the distributed plan (fan-out, cap tie-break, context sums, join
  * nullability) breaks exact equality. */
class PerplexitySpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def split16(docId: Long): String = {
    val md = MessageDigest.getInstance("MD5")
      .digest(docId.toString.getBytes("UTF-8"))
    val hex = "%02x".format(md(0) & 0xff)
    val b = "0123456789abcdef".indexOf(hex.charAt(0))
    if (b < 13) "train" else if (b < 15) "val" else "test"
  }

  private def lnX1e6(k: Long): Long = Math.round(Math.log(k.toDouble) * 1e6)

  test("matches a driver-side reference implementation exactly") {
    val docs = Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String): Array[String] =
      t.trim.toLowerCase.split("\\s+", -1)
    val withSplit = docs.map { case (id, t) => (id, split16(id), toks(t)) }

    // train LM: bigram counts, capped with the (count desc, prev, w)
    // tie-break; contexts summed over the KEPT rows only
    val trainBg = withSplit.filter(_._2 == "train")
      .flatMap { case (_, _, tk) => tk.sliding(2).filter(_.length == 2) }
      .map(p => (p(0), p(1)))
    val bgc = trainBg.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val kept = bgc.toSeq
      .sortBy { case ((p, w), c) => (-c, p, w) }
      .take(TextAnalysis.LmMaxBigrams).toMap
    val ctx = kept.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val v = withSplit.filter(_._2 == "train").flatMap(_._3).distinct.length.toLong

    val want = withSplit
      .filter(_._3.length >= 2)
      .map { case (id, sp, tk) =>
        val pairs = tk.sliding(2).map(p => (p(0), p(1))).toSeq
        val terms = pairs.map { pw =>
          val cPair = kept.getOrElse(pw, 0L)
          val cCtx = ctx.getOrElse(pw._1, 0L)
          (lnX1e6(cCtx + v) - lnX1e6(cPair + 1), cPair == 0L)
        }
        val s6 = terms.map(_._1).sum
        val n = pairs.length.toLong
        val avg = JBigDecimal.valueOf(s6 / 1e6 / n)
          .setScale(4, RoundingMode.HALF_UP).doubleValue()
        (id, sp, n, terms.count(_._2).toLong, s6, avg)
      }
      .sortBy(_._1).toSeq

    val got = TextAnalysis.qPerplexity(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == want, "perplexity diverged from the reference LM")
  }

  test("scoring plan: LM broadcasts, token side never hash-shuffles") {
    val plan = TextAnalysis.qPerplexity(spark, d)
      .queryExecution.executedPlan.toString
    // both LM joins must be broadcast hash joins building on the
    // (bounded, capped) model side — a sort-merge join here would mean
    // the token stream is being shuffled by key, the exact cost the
    // cap exists to avoid
    assert(!plan.contains("SortMergeJoin"),
      s"LM scoring join degraded to a shuffle join:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      s"expected two broadcast LM joins:\n$plan")
    // the per-doc re-agg must partial-aggregate before its exchange
    // (shuffle O(docs), not O(tokens))
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"per-doc aggregation lost its map-side partial:\n$plan")
  }

  test("output is non-vacuous: all splits scored, scores discriminate") {
    val rows = TextAnalysis.qPerplexity(spark, d).collect()
    assert(rows.length > 10)
    assert(rows.map(_.getString(1)).distinct.toSet == Set("train", "val", "test"),
      "every split should appear in the scored output")
    assert(rows.map(_.getDouble(5)).distinct.length > 1,
      "scores should not collapse to a single value")
    assert(rows.forall(_.getDouble(5) > 0.0), "surprisal must be positive")
  }
}
