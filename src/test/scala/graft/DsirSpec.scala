package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** DSIR importance resampling (Xie et al. 2023) against an
  * independently-formulated driver-side ground truth: plain Scala maps
  * recompute the capped feature vocab, the add-one smoothing totals,
  * and every document's fixed-point importance weight, so the
  * broadcast-join/re-agg plan is proven against arithmetic that shares
  * none of its code. */
class DsirSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  // the whole-corpus ground-truth model, built once
  private lazy val truth: Map[Long, (Long, Long, Long)] = {
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("text"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String): Array[String] = t.trim.toLowerCase.split("\\s+")
    def bgs(t: String): Seq[(String, String)] = {
      val ts = toks(t)
      if (ts.length < 2) Seq.empty else ts.sliding(2).map(p => (p(0), p(1))).toSeq
    }
    val rawAll = docs.flatMap { case (_, t, _) => bgs(t) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val vocab = rawAll.toSeq
      .sortBy { case ((p, w), c) => (-c, p, w) }
      .take(TextAnalysis.DsirMaxFeatures).map(_._1).toSet
    val raw = rawAll.filter { case (k, _) => vocab(k) }
    val tgt = docs.filter(_._3 == "en").flatMap { case (_, t, _) => bgs(t) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      .filter { case (k, _) => vocab(k) }
    val tTot = tgt.values.sum; val rTot = raw.values.sum; val v = vocab.size.toLong
    def ln6(k: Long): Long = math.round(math.log(k.toDouble) * 1e6)
    docs.flatMap { case (id, t, _) =>
      val b = bgs(t)
      if (b.isEmpty) None
      else {
        val logw = b.map { f =>
          (ln6(tgt.getOrElse(f, 0L) + 1) - ln6(tTot + v)) -
            (ln6(raw.getOrElse(f, 0L) + 1) - ln6(rTot + v))
        }.sum
        Some(id -> ((b.length.toLong, b.count(f => !vocab(f)).toLong, logw)))
      }
    }.toMap
  }

  test("per-document weights match the driver-side model exactly") {
    val got = TextAnalysis.qDsirWeights(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.size == truth.size, s"${got.size} docs vs ${truth.size}")
    truth.foreach { case (id, (nf, noov, lw)) =>
      val (gnf, gnoov, glw, gavg) = got(id)
      assert(gnf == nf && gnoov == noov && glw == lw,
        s"doc $id: got ($gnf,$gnoov,$glw) want ($nf,$noov,$lw)")
      val wantAvg = math.signum(lw) * (math.abs(lw) / nf)
      assert(gavg == wantAvg, s"doc $id avg: $gavg vs $wantAvg")
    }
    // non-vacuous: weights separate — some positive, some negative
    val ws = truth.values.map(_._3)
    assert(ws.exists(_ > 0) && ws.exists(_ < 0),
      "weight distribution is one-sided — separation vacuous")
  }

  test("top-K selection is the weight-desc/doc-asc argmax and shifts the mix to the target") {
    val sel = TextAnalysis.qDsirSample(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(sel.length == TextAnalysis.DsirSampleK)
    // ranks are 1..K in weight order, matching the ground-truth sort
    val wantIds = truth.toSeq.sortBy { case (id, (_, _, lw)) => (-lw, id) }
      .take(TextAnalysis.DsirSampleK).map(_._1)
    assert(sel.map(_._1).toSeq == (1L to TextAnalysis.DsirSampleK.toLong),
      "ranks not 1..K")
    assert(sel.map(_._2).toSeq == wantIds, "selection diverged from argmax")
    // the point of DSIR: the selected share of the target language
    // strictly exceeds its pool share
    val pool = Tables.documents(spark, d).select(col("lang")).collect()
      .map(_.getString(0))
    val poolShare = pool.count(_ == "en").toDouble / pool.length
    val selShare = sel.count(_._3 == "en").toDouble / sel.length
    assert(selShare > poolShare,
      s"no target enrichment: sel $selShare vs pool $poolShare")
    // and the shift audit agrees with the selection, lang by lang
    val shift = TextAnalysis.qDsirShift(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(shift.map(_._2).sum == pool.length)
    assert(shift.map(_._3).sum == TextAnalysis.DsirSampleK.toLong)
    shift.foreach { case (lang, _, nSel) =>
      assert(nSel == sel.count(_._3 == lang), s"shift row $lang disagrees")
    }
  }
}
