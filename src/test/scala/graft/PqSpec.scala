package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Product quantization: code-surface invariants, and the ADC search
  * against a from-scratch driver-side reference (codebook dots and the
  * integer ADC sum recomputed in plain Scala with the same fixed-point
  * formula — any drift in subspace slicing, assignment tie-breaks, or
  * the LUT join breaks exact equality). */
class PqSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  // derived serving knobs for this corpus (round-20 parameterization)
  private def nq = Similarity.numQueriesFor(
    Tables.embeddings(spark, d).count())

  private def fxDot(a: Seq[Float], b: Seq[Float]): Long =
    a.zip(b).map { case (x, y) =>
      Math.floor(x.toDouble * y.toDouble * 1e12 + 0.5).toLong
    }.sum

  test("codes: 4 per vector, drawn from the codebooks, deterministic") {
    val codes = Similarity.qPqCodes(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = Tables.embeddings(spark, d).count()
    assert(codes.length == 4 * n, "every vector needs one code per subspace")
    for (m <- 0 until Similarity.PqM) {
      val ids = Similarity.pqCodebook(spark, d, m).collect()
        .map(_.getLong(0)).toSet
      assert(ids.size > 1, s"subspace $m codebook collapsed to one centroid")
      val used = codes.filter(_._2 == m).map(_._3).toSet
      assert(used.subsetOf(ids), s"subspace $m emitted an unknown code")
    }
    val again = Similarity.qPqCodes(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(codes.toSeq == again.toSeq, "codes must be deterministic")
  }

  test("ADC search equals a driver-side integer reference") {
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val codebooks = (0 until Similarity.PqM).map(m =>
      Similarity.pqCodebook(spark, d, m).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap)
    val codes = Similarity.qPqCodes(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1).toInt), r.getLong(2))).toMap
    def sub(v: Array[Float], m: Int): Seq[Float] =
      v.slice(m * Similarity.PqSubDim, (m + 1) * Similarity.PqSubDim).toSeq
    // reference: ADC shortlist (sum of per-subspace raw-integer dots
    // against the candidate's ASSIGNED centroids), then exact-dot
    // rerank of the survivors — both stages recomputed from scratch
    val byId = e.toMap
    val want = e.filter(_._1 < nq).flatMap { case (qid, qv) =>
      val short = e.filter(_._1 != qid).map { case (cid, _) =>
        val adc = (0 until Similarity.PqM).map { m =>
          fxDot(sub(qv, m), codebooks(m)(codes((cid, m))).toSeq)
        }.sum
        (cid, adc)
      }.sortBy { case (cid, adc) => (-adc, cid) }
        .take(Similarity.shortlistFor(e.length).toInt).map(_._1)
      short.map(cid => (cid, fxDot(qv.toSeq, byId(cid).toSeq)))
        .sortBy { case (cid, dfx) => (-dfx, cid) }
        .take(Similarity.K).zipWithIndex
        .map { case ((c, dfx), i) => (qid, c, dfx / 1e12, (i + 1).toLong) }
    }.sortBy(r => (r._1, r._4)).toSeq
    val got = Similarity.qKnnPq(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got == want, "ADC search diverged from the integer reference")
  }

  test("recall eval: populated, bounded, and not degenerate") {
    val rows = Similarity.qPqRecall(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == nq)
    assert(rows.forall { case (_, k, h, rec) =>
      k == Similarity.K && h >= 0 && h <= k && rec == h.toDouble / k })
    // PQ at 64x compression should still beat random top-10 easily
    val mean = rows.map(_._4).sum / rows.length
    assert(mean > 0.2, s"ADC recall implausibly low: $mean")
  }
}
