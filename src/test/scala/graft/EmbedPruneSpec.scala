package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Embedding pruning by quantizer fit, against an independently-
  * formulated driver-side ground truth: plain Scala recomputes every
  * vector's winning cosine over the collected centroid set with the
  * same fixed-point dot formula, sorts the fits, and indexes the
  * ceil(n/10)-th element — proving the zero-shuffle argmax AND the
  * histogram order-statistic cutoff against code that shares
  * nothing with the operators. */
class EmbedPruneSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  // the shared fixed-point arithmetic, re-derived from first principles
  private def dotFx(a: Seq[Float], b: Seq[Float]): Double =
    a.zip(b).map { case (x, y) =>
      math.floor(x.toDouble * y.toDouble * 1e12 + 0.5).toLong
    }.sum / 1e12

  private lazy val truth: Map[Long, (Long, Long)] = { // vec_id -> (cell, fit_x1e6)
    val cents = Similarity.trainedCentroids(spark, d).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
    val vecs = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    vecs.map { case (id, e) =>
      val n2 = dotFx(e, e)
      // argmax by (cosine desc, cent_id asc) — the nearestCell tie-break
      val (cell, cos) = cents.map { case (cid, ce, cn2) =>
        (cid, dotFx(e, ce) / (math.sqrt(n2) * math.sqrt(cn2)))
      }.minBy { case (cid, c) => (-c, cid) }
      id -> ((cell, math.floor(cos * 1e6 + 0.5).toLong))
    }.toMap
  }

  test("per-vector fit and assignment match the first-principles argmax") {
    val got = Similarity.qEmbedPrune(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got.size == truth.size)
    truth.foreach { case (id, (cell, fit)) =>
      val (gCell, gFit, _) = got(id)
      assert(gCell == cell && gFit == fit,
        s"vec $id: got ($gCell,$gFit) want ($cell,$fit)")
    }
  }

  test("the prune verdict is the exact bottom decile by fit") {
    val got = Similarity.qEmbedPrune(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    val sorted = truth.values.map(_._2).toSeq.sorted
    val n = sorted.length
    val cut = sorted((n + 9) / 10 - 1)
    got.foreach { case (id, fit, prune) =>
      assert(prune == (fit <= cut), s"vec $id: prune=$prune fit=$fit cut=$cut")
    }
    val nPruned = got.count(_._3)
    assert(nPruned >= n / 10 && nPruned < n / 2,
      s"decile verdict implausible: $nPruned of $n")
    assert(nPruned > 0 && nPruned < n, "one-sided verdicts — vacuous")
    // and the per-cell report is the verdict frame's own rollup
    val stats = Similarity.qEmbedPruneStats(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCell = got.groupBy(r => truth(r._1)._1)
    assert(stats.map(_._2).sum == n.toLong)
    stats.foreach { case (cell, nv, np) =>
      assert(nv == byCell(cell).length.toLong, s"cell $cell population")
      assert(np == byCell(cell).count(_._3).toLong, s"cell $cell pruned count")
    }
  }
}
