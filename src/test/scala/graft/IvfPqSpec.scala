package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Composed IVF-PQ search: the coarse prune must bound the candidate
  * universe (results only ever come from probed cells), the final
  * scores must be the EXACT fixed-point dot of the original vectors
  * (the rerank contract — ADC is allowed to rank, never to score),
  * and the recall surface must be well-formed. */
class IvfPqSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  // derived serving knobs for this corpus (round-20 parameterization)
  private def nq = Similarity.numQueriesFor(
    Tables.embeddings(spark, d).count()).toInt

  test("shape: K ranked rows per query, ranks contiguous") {
    val rows = Similarity.qKnnIvfPq(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.length == nq * Similarity.K)
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1L to Similarity.K), s"ranks for $qid")
      val dots = rs.sortBy(_._4).map(_._3)
      assert(dots.zip(dots.tail).forall { case (a, b) => a >= b },
        s"dots not descending for $qid")
    }
  }

  test("results come only from probed cells; dots are the exact fixed-point dot") {
    val emb = Tables.embeddings(spark, d)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def rawDot(a: Array[Float], b: Array[Float]): Long =
      a.zip(b).map { case (x, y) =>
        math.floor(x.toDouble * y.toDouble * 1e12 + 0.5).toLong }.sum

    val cent = Similarity.trainedCentroids(spark, d)
    val assign = Similarity.assignCells(
      Similarity.withNorm(Tables.embeddings(spark, d)),
      Similarity.centroidArray(cent))
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val got = Similarity.qKnnIvfPq(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got.foreach { case (qid, cid, dot) =>
      // the exact-rerank contract: the reported dot is the fixed-point
      // dot of the ORIGINAL vectors, not an ADC approximation
      assert(math.abs(dot - rawDot(emb(qid), emb(cid)) / 1e12) < 1e-12,
        s"($qid,$cid) dot is not the exact rerank value")
    }
    // coarse-prune contract: every returned neighbor lives in one of
    // its query's ACTUAL NProbe probe cells, where the probe list is
    // recomputed here exactly as the query side computes it (cosine
    // top-NProbe over the trained centroids, ties toward the lower
    // cent_id). Deriving the "probed" set from the results themselves
    // (the round-12 form) only bounded its SIZE — a bug scoring
    // candidates from un-probed cells could pass whenever the winners
    // happened to cluster in <= NProbe cells.
    val centRows = cent.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
    def n2(a: Array[Float]): Double = rawDot(a, a) / 1e12
    val probeList: Map[Long, Set[Long]] = got.map(_._1).distinct.map { qid =>
      val qe = emb(qid)
      val qn2 = n2(qe)
      qid -> centRows
        .map { case (cellId, ce, cn2) =>
          (cellId, (rawDot(qe, ce) / 1e12) / (math.sqrt(qn2) * math.sqrt(cn2))) }
        .sortBy { case (id, c) => (-c, id) }
        .take(Similarity.nprobeFor(centRows.length).toInt).map(_._1).toSet
    }.toMap
    got.foreach { case (qid, cid, _) =>
      assert(probeList(qid).contains(assign(cid)),
        s"query $qid returned $cid from cell ${assign(cid)}, " +
          s"outside its probe list ${probeList(qid)}")
    }
  }

  test("residual variant: same contracts (probed cells only, exact rerank dots)") {
    val emb = Tables.embeddings(spark, d)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def rawDot(a: Array[Float], b: Array[Float]): Long =
      a.zip(b).map { case (x, y) =>
        math.floor(x.toDouble * y.toDouble * 1e12 + 0.5).toLong }.sum
    val got = Similarity.qKnnIvfPqR(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.length == nq * Similarity.K)
    got.foreach { case (qid, cid, dot, _) =>
      assert(math.abs(dot - rawDot(emb(qid), emb(cid)) / 1e12) < 1e-12,
        s"($qid,$cid) residual-path dot is not the exact rerank value")
    }
    // restart path: the residual codebooks live behind saved tables too
    assert(spark.catalog.tableExists(Similarity.annTableName("pqr0", d)),
      "residual training must leave saved codebook tables behind")
    Similarity.clearArtifactMemos()
    val s2 = spark.newSession()
    assert(Similarity.qKnnIvfPqR(s2, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
      == got.toSeq,
      "mounted residual codebooks must reproduce the search bit-for-bit")
  }

  test("recall surface is well-formed and matches a driver-side recount") {
    val rec = Similarity.qIvfPqRecall(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rec.map(_._1).toSeq == (0L until nq).toSeq)
    rec.foreach { case (qid, k, hit, r) =>
      assert(k == Similarity.K && hit >= 0 && hit <= k)
      assert(math.abs(r - hit.toDouble / k) < 1e-15, s"recall arithmetic $qid")
    }
  }
}
