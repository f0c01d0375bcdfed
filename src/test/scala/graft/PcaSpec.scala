package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Fixed-point PCA power iteration: the learned direction must equal
  * a from-first-principles Scala mirror of the exact integer chain,
  * be (quantization-)unit-length, and dominate every coordinate axis
  * on the Rayleigh quotient — i.e. actually be the top axis, not just
  * a converged arbitrary vector. */
class PcaSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def vectors(): Array[Array[Long]] =
    Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding")).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(x =>
        math.floor(x.toDouble * Similarity.PcaQuant + 0.5).toLong).toArray)

  /** The exact chain, scalar-side: integer aggregations, signed
    * truncating shift, identical double re-scale. */
  private def refPower(xq: Array[Array[Long]]): (Array[Long], Long) = {
    val dim = xq.head.length
    var v = Array.fill(dim)(1000000L)
    var normShifted = 0L
    for (_ <- 1 to Similarity.PcaRounds) {
      val s = xq.map(row => row.indices.map(j => row(j) * v(j)).sum)
      val y = Array.tabulate(dim) { j =>
        xq.indices.map(i => BigInt(s(i)) * xq(i)(j)).sum
      }
      val ys = y.map(b => (b.signum: BigInt) * (b.abs / Similarity.PcaShift))
      val nrm = math.sqrt(ys.map(b => b * b).sum.toDouble)
      v = ys.map(b => math.floor(b.toDouble / nrm * 1e6 + 0.5).toLong)
      normShifted = math.floor(nrm).toLong
    }
    (v, normShifted)
  }

  test("direction matches the scalar mirror; unit length; axis dominance") {
    val xq = vectors()
    val (wantV, wantNorm) = refPower(xq)
    val got = Similarity.qPcaPower(spark, d).collect()
      .sortBy(_.getAs[Long]("pos"))
    assert(got.length == xq.head.length)
    got.zipWithIndex.foreach { case (r, j) =>
      assert(r.getAs[Long]("v_x1e6") == wantV(j), s"component $j")
      assert(r.getAs[Long]("norm_shifted") == wantNorm)
    }
    // unit length within quantization (each component off by < 1e-6)
    val n2 = wantV.map(c => c.toDouble / 1e6).map(c => c * c).sum
    assert(math.abs(n2 - 1.0) < 1e-4, s"not unit: $n2")
    // Rayleigh dominance: v'Av >= e_j'Ae_j for every axis j, where
    // A = X'X over the quantized rows — the "top axis" claim
    def rayleigh(dir: Array[Double]): Double = {
      val n = math.sqrt(dir.map(x => x * x).sum)
      xq.map { row =>
        val p = row.indices.map(j => row(j) * dir(j) / n).sum
        p * p
      }.sum
    }
    val rv = rayleigh(wantV.map(_.toDouble))
    (0 until xq.head.length).foreach { j =>
      val e = Array.fill(xq.head.length)(0.0); e(j) = 1.0
      assert(rv >= rayleigh(e), s"axis $j beats the learned direction")
    }
  }

  test("deflated basis: v2 orthogonal to v1, strictly weaker axis") {
    val rows = Similarity.qPcaBasis(spark, d).collect()
      .groupBy(_.getAs[Long]("comp"))
      .map { case (c, rs) =>
        c -> rs.sortBy(_.getAs[Long]("pos")).map(_.getAs[Long]("v_x1e6"))
      }
    assert(rows.keySet == Set(1L, 2L))
    val (v1, v2) = (rows(1L).map(_.toDouble), rows(2L).map(_.toDouble))
    def n(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    val cos = v1.zip(v2).map { case (a, b) => a * b }.sum / (n(v1) * n(v2))
    assert(math.abs(cos) < 1e-3, s"not orthogonal: cos=$cos")
    // component 1 is the qPcaPower direction verbatim
    val p1 = Similarity.qPcaPower(spark, d).collect()
      .sortBy(_.getAs[Long]("pos")).map(_.getAs[Long]("v_x1e6"))
    assert(rows(1L).sameElements(p1))
    // dominance: the Rayleigh quotient along v1 >= along v2
    val xq = vectors()
    def rayleigh(dir: Array[Double]): Double = {
      val nn = n(dir)
      xq.map { row =>
        val p = row.indices.map(j => row(j) * dir(j) / nn).sum; p * p
      }.sum
    }
    assert(rayleigh(v1) >= rayleigh(v2), "component order inverted")
  }

  test("whitening audit: decorrelated, variance-ordered, scalar-mirror exact") {
    val xq = vectors()
    val (v1, _) = refPower(xq)
    val got = Similarity.qWhiten(spark, d).collect().head
    assert(got.getAs[Long]("n_vecs") == xq.length)
    assert(got.getAs[Boolean]("var_order_ok"))
    assert(got.getAs[Boolean]("decorr_ok"))
    // var1 matches the scalar mirror's shifted second moment along v1
    val p1 = xq.map(row => row.indices.map(j => row(j) * v1(j)).sum)
      .map(p => (p.sign: Long) * (math.abs(p) / 1000000L))
    assert(got.getAs[Long]("var1_shifted") == p1.map(p => p * p).sum)
  }

  test("second-moment matrix equals the scalar mirror, entry for entry") {
    val xq = vectors()
    val dim = xq.head.length
    val got = Similarity.qSecondMoment(spark, d).collect()
      .map(r => ((r.getAs[Long]("j"), r.getAs[Long]("k")), r.getAs[Long]("m")))
      .toMap
    assert(got.size == dim * (dim + 1) / 2)
    for (j <- 0 until dim; k <- j until dim) {
      val want = xq.map(row => row(j) * row(k)).sum
      assert(got((j.toLong, k.toLong)) == want, s"M[$j,$k]")
    }
  }

  test("projection query returns the top-|proj| slice, exactly ranked") {
    val xq = vectors()
    val (v, _) = refPower(xq)
    val ids = Tables.embeddings(spark, d).select(col("vec_id"))
      .collect().map(_.getLong(0)).sorted
    val projs = ids.zip(xq.map(row => row.indices.map(j => row(j) * v(j)).sum))
    val want = projs.sortBy { case (id, p) => (-math.abs(p.toDouble), id) }
      .take(20).toSeq
    val got = Similarity.qPcaProject(spark, d).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("proj"))).toSeq
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
  }
}
