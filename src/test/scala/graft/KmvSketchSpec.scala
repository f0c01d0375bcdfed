package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** KMV bottom-k sketch properties behind `q_kmv_overlap` (the oracle
  * hash-checks the full algebra; this spec pins the three claims the
  * oracle cannot see): the sharded two-level bottom-K equals the
  * one-level global bottom-K (the 100 TB shape is bit-identical to
  * the textbook form), the closure property that makes the sketch
  * mergeable (bottom-K of merged bottom-Ks == bottom-K of the union),
  * and the estimator's accuracy on a set of KNOWN cardinality. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private val K = TextAnalysis.KmvK

  test("sharded two-level bottom-K == one-level global bottom-K on the real corpus") {
    val hashes = TextAnalysis.kmvHashes(spark, d)
    val twoLevel = TextAnalysis.kmvSketch(hashes)
      .select("source", "h").as[(String, Long)].collect().toSet
    val oneLevel = hashes.as[(String, Long)].collect().toSeq
      .groupBy(_._1).toSeq.flatMap { case (src, hs) =>
        hs.map(_._2).distinct.sorted.take(K).map(h => (src, h))
      }.toSet
    assert(twoLevel == oneLevel,
      s"two-level sketch diverged from global bottom-K " +
        s"(${(twoLevel diff oneLevel).take(3)} / ${(oneLevel diff twoLevel).take(3)})")
  }

  test("closure: bottom-K of merged sketches == sketch of the union") {
    // deterministic pseudo-random 60-bit hashes from two overlapping sets
    def hs(seed: Long, n: Int): Seq[Long] = {
      var x = seed
      (0 until n).map { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        (x >>> 4) + 1 // [1, 2^60]
      }
    }
    val a = hs(7L, 500)
    val b = hs(7L, 300) ++ hs(99L, 400) // 300 shared with a
    val skA = a.distinct.sorted.take(K)
    val skB = b.distinct.sorted.take(K)
    val merged = (skA ++ skB).distinct.sorted.take(K)
    val direct = (a ++ b).distinct.sorted.take(K)
    assert(merged == direct, "KMV closure violated: merge-of-sketches != sketch-of-union")
  }

  test("estimator lands within the 3-sigma bound on a known-cardinality set") {
    // one source, N planted distinct hashes; estimate vs truth
    val n = 20000
    var x = 12345L
    val planted = (0 until n).map { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 4) + 1
    }.distinct
    val hk = planted.sorted.apply(K - 1)
    val est = (BigInt(K - 1) * BigInt(TextAnalysis.KmvSpace) / BigInt(hk)).toLong
    val relErrX1e6 = math.abs(est - planted.size).toLong * 1000000L / planted.size
    assert(relErrX1e6 <= TextAnalysis.KmvBoundX1e6,
      s"estimate $est vs ${planted.size}: rel err $relErrX1e6 x1e-6 " +
        s"exceeds bound ${TextAnalysis.KmvBoundX1e6}")
  }

  test("q_kmv_overlap verdict columns hold on the harness corpus") {
    val rows = TextAnalysis.qKmvOverlap(spark, d).collect()
    assert(rows.nonEmpty, "no source pairs")
    rows.foreach { r =>
      val exactUnion = r.getAs[Long]("exact_union")
      val estUnion = r.getAs[Long]("est_union")
      val estInter = r.getAs[Long]("est_inter")
      assert(r.getAs[Boolean]("union_ok"),
        s"pair ${r.getAs[String]("src_a")}/${r.getAs[String]("src_b")}: " +
          s"est_union $estUnion outside the 3-sigma bound of $exactUnion")
      assert(estInter <= estUnion, "intersection estimate exceeds union estimate")
    }
  }
}
