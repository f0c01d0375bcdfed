package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

/** The density-adaptive embedding near-dup default and the video
  * fingerprint's shape-aware banding — the two round-17 scale fixes,
  * pinned engine-side (their results are also oracle-gated). */
class EmbedAutoSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("adaptive default equals both operating points (branch is answer-invisible)") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val strict = rows(Dedup.qEmbedNearDupStrict(spark, d))
    val deep = rows(Dedup.qEmbedNearDupDeep(spark, d))
    val auto = rows(Dedup.qEmbedNearDupAuto(spark, d))
    // full recall at this SF on both indexes -> identical answer sets,
    // so whichever branch the probe picks cannot change the result
    assert(strict == deep, "strict and deep diverged — recall assumption broken")
    assert(auto == strict, "adaptive default diverged from the operating points")
    assert(auto.nonEmpty, "no near-dup pairs — planted copies missing")
  }

  test("density probe prices the strict band histogram") {
    val (n, est2) = Dedup.strictDensityProbe(spark, d)
    val corpus = Tables.embeddings(spark, d).count()
    val planted = corpus / Dedup.PlantStride +
      (if (corpus % Dedup.PlantStride > 0) 1L else 0L)
    assert(n == corpus + planted, s"probe n=$n != corpus+planted=${corpus + planted}")
    // every planted copy collides with its original in >= 1 band
    // (measured full recall), so the collision mass is at least the
    // planted pair count x2 (est2 counts ordered pairs)
    assert(est2.longValueExact() >= 2L * planted,
      s"est2=$est2 below the planted floor ${2L * planted}")
    // this corpus is small: the strict budget must hold, so the
    // adaptive branch here is strict (the clustered-corpus fast path)
    assert(Dedup.strictWithinBudget(n, est2),
      "sf0.001 unexpectedly noise-dominated — budget constant drifted?")
  }

  test("the deep branch FIRES on a collision-saturated corpus") {
    import spark.implicits._
    // 400 copies of ONE vector: every signature identical, so each of
    // the 20 probe buckets holds all 400 -> est2 = 20 * 400*399,
    // vastly past the 2*64*400 budget. The switch must choose deep —
    // the direction sf0.001 cannot exercise.
    val one = Seq.tabulate(64)(i => (i % 7 - 3).toFloat)
    val dense = (1L to 400L).map(id => (id, one)).toDF("vec_id", "embedding")
    val (n, est2) = Dedup.densityProbeOf(dense)
    assert(n == 400L, s"probe n=$n")
    assert(!Dedup.strictWithinBudget(n, est2),
      s"est2=$est2 should exceed the strict budget on a saturated corpus")
    // and the probe's collision arithmetic is exact on this
    // fully-degenerate shape: 20 buckets of C(400,2)*2 ordered pairs
    assert(est2.longValueExact() == 20L * 400L * 399L,
      s"est2=$est2 != ${20L * 400L * 399L}")
  }

  test("video banding is shape-aware: no cross-frame-count candidates") {
    val sig = Multimodal.qVideoFingerprint(spark, d)
      .select(col("doc_id"), col("n_frames")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig.nonEmpty, "no video signatures at sf0.001")
    val pairs = Multimodal.qVideoNeardup(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    pairs.foreach { case (a, b, _) =>
      assert(sig(a) == sig(b),
        s"near-dup pair ($a,$b) crosses frame counts ${sig(a)} vs ${sig(b)}")
    }
    // non-vacuous: planted duplicate docs with shared geometry must
    // fingerprint identically (hamming 0)
    assert(pairs.exists(_._3 == 0L), "no identical-signature pair found")
  }
}
