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
    assert(est2.longValueExact() <= 2L * Dedup.AdaptiveBudgetPerVec * n,
      "sf0.001 unexpectedly noise-dominated — budget constant drifted?")
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
