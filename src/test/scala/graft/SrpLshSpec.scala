package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** SRP-LSH embedding near-dup: the bucketed candidate generator must
  * (a) reproduce the exact all-pairs result at the harness thresholds
  * (full recall — the oracle gate equivalent the lexical LSH already
  * meets), and (b) plan as an equi bucket join, never a nested-loop
  * theta join over vectors. */
class SrpLshSpec extends SparkSpec {

  test("SRP-LSH equals the exact all-pairs near-dup at sf0.001 and sf0.01") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = Dedup.qEmbedNearDup(spark, d).collect().toSeq
      val lsh = Dedup.qEmbedNearDupLsh(spark, d).collect().toSeq
      assert(lsh == exact, s"LSH != exact at $d")
    }
  }

  test("signature bands are deterministic and correctly shaped") {
    import graft.functions.expressions.SrpBands.srp_bands
    import graft.functions.expressions.SrpLsh
    val d = "/root/testdata/sf0.001"
    val bands = Tables.embeddings(spark, d)
      .select(col("vec_id"), srp_bands(col("embedding")).as("bands"))
    val row = bands.orderBy(col("vec_id")).limit(1).collect().head
    val vals = row.getSeq[Int](1)
    assert(vals.length == SrpLsh.Bands)
    assert(vals.forall(v => v >= 0 && v < (1 << SrpLsh.BandBits)))
    // deterministic across plans/runs
    val again = bands.orderBy(col("vec_id")).limit(1).collect().head.getSeq[Int](1)
    assert(vals == again)
  }

  test("wide SRP bands prune clustered corpora with full recall") {
    // The harness embeddings are isotropic noise at threshold 0.4 —
    // unprunable by construction (documented in qEmbedNearDupLsh).
    // This test plants the structure a REAL near-dup corpus has (tight
    // clusters, cosine >= 0.9 within, ~0 across) and proves the claim
    // the scaladoc makes: 8-bit re-banded buckets keep every
    // same-cluster pair as a candidate while admitting only a fraction
    // of the all-pairs space.
    import spark.implicits._
    import graft.functions.expressions.SrpBands.srp_bands
    val rng = new java.util.Random(13)
    val dim = 64
    val base = Array.fill(10)(Array.fill(dim)(rng.nextGaussian().toFloat))
    val rows = for {
      c <- 0 until 10
      i <- 0 until 20
    } yield (c.toLong * 100 + i,
      base(c).map(x => x + 0.05f * rng.nextGaussian().toFloat))
    val df = rows.toDF("vec_id", "embedding")
    val bands = df.select(col("vec_id"),
      posexplode(Dedup.srpWideBands(srp_bands(col("embedding")), 2))
        .as(Seq("band_id", "band_val")))
    val cands = bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("va"), col("y.vec_id").as("vb"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = rows.size
    val allPairs = n * (n - 1) / 2
    val sameCluster = for {
      c <- 0 until 10; i <- 0 until 20; j <- (i + 1) until 20
    } yield (c.toLong * 100 + i, c.toLong * 100 + j)
    // full recall on every true near-dup pair
    assert(sameCluster.forall(cands.contains), "missed a same-cluster pair")
    // and genuine pruning: most of the cross-cluster space is gone
    assert(cands.size < allPairs / 2,
      s"expected <50% of $allPairs candidates, got ${cands.size}")
  }

  test("strict query: full recall vs exact ground truth AND real pruning") {
    // q_embed_neardup_strict is the measured proof that the SRP index
    // prunes at a realistic threshold. Two claims, both against the
    // planted-cluster corpus:
    //  (a) recall — the wide-band result equals the exact all-pairs
    //      answer at 0.7 (nothing the banding dropped actually
    //      qualified);
    //  (b) pruning — the candidate set is a small fraction of the
    //      all-pairs space (vs the 0.4 query's measured ~2.6x
    //      inflation; ~7.5% expected at 8-bit bands x 20).
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val strict = Dedup.qEmbedNearDupStrict(spark, d).collect().toSeq
      val exact = Dedup.exactNearDupPairs(
        Dedup.augmentedEmbeddings(spark, d), Dedup.StrictThreshold).collect().toSeq
      assert(strict == exact, s"strict LSH != exact all-pairs at $d")
      val n = Dedup.augmentedEmbeddings(spark, d).count()
      val candidates = Dedup.strictCandidates(spark, d).count()
      val allPairs = n * (n - 1) / 2
      assert(candidates * 4 < allPairs,
        s"expected <25% of $allPairs candidates at $d, got $candidates")
    }
  }

  test("deep query: full recall via three hash families AND order-of-magnitude deeper pruning") {
    // q_embed_neardup_deep is the 16-bit operating point. At this band
    // width only `group`=4 distinct rotation layouts of one signature
    // exist (offset and offset+group give the same quarter partition),
    // and a single family measures 183/200 recall at sf0.1 — so the
    // recall knob is INDEPENDENT HASH FAMILIES (seeded signatures),
    // compounding the per-family miss. Claims against the planted
    // corpus:
    //  (a) recall — three families restore equality with the exact
    //      all-pairs answer at 0.7;
    //  (b) pruning — candidates are an order of magnitude below the
    //      strict config's (the point of the deeper bands: the random
    //      background admits 1/65536 per band, so candidate volume
    //      stops tracking all-pairs on an isotropic corpus — the fix
    //      for the bench's one documented superlinear flag).
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val deep = Dedup.qEmbedNearDupDeep(spark, d).collect().toSeq
      val exact = Dedup.exactNearDupPairs(
        Dedup.augmentedEmbeddings(spark, d), Dedup.StrictThreshold).collect().toSeq
      assert(deep == exact, s"deep LSH != exact all-pairs at $d")
      val deepCand = Dedup.deepCandidates(spark, d).count()
      val strictCand = Dedup.strictCandidates(spark, d).count()
      assert(deepCand * 10 < strictCand,
        s"expected >=10x fewer candidates than strict at $d: $deepCand vs $strictCand")
    }
  }

  test("srp_bands fails fast on wrong dimensionality and wrong element type") {
    import spark.implicits._
    import graft.functions.expressions.SrpBands.srp_bands
    // wrong length: a 3-dim ARRAY<FLOAT> must throw at eval, not be
    // silently truncated into a signature that diverges from the oracle
    val short = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      short.select(srp_bands(col("embedding"))).collect()
    }
    assert(e.getMessage != null && e.toString.contains("srp_bands") ||
      Option(e.getCause).exists(_.getMessage.contains("srp_bands")),
      s"expected a srp_bands dimensionality error, got $e")
    // wrong element type: ARRAY<DOUBLE> (the default SQL array literal
    // type) must be rejected at analysis, not misread via getFloat
    val dbl = Seq((1L, Array.fill(64)(0.5))).toDF("vec_id", "embedding")
    val e2 = intercept[Exception] {
      dbl.select(srp_bands(col("embedding"))).collect()
    }
    assert(e2.toString.toLowerCase.contains("srp_bands") ||
      e2.toString.contains("DATATYPE_MISMATCH"),
      s"expected an analysis-time type error, got $e2")
  }

  test("LSH candidate generation plans as an equi join, not a nested loop") {
    val plan = Dedup.qEmbedNearDupLsh(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"theta-join shape leaked into the LSH plan:\n$plan")
  }
}
