package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{CleanJob, ReportJob}
import graft.streaming.Generators

/** Property-based invariants (SURVEY §5.4): structural laws that must
  * hold for ANY input, not just the golden fixtures. ScalaCheck
  * generators drive the cases (sampled explicitly — the scalatest
  * bridge artifact isn't on the offline classpath). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("windowed counts partition-sum to the input row count") {
    for (n <- samples(Gen.chooseNum(1L, 400L), 5)) {
      val agg = ReportJob.windowAgg(
        ReportJob.parse(Generators.auditLogBatch(spark, n)))
      assert(agg.agg(sum(col("cnt"))).collect().head.getLong(0) == n, s"n=$n")
    }
  }

  test("enrichment preserves row count x array fan-out and never nulls area") {
    for (n <- samples(Gen.chooseNum(1L, 300L), 5)) {
      val out = CleanJob.enrich(Generators.cleanInputBatch(spark, n),
        CleanJob.dimTable(spark))
      assert(out.count() == 2 * n, s"n=$n") // generator emits 2-element arrays
      assert(out.filter(col("area").isNull).count() == 0)
    }
  }

  test("exact dedup is idempotent") {
    for (keys <- samples(Gen.listOfN(30, Gen.chooseNum(0, 9)), 5)) {
      val df = keys.zipWithIndex
        .map { case (k, i) => (i.toLong, s"k$k") }.toDF("id", "key")
      val once = df.dropDuplicates("key")
      val twice = once.dropDuplicates("key")
      assert(once.count() == twice.count())
      assert(once.select("key").distinct().count() == once.count())
    }
  }

  test("late/ontime split is a partition: tag counts sum to parsed count") {
    for (n <- samples(Gen.chooseNum(2L, 300L), 5)) {
      val parsed = ReportJob.parse(Generators.auditLogBatch(spark, n))
      val split = ReportJob.lateSplit(parsed)
      assert(split.agg(sum(col("cnt"))).collect().head.getLong(0) == n, s"n=$n")
    }
  }

  test("TopKAggregator equals sort-take for any input and any merge split") {
    val agg = new graft.functions.TopKAggregator(5)
    // -0.0 and 0.0 included explicitly: primitive == treats them equal
    // but the buffer's total ordering does not — the short-circuit and
    // trim paths must agree (caught by review; regression-pinned here)
    val score = Gen.frequency(
      (8, Gen.chooseNum(-10.0, 10.0)), (1, Gen.const(-0.0)), (1, Gen.const(0.0)))
    val gen = Gen.listOfN(60, Gen.zip(score, Gen.chooseNum(0L, 20L)))
    for (xs <- samples(gen, 10)) {
      val expected = xs.sortBy { case (score, id) => (-score, id) }.take(5)
      // single-buffer reduce
      val reduced = xs.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(reduced) == expected, s"reduce path, input=$xs")
      // arbitrary split + merge (the partial-aggregation path); also
      // exercises merge with the empty buffer and commuted order
      for (cut <- Seq(0, 1, xs.size / 2, xs.size)) {
        val (a, b) = xs.splitAt(cut)
        val m = agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
        val mSwap = agg.merge(b.foldLeft(agg.zero)(agg.reduce), a.foldLeft(agg.zero)(agg.reduce))
        assert(agg.finish(m) == expected && agg.finish(mSwap) == expected, s"cut=$cut")
      }
    }
  }

  test("sequence packing conserves chunks and tokens, packs stay bounded") {
    import graft.operators.TextAnalysis
    val d = "/root/testdata/sf0.001"
    val chunks = TextAnalysis.qDocChunks(spark, d)
      .agg(count(lit(1)), sum(col("n_tok"))).collect().head
    val packs = TextAnalysis.qSeqPack(spark, d)
    val totals = packs.agg(sum(col("n_chunks")), sum(col("n_tokens"))).collect().head
    // every chunk lands in exactly one pack; no token created or lost
    assert(totals.getLong(0) == chunks.getLong(0))
    assert(totals.getLong(1) == chunks.getLong(1))
    // a pack can only overflow by the chunk that straddles its boundary
    val maxTok = packs.agg(max(col("n_tokens"))).collect().head.getLong(0)
    assert(maxTok < TextAnalysis.PackBudget + TextAnalysis.ChunkTokens,
      s"pack exceeded budget+chunk bound: $maxTok")
  }
}
