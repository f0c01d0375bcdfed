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
}
