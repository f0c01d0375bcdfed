package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.Similarity

/** Pins the scale-critical plan shapes of the ANN path (the round-1
  * weak spots): centroid assignment must be a map-side pass with zero
  * shuffle of the vector table, and every per-query top-k must be a
  * partial aggregation, never a single-task row_number window. */
class SimilarityPlanSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def parts(s: org.apache.spark.sql.SparkSession) = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), norm2Exact(col("embedding")).as("n2"))
    (e, Similarity.seedCentroids(e))
  }

  test("centroid cardinality is O(cellsFor(n)) = O(sqrt n), capped") {
    val (e, _) = parts(spark)
    val n = e.count()
    // a 10x corpus with the same id density (shifted blocks) must NOT
    // get 10x the centroids: the stride scales so the seed set tracks
    // cellsFor(n) ~ sqrt(n) (capped at MaxCells) — the property that
    // keeps the driver cache and per-task broadcast bounded at any
    // corpus size (10x data -> ~3.2x cells, never 10x)
    val e10 = (0 until 10).map(i =>
      e.select((col("vec_id") + lit(i * n)).as("vec_id"), col("embedding"), col("n2")))
      .reduce(_ unionAll _)
    val kSmall = Similarity.seedCentroids(e).count()
    val kBig = Similarity.seedCentroids(e10).count()
    val capSmall = 2 * Similarity.cellsFor(n)
    val capBig = 2 * Similarity.cellsFor(10 * n)
    assert(kSmall <= capSmall && kBig <= capBig,
      s"seed centroid count outgrew its derivation: $kSmall (cap $capSmall)" +
        s" -> $kBig (cap $capBig)")
    assert(kBig <= kSmall * 4, // sqrt(10) ~ 3.2, never linear growth
      s"10x corpus must not multiply centroids: $kSmall -> $kBig")
    // and the trained set can only shrink (cells may die), so the
    // memoized driver cache is bounded by the same k
    assert(Similarity.trainCentroids(e).count() <= kSmall)
  }

  test("IVF assignment shuffles nothing and evaluates the argmax once") {
    val (e, cent) = parts(spark)
    val assign = Similarity.assignCells(e, Similarity.centroidArray(cent))
    val plan = assign.queryExecution.executedPlan.toString

    // the ONLY exchanges allowed are the broadcast of the centroid
    // array and the SinglePartition collapse of the (tiny) centroid
    // set feeding it — never a hash repartition of the vector table
    assert(!plan.contains("Exchange hashpartitioning"),
      s"assignment must not shuffle the vector table:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"assignment should be a broadcast of the 1-row centroid array:\n$plan")
    // the argmax HOF must appear exactly once — a nullable `cell`
    // would get its isnotnull constraint pushed into the join
    // condition, silently doubling the dominant compute
    val occurrences = "array_max".r.findAllIn(plan).size
    assert(occurrences == 1,
      s"argmax expression duplicated ($occurrences sites) in:\n$plan")
  }

  test("map-side argmax assignment equals the window-function assignment") {
    val (e, cent) = parts(spark)
    val got = Similarity.assignCells(e, Similarity.centroidArray(cent))
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val w = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cent_id"))
    val expected = e.join(broadcast(cent), lit(true))
      .withColumn("ccos",
        cosineFromParts(dotExact(col("embedding"), col("cent_e")), col("n2"), col("cent_n2")))
      .withColumn("crn", row_number().over(w))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("cent_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(got == expected)
  }

  test("ANN rerank is partial-aggregated top-k with no Window operator") {
    for (df <- Seq(Similarity.qKnnBrute(spark, d), Similarity.qKnnIvf(spark, d),
        Similarity.qKnnIvfInt8(spark, d))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"row_number window survives in ANN path:\n$plan")
      assert(plan.contains("partial_topkaggregator"),
        s"top-k must partial-aggregate (O(k) map-side state):\n$plan")
    }
  }

  test("int8 search never hash-shuffles the vector table") {
    // the scale contract of the quantized path: candidate scoring and
    // the fp32 rerank both reach the vector table through broadcast
    // joins (probes / shortlist are |queries|-bounded) — the only hash
    // exchanges in the whole plan are the O(k)-row centroid train/agg
    // steps and the tiny per-query top-k partials, never a shuffle
    // keyed on vec_id (which would move the corpus)
    val plan = Similarity.qKnnIvfInt8(spark, d).queryExecution.executedPlan.toString
    val vecShuffles = "Exchange hashpartitioning\\(vec_id".r.findAllIn(plan).size +
      "Exchange hashpartitioning\\(cid".r.findAllIn(plan).size
    assert(vecShuffles == 0, s"int8 path shuffles the vector table:\n$plan")
  }
}
