package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The other half of the skew toolkit (SCALE.md): AQE's RUNTIME
  * skew-join splitting — no code changes, the optimizer detects the
  * oversized partition at the shuffle boundary and splits it. Salting
  * (SkewJoinSpec) remains for the cases AQE can't fix; this spec
  * proves the default path actually engages on a hot key. */
class AqeSkewSpec extends SparkSpec {

  test("AQE marks and splits the skewed side of a hot-key sort-merge join") {
    val d = "/root/testdata/sf0.01"
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // shrink the thresholds so the tiny test shuffle still counts as skewed
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // ~90% of events collapse onto key 0; the repartition gives the
      // join shuffle many MAP tasks (like any real multi-file scan) —
      // AQE splits a skewed reduce partition by mapper ranges, so a
      // single-mapper toy shuffle is structurally unsplittable
      val facts = Tables.events(spark, d).select(
        when(pmod(col("user_id"), lit(10)) < 9, lit(0L))
          .otherwise(col("user_id")).as("sk"),
        col("value"))
        .repartition(16)
      // materialize the dim so the join's right child is a bare
      // shuffle: OptimizeSkewedJoin only matches Sort-over-shuffle on
      // BOTH sides (an agg between them defeats the pattern)
      val dim = facts.select(col("sk").as("dk")).distinct()
        .withColumn("payload", col("dk") * 2)
        .localCheckpoint(true)
      val joined = facts.join(dim, col("sk") === col("dk"))
      // collect() executes THIS dataset's QueryExecution (count() would
      // spawn a separate one whose adaptive plan we can't inspect)
      joined.collect()
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"AQE did not flag the hot-key join as skewed:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
