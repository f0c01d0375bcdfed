package graft

import org.apache.spark.sql.functions._

/** Scan-reduction machinery at the optimizer level:
  *  - runtime bloom-filter join pruning (the 100 TB fact-fact tool:
  *    the selective side's keys become a bloom filter applied to the
  *    big side's SCAN, before the shuffle);
  *  - static predicate pushdown + column pruning into parquet.
  */
class RuntimeFilterSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("selective join injects a bloom might_contain filter on the fact side") {
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    // no broadcast (broadcast joins prune via DPP instead) and no size
    // floors — the local test tables are tiny
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val li = Tables.lineitem(spark, d)
      val ord = Tables.orders(spark, d).filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") && opt.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$opt")

      // semantics unchanged vs the plain (broadcastable) join
      val got = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      val expected = Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected && got.nonEmpty)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("filters and projections reach the parquet scan") {
    val q = Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= "1995-01-01")
      .select(col("l_orderkey"), col("l_extendedprice"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"date filter not pushed to parquet:\n$plan")
    val readSchema = plan.split("ReadSchema: ").last
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_extendedprice")
      && readSchema.contains("l_shipdate") && !readSchema.contains("l_comment"),
      s"column pruning failed:\n$readSchema")
  }
}
