package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Writers

/** Co-located (bucketed) joins: the 100 TB answer to repeated
  * fact-fact joins on the same key. Writing both sides bucketed by the
  * join key lets Spark plan a SortMergeJoin with NO shuffle exchange on
  * either side — the join cost collapses to a per-bucket merge.
  * This spec proves the plan shape, not just the results. */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join without a shuffle exchange") {
    // (warehouse dir is a static conf — tables land in the default
    // ./spark-warehouse, dropped again below and git-ignored; stale
    // dirs from an interrupted run must go too or CREATE fails with
    // LOCATION_ALREADY_EXISTS)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    import scala.reflect.io.Directory
    new Directory(new java.io.File("spark-warehouse/b_orders")).deleteRecursively()
    new Directory(new java.io.File("spark-warehouse/b_lineitem")).deleteRecursively()
    val d = "/root/testdata/sf0.001"
    Writers.writeBucketed(Tables.orders(spark, d), "o_orderkey", 4, "b_orders")
    Writers.writeBucketed(Tables.lineitem(spark, d), "l_orderkey", 4, "b_lineitem")

    // disable auto-broadcast: at real scale neither side of a
    // fact-fact join broadcasts; this test demonstrates the bucketed
    // sort-merge path that replaces the shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not introduce an exchange on either side;
    // the only exchange allowed is the one for the final groupBy
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"),
      s"expected a non-broadcast join over bucketed tables, got:\n$plan")
    assert(!joinSection.contains("Exchange"),
      s"bucketed join should have no shuffle exchange below the aggregate:\n$plan")

    // and results match the unbucketed join
    val expected = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
