package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Salted-join proof: the hot key really fans out across reducer
  * tasks, and salting is invisible in the results. */
class SkewJoinSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def facts = Tables.events(spark, d).select(
    when(col("event_type") === "click", lit(0L))
      .otherwise(pmod(col("user_id"), lit(25L)))
      .cast("long").as("sk"),
    col("value"), col("event_id"))

  private def dim = Tables.nation(spark, d).select(col("n_nationkey"), col("n_name"))

  test("salted join fans the hot key across buckets; plain join concentrates it") {
    // pin the shuffle topology: no broadcast (a broadcastable dim
    // needs no salting) and no AQE partition coalescing (it would
    // legitimately re-merge the small test partitions)
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val salted = SkewJoin.saltedJoin(facts, dim, "sk", "n_nationkey",
        col("event_id"), SkewJoin.SaltBuckets)
      val plan = salted.queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), s"join keys must include the salt:\n$plan")

      val saltedTasks = salted.filter(col("sk") === 0)
        .select(spark_partition_id().as("pid")).distinct().count()
      val plainTasks = facts.join(dim, col("sk") === col("n_nationkey"))
        .filter(col("sk") === 0)
        .select(spark_partition_id().as("pid")).distinct().count()
      assert(plainTasks == 1,
        s"plain shuffle join should send the hot key to one task, got $plainTasks")
      assert(saltedTasks > 1,
        s"salted join should fan the hot key over >1 task, got $saltedTasks")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("salted join results equal the plain join") {
    val salted = SkewJoin.saltedJoin(facts, dim, "sk", "n_nationkey",
        col("event_id"), SkewJoin.SaltBuckets)
      .select(col("event_id"), col("n_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = facts.join(dim, col("sk") === col("n_nationkey"))
      .select(col("event_id"), col("n_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }
}
