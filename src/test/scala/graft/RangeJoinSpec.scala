package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin
import graft.functions.VectorFunctions

/** Bucketed range join correctness vs the naive BETWEEN join, and
  * codegen-expression cross-checks vs the HOF reference formulation. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed range join equals naive BETWEEN join on random intervals") {
    val points = spark.range(500).select((col("id") * 13 % 997).as("x"), col("id"))
    val ivs = spark.range(40).select(
      (col("id") * 53 % 900).as("lo"), col("id").as("iid"))
      .withColumn("hi", col("lo") + (col("iid") % 30))
    val naive = points.join(ivs, col("x").between(col("lo"), col("hi")))
      .select(col("id"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = RangeJoin.bucketedRangeJoin(
        points, col("x"), ivs, col("lo"), col("hi"), 16L)
      .select(col("id"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive)
    assert(naive.nonEmpty)
  }

  test("FloatDot codegen expression matches the HOF reference computation") {
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
      .select(col("vec_id"), col("embedding"))
    val hof = df.select(col("vec_id"),
      aggregate(zip_with(col("embedding"), col("embedding"),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("ref"))
    val native = df.select(col("vec_id"),
      VectorFunctions.dot(col("embedding"), col("embedding")).as("got"))
    val joined = hof.join(native, "vec_id")
      .select(abs(col("ref") - col("got")).as("diff"))
      .agg(max(col("diff"))).collect().head.getDouble(0)
    // identical sequential fold order -> bit-identical
    assert(joined == 0.0)
  }
}
