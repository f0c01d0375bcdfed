package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.Similarity

import graft.sources.Writers

/** Executes SCALE.md's "cells can additionally be bucketed on disk"
  * claim: with the cell index AND a large query batch both stored
  * bucketed by cell, the candidate-generation join (the scale
  * bottleneck of batch ANN — millions of queries, billions of
  * vectors) plans with NO shuffle exchange on either side. */
class BucketedIvfSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("bucketed cell index joins a bucketed query batch with zero shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_cells")
    spark.sql("DROP TABLE IF EXISTS b_queries")
    import scala.reflect.io.Directory
    new Directory(new java.io.File("spark-warehouse/b_cells")).deleteRecursively()
    new Directory(new java.io.File("spark-warehouse/b_queries")).deleteRecursively()

    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"), norm2Exact(col("embedding")).as("n2"))
    val assign = Similarity.assignCells(e,
      Similarity.centroidArray(Similarity.trainCentroids(e)))
    Writers.writeBucketed(assign, "cell", 4, "b_cells")
    // a query batch assigned to its probe cells, bucketed identically
    Writers.writeBucketed(
      assign.filter(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), col("ce").as("qe"),
          col("cn2").as("qn2"), col("cell")),
      "cell", 4, "b_queries")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cands = spark.table("b_cells")
        .join(spark.table("b_queries"), "cell")
        .filter(col("vec_id") =!= col("qid"))
        .groupBy(col("qid")).agg(count(lit(1)).as("n_cands"))
      val plan = cands.queryExecution.executedPlan.toString
      val joinSection = plan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join over bucketed tables:\n$plan")
      assert(!joinSection.contains("Exchange"),
        s"bucketed cell join must not shuffle either side:\n$plan")

      // results equal the unbucketed join
      val expected = assign.join(
          assign.filter(col("vec_id") < 100)
            .select(col("vec_id").as("qid"), col("cell")), "cell")
        .filter(col("vec_id") =!= col("qid"))
        .groupBy(col("qid")).agg(count(lit(1)).as("n_cands"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = cands.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected)
      assert(got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_cells")
      spark.sql("DROP TABLE IF EXISTS b_queries")
    }
  }
}
