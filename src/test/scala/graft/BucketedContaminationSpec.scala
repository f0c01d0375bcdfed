package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.sources.Writers

/** Executes qContamination's scale claim: with the train-side shingle
  * index persisted bucketed by shingle and the incoming eval batch
  * bucketed identically, the contamination semi-join — the scale
  * bottleneck of repeated decontamination runs against a fixed train
  * corpus — plans with NO shuffle exchange on either side. */
class BucketedContaminationSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("bucketed train shingle index joins a bucketed eval batch with zero shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_train_sh")
    spark.sql("DROP TABLE IF EXISTS b_eval_sh")
    import scala.reflect.io.Directory
    new Directory(new java.io.File("spark-warehouse/b_train_sh")).deleteRecursively()
    new Directory(new java.io.File("spark-warehouse/b_eval_sh")).deleteRecursively()

    val sh = shingles(Tables.documents(spark, d), "doc_id", "text",
        graft.operators.TextAnalysis.ContamNgram)
      .withColumn("split", splitFromBucket(md5Bucket16(col("doc_id"))))
    Writers.writeBucketed(
      sh.filter(col("split") === "train").select(col("shingle")).distinct(),
      "shingle", 4, "b_train_sh")
    Writers.writeBucketed(
      sh.filter(col("split") =!= "train").select(col("doc_id"), col("shingle")),
      "shingle", 4, "b_eval_sh")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val hits = spark.table("b_eval_sh")
        .join(spark.table("b_train_sh"), Seq("shingle"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
      val plan = hits.queryExecution.executedPlan.toString
      val joinSection = plan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join over bucketed tables:\n$plan")
      assert(!joinSection.contains("Exchange"),
        s"bucketed shingle join must not shuffle either side:\n$plan")

      // results equal the unbucketed semi-join
      val expected = sh.filter(col("split") =!= "train")
        .join(sh.filter(col("split") === "train").select(col("shingle")).distinct(),
          Seq("shingle"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = hits.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected)
      assert(got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_train_sh")
      spark.sql("DROP TABLE IF EXISTS b_eval_sh")
    }
  }
}
