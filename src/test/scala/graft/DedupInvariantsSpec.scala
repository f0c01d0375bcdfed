package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** End-to-end semantic invariants of the dedup pipeline — properties
  * that must hold no matter how the operators are implemented, pinned
  * against the real harness data (the oracle gate checks VALUES; these
  * check the CONTRACTS the values are supposed to satisfy). */
class DedupInvariantsSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.01"

  test("clean corpus admits no verified near-dup pair and no exact-dup fingerprint") {
    import graft.functions.TextFunctions.fingerprint
    val kept = Dedup.qCleanCorpus(spark, d).select(col("doc_id"))
    // near-dup freedom: no >=0.5-Jaccard pair survives with BOTH sides
    val bothKept = Dedup.lshPairs(spark, d)
      .join(kept.withColumnRenamed("doc_id", "doc_a"), "doc_a")
      .join(kept.withColumnRenamed("doc_id", "doc_b"), "doc_b")
      .count()
    assert(bothKept == 0, s"$bothKept near-dup pairs fully admitted to the clean corpus")
    // exact-dup freedom: fingerprints are unique among admitted docs
    val dupFps = Tables.documents(spark, d)
      .join(kept, "doc_id")
      .groupBy(fingerprint(col("text")).as("fp"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .count()
    assert(dupFps == 0, s"$dupFps duplicate fingerprints in the clean corpus")
  }

  test("cluster labels are the component minimum and cover every paired doc") {
    val pairs = Dedup.lshPairs(spark, d)
    val clusters = Dedup.qDedupClusters(spark, d)
    // every pair's two docs carry the SAME cluster id
    val split = pairs
      .join(clusters.select(col("doc_id").as("doc_a"), col("cluster_id").as("ca")), "doc_a")
      .join(clusters.select(col("doc_id").as("doc_b"), col("cluster_id").as("cb")), "doc_b")
      .filter(col("ca") =!= col("cb"))
      .count()
    assert(split == 0, s"$split pairs split across clusters")
    // the label IS the minimum member id of its cluster (canonical
    // representative — what makes keep-the-representative well-defined)
    val badLabel = clusters
      .groupBy(col("cluster_id"))
      .agg(min(col("doc_id")).as("mn"))
      .filter(col("cluster_id") =!= col("mn"))
      .count()
    assert(badLabel == 0, s"$badLabel clusters whose label is not the min member id")
  }
}
