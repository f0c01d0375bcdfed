package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Cluster-aware (leakage-free) train/val/test split: every near-dup
  * cluster's members must share one split, the audit's cluster-aware
  * cross count must be zero, and the naive scheme must show REAL
  * leakage on the harness corpus (the non-vacuity discipline — a
  * zero-vs-zero comparison would prove nothing). */
class SplitLeakfreeSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("cluster members land in one split; singletons keep their own hash") {
    val asg = Dedup.qSplitLeakfree(spark, d)
    // every document assigned exactly once
    val nDocs = Tables.documents(spark, d).count()
    assert(asg.count() == nDocs)
    // one split per cluster
    val perCluster = asg.groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
    assert(perCluster.count() == 0, "a cluster straddles splits")
    // the split is the md5 bucket of the CLUSTER id — cross-check one
    // clustered doc against the hash of its label
    val clustered = asg.filter(col("cluster_id") =!= col("doc_id")).collect()
    assert(clustered.nonEmpty, "harness corpus lost its planted near-dups")
    clustered.foreach { r =>
      val bucket = Integer.parseInt(
        org.apache.commons.codec.digest.DigestUtils
          .md5Hex(r.getAs[Long]("cluster_id").toString).substring(0, 1), 16)
      val expect = if (bucket < 13) "train" else if (bucket < 15) "val" else "test"
      assert(r.getAs[String]("split") == expect)
    }
  }

  test("audit: cluster-aware crossings are zero, naive crossings are real") {
    val rows = Dedup.qSplitLeakage(spark, d).collect()
      .map(r => r.getAs[String]("scheme") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("cross_pairs"))).toMap
    assert(rows.keySet == Set("cluster_aware", "naive"))
    val (nPairs, awareCross) = rows("cluster_aware")
    val (nPairs2, naiveCross) = rows("naive")
    assert(nPairs == nPairs2 && nPairs > 0, "no near-dup pairs to audit")
    assert(awareCross == 0L, s"cluster-aware split leaked $awareCross pairs")
    assert(naiveCross > 0L,
      "naive split shows no leakage at this SF - the audit is vacuous")
  }
}
