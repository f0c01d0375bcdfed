package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** SRP-LSH embedding near-dup: the bucketed candidate generator must
  * (a) reproduce the exact all-pairs result at the harness thresholds
  * (full recall — the oracle gate equivalent the lexical LSH already
  * meets), and (b) plan as an equi bucket join, never a nested-loop
  * theta join over vectors. */
class SrpLshSpec extends SparkSpec {

  test("SRP-LSH equals the exact all-pairs near-dup at sf0.001 and sf0.01") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = Dedup.qEmbedNearDup(spark, d).collect().toSeq
      val lsh = Dedup.qEmbedNearDupLsh(spark, d).collect().toSeq
      assert(lsh == exact, s"LSH != exact at $d")
    }
  }

  test("signature bands are deterministic and correctly shaped") {
    import graft.functions.expressions.SrpBands.srp_bands
    import graft.functions.expressions.SrpLsh
    val d = "/root/testdata/sf0.001"
    val bands = Tables.embeddings(spark, d)
      .select(col("vec_id"), srp_bands(col("embedding")).as("bands"))
    val row = bands.orderBy(col("vec_id")).limit(1).collect().head
    val vals = row.getSeq[Int](1)
    assert(vals.length == SrpLsh.Bands)
    assert(vals.forall(v => v >= 0 && v < (1 << SrpLsh.BandBits)))
    // deterministic across plans/runs
    val again = bands.orderBy(col("vec_id")).limit(1).collect().head.getSeq[Int](1)
    assert(vals == again)
  }

  test("LSH candidate generation plans as an equi join, not a nested loop") {
    val plan = Dedup.qEmbedNearDupLsh(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"theta-join shape leaked into the LSH plan:\n$plan")
  }
}
