package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Fixed-point PageRank: the distributed operator must agree BIT-FOR-
  * BIT with an independent single-threaded integer reference — the
  * whole point of the micro-unit design is that partitioning cannot
  * change the answer. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation: plain Maps, same integer arithmetic. */
  private def refRanks(edges: Seq[(String, String)]): Map[String, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = out.keySet
    val n = nodes.size.toLong
    var pr = nodes.map(v => v -> Graph.PrMassMicro / n).toMap
    for (_ <- 1 to Graph.PrIterations) {
      val contrib = collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for ((s, d) <- edges) contrib(d) += pr(s) / out(s)
      pr = nodes.map { v =>
        v -> ((Graph.PrMassMicro * 15 / 100) / n + 85 * contrib(v) / 100)
      }.toMap
    }
    pr
  }

  test("operator matches the integer reference exactly on a hand graph") {
    // hub-and-spoke plus a 2-clique tail: c1 trades with s1,s2,s3;
    // c2 only with s1 — s1 must outrank s2/s3, c1 outrank c2
    val pairs = Seq("c1" -> "s1", "c1" -> "s2", "c1" -> "s3", "c2" -> "s1")
    val sym = pairs ++ pairs.map(_.swap)
    val got = Graph.pageRank(sym.toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val want = refRanks(sym)
    assert(got == want, s"got $got want $want")
    assert(got("s1") > got("s2") && got("c1") > got("c2"))
  }

  test("qPageRank at sf0.001 matches the reference over the real edge set") {
    val d = "/root/testdata/sf0.001"
    val pairs = Tables.orders(spark, d)
      .join(Tables.lineitem(spark, d), col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c:"), col("o_custkey")).as("c"),
        concat(lit("s:"), col("l_suppkey")).as("sup"))
      .distinct().as[(String, String)].collect().toSeq
    val want = refRanks(pairs ++ pairs.map(_.swap))
    val top = want.toSeq.sortBy { case (v, p) => (-p, v) }.take(Graph.PrTopK)
    val got = Graph.qPageRank(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    assert(got == top, s"got $got want $top")
  }

  test("rounds read the edge checkpoint, never the fact tables") {
    // the memoized eager checkpoint means the executed plan's scans
    // are ExistingRDD only — at 100 TB, re-reading orders⋈lineitem
    // per round would be the difference between hours and minutes
    val plan = Graph.qPageRank(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      "a PageRank round re-read the fact tables")
    assert(plan.contains("Scan ExistingRDD"),
      "expected the edge checkpoint scan in the plan")
  }

  test("mass is conserved up to documented floor loss") {
    val pairs = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c")
    val sym = (pairs ++ pairs.map(_.swap)).distinct
    val ranks = refRanks(sym)
    val total = ranks.values.sum
    // each round floors once per edge (contrib), once per node (base),
    // once per damped sum — loss is bounded by iterations * that count
    val bound = Graph.PrIterations.toLong * (sym.size + 2L * ranks.size)
    assert(total <= Graph.PrMassMicro && total >= Graph.PrMassMicro - bound,
      s"total $total outside [${Graph.PrMassMicro - bound}, ${Graph.PrMassMicro}]")
  }
}
