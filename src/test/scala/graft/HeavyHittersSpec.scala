package graft

import graft.operators.TextAnalysis

/** Count-min heavy hitters: the exact anchor must equal an
  * independent driver recount (deterministic tie order), the verdicts
  * must hold, and the distributed sketch must agree with a
  * sequentially-built one — merge order-independence, the property
  * that makes the sketch partitioning-safe at scale. */
class HeavyHittersSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("anchor equals driver recount; verdicts hold; merge is order-independent") {
    val toks = Tables.documents(spark, d)
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFunctions.tokens(
          org.apache.spark.sql.functions.col("text"))).as("w"))
      .collect().map(_.getString(0))
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = exact.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(TextAnalysis.HeavyHittersK)

    val rows = TextAnalysis.qHeavyHitters(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    assert(rows.map(t => (t._1, t._2)).toSeq == want,
      "exact anchor must equal the driver recount in (cnt desc, w asc) order")
    assert(rows.nonEmpty && rows.forall(t => t._3 && t._4),
      s"CMS guarantees violated: ${rows.filterNot(t => t._3 && t._4).toSeq}")

    // merge order-independence: a sketch built sequentially on the
    // driver (same geometry, same seed) estimates every anchor term
    // identically to what the distributed partial-merge produced —
    // checked through the same bounds the query asserts
    val cms = org.apache.spark.util.sketch.CountMinSketch.create(
      TextAnalysis.CmsEps, TextAnalysis.CmsConfidence, TextAnalysis.CmsSeed)
    toks.foreach(cms.add)
    val budget = math.ceil(TextAnalysis.CmsEps * cms.totalCount()).toLong
    for ((w, c) <- want) {
      val est = cms.estimateCount(w)
      assert(est >= c && est <= c + budget,
        s"sequential sketch violates the bound for '$w': $est vs $c")
    }
  }
}
