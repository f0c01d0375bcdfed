package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** CCNet perplexity bucketing against a driver-side ground truth: the
  * per-lang tercile cutoffs are recomputed by literally sorting each
  * language's ratios and indexing the ceil(n/3)-th element — proving
  * the histogram-cumsum order-statistic path (which never sorts the
  * docs) selects the identical values. */
class PplBucketsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  // ground truth from the (oracle-green) perplexity frame: per-doc
  // integer ratio + lang, and per-lang sorted-ratio tercile cutoffs
  private lazy val (ratios, cutoffs) = {
    val langs = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rs = TextAnalysis.qPerplexity(spark, d).collect()
      .map(r => (r.getLong(0), langs(r.getLong(0)),
        r.getLong(4) / r.getLong(2))) // surprisal_x1e6 div n_bigrams (both >= 0)
    val cuts = rs.groupBy(_._2).map { case (lang, docs) =>
      val sorted = docs.map(_._3).sorted
      val n = sorted.length
      lang -> ((sorted((n + 2) / 3 - 1), sorted((2 * n + 2) / 3 - 1), n.toLong))
    }
    (rs, cuts)
  }

  test("histogram order statistics equal the sorted-ratio terciles") {
    val got = TextAnalysis.qPplCutoffs(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(1)))).toMap
    assert(got == cutoffs, s"got $got want $cutoffs")
    // non-vacuous: every lang's three buckets are populated
    TextAnalysis.qPplCutoffs(spark, d).collect().foreach { r =>
      assert(r.getLong(4) > 0 && r.getLong(5) > 0 && r.getLong(6) > 0,
        s"${r.getString(0)}: a tercile bucket is empty")
    }
  }

  test("every document lands in the value-defined bucket of its lang") {
    val got = TextAnalysis.qPplBuckets(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(got.length == ratios.length)
    val byId = ratios.map(r => r._1 -> r).toMap
    got.foreach { case (id, lang, ratio, bucket) =>
      val (_, wantLang, wantRatio) = byId(id)
      assert(lang == wantLang && ratio == wantRatio, s"doc $id row drifted")
      val (c1, c2, _) = cutoffs(lang)
      val want = if (ratio <= c1) "head" else if (ratio <= c2) "middle" else "tail"
      assert(bucket == want, s"doc $id: $bucket, want $want (ratio $ratio)")
    }
  }
}
