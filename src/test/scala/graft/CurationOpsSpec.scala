package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** The three corpus-curation operators (per-source quota, quality-aware
  * dedup resolution, token-budget sampling) against independently-
  * formulated ground truths: each production path trades the naive
  * window/sort formulation for a scale-correct plan (bounded partial
  * agg / argmax agg / bucketed prefix sum), so the spec proves the
  * trade changed the PLAN and not the ANSWER. */
class CurationOpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("source quota equals the window formulation and actually caps") {
    val got = TextAnalysis.qSourceQuota(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val want = Tables.documents(spark, d)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= TextAnalysis.QuotaPerSource)
      .select(col("source"), col("rnk"), col("doc_id"), col("n_chars"))
      .orderBy(col("source"), col("rnk")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq, "quota diverged from window ground truth")
    // non-vacuous: the corpus has > quota docs per source, so rows
    // were actually dropped and every source is at exactly the cap
    val total = Tables.documents(spark, d).count()
    assert(got.length < total, "quota dropped nothing — vacuous corpus")
    val perSource = got.groupBy(_._1).values.map(_.length)
    assert(perSource.forall(_ == TextAnalysis.QuotaPerSource),
      "every source should saturate its quota on this corpus")
  }

  test("keep-best picks the longest member of every cluster") {
    val got = Dedup.qDedupKeepBest(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val n = Tables.documents(spark, d).count()
    assert(got.length == n, s"one verdict per document: ${got.length} vs $n")
    val chars = Tables.documents(spark, d)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.groupBy(_._2).foreach { case (cid, members) =>
      val reps = members.map(_._3).distinct
      assert(reps.length == 1, s"cluster $cid has ${reps.length} reps")
      val rep = reps.head
      // rep is a member, is the unique keep=true row, and is the
      // (n_chars desc, doc_id asc) argmax over the cluster
      assert(members.exists(_._1 == rep), s"rep $rep not in cluster $cid")
      assert(members.count(_._4) == 1 && members.find(_._4).get._1 == rep,
        s"keep flags broken in cluster $cid")
      val best = members.map(_._1).minBy(id => (-chars(id), id))
      assert(rep == best, s"cluster $cid kept $rep, longest member is $best")
    }
    // non-vacuous: the corpus has real multi-member clusters, and at
    // least one cluster's longest member is NOT its min-id member —
    // otherwise this spec couldn't tell keep-best from min-id
    val multi = got.groupBy(_._2).values.filter(_.length > 1)
    assert(multi.nonEmpty, "no multi-member clusters — vacuous corpus")
    assert(multi.exists(ms => ms.find(_._4).get._1 != ms.map(_._1).min),
      "keep-best == min-id everywhere — spec can't distinguish policies")
  }

  test("token budget sample equals the single-window formulation") {
    val got = TextAnalysis.qTokenBudgetSample(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val base = Tables.documents(spark, d).select(col("doc_id"),
      size(graft.functions.TextFunctions.tokens(col("text")))
        .cast("long").as("n_tokens"),
      md5(col("doc_id").cast("string")).as("k"))
    val budget = base.agg(shiftright(sum(col("n_tokens")), 1))
      .head.getLong(0)
    val wAll = Window.orderBy(col("k"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = base
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wAll))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq,
      "bucketed prefix sum diverged from the global window")
    // the kept set is a maximal prefix: nonempty, under budget, and
    // adding ANY one more document (the next in md5 order) overshoots
    val totalDocs = Tables.documents(spark, d).count()
    assert(got.nonEmpty && got.length < totalDocs, "vacuous budget cut")
    val kept = got.map(_._1).toSet
    val nextTok = base.collect()
      .map(r => (r.getString(2), r.getLong(0), r.getLong(1)))
      .filter(t => !kept.contains(t._2)).min._3
    val cumMax = got.map(_._3).max
    assert(cumMax <= budget && cumMax + nextTok > budget,
      s"not a maximal prefix: cum $cumMax, budget $budget, next $nextTok")
  }

  test("curation plans carry their scale shape, not the window fallback") {
    // quota: bounded partial top-k, and NO Window operator anywhere —
    // the whole point is that the hot domain never sorts in one task
    val quotaPlan = TextAnalysis.qSourceQuota(spark, d)
      .queryExecution.executedPlan.toString
    assert(quotaPlan.contains("partial_topkaggregator"),
      s"source quota must partial-aggregate (O(quota) map-side state):\n$quotaPlan")
    assert(!quotaPlan.contains("Window"),
      s"source quota fell back to a window sort:\n$quotaPlan")
    // budget: the per-row cumulative window must be PARTITIONED BY
    // bucket (parallel local sorts); only the 256-row offset window
    // may be unpartitioned
    val budgetPlan = TextAnalysis.qTokenBudgetSample(spark, d)
      .queryExecution.executedPlan.toString
    assert(budgetPlan.contains("windowspecdefinition(bucket#") ||
      budgetPlan.contains("windowspecdefinition(bucket"),
      s"token-budget cumulative sum lost its bucket partitioning:\n$budgetPlan")
  }
}
