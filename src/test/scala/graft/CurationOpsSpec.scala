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

  test("token budget: admitted set invariant to the bucket-key length; length derives from mass") {
    // the decomposition is plan shape, not semantics: any md5
    // hex-prefix length must admit the identical set (round-18,
    // VERDICT r17 #5 — the bucket count now derives from corpus mass)
    val base = Tables.documents(spark, d).select(col("doc_id"),
      size(graft.functions.TextFunctions.tokens(col("text")))
        .cast("long").as("n_tokens"),
      md5(col("doc_id").cast("string")).as("k"))
      .localCheckpoint(false)
    val at2 = TextAnalysis.qTokenBudgetAt(base, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val at3 = TextAnalysis.qTokenBudgetAt(base, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(at2.toSeq == at3.toSeq,
      "admitted set changed with the bucket-key length")
    // the derivation: floor 2 at small corpora, grows by one hex digit
    // per 16x once a bucket would exceed the row target, capped at 6
    assert(TextAnalysis.budgetPrefixLen(500) == 2)
    assert(TextAnalysis.budgetPrefixLen(256L * (1L << 20)) == 2)
    assert(TextAnalysis.budgetPrefixLen(257L * (1L << 20)) == 3)
    assert(TextAnalysis.budgetPrefixLen(Long.MaxValue / 4) == 6)
    assert(TextAnalysis.budgetPrefixLen(1000, target = 100) == 2,
      "500-doc corpus with a tiny target must still floor at 2")
    assert(TextAnalysis.budgetPrefixLen(256L * 101, target = 100) == 3)
  }

  test("corpus report card: counters re-derivable per source, arithmetic consistent") {
    val rows = TextAnalysis.qCorpusReport(spark, d).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    val docs = Tables.documents(spark, d)
    // one row per source, sources exhaustive
    assert(rows.map(_._1).toSeq ==
      docs.select(col("source")).distinct().orderBy(col("source"))
        .collect().map(_.getString(0)).toSeq)
    // mass columns re-derivable independently
    for ((src, nDocs, nChars, _, nLangs, nDistinct, dupDocs, pass, permille) <- rows) {
      val sd = docs.filter(col("source") === src)
      assert(nDocs == sd.count())
      assert(nChars == sd.agg(sum(col("n_chars"))).collect()(0).getLong(0))
      assert(nLangs == sd.select(col("lang")).distinct().count())
      assert(nDistinct == sd.select(md5(col("text"))).distinct().count())
      assert(dupDocs == nDocs - nDistinct, "dup headroom must be rows - distinct")
      assert(pass >= 0 && pass <= nDocs)
      assert(permille == pass * 1000 / nDocs, "truncating per-mille")
    }
    // non-vacuous on this corpus: some pass, some fail (exact-dup
    // headroom is legitimately 0 at sf0.001 — the planted dups are
    // NEAR-dups; the dup counter's arithmetic is pinned above)
    assert(rows.exists(_._8 > 0), "no source passes anything — vacuous")
    assert(rows.exists(r => r._8 < r._2), "everything passes — vacuous")
  }

  test("filter funnel: verdicts re-derivable per doc, arithmetic consistent") {
    val rows = TextAnalysis.qFilterFunnel(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L), "four funnel stages")
    // chain consistency: each stage's n_in is the previous n_out, the
    // first n_in is the corpus, every count non-negative
    val total = Tables.documents(spark, d).count()
    assert(rows.head._3 == total, "stage 1 must see the whole corpus")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._5, s"stage ${b._1} n_in != stage ${a._1} n_out") }
    assert(rows.forall(r => r._4 >= 0 && r._5 >= 0 && r._4 <= r._3))
    // independent per-doc recomputation of the first-fail charge
    import graft.functions.TextFunctions.{stopwords, tokens}
    val en = stopwords("en").toSet
    val want = Tables.documents(spark, d).select(col("n_chars"), col("text"))
      .collect().map { r =>
        val toks = r.getString(1).trim.toLowerCase.split("\\s+").toSeq
        val (nc, nt) = (r.getLong(0), toks.size.toLong)
        val tl = toks.map(_.length.toLong).sum
        val ns = toks.count(en).toLong
        val nd = toks.distinct.size.toLong
        if (!(nc >= 100 && nc <= 100000)) 1
        else if (!(tl >= 4 * nt && tl <= 10 * nt)) 2
        else if (!(20 * ns >= nt)) 3
        else if (!(10 * nd >= 3 * nt)) 4 else 5
      }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (st, _, _, dropped, _) =>
      assert(dropped == want.getOrElse(st.toInt, 0L),
        s"stage $st dropped $dropped, independent recount ${want.get(st.toInt)}") }
    // non-vacuous: every rule fires on this corpus
    assert(rows.forall(_._4 > 0), s"a funnel stage dropped nothing: $rows")
  }

  test("dedup stats histogram accounts for every document exactly once") {
    val rows = Dedup.qDedupStats(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = Tables.documents(spark, d).count()
    assert(rows.map(_._3).sum == total, "histogram must cover the corpus")
    rows.foreach { case (sz, nc, nd, nr) =>
      assert(nd == sz * nc && nr == (sz - 1) * nc, s"arithmetic broken at size $sz") }
    // cross-check against the verdict-level keep-best frame: removable
    // docs == keep=false verdicts; cluster count at each size matches
    val verdicts = Dedup.qDedupKeepBest(spark, d).collect()
      .map(r => (r.getLong(1), r.getBoolean(3)))
    assert(rows.map(_._4).sum == verdicts.count(!_._2),
      "n_removable must equal the keep=false verdict count")
    val wantHist = verdicts.groupBy(_._1).values.groupBy(_.size)
      .map { case (sz, cs) => sz.toLong -> cs.size.toLong }
    assert(rows.map(r => r._1 -> r._2).toMap == wantHist,
      "histogram diverged from the verdict-level clusters")
    // non-vacuous: both singletons and real clusters exist
    assert(rows.exists(_._1 == 1L) && rows.exists(_._1 > 1L))
  }

  test("semantic contamination equals the exact cross-split pair set") {
    val got = Dedup.qSemanticContamination(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    import graft.functions.TextFunctions.{md5Bucket16, splitFromBucket}
    val splits = Tables.embeddings(spark, d)
      .select(col("vec_id"), splitFromBucket(md5Bucket16(col("vec_id"))))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val exact = Dedup.exactNearDupPairs(
        Tables.embeddings(spark, d), Dedup.CosineThreshold)
      .select(col("va"), col("vb")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cross = (exact ++ exact.map(_.swap))
      .filter { case (t, r) => splits(t) == "test" && splits(r) == "train" }
    val want = cross.groupBy(_._1).toSeq
      .map { case (t, ms) => (t, ms.length.toLong, ms.map(_._2).min) }
      .sortBy(_._1)
    assert(got.toSeq == want, s"contamination diverged: got ${got.toSeq}, want $want")
    assert(got.nonEmpty, "no cross-split contamination on this corpus — vacuous")
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

  test("shard manifest reconciles with packs and digests exactly") {
    val packs = TextAnalysis.qSeqPack(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val got = TextAnalysis.qPackShards(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // reference manifest from the pack rows, md5+xor recomputed from
    // scratch on the driver
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(key: String): Long = {
      val hex = md.digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val want = packs.groupBy { case (b, p, _, _, _) =>
      (b * 31 + p) % TextAnalysis.NumShards
    }.map { case (shard, rows) =>
      (shard, rows.length.toLong, rows.map(_._3).sum, rows.map(_._4).sum,
        rows.map { case (b, p, c, t, n) => h60(s"$b:$p:$c:$t:$n") }
          .reduce(_ ^ _))
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == want, "manifest diverged from the pack frame")
    assert(got.length > 1, "several shards expected")
    // a single altered pack row must flip its shard's digest
    val (b0, p0, c0, t0, n0) = packs.head
    val tampered = want.map { case row @ (sh, np, nc, nt, dg) =>
      if (sh == (b0 * 31 + p0) % TextAnalysis.NumShards)
        (sh, np, nc, nt, dg ^ h60(s"$b0:$p0:$c0:$t0:$n0") ^ h60(s"$b0:$p0:${c0 + 1}:$t0:$n0"))
      else row
    }
    assert(tampered != want, "digest must be sensitive to a pack edit")
  }

  test("mixture weights match the sqrt-temperature reference and normalize") {
    val got = TextAnalysis.qMixtureWeights(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getDouble(4)))
    assert(got.length > 1, "needs several sources to mean anything")
    // driver-side reference: per-source doc counts -> fixed-point sqrt
    val counts = Tables.documents(spark, d).groupBy(col("source")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val sqrt6 = counts.view.mapValues(n =>
      Math.round(Math.sqrt(n.toDouble) * 1e6)).toMap
    val tot = sqrt6.values.sum
    for ((src, nDocs, s6, w) <- got) {
      assert(nDocs == counts(src) && s6 == sqrt6(src))
      assert(w == s6.toDouble / tot)
    }
    // weights normalize (exactly, up to the final-division ulps)
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-9)
    // the temperature does its job: the weight RATIO between the
    // biggest and smallest source is compressed vs the doc-count ratio
    val (minN, maxN) = (counts.values.min, counts.values.max)
    val (minW, maxW) = (got.map(_._4).min, got.map(_._4).max)
    assert(maxW / minW <= maxN.toDouble / minN + 1e-9,
      "sqrt temperature must compress the domain imbalance")
  }
}
