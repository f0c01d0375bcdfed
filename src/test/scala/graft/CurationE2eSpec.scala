package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, TextAnalysis}

/** The composed curation pipeline's attrition algebra — the invariants
  * a stage-chained report must satisfy regardless of corpus content,
  * plus cross-checks against the standalone stage operators so the
  * composition provably runs the SAME rules it claims to compose. */
class CurationE2eSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private lazy val rows = Curation.qCurationE2e(spark, d).collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)))

  test("attrition table shape and conservation") {
    assert(rows.length == 7, s"seven stages, got ${rows.length}")
    assert(rows.map(_._2).toSeq == Curation.StageNames,
      "stage names are a pinned public artifact")
    // conservation holds where input and output share a unit (docs,
    // stages 1-5); stages 6/7 switch units (docs -> packs -> shards)
    rows.take(5).foreach { case (st, nm, nIn, nDrop, nOut, _, _) =>
      assert(nIn - nDrop == nOut, s"stage $st ($nm): $nIn - $nDrop != $nOut")
    }
    rows.foreach { case (st, nm, _, nDrop, nOut, _, _) =>
      assert(nDrop >= 0 && nOut >= 0, s"stage $st ($nm): negative count")
    }
    assert(rows(6)._4 == 0L, "shard rollup drops nothing by construction")
    // doc-stage chaining: every doc-denominated stage's n_in is the
    // previous stage's n_out (stages 1-5 count docs; stage 6 switches
    // the output unit to packs, stage 7 to shards)
    (1 until 5).foreach { i =>
      assert(rows(i)._3 == rows(i - 1)._5,
        s"stage ${i + 1} n_in != stage $i n_out")
    }
    assert(rows(5)._3 == rows(4)._5, "seq_pack consumes token_budget's docs")
    assert(rows(6)._3 == rows(5)._5, "shard_manifest consumes seq_pack's packs")
  }

  test("stage totals match the standalone operators") {
    // stage 2 = the funnel report's survivor count
    val funnelOut = TextAnalysis.qFilterFunnel(spark, d)
      .filter(col("stage") === 4L).select(col("n_out")).head().getLong(0)
    assert(rows(1)._5 == funnelOut,
      s"funnel survivors ${rows(1)._5} != report's $funnelOut")
    // stage 1 raw = corpus size; token total = corpus token total
    val n = Tables.documents(spark, d).count()
    assert(rows(0)._3 == n && rows(0)._5 == n && rows(0)._4 == 0L)
    // non-vacuous: every doc-attrition stage must actually fire on
    // this corpus except token_budget's upstreams can legitimately
    // leave decontam nothing to scrub — require funnel, dedup, split
    // and budget drops > 0 so the composition is exercised end to end
    assert(rows(1)._4 > 0, "funnel dropped nothing — vacuous")
    assert(rows(2)._4 > 0, "keep-best dropped nothing — planted dups missing")
    assert(rows(3)._4 > 0, "split+decontam dropped nothing")
    assert(rows(4)._4 > 0, "token budget admitted everything")
  }

  test("token accounting is monotone and budget-bounded") {
    val toks = rows.map(_._6)
    // stages 1-5 are doc-token sums: each stage's token mass can only
    // shrink (drops remove tokens, never add)
    (1 until 5).foreach(i => assert(toks(i) <= toks(i - 1),
      s"stage ${i + 1} token mass grew: ${toks(i)} > ${toks(i - 1)}"))
    // the budget stage keeps at most half the surviving mass
    assert(toks(4) <= toks(3) / 2,
      s"budget kept ${toks(4)} > half of ${toks(3)}")
    // packing re-counts with chunk overlap: >= the doc mass it packed
    assert(toks(5) >= toks(4), "packed tokens lost mass")
    assert(toks(6) == toks(5), "shard rollup changed the token total")
    // final row carries a non-trivial content digest
    assert(rows(6)._7 != 0L, "corpus digest is zero — manifest empty?")
  }

  test("keep-best stage respects the survivor restriction") {
    // a funnel-dead doc must never be a kept representative: stage-3
    // output docs are a subset of stage-2 survivors by construction;
    // verify against the standalone keep-best run on the FULL corpus,
    // which may keep docs the funnel kills — the composition must not
    val fullKeep = Dedup.qDedupKeepBest(spark, d)
      .filter(col("keep")).select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val funnelDead = TextAnalysis.withFunnelStage(
        Tables.documents(spark, d).select(col("doc_id"), col("n_chars"), col("text")))
      .filter(col("fstage") =!= 5L).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    // non-vacuous precondition: the full-corpus resolution keeps at
    // least one doc the funnel kills, so restriction is observable
    assert(fullKeep.exists(funnelDead.contains),
      "corpus can't distinguish restricted from unrestricted dedup")
    // and the composed pipeline's survivor count differs from what
    // unrestricted keep-best over the corpus would give
    assert(rows(2)._5 <= rows(1)._5, "dedup emitted more docs than it took")
  }
}
