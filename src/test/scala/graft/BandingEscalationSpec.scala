package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.DedupGate
import graft.streaming.DedupGate.{BandingMonitor, EmbedBanding}

/** The banding-escalation trip wire ([[DedupGate.BandingMonitor]])
  * must turn the strict-vs-deep config choice into a measured runtime
  * signal: it FIRES when the current banding admits the quadratic
  * random background (strict bands on an isotropic corpus — the
  * noise-dominated regime SCALE.md routes to the deep config) and
  * stays QUIET when candidates track true near-dup structure (the
  * deep config on the planted-near-dup corpus, whose measured rate is
  * two orders of magnitude under the threshold). Rate arithmetic,
  * patience, and one-shot semantics are unit-pinned; the regimes are
  * pinned end-to-end through a running gate state.
  */
class BandingEscalationSpec extends SparkSpec {

  test("monitor: patience, consecutive-only counting, one-shot trip, ladder top") {
    val m = new BandingMonitor(EmbedBanding.Strict, rateThreshold = 0.05, patience = 3)
    // two hot batches, then a cold one: the streak must reset
    assert(m.observe(20, 10, 10).isEmpty)  // rate 0.2 (hot 1)
    assert(m.observe(20, 10, 10).isEmpty)  // hot 2
    assert(m.observe(1, 10, 10).isEmpty)   // rate 0.01 — streak resets
    assert(m.observe(20, 10, 10).isEmpty)
    assert(m.observe(20, 10, 10).isEmpty)
    assert(m.advice.isEmpty, "advice must stay empty before the trip")
    // third consecutive hot batch trips the wire exactly once
    assert(m.observe(20, 10, 10).contains(EmbedBanding.Deep))
    assert(m.advice.contains(EmbedBanding.Deep))
    assert(m.observe(20, 10, 10).isEmpty, "the wire trips once, advice stands")

    // empty cross space is not an over-rate observation
    val m2 = new BandingMonitor(EmbedBanding.Strict, patience = 1)
    assert(m2.observe(0, 0, 0).isEmpty && m2.advice.isEmpty)

    // the ladder: narrow escalates to strict; deep has nowhere deeper
    val mn = new BandingMonitor(EmbedBanding.Narrow, patience = 1)
    assert(mn.observe(20, 10, 10).contains(EmbedBanding.Strict))
    val md = new BandingMonitor(EmbedBanding.Deep, patience = 1)
    assert(md.observe(20, 10, 10).isEmpty && md.advice.isEmpty,
      "deep is the deepest config — no recommendation to give")
  }

  test("strict gate on isotropic noise trips the wire; deep gate on the planted corpus stays quiet") {
    val d = "/root/testdata/sf0.001"
    def batches(vecs: org.apache.spark.sql.DataFrame) =
      (0 until 3).map(i => vecs.filter(col("vec_id") % 4 === 0 &&
        col("vec_id") % 12 === i * 4))

    // FIRES: strict 8-bit bands on pure isotropic vectors admit the
    // ~40/256 = 15% random background — no true structure, all noise
    val noise = Tables.embeddings(spark, d)
    val strictState = new DedupGate.EmbedGateState(
      noise.filter(col("vec_id") % 4 =!= 0), banding = EmbedBanding.Strict)
    batches(noise).zipWithIndex.foreach { case (b, i) =>
      strictState.process(b, i.toLong, (_, _) => ()) }
    assert(strictState.escalationAdvice.contains(EmbedBanding.Deep),
      "strict banding on an isotropic corpus must trip the escalation wire")

    // QUIET: the deep config on the planted-near-dup corpus — 16-bit
    // bands kill the background, candidates track the planted pairs
    val planted = Dedup.augmentedEmbeddings(spark, d)
    val deepState = new DedupGate.EmbedGateState(
      planted.filter(col("vec_id") % 4 =!= 0), banding = EmbedBanding.Deep)
    batches(planted).zipWithIndex.foreach { case (b, i) =>
      deepState.process(b, i.toLong, (_, _) => ()) }
    assert(deepState.escalationAdvice.isEmpty,
      "deep banding's candidate rate tracks true structure — the wire must stay quiet")
  }
}
