package graft

import org.apache.spark.sql.functions._

import graft.streaming.DedupGate

/** The verify stage's driver-side candidate-id collect is CAPPED
  * (DedupGate.MaxVerifyIds): beyond the cap the gate must degrade
  * predictably to the join-based content read — identical hit sets,
  * no driver id list — instead of building a multi-million-literal
  * plan (the round-9 advice: a weak-threshold dup storm must not
  * exhaust the driver by convention-only exclusion). */
class CandidateCapSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def textHits(): Set[(Long, Long)] =
    DedupGate.qDedupGate(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def embedHits(): Set[(Long, Long)] =
    DedupGate.qEmbedGate(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def withCap[A](cap: Int)(body: => A): A = {
    val old = DedupGate.MaxVerifyIds
    DedupGate.MaxVerifyIds = cap
    try body finally DedupGate.MaxVerifyIds = old
  }

  test("text gate: join-based fallback beyond the cap yields identical hits (memory + disk)") {
    val normal = textHits()
    assert(normal.nonEmpty, "vacuous: no text gate hits at sf0.001")
    val degraded = withCap(1)(textHits())
    assert(degraded == normal,
      s"fallback changed the text hit set: missed ${normal -- degraded}, phantom ${degraded -- normal}")
    val diskDegraded = withCap(1) {
      DedupGate.qDedupGateDisk(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(diskDegraded == normal,
      s"disk-index fallback changed the text hit set: ${diskDegraded.diff(normal)}")
  }

  test("embed gate: join-based fallback beyond the cap yields identical hits (memory + disk)") {
    val normal = embedHits()
    assert(normal.nonEmpty, "vacuous: no embed gate hits at sf0.001")
    val degraded = withCap(1)(embedHits())
    assert(degraded == normal,
      s"fallback changed the embed hit set: missed ${normal -- degraded}, phantom ${degraded -- normal}")
    val diskDegraded = withCap(1) {
      DedupGate.qEmbedGateDisk(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(diskDegraded == normal,
      s"disk-index fallback changed the embed hit set: ${diskDegraded.diff(normal)}")
  }

  test("a capped batch leaves no stray persisted blocks behind (fallback checkpoint tracked)") {
    // run one full gate-state batch under the fallback and assert the
    // per-call scratch (including the fallback's join checkpoint) was
    // unpersisted — the round-8 memory-hygiene class of bug
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"))
      .toDF("doc_id", "text")
    val state = new DedupGate.TextGateState(corpus)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    withCap(1) {
      state.process(Seq(
        (100L, "the quick brown fox jumps over the lazy dog near the river shore"))
        .toDF("doc_id", "text"), 0L, (df, _) => { df.count(); () })
    }
    val after = spark.sparkContext.getPersistentRDDs.keySet
    // absorb legitimately adds index-increment blocks; the leak class
    // is per-call scratch, which is strictly larger — bound the growth
    // to the absorb increments (sh + bands arms = 2)
    assert((after -- before).size <= 2,
      s"fallback batch leaked scratch blocks: ${(after -- before).size} new persisted RDDs")
  }
}
