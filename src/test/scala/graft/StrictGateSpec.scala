package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.DedupGate
import graft.streaming.DedupGate.EmbedBanding

/** The embedding gate at its production operating point
  * (EmbedBanding.Strict: 8-bit wide SRP bands, two offset layouts,
  * cosine 0.7) must (a) recall EVERY true >= 0.7 pair on a corpus with
  * planted near-dup structure — banding is a candidate generator, and
  * a generator that drops true pairs is silent data corruption at any
  * scale — and (b) admit nothing below the threshold. Both are pinned
  * by set-equality against the exact all-pairs ground truth, the same
  * ground truth SrpLshSpec holds the batch strict query to. */
class StrictGateSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  /** Exact-cosine >= 0.7 pairs over the augmented corpus, restricted
    * and oriented exactly like the gate reports them: pairs touching
    * the new (%4 == 0) side; crossing pairs as (new, corpus), new-new
    * pairs as (higher, lower). */
  private def exactGateTruth: Set[(Long, Long)] =
    Dedup.exactNearDupPairs(Dedup.augmentedEmbeddings(spark, d), Dedup.StrictThreshold)
      .filter(col("va") % 4 === 0 || col("vb") % 4 === 0)
      .select(
        when(col("vb") % 4 === 0, col("vb")).otherwise(col("va")).as("new_vec"),
        when(col("vb") % 4 === 0, col("va")).otherwise(col("vb")).as("dup_of"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("strict gate equals the exact 0.7 ground truth: full recall, no sub-threshold admits") {
    val gate = DedupGate.qEmbedGateStrict(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = exactGateTruth
    assert(gate == exact,
      s"strict gate diverged from exact ground truth: missed ${exact -- gate}, phantom ${gate -- exact}")
    assert(gate.nonEmpty, "vacuous equality: no strict gate hits at sf0.001")
    // the planted copies are the structure the threshold targets: every
    // planted pair whose source id is %20 == 0 (both sides land in the
    // new batch — planted ids inherit id % 4) must be recalled as an
    // intra-batch (higher, lower) hit
    val planted = gate.filter(_._1 >= Dedup.PlantIdOffset)
    assert(planted.nonEmpty, "no planted pair recalled — recall assertion is vacuous")
    assert(planted.forall { case (nv, df) => nv - Dedup.PlantIdOffset == df },
      s"planted hits misoriented: $planted")
  }

  test("strict gate verifies at 0.7, not the narrow 0.4: cosine column respects the config") {
    val cosines = DedupGate.qEmbedGateStrict(spark, d)
      .select(col("cosine")).collect().map(_.getDouble(0))
    assert(cosines.nonEmpty && cosines.forall(_ >= Dedup.StrictThreshold),
      s"sub-threshold cosine in strict gate output: min=${cosines.minOption}")
  }

  test("strict gate state: cross-batch strict near-dup caught through the disk index at 0.7") {
    val table = "graft_spec_gate_strict_absorb"
    // srp_bands is compiled for the corpus embedding dim (64)
    val base = Array.tabulate(64)(i => math.sin(i * 1.7).toFloat)
    val ortho = Array.tabulate(64)(i => math.cos(i * 2.3 + 1.1).toFloat)
    val corpus = Seq((1L, base)).toDF("vec_id", "embedding")
    val state = new DedupGate.EmbedGateState(corpus,
      corpusTable = Some(table), banding = EmbedBanding.Strict)
    val hits = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def sink(df: DataFrame, id: Long): Unit =
      hits ++= df.select(col("new_vec"), col("dup_of")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    // batch 0: orthogonal vector admitted (cosine ~ 0 vs the corpus)
    state.process(Seq((100L, ortho)).toDF("vec_id", "embedding"), 0L, sink)
    assert(hits.isEmpty, s"clean vector flagged by the strict gate: $hits")
    // batch 1: a strict near-dup of the batch-0 ADMIT (every 8th
    // coordinate zeroed — the augmentedEmbeddings construction, cosine
    // ~ 0.93): only the absorbed on-disk content can verify it
    val nearDup = ortho.zipWithIndex.map { case (v, i) => if (i % 8 == 0) 0f else v }
    state.process(Seq((200L, nearDup)).toDF("vec_id", "embedding"), 1L, sink)
    assert(hits.toSet == Set((200L, 100L)),
      s"cross-batch strict near-dup not caught through the disk index: $hits")
  }
}
