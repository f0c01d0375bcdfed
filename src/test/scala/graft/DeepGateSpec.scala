package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.DedupGate
import graft.streaming.DedupGate.EmbedBanding

/** The embedding gate at the DEEP operating point (EmbedBanding.Deep:
  * 16-bit wide SRP bands, 4 rotation layouts, 3 independent hash
  * families, cosine 0.7). A single 16-bit family measures ~183/200
  * recall — the multi-family fold (family id packed into `layout`)
  * is what restores full recall, so the spec pins (a) set-equality
  * with the exact all-pairs ground truth (the same bar
  * StrictGateSpec sets), and (b) that the index actually carries all
  * three families through absorb — a regression that silently
  * dropped families would still pass (a) on an easy corpus. */
class DeepGateSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def exactGateTruth: Set[(Long, Long)] =
    Dedup.exactNearDupPairs(Dedup.augmentedEmbeddings(spark, d), Dedup.StrictThreshold)
      .filter(col("va") % 4 === 0 || col("vb") % 4 === 0)
      .select(
        when(col("vb") % 4 === 0, col("vb")).otherwise(col("va")).as("new_vec"),
        when(col("vb") % 4 === 0, col("va")).otherwise(col("vb")).as("dup_of"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("deep gate equals the exact 0.7 ground truth: three families restore full recall") {
    val gate = DedupGate.qEmbedGateDeep(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = exactGateTruth
    assert(gate == exact,
      s"deep gate diverged from exact ground truth: missed ${exact -- gate}, phantom ${gate -- exact}")
    assert(gate.nonEmpty, "vacuous equality: no deep gate hits at sf0.001")
  }

  test("deep gate state: all three families indexed, absorbed, and joined cross-batch") {
    val table = "graft_spec_gate_deep_absorb"
    val base = Array.tabulate(64)(i => math.sin(i * 1.7).toFloat)
    val ortho = Array.tabulate(64)(i => math.cos(i * 2.3 + 1.1).toFloat)
    val corpus = Seq((1L, base)).toDF("vec_id", "embedding")
    val state = new DedupGate.EmbedGateState(corpus,
      corpusTable = Some(table), banding = EmbedBanding.Deep)
    // the corpus index must carry every (family x layout) combination:
    // layout = sigId * group + offset over 3 seeds x 4 offsets
    val expectedLayouts = (for {
      sigId <- EmbedBanding.Deep.seeds.indices
      off <- EmbedBanding.Deep.offsets
    } yield sigId * EmbedBanding.Deep.group + off).toSet
    val indexedLayouts = state.index.bands.select(col("layout"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(indexedLayouts == expectedLayouts,
      s"deep index layouts $indexedLayouts != expected $expectedLayouts — a hash family or rotation was dropped")
    val hits = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def sink(df: DataFrame, id: Long): Unit =
      hits ++= df.select(col("new_vec"), col("dup_of")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    // batch 0: orthogonal vector admitted (cosine ~ 0 vs the corpus)
    state.process(Seq((100L, ortho)).toDF("vec_id", "embedding"), 0L, sink)
    assert(hits.isEmpty, s"clean vector flagged by the deep gate: $hits")
    // batch 1: a 0.7-class near-dup of the batch-0 ADMIT — only the
    // absorbed (family-aware) bands + disk content can verify it
    val nearDup = ortho.zipWithIndex.map { case (v, i) => if (i % 8 == 0) 0f else v }
    state.process(Seq((200L, nearDup)).toDF("vec_id", "embedding"), 1L, sink)
    assert(hits.toSet == Set((200L, 100L)),
      s"cross-batch deep near-dup not caught through the disk index: $hits")
    // the absorbed increment must be family-complete too
    val absorbedLayouts = state.index.bands
      .filter(col("vec_id") === 100L).select(col("layout"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(absorbedLayouts == expectedLayouts,
      s"absorbed band layouts $absorbedLayouts != expected $expectedLayouts")
  }
}
