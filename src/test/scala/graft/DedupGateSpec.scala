package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Dedup
import graft.streaming.DedupGate

/** The streaming dedup gate must (a) compute signatures value-identical
  * to the batch MinHash path, (b) catch near-dups arriving on a live
  * stream against a static corpus, and (c) let clean documents through. */
class DedupGateSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("gate pairs are exactly the batch LSH pairs touching the new side") {
    // the gate reuses the batch signature/band operators, so its hits
    // must be q_minhash_lsh's verified pairs restricted to pairs
    // TOUCHING the new side — (new, corpus) crossings AND (new, new)
    // intra-batch pairs, the same predicate as the driver oracle — no
    // more (no phantom candidates), no fewer (no lost bands)
    val gate = DedupGate.qDedupGate(spark, d).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    val touching = Dedup.qMinhashLsh(spark, d)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a % 4 == 0) || (b % 4 == 0) }.toSet
    assert(gate == touching, s"gate pairs diverged from batch LSH pairs touching the new side")
  }

  test("streaming gate flags near-dups against the corpus and passes clean docs") {
    implicit val sq = spark.sqlContext
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely different content about spark structured streaming state")
    ).toDF("doc_id", "text")

    val input = MemoryStream[(Long, String)]
    val hits = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = DedupGate.start(
      input.toDF().toDF("doc_id", "text"), corpus,
      Files.createTempDirectory("graft-gate").toString,
      (df, _) => hits ++= df.select(col("new_doc"), col("dup_of"))
        .collect().map(r => (r.getLong(0), r.getLong(1))))

    // a near-dup of doc 1 (one word changed) and a clean document
    input.addData(
      (100L, "the quick brown fox jumps over the lazy dog near the river shore"),
      (101L, "totally unrelated text with no overlap whatsoever in any shingle"))
    q.processAllAvailable()
    q.stop()

    assert(hits.toSet == Set((100L, 1L)),
      s"expected exactly the planted near-dup hit, got $hits")
  }

  test("gate-to-index maintenance: append merges clusters, keeps the bucketed layout") {
    import spark.implicits._
    // snapshot index holds one dup pair (1~2); the gate then admits
    // doc 100 as a near-dup of corpus doc 3 and its pair is APPENDED
    val table = "graft_spec_pairs_append"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), table)
    new scala.reflect.io.Directory(wh).deleteRecursively()
    graft.sources.Writers.writeBucketed(
      Seq((1L, 2L)).toDF("doc_a", "doc_b"), "doc_b", Dedup.PairIndexBuckets, table)
    // the gate emits (new_doc=100, dup_of=3) — newcomer FIRST; the
    // append must canonicalize to doc_a < doc_b or qCleanCorpus's
    // distinct-doc_b loser read would drop the ORIGINAL doc 3
    Dedup.appendPairs(spark, table, Seq((100L, 3L)).toDF("doc_a", "doc_b"))
    assert(spark.table(table).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L), (3L, 100L)),
      "appended pair not canonicalized to doc_a < doc_b")

    // replaying the same gate batch (at-least-once delivery) must not
    // grow the index
    Dedup.appendPairs(spark, table, Seq((100L, 3L)).toDF("doc_a", "doc_b"))
    assert(spark.table(table).count() == 2, "replayed append duplicated rows")

    // cluster semantics over the MAINTAINED index: {1,2} and {3,100}
    val clusters = Dedup.connectedComponents(spark.table(table))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 100L -> 3L),
      s"unexpected clusters after append: $clusters")

    // the layout contract survives the append: a distinct on the
    // bucket key still reads bucketed with zero shuffle exchanges
    val plan = spark.table(table).select(col("doc_b")).distinct()
      .queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), s"append lost the bucketed layout:\n$plan")
    assert(!plan.contains("Exchange"), s"post-append distinct shuffles:\n$plan")
  }

  test("text gate absorbs across batches: batch-2 near-dup of a batch-1 admit is caught") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely different content about spark structured streaming state")
    ).toDF("doc_id", "text")
    val state = new DedupGate.TextGateState(corpus)
    val hits = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    def sink(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      hits ++= df.select(col("new_doc"), col("dup_of")).collect()
        .map(r => (id, r.getLong(0), r.getLong(1)))

    // batch 0: a fresh document, no overlap with the corpus — ADMITTED
    state.process(Seq(
      (100L, "glaciers carve deep valleys through ancient mountain ranges over millennia")
    ).toDF("doc_id", "text"), 0L, sink)
    assert(hits.isEmpty, s"fresh batch-0 doc falsely flagged: $hits")

    // batch 1: a near-dup (one word changed) of the doc ADMITTED in
    // batch 0 — only the absorbed increment can catch it
    state.process(Seq(
      (200L, "glaciers carve deep valleys through ancient mountain ranges over centuries")
    ).toDF("doc_id", "text"), 1L, sink)
    assert(hits.toList == List((1L, 200L, 100L)),
      s"batch-1 dup not attributed to the batch-0 admit: $hits")
  }

  test("text gate replay: hits re-emitted, index NOT re-absorbed, no self-pair persisted") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank")
    ).toDF("doc_id", "text")
    val table = "graft_spec_pairs_replay"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    new scala.reflect.io.Directory(new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table))
      .deleteRecursively()
    graft.sources.Writers.writeBucketed(
      Seq((1L, 2L)).toDF("doc_a", "doc_b"), "doc_b", Dedup.PairIndexBuckets, table)
    val state = new DedupGate.TextGateState(corpus, pairTable = Some(table))
    val hits = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    def sink(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      hits ++= df.select(col("new_doc"), col("dup_of")).collect()
        .map(r => (id, r.getLong(0), r.getLong(1)))

    val batch = Seq(
      (100L, "glaciers carve deep valleys through ancient mountain ranges over millennia")
    ).toDF("doc_id", "text")
    state.process(batch, 0L, sink)
    assert(hits.isEmpty, s"fresh doc falsely flagged: $hits")
    val docsAfterAbsorb = state.index.sh.select(col("doc_id")).distinct().count()
    val bandsAfterAbsorb = state.index.bands.count()
    assert(docsAfterAbsorb == 2, "admitted doc not absorbed into the index")

    // at-least-once foreachBatch REPLAYS batch id 0: doc 100 is now in
    // the index, so the replay must REPORT it as already admitted
    // ((100,100) self-hit, jaccard 1 — the documented re-ingest
    // contract) but must NOT absorb again (no double-counted shingles)
    state.process(batch, 0L, sink)
    assert(hits.toList == List((0L, 100L, 100L)),
      s"replayed batch did not re-emit the already-admitted hit: $hits")
    assert(state.index.sh.select(col("doc_id")).distinct().count() == docsAfterAbsorb,
      "replayed batch id re-absorbed: doc count grew")
    assert(state.index.bands.count() == bandsAfterAbsorb,
      "replayed batch id re-absorbed: band index grew")

    // the replay's (100,100) self-hit is REPORTED but must never reach
    // the pair index: a (d,d) edge would surface d as a phantom
    // singleton cluster in connectedComponents
    assert(spark.table(table).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)),
      "replayed self-hit was persisted to the pair index")
  }

  test("gate index collapse keeps absorbed content and resets plan width") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank")
    ).toDF("doc_id", "text")
    // collapseEvery=2: the second absorb triggers a collapse
    val state = new DedupGate.TextGateState(corpus, collapseEvery = 2)
    val hits = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    def sink(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      hits ++= df.select(col("new_doc"), col("dup_of")).collect()
        .map(r => (id, r.getLong(0), r.getLong(1)))

    state.process(Seq(
      (100L, "glaciers carve deep valleys through ancient mountain ranges over millennia")
    ).toDF("doc_id", "text"), 0L, sink)
    state.process(Seq(
      (101L, "solar panels convert sunlight into electricity across distributed grids daily")
    ).toDF("doc_id", "text"), 1L, sink)
    assert(hits.isEmpty, s"fresh docs falsely flagged: $hits")

    // plan width reset: the collapsed index is a checkpointed scan,
    // not a union of per-batch arms
    Seq(state.index.sh, state.index.bands).foreach { df =>
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("Union"), s"collapse left union arms:\n$plan")
    }

    // content preserved across the collapse: a near-dup of the
    // PRE-collapse batch-0 admit is still caught and attributed
    state.process(Seq(
      (200L, "glaciers carve deep valleys through ancient mountain ranges over centuries")
    ).toDF("doc_id", "text"), 2L, sink)
    assert(hits.toList == List((2L, 200L, 100L)),
      s"post-collapse index lost the batch-0 admit: $hits")

    // embed twin, compact: same collapse schedule, same guarantees
    val rng = new java.util.Random(31)
    def vec() = Array.fill(64)(rng.nextGaussian().toFloat)
    val estate = new DedupGate.EmbedGateState(
      Seq((1L, vec())).toDF("vec_id", "embedding"), collapseEvery = 2)
    val ehits = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def esink(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      ehits ++= df.select(col("new_vec"), col("dup_of")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    val fresh = vec()
    estate.process(Seq((100L, fresh)).toDF("vec_id", "embedding"), 0L, esink)
    estate.process(Seq((101L, vec())).toDF("vec_id", "embedding"), 1L, esink)
    assert(ehits.isEmpty, s"fresh vectors falsely flagged: $ehits")
    Seq(estate.index.bands, estate.index.vecs).foreach { df =>
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("Union"), s"embed collapse left union arms:\n$plan")
    }
    estate.process(Seq(
      (200L, fresh.map(x => x + 0.05f * rng.nextGaussian().toFloat))
    ).toDF("vec_id", "embedding"), 2L, esink)
    assert(ehits.toList == List((200L, 100L)),
      s"post-collapse embed index lost the batch-0 admit: $ehits")
  }

  test("embed gate absorbs across batches and ignores replayed batch ids") {
    val rng = new java.util.Random(17)
    def vec() = Array.fill(64)(rng.nextGaussian().toFloat)
    val corpus = Seq((1L, vec()), (2L, vec())).toDF("vec_id", "embedding")
    val state = new DedupGate.EmbedGateState(corpus)
    val hits = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    def sink(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      hits ++= df.select(col("new_vec"), col("dup_of")).collect()
        .map(r => (id, r.getLong(0), r.getLong(1)))

    // batch 0: an independent random vector (cosine ~0 vs corpus) — ADMITTED
    val fresh = vec()
    state.process(Seq((100L, fresh)).toDF("vec_id", "embedding"), 0L, sink)
    assert(hits.isEmpty, s"fresh batch-0 vector falsely flagged: $hits")
    val vecsAfterAbsorb = state.index.vecs.count()
    assert(vecsAfterAbsorb == 3, "admitted vector not absorbed into the index")

    // batch 1: a lightly perturbed copy of the batch-0 admit
    // (cosine ~0.995) — only the absorbed increment can catch it
    state.process(Seq(
      (200L, fresh.map(x => x + 0.05f * rng.nextGaussian().toFloat))
    ).toDF("vec_id", "embedding"), 1L, sink)
    assert(hits.toList == List((1L, 200L, 100L)),
      s"batch-1 semantic dup not attributed to the batch-0 admit: $hits")

    // replayed batch 0: the already-admitted self-hit is re-emitted,
    // the index does not grow
    state.process(Seq((100L, fresh)).toDF("vec_id", "embedding"), 0L, sink)
    assert(hits.last == (0L, 100L, 100L),
      s"replayed batch did not re-emit the already-admitted hit: $hits")
    assert(state.index.vecs.count() == vecsAfterAbsorb,
      "replayed batch id re-absorbed: vector count grew")
  }

  test("streaming text gate catches a batch-2 near-dup of a batch-1 admit end-to-end") {
    implicit val sq = spark.sqlContext
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank")
    ).toDF("doc_id", "text")

    val input = MemoryStream[(Long, String)]
    val hits = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = DedupGate.start(
      input.toDF().toDF("doc_id", "text"), corpus,
      Files.createTempDirectory("graft-gate-xbatch").toString,
      (df, _) => hits ++= df.select(col("new_doc"), col("dup_of"))
        .collect().map(r => (r.getLong(0), r.getLong(1))))

    // two SEPARATE micro-batches: the second's doc is a near-dup of
    // the first's (admitted) doc, so the hit proves the live absorb path
    input.addData(
      (100L, "glaciers carve deep valleys through ancient mountain ranges over millennia"))
    q.processAllAvailable()
    input.addData(
      (200L, "glaciers carve deep valleys through ancient mountain ranges over centuries"))
    q.processAllAvailable()
    q.stop()

    assert(hits.toSet == Set((200L, 100L)),
      s"expected exactly the cross-batch hit (200,100), got $hits")
  }

  test("streaming embed gate catches a cross-batch semantic dup end-to-end") {
    implicit val sq = spark.sqlContext
    val rng = new java.util.Random(23)
    def vec() = Array.fill(64)(rng.nextGaussian().toFloat)
    val corpus = Seq((1L, vec())).toDF("vec_id", "embedding")

    val input = MemoryStream[(Long, Array[Float])]
    val hits = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = DedupGate.startEmbed(
      input.toDF().toDF("vec_id", "embedding"), corpus,
      Files.createTempDirectory("graft-egate-xbatch").toString,
      (df, _) => hits ++= df.select(col("new_vec"), col("dup_of"))
        .collect().map(r => (r.getLong(0), r.getLong(1))))

    val fresh = vec()
    input.addData((100L, fresh))
    q.processAllAvailable()
    input.addData((200L, fresh.map(x => x + 0.05f * rng.nextGaussian().toFloat)))
    q.processAllAvailable()
    q.stop()

    assert(hits.toSet == Set((200L, 100L)),
      s"expected exactly the cross-batch semantic hit (200,100), got $hits")
  }

  test("streaming embed gate maintains the pair index: append, merge, bucketed plan") {
    implicit val sq = spark.sqlContext
    // mirror of the TEXT gate's maintenance test, driven through the
    // LIVE startEmbed path: snapshot index holds pair (1,2); the gate
    // then flags streamed vec 100 as a near-dup of corpus vec 3 and
    // the SRP hit is APPENDED canonicalized
    val table = "graft_spec_pairs_embed_append"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), table)
    new scala.reflect.io.Directory(wh).deleteRecursively()
    graft.sources.Writers.writeBucketed(
      Seq((1L, 2L)).toDF("doc_a", "doc_b"), "doc_b", Dedup.PairIndexBuckets, table)

    val rng = new java.util.Random(29)
    def vec() = Array.fill(64)(rng.nextGaussian().toFloat)
    val base = vec()
    val corpus = Seq((3L, base), (4L, vec())).toDF("vec_id", "embedding")

    val input = MemoryStream[(Long, Array[Float])]
    val q = DedupGate.startEmbed(
      input.toDF().toDF("vec_id", "embedding"), corpus,
      Files.createTempDirectory("graft-egate-pairs").toString,
      (_, _) => (), pairTable = Some(table))
    input.addData((100L, base.map(x => x + 0.05f * rng.nextGaussian().toFloat)))
    q.processAllAvailable()
    q.stop()

    // the gate emitted (new_vec=100, dup_of=3) — newcomer FIRST; the
    // append canonicalizes to doc_a < doc_b
    assert(spark.table(table).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L), (3L, 100L)),
      "SRP hit not appended canonicalized to the pair index")

    // cluster semantics over the MAINTAINED index: {1,2} and {3,100}
    val clusters = Dedup.connectedComponents(spark.table(table))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 100L -> 3L),
      s"unexpected clusters after embed-gate append: $clusters")

    // layout contract survives: distinct on the bucket key reads
    // bucketed with zero shuffle exchanges
    val plan = spark.table(table).select(col("doc_b")).distinct()
      .queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), s"append lost the bucketed layout:\n$plan")
    assert(!plan.contains("Exchange"), s"post-append distinct shuffles:\n$plan")
  }

  test("streaming embed gate flags semantic near-dups against the corpus") {
    implicit val sq = spark.sqlContext
    val rng = new java.util.Random(11)
    def vec() = Array.fill(64)(rng.nextGaussian().toFloat)
    val base = vec()
    val corpus = Seq((1L, base), (2L, vec())).toDF("vec_id", "embedding")

    val input = MemoryStream[(Long, Array[Float])]
    val hits = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = DedupGate.startEmbed(
      input.toDF().toDF("vec_id", "embedding"), corpus,
      Files.createTempDirectory("graft-egate").toString,
      (df, _) => hits ++= df.select(col("new_vec"), col("dup_of"))
        .collect().map(r => (r.getLong(0), r.getLong(1))))

    // a lightly perturbed copy of corpus vector 1 (cosine ~0.995) and
    // an independent random vector (cosine ~0 against everything)
    input.addData(
      (100L, base.map(x => x + 0.05f * rng.nextGaussian().toFloat)),
      (101L, vec()))
    q.processAllAvailable()
    q.stop()

    assert(hits.contains((100L, 1L)), s"planted semantic near-dup missed: $hits")
    assert(!hits.exists(_._1 == 101L), s"clean vector falsely flagged: $hits")
  }
}
