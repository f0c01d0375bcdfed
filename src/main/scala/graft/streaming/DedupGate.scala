package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.Tables
import graft.operators.Dedup

/** STREAMING dedup gates — the online-ingestion form of the near-dup
  * paths for BOTH modalities: new documents/embeddings arrive as a
  * stream and are checked before admission, the gate a production
  * training pipeline runs at ingestion time (batch dedup cleans the
  * corpus; this keeps it clean).
  *
  * A batch checks against THREE populations, because dup storms arrive
  * together, not politely one per batch:
  *  1. the corpus snapshot — a slim band index built once at gate
  *     start ([[indexCorpus]] / [[indexEmbedCorpus]]);
  *  2. the SAME micro-batch — an intra-batch band self-join (the
  *     [[Dedup.qMinhashLsh]] shape, tiny per batch): two near-identical
  *     documents arriving together yield exactly one admission, the
  *     lower id (keep-lowest-id, matching the batch pipeline);
  *  3. earlier batches — every batch's ADMITTED docs are folded into
  *     the gate index ([[TextIndex.absorb]] / [[EmbedIndex.absorb]]):
  *     each increment is localCheckpointed once and unioned in, so
  *     per-batch cost is the increment only. Replayed batches (at-
  *     least-once foreachBatch) are not re-absorbed: the batchId guard
  *     makes absorption exactly-once per batch id.
  *
  * Index lifetime: the folded increments bridge the span between
  * corpus snapshots — a gate restart rebuilds the index from the
  * snapshot, and docs admitted since re-enter through the batch
  * pipeline's next snapshot (the same system-of-record contract as
  * [[Dedup.appendPairs]]). The union plan grows one (checkpointed) arm
  * per batch; every [[CollapseEvery]] absorbs the gate state collapses
  * the arms back into one checkpointed frame each, so plan width is
  * bounded in code regardless of snapshot cadence; docs/SCALE.md
  * records the cadence math.
  *
  * Shape: the stream feeds foreachBatch, and each micro-batch runs the
  * SAME codegen'd operators as the batch LSH paths
  * ([[Dedup.minhashSignatures]] / [[Dedup.lshBands]] over exploded
  * shingles; [[graft.functions.expressions.SrpBands]]). foreachBatch
  * (not an append-mode streaming DAG) is load-bearing twice over: the
  * signature build and candidate dedup are aggregations a stateless
  * append stream cannot host, and a per-row array-HOF signature
  * (transform/array_min lambdas) is CodegenFallback-interpreted —
  * measured 14x slower than the exploded+grouped build on the same
  * data. The gates hold no streaming state store; their only cross-
  * batch state is the absorbed index increments above.
  *
  * Scale shape: candidates come from equi joins on the band key
  * against a SLIM index (3 ints per corpus band; at 100 TB a bucketed
  * on-disk table of [[Dedup.pairIndex]]'s kind), and the exact
  * verification (shared-shingle Jaccard / two-stage cosine, both THE
  * shared helpers [[Dedup.jaccardOnPairs]] / [[Dedup.cosineVerify]] so
  * gate and batch semantics cannot drift) touches only candidate doc
  * ids. Same-id pairs are NOT excluded on the corpus join: a
  * re-ingested document whose id already exists in the corpus is still
  * content-checked — "already admitted" is exactly what a gate must
  * report.
  *
  * Downstream maintenance: pass `pairTable` to [[start]]/[[startEmbed]]
  * and every batch's verified hits are appended (canonicalized,
  * replay-idempotent) to the bucketed pair index via
  * [[Dedup.appendPairs]], so cluster/corpus-clean queries reflect
  * gate-time knowledge without a rebuild. One gate instance is the
  * single writer of its table (appendPairs' documented contract).
  */
object DedupGate {

  /** Absorbs between in-code index collapses: each absorb adds one
    * checkpointed union arm per index frame, and every CollapseEvery
    * absorbs the gate re-checkpoints the union into a single frame —
    * bounding analyzer cost and per-batch task count at ~CollapseEvery
    * extra arms/tasks worst-case (SCALE.md, streaming-gate cadence).
    * 64 keeps the collapse cost (one full index rewrite) amortized to
    * ~1.6% of batches while never letting the plan exceed 3x64+3
    * union arms even if the corpus snapshot is never republished. */
  val CollapseEvery = 64

  /** Corpus snapshot pre-processed for the text gate: shingle rows,
    * slim band index, and set sizes — built once, localCheckpointed,
    * shared across every micro-batch. [[absorb]] extends it with
    * admitted docs between snapshots. */
  final case class TextIndex(sh: DataFrame, bands: DataFrame, sizes: DataFrame) {
    /** Fold admitted docs in so later batches see them: each increment
      * is checkpointed ONCE (shingles, bands, sizes) and unioned into
      * the standing frames — per-batch work is the increment only, and
      * earlier increments are never recomputed. */
    def absorb(admittedDocs: DataFrame): TextIndex = {
      import graft.functions.TextFunctions.shingles
      val shA = shingles(admittedDocs, "doc_id", "text").localCheckpoint(false)
      TextIndex(
        sh.unionAll(shA),
        bands.unionAll(
          Dedup.lshBands(Dedup.minhashSignatures(shA)).localCheckpoint(false)),
        sizes.unionAll(Dedup.shingleSizes(shA).localCheckpoint(false)))
    }

    /** Collapse the accumulated union arms into one checkpointed frame
      * each — content-identical, plan width reset to 1. The gate state
      * calls this every [[DedupGate.CollapseEvery]] absorbs, so plan
      * width and per-batch task-launch overhead stay bounded even when
      * the corpus snapshot is republished rarely (SCALE.md cadence). */
    def collapsed: TextIndex = TextIndex(
      sh.localCheckpoint(false),
      bands.localCheckpoint(false),
      sizes.localCheckpoint(false))
  }

  def indexCorpus(corpusDocs: DataFrame): TextIndex = {
    import graft.functions.TextFunctions.shingles
    val sh = shingles(corpusDocs, "doc_id", "text").localCheckpoint(false)
    TextIndex(sh,
      Dedup.lshBands(Dedup.minhashSignatures(sh)).localCheckpoint(false),
      Dedup.shingleSizes(sh).localCheckpoint(false))
  }

  /** New docs vs the index AND vs each other: DISTINCT candidate pairs
    * from (a) the new-bands x corpus-bands join and (b) the new-bands
    * self-join (higher id flagged as the newcomer — keep-lowest-id),
    * then exact Jaccard >= 0.5 verified ONCE per pair via
    * [[Dedup.jaccardOnPairs]] (the one definition of formula and
    * threshold). Output (new_doc, dup_of, jaccard), pair-unique.
    *
    * The dup_of side of verification draws from corpus shingles plus
    * the batch's own (for intra-batch pairs); a re-ingested id present
    * in both is verified against its CORPUS content — the question the
    * gate answers is "is this a dup of what the corpus already holds". */
  def duplicates(newDocs: DataFrame, corpus: TextIndex): DataFrame = {
    import graft.functions.TextFunctions.shingles
    // the new-docs shingle set feeds bands + shared-count + sizes —
    // same materialize-once rationale as qMinhashLsh
    val shNew = shingles(newDocs, "doc_id", "text").localCheckpoint(false)
    val bandsNew = Dedup.lshBands(Dedup.minhashSignatures(shNew))
      .localCheckpoint(false) // feeds the corpus join AND the self-join
    val candCorpus = bandsNew
      .join(corpus.bands.select(col("doc_id").as("dup_of"),
        col("band_id"), col("band_hash")), Seq("band_id", "band_hash"))
      .select(col("doc_id").as("doc_a"), col("dup_of").as("doc_b"))
    // the new-vs-new blindspot closed: near-dups arriving TOGETHER
    // collide here; id > id orients the higher id as the rejected
    // newcomer so exactly the lowest of an intra-batch dup group
    // survives (its members' mutual pairs all flag the higher side)
    val candIntra = bandsNew.as("x").join(bandsNew.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") > col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val cand = candCorpus.unionAll(candIntra).distinct()
    // dup_of-side shingles/sizes: corpus first, batch docs only for
    // ids the corpus lacks (re-ingested ids verify against corpus
    // content; sizes is the compact one-row-per-doc id set to anti-join)
    val corpusIds = corpus.sizes.select(col("doc_id"))
    val shNewOnly = shNew.join(corpusIds, Seq("doc_id"), "left_anti")
    val shB = corpus.sh.select(col("doc_id"), col("shingle"))
      .unionAll(shNewOnly.select(col("doc_id"), col("shingle")))
    val sizesNew = Dedup.shingleSizes(shNew).localCheckpoint(false)
    val sizesB = corpus.sizes.select(col("doc_id"), col("n"))
      .unionAll(sizesNew.join(corpusIds, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("n")))
    val shared = cand
      .join(shNew.select(col("doc_id").as("doc_a"), col("shingle")), "doc_a")
      .join(shB.select(col("doc_id").as("doc_b"), col("shingle")),
        Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
    Dedup.jaccardOnPairs(shared, sizesNew, sizesB)
      .select(col("doc_a").as("new_doc"), col("doc_b").as("dup_of"), col("jaccard"))
  }

  def duplicates(newDocs: DataFrame, corpusDocs: DataFrame): DataFrame =
    duplicates(newDocs, indexCorpus(corpusDocs))

  /** The cross-batch mutable state of a running text gate — the
    * growing corpus index plus the exactly-once absorption guard —
    * extracted from [[start]]'s foreachBatch so the absorb path is
    * unit-testable without a streaming harness. One instance per gate;
    * [[process]] is what foreachBatch invokes per micro-batch. */
  final class TextGateState(corpusDocs: DataFrame,
      pairTable: Option[String] = None,
      collapseEvery: Int = CollapseEvery) {
    @volatile private var corpus = indexCorpus(corpusDocs)
    private var absorbsSinceCollapse = 0
    private val absorbedBatches =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()

    /** Current index (corpus snapshot + absorbed increments). */
    def index: TextIndex = corpus

    /** One micro-batch: verify dups, sink them, maintain the pair
      * table, then absorb the batch's admitted docs. Absorption is
      * exactly-once per batch id — a replayed batch (at-least-once
      * foreachBatch) re-emits its hits but never re-absorbs, so the
      * index cannot double-count shingles. */
    def process(df: DataFrame, id: Long, sink: (DataFrame, Long) => Unit): Unit = {
      val batch = df.localCheckpoint(false)
      val dups = duplicates(batch, corpus).localCheckpoint(false)
      sink(dups, id)
      // self-hits (a replayed/re-ingested id verifying against its own
      // corpus content) are REPORTED to the sink but never persisted:
      // a (d,d) row in the pair index would surface d as a phantom
      // singleton cluster in connectedComponents
      pairTable.foreach(t => Dedup.appendPairs(df.sparkSession, t,
        dups.filter(col("new_doc") =!= col("dup_of"))
          .select(col("new_doc").as("doc_a"), col("dup_of").as("doc_b"))))
      if (absorbedBatches.add(id)) {
        val admitted = batch.join(
          dups.select(col("new_doc").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
        corpus = corpus.absorb(admitted)
        absorbsSinceCollapse += 1
        if (absorbsSinceCollapse >= collapseEvery) {
          corpus = corpus.collapsed
          absorbsSinceCollapse = 0
        }
      }
    }
  }

  /** Start the gate: raw new docs stream into foreachBatch against the
    * corpus index, which GROWS by each batch's admitted docs (see the
    * module doc's three populations). `pairTable`, when set, receives
    * every hit via [[Dedup.appendPairs]]. */
  def start(
      newDocs: DataFrame,
      corpusDocs: DataFrame,
      checkpointDir: String,
      sink: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.ProcessingTime(0),
      pairTable: Option[String] = None): StreamingQuery = {
    val state = new TextGateState(corpusDocs, pairTable)
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, id: Long) => state.process(df, id, sink) }
      .start()
  }

  /** Batch analog for the oracle gate: every doc_id % 4 == 0 document
    * replayed as ONE "new" batch against the rest as corpus — the
    * exact-Jaccard oracle restricted to pairs touching the new side
    * (crossing pairs AND new-new pairs, the intra-batch population) is
    * the ground truth (LSH ≡ exact at these band parameters, as for
    * q_minhash_lsh). */
  def qDedupGate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    duplicates(
      docs.filter(col("doc_id") % 4 === 0),
      docs.filter(col("doc_id") % 4 =!= 0))
      .orderBy(col("new_doc"), col("dup_of"))
  }

  // ------------------------------------------- embedding-side gate

  /** Corpus snapshot pre-processed for the embedding gate: slim SRP
    * band index + vectors with precomputed norms. [[absorb]] extends
    * it with admitted vectors between snapshots (same increment-
    * checkpoint discipline as [[TextIndex.absorb]]). */
  final case class EmbedIndex(bands: DataFrame, vecs: DataFrame) {
    def absorb(admittedVecs: DataFrame): EmbedIndex = {
      import graft.functions.VectorFunctions.norm2Exact
      val vA = admittedVecs.select(col("vec_id"), col("embedding"),
        norm2Exact(col("embedding")).as("n2")).localCheckpoint(false)
      EmbedIndex(
        bands.unionAll(embedBands(vA).localCheckpoint(false)),
        vecs.unionAll(vA))
    }

    /** See [[TextIndex.collapsed]] — same plan-width reset. */
    def collapsed: EmbedIndex = EmbedIndex(
      bands.localCheckpoint(false),
      vecs.localCheckpoint(false))
  }

  private def embedBands(vecs: DataFrame): DataFrame = {
    import graft.functions.expressions.SrpBands.srp_bands
    vecs.select(col("vec_id"),
      posexplode(srp_bands(col("embedding"))).as(Seq("band_id", "band_val")))
  }

  def indexEmbedCorpus(corpusVecs: DataFrame): EmbedIndex = {
    import graft.functions.VectorFunctions.norm2Exact
    EmbedIndex(
      embedBands(corpusVecs).localCheckpoint(false),
      corpusVecs.select(col("vec_id"), col("embedding"),
        norm2Exact(col("embedding")).as("n2")).localCheckpoint(false))
  }

  /** New embeddings vs the index AND vs each other: semantic near-dup
    * hits at [[Dedup.CosineThreshold]] — DISTINCT candidate pairs from
    * the SRP band-bucket join against the corpus index unioned with
    * the intra-batch self-join (higher vec_id flagged, keep-lowest-id),
    * then [[Dedup.cosineVerify]]'s two-stage verify once per pair
    * (vectors joined back for candidates only). */
  def embedDuplicates(newVecs: DataFrame, corpus: EmbedIndex): DataFrame = {
    import graft.functions.VectorFunctions.norm2Exact
    val vecsNew = newVecs.select(col("vec_id"), col("embedding"),
      norm2Exact(col("embedding")).as("n2")).localCheckpoint(false)
    val bandsNew = embedBands(vecsNew).localCheckpoint(false)
    val candCorpus = bandsNew
      .join(corpus.bands.select(col("vec_id").as("dup_of"),
        col("band_id"), col("band_val")), Seq("band_id", "band_val"))
      .select(col("vec_id").as("va"), col("dup_of").as("vb"))
    val candIntra = bandsNew.as("x").join(bandsNew.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.vec_id") > col("y.vec_id"))
      .select(col("x.vec_id").as("va"), col("y.vec_id").as("vb"))
    val cand = candCorpus.unionAll(candIntra).distinct()
    val corpusIds = corpus.vecs.select(col("vec_id"))
    val vecsB = corpus.vecs.select(col("vec_id"), col("embedding"), col("n2"))
      .unionAll(vecsNew.join(corpusIds, Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("embedding"), col("n2")))
    val pairRows = cand
      .join(vecsNew.select(col("vec_id").as("va"), col("embedding").as("ea"),
        col("n2").as("n2a")), "va")
      .join(vecsB.select(col("vec_id").as("vb"), col("embedding").as("eb"),
        col("n2").as("n2b")), "vb")
    Dedup.cosineVerify(pairRows)
      .select(col("va").as("new_vec"), col("vb").as("dup_of"), col("cosine"))
  }

  def embedDuplicates(newVecs: DataFrame, corpusVecs: DataFrame): DataFrame =
    embedDuplicates(newVecs, indexEmbedCorpus(corpusVecs))

  /** Cross-batch state of a running embedding gate — the semantic twin
    * of [[TextGateState]] (growing SRP index + exactly-once absorb
    * guard), extracted for the same unit-testability. */
  final class EmbedGateState(corpusVecs: DataFrame,
      pairTable: Option[String] = None,
      collapseEvery: Int = CollapseEvery) {
    @volatile private var corpus = indexEmbedCorpus(corpusVecs)
    private var absorbsSinceCollapse = 0
    private val absorbedBatches =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()

    /** Current index (corpus snapshot + absorbed increments). */
    def index: EmbedIndex = corpus

    /** One micro-batch — see [[TextGateState.process]]. */
    def process(df: DataFrame, id: Long, sink: (DataFrame, Long) => Unit): Unit = {
      val batch = df.localCheckpoint(false)
      val dups = embedDuplicates(batch, corpus).localCheckpoint(false)
      sink(dups, id)
      // see TextGateState.process: self-hits reported, never persisted
      pairTable.foreach(t => Dedup.appendPairs(df.sparkSession, t,
        dups.filter(col("new_vec") =!= col("dup_of"))
          .select(col("new_vec").as("doc_a"), col("dup_of").as("doc_b"))))
      if (absorbedBatches.add(id)) {
        val admitted = batch.join(
          dups.select(col("new_vec").as("vec_id")).distinct(),
          Seq("vec_id"), "left_anti")
        corpus = corpus.absorb(admitted)
        absorbsSinceCollapse += 1
        if (absorbsSinceCollapse >= collapseEvery) {
          corpus = corpus.collapsed
          absorbsSinceCollapse = 0
        }
      }
    }
  }

  /** Start the embedding gate — same foreachBatch + absorb + optional
    * pair-table maintenance shape as [[start]]; `pairTable` receives
    * SRP hits (the semantic twin of the text gate's maintenance). */
  def startEmbed(
      newVecs: DataFrame,
      corpusVecs: DataFrame,
      checkpointDir: String,
      sink: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.ProcessingTime(0),
      pairTable: Option[String] = None): StreamingQuery = {
    val state = new EmbedGateState(corpusVecs, pairTable)
    newVecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, id: Long) => state.process(df, id, sink) }
      .start()
  }

  /** Batch analog for the oracle: vec_id % 4 == 0 as ONE "new" batch
    * against the rest — the full SRP chain restricted to pairs
    * touching the new side (crossing AND new-new) is the ground
    * truth. */
  def qEmbedGate(s: SparkSession, d: String): DataFrame = {
    val vecs = Tables.embeddings(s, d)
    embedDuplicates(
      vecs.filter(col("vec_id") % 4 === 0),
      vecs.filter(col("vec_id") % 4 =!= 0))
      .orderBy(col("new_vec"), col("dup_of"))
  }
}
