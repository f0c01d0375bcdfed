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
  *     each increment is checkpointed once and unioned in, so
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
  * the arms back into one checkpointed frame each AND unpersists the
  * superseded arms' blocks immediately (no ContextCleaner-lag double
  * footprint), so plan width and memory are bounded in code regardless
  * of snapshot cadence; docs/SCALE.md records the cadence math.
  *
  * ==The 100 TB verify stage: disk-backed corpus content==
  *
  * Candidates come from equi-joins on the band key against a SLIM
  * index (3 ints per corpus band). Exact verification (shared-shingle
  * Jaccard / two-stage cosine, the shared [[Dedup.jaccardOnPairs]] /
  * [[Dedup.cosineVerify]] helpers so gate and batch semantics cannot
  * drift) needs the CONTENT — shingle sets / vectors — of candidate
  * dup_of docs only. Holding that content as cluster-memory frames and
  * joining candidates into ALL of it (the pre-round-9 shape) is a full
  * corpus pass per trigger at 100 TB. The scale path is
  * [[indexCorpusDisk]] / [[indexEmbedCorpusDisk]]: corpus content
  * lives in a doc-id-BUCKETED on-disk table (the [[Dedup.pairIndex]]
  * layout, [[graft.sources.Writers.writeBucketed]]), and each batch's
  * verify reads it through `doc_id IN (candidate ids)` — the id list
  * is collected per batch (bounded: O(batch x band fan-out), the same
  * order as the batch already held on the driver's heap as a plan, and
  * the same bounded-collect discipline as
  * [[ReportPipeline.DurableKeyedUpsertSink]]'s affected-bucket list),
  * and the In-predicate engages BUCKET PRUNING (`SelectedBucketsCount`
  * in the scan, pinned by `DiskGateSpec`) plus parquet row-group
  * skipping on the in-bucket-sorted id — per-batch verify I/O is
  * O(candidates), not O(corpus). Admitted docs are APPENDED to the
  * table (same bucket spec, catalog-enforced) so later batches verify
  * against them too; [[graft.sources.Writers.compactBucketed]] folds
  * the append accretion between snapshots. The in-memory index
  * ([[indexCorpus]]) remains for harness-scale tests and runs the SAME
  * pruned-verify code path — only the storage differs.
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
  * Same-id pairs are NOT excluded on the corpus join: a re-ingested
  * document whose id already exists in the corpus is still
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

  /** Buckets for the on-disk corpus content tables (shingles /
    * vectors). Harness-sized like [[Dedup.PairIndexBuckets]]; at
    * 100 TB raise with corpus so one bucket stays executor-sized —
    * verify cost per batch is unchanged (bucket pruning reads only
    * candidate ids' buckets either way). */
  val GateCorpusBuckets = 8

  /** Drop the localCheckpoint blocks backing `dfs` NOW instead of
    * waiting for driver GC + ContextCleaner lag (the transient 2x
    * index footprint flagged in round-8 advice). Matches only
    * checkpointed leaves (LogicalRDD); a disk-backed table scan has
    * none and is untouched. Callers must pass only frames whose
    * content is no longer reachable from any live plan — a local
    * checkpoint has no lineage to recompute from. */
  private[graft] def unpersistCheckpoints(dfs: DataFrame*): Unit =
    dfs.foreach(_.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
      case _ => ()
    })

  /** The bucket-pruned verify read, planned in a CLONED session with
    * `autoBucketedScan` off. Two load-bearing details, both measured
    * on Spark 4.1.2 (DiskGateSpec pins the plan):
    *  - a bare id-filter scan under the default conf is stripped of
    *    its bucketed-scan status by DisableUnnecessaryBucketedScan
    *    (no distribution-needing parent), and with it Spark drops
    *    BUCKET PRUNING at runtime — the scan reads every file of the
    *    table (measured numFiles = all). Planning under
    *    autoBucketedScan=false keeps `SelectedBucketsCount` and the
    *    read touches only the candidate ids' buckets.
    *  - the conf must not leak: it lives in a cloned session (same
    *    SparkContext + shared catalog, isolated SQL conf — the
    *    compactBucketed discipline), and the caller materializes the
    *    result eagerly so the final verify query — planned in the
    *    GATE's session, under its conf — consumes a checkpointed
    *    O(candidates) leaf, not a subtree that would be re-planned
    *    without the pruning. */
  private[graft] def prunedTableRead(s: SparkSession, table: String,
      idCol: String, ids: Seq[Long], cols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    s2.table(table).select(cols: _*).filter(col(idCol).isin(ids: _*))
  }

  /** Largest candidate-id list the verify stage will COLLECT to the
    * driver and replay as an In-predicate (the bucket-pruned read
    * path). Beyond it the gate degrades PREDICTABLY to a join-based
    * verify — one streaming semi-join pass over the corpus content,
    * no driver rows at all — instead of building a multi-million-
    * literal plan that exhausts the driver (the documented weak-
    * threshold dup-storm case). 100k longs is ~1 MB on the driver and
    * a hash-set InSet at execution: well inside the collect discipline
    * the gates already rely on. `@volatile var` so a deployment (or a
    * spec) can tune it; the fallback changes the ACCESS PATH only —
    * hit sets are identical (CandidateCapSpec pins both). */
  @volatile var MaxVerifyIds: Int = 100000

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Distinct candidate ids, collected iff there are at most
    * [[MaxVerifyIds]] of them (the limit bounds the transfer BEFORE
    * the driver materializes anything); None = over the cap, caller
    * must take the join-based verify path. */
  private def collectIdsCapped(cand: DataFrame, idCol: String): Option[Seq[Long]] = {
    val ids = cand.select(col(idCol)).distinct().limit(MaxVerifyIds + 1)
      .collect().map(_.getLong(0)).toSeq
    if (ids.size <= MaxVerifyIds) Some(ids)
    else {
      log.warn(s"gate verify: > $MaxVerifyIds distinct candidate ids — " +
        "falling back to join-based verify (one corpus-content pass this " +
        "batch). Persistent storms mean the banding admits too much: switch " +
        "to a stricter EmbedBanding or widen text bands.")
      None
    }
  }

  /** Corpus snapshot pre-processed for the text gate: shingle content
    * (in-memory frame OR bucketed on-disk table — `table` set) and the
    * slim band index. [[absorb]] extends it with admitted docs between
    * snapshots. (Set SIZES are recomputed from the pruned shingle rows
    * at verify time — `count(*)` over rows that are distinct per doc
    * by construction — so no sizes frame is maintained.) */
  final case class TextIndex(sh: DataFrame, bands: DataFrame,
      table: Option[String] = None) {

    /** Verify-stage read: shingle rows for exactly `ids`. On a
      * disk-backed index the In-predicate on the bucket column engages
      * bucket pruning + row-group skipping and the (O(candidates))
      * result is materialized eagerly — see [[prunedTableRead]] for
      * why; on the in-memory index it is a partition-local filter of
      * the checkpointed frame. */
    def shinglesFor(ids: Seq[Long]): DataFrame = table match {
      case Some(t) =>
        prunedTableRead(sh.sparkSession, t, "doc_id", ids,
          Seq(col("doc_id"), col("shingle"))).localCheckpoint(true)
      case None =>
        sh.select(col("doc_id"), col("shingle"))
          .filter(col("doc_id").isin(ids: _*))
    }

    /** The over-[[MaxVerifyIds]] form of [[shinglesFor]]: a semi-join
      * of the content against the candidate-id frame — one streaming
      * pass over the corpus content (bucketed scan on a disk index,
      * shuffle on the SLIM id side only), nothing on the driver.
      * Costlier per batch than the pruned read, but bounded and
      * predictable — the degradation path for dup storms. */
    def shinglesForJoin(idsDf: DataFrame): DataFrame = {
      val content = table match {
        case Some(t) => sh.sparkSession.table(t)
        case None => sh
      }
      content.select(col("doc_id"), col("shingle"))
        .join(idsDf.select(col(idsDf.columns.head).as("doc_id")), Seq("doc_id"),
          "left_semi")
    }

    /** Fold admitted docs in so later batches see them: the increment
      * is checkpointed ONCE, eagerly (so the source batch frame can be
      * dropped by the caller), and unioned into the slim frames;
      * disk-backed content is APPENDED to the bucketed table (same
      * spec, catalog-enforced) instead of growing a union arm. */
    def absorb(admittedDocs: DataFrame): TextIndex = {
      import graft.functions.TextFunctions.shingles
      val shA = shingles(admittedDocs, "doc_id", "text").localCheckpoint(true)
      val shNext = table match {
        case Some(t) =>
          shA.write.mode("append")
            .bucketBy(GateCorpusBuckets, "doc_id").sortBy("doc_id")
            .saveAsTable(t)
          // refresh the previously-chained session too: its cached
          // file listing does not see this (other-session) append
          sh.sparkSession.catalog.refreshTable(t)
          shA.sparkSession.table(t)
        case None => sh.unionAll(shA)
      }
      val next = TextIndex(shNext,
        bands.unionAll(
          Dedup.lshBands(Dedup.minhashSignatures(shA)).localCheckpoint(true)),
        table)
      // disk mode: shA's content now lives in the table and the bands
      // increment is already materialized — drop it
      if (table.isDefined) unpersistCheckpoints(shA)
      next
    }

    /** Collapse the accumulated union arms into one eagerly
      * checkpointed frame each — content-identical, plan width reset
      * to 1 (a disk-backed `sh` is already a single table scan and is
      * left as-is). Pure: the receiver stays valid; the gate STATE
      * additionally unpersists the superseded arms once the collapsed
      * copy is materialized ([[TextGateState.process]]). */
    def collapsed: TextIndex = TextIndex(
      if (table.isDefined) sh else sh.localCheckpoint(true),
      bands.localCheckpoint(true),
      table)
  }

  def indexCorpus(corpusDocs: DataFrame): TextIndex = {
    import graft.functions.TextFunctions.shingles
    val sh = shingles(corpusDocs, "doc_id", "text").localCheckpoint(false)
    TextIndex(sh,
      Dedup.lshBands(Dedup.minhashSignatures(sh)).localCheckpoint(false))
  }

  /** The 100 TB form of [[indexCorpus]]: corpus shingles land in a
    * doc_id-bucketed, in-bucket-sorted catalog table (replacing any
    * stale one) and only the slim band/size frames stay in cluster
    * memory. The one full corpus pass happens HERE, at gate start —
    * per-batch verify then reads candidate ids' buckets only. In
    * production the table is the batch pipeline's published snapshot;
    * the builder here is the self-contained form. */
  def indexCorpusDisk(corpusDocs: DataFrame, table: String): TextIndex = {
    import graft.functions.TextFunctions.shingles
    val s = corpusDocs.sparkSession
    val sh = shingles(corpusDocs, "doc_id", "text").localCheckpoint(true)
    graft.sources.Writers.replaceBucketed(s, sh, "doc_id", GateCorpusBuckets, table)
    val idx = TextIndex(s.table(table),
      Dedup.lshBands(Dedup.minhashSignatures(sh)).localCheckpoint(true),
      Some(table))
    unpersistCheckpoints(sh) // content now lives in the table
    idx
  }

  /** New docs vs the index AND vs each other: DISTINCT candidate pairs
    * from (a) the new-bands x corpus-bands join and (b) the new-bands
    * self-join (higher id flagged as the newcomer — keep-lowest-id),
    * then exact Jaccard >= 0.5 verified ONCE per pair via
    * [[Dedup.jaccardOnPairs]] (the one definition of formula and
    * threshold). Output (new_doc, dup_of, jaccard), pair-unique.
    *
    * The dup_of side of verification draws from corpus content for ids
    * the corpus holds (a re-ingested id is verified against its CORPUS
    * content — the question the gate answers is "is this a dup of what
    * the corpus already holds") and from the batch's own shingles for
    * intra-batch-only ids — all through [[TextIndex.shinglesFor]], the
    * pruned O(candidates) read (module doc). The candidate id list is
    * a bounded driver collect: O(batch x band fan-out) longs, the
    * same order the driver already holds for the batch itself. */
  def duplicates(newDocs: DataFrame, corpus: TextIndex): DataFrame =
    duplicatesWithScratch(newDocs, corpus)._1

  /** [[duplicates]] plus the per-call checkpoint frames ("scratch") the
    * result plan reads from. A long-running gate must drop those blocks
    * as soon as the batch's verified result is materialized — waiting
    * on driver GC + ContextCleaner accretes O(batch+candidates) blocks
    * per trigger (the round-8 memory-hygiene class of bug). Batch
    * analogs (the q* oracle queries) use the plain [[duplicates]] and
    * let one-shot GC handle it. The scratch list contains ONLY
    * checkpoints created by this call — never the corpus index's own
    * frames (the in-memory shinglesFor path returns a filter OVER the
    * index, which is why shCorpusCand joins the list only in disk
    * mode, where it is a fresh checkpoint). */
  private def duplicatesWithScratch(
      newDocs: DataFrame, corpus: TextIndex): (DataFrame, Seq[DataFrame]) = {
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
    // checkpointed: the candidate set feeds the id collect AND the
    // shared-shingle join — band joins must not run twice
    val cand = candCorpus.unionAll(candIntra).distinct().localCheckpoint(false)
    // dup_of-side content, candidate ids ONLY: corpus content first
    // (bucket-pruned on a disk index), batch shingles for the ids the
    // corpus lacks; sizes recomputed from the same pruned rows
    // (shingles() is distinct per doc, so count == set size). The id
    // collect is capped — a dup storm over MaxVerifyIds degrades to
    // the join-based read instead of exhausting the driver.
    // (shCandScratch: the paths that create a FRESH checkpoint — the
    // disk-mode pruned read, or the fallback join which is always
    // materialized once so the corpus pass cannot run twice — must
    // hand it to the caller's cleanup; the in-memory pruned path is a
    // filter OVER the index and owns no blocks)
    val (shCorpusCand, shCandScratch) =
      collectIdsCapped(cand, "doc_b") match {
        case Some(bIds) =>
          val df = corpus.shinglesFor(bIds)
          (df, if (corpus.table.isDefined) Seq(df) else Nil)
        case None =>
          val df = corpus.shinglesForJoin(
            cand.select(col("doc_b")).distinct()).localCheckpoint(true)
          (df, Seq(df))
      }
    val corpusCandIds = shCorpusCand.select(col("doc_id")).distinct()
    val shB = shCorpusCand.unionAll(
      shNew.join(corpusCandIds, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("shingle")))
    val sizesB = shB.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val sizesNew = Dedup.shingleSizes(shNew)
    val shared = cand
      .join(shNew.select(col("doc_id").as("doc_a"), col("shingle")), "doc_a")
      .join(shB.select(col("doc_id").as("doc_b"), col("shingle")),
        Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
    val result = Dedup.jaccardOnPairs(shared, sizesNew, sizesB)
      .select(col("doc_a").as("new_doc"), col("doc_b").as("dup_of"), col("jaccard"))
    (result, Seq(shNew, bandsNew, cand) ++ shCandScratch)
  }

  def duplicates(newDocs: DataFrame, corpusDocs: DataFrame): DataFrame =
    duplicates(newDocs, indexCorpus(corpusDocs))

  /** The cross-batch mutable state of a running text gate — the
    * growing corpus index plus the exactly-once absorption guard —
    * extracted from [[start]]'s foreachBatch so the absorb path is
    * unit-testable without a streaming harness. One instance per gate;
    * [[process]] is what foreachBatch invokes per micro-batch.
    * `corpusTable` switches the index to the disk-backed 100 TB form
    * ([[indexCorpusDisk]]); the gate is the single writer of that
    * table for its lifetime. */
  final class TextGateState(corpusDocs: DataFrame,
      pairTable: Option[String] = None,
      collapseEvery: Int = CollapseEvery,
      corpusTable: Option[String] = None) {
    @volatile private var corpus = corpusTable
      .map(t => indexCorpusDisk(corpusDocs, t))
      .getOrElse(indexCorpus(corpusDocs))
    private var absorbsSinceCollapse = 0
    private val absorbedBatches =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()

    /** Current index (corpus snapshot + absorbed increments). */
    def index: TextIndex = corpus

    /** One micro-batch: verify dups, sink them, maintain the pair
      * table, then absorb the batch's admitted docs. Absorption is
      * exactly-once per batch id — a replayed batch (at-least-once
      * foreachBatch) re-emits its hits but never re-absorbs, so the
      * index cannot double-count shingles. The batch, dup, and
      * per-call scratch frames are checkpointed eagerly and
      * unpersisted before return — per-batch blocks never wait on
      * driver GC. Consequence for `sink`: it must fully CONSUME the
      * frame it is handed before returning (collect/write inside the
      * call, the normal foreachBatch discipline) — a sink that defers
      * reading to after process() returns would find the lineage-free
      * checkpoint blocks already dropped. */
    def process(df: DataFrame, id: Long, sink: (DataFrame, Long) => Unit): Unit = {
      // batch ids deduped at the boundary (round-21, ADVICE r20): an
      // at-least-once source can re-deliver a doc WITHIN one batch
      // frame, and shingles()' per-id distinctness is row-local — a
      // duplicate id row would double-count shared shingles and skew
      // the verified Jaccard. One tiny batch-sized exchange; unique-id
      // batches (the normal case) are row-identical after it.
      val batch = df.dropDuplicates("doc_id").localCheckpoint(true)
      val (dupsRaw, scratch) = duplicatesWithScratch(batch, corpus)
      val dups = dupsRaw.localCheckpoint(true)
      // the eager checkpoint above materialized the result — the
      // call's scratch checkpoints are dead now; drop them
      unpersistCheckpoints(scratch: _*)
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
          val old = corpus
          corpus = old.collapsed // eager: new copies exist before...
          // ...the superseded arms (snapshot + increments) are dropped
          unpersistCheckpoints(old.sh, old.bands)
          // fold the content table's append accretion on the same
          // cadence: the gate is the table's single writer and
          // process() its only reader, so the two-statement catalog
          // swap inside compactBucketed has no concurrent observer —
          // exactly the maintenance window the compaction contract
          // asks for. Refresh the scan afterwards (new table files).
          corpusTable.foreach { t =>
            graft.sources.Writers.compactBucketed(df.sparkSession, t)
            corpus = corpus.copy(sh = df.sparkSession.table(t))
          }
          absorbsSinceCollapse = 0
        }
      }
      unpersistCheckpoints(batch, dups)
    }
  }

  /** Start the gate: raw new docs stream into foreachBatch against the
    * corpus index, which GROWS by each batch's admitted docs (see the
    * module doc's three populations). `pairTable`, when set, receives
    * every hit via [[Dedup.appendPairs]]; `corpusTable` switches the
    * corpus content to the disk-backed bucketed table (the 100 TB
    * posture — module doc). */
  def start(
      newDocs: DataFrame,
      corpusDocs: DataFrame,
      checkpointDir: String,
      sink: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.ProcessingTime(0),
      pairTable: Option[String] = None,
      corpusTable: Option[String] = None): StreamingQuery = {
    val state = new TextGateState(corpusDocs, pairTable, CollapseEvery, corpusTable)
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

  /** [[qDedupGate]] through the DISK-backed index — same result set
    * (same oracle SQL), but the verify stage reads the bucketed
    * on-disk shingle table bucket-pruned: the query-level proof that
    * the 100 TB gate posture is semantics-preserving. */
  def qDedupGateDisk(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    duplicates(
      docs.filter(col("doc_id") % 4 === 0),
      indexCorpusDisk(docs.filter(col("doc_id") % 4 =!= 0),
        gateTableName("sh", d)))
      .orderBy(col("new_doc"), col("dup_of"))
  }

  /** Deterministic per-corpus table name for the gate content tables
    * (the shared [[graft.sources.Writers.tableDigest]] scheme). */
  private[graft] def gateTableName(kind: String, d: String): String =
    s"graft_gate_${kind}_${graft.sources.Writers.tableDigest(d)}"

  // ------------------------------------------- embedding-side gate

  /** SRP banding + threshold configuration for the embedding gate —
    * the selectivity dial ([[Dedup.srpWideBands]]) made a first-class
    * gate parameter. The two shipped configs are the two operating
    * points the batch queries already prove out:
    *  - [[EmbedBanding.Narrow]]: 40 x 4-bit bands at the harness's
    *    weak 0.4 threshold — full recall, but candidate volume is
    *    quadratic on an isotropic corpus (the documented
    *    [[Dedup.qEmbedNearDupLsh]] artifact). Harness/oracle config.
    *  - [[EmbedBanding.Strict]]: 20 x 8-bit bands x 2 offset layouts
    *    at the realistic 0.7 threshold ([[Dedup.qEmbedNearDupStrict]])
    *    — measured 6.5x candidate reduction at full recall. THE 100 TB
    *    config: candidate volume tracks true near-dup density, so
    *    per-trigger verify stays O(batch x dup density) at any corpus
    *    size (the sf1 egate probe in Bench is the standing record).
    *  - [[EmbedBanding.Deep]]: 10 x 16-bit bands x 4 layouts x 3
    *    independent hash families at 0.7 ([[Dedup.qEmbedNearDupDeep]])
    *    — the operating point for NOISE-DOMINATED corpora, where even
    *    strict's 8-bit bands admit a quadratic random background
    *    (1/256 per band): 16-bit bands admit 1/65536, and the recall
    *    lost to the narrower net is bought back with extra seeded
    *    signatures ([[Dedup.DeepSeeds]]) instead of more (correlated)
    *    rotation layouts.
    * `group`/`offsets` feed [[Dedup.srpWideBands]] per layout per
    * seed; `threshold` feeds [[Dedup.cosineVerify]]. The hash-family
    * index is folded into the `layout` band-row column
    * (`sigId * group + offset` — injective since offsets < group), so
    * the index schema, absorb increments, and every band join are
    * family-aware without a schema change. */
  final case class EmbedBanding(threshold: Double, group: Int, offsets: Seq[Int],
      seeds: Seq[Long] = Seq(Dedup.DefaultSeed)) {
    // the layout fold is injective ONLY while offsets stay inside
    // [0, group): a violating config would silently alias band rows
    // of different hash families into one band space (false candidates
    // the exact verify then hides as pure wasted I/O) — fail fast
    // instead. offset >= group is also never useful: offset and
    // offset % group produce the same quarter partition, renumbered.
    require(offsets.nonEmpty && offsets.forall(o => o >= 0 && o < group),
      s"offsets must lie in [0, group=$group) for the family-layout fold: $offsets")
    require(seeds.nonEmpty && seeds.distinct == seeds,
      s"seeds must be non-empty and distinct: $seeds")
  }
  object EmbedBanding {
    val Narrow = EmbedBanding(Dedup.CosineThreshold, 1, Seq(0))
    val Strict = EmbedBanding(Dedup.StrictThreshold, Dedup.StrictBandGroup,
      Dedup.StrictBandOffsets)
    val Deep = EmbedBanding(Dedup.StrictThreshold, Dedup.DeepBandGroup,
      Dedup.DeepBandOffsets, Dedup.DeepSeeds)

    /** The escalation ladder the config docs describe in prose:
      * narrow -> strict -> deep; deep is the deepest config. */
    def next(b: EmbedBanding): Option[EmbedBanding] =
      if (b == Narrow) Some(Strict)
      else if (b == Strict) Some(Deep)
      else None
  }

  /** Candidate-rate fraction above which a banding config is judged
    * to be failing to prune: candidates per (batch x corpus) cross
    * pair. Calibrated against the measured operating points — strict
    * banding on an isotropic corpus admits ~40/256 = 15% of cross
    * pairs (8-bit-band random background, SCALE.md), deep admits
    * ~0.4%; a real dup-density-tracking rate sits well below 5%. */
  val EscalationRate = 0.05

  /** Consecutive over-rate batches before the wire trips — one noisy
    * batch is not a regime; three in a row is. */
  val EscalationPatience = 3

  /** Measured-candidate-rate trip wire for the embed gate's banding
    * choice ([[EmbedBanding]]) — turns "strict for clustered corpora,
    * deep for noise-dominated" from operator knowledge into a runtime
    * signal. Each batch reports its candidate-pair count and the
    * batch/corpus sizes; when the candidate fraction of the cross
    * space exceeds [[EscalationRate]] for [[EscalationPatience]]
    * consecutive batches, the monitor logs once and recommends the
    * next-deeper banding ([[EmbedBanding.next]]). The gate does NOT
    * hot-swap the index (bands are derived under the current banding;
    * re-banding is an index rebuild) — the operator restarts the gate
    * with [[advice]]'s config, which is the cheap part of the
    * decision; detecting the regime is the part that needs data. */
  final class BandingMonitor(banding: EmbedBanding,
      rateThreshold: Double = EscalationRate,
      patience: Int = EscalationPatience) {
    private var hot = 0
    @volatile private var tripped: Option[EmbedBanding] = None

    /** Standing recommendation (None until the wire trips, or when
      * already at the deepest config). */
    def advice: Option[EmbedBanding] = tripped

    /** Record one batch's measured pruning quality; returns the
      * recommendation exactly when this observation trips the wire. */
    def observe(candidates: Long, batchVecs: Long, corpusVecs: Long): Option[EmbedBanding] = {
      val cross = batchVecs.toDouble * corpusVecs.toDouble
      val rate = if (cross > 0) candidates / cross else 0.0
      hot = if (rate > rateThreshold) hot + 1 else 0
      if (hot >= patience && tripped.isEmpty) {
        tripped = EmbedBanding.next(banding)
        tripped.foreach { _ =>
          System.err.println(f"[graft.gate] banding escalation: candidate rate $rate%.4f > $rateThreshold%.2f for $hot consecutive batches — current banding is pricing the random background; restart the gate with the next-deeper EmbedBanding config")
        }
        tripped
      } else None
    }
  }

  /** Corpus snapshot pre-processed for the embedding gate: slim SRP
    * band index + vector content (in-memory frame OR bucketed on-disk
    * table — `table` set, the 100 TB posture). [[absorb]] extends it
    * with admitted vectors between snapshots (same increment-
    * checkpoint discipline as [[TextIndex.absorb]]). `banding` is the
    * index's band layout — absorbed increments band identically, and
    * [[embedDuplicates]] verifies at its threshold. */
  final case class EmbedIndex(bands: DataFrame, vecs: DataFrame,
      table: Option[String] = None,
      banding: EmbedBanding = EmbedBanding.Narrow) {

    /** Verify-stage read: (vec_id, embedding, n2) for exactly `ids` —
      * bucket-pruned on a disk index ([[TextIndex.shinglesFor]]). */
    def vectorsFor(ids: Seq[Long]): DataFrame = table match {
      case Some(t) =>
        prunedTableRead(vecs.sparkSession, t, "vec_id", ids,
          Seq(col("vec_id"), col("embedding"), col("n2"))).localCheckpoint(true)
      case None =>
        vecs.select(col("vec_id"), col("embedding"), col("n2"))
          .filter(col("vec_id").isin(ids: _*))
    }

    /** Over-[[MaxVerifyIds]] form of [[vectorsFor]] — semi-join
      * against the candidate-id frame ([[TextIndex.shinglesForJoin]]'s
      * degradation contract). */
    def vectorsForJoin(idsDf: DataFrame): DataFrame = {
      val content = table match {
        case Some(t) => vecs.sparkSession.table(t)
        case None => vecs
      }
      content.select(col("vec_id"), col("embedding"), col("n2"))
        .join(idsDf.select(col(idsDf.columns.head).as("vec_id")), Seq("vec_id"),
          "left_semi")
    }

    def absorb(admittedVecs: DataFrame): EmbedIndex = {
      import graft.functions.VectorFunctions.norm2Exact
      val vA = admittedVecs.select(col("vec_id"), col("embedding"),
        norm2Exact(col("embedding")).as("n2")).localCheckpoint(true)
      val vecsNext = table match {
        case Some(t) =>
          vA.write.mode("append")
            .bucketBy(GateCorpusBuckets, "vec_id").sortBy("vec_id")
            .saveAsTable(t)
          // see TextIndex.absorb: keep the old chained session fresh
          vecs.sparkSession.catalog.refreshTable(t)
          vA.sparkSession.table(t)
        case None => vecs.unionAll(vA)
      }
      val next = EmbedIndex(
        bands.unionAll(embedBands(vA, banding).localCheckpoint(true)),
        vecsNext, table, banding)
      if (table.isDefined) unpersistCheckpoints(vA)
      next
    }

    /** See [[TextIndex.collapsed]] — same plan-width reset, pure. */
    def collapsed: EmbedIndex = EmbedIndex(
      bands.localCheckpoint(true),
      if (table.isDefined) vecs else vecs.localCheckpoint(true),
      table, banding)
  }

  /** (vec_id, layout, band_id, band_val) band rows for `vecs` under
    * `banding`: ONE srp_bands signature pass per (vector, hash
    * family) — each signature's alias is referenced by every layout,
    * so CollapseProject keeps it in its own projection (no per-layout
    * recompute) — then each offset layout's [[Dedup.srpWideBands]]
    * re-pack flattened out of a single generate, with the family id
    * folded into `layout` (`sigId * group + offset`). With the Narrow
    * config this is band-for-band the original 40 x 4-bit explode
    * (group=1/offset=0 re-pack is the identity; layout is constant
    * 0). */
  private def embedBands(vecs: DataFrame, banding: EmbedBanding): DataFrame = {
    import graft.functions.expressions.SrpBands.srp_bands
    // Narrow fast path: group=1/offset=0 re-packing is the identity,
    // so skip the wide-band HOF machinery (transform/aggregate lambdas
    // are interpreted, not whole-stage-codegen'd — the module doc's
    // measured 14x HOF tax applies) and keep the original direct
    // codegen posexplode of the signature.
    if (banding.group == 1 && banding.offsets == Seq(0) &&
        banding.seeds == Seq(Dedup.DefaultSeed))
      vecs.select(col("vec_id"), lit(0).as("layout"),
        posexplode(srp_bands(col("embedding"))).as(Seq("band_id", "band_val")))
    else {
      val layoutArrays = banding.seeds.zipWithIndex.flatMap { case (seed, sigId) =>
        banding.offsets.map { off =>
          transform(Dedup.srpWideBands(col(s"sig$sigId"), banding.group, off),
            (v, i) => struct(lit(sigId * banding.group + off).as("layout"),
              i.as("band_id"), v.as("band_val")))
        }
      }
      val sigCols = col("vec_id") +: banding.seeds.zipWithIndex.map {
        case (seed, sigId) => srp_bands(col("embedding"), seed).as(s"sig$sigId")
      }
      vecs.select(sigCols: _*)
        .select(col("vec_id"), explode(flatten(array(layoutArrays: _*))).as("e"))
        .select(col("vec_id"), col("e.layout").as("layout"),
          col("e.band_id").as("band_id"), col("e.band_val").as("band_val"))
    }
  }

  def indexEmbedCorpus(corpusVecs: DataFrame,
      banding: EmbedBanding = EmbedBanding.Narrow): EmbedIndex = {
    import graft.functions.VectorFunctions.norm2Exact
    EmbedIndex(
      embedBands(corpusVecs, banding).localCheckpoint(false),
      corpusVecs.select(col("vec_id"), col("embedding"),
        norm2Exact(col("embedding")).as("n2")).localCheckpoint(false),
      None, banding)
  }

  /** The 100 TB form of [[indexEmbedCorpus]] — vectors (with
    * precomputed norms) land in a vec_id-bucketed catalog table; see
    * [[indexCorpusDisk]]. */
  def indexEmbedCorpusDisk(corpusVecs: DataFrame, table: String,
      banding: EmbedBanding = EmbedBanding.Narrow): EmbedIndex =
    indexEmbedCorpusDiskTimed(corpusVecs, table, banding)._1

  /** [[indexEmbedCorpusDisk]] plus per-stage wall timings (seconds):
    * `norm_ckpt` (norm compute + vector materialization),
    * `bucket_write` (the bucketed corpus table), `band_build` (SRP
    * banding + checkpoint). Bench instrumentation — a build-probe
    * regression decomposes inside the emitted JSON instead of needing
    * a round-over-round guess at which stage moved. */
  private[graft] def indexEmbedCorpusDiskTimed(corpusVecs: DataFrame, table: String,
      banding: EmbedBanding): (EmbedIndex, Seq[(String, Double)]) = {
    import graft.functions.VectorFunctions.norm2Exact
    val s = corpusVecs.sparkSession
    val t0 = System.nanoTime()
    val vecs = corpusVecs.select(col("vec_id"), col("embedding"),
      norm2Exact(col("embedding")).as("n2")).localCheckpoint(true)
    val t1 = System.nanoTime()
    graft.sources.Writers.replaceBucketed(s, vecs, "vec_id", GateCorpusBuckets, table)
    val t2 = System.nanoTime()
    val bands = embedBands(vecs, banding).localCheckpoint(true)
    val t3 = System.nanoTime()
    val idx = EmbedIndex(bands, s.table(table), Some(table), banding)
    unpersistCheckpoints(vecs)
    (idx, Seq("norm_ckpt" -> (t1 - t0) / 1e9,
      "bucket_write" -> (t2 - t1) / 1e9, "band_build" -> (t3 - t2) / 1e9))
  }

  /** New embeddings vs the index AND vs each other: semantic near-dup
    * hits at [[Dedup.CosineThreshold]] — DISTINCT candidate pairs from
    * the SRP band-bucket join against the corpus index unioned with
    * the intra-batch self-join (higher vec_id flagged, keep-lowest-id),
    * then [[Dedup.cosineVerify]]'s two-stage verify once per pair.
    * Vectors are joined back for CANDIDATE ids only, through
    * [[EmbedIndex.vectorsFor]]'s pruned read — O(candidates) verify
    * I/O on a disk index (module doc); corpus content is preferred for
    * re-ingested ids, batch content covers intra-batch-only ids. */
  def embedDuplicates(newVecs: DataFrame, corpus: EmbedIndex): DataFrame =
    embedDuplicatesWithScratch(newVecs, corpus)._1

  /** [[embedDuplicates]] plus the candidate-pair count thunk
    * ([[BandingMonitor]]'s input, surfaced for the bench): the
    * O(candidates) verify claim is only checkable when the candidate
    * count rides alongside the timing. The thunk is cache-local on the
    * already-checkpointed candidate frame — run it AFTER consuming the
    * result, before anything unpersists. */
  private[graft] def embedDuplicatesCounted(newVecs: DataFrame,
      corpus: EmbedIndex): (DataFrame, () => Long) = {
    val (result, _, candCount) = embedDuplicatesWithScratch(newVecs, corpus)
    (result, candCount)
  }

  /** See [[duplicatesWithScratch]] — same per-call cleanup contract.
    * Banding (layout/joins) and verify threshold both come from
    * `corpus.banding`, so a strict-config index verifies strictly.
    * The third element is a lazy candidate-pair count over the (still
    * cached) candidate frame — [[BandingMonitor]] food; callers that
    * don't monitor never pay the extra (cache-local) count job. */
  private def embedDuplicatesWithScratch(
      newVecs: DataFrame, corpus: EmbedIndex): (DataFrame, Seq[DataFrame], () => Long) = {
    import graft.functions.VectorFunctions.norm2Exact
    val vecsNew = newVecs.select(col("vec_id"), col("embedding"),
      norm2Exact(col("embedding")).as("n2")).localCheckpoint(false)
    val bandsNew = embedBands(vecsNew, corpus.banding).localCheckpoint(false)
    val candCorpus = bandsNew
      .join(corpus.bands.select(col("vec_id").as("dup_of"),
        col("layout"), col("band_id"), col("band_val")),
        Seq("layout", "band_id", "band_val"))
      .select(col("vec_id").as("va"), col("dup_of").as("vb"))
    val candIntra = bandsNew.as("x").join(bandsNew.as("y"),
        col("x.layout") === col("y.layout") &&
        col("x.band_id") === col("y.band_id") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.vec_id") > col("y.vec_id"))
      .select(col("x.vec_id").as("va"), col("y.vec_id").as("vb"))
    // checkpointed: feeds the id collect AND the vector join-back
    val cand = candCorpus.unionAll(candIntra).distinct().localCheckpoint(false)
    // capped collect, join-based fallback beyond it — see the text
    // side ([[duplicatesWithScratch]]) for the scratch-tracking note
    val (vecsCorpusCand, vecCandScratch) =
      collectIdsCapped(cand, "vb") match {
        case Some(bIds) =>
          val df = corpus.vectorsFor(bIds)
          (df, if (corpus.table.isDefined) Seq(df) else Nil)
        case None =>
          val df = corpus.vectorsForJoin(
            cand.select(col("vb")).distinct()).localCheckpoint(true)
          (df, Seq(df))
      }
    val corpusCandIds = vecsCorpusCand.select(col("vec_id"))
    val vecsB = vecsCorpusCand.unionAll(
      vecsNew.join(corpusCandIds, Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("embedding"), col("n2")))
    val pairRows = cand
      .join(vecsNew.select(col("vec_id").as("va"), col("embedding").as("ea"),
        col("n2").as("n2a")), "va")
      .join(vecsB.select(col("vec_id").as("vb"), col("embedding").as("eb"),
        col("n2").as("n2b")), "vb")
    val result = Dedup.cosineVerify(pairRows, corpus.banding.threshold)
      .select(col("va").as("new_vec"), col("vb").as("dup_of"), col("cosine"))
    (result, Seq(vecsNew, bandsNew, cand) ++ vecCandScratch, () => cand.count())
  }

  def embedDuplicates(newVecs: DataFrame, corpusVecs: DataFrame): DataFrame =
    embedDuplicates(newVecs, indexEmbedCorpus(corpusVecs))

  /** Cross-batch state of a running embedding gate — the semantic twin
    * of [[TextGateState]] (growing SRP index + exactly-once absorb
    * guard), extracted for the same unit-testability. */
  final class EmbedGateState(corpusVecs: DataFrame,
      pairTable: Option[String] = None,
      collapseEvery: Int = CollapseEvery,
      corpusTable: Option[String] = None,
      banding: EmbedBanding = EmbedBanding.Narrow) {
    @volatile private var corpus = corpusTable
      .map(t => indexEmbedCorpusDisk(corpusVecs, t, banding))
      .getOrElse(indexEmbedCorpus(corpusVecs, banding))
    private var absorbsSinceCollapse = 0
    private val absorbedBatches =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    // escalation trip wire: corpus size is tracked incrementally (one
    // count at init, then +admitted per absorbed batch) — never a
    // per-batch table count
    private val monitor = new BandingMonitor(banding)
    private var corpusN = corpus.vecs.count()

    /** Current index (corpus snapshot + absorbed increments). */
    def index: EmbedIndex = corpus

    /** [[BandingMonitor.advice]] for this gate: Some(deeper config)
      * once the measured candidate rate has tripped the wire. */
    def escalationAdvice: Option[EmbedBanding] = monitor.advice

    /** One micro-batch — see [[TextGateState.process]] (including the
      * synchronous-sink contract). */
    def process(df: DataFrame, id: Long, sink: (DataFrame, Long) => Unit): Unit = {
      val batch = df.localCheckpoint(true)
      val (dupsRaw, scratch, candCount) = embedDuplicatesWithScratch(batch, corpus)
      val dups = dupsRaw.localCheckpoint(true)
      // count candidates while the candidate frame is still cached,
      // then feed the trip wire (batch/corpus counts are cache-local)
      val nCand = candCount()
      unpersistCheckpoints(scratch: _*)
      monitor.observe(nCand, batch.count(), corpusN)
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
        // incremental corpus-size tracking for the trip wire: admitted
        // = batch minus the distinct flagged ids (both frames cached)
        corpusN += batch.count() -
          dups.select(col("new_vec")).distinct().count()
        absorbsSinceCollapse += 1
        if (absorbsSinceCollapse >= collapseEvery) {
          val old = corpus
          corpus = old.collapsed
          unpersistCheckpoints(old.bands, old.vecs)
          // see TextGateState.process: content-table compaction on the
          // collapse cadence, single-writer window
          corpusTable.foreach { t =>
            graft.sources.Writers.compactBucketed(df.sparkSession, t)
            corpus = corpus.copy(vecs = df.sparkSession.table(t))
          }
          absorbsSinceCollapse = 0
        }
      }
      unpersistCheckpoints(batch, dups)
    }
  }

  /** Start the embedding gate — same foreachBatch + absorb + optional
    * pair-table maintenance shape as [[start]]; `pairTable` receives
    * SRP hits (the semantic twin of the text gate's maintenance),
    * `corpusTable` switches to the disk-backed vector table, `banding`
    * picks the operating point ([[EmbedBanding.Strict]] is the
    * production config — module doc). */
  def startEmbed(
      newVecs: DataFrame,
      corpusVecs: DataFrame,
      checkpointDir: String,
      sink: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.ProcessingTime(0),
      pairTable: Option[String] = None,
      corpusTable: Option[String] = None,
      banding: EmbedBanding = EmbedBanding.Narrow): StreamingQuery = {
    val state = new EmbedGateState(corpusVecs, pairTable, CollapseEvery,
      corpusTable, banding)
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

  /** [[qEmbedGate]] through the DISK-backed vector table — same result
    * set (same oracle SQL), verify reads bucket-pruned
    * ([[qDedupGateDisk]]). */
  def qEmbedGateDisk(s: SparkSession, d: String): DataFrame = {
    val vecs = Tables.embeddings(s, d)
    embedDuplicates(
      vecs.filter(col("vec_id") % 4 === 0),
      indexEmbedCorpusDisk(vecs.filter(col("vec_id") % 4 =!= 0),
        gateTableName("vec", d)))
      .orderBy(col("new_vec"), col("dup_of"))
  }

  /** The embedding gate at its PRODUCTION operating point: strict
    * banding ([[EmbedBanding.Strict]] — 8-bit wide SRP bands, two
    * offset layouts, cosine 0.7) over the planted-near-dup corpus
    * ([[Dedup.augmentedEmbeddings]], the clustered structure a real
    * corpus has), through the DISK-backed vector table. This is the
    * config the sf1 egate probe scales: candidate volume tracks true
    * dup density (6.5x below all-pairs, SF-stable), so per-trigger
    * verify I/O stays O(batch x density) at any corpus size — the
    * narrow-config quadratic-candidate artifact
    * ([[Dedup.qEmbedNearDupLsh]] scaladoc) does not apply. Oracle: the
    * strict SRP chain restricted to pairs touching the new side,
    * mirrored bit-identically in SQL. */
  def qEmbedGateStrict(s: SparkSession, d: String): DataFrame = {
    val vecs = Dedup.augmentedEmbeddings(s, d)
    embedDuplicates(
      vecs.filter(col("vec_id") % 4 === 0),
      indexEmbedCorpusDisk(vecs.filter(col("vec_id") % 4 =!= 0),
        gateTableName("svec", d), EmbedBanding.Strict))
      .orderBy(col("new_vec"), col("dup_of"))
  }

  /** The embedding gate at the DEEP operating point
    * ([[EmbedBanding.Deep]] — 16-bit bands, 4 layouts, 3 hash
    * families, cosine 0.7) through the disk-backed vector table. Same
    * ground truth as [[qEmbedGateStrict]] whenever deep recall is full
    * (the batch spec measures exactly that), at a candidate volume
    * that no longer tracks the isotropic all-pairs background — the
    * gate config for noise-dominated corpora, closing the narrow
    * config's quadratic-candidate artifact end-to-end (index, absorb,
    * and per-trigger verify all family-aware via the layout fold).
    * Oracle: the deep SRP chain restricted to pairs touching the new
    * side, mirrored bit-identically in SQL (three weight-matrix
    * literals, one per [[Dedup.DeepSeeds]] family). */
  def qEmbedGateDeep(s: SparkSession, d: String): DataFrame = {
    val vecs = Dedup.augmentedEmbeddings(s, d)
    embedDuplicates(
      vecs.filter(col("vec_id") % 4 === 0),
      indexEmbedCorpusDisk(vecs.filter(col("vec_id") % 4 =!= 0),
        gateTableName("dvec", d), EmbedBanding.Deep))
      .orderBy(col("new_vec"), col("dup_of"))
  }
}
