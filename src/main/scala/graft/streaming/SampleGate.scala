package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextAnalysis

/** Streaming maintenance of the priority sample — the
  * `q_priority_sample` survey sample kept CURRENT as documents
  * arrive, so "give me a weight-proportional sample of everything
  * ingested so far" is served from a (K+1)-row table with no corpus
  * access, the way a 100 TB ingest keeps an always-on survey panel.
  *
  * Same algebra as [[KmvGate]], different sketch: top-(K+1) by
  * (priority desc, doc_id) is COMMUTATIVE, ASSOCIATIVE and
  * IDEMPOTENT under union-then-retake (priorities are pure hashes of
  * (doc_id, n_chars), so a re-presented document reproduces its
  * exact row and the distinct absorbs it). Consequences:
  *  - per-batch absorb = merge the batch's own sketch into the saved
  *    sketch and retake the top-(K+1) — equal to the one-shot sketch
  *    of everything seen, REGARDLESS of trigger chopping (the
  *    `q_priority_stream` oracle is literally `q_priority_sample`'s:
  *    incremental must equal one-shot, hash-for-hash);
  *  - an at-least-once replay converges to the identical table — no
  *    progress marker needed;
  *  - ≤ K+1 rows reach the saved table per trigger; the only
  *    corpus-shaped work is the batch's own bounded aggregation.
  */
object SampleGate {

  /** Saved-table name for a corpus dir (shared digest scheme). */
  def tableName(d: String): String = DedupGate.gateTableName("psample", d)

  /** Merge-then-retake: the top-(K+1) of a ≤ 2(K+1)-row frame —
    * TakeOrderedAndProject on a bounded input, never a corpus sort. */
  private def retake(merged: DataFrame): DataFrame =
    merged.distinct()
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(TextAnalysis.SampleK + 1)

  /** Build (replace) the sketch table from a corpus snapshot. */
  def init(corpusDocs: DataFrame, table: String): Unit = {
    val s = corpusDocs.sparkSession
    val sk = TextAnalysis.prioritySketchOf(corpusDocs)
      .localCheckpoint(true) // materialize BEFORE the drop-and-write
    graft.sources.Writers.replaceTable(s, sk, table)
    DedupGate.unpersistCheckpoints(sk)
  }

  /** Absorb one micro-batch: saved sketch ∪ batch sketch → retake,
    * rewritten in place. Replay-idempotent (see class doc). */
  def absorb(batchDocs: DataFrame, table: String): Unit = {
    val s = batchDocs.sparkSession
    val merged = retake(
      s.table(table).select(col("doc_id"), col("n_chars"), col("priority"))
        .unionByName(TextAnalysis.prioritySketchOf(batchDocs)))
      .localCheckpoint(true)
    graft.sources.Writers.replaceTable(s, merged, table)
    DedupGate.unpersistCheckpoints(merged)
  }

  /** foreachBatch body for a live document stream. */
  def sink(table: String)(batch: DataFrame, batchId: Long): Unit =
    if (!batch.isEmpty) absorb(batch, table)

  /** Serve the ranked sample + estimator weights from the saved
    * sketch — `q_priority_sample`'s exact output, no corpus access. */
  def summary(s: SparkSession, table: String): DataFrame =
    TextAnalysis.prioritySampleFrom(
      s.table(table).select(col("doc_id"), col("n_chars"), col("priority")))

  /** Batch-simulated lifecycle for the driver gate (the %4 split
    * convention): corpus = doc_id%4 ≠ 0 seeds the table, the %4 = 0
    * "stream" arrives as two micro-batches, output = the final
    * sample. Oracle = the ONE-SHOT `q_priority_sample` SQL over all
    * documents — by closure the incremental result must match it
    * hash-for-hash. */
  def qPriorityStream(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val table = tableName(d)
    init(docs.filter(col("doc_id") % 4 =!= 0), table)
    absorb(docs.filter(col("doc_id") % 4 === 0 && col("doc_id") % 8 === 0), table)
    absorb(docs.filter(col("doc_id") % 4 === 0 && col("doc_id") % 8 =!= 0), table)
    summary(s, table)
  }
}
