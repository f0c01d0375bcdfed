package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextAnalysis

/** Streaming maintenance of the per-source KMV bottom-k sketches —
  * the `q_kmv_overlap` sketch surface kept CURRENT as documents
  * arrive, the way a 100 TB ingest keeps its cross-source overlap
  * matrix queryable without re-scanning the corpus.
  *
  * The whole design rides on one algebraic fact (pinned by
  * KmvSketchSpec's closure test): bottom-K union is COMMUTATIVE,
  * ASSOCIATIVE and IDEMPOTENT. Consequences, in order of value:
  *  - per-batch absorb = merge the batch's sketch into the saved
  *    sketch and re-take bottom-K — the result equals the batch
  *    sketch of everything seen so far, REGARDLESS of how the stream
  *    was chopped into triggers (the `q_kmv_stream` oracle checks
  *    exactly this: incremental == one-shot, hash-for-hash);
  *  - an at-least-once REPLAY of a batch converges to the identical
  *    table, so unlike the exactly-once Kafka sink ([[KafkaEosSink]])
  *    no progress marker is needed — idempotence, not transactions,
  *    closes the replay window;
  *  - the absorb input is the batch's OWN bottom-K per source, so
  *    what reaches the saved table is ≤ |sources|·K rows per trigger
  *    no matter how large the trigger batch is.
  *
  * Scale posture: the saved table is |sources|·K rows — broadcast
  * scale at any corpus size. Per trigger the only corpus-shaped work
  * is the batch's own hash fan-out; everything downstream is sketch
  * algebra on bounded frames. Pair overlap estimates are then served
  * from the table alone (no corpus access) by re-using the
  * `q_kmv_overlap` pair algebra.
  */
object KmvGate {

  /** Saved-table name for a corpus dir (shared digest scheme). */
  def tableName(d: String): String = DedupGate.gateTableName("kmv", d)

  /** Build (replace) the sketch table from a corpus snapshot. */
  def init(corpusDocs: DataFrame, table: String): Unit = {
    val s = corpusDocs.sparkSession
    val sk = TextAnalysis.kmvSketch(TextAnalysis.kmvHashesOf(corpusDocs))
      .localCheckpoint(true) // materialize BEFORE the drop-and-write
    graft.sources.Writers.replaceTable(s, sk, table)
    DedupGate.unpersistCheckpoints(sk)
  }

  /** Absorb one micro-batch: saved sketch ∪ batch sketch → bottom-K,
    * rewritten in place. Replay-idempotent (see class doc); the eager
    * localCheckpoint breaks the read-from-the-table-being-replaced
    * cycle, and its blocks are released immediately after the write. */
  def absorb(batchDocs: DataFrame, table: String): Unit = {
    val s = batchDocs.sparkSession
    val merged = TextAnalysis.kmvSketch(
      s.table(table).select(col("source"), col("h"))
        .unionByName(TextAnalysis.kmvHashesOf(batchDocs))
        .distinct())
      .localCheckpoint(true)
    graft.sources.Writers.replaceTable(s, merged, table)
    DedupGate.unpersistCheckpoints(merged)
  }

  /** foreachBatch body for a live document stream. */
  def sink(table: String)(batch: DataFrame, batchId: Long): Unit =
    if (!batch.isEmpty) absorb(batch, table)

  /** Per-source sketch summary from the saved table: (source, n_sk,
    * h_k, est) — the serving read, no corpus access. The estimator is
    * the `q_kmv_overlap` arithmetic (Decimal(38,0) floor division). */
  def summary(s: SparkSession, table: String): DataFrame = {
    val estCol = when(col("n_sk") < TextAnalysis.KmvK, col("n_sk"))
      .otherwise(expr(
        s"cast(${TextAnalysis.KmvK - 1} as decimal(38,0)) * ${TextAnalysis.KmvSpace} div h_k"))
    s.table(table)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sk"), max(col("h")).as("h_k"))
      .select(col("source"), col("n_sk"), col("h_k"), estCol.as("est"))
      .orderBy(col("source"))
  }

  /** Batch-simulated lifecycle for the driver gate (the %4 split
    * convention of the other gates): corpus = doc_id%4 ≠ 0 seeds the
    * table, the %4 = 0 "stream" arrives as two micro-batches absorbed
    * sequentially, and the output is the final table's summary. The
    * oracle computes the ONE-SHOT sketch over ALL documents — by
    * closure the incremental result must match it hash-for-hash,
    * which is the entire claim of this gate. */
  def qKmvStream(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val table = tableName(d)
    init(docs.filter(col("doc_id") % 4 =!= 0), table)
    absorb(docs.filter(col("doc_id") % 4 === 0 && col("doc_id") % 8 === 0), table)
    absorb(docs.filter(col("doc_id") % 4 === 0 && col("doc_id") % 8 =!= 0), table)
    summary(s, table)
  }
}
