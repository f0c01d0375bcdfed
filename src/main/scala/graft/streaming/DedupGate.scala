package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.Tables
import graft.operators.Dedup

/** STREAMING dedup gates — the online-ingestion form of the near-dup
  * paths for BOTH modalities: new documents/embeddings arrive as a
  * stream and are checked against a corpus snapshot before admission,
  * the gate a production training pipeline runs at ingestion time
  * (batch dedup cleans the corpus; this keeps it clean).
  *
  * Shape: the stream feeds foreachBatch, and each micro-batch runs the
  * SAME codegen'd operators as the batch LSH paths
  * ([[Dedup.minhashSignatures]] / [[Dedup.lshBands]] over exploded
  * shingles; [[graft.functions.expressions.SrpBands]]) against a
  * corpus index that is built ONCE at gate start and localCheckpointed
  * — the per-batch work touches only the new-docs side plus candidate
  * verification. foreachBatch (not an append-mode streaming DAG) is
  * load-bearing twice over: the signature build and candidate dedup
  * are aggregations a stateless append stream cannot host, and a
  * per-row array-HOF signature (transform/array_min lambdas) is
  * CodegenFallback-interpreted — measured 14x slower than the
  * exploded+grouped build on the same data. The gates hold no
  * streaming state, so they run forever without growth.
  *
  * Scale shape: candidates come from an equi join on the band key
  * against a SLIM index (3 ints per corpus band; at 100 TB a bucketed
  * on-disk table of [[Dedup.pairIndex]]'s kind), and the exact
  * verification (shared-shingle Jaccard / two-stage cosine, both THE
  * shared helpers [[Dedup.jaccardOnPairs]] / [[Dedup.cosineVerify]] so
  * gate and batch semantics cannot drift) touches only candidate doc
  * ids. Same-id pairs are NOT excluded: a re-ingested document whose
  * id already exists in the corpus is still content-checked — "already
  * admitted" is exactly what a gate must report. */
object DedupGate {

  /** Corpus snapshot pre-processed for the text gate: shingle rows,
    * slim band index, and set sizes — built once, localCheckpointed,
    * shared across every micro-batch. */
  final case class TextIndex(sh: DataFrame, bands: DataFrame, sizes: DataFrame)

  def indexCorpus(corpusDocs: DataFrame): TextIndex = {
    import graft.functions.TextFunctions.shingles
    val sh = shingles(corpusDocs, "doc_id", "text").localCheckpoint(false)
    TextIndex(sh,
      Dedup.lshBands(Dedup.minhashSignatures(sh)).localCheckpoint(false),
      Dedup.shingleSizes(sh).localCheckpoint(false))
  }

  /** New docs vs a prebuilt corpus index: DISTINCT candidate pairs
    * from the slim band-bucket join, then exact Jaccard >= 0.5
    * verified ONCE per pair via [[Dedup.jaccardOnPairs]] (the one
    * definition of formula and threshold). Output (new_doc, dup_of,
    * jaccard), pair-unique. */
  def duplicates(newDocs: DataFrame, corpus: TextIndex): DataFrame = {
    import graft.functions.TextFunctions.shingles
    // the new-docs shingle set feeds bands + shared-count + sizes —
    // same materialize-once rationale as qMinhashLsh
    val shNew = shingles(newDocs, "doc_id", "text").localCheckpoint(false)
    val cand = Dedup.lshBands(Dedup.minhashSignatures(shNew))
      .join(corpus.bands.select(col("doc_id").as("dup_of"),
        col("band_id"), col("band_hash")), Seq("band_id", "band_hash"))
      .select(col("doc_id").as("doc_a"), col("dup_of").as("doc_b"))
      .distinct()
    val shared = cand
      .join(shNew.select(col("doc_id").as("doc_a"), col("shingle")), "doc_a")
      .join(corpus.sh.select(col("doc_id").as("doc_b"), col("shingle")),
        Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
    Dedup.jaccardOnPairs(shared, Dedup.shingleSizes(shNew), corpus.sizes)
      .select(col("doc_a").as("new_doc"), col("doc_b").as("dup_of"), col("jaccard"))
  }

  def duplicates(newDocs: DataFrame, corpusDocs: DataFrame): DataFrame =
    duplicates(newDocs, indexCorpus(corpusDocs))

  /** Start the gate: raw new docs stream into foreachBatch against the
    * once-built corpus index. */
  def start(
      newDocs: DataFrame,
      corpusDocs: DataFrame,
      checkpointDir: String,
      sink: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery = {
    val corpus = indexCorpus(corpusDocs)
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((df: DataFrame, id: Long) =>
        sink(duplicates(df, corpus), id))
      .start()
  }

  /** Batch analog for the oracle gate: every doc_id % 4 == 0 document
    * replayed as "new" against the rest as corpus — the exact-Jaccard
    * oracle restricted to crossing pairs is the ground truth (LSH ≡
    * exact at these band parameters, as for q_minhash_lsh). */
  def qDedupGate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    duplicates(
      docs.filter(col("doc_id") % 4 === 0),
      docs.filter(col("doc_id") % 4 =!= 0))
      .orderBy(col("new_doc"), col("dup_of"))
  }

  // ------------------------------------------- embedding-side gate

  /** Corpus snapshot pre-processed for the embedding gate: slim SRP
    * band index + vectors with precomputed norms. */
  final case class EmbedIndex(bands: DataFrame, vecs: DataFrame)

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

  /** New embeddings vs a prebuilt corpus index: semantic near-dup hits
    * at [[Dedup.CosineThreshold]] — DISTINCT candidate pairs from the
    * slim SRP band-bucket join, then [[Dedup.cosineVerify]]'s
    * two-stage verify once per pair (vectors joined back for
    * candidates only). */
  def embedDuplicates(newVecs: DataFrame, corpus: EmbedIndex): DataFrame = {
    import graft.functions.VectorFunctions.norm2Exact
    val cand = embedBands(newVecs)
      .join(corpus.bands.select(col("vec_id").as("dup_of"),
        col("band_id"), col("band_val")), Seq("band_id", "band_val"))
      .select(col("vec_id").as("va"), col("dup_of").as("vb"))
      .distinct()
    val pairRows = cand
      .join(newVecs.select(col("vec_id").as("va"), col("embedding").as("ea"),
        norm2Exact(col("embedding")).as("n2a")), "va")
      .join(corpus.vecs.select(col("vec_id").as("vb"), col("embedding").as("eb"),
        col("n2").as("n2b")), "vb")
    Dedup.cosineVerify(pairRows)
      .select(col("va").as("new_vec"), col("vb").as("dup_of"), col("cosine"))
  }

  def embedDuplicates(newVecs: DataFrame, corpusVecs: DataFrame): DataFrame =
    embedDuplicates(newVecs, indexEmbedCorpus(corpusVecs))

  /** Start the embedding gate — same foreachBatch shape as [[start]]. */
  def startEmbed(
      newVecs: DataFrame,
      corpusVecs: DataFrame,
      checkpointDir: String,
      sink: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery = {
    val corpus = indexEmbedCorpus(corpusVecs)
    newVecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((df: DataFrame, id: Long) =>
        sink(embedDuplicates(df, corpus), id))
      .start()
  }

  /** Batch analog for the oracle: vec_id % 4 == 0 as "new" against
    * the rest — the full SRP chain restricted to crossing pairs is
    * the ground truth. */
  def qEmbedGate(s: SparkSession, d: String): DataFrame = {
    val vecs = Tables.embeddings(s, d)
    embedDuplicates(
      vecs.filter(col("vec_id") % 4 === 0),
      vecs.filter(col("vec_id") % 4 =!= 0))
      .orderBy(col("new_vec"), col("dup_of"))
  }
}
