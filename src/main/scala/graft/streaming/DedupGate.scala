package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.TextFunctions.tokens
import graft.operators.Dedup

/** STREAMING dedup gate — the online-ingestion form of the MinHash+LSH
  * near-dup path: new documents arrive as a stream and are checked
  * against a corpus snapshot's band index before admission, the gate a
  * production training pipeline runs at ingestion time (batch dedup
  * cleans the corpus; this keeps it clean).
  *
  * The streaming constraint shapes the design: a streaming frame
  * cannot run the batch path's groupBy-per-doc signature build without
  * watermark/state machinery, so the signature is computed PER ROW
  * with array higher-order functions — shingles, 32 minhashes, and 16
  * band hashes as one codegen-resident projection, no shuffle, no
  * state. The arithmetic is value-identical to the batch path
  * ([[Dedup.minhashSignatures]] / [[Dedup.lshBands]] — `hash(k, s)`
  * over the same shingle strings), so the gate finds exactly the
  * candidates batch LSH finds (DedupGateSpec pins the equivalence
  * against q_minhash_lsh's crossing pairs, and the q_dedup_gate batch
  * analog hash-matches the exact-Jaccard oracle).
  *
  * Scale shape: the stream side never shuffles — candidates come from
  * a stream-static equi join on (band_id, band_hash) against a SLIM
  * index (3 ints per corpus band; at 100 TB this is the bucketed
  * on-disk table of [[Dedup.pairIndex]]'s kind, re-read per
  * micro-batch like the reference's Redis dim), and the exact-Jaccard
  * verify joins corpus shingle arrays only for the candidate doc ids.
  * Within-batch candidate duplicates (a pair colliding in several
  * bands) are dropped in the sink, not with streaming state. */
object DedupGate {

  /** Distinct word n-gram shingles as a PER-ROW array — the HOF twin
    * of TextFunctions.shingles (same separator, same distinct), empty
    * array below n tokens where the batch form drops the row. */
  def shingleArr(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** 32 minhashes per row: sig[k] = min over shingles of hash(k,
    * shingle) — value-identical to Dedup.minhashSignatures' grouped
    * `min(hash(lit(k), shingle))`. */
  def minhashSigArr(sh: Column): Column =
    transform(sequence(lit(0), lit(Dedup.MinhashK - 1)), k =>
      array_min(transform(sh, s => hash(k, s))))

  /** 16 band hashes per row, packing MinhashK/LshBands signature rows
    * each — value-identical to Dedup.lshBands' `hash(m0, m1)`. */
  def bandArr(sig: Column): Column = {
    val rpb = Dedup.MinhashK / Dedup.LshBands
    transform(sequence(lit(0), lit(Dedup.LshBands - 1)), b =>
      hash((0 until rpb).map(r => element_at(sig, b * rpb + r + 1)): _*))
  }

  /** Per-row band rows for a (doc_id, text) frame: (doc_id, sh,
    * band_id, band_hash). Streaming-safe — one projection + explode,
    * zero shuffles; docs below the shingle length are silently clean
    * (no bands, like the batch path). */
  def rowBands(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), shingleArr(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"),
        posexplode(bandArr(minhashSigArr(col("sh")))).as(Seq("band_id", "band_hash")))

  /** New docs (stream or batch) vs a corpus snapshot: candidates from
    * the band-bucket join, exact Jaccard >= 0.5 verified on the
    * candidate rows only. Output (new_doc, dup_of, jaccard) — one row
    * per (pair, colliding band); the sink dedups per batch. */
  def duplicates(newDocs: DataFrame, corpusDocs: DataFrame): DataFrame = {
    val nb = rowBands(newDocs)
    val index = rowBands(corpusDocs)
      .select(col("doc_id").as("dup_of"), col("band_id"), col("band_hash"))
    val corpusSh = corpusDocs
      .select(col("doc_id").as("dup_of"), shingleArr(col("text")).as("csh"))
    val shared = size(array_intersect(col("sh"), col("csh")))
    nb.join(index, Seq("band_id", "band_hash"))
      .join(corpusSh, "dup_of")
      .select(col("doc_id").as("new_doc"), col("dup_of"),
        (shared.cast(DoubleType) /
          (size(col("sh")) + size(col("csh")) - shared)).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  /** Start the gate: append-mode stream of verified duplicate hits;
    * within-batch pair duplicates (multi-band collisions) dropped in
    * the sink — stateless, so the gate runs forever without growth. */
  def start(
      newDocs: DataFrame,
      corpusDocs: DataFrame,
      checkpointDir: String,
      sink: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    duplicates(newDocs, corpusDocs).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((df: DataFrame, id: Long) =>
        sink(df.dropDuplicates("new_doc", "dup_of"), id))
      .start()

  /** Batch analog for the oracle gate: every doc_id % 4 == 0 document
    * replayed as "new" against the rest as corpus — the exact-Jaccard
    * oracle restricted to crossing pairs is the ground truth (LSH ≡
    * exact at these band parameters, as for q_minhash_lsh). */
  def qDedupGate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    duplicates(
      docs.filter(col("doc_id") % 4 === 0),
      docs.filter(col("doc_id") % 4 =!= 0))
      .dropDuplicates("new_doc", "dup_of")
      .orderBy(col("new_doc"), col("dup_of"))
  }

  // ------------------------------------------- embedding-side gate

  /** Per-row SRP band rows for a (vec_id, embedding) frame — the
    * embedding twin of [[rowBands]]. `srp_bands` is already a scalar
    * codegen expression, so the streaming side needs no new machinery:
    * one projection, zero shuffles, no state. */
  private def embedBands(vecs: DataFrame): DataFrame = {
    import graft.functions.expressions.SrpBands.srp_bands
    vecs.select(col("vec_id"), col("embedding"),
        posexplode(srp_bands(col("embedding"))).as(Seq("band_id", "band_val")))
  }

  /** New embeddings vs a corpus snapshot: semantic near-dup hits at
    * [[Dedup.CosineThreshold]] — SRP band-bucket candidates, exact
    * decimal cosine verify on candidate rows only (the same two-stage
    * verify as the batch path). */
  def embedDuplicates(newVecs: DataFrame, corpusVecs: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions._
    val nb = embedBands(newVecs)
    val index = embedBands(corpusVecs)
      .select(col("vec_id").as("dup_of"), col("band_id"), col("band_val"))
    val corpusVec = corpusVecs
      .select(col("vec_id").as("dup_of"), col("embedding").as("ce"),
        norm2Exact(col("embedding")).as("cn2"))
    nb.join(index, Seq("band_id", "band_val"))
      .filter(col("vec_id") =!= col("dup_of"))
      .join(corpusVec, "dup_of")
      .withColumn("n2", norm2Exact(col("embedding")))
      .withColumn("cos_fast",
        cosineFromParts(dot(col("embedding"), col("ce")), col("n2"), col("cn2")))
      .filter(col("cos_fast") >= Dedup.CosineThreshold - 1e-6)
      .withColumn("cosine",
        cosineFromParts(dotExact(col("embedding"), col("ce")), col("n2"), col("cn2")))
      .filter(col("cosine") >= Dedup.CosineThreshold)
      .select(col("vec_id").as("new_vec"), col("dup_of"), col("cosine"))
  }

  /** Start the embedding gate — same stateless append shape as
    * [[start]]. */
  def startEmbed(
      newVecs: DataFrame,
      corpusVecs: DataFrame,
      checkpointDir: String,
      sink: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    embedDuplicates(newVecs, corpusVecs).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((df: DataFrame, id: Long) =>
        sink(df.dropDuplicates("new_vec", "dup_of"), id))
      .start()

  /** Batch analog for the oracle: vec_id % 4 == 0 as "new" against
    * the rest — the full SRP chain restricted to crossing pairs is
    * the ground truth. */
  def qEmbedGate(s: SparkSession, d: String): DataFrame = {
    val vecs = Tables.embeddings(s, d)
    embedDuplicates(
      vecs.filter(col("vec_id") % 4 === 0),
      vecs.filter(col("vec_id") % 4 =!= 0))
      .dropDuplicates("new_vec", "dup_of")
      .orderBy(col("new_vec"), col("dup_of"))
  }
}
