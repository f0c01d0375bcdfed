package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

import graft.Tables
import graft.operators.TextAnalysis

/** Streaming maintenance of the count-min token-frequency sketch —
  * the `q_heavy_hitters` surface kept current as documents arrive.
  *
  * This is the deliberate CONTRAST to [[KmvGate]]/[[SampleGate]]:
  * count-min union is cell-wise ADDITION — commutative and
  * associative, so incremental == one-shot bit-for-bit, but NOT
  * idempotent: an at-least-once replayed batch adds its counts AGAIN
  * and silently inflates every estimate. Where the bottom-K gates
  * close the replay window with algebra, the additive sketch needs
  * the transactional convention instead: each absorb records its
  * batch id in the saved table and a replay of a recorded id is a
  * no-op — the same exactly-once-per-batch-id discipline as the
  * Kafka EOS sink and the dedup-gate absorbs. CmsGateSpec pins both
  * directions (marker replay is a no-op; an UNMARKED double-absorb
  * measurably double-counts).
  *
  * Scale posture: the per-batch distributed work is one
  * `count_min_sketch` aggregation (map-side partial sketches, merged
  * by the agg); what crosses to the driver is ONE serialized sketch
  * (depth·width longs — ~1 MB at the shipped eps/confidence,
  * corpus-size-independent), and the saved table holds that blob plus
  * one marker row per absorbed batch. Serving reads never touch the
  * corpus except for the exact-count anchor the verdict output is
  * defined against (same as the batch query).
  */
object CmsGate {

  /** Saved-table name for a corpus dir (shared digest scheme). */
  def tableName(d: String): String = DedupGate.gateTableName("cms", d)

  private val schema = StructType(Seq(
    StructField("batch_id", LongType, nullable = false),
    StructField("sk", BinaryType, nullable = true)))

  /** The merged-sketch row's id: never a real batch id. */
  private val SketchRow = -1L

  /** Distributed sketch of one document frame, serialized. None for
    * an empty frame (count_min_sketch has no zero element to return). */
  private[graft] def sketchBytes(docs: DataFrame): Option[Array[Byte]] = {
    val rows = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .agg(count_min_sketch(col("w"), lit(TextAnalysis.CmsEps),
        lit(TextAnalysis.CmsConfidence), lit(TextAnalysis.CmsSeed)).as("sk"))
      .collect() // ONE row: the serialized sketch (bounded artifact)
    rows.headOption.flatMap(r => Option(r.getAs[Array[Byte]](0)))
  }

  private def write(s: SparkSession, table: String,
      sk: Array[Byte], markers: Seq[Long]): Unit =
    graft.sources.Writers.replaceTable(s,
      s.createDataFrame(
        java.util.Arrays.asList(
          (Row(SketchRow, sk) +: markers.map(Row(_, null))): _*),
        schema),
      table)

  /** Build (replace) the sketch table from a corpus snapshot. */
  def init(corpusDocs: DataFrame, table: String): Unit = {
    val s = corpusDocs.sparkSession
    val sk = sketchBytes(corpusDocs).getOrElse(
      CountMinSketch.create(TextAnalysis.CmsEps, TextAnalysis.CmsConfidence,
        TextAnalysis.CmsSeed).toByteArray)
    write(s, table, sk, Seq.empty)
  }

  private def mounted(s: SparkSession, table: String): (CountMinSketch, Seq[Long]) = {
    val rows = s.table(table).collect() // blob + markers: bounded
    val sk = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(
      rows.find(_.getLong(0) == SketchRow).get.getAs[Array[Byte]](1)))
    (sk, rows.map(_.getLong(0)).filter(_ != SketchRow).toSeq)
  }

  /** Absorb one micro-batch EXACTLY ONCE: a batch id already recorded
    * in the table is a replay and must not be re-added (addition is
    * not idempotent — see class doc). */
  def absorb(batchDocs: DataFrame, batchId: Long, table: String): Unit = {
    val s = batchDocs.sparkSession
    val (saved, markers) = mounted(s, table)
    if (!markers.contains(batchId))
      sketchBytes(batchDocs).foreach { bytes =>
        saved.mergeInPlace(
          CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes)))
        write(s, table, saved.toByteArray, markers :+ batchId)
      }
  }

  /** foreachBatch body for a live document stream. */
  def sink(table: String)(batch: DataFrame, batchId: Long): Unit =
    if (!batch.isEmpty) absorb(batch, batchId, table)

  /** Serve `q_heavy_hitters`'s verdict surface from the maintained
    * sketch: exact top-K anchor over the served corpus, estimate >=
    * exact, estimate <= exact + eps·N. */
  def summary(s: SparkSession, table: String, corpusDocs: DataFrame): DataFrame = {
    val (cms, _) = mounted(s, table)
    val epsBudget = math.ceil(TextAnalysis.CmsEps * cms.totalCount()).toLong
    val top = corpusDocs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("w"))
      .limit(TextAnalysis.HeavyHittersK)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    import s.implicits._
    top.toSeq.map { case (w, exact) =>
      val est = cms.estimateCount(w)
      (w, exact, est >= exact, est <= exact + epsBudget)
    }.toDF("w", "exact_cnt", "ge_exact", "within_eps")
      .orderBy(col("exact_cnt").desc, col("w"))
  }

  /** Batch-simulated lifecycle for the driver gate (the %4 split
    * convention): seed with doc_id%4 ≠ 0, absorb the %4 = 0 stream as
    * two marked micro-batches — INCLUDING a replay of the second,
    * which the marker must turn into a no-op for the oracle to stay
    * green — then serve the verdicts over the full corpus. Oracle =
    * `q_heavy_hitters`'s SQL verbatim: cell-wise additivity makes
    * incremental == one-shot, and exactly-once makes the replay
    * invisible. */
  def qCmsStream(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val table = tableName(d)
    init(docs.filter(col("doc_id") % 4 =!= 0), table)
    val b2 = docs.filter(col("doc_id") % 4 === 0 && col("doc_id") % 8 =!= 0)
    absorb(docs.filter(col("doc_id") % 4 === 0 && col("doc_id") % 8 === 0), 0L, table)
    absorb(b2, 1L, table)
    absorb(b2, 1L, table) // at-least-once replay: must be a no-op
    summary(s, table, docs)
  }
}
