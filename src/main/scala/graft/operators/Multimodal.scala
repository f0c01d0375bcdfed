package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column operators: media as opaque `BINARY` payloads with
  * typed metadata structs, plus decode / feature-extract / frame-sample
  * stages.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub (`StubDecoder`) — but everything
  * Spark-side is real and load-bearing: the binary column, the nested
  * metadata struct, the mapPartitions batch shape (one decoder init per
  * partition, streamed records — exactly how a JNI/FFmpeg decoder would
  * be mounted), and the frame-sampling fan-out.
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no driver
  * collect, no string conversion); metadata predicates (width/format)
  * prune BEFORE decode, so at 100 TB the expensive stage sees only the
  * selected rows; frame sampling is a columnar explode, bounded per
  * record.
  */
object Multimodal {

  /** Media view over `documents`: utf-8 payload bytes standing in for
    * encoded media + a typed metadata struct derived deterministically. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("fake/raw").as("format"),
        (col("n_chars") % 640 + 1).cast(IntegerType).as("width"),
        (col("n_chars") % 480 + 1).cast(IntegerType).as("height")).as("meta"))

  /** Metadata + cheap byte-level features, no decode: the
    * prune-before-decode stage. */
  def qMediaMeta(s: SparkSession, d: String): DataFrame =
    mediaTable(Tables.documents(s, d))
      .select(
        col("doc_id"),
        col("meta.format").as("format"),
        col("meta.width").cast(LongType).as("width"),
        col("meta.height").cast(LongType).as("height"),
        length(col("payload")).cast(LongType).as("n_bytes"),
        md5(col("payload")).as("digest"))
      .orderBy(col("doc_id"))

  /** Frame sampling: every 2nd frame of ~50-byte "frames", capped at 10
    * samples per media — a bounded columnar fan-out (explode of a
    * sequence), the shape video frame extraction takes at scale. */
  def qFrameSample(s: SparkSession, d: String): DataFrame =
    mediaTable(Tables.documents(s, d))
      .select(col("doc_id"),
        (expr("length(payload) div 50") + 1).cast(LongType).as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), least(col("n_frames") - 1, lit(18L)), lit(2L))).as("frame_idx"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        (col("frame_idx") * 50).as("frame_off"))
      .orderBy(col("doc_id"), col("frame_idx"))

  // ----------------------------------------------------- decode pipeline

  case class MediaRecord(doc_id: Long, payload: Array[Byte],
    format: String, width: Int, height: Int)

  case class DecodedFeatures(doc_id: Long, n_bytes: Int,
    mean_byte: Double, feature_hash: Long)

  /** STUB decoder — the real codec is not available in this container.
    * Deterministic byte-level pseudo-features keep the signature and
    * batch mechanics identical to a real decoder's. */
  object StubDecoder {
    def init(): StubDecoder.type = this // per-partition init point
    def decode(m: MediaRecord): DecodedFeatures = {
      val bytes = m.payload
      val mean =
        if (bytes.isEmpty) 0.0
        else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
      DecodedFeatures(m.doc_id, bytes.length, mean,
        scala.util.hashing.MurmurHash3.bytesHash(bytes, 42).toLong)
    }
  }

  /** Batched decode: one decoder init per partition, records streamed
    * through it — the mapPartitions shape a JNI decoder needs (init is
    * expensive; per-row init would be the classic mistake). */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[DecodedFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val decoder = StubDecoder.init()
      it.map(decoder.decode)
    }
  }

  /** Full decode query (rows-only check: byte-level features are not
    * portable SQL; covered by unit tests instead). */
  def qMediaDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = mediaTable(Tables.documents(s, d))
      .select(col("doc_id"), col("payload"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[MediaRecord]
    decodeFeatures(media).toDF().orderBy(col("doc_id"))
  }
}
