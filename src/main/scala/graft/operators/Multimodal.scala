package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column operators: media as opaque `BINARY` payloads with
  * typed metadata structs, plus decode / feature-extract / frame-sample
  * stages.
  *
  * The DECODE step is a REAL pure-JVM codec for a real container
  * format: canonical RIFF/WAVE PCM (44-byte header, 8-bit mono) —
  * [[WavCodec]] writes and strictly parses the header (magics, chunk
  * walk, fmt-field consistency) and extracts payload sample stats, so
  * `q_media_decode` is oracle-checkable end-to-end (DuckDB recomputes
  * the expected stats from the source rows). Heavier codecs (JPEG,
  * H.264) aren't in this container, but they would mount at exactly
  * the same seam: the mapPartitions batch shape (one decoder init per
  * partition, streamed records — how a JNI/FFmpeg decoder is mounted),
  * binary columns end-to-end, typed metadata structs.
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

  case class WavRecord(doc_id: Long, payload: Array[Byte])

  case class WavFeatures(doc_id: Long, n_bytes: Long, sample_rate: Long,
    n_samples: Long, sum_samples: Long, peak_sample: Long,
    mean_sample: Double, duration_ms: Long)

  case class WavFrame(doc_id: Long, frame_idx: Long, n_samples: Long,
    sum_sq_dev: Long, peak_dev: Long, silent: Long)

  /** Real RIFF/WAVE PCM codec, pure JVM — canonical 44-byte header,
    * mono, unsigned 8-bit samples. `write` emits the exact layout any
    * audio tool reads; `decode` is a STRICT parser: it checks the RIFF
    * and WAVE magics, the RIFF size field, walks chunks to `fmt ` and
    * `data` (tolerating extra chunks, the format's rule), and verifies
    * the PCM fmt fields (audio format 1, mono, 8-bit, byte rate and
    * block align consistent with the sample rate) before touching a
    * sample. A one-byte header corruption fails the parse — that
    * strictness is what makes the end-to-end oracle check meaningful. */
  object WavCodec {
    import java.nio.{ByteBuffer, ByteOrder}

    def init(): WavCodec.type = this // per-partition init point

    /** Canonical 44-byte-header mono 8-bit PCM WAV around `samples`. */
    def write(samples: Array[Byte], sampleRate: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(44 + samples.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length)
        .put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1.toShort)          // PCM
        .putShort(1.toShort)          // mono
        .putInt(sampleRate)
        .putInt(sampleRate)           // byte rate = rate * 1 ch * 1 B
        .putShort(1.toShort)          // block align
        .putShort(8.toShort)          // bits per sample
      b.put("data".getBytes("US-ASCII")).putInt(samples.length)
      b.put(samples).array()
    }

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"not a PCM WAV: $msg")

    /** Strict header parse: returns (rate, data offset, data length).
      * Both the stats decode and the frame decode go through this ONE
      * parser, so the strictness guarantees can't diverge. */
    private def parseHeader(wav: Array[Byte]): (Int, Int, Int) = {
      if (wav.length < 44) fail(s"${wav.length} bytes < minimal header")
      val b = ByteBuffer.wrap(wav).order(ByteOrder.LITTLE_ENDIAN)
      def tag(): String = { val t = new Array[Byte](4); b.get(t); new String(t, "US-ASCII") }
      if (tag() != "RIFF") fail("missing RIFF magic")
      if (b.getInt() != wav.length - 8) fail("RIFF size field mismatch")
      if (tag() != "WAVE") fail("missing WAVE magic")
      // chunk walk: fmt must precede data (decoder needs it), other
      // chunks (LIST, fact, ...) are skipped per the format's rule
      var rate = -1
      while (b.remaining() >= 8) {
        val id = tag()
        val len = b.getInt()
        if (len < 0 || len > b.remaining()) fail(s"chunk $id overruns file")
        id match {
          case "fmt " =>
            if (len != 16) fail(s"fmt chunk length $len != 16 (plain PCM)")
            if (b.getShort() != 1) fail("audio format != 1 (PCM)")
            if (b.getShort() != 1) fail("channels != 1")
            rate = b.getInt()
            if (rate <= 0) fail(s"sample rate $rate")
            if (b.getInt() != rate) fail("byte rate inconsistent with rate")
            if (b.getShort() != 1) fail("block align != 1")
            if (b.getShort() != 8) fail("bits per sample != 8")
          case "data" =>
            if (rate < 0) fail("data chunk before fmt")
            return (rate, b.position(), len)
          case _ => b.position(b.position() + len + (len & 1)) // pad byte
        }
      }
      fail("no data chunk")
    }

    /** Strict parse + payload stats for `doc_id`'s payload. */
    def decode(docId: Long, wav: Array[Byte]): WavFeatures = {
      val (rate, off, len) = parseHeader(wav)
      var sum = 0L
      var peak = 0L
      var i = off
      val end = off + len
      while (i < end) {
        val v = (wav(i) & 0xff).toLong
        sum += v
        if (v > peak) peak = v
        i += 1
      }
      WavFeatures(docId, wav.length.toLong, rate.toLong,
        len.toLong, sum, peak,
        if (len == 0) 0.0 else sum.toDouble / len,
        len.toLong * 1000L / rate)
    }

    /** Strict parse + raw sample access: (rate, samples copy) — the
      * input side of any decode → transform → re-encode stage. */
    def samples(wav: Array[Byte]): (Int, Array[Byte]) = {
      val (rate, off, len) = parseHeader(wav)
      (rate, java.util.Arrays.copyOfRange(wav, off, off + len))
    }

    /** 2:1 decimation with pair averaging (integer floor; an odd tail
      * sample passes through) — the audio analog of an image resize:
      * the transform every media pipeline runs between decode and
      * re-encode. Exact integer arithmetic, so the oracle recomputes
      * it from source bytes bit-for-bit. */
    def resample2(samples: Array[Byte]): Array[Byte] = {
      val n = samples.length
      val out = new Array[Byte]((n + 1) / 2)
      var j = 0
      while (j < out.length) {
        val i = 2 * j
        out(j) =
          if (i + 1 < n) (((samples(i) & 0xff) + (samples(i + 1) & 0xff)) / 2).toByte
          else samples(i)
        j += 1
      }
      out
    }

    /** Strict parse + per-frame features: non-overlapping
      * `frameSize`-sample windows over the data chunk (last frame
      * partial), each with its squared-deviation energy and peak
      * deviation around the 8-bit midpoint — all integers, so the
      * oracle's recomputation from source bytes is exact. */
    def decodeFrames(docId: Long, wav: Array[Byte],
        frameSize: Int, silencePeak: Int): Iterator[WavFrame] = {
      val (_, off, len) = parseHeader(wav)
      val nFrames = (len + frameSize - 1) / frameSize
      (0 until nFrames).iterator.map { f =>
        val start = off + f * frameSize
        val end = math.min(start + frameSize, off + len)
        var sumSq = 0L
        var peak = 0L
        var i = start
        while (i < end) {
          val dev = (wav(i) & 0xff).toLong - 128L
          sumSq += dev * dev
          val a = math.abs(dev)
          if (a > peak) peak = a
          i += 1
        }
        WavFrame(docId, f.toLong, (end - start).toLong, sumSq, peak,
          if (peak < silencePeak) 1L else 0L)
      }
    }
  }

  /** Media sample rate per doc — written into the WAV header and read
    * back out by the decoder; varying it per row makes the header
    * parse load-bearing (a constant would decode "correctly" even if
    * the parser ignored the fmt chunk). */
  private def wavRate(docId: Long): Int = (8000L + (docId % 8) * 1000L).toInt

  /** WAV view over `documents`: each doc's utf-8 bytes as the 8-bit
    * PCM sample stream of a real WAV file (mapPartitions: one encoder
    * init per partition — same mount shape as the decoder). */
  def wavTable(docs: DataFrame): Dataset[WavRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val codec = WavCodec.init()
        it.map { case (id, text) =>
          WavRecord(id, codec.write(text.getBytes("UTF-8"), wavRate(id)))
        }
      }
  }

  /** Batched decode: one decoder init per partition, records streamed
    * through it — the mapPartitions shape a JNI decoder needs (init is
    * expensive; per-row init would be the classic mistake). */
  def decodeWav(media: Dataset[WavRecord]): Dataset[WavFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val decoder = WavCodec.init()
      it.map(m => decoder.decode(m.doc_id, m.payload))
    }
  }

  /** Full encode -> strict-parse -> stats round trip over real WAV
    * binaries. Oracle-checkable: DuckDB recomputes every output column
    * from the source text directly (the docs are ASCII, so sample
    * values are code points), which only matches if the header the
    * encoder wrote and the offsets the parser read are both exactly
    * right — a single byte of drift corrupts `sum_samples`. */
  def qMediaDecode(s: SparkSession, d: String): DataFrame =
    decodeWav(wavTable(Tables.documents(s, d))).toDF().orderBy(col("doc_id"))

  /** Audio frame geometry: 64-sample non-overlapping windows; a frame
    * is "silent" when every sample is within 16 of the 8-bit midpoint
    * — the voice-activity-detection primitive a speech pipeline runs
    * before transcription (silence never reaches the expensive model). */
  val AudioFrameSize = 64
  val AudioSilencePeak = 16

  /** Frame-level audio features through the REAL decode path: encode ->
    * strict header parse -> windowed energy/peak per frame. The frame
    * fan-out happens inside the decoder's mapPartitions (a real codec
    * emits frames, like FFmpeg), so per-row cost is one pass over the
    * payload and the output is bounded at len/frameSize rows per doc.
    * All feature columns are integers (squared deviation, peak
    * deviation, silence verdict), so the oracle's recomputation from
    * the source bytes is exact — any drift in the header offsets or
    * window boundaries breaks the hash compare. */
  def qAudioFeatures(s: SparkSession, d: String): DataFrame = {
    val media = wavTable(Tables.documents(s, d))
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val decoder = WavCodec.init()
      it.flatMap(m =>
        decoder.decodeFrames(m.doc_id, m.payload, AudioFrameSize, AudioSilencePeak))
    }.toDF().orderBy(col("doc_id"), col("frame_idx"))
  }

  /** The full media TRANSFORM pipeline — decode → resample (2:1
    * decimation, the audio analog of an image resize) → RE-ENCODE at
    * half the rate → strict re-parse of the new artifact. The report
    * row is the re-decoded features of the re-encoded WAV, so a match
    * proves all four stages: source parse, exact-integer transform,
    * header re-write at the new rate, and the round trip's validity
    * as a real container. One mapPartitions pass, one codec init per
    * partition, payloads never leave the executor. */
  def qMediaResample(s: SparkSession, d: String): DataFrame = {
    val media = wavTable(Tables.documents(s, d))
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val codec = WavCodec.init()
      it.map { m =>
        val (rate, raw) = codec.samples(m.payload)
        val out = codec.write(codec.resample2(raw), rate / 2)
        codec.decode(m.doc_id, out)
      }
    }.toDF().orderBy(col("doc_id"))
  }
}
