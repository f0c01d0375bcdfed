package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: binary payloads, metadata, real WAV decode. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world", "en", "src0", 11L),
    (2L, "", "en", "src0", 0L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("media table carries binary payload + typed metadata") {
    val m = Multimodal.mediaTable(docs).collect()
    val r1 = m.find(_.getLong(0) == 1L).get
    assert(new String(r1.getAs[Array[Byte]]("payload"), "UTF-8") == "hello world")
    val meta = r1.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[String]("format") == "fake/raw")
    assert(meta.getAs[Int]("width") == 12)
  }

  test("WAV codec: canonical header bytes, strict-parse round trip") {
    val samples = "hello world".getBytes("UTF-8")
    val wav = Multimodal.WavCodec.write(samples, 44100)
    // golden header facts any WAV reader relies on
    assert(wav.length == 44 + samples.length)
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    assert(new String(wav.slice(12, 16), "US-ASCII") == "fmt ")
    assert(new String(wav.slice(36, 40), "US-ASCII") == "data")
    val f = Multimodal.WavCodec.decode(7L, wav)
    assert(f.sample_rate == 44100 && f.n_samples == samples.length)
    assert(f.sum_samples == samples.map(_ & 0xff).sum)
    assert(f.peak_sample == samples.map(_ & 0xff).max)
    assert(math.abs(f.mean_sample - f.sum_samples.toDouble / f.n_samples) < 1e-12)

    // strictness: one corrupted byte in each structural field fails
    for (off <- Seq(0, 4, 8, 20, 36, 40)) {
      val bad = wav.clone(); bad(off) = (bad(off) ^ 0x7f).toByte
      intercept[IllegalArgumentException](Multimodal.WavCodec.decode(7L, bad))
    }
    // truncated file fails
    intercept[IllegalArgumentException](
      Multimodal.WavCodec.decode(7L, wav.take(30)))
  }

  test("wav pipeline decodes through partition-batched mapPartitions") {
    val out = Multimodal.decodeWav(Multimodal.wavTable(docs))
      .collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq == Seq(1L, 2L))
    assert(out(0).n_samples == 11 && out(0).n_bytes == 44 + 11)
    assert(out(0).sample_rate == 9000) // 8000 + (1 % 8) * 1000, from the header
    assert(out(1).n_samples == 0 && out(1).mean_sample == 0.0)
    // determinism across runs
    val again = Multimodal.decodeWav(Multimodal.wavTable(docs))
      .collect().sortBy(_.doc_id)
    assert(out.toSeq == again.toSeq)
  }

  test("frame sampling caps at 10 samples of every-2nd frame") {
    val f = Multimodal.qFrameSample(spark, "/root/testdata/sf0.001")
    val perDoc = f.groupBy(col("doc_id")).count().agg(max("count")).collect().head.getLong(0)
    assert(perDoc <= 10)
    val r = f.filter(col("frame_idx") % 2 =!= 0).count()
    assert(r == 0)
  }

  test("frame decode: window boundaries, energy, and silence verdicts") {
    // 100 loud samples + 60 near-midpoint samples = 160 total at frame
    // size 64 -> frames of 64, 64, 32: frame 0 all-loud, frame 1
    // straddles (36 loud + 28 quiet), frame 2 a quiet partial tail
    val loud = Array.fill(100)(200.toByte)
    val quiet = Array.fill(60)(130.toByte)
    val wav = Multimodal.WavCodec.write(loud ++ quiet, 8000)
    val frames = Multimodal.WavCodec
      .decodeFrames(9L, wav, Multimodal.AudioFrameSize, Multimodal.AudioSilencePeak)
      .toSeq
    assert(frames.map(_.frame_idx) == Seq(0L, 1L, 2L))
    assert(frames.map(_.n_samples) == Seq(64L, 64L, 32L))
    // frame 0: 64 samples at dev 72 -> 64*72^2; loud -> not silent
    assert(frames(0).sum_sq_dev == 64L * 72 * 72 && frames(0).silent == 0L)
    // frame 1: 36 loud (dev 72) + 28 quiet (dev 2)
    assert(frames(1).sum_sq_dev == 36L * 72 * 72 + 28L * 2 * 2)
    assert(frames(1).peak_dev == 72L && frames(1).silent == 0L)
    // frame 2: all quiet, peak dev 2 < 16 -> silent
    assert(frames(2).sum_sq_dev == 32L * 2 * 2 && frames(2).silent == 1L)

    // the frame path shares the strict parser: corrupt header fails
    val bad = wav.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](
      Multimodal.WavCodec.decodeFrames(9L, bad, 64, 16).toSeq)
  }

  test("qAudioFeatures: empty docs emit no frames, counts line up") {
    val out = Multimodal.qAudioFeatures(spark, "/root/testdata/sf0.001")
    val n = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(sum(ceil(length(col("text")).cast("double") /
        Multimodal.AudioFrameSize).cast("long"))).collect().head.getLong(0)
    assert(out.count() == n, "frame count must equal sum(ceil(len/frameSize))")
    assert(out.filter(col("n_samples") <= 0).count() == 0)
  }

  test("resample2: pair means floor, odd tail passes through") {
    import Multimodal.WavCodec
    assert(WavCodec.resample2(Array[Byte](10, 11, 20, 21, 30)).toSeq ==
      Seq[Byte](10, 20, 30)) // (10+11)/2=10 floor, tail 30 verbatim
    assert(WavCodec.resample2(Array[Byte](200.toByte, 100)).toSeq ==
      Seq[Byte](150.toByte)) // UNSIGNED mean: (200+100)/2, not signed
    assert(WavCodec.resample2(Array.empty[Byte]).isEmpty)
  }

  test("resample round trip re-encodes a valid container at half rate") {
    import Multimodal.WavCodec
    val src = WavCodec.write(Array[Byte](10, 20, 30, 40, 50), 9000)
    val (rate, raw) = WavCodec.samples(src)
    assert(rate == 9000 && raw.toSeq == Seq[Byte](10, 20, 30, 40, 50))
    val out = WavCodec.write(WavCodec.resample2(raw), rate / 2)
    val f = WavCodec.decode(7L, out) // STRICT parse of the new artifact
    assert(f.sample_rate == 4500L && f.n_samples == 3L)
    assert(f.sum_samples == 15L + 35L + 50L)
    // corrupting one byte of the re-encoded header must fail the parse
    val bad = out.clone(); bad(22) = 2 // channels field -> stereo
    intercept[IllegalArgumentException](WavCodec.decode(7L, bad))
  }

  test("quarantine: planted corruption is isolated, good rows keep exact stats") {
    val d = "/root/testdata/sf0.001"
    val got = Multimodal.qMediaQuarantine(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val (bad, ok) = got.partition(_._2 == "quarantined")
    // every CorruptEvery-th doc quarantines with the strict parser's
    // reason; nothing else does, and the job survives the faults
    assert(bad.nonEmpty && bad.forall(_._1 % Multimodal.CorruptEvery == 0))
    assert(ok.forall(_._1 % Multimodal.CorruptEvery != 0))
    assert(bad.forall(r => r._3 == 0L && r._4 == 0L &&
      r._5 == "not a PCM WAV: missing RIFF magic"), s"${bad.take(2).toSeq}")
    // good rows carry the same stats the clean decode reports
    val clean = Multimodal.qMediaDecode(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(ok.forall(r => clean(r._1) == ((r._3, r._4))))
  }

  test("AVI codec: canonical structure, index-seeked frames, strictness") {
    // 2 frames of 3x2 BGR, distinct bytes so orientation is observable
    val w = 3; val h = 2
    val frames = Array.tabulate(2)(k =>
      Array.tabulate(w * h * 3)(i => (k * 100 + i).toByte))
    val avi = Multimodal.AviCodec.write(frames, w, h, 10)
    assert(avi.length == Multimodal.AviCodec.containerSize(w, h, 2))
    assert(new String(avi.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val meta = Multimodal.AviCodec.meta(1L, avi)
    assert(meta.width == w && meta.height == h && meta.fps == 10 &&
      meta.n_frames == 2 && meta.usec_per_frame == 100000)
    // frames via idx1 (step 1): stats equal the source bytes'
    val fs = Multimodal.AviCodec.sampleFrames(1L, avi, 1)
    assert(fs.size == 2)
    fs.zipWithIndex.foreach { case (f, k) =>
      val src = frames(k).map(_ & 0xff)
      assert(f.sum_px == src.map(_.toLong).sum, s"frame $k sum")
      assert(f.peak_px == src.max.toLong, s"frame $k peak")
      // first_px pins the bottom-up -> top-down recovery: it is the
      // frame's byte 0, which the writer stores in the LAST row chunk
      assert(f.first_px == (frames(k)(0) & 0xff).toLong, s"frame $k first")
    }
    // strictness: a corrupted byte in each structural region fails —
    // RIFF magic, form type, avih width, last idx1 offset, first idx1
    // offset (64 = avih data start 32 + width field offset 32)
    val idx1Off = avi.length - 2 * 16 - 8
    for (off <- Seq(0, 9, 64, avi.length - 8, idx1Off + 8 + 8)) {
      val bad = avi.clone(); bad(off) = (bad(off) ^ 0x7f).toByte
      intercept[IllegalArgumentException](Multimodal.AviCodec.meta(1L, bad))
    }
    intercept[IllegalArgumentException](
      Multimodal.AviCodec.meta(1L, avi.take(100)))
  }

  test("audio fingerprint: hand-computed energy gradients, size guard") {
    import Multimodal.{AfpWindow, AfpWindows, AfpLag}
    val n = (AfpWindows + AfpLag) * AfpWindow // 264 samples
    // window w filled with constant deviation w -> energy |win|*w^2,
    // strictly increasing -> all 64 bits set -> each 16-bit band 65535
    val up = Array.tabulate(n)(i => (128 + i / AfpWindow).toByte)
    val fUp = Multimodal.WavCodec.fingerprint(1L,
      Multimodal.WavCodec.write(up, 8000)).get
    assert(Seq(fUp.b0, fUp.b1, fUp.b2, fUp.b3) ==
      Seq(65535L, 65535L, 65535L, 65535L))
    assert(fUp.n_samples == n.toLong)
    // reversed: all bits clear
    val down = Array.tabulate(n)(i => (128 + (AfpWindows - i / AfpWindow)).toByte)
    val fDown = Multimodal.WavCodec.fingerprint(2L,
      Multimodal.WavCodec.write(down, 8000)).get
    assert(Seq(fDown.b0, fDown.b1, fDown.b2, fDown.b3) == Seq(0L, 0L, 0L, 0L))
    // locality (lag-2 gradients): silence ONE window (w=4) of the
    // rising ramp -> bit 2 (e2 < e4: was 1, now e4=0 fails) flips;
    // bit 4 (e4 < e6: 0 < e6 still holds) does not; hamming 1
    val near = up.clone()
    for (i <- 4 * AfpWindow until 5 * AfpWindow) near(i) = 128.toByte
    val fNear = Multimodal.WavCodec.fingerprint(3L,
      Multimodal.WavCodec.write(near, 8000)).get
    val hamming = Seq((fUp.b0, fNear.b0), (fUp.b1, fNear.b1),
      (fUp.b2, fNear.b2), (fUp.b3, fNear.b3))
      .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
    assert(hamming == 1, s"one-window silence must flip exactly bit 3: $hamming")
    // one sample short of the signature window: admit-by-omission
    assert(Multimodal.WavCodec.fingerprint(4L,
      Multimodal.WavCodec.write(up.take(n - 1), 8000)).isEmpty)
  }

  test("image dHash: hand-computed gradient bits, size guard, locality") {
    val w = 9; val h = 8
    // strict left-to-right gradient: every box mean increases with j,
    // so all 64 bits set -> each 16-bit band is 65535
    val up = Array.tabulate(w * h)(p => ((p % w) * 10).toByte)
    val hashUp = Multimodal.BmpCodec.dhashBands(1L,
      Multimodal.BmpCodec.write(up, w, h)).get
    assert(Seq(hashUp.b0, hashUp.b1, hashUp.b2, hashUp.b3) ==
      Seq(65535L, 65535L, 65535L, 65535L), s"got $hashUp")
    // reversed gradient: all bits clear
    val down = Array.tabulate(w * h)(p => ((8 - p % w) * 10).toByte)
    val hashDown = Multimodal.BmpCodec.dhashBands(2L,
      Multimodal.BmpCodec.write(down, w, h)).get
    assert(Seq(hashDown.b0, hashDown.b1, hashDown.b2, hashDown.b3) ==
      Seq(0L, 0L, 0L, 0L))
    // locality: bump ONE grid cell (cells are 1x1 at 9x8, so one
    // pixel IS one cell) to a local max -> exactly bit j=4 flips
    // (30 < 200 keeps j=3; 200 < 50 fails j=4); hamming 1
    val near = up.clone()
    near(4) = 200.toByte // row 0, col 4: now a local maximum
    val hashNear = Multimodal.BmpCodec.dhashBands(3L,
      Multimodal.BmpCodec.write(near, w, h)).get
    val hamming = Seq((hashUp.b0, hashNear.b0), (hashUp.b1, hashNear.b1),
      (hashUp.b2, hashNear.b2), (hashUp.b3, hashNear.b3))
      .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
    assert(hamming == 1, s"one-cell bump must flip exactly bit j=4: $hamming")
    // too small for the grid: admit-by-omission
    assert(Multimodal.BmpCodec.dhashBands(4L,
      Multimodal.BmpCodec.write(Array.fill(8 * 8)(1.toByte), 8, 8)).isEmpty)
    assert(Multimodal.BmpCodec.dhashBands(5L,
      Multimodal.BmpCodec.write(Array.fill(9 * 7)(1.toByte), 9, 7)).isEmpty)
  }

  test("video motion: hand-computed inter-frame diffs and cut verdicts") {
    val w = 3; val h = 2; val nb = w * h * 3
    // frame 0: all 10s; frame 1: all 10s except byte 0 -> 210 (one
    // localized change, motion 200 < cut line); frame 2: all 250s
    // (every byte jumps 240 from frame 1's 10s, except byte 0: 40)
    val f0 = Array.fill(nb)(10.toByte)
    val f1 = f0.clone(); f1(0) = 210.toByte
    val f2 = Array.fill(nb)(250.toByte)
    val avi = Multimodal.AviCodec.write(Array(f0, f1, f2), w, h, 10)
    val ms = Multimodal.AviCodec.motion(7L, avi)
    assert(ms.map(_.frame_idx) == Seq(0L, 1L))
    val m01 = 200L                        // |210-10| at byte 0 only
    val m12 = (nb - 1) * 240L + 40L       // 17*240 + |250-210|
    assert(ms.map(_.motion) == Seq(m01, m12), s"got ${ms.map(_.motion)}")
    assert(ms.map(_.n_bytes).forall(_ == nb.toLong))
    // verdicts: the integer cross-multiply against the pinned line
    assert(ms.map(_.cut) == Seq(
      m01 * 1000 > Multimodal.MotionCutX1e3 * nb,   // false (11k < 28k·nb)
      m12 * 1000 > Multimodal.MotionCutX1e3 * nb))  // true
    assert(!ms(0).cut && ms(1).cut, "both verdict classes must appear")
  }

  test("perceptual recall probes: every payload-identical pair is recovered") {
    // the bench's 10x floor rows (round-18, VERDICT r17 #7), exercised
    // at spec scale: planted = byte-identical containers, and the
    // banded chain must recover ALL of them (identical bytes collide
    // in every band — the floor is pigeonhole-exact 1.0, not LSH odds)
    val d = "/root/testdata/sf0.001"
    for ((name, probe) <- Seq[(String, (org.apache.spark.sql.SparkSession, String) => (Long, Long))](
        "image" -> (Multimodal.imageRecallProbe _),
        "audio" -> (Multimodal.audioRecallProbe _),
        "video" -> (Multimodal.videoRecallProbe _))) {
      val (planted, recalled) = probe(spark, d)
      assert(planted > 0, s"$name: vacuous corpus — no payload-identical pairs")
      assert(recalled == planted, s"$name: recalled $recalled of $planted")
    }
  }

  test("video pipeline: short docs drop, frame cap at 8, step-2 sampling") {
    import spark.implicits._
    val short = "tiny" // < one 2x2x3 frame for doc 0 geometry
    val long = ("x" * 500) // many frames -> capped at 8
    val docs = Seq((0L, long), (5L, short)).toDF("doc_id", "text")
    val vids = Multimodal.videoTable(docs).collect()
    assert(vids.map(_.doc_id).toSeq == Seq(0L),
      "short doc must drop out (admit-by-omission)")
    val m = Multimodal.AviCodec.meta(0L, vids.head.payload)
    assert(m.n_frames == 8, s"cap: ${m.n_frames}") // 500/(2*2*3)=41 -> 8
    val fr = Multimodal.AviCodec.sampleFrames(0L, vids.head.payload,
      Multimodal.VideoFrameStep)
    assert(fr.map(_.frame_idx).toSeq == Seq(0L, 2L, 4L, 6L))
  }
}
