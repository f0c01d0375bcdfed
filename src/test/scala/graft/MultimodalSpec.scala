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
}
