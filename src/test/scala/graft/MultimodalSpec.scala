package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: binary payloads, metadata, stub decode. */
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

  test("stub decoder is deterministic and partition-batched") {
    val media = Multimodal.mediaTable(docs)
      .select(col("doc_id"), col("payload"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[Multimodal.MediaRecord]
    val out = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq == Seq(1L, 2L))
    assert(out(0).n_bytes == 11)
    assert(math.abs(out(0).mean_byte - "hello world".getBytes("UTF-8").map(_ & 0xff).sum / 11.0) < 1e-12)
    assert(out(1).n_bytes == 0 && out(1).mean_byte == 0.0)
    // determinism across runs
    val again = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
    assert(out.map(_.feature_hash).toSeq == again.map(_.feature_hash).toSeq)
  }

  test("frame sampling caps at 10 samples of every-2nd frame") {
    val f = Multimodal.qFrameSample(spark, "/root/testdata/sf0.001")
    val perDoc = f.groupBy(col("doc_id")).count().agg(max("count")).collect().head.getLong(0)
    assert(perDoc <= 10)
    val r = f.filter(col("frame_idx") % 2 =!= 0).count()
    assert(r == 0)
  }
}
