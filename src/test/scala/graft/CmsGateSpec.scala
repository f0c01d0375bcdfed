package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.util.sketch.CountMinSketch

import graft.streaming.CmsGate

/** Streaming count-min maintenance: incremental merge must equal the
  * one-shot sketch bit-for-bit (cell-wise additivity), the marker
  * must make an at-least-once replay a no-op, an UNMARKED re-add must
  * measurably double-count (the reason the marker is load-bearing —
  * this gate's algebra, unlike KMV/priority, does NOT forgive
  * replays), and a live foreachBatch run must land the same state. */
class CmsGateSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def mountedBytes(table: String): Array[Byte] =
    spark.table(table).filter(col("batch_id") === -1L)
      .collect().head.getAs[Array[Byte]]("sk")

  test("incremental == one-shot bit-for-bit; marked replay is a no-op; unmarked re-add double-counts") {
    val docs = Tables.documents(spark, d)
    val table = "graft_test_cms_gate"
    CmsGate.init(docs.filter(col("doc_id") % 4 =!= 0), table)
    val b1 = docs.filter(col("doc_id") % 4 === 0 && col("doc_id") % 8 === 0)
    val b2 = docs.filter(col("doc_id") % 4 === 0 && col("doc_id") % 8 =!= 0)
    CmsGate.absorb(b1, 0L, table)
    CmsGate.absorb(b2, 1L, table)
    val merged = mountedBytes(table)
    val oneShot = CmsGate.sketchBytes(docs).get
    assert(java.util.Arrays.equals(merged, oneShot),
      "incrementally merged sketch != one-shot sketch")

    // marked replay: same batch id -> table byte-identical
    CmsGate.absorb(b2, 1L, table)
    assert(java.util.Arrays.equals(mountedBytes(table), oneShot),
      "marked replay changed the sketch")

    // unmarked re-add: totalCount inflates by |b2 tokens| — the
    // failure mode the marker exists to prevent
    val before = CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(mountedBytes(table))).totalCount()
    CmsGate.absorb(b2, 2L, table) // fresh id = the same rows re-added
    val after = CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(mountedBytes(table))).totalCount()
    assert(after > before, "re-adding a batch must inflate the additive sketch")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("live foreachBatch stream lands the one-shot sketch") {
    val docs = Tables.documents(spark, d)
    val table = "graft_test_cms_live"
    CmsGate.init(docs.filter(col("doc_id") % 4 =!= 0), table)

    implicit val sq = spark.sqlContext
    val rows = docs.filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .as[(Long, String, String, String, Long)].collect()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(Long, String, String, String, Long)]
    val stream = input.toDF()
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cms-gate-ckpt").toString)
      .foreachBatch(CmsGate.sink(table) _)
      .start()
    input.addData(b1.toSeq); stream.processAllAvailable()
    input.addData(b2.toSeq); stream.processAllAvailable()
    stream.stop()

    assert(java.util.Arrays.equals(mountedBytes(table),
      CmsGate.sketchBytes(docs).get),
      "live stream sketch != one-shot sketch")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
