package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Similarity
import graft.streaming.AnnIngest

/** Streaming ANN index maintenance: streamed assignments must equal
  * the batch path under the same (mounted) quantizer, the bucketed
  * index must accumulate exactly the ingested rows, and a replayed
  * vector must not duplicate index rows. */
class AnnIngestSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("streamed assignments equal the batch path; index accumulates; replay is idempotent") {
    implicit val sq = spark.sqlContext
    val table = "graft_test_ann_ingest"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val emb = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") % 4 === 0)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val (b1, b2) = emb.splitAt(emb.length / 2)

    val input = MemoryStream[(Long, Array[Float])]
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val q = AnnIngest.start(
      input.toDF().toDF("vec_id", "embedding"), d,
      Files.createTempDirectory("graft-ann-ingest").toString, table,
      (df, id) => seen ++= df.collect().map(r => (id, r.getLong(0), r.getLong(1))))
    input.addData(b1.toIndexedSeq)
    q.processAllAvailable()
    input.addData(b2.toIndexedSeq)
    q.processAllAvailable()
    // replay guard: batch 3 re-delivers batch 1's vectors — the index
    // must not grow (anti-join drops already-written vec_ids)
    input.addData(b1.toIndexedSeq)
    q.processAllAvailable()
    q.stop()

    val want = graft.streaming.AnnIngest.qAnnIngest(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // streamed verdicts across batches 0+1 == the batch analog
    val streamed = seen.filter(_._1 <= 1L).map(t => (t._2, t._3)).sortBy(_._1).toSeq
    assert(streamed == want, s"first diff: ${streamed.zip(want).find(p => p._1 != p._2)}")
    // batch 2 (the replay) re-emitted the SAME assignments (frozen
    // quantizer determinism)
    val replayed = seen.filter(_._1 == 2L).map(t => (t._2, t._3)).sortBy(_._1).toSeq
    assert(replayed == b1.map(_._1).sorted.map(id => want.find(_._1 == id).get).toSeq)
    // the index holds exactly one row per ingested vector
    val idx = spark.table(table).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(idx.sortBy(_._1) == want, "index must accumulate exactly the ingested rows, no dups")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("a fresh session mounts the quantizer and assigns identically") {
    val a1 = AnnIngest.qAnnIngest(spark, d).collect().toSeq
    Similarity.clearArtifactMemos() // simulate restart; saved table remains
    val s2 = spark.newSession()
    val a2 = AnnIngest.qAnnIngest(s2, d).collect().toSeq
    assert(a1 == a2, "mounted quantizer must reproduce assignments bit-for-bit")
  }
}
