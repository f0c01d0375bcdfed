package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.TextAnalysis
import graft.streaming.SampleGate

/** Streaming priority-sample maintenance: the incremental absorb must
  * serve the SAME sample as the one-shot batch query no matter how
  * the stream is chopped (top-K closure), a replayed batch must
  * converge to the identical table (idempotence — the no-marker
  * claim), and a LIVE foreachBatch stream must land the same state as
  * the batch-simulated lifecycle. */
class SampleGateSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def tableRows(table: String): Set[(Long, Long, Long)] =
    spark.table(table).select(col("doc_id"), col("n_chars"), col("priority"))
      .as[(Long, Long, Long)].collect().toSet

  private def sampleRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("w_hat"))).toSeq

  test("incremental absorb serves the one-shot sample; replay is idempotent") {
    val docs = Tables.documents(spark, d)
    val table = "graft_test_psample_gate"
    SampleGate.init(docs.filter(col("doc_id") % 4 =!= 0), table)
    val b1 = docs.filter(col("doc_id") % 4 === 0 && col("doc_id") % 8 === 0)
    val b2 = docs.filter(col("doc_id") % 4 === 0 && col("doc_id") % 8 =!= 0)
    SampleGate.absorb(b1, table)
    SampleGate.absorb(b2, table)
    val incremental = sampleRows(SampleGate.summary(spark, table))
    val oneShot = sampleRows(TextAnalysis.qPrioritySample(spark, d))
    assert(incremental == oneShot, "incremental sample != one-shot sample")
    // at-least-once replay of the last batch: table must not move
    val before = tableRows(table)
    SampleGate.absorb(b2, table)
    assert(tableRows(table) == before, "replayed absorb changed the sketch")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("live foreachBatch stream lands the same sample as the batch lifecycle") {
    val docs = Tables.documents(spark, d)
    val table = "graft_test_psample_live"
    SampleGate.init(docs.filter(col("doc_id") % 4 =!= 0), table)

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
        java.nio.file.Files.createTempDirectory("psample-gate-ckpt").toString)
      .foreachBatch(SampleGate.sink(table) _)
      .start()
    input.addData(b1.toSeq); stream.processAllAvailable()
    input.addData(b2.toSeq); stream.processAllAvailable()
    stream.stop()

    val live = sampleRows(SampleGate.summary(spark, table))
    val oneShot = sampleRows(TextAnalysis.qPrioritySample(spark, d))
    assert(live == oneShot, "live stream sample != one-shot sample")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
