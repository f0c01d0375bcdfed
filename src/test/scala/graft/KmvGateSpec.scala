package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.TextAnalysis
import graft.streaming.KmvGate

/** Streaming KMV sketch maintenance: the incremental absorb must
  * equal the one-shot batch sketch no matter how the stream is
  * chopped (closure), a replayed batch must converge to the identical
  * table (idempotence — the gate's no-marker claim), and a LIVE
  * foreachBatch stream over MemoryStream must land the same table as
  * the batch-simulated lifecycle. */
class KmvGateSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def tableRows(table: String): Set[(String, Long)] =
    spark.table(table).select(col("source"), col("h"))
      .as[(String, Long)].collect().toSet

  test("incremental absorb equals the one-shot sketch; replay is idempotent") {
    val docs = Tables.documents(spark, d)
    val table = "graft_test_kmv_gate"
    KmvGate.init(docs.filter(col("doc_id") % 4 =!= 0), table)
    val b1 = docs.filter(col("doc_id") % 4 === 0 && col("doc_id") % 8 === 0)
    val b2 = docs.filter(col("doc_id") % 4 === 0 && col("doc_id") % 8 =!= 0)
    KmvGate.absorb(b1, table)
    KmvGate.absorb(b2, table)
    val incremental = tableRows(table)
    val oneShot = TextAnalysis.kmvSketch(TextAnalysis.kmvHashesOf(docs))
      .as[(String, Long)].collect().toSet
    assert(incremental == oneShot,
      s"incremental != one-shot: ${(incremental diff oneShot).take(3)} / " +
        s"${(oneShot diff incremental).take(3)}")
    // at-least-once replay of the last batch: table must not move
    KmvGate.absorb(b2, table)
    assert(tableRows(table) == oneShot, "replayed absorb changed the sketch")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("live foreachBatch stream lands the same table as the batch lifecycle") {
    val docs = Tables.documents(spark, d)
    val table = "graft_test_kmv_live"
    KmvGate.init(docs.filter(col("doc_id") % 4 =!= 0), table)

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
        java.nio.file.Files.createTempDirectory("kmv-gate-ckpt").toString)
      .foreachBatch(KmvGate.sink(table) _)
      .start()
    input.addData(b1.toSeq); stream.processAllAvailable()
    input.addData(b2.toSeq); stream.processAllAvailable()
    stream.stop()

    val live = tableRows(table)
    val oneShot = TextAnalysis.kmvSketch(TextAnalysis.kmvHashesOf(docs))
      .as[(String, Long)].collect().toSet
    assert(live == oneShot,
      s"live stream table != one-shot sketch (${live.size}/${oneShot.size})")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
