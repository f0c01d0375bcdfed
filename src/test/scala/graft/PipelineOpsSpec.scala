package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.{Similarity, TextAnalysis}

/** Semantic properties of the round-2 pipeline operators (their
  * values are oracle-checked; these pin the intent). */
class PipelineOpsSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("chunking covers every token exactly once per stride window") {
    val chunks = TextAnalysis.qDocChunks(spark, d).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val toks = Tables.documents(spark, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(chunks.nonEmpty)
    for ((docId, rows) <- chunks) {
      val sorted = rows.sortBy(_.getAs[Long]("chunk_id"))
      val n = toks(docId).size
      // chunk count: starts step by Stride while inside the doc
      assert(sorted.length == (n - 1) / TextAnalysis.ChunkStride + 1)
      // stitching the first Stride tokens of each chunk plus the last
      // chunk's tail reproduces the document exactly
      val rebuilt = sorted.init.flatMap(
        _.getAs[String]("chunk_text").split(" ").take(TextAnalysis.ChunkStride)) ++
        sorted.last.getAs[String]("chunk_text").split(" ")
      assert(rebuilt.toSeq == toks(docId))
      // each chunk holds exactly min(ChunkTokens, tokens remaining)
      sorted.zipWithIndex.foreach { case (r, i) =>
        val expect = math.min(TextAnalysis.ChunkTokens, n - i * TextAnalysis.ChunkStride)
        assert(r.getAs[Long]("n_tok") == expect.toLong)
      }
    }
  }

  test("interval join resolves same-named key/ts columns on both sides") {
    import graft.operators.IntervalJoin
    val ev = Tables.events(spark, d)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val n = IntervalJoin.intervalJoin(c, p, "user_id", "user_id", "ts", "ts", 600).count()
    assert(n == IntervalJoin.qIntervalJoin(spark, d).count())
  }

  test("data split is total, disjoint by construction, and roughly proportioned") {
    val rows = TextAnalysis.qDataSplit(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables.documents(spark, d).count()
    assert(rows.values.sum == total) // every doc lands in exactly one split
    assert(rows("train") > rows("val") && rows("val") >= rows("test"))
  }

  test("quantization inverts to the original within one quantization step") {
    val err = Similarity.qEmbedQuantize(spark, d)
      .join(Tables.embeddings(spark, d), "vec_id")
      .select(col("qv"), col("scale"),
        expr("cast(element_at(embedding, cast(pos + 1 as int)) as double)").as("x"))
      .filter(col("scale") > 0)
      .select(abs(col("qv") / col("scale") - col("x")).as("e"), (lit(0.5) / col("scale")).as("bound"))
      .filter(col("e") > col("bound"))
      .count()
    assert(err == 0, s"$err components dequantize outside half a step")
    // int8 range respected
    val range = Similarity.qEmbedQuantize(spark, d)
      .agg(min(col("qv")), max(col("qv"))).collect().head
    assert(range.getLong(0) >= -127 && range.getLong(1) <= 127)
  }
}
