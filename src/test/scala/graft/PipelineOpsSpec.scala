package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.{Similarity, TextAnalysis}

/** Semantic properties of the round-2 pipeline operators (their
  * values are oracle-checked; these pin the intent). */
class PipelineOpsSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("PII scrub detects every planted pattern and removes them all") {
    import spark.implicits._
    val rows = TextAnalysis.qPiiScrub(spark, d).collect()
    assert(rows.nonEmpty)
    // each doc carries exactly one planted email/IP/phone (organic
    // text could add more, never fewer)
    for (r <- rows) {
      assert(r.getAs[Long]("n_emails") >= 1, s"email not detected: $r")
      assert(r.getAs[Long]("n_ips") >= 1, s"IP not detected: $r")
      assert(r.getAs[Long]("n_phones") >= 1, s"phone not detected: $r")
    }
    // and the scrub is total: re-scanning the scrubbed text (built by
    // the operator's OWN injection + redaction builders) finds none
    val residual = Tables.documents(spark, d)
      .select(TextAnalysis.piiScrubbed(TextAnalysis.piiInjected).as("clean"))
      .filter(regexp_count(col("clean"), lit(TextAnalysis.EmailRe)) > 0 ||
        regexp_count(col("clean"), lit(TextAnalysis.Ipv4Re)) > 0 ||
        regexp_count(col("clean"), lit(TextAnalysis.PhoneRe)) > 0)
      .count()
    assert(residual == 0, s"$residual docs still carry PII after scrubbing")
  }

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
