package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{IngestPipeline, QualityGate, SpanGate}

/** The composed ingest pipeline: per-doc verdicts must equal the
  * independent gates' verdicts (composition adds sequencing, never
  * changes a verdict), the funnel must count sequentially, and — the
  * property the composition exists for — only docs admitted by BOTH
  * stages may absorb into the span index. */
class IngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  // 31-token corpus (QualityGateSpec's): V=31, so all-unseen text
  // scores ln(31)=3.434 nats > the 3.42 bound (quality-rejected) and
  // corpus-like text scores ln(32)-ln(2)=2.77 (quality-admitted)
  private val corpusText = (1 to 31).map(i => s"t$i").mkString(" ")
  private val corpus = Seq((1L, corpusText)).toDF("doc_id", "text")

  test("composed verdicts equal the independent gates' verdicts") {
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d)
    val corp = docs.filter(col("doc_id") % 4 =!= 0)
    val batch = docs.filter(col("doc_id") % 4 === 0)
    val lm = QualityGate.trainLm(corp)
    val spans = SpanGate.indexSpans(corp)
    val got = IngestPipeline.verdicts(batch, lm, spans).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val q = QualityGate.score(batch, lm).collect()
      .map(r => (r.getLong(0), r.getLong(5))).toMap
    val sp = SpanGate.novelty(batch, spans).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toMap
    val ids = batch.select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    val want = ids.map { id =>
      val (qa, sa) = (q.getOrElse(id, 1L), sp.getOrElse(id, 1L))
      (id, qa, sa, if (qa == 1L && sa == 1L) 1L else 0L)
    }
    assert(got == want, "composition changed a verdict")
    // non-vacuous: the funnel must actually drop at each stage
    val f = IngestPipeline.qIngestFunnel(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(f.length == 2 && f(0)._4 > 0 && f(1)._4 > 0,
      s"both stages should drop documents on this corpus: ${f.toSeq}")
    assert(f(0)._3 == ids.length && f(1)._3 == f(0)._5,
      "sequential funnel: stage 2 input must be stage 1 output")
  }

  test("collapse cadence: index survives collapse with content intact") {
    val state = new IngestPipeline.IngestState(corpus, collapseEvery = 2)
    var verdicts = Map.empty[Long, Long]
    def sink(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      verdicts ++= df.collect().map(r => r.getLong(0) -> r.getLong(3))
    val novel1 = "t1 t2 t1 t2 t1 t2 t1 t2 t1"
    val novel2 = "t3 t4 t3 t4 t3 t4 t3 t4 t3"
    state.process(Seq((100L, novel1)).toDF("doc_id", "text"), 0L, sink)
    state.process(Seq((200L, novel2)).toDF("doc_id", "text"), 1L, sink) // collapse fires
    // both batches' content must still be visible after the collapse
    state.process(Seq((300L, novel1), (301L, novel2)).toDF("doc_id", "text"), 2L, sink)
    assert(verdicts(100L) == 1L && verdicts(200L) == 1L)
    assert(verdicts(300L) == 0L && verdicts(301L) == 0L,
      s"collapse lost absorbed content: $verdicts")
  }

  test("streaming: only docs admitted by BOTH stages absorb") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    val q = IngestPipeline.start(
      input.toDF().toDF("doc_id", "text"), corpus,
      Files.createTempDirectory("graft-ingest").toString,
      (df, _) => out ++= df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))

    // alternating pattern: bigram (t1,t2) is corpus-seen (and (t2,t1)
    // is smoothed mildly), so avg ~3.08 nats < 3.42 -> quality-admits;
    // but its two 8-word SPANS are novel (the corpus never repeats a
    // token), so it is span-novel too -> fully admitted
    val fluent = "t1 t2 t1 t2 t1 t2 t1 t2 t1"
    val noise = (1 to 9).map(i => s"x$i").mkString(" ")   // unseen bigrams
    // batch 0: noise is quality-rejected (span-novel but that cannot
    // save it); fluent passes both
    input.addData((100L, noise), (101L, fluent))
    q.processAllAvailable()
    // batch 1: a COPY of the admitted fluent doc must now be
    // span-rejected (absorbed last batch); a COPY of the rejected
    // noise doc must still be span-NOVEL (noise never absorbed) and
    // still quality-rejected
    input.addData((200L, fluent), (201L, noise))
    q.processAllAvailable()
    q.stop()

    val v = out.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(v(100L) == ((0L, 1L, 0L)), s"noise: q-reject, span-novel: ${v(100L)}")
    assert(v(101L) == ((1L, 1L, 1L)), s"fluent: both admit: ${v(101L)}")
    assert(v(200L) == ((1L, 0L, 0L)),
      s"fluent copy must be span-rejected — admitted doc did not absorb: ${v(200L)}")
    assert(v(201L) == ((0L, 1L, 0L)),
      s"noise copy must still be span-novel — rejected doc must NOT absorb: ${v(201L)}")
  }
}
