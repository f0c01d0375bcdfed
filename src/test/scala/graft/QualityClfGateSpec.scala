package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.QualityClf
import graft.streaming.QualityClfGate

/** The trained quality classifier and its frozen-model gate: the
  * funnel label arithmetic, learning on a separable corpus
  * (train-set separation after the unrolled gradient rounds), memory
  * ≡ disk model equivalence, and frozen-model semantics through the
  * streaming wrapper. Cross-engine exactness is the oracle's job
  * (q_quality_clf* are hash-compared against DuckDB's unrolled CTE
  * replay); these tests pin the semantics. */
class QualityClfGateSpec extends SparkSpec {
  import spark.implicits._

  /** Passes all four funnel rules: >= 100 chars, mean word length in
    * [4,10], >= 5% stopwords, >= 30% distinct tokens. */
  private def goodText(seed: Int): String =
    s"the quick brown animal$seed jumps over lazy rivers while " +
      s"morning light spreads across quiet valley$seed fields and " +
      "distant mountains glow with warm amber color today"

  /** Fails lex-diversity (1 distinct token), stopwords (none), and
    * word length (2 chars). */
  private def badText(seed: Int): String =
    Seq.fill(60)(s"z$seed").mkString(" ")

  private def corpus = (1 to 8).flatMap { i =>
    Seq((i.toLong * 2, goodText(i), goodText(i).length.toLong),
      (i.toLong * 2 + 1, badText(i), badText(i).length.toLong))
  }.toDF("doc_id", "text", "n_chars")

  test("funnel labels: the four Gopher-band rules, integer cross-multiplied") {
    val got = QualityClf.labels(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    (1 to 8).foreach { i =>
      assert(got(i.toLong * 2) == 1L, s"good doc ${i * 2} not labeled 1")
      assert(got(i.toLong * 2 + 1) == 0L, s"bad doc ${i * 2 + 1} not labeled 0")
    }
    // a doc below the length band fails rule 1 even with good tokens
    val short = Seq((99L, "the quick brown animal", 22L))
      .toDF("doc_id", "text", "n_chars")
    assert(QualityClf.labels(short).head().getLong(1) == 0L,
      "sub-100-char doc must fail the length band")
  }

  test("the unrolled gradient rounds learn a separating boundary") {
    val w = QualityClf.train(corpus)
    assert(w.count() <= QualityClf.Buckets + 1,
      "weight table exceeded the hashed-feature bound")
    val scored = QualityClf.score(corpus, QualityClf.QclfModel(w))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    // on this cleanly-separable corpus the trained boundary must
    // classify its own training set perfectly
    scored.foreach { case (id, y, admit) =>
      assert(admit == y, s"doc $id: admit=$admit but y=$y")
    }
  }

  test("batch analogs: disk-persisted model scores identically to memory") {
    val d = "/root/testdata/sf0.001"
    val mem = QualityClfGate.qQualityClfGate(spark, d).collect().toSeq
    val disk = QualityClfGate.qQualityClfGateDisk(spark, d).collect().toSeq
    assert(mem == disk, "persisted model diverged from the in-memory model")
    val admits = mem.map(_.getLong(5)).toSet
    assert(admits == Set(0L, 1L), "both verdict classes must be populated")
  }

  test("streaming gate: frozen model, batch-order-independent verdicts") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val verdicts = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val q = QualityClfGate.start(
      input.toDF().toDF("doc_id", "text", "n_chars"), corpus,
      Files.createTempDirectory("graft-qclfgate").toString,
      (df, id) => verdicts ++=
        df.collect().map(r => (id, r.getLong(0), r.getLong(5))))
    input.addData((100L, badText(1), badText(1).length.toLong))
    q.processAllAvailable()
    input.addData((200L, badText(1), badText(1).length.toLong),
      (201L, goodText(1), goodText(1).length.toLong))
    q.processAllAvailable()
    q.stop()
    // frozen: the batch-2 copy of the batch-1 doc gets the SAME
    // verdict (no absorption, no batch-order dependence)
    assert(verdicts.toSet ==
      Set((0L, 100L, 0L), (1L, 200L, 0L), (1L, 201L, 1L)), s"got $verdicts")
  }
}
