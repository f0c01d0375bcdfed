package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.QualityClf
import graft.operators.QualityClf.QclfModel
import graft.streaming.QualityClfGate

/** The classifier gate's drift wire: a frozen model serving a stream
  * it no longer represents must raise a standing retrain
  * recommendation — and a calibrated stream must NOT. The batch
  * analog (q_quality_clf_drift) is oracle-gated; this spec drives the
  * STREAMING wire end-to-end through the gate. */
class QclfDriftSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def corpus = Tables.documents(spark, d)

  test("planted drifted stream trips the wire; calibrated stream stays quiet") {
    val pool = corpus.filter(col("doc_id") % 4 =!= 0)
    val m = QclfModel(QualityClf.train(pool))
    val (n, s1, s2) = QualityClfGate.scoreBaseline(pool, m)
    assert(n >= 2, "baseline needs training scores")

    // ---- calibrated: batches ARE the training pool -> mean == mu,
    // z == 0 exactly, wire must stay quiet at any patience
    val calm = new QualityClfGate.QclfDriftMonitor(n, s1, s2)
    val poolStats = QualityClf.score(pool, m)
      .agg(count(lit(1)), avg(col("p_x1e6"))).head()
    (1 to 5).foreach { _ =>
      calm.observe(poolStats.getLong(0), poolStats.getDouble(1))
    }
    assert(!calm.advice, "calibrated stream tripped the drift wire")

    // ---- drifted: junk documents (one token repeated — bigram
    // evidence the model never trained on, funnel-dead by every
    // rule), big batches so the standard error is tiny
    val junk = (1L to 200L).map(i =>
      (i, Seq.fill(40)("zqx").mkString(" "), 120L)).toDF("doc_id", "text", "n_chars")
    val junkStats = QualityClf.score(junk, m)
      .agg(count(lit(1)), avg(col("p_x1e6"))).head()
    val zJunk = new QualityClfGate.QclfDriftMonitor(n, s1, s2)
      .zOf(junkStats.getLong(0), junkStats.getDouble(1))
    assert(math.abs(zJunk) > QualityClfGate.DriftZCut,
      s"junk batch z=$zJunk not beyond the cut — drift construction too weak")

    // through the actual streaming gate: patience-1 junk batches keep
    // it quiet, the patience-th trips it, and the advice STANDS
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val mon = new QualityClfGate.QclfDriftMonitor(n, s1, s2)
    val ckpt = Files.createTempDirectory("qclf-drift").toString
    var batches = 0
    val q = QualityClfGate.start(
      input.toDF().toDF("doc_id", "text", "n_chars"),
      pool, ckpt,
      (verdicts, _) => { verdicts.count(); batches += 1 },
      monitor = Some(mon))
    try {
      (0 until QualityClfGate.DriftPatience).foreach { k =>
        input.addData((1L to 50L).map(i =>
          (k * 1000L + i, Seq.fill(40)("zqx").mkString(" "), 120L)))
        q.processAllAvailable()
        if (k < QualityClfGate.DriftPatience - 1)
          assert(!mon.advice, s"tripped early at batch ${k + 1}")
      }
      assert(mon.advice, "drifted stream did not trip the wire")
      // standing: a later calibrated batch does not clear the advice
      input.addData(pool.select(col("doc_id") + 100000L, col("text"), col("n_chars"))
        .as[(Long, String, Long)].collect().toSeq.take(50))
      q.processAllAvailable()
      assert(mon.advice, "retrain recommendation must STAND once tripped")
      assert(batches >= QualityClfGate.DriftPatience, "gate did not run all batches")
    } finally q.stop()
  }

  test("batch analog emits both verdict classes on a drift-free corpus") {
    // the %4 stream is drawn from the same distribution as the
    // training pool — all batches should be quiet (|z| <= cut) OR at
    // most noise-level exceptions; pin the structural invariants the
    // oracle also hashes: one row per non-empty batch, counts
    // consistent, z finite
    val rows = QualityClfGate.qQualityClfDrift(spark, d).collect()
    assert(rows.nonEmpty, "no drift batches at sf0.001")
    rows.foreach { r =>
      val (nDocs, nAdmit, z) = (r.getLong(1), r.getLong(2), r.getDouble(4))
      assert(nAdmit >= 0 && nAdmit <= nDocs, "admit count out of range")
      assert(!z.isNaN && !z.isInfinite, "z must be finite on a real baseline")
    }
  }
}
