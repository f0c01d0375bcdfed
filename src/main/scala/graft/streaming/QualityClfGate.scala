package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.Tables
import graft.operators.QualityClf
import graft.operators.QualityClf.QclfModel

/** Streaming TRAINED-CLASSIFIER quality gate — the discriminative
  * sibling of [[QualityGate]] (corpus-LM perplexity) and [[DsirGate]]
  * (importance weights): admit a document iff the frozen logistic
  * model scores it at least [[QualityClf.AdmitMinPX1e6]] — "more
  * reference-like than not" under the trained decision boundary
  * (VERDICT r15 #7's frozen-model gate variant).
  *
  * Like the other model gates the model is FROZEN: classifier scores
  * only mean something against a fixed trained boundary, so there is
  * no absorb step, no batch-order dependence, and an at-least-once
  * replay re-emits bit-identical verdicts.
  *
  * Scale posture: the model is the <= [[QualityClf.Buckets]]-row
  * weight table — a BOUNDED broadcast no matter the corpus — and per
  * trigger the batch's hashed-bigram fan-out joins it and re-aggs by
  * doc_id: verify cost O(batch tokens), shuffle O(batch docs);
  * corpus size appears only in the one-off training job. Verdicts
  * are integer-exact (hard-sigmoid micro-units, no float compare). */
object QualityClfGate {

  /** Train and persist the weight table, then read it back — the
    * restartable form ([[DsirGate.trainDisk]] convention): a later
    * stream (or different session) mounts the same frozen boundary
    * without retraining. */
  def trainDisk(corpusDocs: DataFrame, table: String): QclfModel = {
    val s = corpusDocs.sparkSession
    val w = QualityClf.train(corpusDocs)
    graft.sources.Writers.replaceTable(s, w, table)
    DedupGate.unpersistCheckpoints(w)
    QclfModel(s.table(table), Some(table))
  }

  /** Start the gate: train once (optionally persisted), then score
    * each micro-batch against the frozen model. Stateless per batch —
    * verdict rows are replay-stable. */
  def start(
      newDocs: DataFrame,
      corpusDocs: DataFrame,
      checkpointDir: String,
      sink: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.ProcessingTime(0),
      modelTable: Option[String] = None): StreamingQuery = {
    val m = modelTable.map(t => trainDisk(corpusDocs, t))
      .getOrElse(QclfModel(QualityClf.train(corpusDocs)))
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, id: Long) =>
        val batch = df.localCheckpoint(true)
        val verdicts = QualityClf.score(batch, m)
          .orderBy(col("doc_id")).localCheckpoint(true)
        sink(verdicts, id)
        DedupGate.unpersistCheckpoints(batch, verdicts)
      }
      .start()
  }

  /** Batch analog for the oracle gate: every doc_id % 4 == 0 document
    * as ONE "new" batch scored against the model trained on the rest
    * (the [[QualityGate.qQualityGate]] split). */
  def qQualityClfGate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    QualityClf.score(docs.filter(col("doc_id") % 4 === 0),
      QclfModel(QualityClf.train(docs.filter(col("doc_id") % 4 =!= 0))))
      .orderBy(col("doc_id"))
  }

  /** [[qQualityClfGate]] through the persisted-model path — same
    * result set (same oracle SQL): the proof that the saved model is
    * the model. */
  def qQualityClfGateDisk(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    QualityClf.score(docs.filter(col("doc_id") % 4 === 0),
      trainDisk(docs.filter(col("doc_id") % 4 =!= 0),
        DedupGate.gateTableName("qclf", d)))
      .orderBy(col("doc_id"))
  }
}
