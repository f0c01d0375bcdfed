package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Interval (event-time attribution) join: for each left row, the
  * right rows with the same key whose timestamp lands inside
  * [left.ts, left.ts + maxDelay].
  *
  * One shape, two execution modes:
  *  - batch: a plain equi-join on the key with the interval as a range
  *    predicate — Spark plans a shuffled hash/sort-merge join on the
  *    key, so the range check is a post-join filter per key group (no
  *    cross product);
  *  - streaming: the identical call on two watermarked streams is
  *    Spark's stream-stream interval join — state on both sides,
  *    evicted once the watermark passes the interval bound
  *    (StreamStreamJoinSpec drives this form through this method).
  *
  * The batch analog `qIntervalJoin` is the oracle-checked surface:
  * click → purchase attribution within 10 minutes per user.
  */
object IntervalJoin {

  /** Generic interval join; works unchanged on batch frames and on
    * watermarked streaming frames.
    *
    * `joinType` extends the same shape to LEFT OUTER semantics: a left
    * row with no right match within the interval emits once with null
    * right columns. On streams that emission is watermark-driven —
    * Spark holds the left row in state until the watermark passes
    * `leftTs + maxDelay` (no match can still arrive), then emits the
    * null-padded row exactly once and evicts the state
    * (StreamStreamJoinSpec pins the exactly-once emission). This is
    * the real-pipeline default path: a click with no purchase must
    * still be attributed, just as the reference's enrichment emits
    * unmatched facts with a default (DataClean.java:81). */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      maxDelaySeconds: Int,
      joinType: String = "inner"): DataFrame = {
    // internal aliases: the natural call passes the same key/ts names
    // on both frames — often carved from the SAME source, where even
    // dataset-apply disambiguation collapses to a trivially-true
    // predicate (the classic self-join trap). Alias-qualified columns
    // resolve correctly in every call shape, batch or streaming.
    val (l, r) = (left.alias("__ij_l"), right.alias("__ij_r"))
    val (lk, rk) = (col(s"__ij_l.$leftKey"), col(s"__ij_r.$rightKey"))
    val (lt, rt) = (col(s"__ij_l.$leftTs"), col(s"__ij_r.$rightTs"))
    l.join(r,
      lk === rk &&
      rt >= lt &&
      rt <= lt + expr(s"interval $maxDelaySeconds seconds"),
      joinType)
  }

  /** Shared click→purchase attribution shape for the batch analogs;
    * only the join type differs between the two query surfaces. Gap
    * reported in exact epoch microseconds so the value is
    * engine-portable (no double arithmetic). */
  private def attribution(s: SparkSession, d: String, joinType: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
    intervalJoin(clicks, purchases, "user_id", "p_user", "click_ts", "purchase_ts", 600,
        joinType)
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))).as("gap_us"))
      .orderBy(col("click_id"), col("purchase_id"))
  }

  /** Batch attribution: purchases within 600 s of a click by the same
    * user. */
  def qIntervalJoin(s: SparkSession, d: String): DataFrame =
    attribution(s, d, "inner")

  /** Batch analog of the LEFT OUTER variant: every click appears —
    * attributed within 600 s where a purchase exists, null-padded
    * otherwise. Same plan as the inner form (hash join on user, range
    * residual); the outer side only changes null handling. */
  def qIntervalJoinOuter(s: SparkSession, d: String): DataFrame =
    attribution(s, d, "left_outer")
}
