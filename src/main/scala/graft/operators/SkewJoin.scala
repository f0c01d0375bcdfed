package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}

import graft.Tables

/** Skew-resilient equi-join via key salting (SURVEY §7 "100 TB
  * posture"): when one join key dominates (hot key), a plain shuffle
  * join sends the whole hot partition to one task. Salting splits each
  * fact key into `saltBuckets` sub-keys and replicates the (small,
  * but not broadcastable) build side across the same bucket range, so
  * the hot key fans out over `saltBuckets` tasks.
  *
  * AQE's runtime skew-join handling (spark.sql.adaptive.skewJoin) is
  * the first line of defense; explicit salting is for the cases AQE
  * can't fix (aggregation keys, deterministic layout, or builds where
  * the skew is known ahead of time). Both are part of this engine's
  * scale toolkit.
  */
object SkewJoin {

  /** Salted inner equi-join: `facts.join(dim)` on factKey = dimKey.
    * The dim side is replicated saltBuckets times (explode of a
    * sequence — columnar, no driver loop); the fact side gets a
    * uniform random-free salt derived from a stable hash of the whole
    * row id expression so results are deterministic. */
  def saltedJoin(
      facts: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      saltCol: Column,
      saltBuckets: Int = 8): DataFrame = {
    val saltedFacts = facts.withColumn("__salt",
      pmod(saltCol, lit(saltBuckets)).cast(IntegerType))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("__salt", col("__salt").cast(IntegerType))
    saltedFacts.join(saltedDim,
        saltedFacts(factKey) === saltedDim(dimKey) &&
        saltedFacts("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }

  val SaltBuckets = 8

  /** Hot-key demonstration query: every 'click' event collapses onto
    * nation key 0 (a manufactured ~25% hot key — the keyBy-skew failure
    * mode of the reference's report job at scale), the rest spread by
    * user_id. The salted join fans the hot key over [[SaltBuckets]]
    * reducer tasks (asserted by SkewJoinSpec); results are identical to
    * the plain join, which is what the DuckDB oracle runs. The
    * shuffle_hash hint keeps the demo on the shuffle path a
    * non-broadcastable dim would take at 100 TB. */
  def qSkewJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      when(col("event_type") === "click", lit(0L))
        .otherwise(pmod(col("user_id"), lit(25L)))
        .cast(LongType).as("sk"),
      col("value"), col("event_id"))
    val dim = Tables.nation(s, d)
      .select(col("n_nationkey"), col("n_name"))
      .hint("shuffle_hash")
    saltedJoin(ev, dim, "sk", "n_nationkey", col("event_id"), SaltBuckets)
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(38, 6))).cast(DoubleType).as("sum_value"))
      .orderBy(col("n_name"))
  }
}
