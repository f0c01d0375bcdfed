package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

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
}
