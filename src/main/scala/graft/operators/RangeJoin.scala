package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Range join (points-to-intervals), bucketized: Spark plans a naive
  * `p.x BETWEEN i.lo AND i.hi` join as a broadcast nested loop — O(N*M)
  * and a scale hazard. The standard rewrite decomposes the range
  * predicate into an EQUI-join on a computed bucket id plus a residual
  * filter: intervals explode into the buckets they cover (bounded
  * fan-out for bounded interval length), points map to one bucket, the
  * join is hash-partitioned, and the residual BETWEEN re-checks
  * exactly. Cost drops to O(N + M * avg_buckets_per_interval).
  */
object RangeJoin {

  /** Generic bucketed range join: `points` with point column px,
    * `intervals` with [lo, hi] columns (inclusive), bucketWidth in the
    * same units. All three must be long-typed expressions. */
  def bucketedRangeJoin(
      points: DataFrame, px: Column,
      intervals: DataFrame, lo: Column, hi: Column,
      bucketWidth: Long): DataFrame = {
    // exact integral division (Catalyst IntegralDivide) — `/` is
    // double division and loses exactness beyond 2^53, which would
    // silently misplace buckets and drop matching pairs
    def ldiv(c: Column): Column = org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graft.Bridge.expression(c.cast(LongType)),
        org.apache.spark.sql.catalyst.expressions.Literal(bucketWidth)))
    val p = points.withColumn("__bucket", ldiv(px))
    val iv = intervals
      .withColumn("__bucket", explode(sequence(ldiv(lo), ldiv(hi))))
    p.join(iv, Seq("__bucket")).filter(px.between(lo, hi)).drop("__bucket")
  }

  /** Price-band profile of the parts table via the bucketed range
    * join: deterministic $10 bands over the retail price domain. */
  def qPriceBandJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bands = (0 until 10).map(i => (i.toLong, 900L + 10 * i, 909L + 10 * i))
      .toDF("band_id", "lo_d", "hi_d")
    // work in integer dollars so bucket arithmetic is exact
    val parts = Tables.part(s, d)
      .select(col("p_partkey"), col("p_retailprice"),
        floor(col("p_retailprice")).cast(LongType).as("price_d"))
    // width 7 deliberately misaligned with the $10 bands so intervals
    // span bucket boundaries and the explode fan-out path is exercised
    bucketedRangeJoin(parts, col("price_d"), bands, col("lo_d"), col("hi_d"), 7L)
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_parts"),
        graft.functions.Deterministic.dsum(col("p_retailprice")).as("sum_price"))
      .orderBy(col("band_id"))
  }
}
