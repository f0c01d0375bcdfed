package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Helpers that make floating-point aggregates deterministic and
  * engine-portable, so results hash-match the DuckDB oracle bit-for-bit.
  *
  * Why: `sum(double)` depends on partition/accumulation order, which
  * differs between engines (and between runs at different parallelism).
  * Casting each addend to a decimal first makes the sum EXACT (integer
  * arithmetic underneath), hence order-independent; a single final cast
  * back to double is then the only rounding step and is identical in
  * both engines. Each per-row double->decimal cast is also deterministic
  * (round-to-nearest of a non-tie — no double is exactly at a .5*10^-s
  * boundary because those values are not dyadic rationals).
  *
  * This costs one decimal conversion per row versus a raw double sum —
  * at 100 TB the cost is dwarfed by the scan, and correctness across
  * retries/partitionings is worth it for any financial-grade pipeline.
  * Cheap raw-double variants can be swapped in when bit-exactness across
  * engines is not required.
  */
object Deterministic {
  private val Dec = DecimalType(38, 6)

  /** Order-independent sum of a double expression, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Order-independent mean: exact decimal sum divided by count.
    * The DuckDB mirror of these is the literal formula
    * `CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE)` (optionally
    * `/ count(x)`), written inline in SparkEntry.oracleSql. */
  def davg(c: Column): Column =
    sum(c.cast(Dec)).cast(DoubleType) / count(c)
}
