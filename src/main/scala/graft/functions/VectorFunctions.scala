package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Vector math over `ARRAY<FLOAT>` embedding columns, expressed with
  * higher-order array functions (zip_with / aggregate) — columnar, no
  * UDF, no collect.
  *
  * Two precision tiers:
  *  - `dot`/`cosine`: plain double accumulation — fast path for
  *    candidate generation and ranking at scale.
  *  - `dotExact`/`cosineExact`: decimal-exact accumulation — order-
  *    independent and bit-identical across engines; used for final
  *    thresholds/output so results hash-match the DuckDB oracle.
  * The composition (cheap filter at `threshold - eps`, exact filter at
  * `threshold`) gives oracle-exact semantics while doing decimal work
  * only on the tiny survivor set — the pattern that survives a 100x
  * scale-up.
  */
object VectorFunctions {
  /** decimal(30,12): 30 not 38, so decimal+decimal keeps scale 12
    * (at precision 38 Spark's widening drops a fractional digit). */
  private val Dec = DecimalType(30, 12)

  private def toD(c: Column): Column = c.cast(DoubleType)

  /** Fast double dot product (sequential fold, engine-local). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => toD(x) * toD(y)),
      lit(0.0), (acc, v) => acc + v)

  /** Exact, order-independent dot product (cross-engine stable). */
  def dotExact(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (toD(x) * toD(y)).cast(Dec)),
      lit(0).cast(Dec), (acc, v) => (acc + v).cast(Dec))
      .cast(DoubleType)

  /** Exact squared L2 norm. */
  def norm2Exact(a: Column): Column = dotExact(a, a)

  /** Fast cosine from precomputed squared norms. */
  def cosineFromParts(dotCol: Column, n2a: Column, n2b: Column): Column =
    dotCol / (sqrt(n2a) * sqrt(n2b))
}
