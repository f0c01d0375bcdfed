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
  import graft.functions.expressions.FloatVectorExpressions._

  /** Fast double dot product — native codegen loop (FloatDot). */
  def dot(a: Column, b: Column): Column = float_dot(a, b)

  /** Exact, order-independent, engine-portable dot product — native
    * codegen fixed-point loop (FloatDotFixed): each product rounded to
    * 1e-12 (floor(p*1e12+0.5)) and summed in a long. The identical
    * closed formula runs on the DuckDB side, so values are
    * bit-identical across engines by construction. */
  def dotExact(a: Column, b: Column): Column = float_dot_fixed(a, b)

  /** Exact squared L2 norm. */
  def norm2Exact(a: Column): Column = float_dot_fixed(a, a)

  /** Raw integer numerator of the fixed-point dot (see
    * FloatDotFixedRaw): for consumers that sum several dots exactly
    * before the single final division. */
  def rawDot(a: Column, b: Column): Column = float_dot_fixed_raw(a, b)

  /** Fast cosine from precomputed squared norms. */
  def cosineFromParts(dotCol: Column, n2a: Column, n2b: Column): Column =
    dotCol / (sqrt(n2a) * sqrt(n2b))
}
