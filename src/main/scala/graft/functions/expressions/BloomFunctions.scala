package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graft.Bridge

/** Column wrappers over Spark's OWN bloom-filter Catalyst expressions
  * (the machinery behind runtime row-group filtering) — `might_contain`
  * is a codegen'd predicate against a binary literal, so a bloom
  * prefilter stays inside whole-stage codegen with zero extra
  * serialization per row.
  *
  * Items are xxhash64 longs on BOTH the build and probe side: the
  * aggregate `putLong`s and the probe `mightContainLong`s, so callers
  * must hash with the same seed (the default `xxhash64(col)` on each
  * side satisfies this). */
object BloomFunctions {

  /** Aggregate a LongType hash column into a serialized bloom filter
    * (BinaryType, one row). `nBits` controls the false-positive rate:
    * bits/item ~ -ln(fpp)/ln(2)^2, e.g. 20 bits/item gives fpp ~ 1e-4. */
  def bloom_agg(hash: Column, expectedItems: Long, nBits: Long): Column =
    Bridge.column(
      new BloomFilterAggregate(Bridge.expression(hash),
        Literal(expectedItems), Literal(nBits)).toAggregateExpression())

  /** Codegen'd membership probe of a LongType hash column against a
    * driver-held serialized filter (mounted as a foldable binary
    * literal, deserialized once per task). */
  def bloom_might_contain(filter: Array[Byte], hash: Column): Column =
    Bridge.column(
      BloomFilterMightContain(Literal(filter), Bridge.expression(hash)))
}
