package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Custom Catalyst aggregate: 64-bit SimHash of a group of
  * (hash, weight) pairs — the weighted-majority-vote-per-bit signature
  * in ONE imperative pass with a 64-long buffer per group.
  *
  * Why a TypedImperativeAggregate and not 64 sum() expressions: the
  * expression formulation materializes a 64-column intermediate row
  * per group and evaluates 64 shift/multiply expression trees per
  * input row; this buffer does the same work in a primitive loop
  * (~2x wall-clock on the sf0.1 corpus) and shrinks the shuffle to
  * one binary buffer per group — at 100 TB the partial-aggregation
  * traffic is 64 longs per (doc) instead of a wide row.
  */
case class SimHashAgg(
    hashChild: Expression,
    weightChild: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(hashChild, weightChild)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = hashChild.eval(input)
    val w = weightChild.eval(input)
    if (h != null && w != null) {
      val hv = h.asInstanceOf[Long]
      val wv = w.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        if (((hv >>> j) & 1L) == 1L) buf(j) += wv else buf(j) -= wv
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var j = 0
    while (j < 64) { if (buf(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    var j = 0
    while (j < 64) { bb.putLong(buf(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](64)
    var j = 0
    while (j < 64) { buf(j) = bb.getLong(); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(hashChild = c(0), weightChild = c(1))
}

object SimHashAgg {
  /** simhash_agg(hash64, weight) as an aggregate Column. */
  def simhash_agg(hash64: Column, weight: Column): Column =
    Bridge.column(
      SimHashAgg(Bridge.expression(hash64), Bridge.expression(weight))
        .toAggregateExpression())
}
