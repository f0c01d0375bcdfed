package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** User-facing typed aggregation surface: a bounded top-k accumulator
  * as an `Aggregator[IN, BUF, OUT]` — the Dataset-API counterpart of
  * the window-function top-k (Relational.qWindowTopN). Keeps at most k
  * (score, id) pairs per group; merge is associative/commutative, so
  * partial aggregation applies and the shuffled state is O(k) per
  * group regardless of group size — the property that matters at
  * 100 TB (a sort-based top-k shuffles the whole group).
  */
class TopKAggregator(k: Int)
  extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: List[(Double, Long)] = Nil

  // buffer invariant: sorted by (-score, id), length <= k
  private def trim(xs: List[(Double, Long)]): List[(Double, Long)] =
    xs.sortBy { case (score, id) => (-score, id) }.take(k)

  override def reduce(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] = {
    // short-circuit the common case: buffer full and the incoming
    // element can't displace the current minimum — O(1) per row
    // instead of a full re-sort (the hot path for large groups)
    if (buf.lengthCompare(k) >= 0) {
      val last = buf.last
      // total ordering via Double.compare, NOT primitive </== — the
      // primitives treat -0.0 == 0.0 while trim()'s sortBy orders
      // -0.0 < 0.0, and any disagreement between the two paths makes
      // the aggregator's result depend on the partition split
      val c = java.lang.Double.compare(in._1, last._1)
      if (c < 0 || (c == 0 && in._2 >= last._2)) return buf
    }
    trim(in :: buf)
  }

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
