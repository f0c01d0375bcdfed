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

  // trim invariant: sorted by (-score, id), length <= k. The BUFFER
  // only promises "superset of the running top-k, length < 2k": new
  // elements are PREPENDED and the sort is paid once per k inserts
  // (the 2k high-water trim below) — amortized O(log k) per row
  // instead of a full re-sort per row, which matters now that the
  // derived ADC shortlist makes k a corpus fraction (round-20;
  // per-insert sorting was O(rows x k log k) per group). Dropping
  // below-top-k elements at any point never changes the final top-k,
  // and trim's (-score, id) key is a TOTAL order (sortBy on the
  // tuple, where -0.0 < 0.0 consistently), so the result is
  // partition-split-independent.
  private def trim(xs: List[(Double, Long)]): List[(Double, Long)] =
    xs.sortBy { case (score, id) => (-score, id) }.take(k)

  override def reduce(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] = {
    val nb = in :: buf
    if (nb.lengthCompare(2 * k) >= 0) trim(nb) else nb
  }

  // merge/finish re-establish the canonical sorted-top-k form — the
  // shuffled partial state is at most 2k-1 pairs per group either way
  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = trim(buf)

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
