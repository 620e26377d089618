package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator: keeps the k largest (value, id) pairs
  * under (value DESC, id ASC) — the ALGEBRAIC form of a per-group
  * leaderboard (merge = merge-and-trim), so Spark plans it as
  * partial+final aggregation with k-bounded state on BOTH sides of the
  * shuffle. That is what makes it usable inside a WATERMARKED STREAMING
  * window (q176): per-open-window state is k pairs, not the window's
  * event list — the same bounded-state discipline as [[MinHashAggregator]]
  * (element-wise min) and TopKPerKeyExec's heaps, here as a reusable
  * `functions.udaf` value.
  *
  * The buffer stays a sorted Seq (k is small — sort-insert beats heap
  * bookkeeping at these sizes and keeps merge deterministic).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy { case (v, id) => (-v, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    trim(a +: b)

  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(x ++ y)

  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
