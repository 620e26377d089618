package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary with capacity `m` (Misra & Gries
  * 1982; mergeable form per Agarwal et al., "Mergeable Summaries",
  * PODS 2012 — both public literature). The summary holds at most `m`
  * (item, counter) pairs and guarantees, over a stream of n items:
  *
  *  - NO FALSE NEGATIVES: every item with true frequency > n/(m+1) is
  *    present in the summary;
  *  - counter error: stored count ∈ [freq − n/(m+1), freq].
  *
  * Both properties survive [[merge]] (sum counters pointwise, then subtract
  * the (m+1)-th largest counter from all and drop ≤0 — the error bounds
  * add, staying ≤ n_total/(m+1)), which is exactly what makes this a
  * partial+final Spark aggregation with O(m) state on BOTH sides of the
  * shuffle: each map task summarizes its partition in m counters, the
  * reduce side merges task summaries — the full item domain is never
  * aggregated anywhere.
  *
  * The summary CONTENT depends on arrival/merge order (any MG run does),
  * but the no-false-negative guarantee holds under every order — so a
  * candidates→exact-verify pipeline (q188) built on it is deterministic
  * end to end even though the intermediate summary is not.
  */
class MisraGriesAggregator(m: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(m >= 1, s"capacity must be >= 1, got $m")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    b.get(item) match {
      case Some(c) => b.updated(item, c + 1)
      case None if b.size < m => b.updated(item, 1L)
      // full and item absent: decrement every counter (the classic MG
      // step — equivalent to deleting m+1 distinct items from the stream)
      case None => b.transform((_, c) => c - 1).filter(_._2 > 0)
    }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val summed =
      y.foldLeft(x) { case (acc, (k, c)) => acc.updated(k, acc.getOrElse(k, 0L) + c) }
    if (summed.size <= m) summed
    else {
      // subtract the (m+1)-th largest counter from all, drop non-positive:
      // keeps ≤ m entries and charges every surviving counter the same
      // deletion mass, preserving the error bound (Agarwal et al. §3.1)
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse).apply(m)
      summed.transform((_, c) => c - cut).filter(_._2 > 0)
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
