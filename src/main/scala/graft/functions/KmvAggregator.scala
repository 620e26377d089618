package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct sketch (Bar-Yossef et al. 2002; Beyer et al.,
  * "On Synopses for Distinct-Value Estimation Under Multiset Operations",
  * SIGMOD 2007 — public literature): keep the `k` smallest DISTINCT hash
  * values seen. Estimator: with hashes uniform on [0, 2⁶⁰), the k-th
  * minimum h_k gives |D| ≈ (k−1)·2⁶⁰/h_k; fewer than k distinct values ⇒
  * the sketch IS the distinct set (exact count).
  *
  * Two properties make this the oracle-checkable sibling of the HLL rollup
  * (q187):
  *
  *  - ORDER-FREE AND EXACT-DETERMINISTIC: the k smallest distinct values
  *    of a set do not depend on arrival or merge order, so (unlike
  *    Misra–Gries) the full single-pass-equality law holds and DuckDB can
  *    reproduce the sketch — and therefore the estimate — bit-for-bit
  *    with ORDER BY h LIMIT k. The whole estimator is hash-verifiable.
  *  - MULTISET ALGEBRA: sketches merge by union+trim (partial+final
  *    aggregation, O(k) state both sides of the shuffle), and two sketches
  *    support INTERSECTION estimation (Beyer §4): of the bottom-k L of
  *    A∪B, ρ = |L ∩ A ∩ B| estimates Jaccard as ρ/k — the one set
  *    operation HLL cannot do without inclusion–exclusion blowup (q190b).
  *
  * Buffer: ascending-sorted distinct Seq[Long], ≤ k elements.
  */
class KmvAggregator(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 2, s"k must be >= 2 (the estimator needs h_k), got $k")

  private def trim(s: Seq[Long]): Seq[Long] = s.distinct.sorted.take(k)

  override def zero: Seq[Long] = Seq.empty

  override def reduce(b: Seq[Long], h: Long): Seq[Long] =
    // fast path: full sketch and h can't displace anything
    if (b.length == k && h >= b.last) b
    else if (b.contains(h)) b
    else trim(b :+ h)

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = trim(x ++ y)

  override def finish(b: Seq[Long]): Seq[Long] = b

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** [[KmvAggregator]] with COUNT(DISTINCT)-compatible null semantics: the
  * input is the (nullable) 60-bit hash and null inputs are SKIPPED, never
  * folded — exactly how Count(distinct c) ignores null c. Used by the
  * approx-count-distinct optimizer rewrite
  * ([[graft.plans.ApproxCountRewrite]]), where the hash expression
  * evaluates to null whenever the counted column is null. */
class KmvNullSkipAggregator(k: Int)
  extends Aggregator[Option[Long], Seq[Long], Seq[Long]] {
  require(k >= 2, s"k must be >= 2 (the estimator needs h_k), got $k")

  private def trim(s: Seq[Long]): Seq[Long] = s.distinct.sorted.take(k)

  override def zero: Seq[Long] = Seq.empty

  override def reduce(b: Seq[Long], in: Option[Long]): Seq[Long] = in match {
    case None => b
    case Some(h) =>
      if (b.length == k && h >= b.last) b
      else if (b.contains(h)) b
      else trim(b :+ h)
  }

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = trim(x ++ y)

  override def finish(b: Seq[Long]): Seq[Long] = b

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
