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
  * Two properties make this the oracle-checkable sibling of native HLL
  * sketches (whose union law ApproxAndRecallSpec pins):
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
  * Buffer: ascending-sorted distinct Seq[Long], ≤ k elements — an invariant
  * every update path preserves (zero is empty, reduce inserts in place,
  * merge re-sorts), so the per-row reduce is one binary search plus at most
  * one primitive-array copy instead of the old contains + distinct.sorted
  * rebuild (the pre-shuffle hot path the rewrite's cheapness depends on).
  */
class KmvAggregator(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 2, s"k must be >= 2 (the estimator needs h_k), got $k")

  private def trim(s: Seq[Long]): Seq[Long] = s.distinct.sorted.take(k)

  override def zero: Seq[Long] = Seq.empty

  override def reduce(b: Seq[Long], h: Long): Seq[Long] = KmvOps.insert(b, h, k)

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
    case Some(h) => KmvOps.insert(b, h, k)
  }

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = trim(x ++ y)

  override def finish(b: Seq[Long]): Seq[Long] = b

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** KMV sketch MERGE aggregator — the rollup half of the multiset algebra
  * (Beyer 2007 §3): input rows are already-built bottom-`k` sketches (one
  * per finer-grained cell, e.g. per hour) and the output is the bottom-`k`
  * of their union — which, because "the k smallest distinct values of a
  * set" is closed under union (any hash in the union's true bottom-k is in
  * its own cell's bottom-k), EQUALS the sketch built directly from the raw
  * rows. That exact closure law is what lets the q187 rollup keep a full
  * byte-level oracle: DuckDB computes the direct per-type sketch, the
  * engine computes hourly-then-merged, and the hash compare IS the proof
  * of mergeability. O(k) state per group on both sides of the shuffle. */
class KmvMergeAggregator(k: Int)
  extends Aggregator[Seq[Long], Seq[Long], Seq[Long]] {
  require(k >= 2, s"k must be >= 2 (the estimator needs h_k), got $k")

  private def trim(s: Seq[Long]): Seq[Long] = s.distinct.sorted.take(k)

  override def zero: Seq[Long] = Seq.empty

  override def reduce(b: Seq[Long], sk: Seq[Long]): Seq[Long] =
    if (sk == null || sk.isEmpty) b else trim(b ++ sk)

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = trim(x ++ y)

  override def finish(b: Seq[Long]): Seq[Long] = b

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** Shared per-row update for the KMV buffers. The buffer is ascending-
  * sorted and distinct, so membership and insertion point are ONE
  * `Arrays.binarySearch` over a primitive array (O(log k)), and the insert
  * is at most one `arraycopy` — no boxing, no HashSet, no re-sort. */
private[functions] object KmvOps {
  def insert(b: Seq[Long], h: Long, k: Int): Seq[Long] = {
    val arr = b.toArray
    val n = arr.length
    if (n == k && h >= arr(n - 1)) return b // full and h can't displace
    val i = java.util.Arrays.binarySearch(arr, h)
    if (i >= 0) return b // already present
    val ins = -i - 1
    val outLen = if (n == k) k else n + 1
    val out = new Array[Long](outLen)
    System.arraycopy(arr, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(arr, ins, out, ins + 1, outLen - ins - 1)
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }
}
