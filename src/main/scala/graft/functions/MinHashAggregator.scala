package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash aggregator (SURVEY.md §2B B38/B34): folds pre-hashed
  * shingle values (`PortableHash.h1`) into a fixed-width signature of
  * element-wise minima over the arithmetic permutations — one pass, O(perms)
  * state per group, partial-aggregable (merge = element-wise min), so Spark
  * plans it as partial+final HashAggregate with map-side combine: the shape
  * that survives 100 TB.
  *
  * Produces bit-identical signatures to the SQL formulation in
  * DedupQueries.q34b (asserted in AggregatorSpec).
  */
class MinHashAggregator extends Aggregator[Long, Array[Long], Seq[Long]] {
  private val perms = PortableHash.minhashPerms.toArray
  private val P = PortableHash.P

  override def zero: Array[Long] = Array.fill(perms.length)(Long.MaxValue)

  override def reduce(buf: Array[Long], h1: Long): Array[Long] = {
    var j = 0
    while (j < perms.length) {
      val (a, b) = perms(j)
      val v = (a * h1 + b) % P
      if (v < buf(j)) buf(j) = v
      j += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var j = 0
    while (j < x.length) { if (y(j) < x(j)) x(j) = y(j); j += 1 }
    x
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
