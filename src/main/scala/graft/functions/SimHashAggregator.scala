package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** 64-bit SimHash as a one-pass typed aggregator: input is a token hash
  * (PortableHash.md5Long), state is 64 signed bit-counters, merge is
  * element-wise addition (algebraic → map-side combined, hot-key-safe),
  * output packs the sign bits. The oracle-checked 16-bit query (q34d) is
  * the cross-engine-verifiable twin; this is the production width.
  */
class SimHashAggregator extends Aggregator[Long, Array[Int], Long] {

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(buf: Array[Int], h: Long): Array[Int] = {
    var i = 0
    while (i < 64) {
      buf(i) += (((h >>> i) & 1L).toInt * 2) - 1
      i += 1
    }
    buf
  }

  override def merge(x: Array[Int], y: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Int]): Long = {
    var out = 0L
    var i = 0
    while (i < 64) { if (buf(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}

object SimHash {
  /** Hamming distance between two SimHash signatures (near-dup metric). */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
