package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Classic k-hash Bloom filter (Bloom 1970; Broder & Mitzenmacher's survey —
  * public literature) as a typed Aggregator, built because Spark's own
  * `BloomFilterAggregate` is reserved for the optimizer's runtime join
  * filters and is not in the public function registry. Used by
  * `BloomSidecar` as a PER-FILE membership index: one fixed-size bit array
  * per bucket, merged by bitwise OR.
  *
  * Why this shape scales: the state is `mBits/64` longs regardless of input
  * size, reduce is k bit-sets, merge is a word-wise OR — so Spark plans
  * partial+final HashAggregate with map-side combine and the shuffle
  * carries one fixed-size array per bucket, never keys. The filter
  * guarantees NO FALSE NEGATIVES (a key that was added always tests true —
  * BloomSidecarSpec's property), while false positives are bounded by the
  * fill ratio: p ≈ (1 − e^(−k·n/m))^k.
  *
  * Bit positions come from k splitmix64 finalizer mixes (public-domain
  * constant set from Vigna's splitmix64 reference) of `key + (j+1)·φ64`, so
  * sidecar build and probe agree on pure arithmetic — no library bloom
  * encoding, no serialization format to keep in sync.
  */
class BloomAggregator(mBits: Int, k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64, got $mBits")
  require(k >= 1 && k <= 16, s"k must be in [1, 16], got $k")

  override def zero: Array[Long] = new Array[Long](mBits / 64)

  override def reduce(b: Array[Long], key: Long): Array[Long] = {
    var j = 0
    while (j < k) {
      val p = BloomAggregator.bitPos(key, j, mBits)
      b(p >>> 6) |= 1L << (p & 63)
      j += 1
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) |= y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BloomAggregator {
  /** j-th bit position for `key` on an `mBits` filter — splitmix64
    * finalizer over key + (j+1)·φ64; unsigned remainder keeps the full
    * 64-bit mix. */
  def bitPos(key: Long, j: Int, mBits: Int): Int = {
    var z = key + 0x9E3779B97F4A7C15L * (j + 1)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    java.lang.Long.remainderUnsigned(z, mBits.toLong).toInt
  }

  /** Probe-side membership test over a stored word array (Seq as read back
    * from a parquet array<bigint> sidecar column). */
  def mightContain(words: Seq[Long], key: Long, k: Int): Boolean = {
    val mBits = words.length * 64
    var j = 0
    while (j < k) {
      val p = bitPos(key, j, mBits)
      if ((words(p >>> 6) & (1L << (p & 63))) == 0L) return false
      j += 1
    }
    true
  }
}
