package graft.operators

import graft.{SparkTestSession, Tables}
import graft.functions.BloomAggregator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the Bloom sidecar (q276): membership never false-negative,
  * point reads correct through the pruned path, and the skip rate that is
  * the operator's whole point actually materializes. */
class BloomSidecarSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private lazy val outDir = {
    val od = "/tmp/graft_layout/spec/bloomsidecar"
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
    BloomSidecar.write(li, pmod(col("l_partkey"), lit(16)), "l_orderkey", od)
    od
  }

  private lazy val sampleKeys: Array[Long] =
    Tables(spark, dir, "lineitem").select(col("l_orderkey")).distinct()
      .orderBy("l_orderkey").limit(40).collect().map(_.getLong(0))

  test("no false negatives: every present key's rows survive the pruned read") {
    val li = Tables(spark, dir, "lineitem")
    sampleKeys.take(15).foreach { key =>
      val pruned = BloomSidecar.readPoint(spark, outDir, "l_orderkey", key).count()
      val full = li.filter(col("l_orderkey") === key).count()
      assert(pruned == full && full > 0, s"key $key: pruned=$pruned full=$full")
    }
  }

  test("present keys probe only the buckets that can hold them") {
    val sizes = sampleKeys.map(k => BloomSidecar.liveBuckets(spark, outDir, k).length)
    assert(sizes.forall(_ >= 1))
    val avg = sizes.sum.toDouble / sizes.length
    // an order has ~1-7 lineitems => <= 7 true buckets; fp rate is tiny at
    // this fill ratio, so the average must sit far below the 16 buckets
    assert(avg <= 8.0, s"average live buckets $avg — sidecar not pruning")
  }

  test("absent keys are rejected by nearly every bucket") {
    val maxKey = Tables(spark, dir, "lineitem")
      .agg(max(col("l_orderkey"))).collect()(0).getLong(0)
    val sizes = (1 to 100).map(i =>
      BloomSidecar.liveBuckets(spark, outDir, maxKey + 1000000L + i).length)
    val avg = sizes.sum.toDouble / sizes.length
    assert(avg <= 1.0, s"absent-key average live buckets $avg — fp rate off")
  }

  test("merge is the union build: bloom(A) OR bloom(B) == bloom(A ++ B)") {
    val agg = new BloomAggregator(1024, BloomSidecar.K)
    val a = (1L to 200L).foldLeft(agg.zero)(agg.reduce)
    val b = (150L to 400L).foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(a.clone(), b)
    val direct = ((1L to 200L) ++ (150L to 400L)).foldLeft(agg.zero)(agg.reduce)
    assert(merged.toSeq == direct.toSeq, "OR-merge diverged from the union build")
  }

  test("mightContain is pure arithmetic shared by build and probe") {
    val words = new Array[Long](BloomSidecar.MBits / 64)
    val agg = new graft.functions.BloomAggregator(BloomSidecar.MBits, BloomSidecar.K)
    val filled = (1L to 500L).foldLeft(agg.zero)(agg.reduce)
    (1L to 500L).foreach { k =>
      assert(BloomAggregator.mightContain(filled.toSeq, k, BloomSidecar.K), s"fn on $k")
    }
    assert(!BloomAggregator.mightContain(words.toSeq, 42L, BloomSidecar.K),
      "empty filter admitted a key")
  }
}
