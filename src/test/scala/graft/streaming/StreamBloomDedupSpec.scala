package graft.streaming

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the rotating-Bloom bounded-state dedup (q279). The operator is
  * approximate BY DESIGN (rows-only in the registry), so its guarantees
  * live here:
  *  - within the dedup horizon (capacity not yet rotated through) it is
  *    EXACT: at sf0.01 every shard sees fewer inserts than one
  *    generation holds, so all originals are admitted and every
  *    re-arrival is dropped;
  *  - admissions are deterministic (arrival-key-ordered fold), so two
  *    runs agree row-for-row.
  */
class StreamBloomDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("q279 inside the horizon the bloom dedup is exact: all originals, no re-admissions") {
    val rows = SparkEntry.queries("q279_stream_bloom_dedup")(spark, dir).collect()
    val (re, orig) = rows.partition(_.getLong(2) == 1L)
    assert(orig.length == 500, s"fp dropped originals: ${orig.length}/500")
    assert(re.isEmpty, s"${re.length} re-arrivals readmitted inside the horizon")
  }

  test("q279 admissions are run-to-run deterministic") {
    val a = SparkEntry.queries("q279_stream_bloom_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = SparkEntry.queries("q279_stream_bloom_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b, s"nondeterministic admissions: ${a.diff(b).size} + ${b.diff(a).size} differ")
  }
}
