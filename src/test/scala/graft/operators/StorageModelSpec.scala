package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for wave 45 (q340 bitmap predicate algebra, q341
  * encoding advisor). The oracle proves Spark ≡ DuckDB; these pins hold
  * what the hash can't: the bitmap index is LOSSLESS against direct row
  * counts (set algebra laws hold numerically, not just consistently), and
  * the encoding model's decision space is real — different columns pick
  * different winners for the documented physical reasons. */
class StorageModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("q340 bitmap algebra satisfies the set laws against direct counts") {
    val rows = SparkEntry.queries("q340_bitmap_predicate_algebra")(spark, dir)
      .collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val (and, or, xor) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (lo, ro) = (r.getLong(4), r.getLong(5))
      val (dl, dr) = (r.getLong(6), r.getLong(7))
      val pair = r.getString(0)
      // inclusion–exclusion residual is literally zero
      assert(r.getLong(8) == 0L, s"$pair incl-excl residual ${r.getLong(8)}")
      // XOR = symmetric difference; union decomposes into disjoint parts
      assert(xor == lo + ro, s"$pair xor")
      assert(or == and + lo + ro, s"$pair union decomposition")
      // LOSSLESSNESS: popcount-reconstructed per-predicate cardinalities
      // equal the direct row counts carried through the same aggregation
      assert(and + lo == dl, s"$pair left bitmap ${and + lo} vs direct $dl")
      assert(and + ro == dr, s"$pair right bitmap ${and + ro} vs direct $dr")
      // the fixture predicates genuinely overlap and genuinely differ
      assert(and > 0 && lo > 0 && ro > 0, s"$pair degenerate predicate pair")
    }
  }

  test("q341 encoding advisor picks per-column winners for real reasons") {
    val rows = SparkEntry.queries("q341_encoding_advisor")(spark, dir).collect()
    assert(rows.length == 4)
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    // the decision space is real: at least two distinct winners
    assert(rows.map(_.getString(8)).distinct.length >= 2)
    for (r <- rows) {
      val (n, runs) = (r.getLong(2), r.getLong(3))
      assert(runs >= 1 && runs <= n, s"${r.getString(0)} run count")
      // chosen encoding is the argmin of the priced models
      val prices = Seq("rle" -> r.getLong(5), "dict" -> r.getLong(6)) ++
        (if (r.isNullAt(7)) Nil else Seq("delta" -> r.getLong(7))) :+
        ("plain" -> r.getLong(4))
      val best = r.getString(8)
      val min = prices.map(_._2).min
      assert(prices.toMap.apply(best) == min, s"${r.getString(0)} argmin")
    }
    // 3-NDV status strings: dictionary collapses them (and RLE halves runs)
    val st = byCol("o_orderstatus")
    assert(st.getString(8) == "dict" && st.getLong(6) < st.getLong(4) / 10)
    assert(st.getLong(3) < st.getLong(2), "status column must have runs > 1 row")
    // dense keys: zigzag'd small deltas beat 8-byte plain
    val ck = byCol("o_custkey")
    assert(ck.getString(8) == "delta" && ck.getLong(7) < ck.getLong(4))
  }
}
