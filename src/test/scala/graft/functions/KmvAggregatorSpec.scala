package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** KMV's algebraic contract is STRONGER than Misra–Gries': the bottom-k of
  * a distinct set is order-free, so the exact single-pass-equality law
  * holds under every split/merge tree (the property that makes q190
  * hash-verifiable against the DuckDB oracle, not just bounds-checkable).
  * Seeded-random streams, no ScalaCheck (offline env — NOTES.md). */
class KmvAggregatorSpec extends AnyFunSuite {
  private val k = 8
  private val agg = new KmvAggregator(k)

  private def foldAll(xs: Seq[Long]): Seq[Long] =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("fold equals exact bottom-k of the distinct set; merges agree") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 60) {
      val xs = Seq.fill(1 + rnd.nextInt(200))(rnd.nextLong().abs % 50)
      val expected = xs.distinct.sorted.take(k)
      assert(foldAll(xs) == expected, s"trial $trial fold")
      val parts = xs.grouped(1 + rnd.nextInt(30)).map(foldAll).toSeq
      val merged = rnd.shuffle(parts).foldLeft(agg.zero)(agg.merge)
      assert(merged == expected, s"trial $trial merge")
    }
  }

  test("under k distinct values the sketch is the exact set") {
    val xs = Seq(5L, 3L, 5L, 9L, 3L)
    assert(foldAll(xs) == Seq(3L, 5L, 9L))
  }

  test("estimator lands within 4/sqrt(k) of the truth on uniform hashes") {
    // 2000 distinct 60-bit hashes via the portable hash, k = 64 like q190
    val big = new KmvAggregator(64)
    val hs = (1 to 2000).map(i => PortableHash.md5LongScala(s"u:$i"))
    val sk = hs.foldLeft(big.zero)(big.reduce)
    val est = math.floor(63 * 1152921504606846976.0 / sk(63))
    assert(math.abs(est - 2000.0) / 2000.0 < 0.5, s"est=$est")
  }

  test("k < 2 rejected") {
    intercept[IllegalArgumentException] { new KmvAggregator(1) }
  }
}
