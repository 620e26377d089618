package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries guarantees under arbitrary split/merge trees — the
  * properties q188's candidates→exact-verify pipeline rests on. MG output
  * CONTENT is order-dependent (unlike TopKAggregator there is no
  * single-pass-equality law); what must hold under EVERY arrival and merge
  * order is the summary-size bound, the no-false-negative guarantee, and
  * the counter error bound. Seeded-random streams, no ScalaCheck (offline
  * env — NOTES.md). */
class MisraGriesAggregatorSpec extends AnyFunSuite {
  private val m = 7
  private val agg = new MisraGriesAggregator(m)

  private def foldAll(xs: Seq[String]): Map[String, Long] =
    xs.foldLeft(agg.zero)(agg.reduce)

  private def checkGuarantees(xs: Seq[String], summary: Map[String, Long],
      label: String): Unit = {
    val n = xs.size
    val exact = xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(summary.size <= m, s"$label: size ${summary.size} > $m")
    // no false negatives above n/(m+1)
    exact.foreach { case (k, f) =>
      if (f > n.toDouble / (m + 1))
        assert(summary.contains(k), s"$label: heavy item $k (f=$f, n=$n) missing")
    }
    // counter error: stored ∈ [freq − n/(m+1), freq]
    summary.foreach { case (k, c) =>
      val f = exact.getOrElse(k, 0L)
      assert(c <= f, s"$label: $k overcounted ($c > $f)")
      assert(f - c <= n.toDouble / (m + 1), s"$label: $k error ${f - c} > n/(m+1)")
    }
  }

  test("single-pass fold: size bound, no false negatives, error bound") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 60) {
      // skewed stream: item i drawn ∝ zipf-ish over a 25-item domain
      val xs = Seq.fill(50 + rnd.nextInt(400))(
        s"t${math.min(rnd.nextInt(1 + rnd.nextInt(25)), rnd.nextInt(1 + rnd.nextInt(25)))}")
      checkGuarantees(xs, foldAll(xs), s"fold trial $trial")
    }
  }

  test("guarantees survive arbitrary split/merge trees") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 60) {
      val xs = Seq.fill(80 + rnd.nextInt(500))(
        s"t${math.min(rnd.nextInt(1 + rnd.nextInt(30)), rnd.nextInt(1 + rnd.nextInt(30)))}")
      val parts = xs.grouped(1 + rnd.nextInt(60)).map(foldAll).toSeq
      val merged = rnd.shuffle(parts).foldLeft(agg.zero)(agg.merge)
      checkGuarantees(xs, merged, s"merge trial $trial")
    }
  }

  test("uniform-light streams may legitimately return few or no counters") {
    // 26 distinct items × 2 each: nothing exceeds n/(m+1); only the size
    // and error bounds apply
    val xs = (0 until 52).map(i => s"u${i % 26}")
    checkGuarantees(xs, foldAll(xs), "uniform")
  }

  test("capacity < 1 rejected") {
    intercept[IllegalArgumentException] { new MisraGriesAggregator(0) }
  }
}
