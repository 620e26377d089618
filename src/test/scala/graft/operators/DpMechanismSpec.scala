package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for q347 (discrete-Laplace DP counts). The oracle
  * proves Spark ≡ DuckDB; these pins hold the MECHANISM claims: the
  * noise follows the two-sided geometric law (moments, symmetry, clamp),
  * the release identity holds, and the threshold table is a genuine CDF. */
class DpMechanismSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("the precomputed threshold table is a strictly increasing CDF " +
       "with the geometric law's symmetry") {
    val t = DpGeometric.thresholds
    assert(t.map(_._1) == (-30 until 30))
    assert(t.map(_._2) == t.map(_._2).sorted && t.map(_._2).distinct == t.map(_._2))
    // symmetry of the pmf: bucket width of k equals bucket width of -k
    val bounds = 0L +: t.map(_._2) :+ 1073741824L
    val widths = bounds.sliding(2).map(p => p(1) - p(0)).toSeq // k = -30 .. 30
    val byK = (-30 to 30).zip(widths).toMap
    for (k <- 1 to 29)
      assert(math.abs(byK(k) - byK(-k)) <= 1, s"asymmetry at ±$k")
    // the mode is at 0 and decays monotonically outward
    assert(byK(0) == byK.values.max)
    for (k <- 0 to 28) {
      assert(byK(k) >= byK(k + 1) && byK(-k) >= byK(-k - 1))
    }
  }

  test("q349 DP sum: the contribution clamp binds and noise scales with C") {
    val rows = SparkEntry.queries("q349_dp_sum")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.length == 25)
    for (r <- rows) {
      val (t, nc, n, noisy) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(noisy == t + n, "release identity")
      assert(n >= -75 && n <= 75, s"clamp violated: $n")
      // the clamp genuinely binds (TPC-H customers average ~10 orders)
      assert(nc > 0, "no clamped customers — sensitivity claim untested")
      assert(r.getLong(5) == 600L && r.getLong(6) == 3L)
    }
    // sensitivity-scaled noise is WIDER than q347's: per-unit eps 0.2 has
    // E|k| ≈ 1/eps ≈ 4.98 vs 1.92 at eps 0.5 — check the empirical mean
    val meanAbs = rows.map(r => math.abs(r.getLong(3))).sum.toDouble / 25
    assert(meanAbs > 1.5 && meanAbs < 12.0, s"mean |noise| $meanAbs")
  }

  test("q347 release identity, clamp bounds, and empirical noise moments") {
    val rows = SparkEntry.queries("q347_dp_counts")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.length == 125) // 5 segments × 25 nations
    var sumAbs = 0L
    var neg = 0
    for (r <- rows) {
      val (t, n, noisy) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(noisy == t + n, "release identity")
      assert(n >= -30 && n <= 30, s"clamp violated: $n")
      assert(r.getLong(5) == 500L, "epsilon accounting column")
      sumAbs += math.abs(n); if (n < 0) neg += 1
    }
    // E|k| at eps=0.5 is ~1.92; with 125 draws allow a wide band
    val meanAbs = sumAbs.toDouble / rows.length
    assert(meanAbs > 1.0 && meanAbs < 3.2, s"mean |noise| $meanAbs")
    // both signs occur (a one-sided 'mechanism' would be a bug)
    assert(neg > 20 && neg < 105, s"sign balance $neg/125")
  }
}
