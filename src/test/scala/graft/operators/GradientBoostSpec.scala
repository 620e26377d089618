package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for q344 (3-round boosted regression stumps). The
  * oracle proves Spark ≡ DuckDB; these pins hold the LEARNING claims the
  * hash can't express: the rounds recover the planted additive structure
  * in effect-size order, the SSE trajectory is monotone and lands at the
  * noise floor, and the leaf means reproduce the planted effects. */
class GradientBoostSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
    test(s"q344 recovers the planted structure at $dir") {
      val rows = SparkEntry.queries("q344_gradient_boosting")(spark, dir)
        .collect().sortBy(_.getLong(0))
      assert(rows.length == 3)
      // round 1: the larger planted effect — discount at centi-threshold 5
      assert(rows(0).getString(1) == "disc" && rows(0).getLong(2) == 5L)
      // round 2: the smaller effect, visible only in the residuals
      assert(rows(1).getString(1) == "dom" && rows(1).getLong(2) == 15L)
      // leaf-mean GAP reproduces each planted effect within the noise
      // (means are relative to the running model, so the gap is the signal)
      val gap1 = rows(0).getLong(6) - rows(0).getLong(5)
      val gap2 = rows(1).getLong(6) - rows(1).getLong(5)
      assert(math.abs(gap1 - 8000L) < 400, s"disc effect gap $gap1")
      assert(math.abs(gap2 - 5000L) < 400, s"dom effect gap $gap2")
      // SSE is monotone non-increasing and collapses to the noise floor:
      // uniform noise on [-1000, 1000] has variance ≈ 2001²/12 ≈ 333 667
      val sse = rows.map(_.getLong(8))
      assert(sse(0) > sse(1) && sse(1) >= sse(2), s"SSE ${sse.toSeq}")
      assert(math.abs(sse(2) - 333667L) < 10000, s"noise floor ${sse(2)}")
      // round 3 has nothing real left: its gain is orders below round 2's
      assert(rows(2).getLong(7) * 1000 < rows(1).getLong(7),
        s"round-3 gain ${rows(2).getLong(7)} vs round-2 ${rows(1).getLong(7)}")
    }
  }
}
