package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for q351 (exact LCS alignment). The oracle proves
  * Spark ≡ DuckDB on the DP; these pins hold the ALIGNMENT claims: the
  * self arm is a perfect score, the mutation arm obeys the exact
  * LCS = 48 − n_mutated law (out-of-vocab replacements can match
  * nothing; every match consumes an unmutated position), and the arms
  * separate the way an order-preserving similarity must. */
class LcsAlignmentSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
    test(s"q351 arm semantics and the exact mutation law at $dir") {
      val rows = SparkEntry.queries("q351_lcs_alignment")(spark, dir).collect()
      assert(rows.length == 23) // 8 self + 8 mut + 7 cross
      val byArm = rows.groupBy(_.getString(0))
      // self: LCS of a with itself is exactly 48
      assert(byArm("self").forall(r =>
        r.getLong(2) == 48L && r.getLong(3) == 1000L))
      // mut: the carried law column is 0 AND re-derives from the columns
      for (r <- byArm("mut")) {
        assert(r.getLong(5) == 0L, "mut law column")
        assert(r.getLong(2) == 48L - r.getLong(4), "lcs = 48 - n_mutated")
        assert(r.getLong(4) > 0, "fixture must actually mutate")
      }
      // arms separate: every mut ratio above every cross ratio, self above all
      val mutMin = byArm("mut").map(_.getLong(3)).min
      val crossMax = byArm("cross").map(_.getLong(3)).max
      assert(mutMin > crossMax, s"mut $mutMin !> cross $crossMax")
      assert(crossMax < 500 && mutMin > 500)
    }
  }

  test("the fold computes a known LCS exactly") {
    // hand-checkable case folded through the SAME expression shape:
    // LCS([a b c a], [a x c a]) = 3 — guards the prefix-max row form
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c", "a"), Seq("a", "x", "c", "a")))
      .toDF("ta", "tb")
    val got = df.selectExpr(
      """aggregate(
        |  ta,
        |  array_repeat(cast(0 as bigint), 5),
        |  (prev, x) -> concat(array(cast(0 as bigint)),
        |    transform(sequence(1, 4), t ->
        |      greatest(element_at(prev, t + 1),
        |        array_max(slice(
        |          transform(sequence(1, 4), k ->
        |            element_at(prev, k) + if(x = element_at(tb, k), 1L, 0L)),
        |          1, t))))),
        |  fin -> element_at(fin, 5)) as lcs""".stripMargin)
      .head().getLong(0)
    assert(got == 3L)
  }
}
