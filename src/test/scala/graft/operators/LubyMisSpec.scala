package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for q350 (Luby's MIS). The oracle proves Spark ≡
  * DuckDB and the carried invariant columns prove independence and
  * maximality; these pins hold the ALGORITHMIC claims: the rounds drain
  * the active set to the empty fixpoint inside the unrolled budget, the
  * selection is monotone-decreasing per round (Luby's contraction), and
  * the set size clears the degree lower bound. */
class LubyMisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
    test(s"q350 reaches the MIS fixpoint with Luby contraction at $dir") {
      val rows = SparkEntry.queries("q350_luby_mis")(spark, dir)
        .collect().sortBy(_.getLong(0))
      assert(rows.length == LubyMis.rounds)
      // invariants are literally zero on every row
      for (r <- rows) {
        assert(r.getLong(4) == 0L, "independence violated")
        assert(r.getLong(5) == 0L, "maximality violated")
      }
      // the active set drains to EMPTY strictly inside the round budget
      assert(rows.last.getLong(2) == 0L, "fixpoint not reached")
      val actives = rows.map(_.getLong(2))
      assert(actives.zip(actives.tail).forall { case (a, b) => b <= a })
      // Luby kills most of the graph immediately: round 0 selects > 0 and
      // the active set after round 1 is already < 10% of the nodes
      val n = graft.Tables(spark, dir, "customer").count()
      assert(rows(0).getLong(1) > 0 && actives(1) < n / 10)
      // size sanity: an MIS of an avg-degree-~4 graph must cover well
      // over n/8 nodes (greedy bound n/(maxdeg+1) is far lower; this is
      // the empirical band for the hash graph at both scales)
      val misSize = rows.head.getLong(3)
      assert(misSize > n / 8 && misSize < n, s"mis=$misSize n=$n")
    }
  }
}
