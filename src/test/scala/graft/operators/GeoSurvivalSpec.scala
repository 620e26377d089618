package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for wave 43 (q336 grid-cell spatial join, q337
  * Kaplan–Meier survival). The oracle proves Spark ≡ DuckDB; these pins
  * hold the claims the hash check can't express: the cell blocking is
  * COMPLETE against an in-Spark brute force (independent of the oracle's
  * own brute force), and the KM curve is a genuine survival function —
  * monotone, telescoping risk sets, with both events and censoring
  * actually present in the fixture. */
class GeoSurvivalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("q336 cell blocking finds exactly the brute-force pair set") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q336_geo_cell_join")(spark, dir).collect()
    assert(rows.length == 20)
    val nPairs = rows.map(_.getLong(3)).distinct
    assert(nPairs.length == 1 && nPairs.head > 0)
    // independent brute force over the same hash-derived points
    import graft.functions.PortableHash.md5Long
    def h(tag: String) =
      md5Long(concat(lit(tag + ":"), col("c_custkey").cast("string")))
    val pts = graft.Tables(spark, dir, "customer")
      .filter(h("geo") % 4 === 0)
      .select(col("c_custkey").as("id"),
        (h("geox") % 10000).as("x"), (h("geoy") % 10000).as("y"))
    val a = pts.select(col("id").as("a"), col("x").as("ax"), col("y").as("ay"))
    val b = pts.select(col("id").as("b"), col("x").as("bx"), col("y").as("by"))
    val d2 = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
      (col("ay") - col("by")) * (col("ay") - col("by"))
    val brute = a.crossJoin(b).filter(col("a") < col("b"))
      .filter(d2 <= 22500).count()
    assert(brute == nPairs.head,
      s"blocking missed pairs: brute=$brute cell-join=${nPairs.head}")
    // the reported top-20 are sorted and within the radius
    val d2s = rows.map(_.getLong(2))
    assert(d2s.sameElements(d2s.sorted) && d2s.forall(_ <= 22500))
  }

  test("q336 cell join is a hash equi-join, never a product over points") {
    // PLANMAP's fingerprint stops at the pairs cache boundary, so the
    // candidate join's strategy is pinned HERE by descending into the
    // cached relation's plan: the (jx, jy) join must be a hash/merge
    // equi-join; the only nested-loop node allowed anywhere is the
    // 1-row completeness-count crossJoin.
    // sf0.01, not sf0.001: the micro fixture has ~37 points on the 10⁸
    // grid and ZERO in-radius pairs, so AQE collapses the whole query to
    // EmptyRelationExec and there is no join left to pin.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q336_geo_cell_join")(spark, "/root/testdata/sf0.01")
    df.collect()
    def deep(p: SparkPlan): Seq[SparkPlan] =
      graft.SparkTestSession.flattenExecuted(p).flatMap {
        case im: InMemoryTableScanExec => im +: deep(im.relation.cachedPlan)
        case o => Seq(o)
      }
    val nodes = deep(df.queryExecution.executedPlan).map(_.getClass.getSimpleName)
    assert(nodes.count(_.startsWith("CartesianProduct")) == 0, nodes.mkString(","))
    assert(nodes.count(_.startsWith("BroadcastNestedLoopJoin")) <= 1, nodes.mkString(","))
    assert(nodes.exists(n => n.startsWith("BroadcastHashJoin") ||
      n.startsWith("ShuffledHashJoin") || n.startsWith("SortMergeJoin")),
      s"cell candidate join is not a hash equi-join: ${nodes.mkString(",")}")
    spark.catalog.clearCache()
  }

  test("q337 KM curve: monotone survival, telescoping risk sets, real censoring") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      val rows = SparkEntry.queries("q337_survival_estimators")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      val segs = rows.map(_._1).distinct
      assert(segs.length == 5 && rows.length == segs.length * 8)
      segs.foreach { seg =>
        val s = rows.filter(_._1 == seg).sortBy(_._2)
        // survival never increases, stays in [0, 1000]
        val curve = s.map(_._6)
        assert(curve.head <= 1000 && curve.forall(v => v >= 0 && v <= 1000))
        assert(curve.zip(curve.tail).forall { case (p, n) => n <= p },
          s"$seg survival not monotone: ${curve.mkString(",")}")
        // risk sets telescope: n_k − d_k − c_k = n_{k+1}
        s.zip(s.tail).foreach { case ((_, _, n, d, c, _), (_, _, n2, _, _, _)) =>
          assert(n - d - c == n2, s"$seg risk set broken: $n-$d-$c != $n2")
        }
        assert(s.last._3 == s.last._4 + s.last._5) // last bucket drains
      }
      // the fixture exercises both arms of the estimator
      assert(rows.map(_._4).sum > 0, "no churn events — KM degenerate")
      assert(rows.map(_._5).sum > 0, "no censored customers — KM degenerate")
      // some segment actually loses survival mass (curve is not flat)
      assert(rows.map(_._6).min < 1000)
    }
  }
}
