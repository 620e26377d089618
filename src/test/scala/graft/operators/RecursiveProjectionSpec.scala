package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for wave 46 (q342 Spark-side recursive CTE, q343
  * bipartite projection). The oracle proves Spark ≡ DuckDB; these pins
  * hold what the hash can't: q342's recursion is Spark's REAL UnionLoop
  * machinery (not an unrolled union) walking data-driven depths, and
  * q343's hub cap actually binds — no emitted pair rests on a capped
  * basket, and the completeness counts reconcile with an independent
  * recount. */
class RecursiveProjectionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("q342 runs a genuine UnionLoop recursion with data-driven depths") {
    val df = SparkEntry.queries("q342_recursive_cte")(spark, dir)
    // the optimized plan must contain the recursive-CTE loop operator —
    // proof this is Spark 4 recursion, not an unrolled fixed-round union
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("UnionLoop"), s"expected UnionLoop in:\n$plan")
    val rows = df.collect()
    assert(rows.length == 15) // 1500 custkeys, every 100th sampled
    val depths = rows.map(_.getLong(1))
    // depth_to_root = floor(log2(leaf)): varies across leaves and every
    // walk terminated at the root (rows exist at all — WHERE cur = 1)
    assert(depths.distinct.length > 1 && depths.forall(d => d >= 2 && d <= 11))
    for (r <- rows) {
      val leaf = r.getLong(0)
      val expDepth = 63 - java.lang.Long.numberOfLeadingZeros(leaf)
      assert(r.getLong(1) == expDepth, s"leaf $leaf depth")
    }
    // exact path-cents recount for one leaf, driver-side
    val bal = graft.Tables(spark, dir, "customer")
      .select(col("c_custkey"), round(col("c_acctbal") * 100).cast("long").as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val leaf = rows.head.getLong(0)
    val path = Iterator.iterate(leaf)(_ / 2).takeWhile(_ >= 1).toSeq
    assert(rows.head.getLong(2) == path.map(bal).sum, s"path cents of $leaf")
  }

  test("q343 hub cap binds, counts reconcile, normalization is the argsort") {
    val rows = SparkEntry.queries("q343_item_cf_similarity")(spark, dir).collect()
    assert(rows.length == 20)
    val (nPairs, sumW) = (rows.head.getLong(7), rows.head.getLong(8))
    val (nCapped, nKept) = (rows.head.getLong(9), rows.head.getLong(10))
    for (r <- rows) {
      val (w, d1, d2) = (r.getLong(2), r.getLong(3), r.getLong(4))
      // similarity identities: intersection bounded by both degrees; the
      // published milli scores are exactly the integer formulas
      assert(w >= 1 && w <= math.min(d1, d2))
      assert(r.getLong(5) == w * 1000 / (d1 + d2 - w), "jaccard_milli")
      assert(r.getLong(6) == w * 1000 / math.min(d1, d2), "overlap_milli")
    }
    assert(nCapped > 0, "fixture must exercise the cap arm (avg basket ~40)")
    assert(nKept > 0 && nPairs > 0 && sumW >= nPairs)
    // independent recount: sum of per-basket C(d,2) over kept baskets
    // equals the projection's total weight (each common customer of a
    // pair contributes exactly one unit)
    val e = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(graft.Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p")).distinct()
    val degs = e.groupBy("c").agg(count(lit(1)).as("d"))
      .select("d").collect().map(_.getLong(0))
    val expSumW = degs.filter(d => d >= 2 && d <= 40).map(d => d * (d - 1) / 2).sum
    assert(sumW == expSumW, s"sum_w $sumW vs per-basket recount $expSumW")
    assert(degs.count(_ > 40) == nCapped)
    // the head is ranked by NORMALIZED similarity, not raw popularity
    val js = rows.map(_.getLong(5))
    assert(js.sameElements(js.sorted.reverse))
  }
}
