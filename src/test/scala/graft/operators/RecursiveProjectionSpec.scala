package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for wave 46 (q343 item-CF similarity). The oracle
  * proves Spark ≡ DuckDB; these pins hold what the hash can't: the hub
  * cap actually binds, the completeness counts reconcile with an
  * independent per-basket recount, and the published milli similarity
  * scores are exactly their integer formulas. */
class RecursiveProjectionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

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
