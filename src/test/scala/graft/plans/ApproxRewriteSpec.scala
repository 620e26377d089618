package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The approx-count-distinct acceleration rule (q345's machinery): flag
  * off ⇒ plans and results are byte-identical to stock Spark; flag on ⇒
  * the distinct Count disappears from eligible plans, the KMV estimate
  * lands within its statistical bound, ineligible shapes pass through
  * untouched, and the exact-below-k branch is exact. */
class ApproxRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  private def withFlag[T](on: Boolean)(body: => T): T = {
    if (!spark.experimental.extraOptimizations.contains(ApproxCountRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ApproxCountRewrite
    spark.conf.set(ApproxCountRewrite.FLAG, on.toString)
    try body finally spark.conf.set(ApproxCountRewrite.FLAG, "false")
  }

  private def orders = spark.read.parquet(s"$dir/orders.parquet")

  private def q = orders.groupBy("o_orderpriority")
    .agg(count_distinct(col("o_custkey")).as("cnt"))

  test("flag off: the distinct Count survives and results are exact") {
    val df = withFlag(false)(q)
    assert(df.queryExecution.optimizedPlan.toString.contains("count(distinct"))
    val exact = orders.select("o_orderpriority", "o_custkey").distinct()
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    df.collect().foreach(r => assert(r.getLong(1) == exact(r.getString(0))))
  }

  test("flag on: Count(distinct) is rewritten to the KMV sketch and the " +
       "estimate holds the 4-sigma bound") {
    val (plan, rows) = withFlag(true) {
      val df = q
      (df.queryExecution.optimizedPlan.toString, df.collect())
    }
    assert(!plan.contains("count(distinct"), plan)
    assert(plan.toLowerCase.contains("kmvnullskipaggregator") ||
      plan.contains("ScalaAggregator") || plan.contains("kmv_sketch"), plan)
    val exact = orders.select("o_orderpriority", "o_custkey").distinct()
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (e, a) = (exact(r.getString(0)), r.getLong(1))
      // k=64 ⇒ rel σ ≈ 1/√62 ≈ 12.7 %; 4σ ≈ 51 %
      assert(math.abs(a - e).toDouble / e < 0.51,
        s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("flag on: fewer than k distinct values stays EXACT (sketch = set)") {
    // 3 distinct statuses per priority — far below k=64
    val df = withFlag(true) {
      orders.groupBy("o_orderpriority")
        .agg(count_distinct(col("o_orderstatus")).as("cnt"))
        .localCheckpoint(true)
    }
    val exact = orders.select("o_orderpriority", "o_orderstatus").distinct()
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    df.collect().foreach(r => assert(r.getLong(1) == exact(r.getString(0))))
  }

  test("ineligible shapes pass through untouched under the flag") {
    withFlag(true) {
      // multi-argument count(distinct a, b): not rewritable
      val multi = orders.groupBy("o_orderpriority")
        .agg(count_distinct(col("o_custkey"), col("o_orderstatus")).as("c"))
      assert(multi.queryExecution.optimizedPlan.toString
        .contains("count(distinct"))
      // arithmetic AROUND the aggregate (not a bare alias): conservative
      // eligibility leaves the whole Aggregate alone
      val wrapped = orders.groupBy("o_orderpriority")
        .agg((count_distinct(col("o_custkey")) * 2).as("c2"))
      assert(wrapped.queryExecution.optimizedPlan.toString
        .contains("count(distinct"))
    }
  }

  test("two count-distincts and a plain aggregate in ONE Aggregate all land") {
    val (plan, rows) = withFlag(true) {
      val df = orders.groupBy("o_orderpriority").agg(
        count_distinct(col("o_custkey")).as("ck"),
        count_distinct(col("o_orderstatus")).as("st"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      (df.queryExecution.optimizedPlan.toString, df.collect())
    }
    assert(!plan.contains("count(distinct"), plan)
    val exactCk = orders.select("o_orderpriority", "o_custkey").distinct()
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactCents = orders.groupBy("o_orderpriority")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val g = r.getString(0)
      // high-cardinality column: estimated within bound
      assert(math.abs(r.getLong(1) - exactCk(g)).toDouble / exactCk(g) < 0.51)
      // 3-value column: the exact-below-k branch
      assert(r.getLong(2) == 3L, s"$g statuses ${r.getLong(2)}")
      // the untouched plain aggregate is still exact
      assert(r.getLong(3) == exactCents(g), s"$g cents")
    }
  }

  test("null counted values are skipped, matching COUNT(DISTINCT) semantics") {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", None), ("a", Some(2L)), ("b", None))
      .toDF("g", "v")
    val got = withFlag(true) {
      df.groupBy("g").agg(count_distinct(col("v")).as("c"))
        .localCheckpoint(true)
    }.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 0L))
  }
}
