package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native heap top-k operator: result equivalence against the window
  * formulation, plan shape (partial+final exec pair, no Window/full Sort),
  * and the edge cases a bounded heap must get right (k ≥ group size, ties
  * under a total order, empty input). */
class TopKPerKeySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  private def orders = spark.read.parquet(s"$dir/orders.parquet")
    .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))

  private def windowed(k: Int) = {
    import org.apache.spark.sql.expressions.Window
    orders.withColumn("rn", row_number().over(
        Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") <= k).drop("rn")
  }

  private def native(k: Int) = TopKPerKey.topK(orders,
    Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey")), k)

  test("matches the window formulation row-for-row (k=3)") {
    val a = native(3).orderBy("o_custkey", "o_orderkey").collect()
    val b = windowed(3).orderBy("o_custkey", "o_orderkey").collect()
    assert(a.length == b.length && a.sameElements(b))
  }

  test("k larger than every group returns the full input") {
    assert(native(100000).count() == orders.count())
  }

  test("k=1 picks each customer's single best order") {
    val a = native(1).orderBy("o_custkey").collect()
    val b = windowed(1).orderBy("o_custkey").collect()
    assert(a.sameElements(b))
  }

  test("plan: partial+final heap pair around one exchange; no Window, no full sort") {
    val plan = native(3).queryExecution.executedPlan.toString
    assert(plan.split("TopKPerKey").length - 1 >= 2, plan)
    assert(plan.contains("Exchange hashpartitioning(o_custkey"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort "), plan)
  }

  test("empty input yields empty output") {
    val empty = orders.filter(col("o_custkey") < 0)
    assert(TopKPerKey.topK(empty, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc), 3).count() == 0)
  }

  test("k < 1 is rejected up front, not as a task-time NPE") {
    intercept[IllegalArgumentException] {
      TopKPerKey.topK(orders, Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc), 0)
    }
    intercept[IllegalArgumentException] {
      TopKPerKey.topK(orders, Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc), -2)
    }
  }

  test("partial-phase key cap degrades to pass-through, result unchanged") {
    // cap the partial heap map at 2 keys — far below the ~1000 customers in
    // the fixture — so almost every map-side row takes the pass-through
    // path; the final phase must still produce the exact top-k
    val capped = TopKPerKey.topK(orders,
      Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey")),
      3, maxBufferedKeys = 2)
    val a = capped.orderBy("o_custkey", "o_orderkey").collect()
    val b = windowed(3).orderBy("o_custkey", "o_orderkey").collect()
    assert(a.length == b.length && a.sameElements(b))
  }

  test("repeat topK calls never stack duplicate planner strategies") {
    native(2).collect(); native(2).collect()
    assert(spark.experimental.extraStrategies
      .count(_ == TopKPerKey.TopKPerKeyStrategy) <= 1)
  }
}
