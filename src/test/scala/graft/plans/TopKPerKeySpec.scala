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

  test("final-phase spill fallback: tiny key cap forces disk runs, result unchanged") {
    // cap=2 on BOTH phases: the partial side passes through (superset) and
    // the final side must repeatedly flush its heap map to key-sorted disk
    // runs and k-way merge them — the sort-based fallback path. The result
    // must still be row-for-row the window formulation.
    val spilled = TopKPerKey.topK(orders,
      Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey")),
      3, maxBufferedKeys = 2)
      .orderBy("o_custkey", "o_orderkey")
    val a = spilled.collect()
    val b = windowed(3).orderBy("o_custkey", "o_orderkey").collect()
    assert(a.length == b.length && a.sameElements(b))
    // prove the fallback actually ran: the FINAL exec of the JUST-EXECUTED
    // plan reports > 0 disk runs (unwrap AQE — the post-execution plan
    // lives under it)
    val spills = SparkTestSession
      .flattenExecuted(spilled.queryExecution.executedPlan).collect {
      case t: TopKPerKey.TopKPerKeyExec if !t.partial =>
        t.metrics("numSpilledRuns").value
    }
    assert(spills.nonEmpty && spills.head > 0,
      s"expected the final phase to spill under cap=2, metrics=$spills")
  }

  test("spill fallback with k exceeding group sizes keeps every row") {
    val spilled = TopKPerKey.topK(orders,
      Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey")),
      100000, maxBufferedKeys = 2)
    assert(spilled.count() == orders.count())
  }

  test("codegen: the heap pair FUSES into whole-stage codegen (blocking " +
       "consumer) and adds no extra exchange") {
    // the exec pair participates as a blocking codegen consumer (SortExec's
    // BlockingOperatorWithCodegen shape): the child stage's generated loop
    // feeds TopKBuffer.add directly, so scan→project→partial below the
    // exchange and final→filter→project above it are each ONE generated
    // stage — the operator must appear INSIDE a `*(n)` span, not break it
    val df = native(3)
      .select(col("o_custkey"), (col("o_totalprice") * 2).as("p2"))
      .filter(col("p2") > lit(0))
    df.collect()
    // AQE's toString echoes the plan twice (Final + Initial) — judge only
    // the final executed plan
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // exactly ONE exchange in the whole plan: the hashpartitioning between
    // partial and final that the operator requires by design
    val exchanges = plan.split("Exchange ").length - 1
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
    // both execs carry a codegen-stage `*(n)` marker of their own stage
    val topKLines = plan.linesIterator.filter(_.contains("TopKPerKey")).toSeq
    assert(topKLines.size == 2, plan)
    assert(topKLines.forall(_.contains("*(")),
      s"TopKPerKey exec fell out of whole-stage codegen:\n$plan")
    // and the neighbors share those stages (scan side = stage 1, output
    // side = stage 2)
    assert(plan.contains("*(1) "), plan)
    assert(plan.contains("*(2) "), plan)
  }

  test("interpreted fallback (codegen off) still matches the window oracle") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val a = native(3).orderBy("o_custkey", "o_orderkey").collect()
      val b = windowed(3).orderBy("o_custkey", "o_orderkey").collect()
      assert(a.length == b.length && a.sameElements(b))
      // the pass-through policy (interpreted partial phase) still holds
      val capped = TopKPerKey.topK(orders,
        Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey")),
        3, maxBufferedKeys = 2).orderBy("o_custkey", "o_orderkey").collect()
      assert(capped.length == b.length && capped.sameElements(b))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("SQLMetrics are exact on a fully-consumed run: numKeys = distinct " +
       "keys, numOutputRows = result size, no spills at default cap") {
    // NO global orderBy here: RangePartitioner's boundary-sampling pass
    // would execute the child (and its metrics) a second time
    val df = native(3)
    val rows = df.collect() // full consumption — the exactness precondition
    val distinctKeys = orders.select("o_custkey").distinct().count()
    val finals = SparkTestSession
      .flattenExecuted(df.queryExecution.executedPlan).collect {
        case t: TopKPerKey.TopKPerKeyExec if !t.partial => t
      }
    assert(finals.size == 1)
    val m = finals.head.metrics
    assert(m("numKeys").value == distinctKeys,
      s"numKeys ${m("numKeys").value} vs $distinctKeys")
    assert(m("numOutputRows").value == rows.length,
      s"numOutputRows ${m("numOutputRows").value} vs ${rows.length}")
    assert(m("numSpilledRuns").value == 0 && m("passThroughRows").value == 0,
      "default cap must neither spill nor pass through")
  }

  test("repeat topK calls never stack duplicate planner strategies") {
    native(2).collect(); native(2).collect()
    assert(spark.experimental.extraStrategies
      .count(_ == TopKPerKey.TopKPerKeyStrategy) <= 1)
  }
}
