package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rule must (a) eliminate the BroadcastNestedLoopJoin a pure
  * bounded time-range join plans as, (b) leave keyed range joins to the
  * planner's existing hash join (an equi conjunct is present), and
  * (c) preserve results exactly while leaving non-range joins untouched. */
class RangeBinJoinRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Pure range join — no equi conjunct: the default planner's only option
    * is a nested-loop join. */
  private def pureRangeJoin(limit: Int) = {
    val e = graft.Tables(spark, dir, "events")
      .select("event_id", "ts").limit(limit)
    val e2 = e.select(col("ts").as("ts2"), col("event_id").as("id2"))
    e.join(e2,
      col("ts2") > col("ts") && col("ts2") <= col("ts") + expr("INTERVAL 5 MINUTES"))
      .groupBy().agg(count(lit(1)).as("n_pairs"))
  }

  private def keyedRangeJoin() = {
    val e = graft.Tables(spark, dir, "events").select("event_id", "user_id", "ts")
    val e2 = e.select(col("user_id").as("u2"), col("ts").as("ts2"),
      col("event_id").as("id2"))
    e.join(e2,
      col("user_id") === col("u2")
        && col("ts2") > col("ts")
        && col("ts2") <= col("ts") + expr("INTERVAL 5 MINUTES"))
      .groupBy("user_id").agg(count(lit(1)).as("n_pairs"))
      .orderBy("user_id")
  }

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeBinJoinRewrite
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RangeBinJoinRewrite)
  }

  test("pure range join: BNLJ becomes a hash join on the time bin") {
    val baseline = pureRangeJoin(1000).queryExecution.executedPlan.toString
    assert(baseline.contains("BroadcastNestedLoopJoin"))
    withRule {
      val planned = pureRangeJoin(1000).queryExecution.executedPlan.toString
      assert(!planned.contains("BroadcastNestedLoopJoin"), planned)
      assert(planned.contains("__graft_bin"), planned)
    }
  }

  test("keyed range join: rewrite skipped — the existing equi key hash-joins") {
    withRule {
      // an equi conjunct is already present, so the planner hash-joins on it
      // with the range as post-filter; the bin explode would double the
      // probe side for nothing — the rule must leave the join alone
      val planned = keyedRangeJoin().queryExecution.executedPlan.toString
      assert(!planned.contains("__graft_bin"), planned)
      assert(!planned.contains("BroadcastNestedLoopJoin"), planned)
    }
  }

  test("rewritten joins return exactly the baseline results") {
    val pureExpected = pureRangeJoin(500).collect().head.getLong(0)
    val keyedExpected = keyedRangeJoin().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    withRule {
      assert(pureRangeJoin(500).collect().head.getLong(0) == pureExpected)
      assert(keyedRangeJoin().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq == keyedExpected)
    }
    assert(pureExpected > 0 && keyedExpected.nonEmpty)
  }

  test("rule leaves plain equi-joins and non-range theta joins untouched") {
    val o = graft.Tables(spark, dir, "orders")
    val c = graft.Tables(spark, dir, "customer")
    val equi = o.join(c, col("o_custkey") === col("c_custkey")).groupBy().count()
    val n = equi.collect().head.getLong(0)
    withRule {
      assert(equi.collect().head.getLong(0) == n)
      // non-time theta join: no rewrite, still BNLJ
      val theta = o.limit(50).join(c, col("o_totalprice") > col("c_acctbal"))
      assert(theta.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      theta.count()
    }
  }
}
