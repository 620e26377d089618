package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (suites reuse it). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      // local[4, 2]: maxFailures=2 so task-retry semantics are testable
      // (TaskFailureRecoverySpec injects a once-failing task; plain local[N]
      // fails the whole job on the first task failure)
      .master("local[4, 2]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Flattens a POST-EXECUTION plan, unwrapping AQE and query-stage nodes
    * to the plans that actually ran — the shared helper for specs that
    * assert on executed-plan shape or metrics (GlobalPlanGuardSpec keeps
    * its own pre-execution variant: inputPlan + subqueries). */
  def flattenExecuted(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    p +: (p match {
      case a: AdaptiveSparkPlanExec => flattenExecuted(a.executedPlan)
      case q: QueryStageExec => flattenExecuted(q.plan)
      case _ => p.children.flatMap(flattenExecuted)
    })
  }
}
