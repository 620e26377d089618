package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.scalatest.funsuite.AnyFunSuite

/** q196 — stats-driven planning. The claim under test: the join order in
  * the optimized plan comes from the CATALOG STATISTICS (ANALYZE + CBO),
  * not from the written query or a hint. Both arms are pinned:
  *
  *  - cbo + joinReorder ON  → the innermost join is orders ⋈ customer
  *    (the filtered dim joins first; lineitem — written FIRST — is hoisted
  *    out of the innermost position by cost),
  *  - cbo OFF               → the written fact ⋈ fact order survives
  *    (lineitem ⋈ orders innermost),
  *
  * and both arms produce identical results (reorder is semantics-free).
  * Relative table sizes are scale-invariant, so the decision pinned here
  * at sf0.001 is the decision a 100 TB warehouse gets from the same
  * ANALYZE discipline — replacing the hand-rolled runtime count()
  * switches (GraphQueries.maybeBroadcast) wherever the tables are
  * catalog-managed. */
class CboPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Catalog table names under the innermost (leaf-most) Join of `df`'s
    * optimized plan. */
  private def innermostJoinTables(df: DataFrame): Set[String] = {
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    val bottom = joins.filter(j =>
      j.children.forall(c => c.collect { case x: Join => x }.isEmpty))
    assert(bottom.nonEmpty, "expected at least one innermost join")
    bottom.flatMap(_.collect {
      case lr: LogicalRelation =>
        lr.catalogTable.map(_.identifier.table.replaceAll("_sf0_.*$", ""))
    }.flatten).toSet
  }

  private def withConfs[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("CBO on: the filtered dim joins first; CBO off: written order stands") {
    val (onTables, onRows) = withConfs(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true") {
      val df = RelationalQueries.cboJoinFrame(spark, dir)
      (innermostJoinTables(df), df.collect().toSeq)
    }
    assert(onTables == Set("orders", "customer"),
      s"CBO should reorder the filtered dim innermost, got $onTables")

    val (offTables, offRows) = withConfs("spark.sql.cbo.enabled" -> "false") {
      val df = RelationalQueries.cboJoinFrame(spark, dir)
      (innermostJoinTables(df), df.collect().toSeq)
    }
    assert(offTables == Set("lineitem", "orders"),
      s"without CBO the written fact-fact order must stand, got $offTables")

    assert(onRows == offRows, "join reorder must not change results")
    assert(onRows.nonEmpty)
  }
}
