package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-side pin for MvAggRewrite (q281): with the gate on, the coarser
  * aggregate executes against the materialized view's parquet and never
  * opens the fact table; with it off, the base scan runs; both return
  * identical rows. */
class MvRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private val d28 = org.apache.spark.sql.types.DecimalType(28, 4)

  private lazy val mvDir = {
    val od = "/tmp/graft_layout/spec/mv_lineitem"
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(round(col("l_quantity"), 4).cast(d28)).as("qty4_sum"),
        count(lit(1)).as("cnt"))
      .coalesce(1).write.mode("overwrite").parquet(od)
    od
  }

  private def query() = spark.read.parquet(s"$dir/lineitem.parquet")
    .groupBy("l_returnflag")
    .agg(round(sum(round(col("l_quantity"), 4).cast(d28)).cast("double"), 4).as("sum_qty"),
      count(lit(1)).as("n"))
    .orderBy("l_returnflag")

  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    df.collect() // force execution so AQE finalizes
    SparkTestSession.flattenExecuted(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec => f.relation.location.rootPaths.map(_.toString)
    }.flatten
  }

  private def withGate[T](on: Boolean)(body: => T): T = {
    if (!spark.experimental.extraOptimizations.contains(MvAggRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MvAggRewrite
    spark.conf.set("spark.graft.mv.path", mvDir)
    spark.conf.set("spark.graft.mv.enabled", on.toString)
    try body finally spark.conf.set("spark.graft.mv.enabled", "false")
  }

  test("gate on: the executed plan reads the view and never opens lineitem") {
    val paths = withGate(on = true)(scanPaths(query()))
    assert(paths.nonEmpty)
    assert(paths.forall(_.contains("mv_lineitem")), s"non-view scan in plan: $paths")
  }

  test("gate off: the base fact scan runs") {
    val paths = withGate(on = false)(scanPaths(query()))
    assert(paths.exists(_.endsWith("lineitem.parquet")), s"expected base scan, got $paths")
    assert(!paths.exists(_.contains("mv_lineitem")))
  }

  test("gate on: unsupported aggregates and non-dim groupings are left alone") {
    // avg is not in the view's contract; user_id-style grouping is not a dim
    val avgQ = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").agg(avg(col("l_quantity")).as("a"))
    val otherDim = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_suppkey").agg(count(lit(1)).as("n"))
    Seq(avgQ, otherDim).foreach { q =>
      val paths = withGate(on = true)(scanPaths(q))
      assert(paths.exists(_.endsWith("lineitem.parquet")) &&
        !paths.exists(_.contains("mv_lineitem")),
        s"rewrite fired on an unsupported shape: $paths")
    }
  }

  test("substituted and base plans return identical rows") {
    val on = withGate(on = true)(query().collect().map(_.toString).toSeq)
    val off = withGate(on = false)(query().collect().map(_.toString).toSeq)
    assert(on == off, s"rewrite changed results:\n on=$on\noff=$off")
  }
}
