package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.types.{ArrayType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the property q233's DuckDB oracle cannot see: the read-back scan
  * over the nested write must decode ONLY the two touched leaves (k.rf,
  * m.price) — nested-schema pruning drops the five sibling leaves and the
  * whole payload array from the parquet ReadSchema. A regression here
  * (e.g. an expression that forces whole-struct materialization) keeps the
  * query value-correct while re-inflating the scan by the full row width —
  * exactly the silent 10–100× I/O loss this spec exists to catch. */
class NestedPruningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.initialPlan)
      case _ => p.children
    }
    p +: kids.flatMap(flatten)
  }

  test("q233 read-back scan schema holds only the k.rf and m.price leaves") {
    val frame = RelationalQueries.nestedPrunedFrame(spark, dir)
    val scans = flatten(frame.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "expected a FileSourceScanExec over the nested write")
    val read = scans.head.requiredSchema
    // no payload array survives pruning
    assert(!read.fields.exists(_.dataType.isInstanceOf[ArrayType]),
      s"payload array must be pruned, got $read")
    val leaves = read.fields.flatMap { f =>
      f.dataType match {
        case s: StructType => s.fieldNames.toSeq.map(n => s"${f.name}.$n")
        case _ => Seq(f.name)
      }
    }.toSet
    assert(leaves == Set("k.rf", "m.price"),
      s"expected exactly the two touched leaves, got $leaves")
  }

  test("q233 result matches the flat recomputation from the fixture") {
    val got = RelationalQueries.nestedPrunedFrame(spark, dir).collect()
    val want = graft.Tables(spark, dir, "lineitem")
      .groupBy(org.apache.spark.sql.functions.col("l_returnflag").as("rf"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .orderBy("rf").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0) && g.getLong(1) == w.getLong(1))
    }
  }
}
