package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The observe() metrics surface — P18-adjacent monitoring: named metrics
  * ride the query as zero-cost aggregates and surface on completion,
  * without a second scan of the data (how a pipeline reports row counts /
  * value bounds per stage at 100 TB — no extra action, no caching). */
class ObservationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("observed metrics match a direct aggregate without a second scan") {
    val obs = Observation("lineitem_stats")
    val df = Tables(spark, dir, "lineitem")
      .observe(obs,
        count(lit(1)).as("rows"),
        min(col("l_quantity")).as("min_q"),
        max(col("l_quantity")).as("max_q"))
      .filter(col("l_quantity") >= 0) // the observed point sits above the scan
    val n = df.count()

    val row = obs.get
    assert(row("rows") === n)
    val direct = Tables(spark, dir, "lineitem")
      .agg(min(col("l_quantity")), max(col("l_quantity"))).head()
    assert(row("min_q") === direct.getDouble(0))
    assert(row("max_q") === direct.getDouble(1))
  }
}
