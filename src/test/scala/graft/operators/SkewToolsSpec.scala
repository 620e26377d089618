package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted two-phase aggregation must be exactly equivalent to the direct
  * aggregation, including on a deliberately hot-keyed input. */
class SkewToolsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("saltedAgg ≡ direct groupBy on a hot-keyed dataset") {
    // 90% of rows share one key — the shape that melts a single reducer
    val hot = spark.range(100000)
      .select(when(col("id") % 10 < 9, "HOT").otherwise(concat(lit("k"), col("id") % 97)).as("k"),
        (col("id") % 1000).cast("double").as("v"))
    val direct = hot.groupBy("k")
      .agg(count(lit(1)).as("n"), round(sum("v"), 4).as("s"),
        min("v").as("mn"), max("v").as("mx"))
      .orderBy("k").collect()
    val salted = SkewTools.saltedAgg(hot, Seq("k"), buckets = 16, Seq(
      ("n", count(lit(1)), sum(_)),
      ("s", sum(col("v")), c => round(sum(c), 4)),
      ("mn", min(col("v")), min(_)),
      ("mx", max(col("v")), max(_))))
      .orderBy("k").collect()
    assert(salted.toSeq == direct.toSeq)
    assert(direct.length == 98) // HOT + 97 cold keys
  }
}
