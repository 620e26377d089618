package graft

import graft.operators.DistributedRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DistributedRank must be BIT-IDENTICAL to the single-partition window
  * formulations it replaces (row_number / strict-prefix running max), for
  * every partition count — including parts larger than the row count (empty
  * range partitions) and parts = 1 (degenerate single range). The fixtures
  * include duplicate order-key prefixes and a seeded-random frame so range
  * boundaries land inside runs of near-equal keys. */
class DistributedRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def randFrame(n: Int) = {
    val rnd = new scala.util.Random(42)
    (1 to n).map(i => (i.toLong, s"g${rnd.nextInt(3)}", rnd.nextInt(40).toLong))
      .toDF("id", "grp", "v")
  }

  test("global row_number matches the window form for varied partition counts") {
    val df = randFrame(200).cache()
    val expected = df
      .withColumn("rn", row_number().over(Window.orderBy("v", "id")).cast("long"))
      .select("id", "rn").as[(Long, Long)].collect().sortBy(_._1).toSeq
    for (parts <- Seq(1, 3, 7, 300)) {
      val got = DistributedRank
        .withRowNumber(df, Seq(col("v"), col("id")), "rn", numParts = parts)
        .select("id", "rn").as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == expected, s"parts=$parts")
    }
    df.unpersist()
  }

  test("grouped row_number matches PARTITION BY window form") {
    val df = randFrame(200).cache()
    val expected = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy("v", "id")).cast("long"))
      .select("id", "rn").as[(Long, Long)].collect().sortBy(_._1).toSeq
    for (parts <- Seq(1, 5, 64)) {
      val got = DistributedRank
        .withRowNumber(df, Seq(col("v"), col("id")), "rn",
          group = Seq("grp"), numParts = parts)
        .select("id", "rn").as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == expected, s"parts=$parts")
    }
    df.unpersist()
  }

  test("NULL group keys rank as one ordinary partition (window parity)") {
    val df = randFrame(120)
      .withColumn("grp", when(col("id") % 4 === 0, lit(null)).otherwise(col("grp")))
      .cache()
    val expected = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy("v", "id")).cast("long"))
      .select("id", "rn").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val got = DistributedRank
      .withRowNumber(df, Seq(col("v"), col("id")), "rn",
        group = Seq("grp"), numParts = 5)
      .select("id", "rn").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.length == expected.length, "null-group rows must not be dropped")
    assert(got == expected)
    df.unpersist()
  }

  test("descending order keys rank identically to the window form") {
    val df = randFrame(80).cache()
    val expected = df
      .withColumn("rn", row_number().over(
        Window.orderBy(col("v").desc, col("id"))).cast("long"))
      .select("id", "rn").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val got = DistributedRank
      .withRowNumber(df, Seq(col("v").desc, col("id")), "rn", numParts = 5)
      .select("id", "rn").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == expected)
    df.unpersist()
  }

  test("strict prefix max matches the ROWS UNBOUNDED..1 PRECEDING window") {
    // unique order key (required contract), non-monotone values
    val df = randFrame(150).groupBy("v").agg(max("id").as("m")).cache()
    val expected = df
      .withColumn("pm", max(col("m")).over(
        Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)))
      .select("v", "pm").as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    for (parts <- Seq(1, 4, 200)) {
      val got = DistributedRank
        .withStrictPrefixMax(df, col("v"), col("m"), "pm", numParts = parts)
        .select("v", "pm").as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
      assert(got == expected, s"parts=$parts")
      // exactly one row (the global minimum of the order key) has no prefix
      assert(got.count(_._2.isEmpty) == 1)
    }
    df.unpersist()
  }

  test("inclusive prefix sum matches the ROWS UNBOUNDED PRECEDING window") {
    val df = randFrame(150).groupBy("v").agg(max("id").as("m")).cache()
    val expected = df
      .withColumn("ps", sum(col("m")).over(
        Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)))
      .select("v", "ps").as[(Long, Long)].collect().sortBy(_._1).toSeq
    for (parts <- Seq(1, 4, 200)) {
      val got = DistributedRank
        .withPrefixSum(df, Seq(col("v")), col("m"), "ps", numParts = parts)
        .select("v", "ps").as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == expected, s"parts=$parts")
    }
    df.unpersist()
  }

  test("no unpartitioned WindowExec in the planned shape") {
    import org.apache.spark.sql.execution.window.WindowExecBase
    val df = randFrame(50)
    val plan = DistributedRank
      .withRowNumber(df, Seq(col("v"), col("id")), "rn", numParts = 4)
      .queryExecution.executedPlan
    val bad = plan.collect { case w: WindowExecBase if w.partitionSpec.isEmpty => w }
    assert(bad.isEmpty)
    spark.catalog.clearCache()
  }
}
