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

  test("global dense_rank matches the window form for varied partition counts") {
    // round-11: withDenseRank ranks the FULL frame (no distinct/join-back),
    // so its contract is dense_rank() OVER (ORDER BY ...) bit-parity —
    // duplicate keys share a rank and ranks have no gaps. Partition counts
    // beyond the row count exercise empty range partitions; the duplicated
    // v values exercise equal-keys-don't-straddle-boundaries.
    val df = randFrame(200).cache()
    val expected = df
      .withColumn("dr", dense_rank().over(Window.orderBy("v")).cast("long"))
      .select("id", "dr").as[(Long, Long)].collect().sortBy(_._1).toSeq
    for (parts <- Seq(1, 3, 7, 300)) {
      val got = DistributedRank
        .withDenseRank(df, Seq(col("v")), "dr", numParts = parts)
        .select("id", "dr").as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == expected, s"parts=$parts")
    }
    // two-column keys (the q221 pairing shape), incl. a sentinel column
    val df2 = randFrame(150)
      .withColumn("v2", when(col("id") % 5 === 0, lit(0L)).otherwise(col("v") % 7))
      .cache()
    val exp2 = df2
      .withColumn("dr", dense_rank().over(Window.orderBy("v", "v2")).cast("long"))
      .select("id", "dr").as[(Long, Long)].collect().sortBy(_._1).toSeq
    for (parts <- Seq(1, 6, 40)) {
      val got2 = DistributedRank
        .withDenseRank(df2, Seq(col("v"), col("v2")), "dr", numParts = parts)
        .select("id", "dr").as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got2 == exp2, s"parts=$parts")
    }
    df.unpersist(); df2.unpersist()
    DistributedRank.unpersistAll()
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

  test("StorageLevel.NONE mode: identical ranks, ONE materialized range exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    import org.apache.spark.storage.StorageLevel
    def flatten(p: org.apache.spark.sql.execution.SparkPlan) =
      SparkTestSession.flattenExecuted(p)
    // isolate from earlier tests: a still-cached structurally-equal
    // range-partitioned frame would be substituted by the CacheManager and
    // hide the exchange this test pins
    DistributedRank.unpersistAll()
    spark.catalog.clearCache()
    val df = randFrame(200)
    val expected = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy("v", "id")).cast("long"))
      .select("id", "rn").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val ranked = DistributedRank.withRowNumber(df, Seq(col("v"), col("id")), "rn",
      group = Seq("grp"), numParts = 5, storage = StorageLevel.NONE)
      .select("id", "rn")
    val got = ranked.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    assert(got == expected)
    // correctness of the non-persisted mode RIDES on exchange/stage reuse:
    // both passes must read the SAME materialized range shuffle (identical
    // sampled boundaries). Pin it on the JUST-EXECUTED plan: exactly one
    // distinct exchange OBJECT.
    val exchangeObjects = flatten(ranked.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[RangePartitioning] => e }
      .map(System.identityHashCode).distinct
    assert(exchangeObjects.size == 1,
      s"expected ONE reused range exchange, got ${exchangeObjects.size}; nodes=\n" +
        flatten(ranked.queryExecution.executedPlan)
          .map(p => p.getClass.getSimpleName + " :: " + p.outputPartitioning)
          .mkString("\n"))
    // prefix-sum and prefix-max arms in the same mode
    val base = randFrame(150).groupBy("v").agg(max("id").as("m"))
    val expPs = base.withColumn("ps", sum(col("m")).over(
        Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)))
      .select("v", "ps").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val gotPs = DistributedRank.withPrefixSum(base, Seq(col("v")), col("m"), "ps",
        numParts = 4, storage = StorageLevel.NONE)
      .select("v", "ps").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(gotPs == expPs)
    val expPm = base.withColumn("pm", max(col("m")).over(
        Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)))
      .select("v", "pm").as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    val gotPm = DistributedRank.withStrictPrefixMax(base, col("v"), col("m"), "pm",
        numParts = 4, storage = StorageLevel.NONE)
      .select("v", "pm").as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(gotPm == expPm)
  }

  test("unpersistAll releases every helper-cached frame") {
    spark.catalog.clearCache()
    val df = randFrame(100)
    // two chained helper calls -> two registered persists (the leak shape
    // ADVICE flagged: q174's rank->prefix-sum chain)
    val ranked = DistributedRank.withRowNumber(df, Seq(col("v"), col("id")), "rn")
    val summed = DistributedRank.withPrefixSum(ranked, Seq(col("rn")), col("v"), "ps")
    summed.count()
    assert(!spark.sharedState.cacheManager.isEmpty, "helpers should have cached")
    DistributedRank.unpersistAll()
    assert(spark.sharedState.cacheManager.isEmpty,
      "unpersistAll must release all helper-cached frames")
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
