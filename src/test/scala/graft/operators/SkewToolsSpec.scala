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

  test("AQE skew join splits the hot partition (the runtime twin of saltedJoin)") {
    // Manual salting (q177) is the plan-time answer to key skew; Spark's
    // AQE skew-join is the RUNTIME answer the engine leans on at 100 TB
    // when skew is not known in advance. This pins that the lever actually
    // engages: a deliberately hot-keyed sort-merge join, thresholds tuned
    // to local data sizes, must re-plan with SortMergeJoin(skew=true) —
    // the hot partition split into advisory-sized reads instead of one
    // melted reducer.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 80% of the big side lands on one key; the small side is uniform
      val big = spark.range(200000)
        .select(when(col("id") % 10 < 8, 0L).otherwise(col("id") % 997).as("k"),
          concat(lit("payload-"), col("id")).as("p"))
      val dim = spark.range(997).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("d"))
      // aggregate on the DIM column, not the join key: a same-key parent
      // would pin the join's output partitioning and (correctly) veto the
      // skew split — the veto is itself part of the rule's contract
      val j = big.join(dim, "k").groupBy("d").agg(count(lit(1)).as("n"))
      // execute THIS dataframe (a derived .filter would re-plan separately),
      // then read the final adaptive plan off the same execution
      val rows = j.collect()
      // 160000 hot rows + the 40 uniform rows whose id % 997 is also 0
      assert(rows.find(_.getString(0) == "d0").get.getLong(1) == 160040L)
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
