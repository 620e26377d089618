package graft.plans

import graft.SparkTestSession
import graft.operators.RelationalQueries
import org.scalatest.funsuite.AnyFunSuite

/** q217/q218 exist to DEMONSTRATE two runtime re-planning levers, and a
  * value-correct run that silently lost the lever (skew split skipped, no
  * Bloom filter injected) would still hash-match its oracle — the plain
  * join computes the same rows. These pins make the demonstrations
  * load-bearing: the executed plan must actually carry the optimization.
  *
  * Both frames are materialized under the SAME confs the registry entries
  * set, via the factored-out frame builders, so the spec inspects the plan
  * the registry runs — not a lookalike.
  */
class RuntimeReplanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def withConfs(confs: Map[String, String])(body: => Unit): Unit = {
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q217's executed sort-merge join carries skew=true (AQE split fired)") {
    withConfs(Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512b")) {
      val df = RelationalQueries.aqeSkewFrame(spark, dir)
      df.collect() // AQE finalizes the plan only on execution
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"join left the SMJ path:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    }
  }

  test("q218's executed plan gates the lineitem scan with an injected Bloom filter") {
    withConfs(Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")) {
      val df = RelationalQueries.runtimeBloomFrame(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // the injected expression renders as might_contain(scalar-subquery
      // over bloom_filter_agg(xxhash64(o_orderkey)))
      assert(plan.contains("might_contain"),
        s"no injected runtime Bloom filter in plan:\n$plan")
    }
  }
}
