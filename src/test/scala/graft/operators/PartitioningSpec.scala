package graft.operators

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the SCALE.md partitioning claims on real plans:
  * partitioned writes → static partition pruning at the scan, and bucketed
  * tables → co-located joins with no shuffle exchange. Also exercises the
  * file-format IO breadth (parquet/csv/json/orc round-trips).
  */
class PartitioningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("partitioned write → partition-pruned scan") {
    val out = Files.createTempDirectory("part").toString
    graft.Tables(spark, dir, "lineitem")
      .write.partitionBy("l_returnflag").mode("overwrite").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("l_returnflag") === "A")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"), plan)
    // only the A partition's rows are read
    val expected = graft.Tables(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "A").count()
    assert(pruned.count() == expected)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    graft.Tables(spark, dir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    graft.Tables(spark, dir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = joined.queryExecution.executedPlan.toString
        val joinSection = plan.substring(0, plan.indexOf("HashAggregate"))
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
        // no Exchange below the join: bucket layout provides the partitioning
        assert(!joinSection.contains("Exchange hashpartitioning"), plan)
        val n = joined.agg(sum("n")).collect().head.getLong(0)
        assert(n == graft.Tables(spark, dir, "lineitem").count())
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("compaction rewrites many small files into the target count, rows intact") {
    val base = Files.createTempDirectory("compact").toString
    val src = graft.Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"))
    src.repartition(64).write.mode("overwrite").parquet(s"$base/small")
    def parquetFiles(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$base/small") == 64)
    spark.read.parquet(s"$base/small").repartition(4)
      .write.mode("overwrite").parquet(s"$base/compact")
    assert(parquetFiles(s"$base/compact") == 4)
    assert(spark.read.parquet(s"$base/compact").count() == src.count())
  }

  test("file-format IO breadth: parquet/csv/json/orc round-trips") {
    val base = Files.createTempDirectory("fmt").toString
    val src = graft.Tables(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
    val n = src.count()
    Seq("parquet", "json", "orc").foreach { fmt =>
      src.write.format(fmt).mode("overwrite").save(s"$base/$fmt")
      assert(spark.read.format(fmt).load(s"$base/$fmt").count() == n, fmt)
    }
    src.write.option("header", "true").mode("overwrite").csv(s"$base/csv")
    val csv = spark.read.option("header", "true")
      .schema(src.schema).csv(s"$base/csv")
    assert(csv.count() == n)
    assert(csv.except(src).count() == 0) // value fidelity through csv
  }
}
