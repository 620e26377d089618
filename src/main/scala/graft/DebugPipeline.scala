package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: stage-by-stage timing of the ingest pipeline over wire
  * lines synthesized from the events fixture (used to find the 4×-JSON-parse
  * dispatch regression; kept for future perf triage). */
object DebugPipeline {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val lines = Tables(spark, dir, "events")
      .crossJoin(spark.range(10).select(col("id").as("rep")))
      .select(to_json(struct(
        array(struct(col("value").cast("string").as("price"), (col("rep") + 1).as("liquidity"))).as("asks"),
        array(struct((col("value") - lit(0.01)).cast("string").as("price"), lit(1L).as("liquidity"))).as("bids"),
        col("value").cast("string").as("closeoutAsk"),
        (col("value") - lit(0.01)).cast("string").as("closeoutBid"),
        col("event_type").as("instrument"), lit("tradeable").as("status"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("time"))).as("value"))
      .cache()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    t("materialize lines")(lines.count())
    t("parse+derive+proto project")(streaming.OandaPipeline.pipeline(lines)
      .select(col("message_type"), col("proto")).filter(col("proto").isNotNull).count())
    t("dispatch groupBy")(streaming.OandaPipeline.parse(lines)
      .groupBy("message_type").agg(count(lit(1))).count())
    t("full + groupBy")(streaming.OandaPipeline.pipeline(lines)
      .groupBy("message_type").agg(count(lit(1)), count(col("proto"))).count())
    spark.stop()
  }
}
