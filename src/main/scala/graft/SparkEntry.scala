package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator the engine declares (SURVEY.md §2B) is one entry in
  * `queries`; SQL-expressible ones also appear in `oracleSql` with IDENTICAL
  * output column names (the driver's compare sorts columns by name before
  * hashing values).
  */
object SparkEntry {

  /** All registered capability queries, in declaration order. */
  def registry: Seq[Registry.Q] =
    operators.RelationalQueries.all ++
      operators.TimeWindowQueries.all ++
      operators.DedupQueries.all ++
      operators.TextQueries.all ++
      operators.PipelineQueries.all ++
      operators.VectorQueries.all ++
      operators.GraphQueries.all ++
      operators.AnalyticsQueries.all ++
      operators.StatsQueries.all ++
      operators.ExperimentQueries.all ++
      operators.CurationQueries.all ++
      operators.ExtrasQueries.all ++
      streaming.StreamingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY §7.1 M1 slice: tick-shaped wire lines through the full
    * reference pipeline (parse → dispatch → spread/timestamp derive → proto
    * encode), answering "current spread per instrument from raw feed lines"
    * entirely through the engine. */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    import streaming.WireLines._
    val lines = Tables(spark, dir, "events").select(
      tickLine(
        asks = array(level(col("value"), lit(1000000L))),
        bids = array(level(col("value") - 0.01, lit(1000000L))),
        closeoutAsk = col("value"), closeoutBid = col("value") - 0.01,
        instrument = col("event_type"), time = isoMicros(col("ts"))).as("value"))
      .repartition(spark.sparkContext.defaultParallelism) // single-file fixture → fan out
    streaming.OandaPipeline.pipeline(lines)
      .filter(col("message_type") === "price_tick")
      .groupBy(col("tick.instrument").as("instrument"))
      .agg(count(lit(1)).as("n_ticks"),
        round(avg(col("spread")), 5).as("avg_spread"),
        max(col("event_ts")).as("latest_tick"))
      .orderBy("instrument")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
