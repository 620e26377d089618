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
      operators.VectorQueries.all ++
      operators.ExtrasQueries.all ++
      streaming.StreamingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape over lineitem — grouped aggregation end-to-end. */
  def entry(spark: SparkSession): DataFrame =
    queries("q09_agg_q1")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
