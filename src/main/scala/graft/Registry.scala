package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central query registry. Every operator the engine claims (SURVEY.md §2B)
  * registers one named query plus (where SQL-expressible) an equivalent ANSI
  * SQL string the driver runs in DuckDB over the same parquet tables.
  *
  * Determinism contract (FIXTURES.md): explicit ORDER BY with full tiebreak
  * keys, round(·,4) on double outputs, explicit casts at Spark/DuckDB type
  * divergence points, UTC session timezone.
  */
object Registry {
  type QueryFn = (SparkSession, String) => DataFrame

  /** One declared engine capability. `oracle=None` → driver records the
    * weaker rows-only check (used for approx/streaming-only/binary ops). */
  final case class Q(name: String, doc: String, fn: QueryFn, oracle: Option[String])

  def q(name: String, doc: String)(sql: String)(fn: QueryFn): Q =
    Q(name, doc, fn, Some(sql))

  def rowsOnly(name: String, doc: String)(fn: QueryFn): Q =
    Q(name, doc, fn, None)
}

/** Fixture-table loaders (TESTDATA.md). One parquet file per table. */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Fixture-format defenses, set here (runtime-settable SQL confs) so
    // callers with their own sessions — the driver's entry smoke — don't
    // crash on either generation of the driver fixtures:
    //  * pre-r5 events.parquet is ns-precision, which Spark 4 refuses
    //    outright unless nanosAsLong is set;
    //  * r5+ fixtures write every timestamp column µs with
    //    isAdjustedToUTC=false, which Spark 4 would otherwise read as
    //    TIMESTAMP_NTZ (inferTimestampNTZ defaults true) — the engine and
    //    the DuckDB oracle both treat them as UTC instants, so pin the
    //    legacy TIMESTAMP (LTZ) read; sessions run UTC, values identical.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is nanosecond-precision parquet (TESTDATA.md); Spark reads it
    // as LongType nanos under spark.sql.legacy.parquet.nanosAsLong. Truncate
    // to µs TimestampType — the same truncation DuckDB's ts::TIMESTAMP does
    // (SURVEY.md §7.3#1).
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** Table scan fanned out across all cores. The fixture tables are one
    * parquet file with ONE row group — unsplittable, so any per-row-heavy
    * derivation (shingling, hashing, vector math) would otherwise run in a
    * single task. At a real deployment the source has many
    * files/partitions; this shuffle emulates that. Use for compute-heavy
    * bases only — plain scans/filters don't need it. */
  def fanout(spark: SparkSession, dir: String, name: String): DataFrame =
    apply(spark, dir, name).repartition(spark.sparkContext.defaultParallelism)
}
