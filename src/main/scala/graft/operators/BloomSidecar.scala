package graft.operators

import graft.functions.BloomAggregator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Point-lookup file skipping on a NON-layout column — the complement of
  * `LayoutWriter`'s envelope pruning. Envelopes (min/max per file) prune
  * range predicates on the SORT columns; a point lookup on any other
  * column sees useless envelopes (every file spans the whole domain).
  * The lakehouse answer (Iceberg/Delta bloom column stats, Parquet
  * bloom_filter metadata — public formats) is a per-file Bloom filter
  * sidecar: tiny fixed-size bit arrays the planner probes to decide which
  * files can possibly contain the key.
  *
  * Layout: `outDir/data/bucket=N` directories (the partitioned table) +
  * `outDir/bloom` (one row per bucket: the OR-merged bit array + row
  * count). The probe collects the sidecar — bounded by bucket count, the
  * same metadata-scale collect a table-format planner does when reading
  * manifest files — and turns the surviving bucket ids into a static
  * partition filter, so dead buckets' files are never opened; the key
  * equality then pushes down into the survivors' row groups.
  */
object BloomSidecar {
  val MBits = 1 << 18 // 32 KiB of bits per bucket
  val K = 4

  /** Write `df` partitioned by `bucketOf` with a per-bucket Bloom sidecar
    * over `key`. The sidecar is aggregated from the WRITTEN files (exact
    * for what is on disk, LayoutWriter's discipline). */
  def write(df: DataFrame, bucketOf: org.apache.spark.sql.Column,
            key: String, outDir: String): Unit = {
    require(!df.columns.contains("bucket"),
      s"BloomSidecar reserves the column name 'bucket' (got ${df.columns.mkString(", ")})")
    df.withColumn("bucket", bucketOf.cast("long"))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$outDir/data")
    val bloom = udaf(new BloomAggregator(MBits, K))
    df.sparkSession.read.parquet(s"$outDir/data")
      .groupBy("bucket")
      .agg(bloom(col(key)).as("bf"), count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/bloom")
  }

  /** Buckets whose sidecar filter admits `probe` — what the planner would
    * scan. No false negatives: the bucket holding `probe` is always in the
    * result (BloomSidecarSpec's property). */
  def liveBuckets(spark: SparkSession, outDir: String, probe: Long): Array[Long] =
    spark.read.parquet(s"$outDir/bloom")
      .select(col("bucket").cast("long"), col("bf"))
      .collect()
      .filter(r => BloomAggregator.mightContain(r.getSeq[Long](1), probe, K))
      .map(_.getLong(0))
      .sorted

  /** Point read through sidecar pruning: surviving buckets become a static
    * partition filter (directory pruning), the equality pushes down into
    * the survivors. */
  def readPoint(spark: SparkSession, outDir: String, key: String,
                probe: Long): DataFrame = {
    val live = liveBuckets(spark, outDir, probe)
    spark.read.parquet(s"$outDir/data")
      .filter(col("bucket").isin(live.toIndexedSeq: _*) && col(key) === probe)
      .drop("bucket")
  }
}
