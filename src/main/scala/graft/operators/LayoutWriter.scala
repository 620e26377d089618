package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Closes the data-layout loop that q74 (z-order) and q160 (Hilbert) open:
  * those queries COMPUTE per-bucket min/max pruning envelopes; this writer
  * actually lays the files out in curve order and the reader uses the
  * envelopes to SKIP buckets — the Delta/Iceberg "data skipping via file
  * stats" pattern, expressed with plain partitioned parquet plus a stats
  * sidecar (reference scope: alekna/oanda_stream_processor has no storage
  * layout layer; this is the 100 TB-scale extension SURVEY.md §6 calls for).
  *
  * On-disk layout under `outDir`:
  *   data/bucket=<b>/part-*.parquet  — rows of bucket b, curve-key-sorted
  *                                     within the file (tight parquet
  *                                     row-group stats in BOTH dimensions)
  *   stats/part-*.parquet            — one row per bucket: (x, y) min/max
  *                                     envelope (exactly q74/q160's output)
  *
  * Scale shape: the write is one row-local key computation off a single
  * broadcast scalar (the observed key max — column stats at 100 TB), one
  * hash repartition on the bucket id, and a 16-group aggregate for the
  * sidecar; no global sort, no window (the same no-single-funnel contract
  * q74/q160 satisfy). The read's only driver-side step is collecting the
  * surviving BUCKET IDS — bounded by the bucket count (metadata scale,
  * like any planner reading file statistics), never by the data.
  */
object LayoutWriter {

  /** Write `df` as `buckets` RANGE partitions of `key` (Spark's
    * repartitionByRange: boundaries come from distributed reservoir
    * sampling — equal-sized files with no global sort or single-task
    * funnel; q74/q160 use reproducible fixed-width bins instead only
    * because their BUCKET IDS must match a DuckDB oracle, a constraint the
    * writer doesn't have since the read-back result is layout-invariant),
    * rows curve-sorted within each bucket, plus the per-bucket (x, y)
    * envelope sidecar the pruned read consumes. The sidecar is aggregated
    * from the WRITTEN files (one extra bounded scan), so it is exact for
    * the layout on disk rather than trusting a re-run of the sampler; at
    * 100 TB the same envelopes come straight from the parquet footers. */
  def write(df: DataFrame, x: String, y: String, key: Column,
            outDir: String, buckets: Int = 16): Unit = {
    // `_lkey` is a working column and `bucket` becomes the partition
    // column: a caller frame already carrying either would be silently
    // overwritten (withColumn replaces) or collide at the write
    require(!df.columns.contains("_lkey") && !df.columns.contains("bucket"),
      s"LayoutWriter reserves the column names '_lkey' and 'bucket'; " +
        s"rename them in the input (got ${df.columns.mkString(", ")})")
    df.withColumn("_lkey", key.cast("long"))
      .repartitionByRange(buckets, col("_lkey"))
      .sortWithinPartitions("_lkey")
      // the post-sort projection (dropping the key) preserves
      // intra-partition order; each task writes exactly one curve-sorted
      // file into its own bucket directory
      .select(df.columns.map(col) :+ spark_partition_id().as("bucket"): _*)
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$outDir/data")
    // an EMPTY input writes no partition directories at all, leaving the
    // data dir schema-less; anchor it with one schema-carrying empty flat
    // file so reads still resolve (only then — a flat file NEXT TO
    // bucket= dirs would break partition discovery)
    val dataPath = new org.apache.hadoop.fs.Path(s"$outDir/data")
    val fs = dataPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    if (!fs.listStatus(dataPath).exists(_.getPath.getName.startsWith("bucket=")))
      df.limit(0).withColumn("bucket", lit(0))
        .write.mode("append").parquet(s"$outDir/data")
    df.sparkSession.read.parquet(s"$outDir/data").groupBy("bucket").agg(
        min(col(x)).as("min_x"), max(col(x)).as("max_x"),
        min(col(y)).as("min_y"), max(col(y)).as("max_y"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/stats")
  }

  /** The buckets whose stats envelope intersects the box — what a
    * stats-based planner would scan. */
  def intersectingBuckets(spark: SparkSession, outDir: String,
      xlo: Long, xhi: Long, ylo: Long, yhi: Long): Array[Long] =
    spark.read.parquet(s"$outDir/stats")
      .filter(col("min_x") <= xhi && col("max_x") >= xlo &&
              col("min_y") <= yhi && col("max_y") >= ylo)
      .select(col("bucket").cast("long")).collect().map(_.getLong(0))

  /** Box read through envelope pruning: only the buckets whose sidecar
    * envelope intersects the box are scanned — the bucket IN list becomes a
    * static PartitionFilter (directory pruning, files of dead buckets are
    * never opened) and the box predicates push down to the parquet reader
    * (row-group pruning inside the survivors, tight because rows are
    * curve-sorted). The bucket-id collect is bounded by the bucket count. */
  def readBox(spark: SparkSession, outDir: String,
              x: String, xlo: Long, xhi: Long,
              y: String, ylo: Long, yhi: Long): DataFrame = {
    val live = intersectingBuckets(spark, outDir, xlo, xhi, ylo, yhi)
    spark.read.parquet(s"$outDir/data")
      .filter(col("bucket").isin(live.toIndexedSeq: _*) &&
        col(x).between(xlo, xhi) && col(y).between(ylo, yhi))
      .drop("bucket")
  }
}
