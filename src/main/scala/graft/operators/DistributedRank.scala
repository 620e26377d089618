package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact global (or grouped) `row_number` without a data-sized
  * single-partition sort — the classic two-pass distributed rank:
  *
  *  1. range-partition the input on (group ++ order) so partition i holds
  *     strictly earlier sort keys than partition i+1 (equal keys never
  *     straddle a boundary — RangePartitioner binary-searches on the key);
  *  2. count rows per (partition, group) — a tiny aggregate bounded by
  *     `parts × |groups|`, i.e. by CONFIG, not by data;
  *  3. offsets = triangular self-join of that tiny frame (sum of earlier
  *     partitions' counts for the same group) — broadcast both ways, no
  *     window anywhere near it;
  *  4. rank = offset + local `row_number` over a window partitioned by
  *     (partition id, group) — every window partition is one range
  *     partition's slice, so the sort that Spark's unpartitioned WindowExec
  *     would funnel through ONE task is spread across all of them.
  *
  * The result is bit-identical to `row_number() OVER ([PARTITION BY g]
  * ORDER BY o)` whenever the order key is a total order within each group
  * (callers append a unique tiebreak column, same as they must for any
  * deterministic rank). Ties that DO remain only ever produce identical
  * output rows, because equal full keys land in the same range partition.
  *
  * Cost model: two passes over the input (the counts job and the rank job)
  * instead of one single-partition sort — the standard trade. The
  * range-partitioned frame is persisted (knob: `storage`) so the two passes
  * share one upstream computation AND see identical range boundaries.
  *
  * Persistence contract (the 100 TB knob):
  *  - default `MEMORY_AND_DISK` suits bench/local scale;
  *  - `DISK_ONLY` fits executors whose memory the fact table exceeds;
  *  - `StorageLevel.NONE` skips the persist entirely: both passes then read
  *    the SAME range exchange via Spark's exchange/stage reuse (the shuffle
  *    files on disk already play the persist role — no second copy), which
  *    also keeps the sampled range boundaries consistent across the passes.
  *    DistributedRankSpec pins both the single-exchange plan shape and rank
  *    equality for this mode.
  * Persisted frames are registered; a library consumer calls
  * [[unpersistAll]] once results are materialized (Verify/Bench clear the
  * whole cache between queries instead).
  */
object DistributedRank {

  /** Frames persisted by the helpers below, so consumers can release them
    * after materializing results — chained calls (rank→prefix-sum) would
    * otherwise accumulate cached inputs for the life of the session. */
  private val persistedFrames =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Unpersists (non-blocking) every frame the helpers have cached. */
  def unpersistAll(): Unit = {
    var df = persistedFrames.poll()
    while (df != null) { df.unpersist(blocking = false); df = persistedFrames.poll() }
  }

  private def pin(df: DataFrame, storage: StorageLevel): DataFrame =
    if (storage == StorageLevel.NONE) {
      // correctness in NONE mode RIDES on exchange/stage reuse: without it
      // the two passes re-sample range boundaries independently (the
      // sampler seeds per RDD) and the counts no longer describe the
      // partitions being ranked — fail loudly instead of returning
      // silently wrong ranks under a legal-but-unusual conf
      require(df.sparkSession.conf.get("spark.sql.exchange.reuse", "true").toBoolean,
        "DistributedRank with StorageLevel.NONE requires spark.sql.exchange.reuse=true " +
          "(both passes must read one shared range exchange); persist instead, or re-enable reuse")
      df
    } else { df.persist(storage); persistedFrames.add(df); df }

  /** Adds BIGINT column `out` = exact 1-based rank of each row by `order`
    * within each distinct value of `group` (global rank when `group` is
    * empty). `order` may carry sort directions (`col.desc`). */
  def withRowNumber(df: DataFrame, order: Seq[Column], out: String,
                    group: Seq[String] = Nil, numParts: Int = 0,
                    storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val parts =
      if (numParts > 0) numParts
      else df.sparkSession.sparkContext.defaultParallelism
    val gcols = group.map(col)
    val parted = pin(df
      .repartitionByRange(parts, (gcols ++ order): _*)
      .withColumn("__pid", spark_partition_id()), storage)
    val counts = parted
      .groupBy(col("__pid") +: gcols: _*)
      .agg(count(lit(1)).as("__cnt"))
    val later = counts.select(
      col("__pid").as("__bpid") +:
        group.map(g => col(g).as(s"__bg_$g")) :+
        col("__cnt").as("__bcnt"): _*)
    // group equality is NULL-SAFE (<=>): a window's PARTITION BY treats
    // NULL as one ordinary partition, and this must match it — a
    // null-unsafe join would zero every null-group offset AND drop
    // null-group rows at the final join (silent row loss)
    val sameGroupEarlier = group
      .map(g => col(g) <=> col(s"__bg_$g"))
      .foldLeft(col("__bpid") < col("__pid"))(_ && _)
    val offsets = counts
      .join(broadcast(later), sameGroupEarlier, "left")
      .groupBy(col("__pid") +: gcols: _*)
      .agg(coalesce(sum(col("__bcnt")), lit(0L)).as("__off"))
    val offRenamed = offsets.select(
      col("__pid").as("__opid") +:
        group.map(g => col(g).as(s"__og_$g")) :+
        col("__off"): _*)
    val joinCond = group
      .map(g => col(g) <=> col(s"__og_$g"))
      .foldLeft(col("__pid") === col("__opid"))(_ && _)
    val w = Window.partitionBy(col("__pid") +: gcols: _*).orderBy(order: _*)
    parted
      .withColumn("__lrn", row_number().over(w))
      .join(broadcast(offRenamed), joinCond)
      .withColumn(out, col("__off") + col("__lrn"))
      .drop(Seq("__pid", "__lrn", "__off", "__opid") ++ group.map(g => s"__og_$g"): _*)
  }

  /** Adds BIGINT column `out` = exact `dense_rank()` of each row by `order`
    * (global, ungrouped) — same two-pass range-partitioned shape as
    * [[withRowNumber]], with per-partition DISTINCT-key counts feeding the
    * triangular offsets. Exact for the same reason the row_number form is:
    * RangePartitioner assigns by binary search on the key, so equal keys
    * never straddle a partition boundary — every distinct key lives in
    * exactly one partition and offset + local dense_rank composes.
    *
    * Round-11 motivation (guide §2.3/§2.4): callers that need a DENSE rank
    * (q221's prefix-doubling rounds: rank of the (k1,k2) pair per position)
    * previously built it as `distinct()` → withRowNumber → join-back —
    * three extra full-data exchanges per round. Ranking the full frame
    * directly removes the distinct AND the join-back at every scale.
    *
    * `order` must be direction-free plain columns (they feed a struct() for
    * the distinct count). */
  def withDenseRank(df: DataFrame, order: Seq[Column], out: String,
                    numParts: Int = 0,
                    storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val parts =
      if (numParts > 0) numParts
      else df.sparkSession.sparkContext.defaultParallelism
    val parted = pin(df
      .repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id()), storage)
    val counts = parted
      .groupBy(col("__pid"))
      .agg(count_distinct(struct(order: _*)).as("__cnt"))
    val later = counts.select(col("__pid").as("__bpid"), col("__cnt").as("__bcnt"))
    val offsets = counts
      .join(broadcast(later), col("__bpid") < col("__pid"), "left")
      .groupBy(col("__pid"))
      .agg(coalesce(sum(col("__bcnt")), lit(0L)).as("__off"))
    val offRenamed = offsets.select(col("__pid").as("__opid"), col("__off"))
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    parted
      .withColumn("__lrn", dense_rank().over(w).cast("long"))
      .join(broadcast(offRenamed), col("__pid") === col("__opid"))
      .withColumn(out, col("__off") + col("__lrn"))
      .drop("__pid", "__lrn", "__off", "__opid")
  }

  /** Adds column `out` = INCLUSIVE running sum of `value` in `order`
    * (`sum(value) OVER (ORDER BY o ROWS UNBOUNDED PRECEDING)`) — the
    * prefix-sum scan, same two-pass shape as [[withStrictPrefixMax]]:
    * per-range-partition totals combine through the triangular broadcast,
    * local windows stay per-partition. `order` must be unique (ties make
    * any inclusive running sum order-dependent). `value` must be integral
    * (LongType sums — float prefix sums are re-association-sensitive and
    * have no cross-engine contract). */
  def withPrefixSum(df: DataFrame, order: Seq[Column], value: Column,
                    out: String, numParts: Int = 0,
                    storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val parts =
      if (numParts > 0) numParts
      else df.sparkSession.sparkContext.defaultParallelism
    val parted = pin(df
      .repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id()), storage)
    val psum = parted.groupBy(col("__pid")).agg(sum(value).as("__psum"))
    val earlier = psum.select(col("__pid").as("__bpid"), col("__psum").as("__bsum"))
    val prefix = psum
      .join(broadcast(earlier), col("__bpid") < col("__pid"), "left")
      .groupBy(col("__pid"))
      .agg(coalesce(sum(col("__bsum")), lit(0L)).as("__pre"))
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    parted
      .withColumn("__loc", sum(value).over(w))
      .join(broadcast(prefix), Seq("__pid"))
      .withColumn(out, col("__loc") + col("__pre"))
      .drop("__pid", "__loc", "__pre")
  }

  /** Adds column `out` = max of `value` over all rows STRICTLY before the
    * current one in `order` (`max(value) OVER (ORDER BY o ROWS BETWEEN
    * UNBOUNDED PRECEDING AND 1 PRECEDING)`) — the running-max scan — again
    * as two passes instead of a single-partition window: per-range-partition
    * maxima (a ≤`parts`-row frame) prefix-combine through the same
    * triangular broadcast join, and each row takes the greater of its
    * partition-local shifted running max and the combined max of all
    * earlier partitions (`greatest` skips nulls, so the global first row
    * stays null exactly like the window form). `order` must be unique —
    * with duplicate keys the shift-by-one inside a tie is order-dependent
    * in ANY formulation, windowed or not. */
  def withStrictPrefixMax(df: DataFrame, order: Column, value: Column,
                          out: String, numParts: Int = 0,
                          storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val parts =
      if (numParts > 0) numParts
      else df.sparkSession.sparkContext.defaultParallelism
    val parted = pin(df
      .repartitionByRange(parts, order)
      .withColumn("__pid", spark_partition_id()), storage)
    val pmax = parted.groupBy(col("__pid")).agg(max(value).as("__pmax"))
    val earlier = pmax.select(col("__pid").as("__bpid"), col("__pmax").as("__bmax"))
    val prefix = pmax
      .join(broadcast(earlier), col("__bpid") < col("__pid"), "left")
      .groupBy(col("__pid"))
      .agg(max(col("__bmax")).as("__pre"))
    val w = Window.partitionBy(col("__pid")).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, -1)
    parted
      .withColumn("__loc", max(value).over(w))
      .join(broadcast(prefix), Seq("__pid"))
      .withColumn(out, greatest(col("__loc"), col("__pre")))
      .drop("__pid", "__loc", "__pre")
  }
}
