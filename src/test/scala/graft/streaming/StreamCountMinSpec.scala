package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Multi-batch semantics of the stream-maintained count-min grid (q75b):
  * the per-(row, cell) counter state must ACCUMULATE across micro-batches —
  * the cumulative value after batch N is the sum of all N batches' hits, and
  * the final grid (max emission per cell) equals the batch-built sketch over
  * the union of the input. Single-batch oracle replay cannot prove this. */
class StreamCountMinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("cell counters accumulate across batches; max emission = batch-built grid") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // (row, cell) occurrences — the q75b stateful core: running counter per
    // grid cell, post-batch value emitted each batch.
    val ms = MemoryStream[(Int, Long)]
    val cells = ms.toDS()
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, (Int, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), rows: Iterator[(Int, Long)], state: GroupState[Long]) =>
          val c = state.getOption.getOrElse(0L) + rows.size
          state.update(c)
          Iterator((key._1, key._2, c))
      }
      .toDF("i", "cell", "c")

    val ckpt = Files.createTempDirectory("graft-cms-ckpt").toString
    val name = s"cms_${System.nanoTime()}"
    val query = cells.writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .format("memory").queryName(name).start()
    try {
      ms.addData((0, 5L), (0, 5L), (1, 9L)) // batch 1: (0,5)=2, (1,9)=1
      query.processAllAvailable()
      ms.addData((0, 5L), (1, 9L), (1, 9L), (2, 3L)) // batch 2 accumulates
      query.processAllAvailable()
    } finally query.stop()

    val emissions = spark.table(name)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    // batch-1 snapshots AND batch-2 cumulative values must both be present
    assert(emissions == Set(
      (0, 5L, 2L), (1, 9L, 1L),          // after batch 1
      (0, 5L, 3L), (1, 9L, 3L), (2, 3L, 1L)), // after batch 2 (cumulative)
      emissions)

    // final grid = max emission per cell = the batch-built sketch of all data
    val grid = spark.table(name).groupBy("i", "cell")
      .agg(org.apache.spark.sql.functions.max("c").as("c"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(grid == Map((0, 5L) -> 3L, (1, 9L) -> 3L, (2, 3L) -> 1L), grid)
  }
}
