package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Multi-batch semantics of the streaming leaderboard (q149): the per-key
  * top-3 state must persist across micro-batches, so a later batch's better
  * rows DISPLACE earlier leaders and worse rows leave the board untouched —
  * the property the single-batch oracle replay cannot itself prove. The
  * emissions carry a monotone events-seen counter, and the registry query's
  * final select reduces each (type, rank) slot to its max-counter emission —
  * asserted here to return exactly the LATEST board (no stale batch-1 rows),
  * which is what makes the query safe under multi-file/multi-batch replay. */
class StreamTopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("later batches displace leaders; max-counter reduction yields the latest board") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ms = MemoryStream[(String, Long, Double)]
    // identical state logic to q149_stream_topk: (board, seen-counter) state
    val board = ms.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[(Double, Long)], Long), (String, Long, Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (et: String, it: Iterator[(String, Long, Double)],
         state: GroupState[(Seq[(Double, Long)], Long)]) =>
          val (prev, seen) = state.getOption.getOrElse((Seq.empty[(Double, Long)], 0L))
          val arrivals = it.map(r => (r._3, r._2)).toVector
          val merged = (prev ++ arrivals).sortBy { case (v, id) => (-v, id) }.take(3)
          val n = seen + arrivals.size
          state.update((merged, n))
          merged.zipWithIndex.iterator.map { case ((v, id), i) => (et, n, (i + 1).toLong, id, v) }
      }
      .toDF("event_type", "n", "rnk", "event_id", "value")

    val ckpt = Files.createTempDirectory("graft-topk-ckpt").toString
    val name = s"topk_${System.nanoTime()}"
    val query = board.writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .format("memory").queryName(name).start()
    try {
      // batch 1: board for "a" = (10,1), (8,2), (5,3); counter = 4
      ms.addData(("a", 1L, 10.0), ("a", 2L, 8.0), ("a", 3L, 5.0), ("a", 4L, 1.0))
      query.processAllAvailable()
      // batch 2: 9.0 displaces 5.0; 0.5 is ignored; tie at 8.0 breaks on id;
      // counter = 7
      ms.addData(("a", 9L, 9.0), ("a", 5L, 0.5), ("a", 0L, 8.0))
      query.processAllAvailable()
    } finally query.stop()

    // raw append-mode emissions: one full board per batch, tagged n=4 / n=7
    val emissions = spark.table(name)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(emissions == Set(
      ("a", 4L, 1L, 1L, 10.0), ("a", 4L, 2L, 2L, 8.0), ("a", 4L, 3L, 3L, 5.0),
      ("a", 7L, 1L, 1L, 10.0), ("a", 7L, 2L, 9L, 9.0), ("a", 7L, 3L, 0L, 8.0)),
      emissions.mkString(", "))

    // q149's sink reduction: each (type, rank) slot keeps its max-counter
    // emission — exactly the batch-2 board, with the stale batch-1
    // (3,5.0) row gone
    val latest = spark.table(name)
      .groupBy("event_type", "rnk")
      .agg(max(struct(col("n"), col("event_id"), col("value"))).as("last"))
      .select(col("event_type"), col("rnk"), col("last.event_id"), col("last.value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(latest == Set(
      ("a", 1L, 1L, 10.0), ("a", 2L, 9L, 9.0), ("a", 3L, 0L, 8.0)),
      latest.mkString(", "))
  }
}
