package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Multi-batch semantics of the streaming leaderboard (q149): the per-key
  * top-3 state must persist across micro-batches, so a later batch's better
  * rows DISPLACE earlier leaders and worse rows leave the board untouched —
  * the property the single-batch oracle replay cannot itself prove. */
class StreamTopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("later batches displace leaders; worse arrivals leave the board unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ms = MemoryStream[(String, Long, Double)]
    val board = ms.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(Double, Long)], (String, Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (et: String, it: Iterator[(String, Long, Double)],
         state: GroupState[Seq[(Double, Long)]]) =>
          val merged = (state.getOption.getOrElse(Seq.empty) ++ it.map(r => (r._3, r._2)))
            .sortBy { case (v, id) => (-v, id) }.take(3)
          state.update(merged)
          merged.zipWithIndex.iterator.map { case ((v, id), i) => (et, (i + 1).toLong, id, v) }
      }
      .toDF("event_type", "rnk", "event_id", "value")

    val ckpt = Files.createTempDirectory("graft-topk-ckpt").toString
    val name = s"topk_${System.nanoTime()}"
    val query = board.writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .format("memory").queryName(name).start()
    try {
      // batch 1: board for "a" = (10,1), (8,2), (5,3)
      ms.addData(("a", 1L, 10.0), ("a", 2L, 8.0), ("a", 3L, 5.0), ("a", 4L, 1.0))
      query.processAllAvailable()
      // batch 2: 9.0 displaces 5.0; 0.5 is ignored; tie at 8.0 breaks on id
      ms.addData(("a", 9L, 9.0), ("a", 5L, 0.5), ("a", 0L, 8.0))
      query.processAllAvailable()
    } finally query.stop()

    // append-mode memory sink accumulates one board emission per batch:
    // batch 1 = (1,10)(2,8)(3,5); batch 2 = (1,10)(9,9)(0,8) — 9.0 displaced
    // 5.0, 0.5 was ignored, and id 0 wins the 8.0 tie against id 2
    val emissions = spark.table(name)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(emissions == Set(
      ("a", 1L, 1L, 10.0), ("a", 2L, 2L, 8.0), ("a", 3L, 3L, 5.0),
      ("a", 2L, 9L, 9.0), ("a", 3L, 0L, 8.0)),
      emissions.mkString(", "))
  }
}
