package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Cross-batch semantics of the streaming EWMA (q152): the fold must
  * CONTINUE from the persisted state, so splitting the same series across
  * two batches yields exactly the single-batch fold — the property the
  * single-batch oracle replay cannot itself prove. */
class StreamEwmaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("the fold continues across batches: split series == one-shot fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ms = MemoryStream[(String, Long, Double)] // (key, seq, value)
    val folded = ms.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Double, Long), (String, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (et: String, it: Iterator[(String, Long, Double)],
         state: GroupState[(Double, Long)]) =>
          val batch = it.toVector.sortBy(_._2).map(_._3)
          val (seed, seen) = state.getOption.getOrElse((batch.head, 1L))
          val rest = if (state.getOption.isEmpty) batch.tail else batch
          val ewma = rest.foldLeft(seed)((a, x) => (a + x) / 2)
          val n = seen + rest.size
          state.update((ewma, n))
          Iterator((et, n, ewma))
      }
      .toDF("k", "n", "ewma")

    val ckpt = Files.createTempDirectory("graft-ewma-ckpt").toString
    val name = s"ewma_${System.nanoTime()}"
    val query = folded.writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .format("memory").queryName(name).start()
    try {
      ms.addData(("a", 1L, 10.0), ("a", 2L, 20.0))
      query.processAllAvailable()
      ms.addData(("a", 3L, 40.0), ("a", 4L, 8.0))
      query.processAllAvailable()
    } finally query.stop()

    // one-shot fold: ((10+20)/2 + 40)/2 = 27.5; (27.5+8)/2 = 17.75
    val got = spark.table(name)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("a", 2L, 15.0), ("a", 4L, 17.75)), got)
  }
}
