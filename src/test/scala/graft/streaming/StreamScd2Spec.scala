package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Multi-batch semantics of the streaming SCD2 maintainer (q81c): the open
  * version must persist across micro-batches so a change arriving in a
  * LATER batch closes the version opened earlier — the property the
  * single-batch oracle replay cannot prove. */
class StreamScd2Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("open-version state closes across batches with the correct interval") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // (user, ts, eventId, state)
    val ms = MemoryStream[(Long, Long, Long, String)]
    val closed = ms.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[(String, Long, Long), (Long, String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[(String, Long, Long)]) =>
          val sorted = rows.toArray.sortBy(r => (r._2, r._3))
          var cur = state.getOption.orNull
          val out = Seq.newBuilder[(Long, String, Long, Long)]
          sorted.foreach { case (_, ts, eid, et) =>
            if (cur == null) cur = (et, ts, eid)
            else if (cur._1 != et) { out += ((user, cur._1, cur._2, ts)); cur = (et, ts, eid) }
          }
          if (cur != null) state.update(cur)
          out.result().iterator
      }
      .toDF("user_id", "state", "valid_from", "valid_to")

    val ckpt = Files.createTempDirectory("graft-scd2-ckpt").toString
    val name = s"scd2_${System.nanoTime()}"
    val query = closed.writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .format("memory").queryName(name).start()
    try {
      // batch 1: user 1 enters state a at t=10 (stays open), flips to b at
      // t=20 → version (a, 10, 20) closes; b stays open
      ms.addData((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"))
      query.processAllAvailable()
      val afterB1 = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(afterB1 == Set((1L, "a", 10L, 20L)), s"batch1: $afterB1")

      // batch 2: the change to c at t=35 must close the b version OPENED IN
      // BATCH 1 with valid_from 20 — state crossed the batch boundary
      ms.addData((1L, 35L, 3L, "c"))
      query.processAllAvailable()
    } finally query.stop()

    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, "a", 10L, 20L), (1L, "b", 20L, 35L)), got)
  }
}
