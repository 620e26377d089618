package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

/** Cross-batch semantics of the streaming rolling median (q161): the
  * ordered tail must carry across micro-batches so a later batch's first
  * frames include the previous batch's values — the property the
  * single-batch oracle replay cannot itself prove. Also pins the bounded-
  * state truncation (only window-1 values survive a batch). */
class StreamRollingMedianSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("tail state carries across batches; frame truncates at the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[(String, Long, Long, Double)]
      // window 3 keeps the expected values hand-checkable
      val out = ms.toDS()
        .groupByKey(_._1)
        .transformWithState(new RollingMedianProcessor(window = 3),
          TimeMode.None(), OutputMode.Append())
        .toDF("event_type", "t", "event_id", "med")
      val name = s"rollmed_${System.nanoTime()}"
      val q = out.writeStream.outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("rollmed").toString)
        .format("memory").queryName(name).start()
      try {
        // batch 1 (delivered out of ts order — the processor must sort):
        // frames [5]→5, [5,1]→1, [5,1,4]→4
        ms.addData(("a", 2L, 1L, 1.0), ("a", 1L, 1L, 5.0), ("a", 3L, 1L, 4.0))
        q.processAllAvailable()
        // batch 2: first frame [1,4,9]→4 (5 truncated out — window bound),
        // then [4,9,2]→4
        ms.addData(("a", 4L, 1L, 9.0), ("a", 5L, 1L, 2.0))
        q.processAllAvailable()
        // batch 3 arrives with a timestamp EARLIER than the whole retained
        // tail [(4,9),(5,2)]: (ts=0) sorts BEFORE it, so its frame is the
        // retained horizon at-or-before ts=0 — just itself → 1.0 (the
        // arrival-order fold would have said [9,2,1]→2.0); the in-order
        // row then frames over [(4,9),(5,2),(6,3)] minus its own window
        // slot → [9,2,3]→3.0, with the late row correctly EXCLUDED (it
        // sits 3 positions back, outside the 3-row frame)
        ms.addData(("a", 0L, 9L, 1.0), ("a", 6L, 1L, 3.0))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(name).collect()
        .map(r => ((r.getLong(1), r.getLong(2)), r.getDouble(3))).toMap
      assert(got == Map((1L, 1L) -> 5.0, (2L, 1L) -> 1.0, (3L, 1L) -> 4.0,
          (4L, 1L) -> 4.0, (5L, 1L) -> 4.0, (0L, 9L) -> 1.0, (6L, 1L) -> 3.0),
        got.toSeq.sortBy(_._1).mkString(", "))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
