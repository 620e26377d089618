package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

/** B32 via the arbitrary-state v2 API (`transformWithState` +
  * StatefulProcessor, Spark 4): per-user running (count, max) with explicit
  * ValueState — the successor of flatMapGroupsWithState the engine also
  * supports. Requires the RocksDB state store provider. */
class TransformWithStateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("transformWithState: running per-user count/max across micro-batches") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[(Long, Double)]
      val out = ms.toDS()
        .groupByKey(_._1)
        .transformWithState(new RunningAggProcessor, TimeMode.None(), OutputMode.Append())
      val name = s"tws_${System.nanoTime()}"
      val q = out.toDF("user_id", "n", "mx").writeStream.outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("tws").toString)
        .format("memory").queryName(name).start()
      try {
        ms.addData((1L, 5.0), (1L, 9.0), (2L, 3.0))
        q.processAllAvailable()
        ms.addData((1L, 7.0), (2L, 11.0)) // state must carry across batches
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains((1L, 2L, 9.0)) && rows.contains((2L, 1L, 3.0))) // batch 1
      assert(rows.contains((1L, 3L, 9.0)) && rows.contains((2L, 2L, 11.0))) // batch 2
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("MapState: per-entry counts accumulate across batches, entries isolated") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[(Long, String)]
      val out = ms.toDS()
        .groupByKey(_._1)
        .transformWithState(new TypeCountProcessor, TimeMode.None(), OutputMode.Append())
      val name = s"twsmap_${System.nanoTime()}"
      val q = out.toDF("user_id", "event_type", "n").writeStream.outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("twsmap").toString)
        .format("memory").queryName(name).start()
      try {
        ms.addData((1L, "click"), (1L, "click"), (1L, "purchase"), (2L, "click"))
        q.processAllAvailable()
        // batch 2 touches ONLY user 1's click entry: its count continues
        // from 2, the purchase entry stays untouched (no re-emission)
        ms.addData((1L, "click"))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(rows.contains((1L, "click", 2L)) && rows.contains((1L, "purchase", 1L))
        && rows.contains((2L, "click", 1L))) // batch 1
      assert(rows.contains((1L, "click", 3L)), s"cross-batch map entry: $rows")
      assert(rows.count(r => r._1 == 1L && r._2 == "purchase") == 1,
        s"untouched entries must not re-emit: $rows")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
