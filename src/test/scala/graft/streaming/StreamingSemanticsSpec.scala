package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-only semantics that the DuckDB oracle can't check
  * (SURVEY.md §5.2#4): watermark late-data drop across micro-batches,
  * streaming dedup, and checkpointed restart recovery.
  */
class StreamingSemanticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("B29 watermark drops late rows across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Double)]
    val agg = ms.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    val name = s"wm_${System.nanoTime()}"
    val q = agg.writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("wm").toString)
      .format("memory").queryName(name).start()
    try {
      // batch 1: two rows in hour 10 → watermark after batch = 10:30 - 10m
      ms.addData((ts("2024-01-01 10:00:00"), 1.0), (ts("2024-01-01 10:30:00"), 1.0))
      q.processAllAvailable()
      // batch 2: row in hour 12 pushes watermark past hour-10's end;
      // a LATE row back in hour 9 (< watermark) must be dropped
      ms.addData((ts("2024-01-01 12:30:00"), 1.0), (ts("2024-01-01 09:00:01"), 1.0))
      q.processAllAvailable()
      ms.addData((ts("2024-01-01 14:00:00"), 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name).collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    assert(rows("2024-01-01 10:00:00.0") == 2L) // late 09:00 row NOT counted anywhere
    assert(!rows.contains("2024-01-01 09:00:00.0"))
  }

  test("q331 union watermark: the lagging branch gates the flush until it catches up") {
    implicit val sqlCtx = spark.sqlContext
    val fast = MemoryStream[(Timestamp, Double)]
    val slow = MemoryStream[(Timestamp, Double)]
    val agg = fast.toDF().toDF("ts", "v").withWatermark("ts", "10 minutes")
      .unionByName(slow.toDF().toDF("ts", "v").withWatermark("ts", "10 minutes"))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    val ckpt = Files.createTempDirectory("graft-union-wm").toString
    val q = agg.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("union_wm").start()
    try {
      // batch 1: fast source races to 06:00, slow source sits at 01:30 —
      // global watermark = min(06:00, 01:30) − 10m = 01:20, so ONLY hour 00
      // closes (hour 01 end 02:00 > 01:20)
      fast.addData((ts("2024-01-01 00:10:00"), 1.0), (ts("2024-01-01 06:00:00"), 2.0))
      slow.addData((ts("2024-01-01 00:20:00"), 3.0), (ts("2024-01-01 01:30:00"), 4.0))
      q.processAllAvailable()
      val flushed1 = spark.table("union_wm").collect().map(_.getTimestamp(0)).sorted
      assert(flushed1.length == 1 && flushed1.head == ts("2024-01-01 00:00:00"),
        s"min-watermark violated: ${flushed1.toSeq}")
      // batch 2: the slow branch catches up to 06:00 → watermark 05:50
      // closes hour 01 (the only other populated window ending ≤ 05:50;
      // hour 06 itself stays open)
      slow.addData((ts("2024-01-01 06:00:00"), 5.0))
      q.processAllAvailable()
      val flushed2 = spark.table("union_wm").collect().map(_.getTimestamp(0)).sorted
      assert(flushed2.length == 2 && flushed2.last == ts("2024-01-01 01:00:00"),
        s"catch-up flush wrong: ${flushed2.toSeq}")
    } finally q.stop()
  }

  test("B30 streaming dropDuplicates within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp)]
    val dedup = ms.toDF().toDF("id", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("id")
    val name = s"dd_${System.nanoTime()}"
    val q = dedup.writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("dd").toString)
      .format("memory").queryName(name).start()
    try {
      ms.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      ms.addData((1L, ts("2024-01-01 10:05:00")), (3L, ts("2024-01-01 10:06:00"))) // 1 is dup
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table(name).select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("B28 streaming session window merges within gap, splits across it") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp)]
    val sessions = ms.toDF().toDF("uid", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("uid"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("uid"), col("session_window.start").as("s"), col("n"))
    val name = s"sess_${System.nanoTime()}"
    val q = sessions.writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("sess").toString)
      .format("memory").queryName(name).start()
    try {
      // user 1: two events 20min apart (one session), then one 40min later
      // (new session); a later event advances the watermark to flush all
      ms.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:20:00")),
        (1L, ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      ms.addData((2L, ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      ms.addData((2L, ts("2024-01-01 18:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val u1 = spark.table(name).filter(col("uid") === 1)
      .collect().map(r => r.getTimestamp(1).toString -> r.getLong(2)).toMap
    assert(u1 == Map("2024-01-01 10:00:00.0" -> 2L, "2024-01-01 11:00:00.0" -> 1L))
  }

  test("stream-stream interval join drops late rows on either side past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val c = clicks.toDF().toDF("cid", "cts").withWatermark("cts", "10 minutes")
    val b = buys.toDF().toDF("bid", "bts").withWatermark("bts", "10 minutes")
    val joined = b.join(c,
      col("bid") === col("cid")
        && col("cts") <= col("bts")
        && col("cts") >= col("bts") - expr("INTERVAL 30 MINUTES"))
      .select(col("bid"), col("bts"), col("cts"))
    val name = s"ssj_${System.nanoTime()}"
    val q = joined.writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ssj").toString)
      .format("memory").queryName(name).start()
    try {
      clicks.addData((1L, ts("2024-01-01 10:00:00")))
      buys.addData((1L, ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      // advance both watermarks far past 10:10
      clicks.addData((9L, ts("2024-01-01 15:00:00")))
      buys.addData((9L, ts("2024-01-01 15:00:00")))
      q.processAllAvailable()
      // late rows on both sides, hours behind the watermark: must not join
      clicks.addData((2L, ts("2024-01-01 10:01:00")))
      buys.addData((2L, ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      clicks.addData((9L, ts("2024-01-01 19:00:00"))) // flush
      buys.addData((9L, ts("2024-01-01 19:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table(name).select("bid").as[Long].collect().toSet
    assert(ids.contains(1L))
    assert(!ids.contains(2L), "late rows on both sides must be dropped from join state")
  }

  test("stream-stream LEFT SEMI join emits each matched left row once, " +
       "matches across batches, and drops late rows past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val c = clicks.toDF().toDF("cid", "cts").withWatermark("cts", "10 minutes")
    val b = buys.toDF().toDF("bid", "bts").withWatermark("bts", "10 minutes")
    val joined = b.join(c,
      col("bid") === col("cid")
        && col("cts") <= col("bts")
        && col("cts") >= col("bts") - expr("INTERVAL 30 MINUTES"),
      "leftSemi")
    val name = s"sssemi_${System.nanoTime()}"
    val q = joined.writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("sssemi").toString)
      .format("memory").queryName(name).start()
    try {
      // two clicks match buy 1 in the SAME batch: exactly one emission
      clicks.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:05:00")))
      buys.addData((1L, ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      // buy 3 arrives FIRST; its click lands in a LATER batch — the
      // buffered left row must emit when the match arrives
      buys.addData((3L, ts("2024-01-01 10:20:00")))
      q.processAllAvailable()
      clicks.addData((3L, ts("2024-01-01 10:15:00")))
      q.processAllAvailable()
      // advance both watermarks far past the fixture times
      clicks.addData((9L, ts("2024-01-01 15:00:00")))
      buys.addData((9L, ts("2024-01-01 15:00:00")))
      q.processAllAvailable()
      // late pair hours behind the watermark: must not emit
      clicks.addData((2L, ts("2024-01-01 10:01:00")))
      buys.addData((2L, ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      clicks.addData((9L, ts("2024-01-01 19:00:00"))) // flush
      buys.addData((9L, ts("2024-01-01 19:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name).select("bid").as[Long].collect().toSeq
    assert(rows.count(_ == 1L) == 1,
      s"buy 1 matched two clicks but must emit exactly once, got $rows")
    assert(rows.count(_ == 3L) == 1,
      s"buy 3's click arrived a batch later and must still emit once, got $rows")
    assert(!rows.contains(2L), "late rows past the watermark must not emit")
  }

  test("P16/recovery: restart from checkpoint does not re-publish processed data") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("rec").toString
    val pubName = s"rec_${System.nanoTime()}"
    val ms = MemoryStream[String]
    val wire = OandaPipeline.pipeline(ms.toDF())
    val q1 = Sinks.publishStream(wire, () => new InMemoryPublisher(pubName), ckpt)
    try {
      ms.addData("""{"type":"HEARTBEAT","time":"2024-01-15T09:30:05Z"}""")
      q1.processAllAvailable()
    } finally q1.stop()
    assert(InMemoryPublisher.drain(pubName).size == 1)
    // restart same checkpoint + source; add one more record
    val q2 = Sinks.publishStream(wire, () => new InMemoryPublisher(pubName), ckpt)
    try {
      ms.addData("""{"type":"HEARTBEAT","time":"2024-01-15T09:31:05Z"}""")
      q2.processAllAvailable()
    } finally q2.stop()
    val after = InMemoryPublisher.drain(pubName).size
    assert(after >= 1 && after <= 2) // at-least-once: no silent loss; replay ≤ 1 batch
  }
}
