package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

/** Cross-batch semantics of the timer-driven sessionizer (q180) — the
  * properties the single-batch oracle replay cannot prove: a session emits
  * ONLY when the watermark passes last-event + gap (not at batch end), an
  * event in a later batch EXTENDS a pending session (one merged emission,
  * never two), and still-open sessions are never emitted. */
class StreamTimerSessionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private def ts(s: String) = Timestamp.valueOf(s)
  private def us(s: String) = ts(s).getTime * 1000L

  test("event-time timers close sessions only when the watermark passes the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[(Long, Timestamp)]
      val out = ms.toDF().toDF("user_id", "ts")
        .withWatermark("ts", "10 minutes")
        .select(col("user_id"), unix_micros(col("ts")).as("t"))
        .as[(Long, Long)]
        .groupByKey(_._1)
        .transformWithState(new SessionTimerProcessor(1800000000L),
          TimeMode.EventTime(), OutputMode.Append())
        .toDF("user_id", "start_us", "end_us", "n")
      val name = s"timersess_${System.nanoTime()}"
      val q = out.writeStream.outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("timersess").toString)
        .format("memory").queryName(name).start()
      try {
        // batch 1: user 1 has two events 10m apart; user 2 one event. The
        // watermark after the batch (10:10 - 10m = 10:00) is far before
        // either close — NOTHING may emit yet.
        ms.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")),
          (2L, ts("2024-01-01 10:05:00")))
        q.processAllAvailable()
        assert(spark.table(name).count() == 0,
          "sessions must stay pending until the watermark passes their close")
        // batch 2: user 2's session EXTENDS (10:20 is within 30m of 10:05
        // and ahead of the 10:00 watermark); user 9 advances the watermark
        // to 11:50 — past user 1's close (10:40) but NOT user 2's (10:50)…
        // actually 10:50 < 11:50, so BOTH close; user 2 must emit ONCE as
        // the merged (10:05, 10:20, 2) session, never as two singletons.
        ms.addData((2L, ts("2024-01-01 10:20:00")), (9L, ts("2024-01-01 12:00:00")))
        q.processAllAvailable()
        // batch 3: flush far ahead — closes user 9's 12:00 singleton too.
        ms.addData((9L, ts("2024-01-01 15:00:00")))
        q.processAllAvailable()
        // batch 4: a LATE event for user 1, hours behind the watermark and
        // inside the already-emitted session — must be dropped, never
        // re-opening the session (no second user-1 emission below)
        ms.addData((1L, ts("2024-01-01 10:05:00")), (9L, ts("2024-01-01 16:30:00")))
        q.processAllAvailable()
        val rows = spark.table(name)
          .select("user_id", "start_us", "end_us", "n")
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(rows.contains((1L, us("2024-01-01 10:00:00"), us("2024-01-01 10:10:00"), 2L)),
          s"user 1's closed session missing: $rows")
        assert(rows.contains((2L, us("2024-01-01 10:05:00"), us("2024-01-01 10:20:00"), 2L)),
          s"user 2 must emit one MERGED session: $rows")
        assert(!rows.exists(r => r._1 == 2L && r._4 == 1L),
          s"user 2 must never emit singleton fragments: $rows")
        assert(rows.contains((9L, us("2024-01-01 12:00:00"), us("2024-01-01 12:00:00"), 1L)),
          s"user 9's first singleton should have closed: $rows")
        assert(!rows.exists(r => r._2 == us("2024-01-01 16:30:00")),
          s"user 9's 16:30 session is still open and must not emit: $rows")
        assert(rows.count(_._1 == 1L) == 1,
          s"the late 10:05 event must not re-open user 1's emitted session: $rows")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
