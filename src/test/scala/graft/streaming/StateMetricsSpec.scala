package graft.streaming

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.scalatest.funsuite.AnyFunSuite

/** MEASURED state bounds for the streaming registry (VERDICT r5 task 7):
  * SCALE.md argues per-operator state bounds; this spec reads the real
  * numbers off StreamingQueryListener progress (StateOperatorProgress
  * .numRowsTotal) while the registry entries execute, and asserts each
  * query's FINAL state matches the bound derived independently from the
  * batch fixture:
  *
  *  - q181 (MapState counters): state rows = ACTIVE (user, type) map
  *    entries — exactly the distinct-pair count, growing with touched
  *    keys, not events (the TTL in TypeCountProcessor is what caps this
  *    under unbounded cardinality; StateTtlSpec).
  *  - q180 (timer sessions): state holds OPEN islands only — after the
  *    watermark flush it must equal total sessions minus the emitted
  *    (closed) ones, far below the user count × session count.
  *  - q193 (windowed KMV): state rows = (window, type) groups not yet
  *    finalized by the watermark — total groups minus emitted rows, with
  *    each group's sketch O(64) regardless of events.
  *
  * The watermark-driven DROP is itself asserted: the pre-flush batch
  * holds every group/island, the post-flush one only the open tail.
  */
class StateMetricsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  /** Runs a registry streaming query while recording, per micro-batch,
    * the summed numRowsTotal of its state operators; returns (result row
    * count, per-batch state totals in batch order). */
  private def measure(name: String): (Long, Seq[Long]) = {
    val totals = scala.collection.mutable.ArrayBuffer.empty[Long]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        totals.synchronized {
          if (e.progress.stateOperators.nonEmpty)
            totals += e.progress.stateOperators.map(_.numRowsTotal).sum
        }
    }
    spark.streams.addListener(listener)
    try {
      val n = SparkEntry.queries(name)(spark, dir).count()
      // listener delivery is async: wait until the event stream quiesces
      var last = -1
      var stable = 0
      while (stable < 5) {
        Thread.sleep(200)
        val size = totals.synchronized(totals.size)
        if (size == last) stable += 1 else { stable = 0; last = size }
      }
      (n, totals.synchronized(totals.toList))
    } finally {
      spark.streams.removeListener(listener)
      spark.catalog.clearCache()
    }
  }

  test("q181 MapState rows equal the active (user, type) key count") {
    val expected = graft.Tables(spark, dir, "events")
      .select("user_id", "event_type").distinct().count()
    val (resultRows, totals) = measure("q181_stream_mapstate_counts")
    assert(totals.nonEmpty)
    assert(totals.last == expected,
      s"MapState rows ${totals.last} != distinct (user, type) pairs $expected")
    assert(resultRows == expected) // one emission per touched entry
  }

  test("q180 timer-session state drains to the open islands at the final watermark") {
    // independent batch derivation: total 30-min-gap sessions per user
    val e = graft.Tables(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("t"))
    val w = Window.partitionBy("user_id").orderBy("t")
    val totalSessions = e
      .withColumn("brk", when(lag(col("t"), 1).over(w).isNull
        || col("t") - lag(col("t"), 1).over(w) > 1800000000L, 1L).otherwise(0L))
      .agg(sum(col("brk"))).head().getLong(0)
    val users = e.select("user_id").distinct().count()

    val (closed, totals) = measure("q180_stream_timer_sessions")
    assert(totals.size >= 2, s"expected data + flush batches, got $totals")
    // after the flush, state = only the sessions the watermark could not
    // yet close — and every closed session must have left the store
    assert(totals.last == totalSessions - closed,
      s"open islands ${totals.last} != $totalSessions - $closed")
    assert(totals.last < totals.head,
      s"watermark flush must drain state: $totals")
    assert(totals.last <= users)
  }

  test("q193 windowed-KMV state drains to the unfinalized (window, type) groups") {
    val groups = graft.Tables(spark, dir, "events")
      .select(date_trunc("hour", col("ts")).as("ws"), col("event_type"))
      .distinct().count()
    val (emitted, totals) = measure("q193_stream_windowed_kmv")
    assert(totals.size >= 2, s"expected data + flush batches, got $totals")
    // pre-flush: every (window, type) group is in the store; post-flush:
    // only the ones the final watermark has not yet closed
    assert(totals.head == groups, s"pre-flush state ${totals.head} != $groups groups")
    assert(totals.last == groups - emitted,
      s"post-flush state ${totals.last} != $groups - $emitted")
  }

  test("q253 streaming-anomaly state drains to the unsealed (window, type) groups") {
    val ev = graft.Tables(spark, dir, "events")
    val hourly = ev.select(date_trunc("hour", col("ts")).as("ws"), col("event_type")).distinct()
    val groups = hourly.count()
    val maxUs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
    // sealed = window end ≤ final watermark (max event time − 10 min) —
    // the same rule the q253 oracle states in SQL
    val sealedG = hourly
      .filter(unix_micros(col("ws")) + 3600000000L <= maxUs - 600000000L).count()
    val (reportRows, totals) = measure("q253_stream_anomaly")
    assert(totals.size >= 2, s"expected data + flush batches, got $totals")
    assert(totals.head == groups, s"pre-flush state ${totals.head} != $groups groups")
    assert(totals.last == groups - sealedG,
      s"post-flush state ${totals.last} != $groups - $sealedG unsealed groups")
    // the report itself is one row per series regardless of hours
    assert(reportRows == ev.select("event_type").distinct().count())
  }
}
