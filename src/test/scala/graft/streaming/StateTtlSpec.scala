package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig}
import org.scalatest.funsuite.AnyFunSuite

/** State TTL — the eviction policy that closes the last 100 TB streaming
  * risk (VERDICT r5): without it, per-key state (q181's MapState counters
  * being the canonical case) grows monotonically with key cardinality for
  * the lifetime of the query. With a TTL, the RocksDB store drops entries
  * not rewritten within the window, so state is bounded by the number of
  * keys ACTIVE in the window, independent of all-time cardinality.
  *
  * Two laws, each against the real RocksDB provider across real
  * micro-batches:
  *  1. PRE-EXPIRY EQUIVALENCE — with a TTL far longer than the run, the
  *     TTL'd processor's outputs are identical to the untouched
  *     semantics (counts continue across batches) — the property that
  *     lets a production deployment add the TTL without changing any
  *     result inside the window.
  *  2. CROSS-BATCH EXPIRY — with a short TTL and a wall-clock gap larger
  *     than it, a later batch finds the entry GONE and restarts its
  *     count at 1. Expiry is processing-time-based (the only mode
  *     Spark's TTL supports), so the gap is a real sleep, sized at 4×
  *     the TTL to stay deterministic on a loaded box.
  *
  * Drain discipline: TTL requires TimeMode.ProcessingTime, whose
  * shouldRunAnotherBatch returns TRUE unconditionally
  * (TransformWithStateExecBase, Spark 4.1) — the query re-triggers
  * no-data batches forever, so processAllAvailable never observes
  * quiescence and even Trigger.AvailableNow never self-terminates
  * (measured: 5000+ empty commits). The only bounded harness is the one
  * production uses implicitly: let the query run, POLL the sink for the
  * expected emissions, stop manually. This is also why the q181 registry
  * entry replays with TimeMode.None — bounded oracle replays and TTL'd
  * clocks don't mix in Spark 4.1.
  */
class StateTtlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def withStreamConf[A](body: => A): A = {
    val overrides = Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      // 2 state-store partitions, not 32: every no-data batch commits all
      // stores, and this query churns batches continuously by design
      "spark.sql.shuffle.partitions" -> "2")
    val prev = overrides.keys.map(k => k -> spark.conf.getOption(k)).toMap
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Feeds `batches` of (user, type) rows through the TTL'd
    * TypeCountProcessor under a continuously-triggering query, sleeping
    * `gapMs` between batches; polls the memory sink for each batch's
    * emissions (one row per touched (user, type) entry), then stops the
    * query. Returns every emitted (user, type, count) row. */
  private def runBatches(ttl: TTLConfig, batches: Seq[Seq[(Long, String)]],
      gapMs: Long): Seq[(Long, String, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val out = ms.toDS()
      .groupByKey(_._1)
      .transformWithState(new TypeCountProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
    val name = s"ttl_${System.nanoTime()}"
    val q = out.toDF("user_id", "event_type", "n").writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ttlck").toString)
      .format("memory").queryName(name).start()
    try {
      var expected = 0L
      batches.zipWithIndex.foreach { case (batch, i) =>
        if (i > 0 && gapMs > 0) Thread.sleep(gapMs)
        ms.addData(batch: _*)
        expected += batch.distinct.size // one emission per touched entry
        val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
        while (spark.table(name).count() < expected
            && System.nanoTime() < deadline) Thread.sleep(200)
        assert(spark.table(name).count() >= expected,
          s"timed out waiting for batch $i emissions")
      }
    } finally q.stop()
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
  }

  test("pre-expiry: a long TTL leaves cross-batch accumulation identical") {
    withStreamConf {
      val rows = runBatches(TTLConfig(java.time.Duration.ofHours(1)),
        Seq(Seq((1L, "click"), (1L, "click"), (2L, "view")),
          Seq((1L, "click"), (2L, "view"))), gapMs = 0)
      // exactly the no-TTL semantics: counts continue from prior state
      assert(rows.toSet == Set((1L, "click", 2L), (2L, "view", 1L),
        (1L, "click", 3L), (2L, "view", 2L)), rows.toString)
    }
  }

  test("cross-batch expiry: entries older than the TTL restart at 1") {
    withStreamConf {
      val ttlMs = 1500L
      val rows = runBatches(TTLConfig(java.time.Duration.ofMillis(ttlMs)),
        Seq(Seq((1L, "click"), (1L, "click"), (1L, "purchase")),
          Seq((1L, "click"))), gapMs = ttlMs * 4)
      // batch 1 emitted the running counts…
      assert(rows.contains((1L, "click", 2L)) && rows.contains((1L, "purchase", 1L)))
      // …and after the > TTL gap the click entry is GONE from state: the
      // count restarts at 1 instead of continuing to 3
      assert(rows.contains((1L, "click", 1L)),
        s"expected expired entry to restart at 1: $rows")
      assert(!rows.contains((1L, "click", 3L)),
        s"entry must not survive past its TTL: $rows")
    }
  }

  /** ValueState twin of [[runBatches]]: feeds (key, value) rows through the
    * TTL'd RunningAggProcessor (per-key running count/max in ONE ValueState
    * — the q152-class shape), polling one emission per touched key per
    * batch. */
  private def runValueBatches(ttl: TTLConfig, batches: Seq[Seq[(Long, Double)]],
      gapMs: Long): Seq[(Long, Long, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Double)]
    val out = ms.toDS()
      .groupByKey(_._1)
      .transformWithState(new RunningAggProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
    val name = s"ttlv_${System.nanoTime()}"
    val q = out.toDF("k", "n", "mx").writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ttlvck").toString)
      .format("memory").queryName(name).start()
    try {
      var expected = 0L
      batches.zipWithIndex.foreach { case (batch, i) =>
        if (i > 0 && gapMs > 0) Thread.sleep(gapMs)
        ms.addData(batch: _*)
        expected += batch.map(_._1).distinct.size
        val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
        while (spark.table(name).count() < expected
            && System.nanoTime() < deadline) Thread.sleep(200)
        assert(spark.table(name).count() >= expected,
          s"timed out waiting for batch $i emissions")
      }
    } finally q.stop()
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
  }

  test("ValueState pre-expiry: a long TTL leaves the running count/max identical") {
    withStreamConf {
      val rows = runValueBatches(TTLConfig(java.time.Duration.ofHours(1)),
        Seq(Seq((1L, 5.0), (1L, 9.0), (2L, 3.0)), Seq((1L, 7.0))), gapMs = 0)
      // count continues 2 → 3 and the max carries across the batch gap
      assert(rows.toSet == Set((1L, 2L, 9.0), (2L, 1L, 3.0), (1L, 3L, 9.0)),
        rows.toString)
    }
  }

  test("ValueState cross-batch expiry: the running aggregate restarts after the TTL") {
    withStreamConf {
      val ttlMs = 1500L
      val rows = runValueBatches(TTLConfig(java.time.Duration.ofMillis(ttlMs)),
        Seq(Seq((1L, 5.0), (1L, 9.0)), Seq((1L, 7.0))), gapMs = ttlMs * 4)
      assert(rows.contains((1L, 2L, 9.0)))
      // after the > TTL gap the ValueState is GONE: count restarts at 1 and
      // the max forgets the earlier 9.0
      assert(rows.contains((1L, 1L, 7.0)),
        s"expected expired running aggregate to restart: $rows")
      assert(!rows.contains((1L, 3L, 9.0)),
        s"running aggregate must not survive past its TTL: $rows")
    }
  }
}
