package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig}
import org.scalatest.funsuite.AnyFunSuite

/** Kill-and-restart recovery for the stateful streaming surface (VERDICT
  * r6 task 5): the replay-safety specs prove multi-batch CONTINUATION;
  * these prove the exactly-once story across a PROCESS BOUNDARY — the
  * query is stopped between micro-batches, its StreamingQuery object
  * dropped, and a brand-new query started from the same RocksDB
  * checkpoint. For each state kind of the transformWithState v2 surface
  * plus the windowed typed-aggregator buffer, the union of rows emitted
  * before and after the restart must equal (as a multiset) the rows of an
  * uninterrupted run over the same per-batch arrivals:
  *
  *  - event-time TIMERS + ListState (SessionTimerProcessor, q180's
  *    operator): pending session islands, registered timers, AND the
  *    recovered watermark must all survive — a lost timer silently
  *    swallows a session, a reset watermark re-opens emitted ones;
  *  - MapState (TypeCountProcessor, q181's operator): per-(user, type)
  *    running counts must RESUME, not restart — a post-restart count of 1
  *    where 3 is expected is exactly the corruption this catches;
  *  - windowed typed-Aggregator state (KmvAggregator inside a watermarked
  *    window, q193's shape): the serialized sketch buffer of a
  *    still-open window must round-trip the checkpoint — asserted on the
  *    sketch CONTENT (first hash), not just its size.
  *
  * All three run on RocksDBStateStoreProvider (transformWithState requires
  * it; the windowed agg is pinned to it so recovery exercises the same
  * store the 100 TB claim names).
  */
class CheckpointRecoverySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val nameC = new java.util.concurrent.atomic.AtomicInteger()

  private def withRocks[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Feed `phases` (one addData + processAllAvailable each) through
    * `build`; with `restart` the query is stopped after phase 1 and a NEW
    * query resumes the same checkpoint for the rest. The sink is the
    * PARQUET file sink — the memory sink refuses checkpoint recovery by
    * design, and the file sink's _spark_metadata commit log is the
    * exactly-once discipline this spec exists to demonstrate. Returns the
    * committed sink rows after all phases. */
  private def run[A: Encoder](phases: Seq[Seq[A]], restart: Boolean)(
      build: Dataset[A] => DataFrame): Seq[String] = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[A]
    val out = build(ms.toDS())
    val ckpt = Files.createTempDirectory("graft-recovery-ckpt").toString
    val sink = Files.createTempDirectory("graft-recovery-sink").toString
    def runPhases(ps: Seq[Seq[A]]): Unit = {
      val q = out.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", sink).start()
      try ps.foreach { p => ms.addData(p); q.processAllAvailable() }
      finally q.stop()
    }
    if (restart) { runPhases(Seq(phases.head)); runPhases(phases.tail) }
    else runPhases(phases)
    spark.read.parquet(sink).collect().map(_.toString).toSeq
  }

  private def t(s: String) = Timestamp.valueOf(s)

  test("q180 state kind: timer sessions (ListState + event-time timers) resume across restart") {
    withRocks {
      import spark.implicits._
      def build(ds: Dataset[(Long, Timestamp)]): DataFrame =
        ds.toDF("user_id", "ts")
          .withWatermark("ts", "10 minutes")
          .select(col("user_id"), unix_micros(col("ts")).as("t"))
          .as[(Long, Long)]
          .groupByKey(_._1)
          .transformWithState(new SessionTimerProcessor(1800000000L),
            TimeMode.EventTime(), OutputMode.Append())
          .toDF("user_id", "start_us", "end_us", "n")
      val phases = Seq(
        Seq((1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:10:00")),
          (2L, t("2024-01-01 10:05:00"))),
        // 13:00 session for user 1 also closes inside this phase (wm 15:50)
        Seq((1L, t("2024-01-01 13:00:00")), (2L, t("2024-01-01 16:00:00"))))
      val straight = run(phases, restart = false)(build)
      val restarted = run(phases, restart = true)(build)
      assert(straight.size == 3, s"fixture should close 3 sessions, got $straight")
      assert(restarted.sorted == straight.sorted,
        s"post-restart emissions diverge:\n straight=$straight\n restarted=$restarted")
    }
  }

  test("q181 state kind: MapState running counts resume (not restart) across restart") {
    withRocks {
      import spark.implicits._
      def build(ds: Dataset[(Long, String)]): DataFrame =
        ds.groupByKey(_._1)
          .transformWithState(new TypeCountProcessor(TTLConfig.NONE),
            TimeMode.None(), OutputMode.Append())
          .toDF("user_id", "event_type", "n_run")
      val phases = Seq(
        Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a")),
        // (1, a) must emit 3 here — a state-less restart would emit 1
        Seq((1L, "a"), (2L, "b"), (2L, "a")))
      val straight = run(phases, restart = false)(build)
      val restarted = run(phases, restart = true)(build)
      assert(straight.contains("[1,a,3]"), s"uninterrupted run missing the resumed count: $straight")
      assert(restarted.sorted == straight.sorted,
        s"post-restart emissions diverge:\n straight=$straight\n restarted=$restarted")
    }
  }

  test("q62 state kind: flatMapGroupsWithState keep-first dedup resumes across restart") {
    withRocks {
      import spark.implicits._
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
      def build(ds: Dataset[(Long, String)]): DataFrame =
        ds.groupByKey(_._2)
          .flatMapGroupsWithState[Long, (Long, String)](
            OutputMode.Append(), GroupStateTimeout.NoTimeout) {
            (h: String, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
              val mn = rows.map(_._1).min
              if (state.getOption.isEmpty) { state.update(mn); Iterator((mn, h)) }
              else Iterator.empty
          }
          .toDF("id", "h")
      val phases = Seq(
        Seq((3L, "a"), (1L, "a"), (5L, "b")),
        // "a" must NOT re-emit here — a state-less restart would emit (2, a)
        Seq((2L, "a"), (9L, "c"), (7L, "b")))
      val straight = run(phases, restart = false)(build)
      val restarted = run(phases, restart = true)(build)
      assert(straight.sorted == Seq("[1,a]", "[5,b]", "[9,c]"),
        s"uninterrupted run wrong: $straight")
      assert(restarted.sorted == straight.sorted,
        s"post-restart emissions diverge:\n straight=$straight\n restarted=$restarted")
    }
  }

  test("q193 state kind: windowed KMV sketch buffer round-trips the checkpoint") {
    withRocks {
      import spark.implicits._
      import graft.functions.PortableHash.md5Long
      def build(ds: Dataset[(Timestamp, Long)]): DataFrame = {
        val kmv = udaf(new graft.functions.KmvAggregator(64))
        ds.toDF("ts", "uid")
          .withWatermark("ts", "10 minutes")
          .select(col("ts"), md5Long(concat(lit("u:"), col("uid").cast("string"))).as("h"))
          .groupBy(window(col("ts"), "1 hour"))
          .agg(kmv(col("h")).as("mins"))
          // h1 asserts the sketch CONTENT survived, not just its size
          .select(col("window.start").cast("long").as("ws"),
            size(col("mins")).cast("long").as("n_sketch"),
            element_at(col("mins"), 1).as("h1"))
      }
      val phases = Seq(
        // window 10:00 fills with 5 users and closes (wm reaches 11:20);
        // window 11:00 (user 6) stays OPEN across the restart
        Seq((t("2024-01-01 10:05:00"), 1L), (t("2024-01-01 10:15:00"), 2L),
          (t("2024-01-01 10:25:00"), 3L), (t("2024-01-01 10:35:00"), 4L),
          (t("2024-01-01 10:45:00"), 5L), (t("2024-01-01 11:30:00"), 6L)),
        // 14:00 advances the watermark past window 11:00's end → it emits
        // from recovered sketch state
        Seq((t("2024-01-01 14:00:00"), 7L)))
      val straight = run(phases, restart = false)(build)
      val restarted = run(phases, restart = true)(build)
      assert(straight.size == 2, s"fixture should close 2 windows, got $straight")
      assert(restarted.sorted == straight.sorted,
        s"post-restart emissions diverge:\n straight=$straight\n restarted=$restarted")
    }
  }
}
