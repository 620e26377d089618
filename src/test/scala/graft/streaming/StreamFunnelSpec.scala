package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Multi-batch semantics of the q243 funnel state machine — the properties
  * the single-batch oracle replay cannot prove:
  *   (a) slots persist and only FILL across micro-batches (a click in
  *       batch 2 qualifies against a signup from batch 1);
  *   (b) the min-per-slot sink reduction recovers the final state under
  *       per-batch re-emission;
  *   (c) same-microsecond ties inside one batch are order-independent
  *       (the three ordered passes — a click at exactly the signup's
  *       timestamp qualifies regardless of event_id interleave). */
class StreamFunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // q243's processor core, verbatim shape: (user, type, micros, event_id)
  private def machine(ms: MemoryStream[(Long, String, Long, Long)]) = {
    val spark0 = spark
    import spark0.implicits._
    val NONE = Long.MinValue
    ms.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long),
        (Long, Option[Long], Option[Long], Option[Long])](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, String, Long, Long)],
         state: GroupState[(Long, Long, Long)]) =>
          var (st, ct, pt) = state.getOption.getOrElse((NONE, NONE, NONE))
          val evs = rows.toSeq.sortBy(r => (r._3, r._4))
          evs.foreach { case (_, et, tu, _) => if (et == "signup" && st == NONE) st = tu }
          evs.foreach { case (_, et, tu, _) =>
            if (et == "click" && st != NONE && ct == NONE && tu >= st) ct = tu
          }
          evs.foreach { case (_, et, tu, _) =>
            if (et == "purchase" && ct != NONE && pt == NONE && tu >= ct) pt = tu
          }
          state.update((st, ct, pt))
          def opt(x: Long): Option[Long] = if (x == NONE) None else Some(x)
          Iterator((uid, opt(st), opt(ct), opt(pt)))
      }
      .toDF("user_id", "stu", "ctu", "ptu")
  }

  private def run(batches: Seq[Seq[(Long, String, Long, Long)]]) = {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long, Long)]
    val ckpt = Files.createTempDirectory("graft-funnel-ckpt").toString
    val name = s"funnel_${System.nanoTime()}"
    val query = machine(ms).writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .format("memory").queryName(name).start()
    try batches.foreach { b => ms.addData(b: _*); query.processAllAvailable() }
    finally query.stop()
    spark.table(name).groupBy("user_id")
      .agg(min(col("stu")).as("stu"), min(col("ctu")).as("ctu"), min(col("ptu")).as("ptu"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
  }

  test("slots fill across batches: click in batch 2 qualifies vs batch-1 signup") {
    val got = run(Seq(
      Seq((1L, "signup", 100L, 1L), (1L, "purchase", 150L, 2L)), // purchase before any click: ignored
      Seq((1L, "click", 200L, 3L)),
      Seq((1L, "purchase", 300L, 4L))))
    assert(got == Set((1L, Some(100L), Some(200L), Some(300L))), got)
  }

  test("pre-signup clicks never qualify; chain restarts only fill empty slots") {
    val got = run(Seq(
      Seq((2L, "click", 50L, 1L)),            // before signup: unusable
      Seq((2L, "signup", 100L, 2L), (2L, "click", 90L, 3L)), // same batch, still < signup
      Seq((2L, "click", 120L, 4L), (2L, "click", 110L, 5L)), // earliest qualifying click wins
      Seq((2L, "signup", 10L, 6L))))          // later, EARLIER signup must NOT rewrite the slot
    assert(got == Set((2L, Some(100L), Some(110L), None)), got)
  }

  test("same-microsecond tie is order-independent inside a batch") {
    // click shares the signup's µs but has a SMALLER event_id — a single
    // greedy sweep would visit it first and drop it; the pass separation
    // must still qualify it (tu >= st with equality)
    val got = run(Seq(Seq((3L, "click", 100L, 1L), (3L, "signup", 100L, 2L))))
    assert(got == Set((3L, Some(100L), Some(100L), None)), got)
  }
}
