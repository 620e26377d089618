package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}
import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Mid-batch task-failure recovery (round-8 verdict task): the
  * CheckpointRecoverySpec suite kills BETWEEN micro-batches; this one kills
  * INSIDE a batch — a task throws on its first attempt mid-stream, Spark's
  * task retry re-runs the partition (state store reloads the last committed
  * version and reapplies), and the idempotent batch-id-partitioned sink
  * makes the delivery exactly-once. Task retry × idempotent write IS the
  * exactly-once claim; this demonstrates it instead of asserting it.
  *
  * Requires task retries to be enabled — SparkTestSession runs
  * `local[4, 2]` (maxFailures=2) for exactly this spec.
  */
class TaskFailureRecoverySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Running total per key, emitted on every batch the key appears in —
    * stateful, so a task retry exercises state-store version reload. */
  private def runningTotals(ms: MemoryStream[(String, Long)], sabotage: Boolean) = {
    import spark.implicits._
    val counted = ms.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.map(_._2).sum
          state.update(total)
          Iterator((key, total))
      }
    val maybeSabotaged =
      if (sabotage) counted.mapPartitions { it =>
        if (TaskFailureRecoverySpec.armed.compareAndSet(true, false)) {
          TaskFailureRecoverySpec.injected.incrementAndGet()
          throw new RuntimeException("injected task failure (first attempt)")
        }
        it
      } else counted
    maybeSabotaged.toDF("key", "total")
  }

  private def runStream(sabotageSecondBatch: Boolean): Seq[(String, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft-taskfail-out").toString
    val ckpt = Files.createTempDirectory("graft-taskfail-ckpt").toString
    val ms = MemoryStream[(String, Long)]
    val q = Sinks.idempotentParquet(runningTotals(ms, sabotageSecondBatch), out, ckpt)
    try {
      ms.addData(("a", 1L), ("b", 10L))
      q.processAllAvailable()
      if (sabotageSecondBatch) TaskFailureRecoverySpec.armed.set(true) // mid-run
      ms.addData(("a", 2L), ("c", 100L))
      q.processAllAvailable()
      ms.addData(("b", 20L), ("c", 200L))
      q.processAllAvailable()
    } finally q.stop()
    spark.read.option("basePath", out).parquet(out)
      .selectExpr("key", "total", "CAST(batch_id AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
  }

  test("a task that fails mid-batch is retried and output equals the clean run (exactly-once)") {
    TaskFailureRecoverySpec.armed.set(false)
    TaskFailureRecoverySpec.injected.set(0)
    val clean = runStream(sabotageSecondBatch = false)
    val failed = runStream(sabotageSecondBatch = true)
    assert(TaskFailureRecoverySpec.injected.get() == 1,
      s"the injected failure never fired (${TaskFailureRecoverySpec.injected.get()})")
    assert(!TaskFailureRecoverySpec.armed.get(), "sabotage flag still armed")
    assert(failed == clean,
      s"post-retry output diverged from the clean run:\n clean=$clean\n failed=$failed")
    // the run really produced the stateful totals, not just echoes
    assert(clean.map(t => (t._1, t._2)).toSet ==
      Set(("a", 1L), ("b", 10L), ("a", 3L), ("c", 100L), ("b", 30L), ("c", 300L)))
  }
}

object TaskFailureRecoverySpec {
  /** Armed = the NEXT task through the sabotage stage throws (once). */
  val armed = new AtomicBoolean(false)
  val injected = new AtomicInteger(0)
}
