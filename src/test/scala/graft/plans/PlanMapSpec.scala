package graft.plans

import graft.{SparkEntry, SparkTestSession}
import java.nio.file.{Files, Paths}
import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
import org.apache.spark.sql.execution.{SparkPlan, SparkPlanInfo}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
import org.apache.spark.sql.execution.window.WindowExecBase
import org.scalatest.funsuite.AnyFunSuite

/** The consolidated operator→plan-shape reference (VERDICT r5 task 8):
  * PLANMAP.md holds one fingerprint row per batch registry query —
  * shuffle count, broadcast count, join kinds, partitioned/global window
  * counts, product joins, native top-k — extracted from the LIVE
  * executed plan at sf0.001. This spec rebuilds every fingerprint and
  * diffs it against the committed file, so ANY plan change — a new
  * exchange, a window losing its partitioning, an equi-join degrading to
  * a product — fails CI with a per-query message (the full-map extension
  * of GlobalPlanGuardSpec's two single-invariant guards).
  *
  * Regenerate after an INTENTIONAL plan change with:
  *   SPARK_GRAFT_REGEN_PLANMAP=1 sbt "testOnly graft.plans.PlanMapSpec"
  * then review the PLANMAP.md diff like any other code change.
  *
  * Streaming queries are listed without fingerprints (building them
  * executes real replays; their state bounds are measured in
  * StateMetricsSpec instead).
  */
class PlanMapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private val mapPath = Paths.get("PLANMAP.md")

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      // initialPlan, not inputPlan: the fingerprint counts EXCHANGES, and
      // those are inserted by EnsureRequirements during query-stage prep —
      // inputPlan predates them (it has the joins/windows but no shuffles)
      case a: AdaptiveSparkPlanExec => Seq(a.initialPlan)
      case _ => p.children
    }
    (p +: kids.flatMap(flatten)) ++ p.subqueries.flatMap(flatten)
  }

  /** One stable fingerprint line: counts keyed by physical-operator kind. */
  private def fingerprint(name: String): String = {
    val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
    val nodes = flatten(plan)
    def n(pred: SparkPlan => Boolean) = nodes.count(pred)
    def byName(s: String) = n(_.getClass.getSimpleName.startsWith(s))
    val shuffles = byName("ShuffleExchange")
    val broadcasts = byName("BroadcastExchange")
    val joins = Seq(
      "BHJ" -> byName("BroadcastHashJoin"),
      "SMJ" -> byName("SortMergeJoin"),
      "SHJ" -> byName("ShuffledHashJoin"),
      "BNLJ" -> byName("BroadcastNestedLoopJoin"),
      "CP" -> byName("CartesianProduct"))
      .filter(_._2 > 0).map { case (k, c) => s"$c $k" }.mkString(" ")
    val windows = n { case w: WindowExecBase => w.partitionSpec.nonEmpty; case _ => false }
    val globalWindows = n { case w: WindowExecBase => w.partitionSpec.isEmpty; case _ => false }
    val topk = byName("TopKPerKey")
    s"| $name | $shuffles | $broadcasts | ${if (joins.isEmpty) "-" else joins} " +
      s"| $windows | $globalWindows | $topk |"
  }

  // ----- streaming fingerprints (round-9: VERDICT r8 task 6) -------------
  // A streaming query has no static batch plan, but every micro-batch's
  // EXECUTED plan is broadcast on the listener bus
  // (SparkListenerSQLExecutionStart.sparkPlanInfo). Running the replay with
  // a listener attached and fingerprinting the LAST streaming execution
  // pins the executed plan shape — stateful-operator census, shuffle count,
  // streaming join kinds — the same way the batch table pins exchanges.

  private val execPlans = new java.util.concurrent.ConcurrentLinkedQueue[SparkPlanInfo]()
  private val planListener = new SparkListener {
    override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
      case e: SparkListenerSQLExecutionStart => execPlans.add(e.sparkPlanInfo)
      case _ => ()
    }
  }

  private def flattenInfo(p: SparkPlanInfo): Seq[String] =
    p.nodeName +: p.children.flatMap(flattenInfo)

  /** Stateful/streaming physical operators worth a census column. */
  private val stateKinds = Seq(
    "StateStoreSave", "StateStoreRestore", "SessionWindowStateStoreSave",
    "SessionWindowStateStoreRestore", "StreamingDeduplicate",
    "StreamingSymmetricHashJoin", "FlatMapGroupsWithState",
    "TransformWithState", "StreamingGlobalLimit")

  private def isStreamingExec(names: Seq[String]): Boolean =
    names.exists(n =>
      stateKinds.exists(n.startsWith) || n == "MicroBatchScan" ||
        n.startsWith("WriteToDataSourceV2") ||
        n.startsWith("WriteToMicroBatchDataSource"))

  /** Wait for the async listener bus to drain (size stable for 300 ms).
    * Fails LOUDLY when the deadline expires with events still in flight —
    * a truncated exec count would otherwise byte-fail the PLANMAP diff as
    * nondeterministic "fingerprint drift" when the real cause is a loaded
    * box (advice r9). One retry doubles the deadline before giving up. */
  private def drained(deadlineSec: Long = 15L, priorSec: Long = 0L): Unit = {
    var last = -1
    var stable = 0
    val deadline = System.nanoTime() + deadlineSec * 1000 * 1000 * 1000
    while (stable < 3 && System.nanoTime() < deadline) {
      Thread.sleep(100)
      val n = execPlans.size
      if (n == last) stable += 1 else { stable = 0; last = n }
    }
    if (stable < 3) {
      if (priorSec == 0) drained(deadlineSec * 2, priorSec = deadlineSec)
      // advice r10: report the REAL elapsed total (first deadline + the
      // doubled retry), not deadlineSec*3 of the retry's deadline
      else fail(s"listener bus still draining after ${priorSec + deadlineSec} s total — " +
        "environment too loaded for a trustworthy streaming fingerprint; " +
        "re-run on a quieter box (this is NOT plan drift)")
    }
  }

  private def streamingFingerprint(name: String): String = {
    import scala.jdk.CollectionConverters._
    execPlans.clear()
    SparkEntry.queries(name)(spark, dir).collect() // runs the replay(s)
    drained()
    val streamExecs = execPlans.asScala.toSeq.map(flattenInfo).filter(isStreamingExec)
    if (streamExecs.isEmpty)
      s"| $name | 0 | - | - | - |"
    else {
      val last = streamExecs.last
      val shuffles = last.count(_.startsWith("Exchange")) +
        last.count(_.startsWith("ShuffleExchange"))
      val states = stateKinds.map(k => k -> last.count(_.startsWith(k)))
        .filter(_._2 > 0).map { case (k, c) => s"$c $k" }.mkString(" ")
      val joins = Seq("BHJ" -> "BroadcastHashJoin", "SMJ" -> "SortMergeJoin",
        "SHJ" -> "ShuffledHashJoin", "SSHJ" -> "StreamingSymmetricHashJoin")
        .map { case (tag, n) => tag -> last.count(_.startsWith(n)) }
        .filter(_._2 > 0).map { case (tag, c) => s"$c $tag" }.mkString(" ")
      s"| $name | ${streamExecs.size} | $shuffles " +
        s"| ${if (states.isEmpty) "-" else states} " +
        s"| ${if (joins.isEmpty) "-" else joins} |"
    }
  }

  test("every batch query's plan matches its committed PLANMAP.md fingerprint") {
    val (streaming, batch) = SparkEntry.registry.partition(_.name.contains("stream"))
    val rows = batch.sortBy(_.name).map { q =>
      val row =
        try fingerprint(q.name)
        catch { case e: Throwable =>
          s"| ${q.name} | plan-failed: ${e.getClass.getSimpleName} | | | | | |" }
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      row
    }
    spark.sparkContext.addSparkListener(planListener)
    val streamingRows =
      try streaming.sortBy(_.name).map { q =>
        val row =
          try streamingFingerprint(q.name)
          catch { case e: Throwable =>
            s"| ${q.name} | run-failed: ${e.getClass.getSimpleName} | | | |" }
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        row
      }
      finally spark.sparkContext.removeSparkListener(planListener)
    // assembled by concatenation — stripMargin would eat the table rows'
    // leading pipe characters
    val doc =
      "# PLANMAP — per-query physical-plan fingerprints\n\n" +
        "GENERATED by PlanMapSpec (regenerate: `SPARK_GRAFT_REGEN_PLANMAP=1\n" +
        "sbt \"testOnly graft.plans.PlanMapSpec\"`). Built from each batch\n" +
        "registry query's AQE initial plan (post-EnsureRequirements, pre-\n" +
        "execution) at sf0.001. The spec fails when a live plan diverges\n" +
        "from this file, so every new exchange, degraded join, or\n" +
        "de-partitioned window shows up as a reviewable diff.\n\n" +
        "Columns: shuffles = ShuffleExchange nodes; bcast =\n" +
        "BroadcastExchange nodes; joins = hash/merge/product join nodes\n" +
        "(BHJ/SMJ/SHJ/BNLJ/CP); win = partitioned WindowExec; gwin =\n" +
        "UNPARTITIONED WindowExec (single-task funnel — must stay 0\n" +
        "everywhere per GlobalPlanGuardSpec's empty allowlist); topk =\n" +
        "native TopKPerKeyExec nodes.\n\n" +
        "| query | shuffles | bcast | joins | win | gwin | topk |\n" +
        "|---|---|---|---|---|---|---|\n" +
        rows.mkString("\n") + "\n\n" +
        s"## Streaming queries (${streaming.size})\n\n" +
        "Fingerprint of each replay's LAST streaming micro-batch EXECUTED\n" +
        "plan, captured from SparkListenerSQLExecutionStart while the\n" +
        "builder runs at sf0.001 (round-9: the executed-plan pin the batch\n" +
        "table gives batch queries, extended to streaming). Columns:\n" +
        "sexecs = streaming executions observed during the replay (data +\n" +
        "no-data batches, all inner streams); shuffles = Exchange nodes in\n" +
        "the last plan; state ops = stateful-operator census (StateStore\n" +
        "save/restore pairs, dedup, session stores, flatMapGroupsWithState,\n" +
        "transformWithState, streaming joins); joins = join nodes incl.\n" +
        "SSHJ = StreamingSymmetricHashJoin. State BOUNDS are measured in\n" +
        "StateMetricsSpec; this table pins the plan SHAPE.\n\n" +
        "| query | sexecs | shuffles | state ops | joins |\n" +
        "|---|---|---|---|---|\n" +
        streamingRows.mkString("\n") + "\n"
    if (sys.env.contains("SPARK_GRAFT_REGEN_PLANMAP")) {
      Files.writeString(mapPath, doc)
      succeed
    } else {
      assert(Files.exists(mapPath),
        "PLANMAP.md missing — regenerate with SPARK_GRAFT_REGEN_PLANMAP=1")
      val committed = Files.readString(mapPath)
      if (committed != doc) {
        val committedRows = committed.linesIterator.filter(_.startsWith("| q")).toSeq
        val liveRows = doc.linesIterator.filter(_.startsWith("| q")).toSeq
        val committedByName = committedRows.map(r => r.split('|')(1).trim -> r).toMap
        val diffs = liveRows.flatMap { r =>
          val name = r.split('|')(1).trim
          committedByName.get(name) match {
            case Some(c) if c == r => None
            case Some(c) => Some(s"CHANGED $name\n  committed: $c\n  live:      $r")
            case None => Some(s"NEW $name (regenerate PLANMAP.md)")
          }
        } ++ committedByName.keys.filterNot(n => liveRows.exists(_.split('|')(1).trim == n))
          .map(n => s"REMOVED $n (regenerate PLANMAP.md)")
        assert(diffs.isEmpty,
          "plan fingerprints diverge from PLANMAP.md:\n" + diffs.mkString("\n") +
            "\nIf intentional, regenerate with SPARK_GRAFT_REGEN_PLANMAP=1 and review the diff.")
        // non-row text drifted (header/streaming list): still require regen
        assert(committed == doc, "PLANMAP.md non-table content is stale — regenerate")
      }
    }
  }
}
