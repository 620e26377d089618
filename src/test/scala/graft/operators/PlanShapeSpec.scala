package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the round-2 operator additions — the
  * properties that make each query survive a 100× scale-up, checked against
  * the EXECUTED plan (so AQE re-planning is included).
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  private def executedPlan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q49h TPC-H Q6: every predicate pushes to the parquet scan") {
    val plan = executedPlan("q49h_sql_tpch_q6")
    // filters reach the scan (the plan string elides the full list — assert
    // the pushdown marker) and the projection prunes to exactly the 4
    // referenced columns
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan)
    assert(plan.contains(
      "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate"), plan)
  }

  test("q49g TPC-H Q4: the correlated EXISTS decorrelates to a semi join") {
    val plan = executedPlan("q49g_sql_tpch_q4")
    assert(plan.contains("LeftSemi"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q72 bigram LM: the LM tables broadcast against the corpus stream") {
    val plan = executedPlan("q72_bigram_lm")
    assert(plan.split("BroadcastHashJoin").length - 1 >= 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q80 PageRank: no nested-loop or cartesian joins anywhere") {
    val plan = executedPlan("q80_pagerank")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q75 count-min: the cell grid broadcasts to the probe side") {
    val plan = executedPlan("q75_countmin_heavy_hitters")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q111 triangles: wedge + closing joins are equi-joins, never a product") {
    val plan = executedPlan("q111_triangle_count")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q110 BM25: df and corpus stats broadcast; no product joins") {
    val plan = executedPlan("q110_bm25")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q82 MERGE emulation: one shuffle join on the merge key, full outer") {
    val plan = executedPlan("q82_upsert_merge")
    assert(plan.contains("FullOuter"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q74 z-order: row-local bucket off one broadcast scalar, no window/sort") {
    val plan = executedPlan("q74_zorder_layout")
    // the only join is the 1-row zmax scalar broadcast (IdentityBroadcastMode);
    // bucket assignment itself is row-local arithmetic — no WindowExec, no
    // global SortExec anywhere before the final presentation ORDER BY
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("q103 the BROADCAST hint reaches the physical plan") {
    val plan = executedPlan("q103_join_hint")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q311 the per-order rollup's exchange is computed once and reused") {
    val df = SparkEntry.queries("q311_exchange_reuse")(spark, dir)
    df.collect() // run so AQE finalizes its stages (reuse is a runtime decision)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage")
      || plan.contains("(reused)"), plan)
  }

  test("q314 every join-strategy hint reaches its arm's physical plan") {
    val plan = executedPlan("q314_join_strategy_matrix")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(plan.contains("SortMergeJoin"), plan)
  }

  test("q92 fuzzy join stays an equi-join on the variant (no nested loop)") {
    val plan = executedPlan("q92_fuzzy_join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q99 association rules pair via the basket key, never a product") {
    val plan = executedPlan("q99_assoc_rules")
    // the only nested-loop joins are the broadcast 1-row totals; the item
    // pairing itself must be the equi-join on the basket key
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("q81b point-in-time join hash-joins on the entity key") {
    val plan = executedPlan("q81b_pit_join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q113 SemDeDup pairs via the cluster-id equi-join, never all-pairs") {
    val plan = executedPlan("q113_semdedup")
    // the K-row centroid broadcasts (IdentityBroadcastMode fan-outs) are the
    // k-means scoring design, same as q35f/g; what must NOT be a product is
    // the candidate-pair join — assert it is keyed on the cluster id
    assert(plan.contains("CartesianProduct") == false, plan)
    assert("(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin) \\[cent".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("q114 GROUPS frame runs the window over the per-group table, not corpus rows") {
    val df = SparkEntry.queries("q114_groups_frame")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the Window must consume the aggregated (150-group) table — i.e. sit
    // ABOVE the HashAggregate in the plan tree, not directly on the scan
    val winIdx = plan.indexOf("Window")
    val aggIdx = plan.indexOf("HashAggregate")
    assert(winIdx >= 0 && aggIdx >= 0 && winIdx < aggIdx, plan)
  }

  test("q115 curation funnel: one narrow shuffle, no product joins") {
    val plan = executedPlan("q115_curation_funnel")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q116 RAG chunking is a pure map stage: no join, no aggregate-shuffle") {
    val plan = executedPlan("q116_rag_chunks")
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("HashAggregate"), plan)
  }

  test("q122 BFS frontier expansion joins on the node key, never a product") {
    val plan = executedPlan("q122_shortest_path")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q123 spatial join is the (cx, cy) cell equi-join, not an all-pairs product") {
    val plan = executedPlan("q123_spatial_grid_join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert("(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin) \\[cx".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("q117 temperature mix broadcasts the quota table") {
    val plan = executedPlan("q117_temperature_mix")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") ||
      plan.split("CartesianProduct").length - 1 <= 1, plan) // the 1-row tot crossJoin broadcasts
  }

  // ---- round-3 additions ----

  test("q124 islands: windows + both groupBys reuse ONE user_id exchange") {
    val plan = executedPlan("q124_islands")
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("q125 sweep-line concurrency: no interval self-join anywhere") {
    val plan = executedPlan("q125_max_concurrency")
    assert(!plan.contains("Join"), plan)
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1, plan)
  }

  test("q126 bitmap overlap: word-aligned equi-join, never a product") {
    val plan = executedPlan("q126_bitmap_overlap")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q139 rollup cascade: pure window + aggregate, no join at any level") {
    val plan = executedPlan("q139_rollup_cascade")
    assert(!plan.contains("Join"), plan)
  }

  test("q140 attribution: carry-forward window, no as-of self-join") {
    val plan = executedPlan("q140_attribution")
    assert(!plan.contains("Join"), plan)
    // exactly two hash exchanges: the user_id window + the source roll-up
    assert(plan.split("Exchange hashpartitioning").length - 1 == 2, plan)
  }

  test("q137 kNN join: probe-bucket equi-join, never an all-pairs product") {
    val plan = executedPlan("q137_knn_join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q138 HITS: score frames broadcast against the cached edge list") {
    val plan = executedPlan("q138_hits")
    assert(plan.split("BroadcastHashJoin").length - 1 >= 3, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q131 char-ngram jaccard: gram equi-join, never a product") {
    val plan = executedPlan("q131_char_ngram_jaccard")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q177 salted join: the salt reaches the join keys; output matches the plain join") {
    val plan = executedPlan("q177_salted_skew_join")
    // the (key, salt) pair must BE the join key — that split is the whole
    // point; the hash-match against the unsalted oracle proves it is pure
    // partitioning
    assert(plan.contains("__salt"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q130 skyline: frontier via distributed prefix scan + join-back, no NOT-EXISTS product") {
    val plan = executedPlan("q130_skyline")
    // the running max is DistributedRank.withStrictPrefixMax: a PARTITIONED
    // window (per range partition) + a ≤parts-row triangular broadcast —
    // never the quadratic NOT-EXISTS product over part×part
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("parquet aggregate pushdown: MIN/MAX/COUNT answered from footers, no row scan") {
    // the fourth scan-avoidance lever (static pushdown, DPP, envelope
    // pruning, and THIS): un-filtered MIN/MAX/COUNT compile to a
    // footer-statistics read — at 100 TB a table-wide extremum costs
    // O(files) metadata, not a data scan. Requires the v2 reader.
    val s = spark
    val prev = Seq("spark.sql.parquet.aggregatePushdown" -> s.conf.getOption("spark.sql.parquet.aggregatePushdown"),
      "spark.sql.sources.useV1SourceList" -> s.conf.getOption("spark.sql.sources.useV1SourceList"))
    s.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    s.conf.set("spark.sql.sources.useV1SourceList", "")
    try {
      import org.apache.spark.sql.functions._
      // MIN/MAX pushdown covers numeric/date leaves (not timestamps) —
      // quantity is the double column every stats footer carries
      val agg = s.read.parquet(s"$dir/lineitem.parquet")
        .agg(count(lit(1)).as("n"), min("l_quantity").as("lo"), max("l_quantity").as("hi"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [COUNT(*)"), plan)
      assert(plan.contains("MIN(l_quantity)"), plan)
      val row = agg.head()
      assert(row.getLong(0) == 60000L, row.toString) // sf0.01 lineitem rows
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("q192 DPP: the runtime dim filter reaches the fact scan as a partition filter") {
    val plan = executedPlan("q192_dpp")
    assert(plan.contains("dynamicpruning"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q186 bucketed join: co-located scans, no exchange on either join key") {
    // broadcasting off so the join cannot sidestep the property under test:
    // a sort-merge join whose children are bucketed scans with NO
    // hashpartitioning exchange on the join keys anywhere below it
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = executedPlan("q186_bucketed_join")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      assert(!plan.contains("hashpartitioning(o_orderkey"), plan)
      assert(!plan.contains("hashpartitioning(l_orderkey"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
