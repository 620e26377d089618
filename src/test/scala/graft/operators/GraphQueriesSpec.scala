package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The iterative graph queries (q80 PageRank, q111 triangles, q138 HITS)
  * join |V|-bounded score/adjacency frames against their cached edge lists.
  * Below GraphQueries.BroadcastRowThreshold those frames broadcast (the
  * edge frame never reshuffles); above it the SAME join falls back to a
  * co-partitioned shuffle join — this spec exercises BOTH arms of that
  * switch, since the fixture graphs only ever take the broadcast arm. */
class GraphQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q330 critical path: lengths grow strictly per layer, reach stays bounded") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = graft.SparkEntry.queries("q330_critical_path")(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      assert(rows.map(_._1).sameElements(0L to 7L))
      // layer 0 seeds everything; later layers lose only unreferenced nodes
      assert(rows.head._3 == rows.head._2, s"$d: layer-0 reach ${rows.head._3}")
      rows.foreach { case (l, n, reached, _) =>
        assert(reached <= n && reached * 2 > n, s"$d: layer $l reach $reached/$n")
      }
      // max-plus law: adding a layer can only lengthen the critical path,
      // and each step adds at least one positive node cost
      rows.sliding(2).foreach { p =>
        assert(p(1)._4 > p(0)._4, s"$d: critical length not increasing at layer ${p(1)._1}")
      }
      spark.catalog.clearCache()
    }
  }

  // q80's per-iteration joins live inside eagerly-checkpointed lineage
  // (invisible in the final plan), so the broadcast-arm pin rides q138 and
  // q111, whose half-round/adjacency joins stay in the plan tree
  test("fixture-scale q138 and q111 take the broadcast arm for their score joins") {
    for (name <- Seq("q138_hits", "q111_triangle_count")) {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$name:\n$plan")
      spark.catalog.clearCache()
    }
  }

  // VERDICT r5: q111's four chained caches (e0/degc/oriented/adj) lived
  // until the harness's clearCache, and under a contended 258-query run
  // that memory pressure produced a 3.3× run-to-run spread. The fix keeps
  // at most two EAGER checkpoint block sets (oriented, adj) and zero
  // cacheManager entries by the time the query frame is returned.
  test("q111/q162 release their interior caches before returning") {
    def livePersisted = spark.sparkContext.getPersistentRDDs.size
    // q162: of its three interior caches only the twice-read keep frame may
    // remain persisted (e/d are dropped once keep materializes)
    spark.catalog.clearCache()
    val before162 = livePersisted
    val df162 = SparkEntry.queries("q162_bipartite_projection")(spark, dir)
    assert(livePersisted - before162 <= 1,
      s"q162 left ${livePersisted - before162} newly persisted RDDs")
    assert(df162.count() > 0)
    // q111: zero cacheManager entries (all four interior caches are either
    // unpersisted or replaced by eager checkpoints) and ≤2 new block sets
    // (the oriented + adj checkpoints)
    spark.catalog.clearCache()
    val before111 = livePersisted
    val df111 = SparkEntry.queries("q111_triangle_count")(spark, dir)
    assert(spark.sharedState.cacheManager.isEmpty,
      "q111 must eagerly unpersist its interior caches")
    assert(livePersisted - before111 <= 2,
      s"q111 left ${livePersisted - before111} newly persisted RDDs")
    assert(df111.count() > 0) // and still computes off the released lineage
    spark.catalog.clearCache()
  }

  test("maybeBroadcast above the threshold plans a shuffle join, not a broadcast") {
    val edges = spark.range(0, 1000)
      .select((col("id") % 100).as("src"), (col("id") % 37).as("dst"))
    val scores = spark.range(0, 100)
      .select(col("id").as("src"), (col("id") * 10).as("score"))
    // a genuinely over-threshold frame would also exceed Catalyst's own
    // autoBroadcastJoinThreshold; emulate that statistics regime so the
    // planner can't silently re-broadcast the tiny test frame
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // threshold 0 forces the co-partitioned arm regardless of actual size
      val plan = edges.join(GraphQueries.maybeBroadcast(scores, rows = 100, threshold = 0), "src")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q162 projection: degree cap precedes the self-join, no product join") {
    val plan = SparkEntry.queries("q162_bipartite_projection")(spark, dir)
      .queryExecution.executedPlan.toString
    // the hub cap must be in the plan (fan-out bounded at C(25,2) per key)
    // and the projection must stay an equi-join on the part key
    assert(plan.contains("<= 25"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    spark.catalog.clearCache()
  }

  test("maybeBroadcast below the threshold broadcasts") {
    val edges = spark.range(0, 1000)
      .select((col("id") % 100).as("src"), (col("id") % 37).as("dst"))
    val scores = spark.range(0, 100)
      .select(col("id").as("src"), (col("id") * 10).as("score"))
    val plan = edges.join(GraphQueries.maybeBroadcast(scores, rows = 100), "src")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  /** The sparse mod-9973 part–supplier edge set (the q182/q183 graph) as
    * plain Scala pairs (u < v), for brute-force references. */
  private def sparseEdges(maxQty: Int): Set[(Long, Long)] =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") < maxQty)
      .select((col("l_partkey") % 9973).as("a"), (col("l_suppkey") % 9973).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")), greatest(col("a"), col("b")))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  // the per-round joins live inside eagerly-checkpointed lineage (invisible
  // in the final plan, like q80's), so these two are verified against an
  // INDEPENDENT in-memory derivation instead of a plan pin
  test("q182 k-core equals an in-memory peel run to its fixpoint") {
    val out = SparkEntry.queries("q182_kcore")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    var edges = sparseEdges(maxQty = 3)
    var done = false
    while (!done) { // fixpoint, NOT a fixed round count — this also proves
      // the query's 6 rounds cover the fixture's convergence depth
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= 3).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      done = next == edges
      edges = next
    }
    val expected = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    assert(out == expected)
    assert(out.nonEmpty, "fixture 3-core must be non-trivial")
    spark.catalog.clearCache()
  }

  test("q183 label propagation equals an in-memory 3-round mode fold") {
    val out = SparkEntry.queries("q183_label_propagation")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e0 = sparseEdges(maxQty = 2)
    val adj = (e0.toSeq ++ e0.toSeq.map(_.swap))
      .groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3)
      lab = adj.map { case (u, nbrs) =>
        val counts = nbrs.groupBy(lab).toSeq.map { case (l, xs) => (xs.size, -l) }
        u -> -counts.max._2 // most frequent label, smallest label on ties
      }
    assert(out == lab)
    assert(out.values.toSet.size > 1, "fixture must yield multiple communities")
    spark.catalog.clearCache()
  }
}
