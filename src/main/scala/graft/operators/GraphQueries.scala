package graft.operators

import graft.Registry.{Q, q}
import graft.Tables
import org.apache.spark.sql.functions._

/** Graph analytics beyond connected components (q34g/StarContraction):
  * PageRank over the customer→supplier purchase graph.
  *
  * Cross-engine float sums are the classic PageRank verification trap, so
  * the whole computation runs in EXACT integer micro-units (rank 1.0 ≙
  * 1_000_000): contributions are floor-divided by out-degree, damping is
  * 850000·m div 1000000, and every aggregate is a BIGINT sum — identical
  * arithmetic in Spark and DuckDB, no ordering contract needed. Dangling
  * nodes (suppliers, which have no out-edges) simply leak their mass — the
  * standard simplified variant; ranks still order correctly.
  *
  * 100 TB shape: edges shuffle once to build (src, dst, deg); each of the 5
  * iterations is one equi-join on src (co-partitioned with the cached edge
  * frame) + one partial-aggregated groupBy on dst. Lineage is truncated per
  * round with eager localCheckpoint (NOTES.md — cache alone quadruples the
  * plan per iteration).
  */
object GraphQueries {

  /** Row-count switch point for the iterative queries' score/adjacency
    * frames (q80 rank, q111 adjacency, q138 hub/authority scores). These
    * frames are |V|-bounded — tiny next to the edge list — so broadcasting
    * them keeps the cached edge frame from ever reshuffling. But |V| grows
    * with the graph: past ~5M rows (≈100 MB+ of executor heap per copy at
    * typical node-id + score widths) a broadcast stops being free, and the
    * join must fall back to a co-partitioned shuffle join against the
    * edge frame (which is already hash-partitioned by the join key from
    * its own build). The fixture graphs sit 3 orders of magnitude under
    * the switch, so local plans take the broadcast arm — the fallback arm
    * is exercised by GraphQueriesSpec with a threshold of 0. */
  private[operators] val BroadcastRowThreshold = 5000000L

  /** Broadcast `dim` when its (already-counted) row count is under the
    * switch point, else return it untouched for a co-partitioned join. */
  private[operators] def maybeBroadcast(
      dim: org.apache.spark.sql.DataFrame, rows: Long,
      threshold: Long = BroadcastRowThreshold): org.apache.spark.sql.DataFrame =
    if (rows <= threshold) broadcast(dim) else dim

  /** q80's oracle: the same 5 iterations unrolled as chained CTEs. */
  private val pagerankSql: String = {
    def iter(prev: String, next: String) =
      s"""$next AS (
         |  SELECT n.node, CAST(150000 + (850000 * COALESCE(s.m, 0)) // 1000000 AS BIGINT) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, CAST(sum(r.rank // d.deg) AS BIGINT) AS m
         |    FROM edges e JOIN $prev r ON e.src = r.node JOIN outdeg d ON e.src = d.src
         |    GROUP BY e.dst) s ON n.node = s.node)""".stripMargin
    s"""WITH edges AS (
       |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
       |                  's' || CAST(l_suppkey AS VARCHAR) AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |nodes AS (SELECT DISTINCT src AS node FROM edges UNION SELECT DISTINCT dst FROM edges),
       |outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
       |${(0 until 5).map(i => iter(s"r$i", s"r${i + 1}")).mkString(",\n")}
       |SELECT node, rank FROM r5 ORDER BY rank DESC, node LIMIT 20""".stripMargin
  }

  /** q111's oracle: id-ordered triangle enumeration (u < v < w). The
    * triangle SET is orientation-independent, so this matches the Spark
    * side's degree-ordered enumeration row-for-row after the per-node
    * roll-up. */
  private val triangleSql: String =
    """WITH raw AS (SELECT l_partkey % 9973 AS a, l_suppkey % 9973 AS b FROM lineitem),
      |e AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM raw WHERE a <> b),
      |t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |      FROM e e1 JOIN e e2 ON e2.u = e1.v
      |                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
      |SELECT node, CAST(count(*) AS BIGINT) AS triangles
      |FROM (SELECT a AS node FROM t UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t)
      |GROUP BY node ORDER BY triangles DESC, node LIMIT 20""".stripMargin

  /** q182's peel-round count. Fixpoint is MEASURED at 2 rounds on both
    * fixture scales (sf0.01: 849 core edges, sf0.1: 17239); the extra
    * rounds are provable no-ops past the fixpoint in BOTH engines, so the
    * fixed count stays exact even if an intermediate scale converges
    * slower. */
  private val KCoreRounds = 6

  /** q182's oracle: the same 6 peel rounds unrolled. MATERIALIZED is load-
    * bearing — each round's edge CTE is referenced three times (degree
    * pass + both endpoint filters), so plain CTEs would inline 3^6 ways
    * (the q76c lesson). */
  private val kcoreSql: String = {
    def round(i: Int) =
      s"""d$i AS MATERIALIZED (
         |  SELECT n, CAST(count(*) AS BIGINT) AS deg
         |  FROM (SELECT u AS n FROM e${i - 1} UNION ALL SELECT v FROM e${i - 1}) GROUP BY n),
         |e$i AS MATERIALIZED (
         |  SELECT e.u, e.v FROM e${i - 1} e
         |  JOIN d$i du ON du.n = e.u JOIN d$i dv ON dv.n = e.v
         |  WHERE du.deg >= 3 AND dv.deg >= 3)""".stripMargin
    s"""WITH raw AS (SELECT l_partkey % 9973 AS a, l_suppkey % 9973 AS b
       |             FROM lineitem WHERE l_quantity < 3),
       |e0 AS MATERIALIZED (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
       |                    FROM raw WHERE a <> b),
       |${(1 to KCoreRounds).map(round).mkString(",\n")}
       |SELECT n AS node, CAST(count(*) AS BIGINT) AS deg
       |FROM (SELECT u AS n FROM e$KCoreRounds UNION ALL SELECT v FROM e$KCoreRounds)
       |GROUP BY n ORDER BY node""".stripMargin
  }

  /** Mode-label encoding base for q183: one BIGINT carries (count, label)
    * with count dominant and label anti-monotone, so a plain max() picks
    * the most frequent neighbor label with smallest-label tie-break —
    * identical integer arithmetic in both engines (no argmax/max_by
    * tie-order contract needed). Labels are node ids < 9973 ≪ C; counts
    * are ≤ |E| ≪ 2^63/C. */
  private val LpaC = 100000000L

  /** q183's oracle: 3 label-propagation rounds unrolled (MATERIALIZED —
    * each round reads its predecessor once but the final round is read
    * by the projection; inlining 3 chained mode-aggregations is already
    * quadratic in plan text). */
  private val lpaSql: String =
    s"""$lpaSqlPrefix
       |SELECT node, CAST(lab AS BIGINT) AS community FROM l3 ORDER BY node""".stripMargin

  /** lpaSql's CTE chain (raw → e0/e → l0..l3) without the final SELECT, so
    * q282's modularity oracle can extend it. Lazy: lpaSql above references
    * it during object init. */
  private lazy val lpaSqlPrefix: String = {
    def round(i: Int) =
      s"""l$i AS MATERIALIZED (
         |  SELECT node, $LpaC - 1 - (m % $LpaC) AS lab FROM (
         |    SELECT u AS node, max(cnt * $LpaC + ($LpaC - 1 - lab)) AS m FROM (
         |      SELECT e.u, l.lab, CAST(count(*) AS BIGINT) AS cnt
         |      FROM e JOIN l${i - 1} l ON l.node = e.v
         |      GROUP BY e.u, l.lab) c
         |    GROUP BY u) m)""".stripMargin
    s"""WITH raw AS (SELECT l_partkey % 9973 AS a, l_suppkey % 9973 AS b
       |             FROM lineitem WHERE l_quantity < 2),
       |e0 AS MATERIALIZED (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
       |                    FROM raw WHERE a <> b),
       |e AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
       |l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lab FROM e),
       |${(1 to 3).map(round).mkString(",\n")}""".stripMargin
  }

  /** q183's graph + 3 label-propagation rounds, shared with q282:
    * returns (undirected edge list e0, doubled edge list e, final labels). */
  private def lpGraph(s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame) = {
    val e0 = Tables.fanout(s, dir, "lineitem")
      .filter(col("l_quantity") < 2)
      .select((col("l_partkey") % 9973).as("a"), (col("l_suppkey") % 9973).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
    val e = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(true) // re-joined every round
    var lab = e.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("lab"))
      .localCheckpoint(true)
    val nV = lab.count() // label frame is |V|-bounded every round
    for (_ <- 1 to 3) {
      lab = e.join(maybeBroadcast(lab.select(col("node").as("v"), col("lab")), nV), "v")
        .groupBy(col("u"), col("lab")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("u"))
        .agg(max(col("cnt") * LpaC + (lit(LpaC) - 1 - col("lab"))).as("m"))
        .select(col("u").as("node"), (lit(LpaC) - 1 - (col("m") % LpaC)).as("lab"))
        .localCheckpoint(true)
    }
    (e0.localCheckpoint(true), e, lab)
  }

  val all: Seq[Q] = Seq(

    // Triangle counting (per-node participation, top 20) over the derived
    // part↔supplier co-occurrence graph — EDGE-ITERATOR over the degree
    // orientation: edges point from the lower-(degree, id) endpoint, which
    // bounds forward-degree by ~√(2m); per oriented edge (x,y) the closing
    // vertices are N⁺(x) ∩ N⁺(y) on SORTED adjacency arrays. This never
    // materializes the wedge set (17M rows at sf0.1 — the wedge-join
    // formulation measured 9 s; this shape ~halves it): the only shuffled
    // frames are the edge list and the 1-row-per-triangle explode for the
    // per-node roll-up. The adjacency frame is |V|-bounded (arrays ≤
    // √(2m)) and broadcasts here; at 100 TB it co-partitions with the
    // edges on x and y instead. The oracle enumerates the same triangle
    // set id-ordered.
    q("q111_triangle_count", "per-node triangle counts via oriented adjacency intersection")(
      triangleSql
    ) { (s, dir) =>
      // Node-space modulus, overridable for SCALE measurements ONLY (the
      // oracle states 9973): the sf10 decade runs with a corpus-scaled
      // modulus (99991) so the graph GROWS with the data instead of
      // densifying inside a fixed 9973-node space — SCALE.md round-9/10
      // measured the fixed modulus turning a linear operator into a 38×
      // wedge blow-up. Default is the committed, hash-verified projection.
      val mod = sys.env.getOrElse("SPARK_GRAFT_GRAPH_MOD", "9973").toLong
      val e0 = Tables(s, dir, "lineitem")
        .select((col("l_partkey") % mod).as("a"), (col("l_suppkey") % mod).as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct() // this exchange also parallelizes the single-file scan
        .cache() // degree pass + orientation both read it
      val deg = e0.select(col("u").as("n")).union(e0.select(col("v")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      // strict total order (degree, id): u < v already, so ties keep u first
      val fromU = col("du") < col("dv") || (col("du") === col("dv"))
      // deg is |V|-bounded: count it once and let the size switch decide
      // whether the degree and adjacency frames broadcast or co-partition
      val degc = deg.cache()
      val nV = degc.count()
      val du = degc.select(col("n").as("u"), col("d").as("du"))
      val dv = degc.select(col("n").as("v"), col("d").as("dv"))
      val oriented = e0.join(maybeBroadcast(du, nV), "u")
        .join(maybeBroadcast(dv, nV), "v")
        .select(when(fromU, col("u")).otherwise(col("v")).as("x"),
          when(fromU, col("v")).otherwise(col("u")).as("y"))
        // EAGER checkpoint, not cache: materializes now and truncates
        // lineage, so the e0/degc caches below it can be released
        // immediately instead of pinning executor memory until the
        // harness's clearCache — under a long contended run the four
        // chained caches were this query's 3× run-to-run variance
        // (VERDICT r5). At most TWO block sets (oriented, adj) are live
        // from here on.
        .localCheckpoint(true) // adjacency build + both endpoint joins
      e0.unpersist(false)
      degc.unpersist(false)
      val adj = oriented.groupBy(col("x").as("n"))
        .agg(sort_array(collect_list(col("y"))).as("nbrs"))
        .localCheckpoint(true) // joined on both endpoints
      val common = oriented
        .join(maybeBroadcast(adj.select(col("n").as("x"), col("nbrs").as("ax")), nV), Seq("x"))
        .join(maybeBroadcast(adj.select(col("n").as("y"), col("nbrs").as("ay")), nV), Seq("y"))
        .select(col("x"), col("y"),
          array_intersect(col("ax"), col("ay")).as("ws"))
        .filter(size(col("ws")) > 0)
      // each triangle (x, y, w): +|ws| to x and y, +1 to every w
      common.select(explode(array(col("x"), col("y"))).as("node"),
          size(col("ws")).cast("long").as("c"))
        .unionAll(common.select(explode(col("ws")).as("node"), lit(1L).as("c")))
        .groupBy("node").agg(sum(col("c")).as("triangles"))
        .orderBy(col("triangles").desc, col("node")).limit(20)
    },

    q("q80_pagerank", "5-iteration integer-arithmetic PageRank over the customer→supplier graph")(
      pagerankSql
    ) { (s, dir) =>
      // edge build note: broadcasting the 150 K-row orders projection was
      // MEASURED SLOWER here (10 s vs 6 s total — driver-side relation
      // build dominates at local scale); the shuffled join wins
      val edges = Tables.fanout(s, dir, "orders")
        .join(Tables.fanout(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey").cast("string")).as("src"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
        .distinct()
        .cache() // read 4× (outdeg, contribBase, and both node legs)
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst"))).distinct().cache()
      // |V| counted once: the size switch routes every score-frame join
      // below (rank, m, outdeg are all |V|-bounded)
      val nV = nodes.count()
      val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      // (src, dst, deg) is re-joined every iteration — materialize it once,
      // EAGERLY, so the edges cache under it can be released before the
      // iteration loop starts instead of pinning memory for all 5 rounds
      val contribBase = edges.join(maybeBroadcast(outdeg, nV), "src")
        .localCheckpoint(true)
      edges.unpersist(false)
      var rank = nodes.select(col("node").as("rnode"), lit(1000000L).as("pr"))
      for (_ <- 1 to 5) {
        // rank is |nodes|-sized (tiny next to edges) — broadcast it (below
        // the switch point) so the cached edge frame never reshuffles; the
        // dst groupBy collapses map-side (|dst| distinct keys)
        val m = contribBase.join(maybeBroadcast(rank, nV), col("src") === col("rnode"))
          .select(col("dst").as("node"), expr("pr div deg").as("contrib"))
          .groupBy("node").agg(sum(col("contrib")).as("m"))
        rank = nodes.join(maybeBroadcast(m, nV), Seq("node"), "left")
          .select(col("node").as("rnode"),
            expr("150000L + (850000L * coalesce(m, 0L)) div 1000000L").as("pr"))
          .localCheckpoint(true) // truncate lineage per round (NOTES.md)
      }
      rank.select(col("rnode").as("node"), col("pr").as("rank"))
        .orderBy(col("rank").desc, col("node")).limit(20)
    },

    // Single-source shortest paths (unweighted BFS) — the remaining core
    // graph primitive next to CC (q34g) / PageRank (q80) / triangles
    // (q111). Spark runs the Pregel-style frontier iteration: per level,
    // expand the frontier through the cached edge list, anti-join out
    // already-visited nodes, localCheckpoint to truncate lineage
    // (NOTES.md). Hop distances are small integers — no float anywhere.
    // The oracle is a recursive CTE with UNION dedup semantics (DuckDB's
    // cycle-safe mode) + a final min(d) roll-up — a genuinely different
    // derivation of the same distances. Graph: the sparse (quantity < 2)
    // slice of the mod-9973 part–supplier graph, undirected; 6-hop cap
    // reaches 853 of the nodes at sf0.01 with distances spread 0–6.
    q("q122_shortest_path", "6-hop BFS distances from node 1 over the sparse part-supplier graph")(
      """WITH RECURSIVE raw AS (SELECT l_partkey % 9973 AS a, l_suppkey % 9973 AS b
        |                       FROM lineitem WHERE l_quantity < 2),
        |e0 AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM raw WHERE a <> b),
        |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        |bfs AS (
        |  SELECT CAST(1 AS BIGINT) AS node, 0 AS d
        |  UNION
        |  SELECT e.v AS node, bfs.d + 1 AS d
        |  FROM bfs JOIN e ON e.u = bfs.node
        |  WHERE bfs.d < 6
        |)
        |SELECT node, CAST(min(d) AS BIGINT) AS d
        |FROM bfs GROUP BY node ORDER BY node""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val raw = Tables.fanout(s, dir, "lineitem")
        .filter(col("l_quantity") < 2)
        .select((col("l_partkey") % 9973).as("a"), (col("l_suppkey") % 9973).as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct()
      val e = raw.union(raw.select(col("v"), col("u"))).cache() // (u, v) both directions
      var dist = Seq((1L, 0L)).toDF("node", "d")
      var frontier = dist.select("node")
      for (i <- 1 to 6) {
        val next = frontier.join(e, col("node") === col("u"))
          .select(col("v").as("node")).distinct()
          .join(dist, Seq("node"), "left_anti")
          .withColumn("d", lit(i.toLong))
          .localCheckpoint(true) // truncate per-level lineage
        dist = dist.union(next).localCheckpoint(true)
        frontier = next.select("node")
      }
      dist.orderBy("node")
    },

    // HITS hubs & authorities over the bipartite part→supplier purchase
    // graph — the mutual-reinforcement ranking PageRank doesn't give
    // (authorities: suppliers endorsed by broad parts; hubs: parts that
    // touch strong suppliers). Two full a/h rounds in EXACT BIGINT
    // arithmetic, unnormalized (normalization is a float trap cross-engine
    // and does not change the ordering). Magnitude bound: with max degrees
    // (682, 52) at sf0.1, h₂ ≤ 52·682·52·682·10⁶ ≈ 1.2·10¹⁵ — 3 decimal
    // orders under int64; deeper iteration would rescale by 10³ per round.
    // Scale shape = PageRank's: each half-round is one equi-join of the
    // cached edge list with a broadcast score frame + a partial-aggregated
    // groupBy; nothing grows past |edges|.
    q("q138_hits", "2-round integer HITS: top hubs (parts) and authorities (suppliers)")(
      """WITH e AS (SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS p,
        |                           's' || CAST(l_suppkey AS VARCHAR) AS s FROM lineitem),
        |a1 AS (SELECT s, CAST(count(*) AS BIGINT) * 1000000 AS a FROM e GROUP BY s),
        |h1 AS (SELECT p, CAST(sum(a) AS BIGINT) AS h FROM e JOIN a1 USING (s) GROUP BY p),
        |a2 AS (SELECT s, CAST(sum(h) AS BIGINT) AS a FROM e JOIN h1 USING (p) GROUP BY s),
        |h2 AS (SELECT p, CAST(sum(a) AS BIGINT) AS h FROM e JOIN a2 USING (s) GROUP BY p)
        |SELECT kind, node, score FROM (
        |  (SELECT 'authority' AS kind, s AS node, a AS score FROM a2
        |   ORDER BY score DESC, node LIMIT 20)
        |  UNION ALL
        |  (SELECT 'hub' AS kind, p AS node, h AS score FROM h2
        |   ORDER BY score DESC, node LIMIT 20))
        |ORDER BY kind, score DESC, node""".stripMargin
    ) { (s, dir) =>
      val e = Tables.fanout(s, dir, "lineitem")
        .select(concat(lit("p"), col("l_partkey").cast("string")).as("p"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("s"))
        .distinct()
        .cache() // re-joined every half-round
      // the score frames are bounded by the two partition sizes — ONE
      // distinct-count pass over the cached edge list sizes both switches
      val psCounts = e.agg(countDistinct(col("p")), countDistinct(col("s"))).head()
      val nP = psCounts.getLong(0)
      val nS = psCounts.getLong(1)
      val a1 = e.groupBy("s").agg((count(lit(1)) * 1000000L).as("a"))
      val h1 = e.join(maybeBroadcast(a1, nS), "s").groupBy("p").agg(sum(col("a")).as("h"))
      val a2 = e.join(maybeBroadcast(h1, nP), "p").groupBy("s").agg(sum(col("h")).as("a"))
      val h2 = e.join(maybeBroadcast(a2, nS), "s").groupBy("p").agg(sum(col("a")).as("h"))
      a2.select(lit("authority").as("kind"), col("s").as("node"), col("a").as("score"))
        .orderBy(col("score").desc, col("node")).limit(20)
        .unionAll(
          h2.select(lit("hub").as("kind"), col("p").as("node"), col("h").as("score"))
            .orderBy(col("score").desc, col("node")).limit(20))
        .orderBy(col("kind"), col("score").desc, col("node"))
    },

    // Bipartite → unipartite projection with co-occurrence weights: the
    // part–supplier graph projected to supplier–supplier edges, w = number
    // of SHARED parts — the "co-purchased-with" construction (and, on a
    // doc–term graph, the term-co-occurrence matrix). The blow-up hazard is
    // the hub: projecting through a part of degree d fans out C(d,2) pairs,
    // so parts above a DEGREE CAP are dropped before the self-join — the
    // same stopword-gram lesson as q131/q51 (hub nodes carry no
    // co-occurrence signal; here the cap also bounds per-join-key fan-out
    // at C(25,2) = 300, making worst-case candidate volume 300·|parts|,
    // linear — never Σd² over unbounded hubs). Supplier degrees in this
    // fixture are ~500+ (every supplier pairs with every other — a
    // vacuous projection), so parts are the projection key in BOTH
    // directions' only non-degenerate choice. The cap filter rides the
    // degree aggregate (|parts|-bounded, size-switched broadcast); pair
    // counts partial-aggregate map-side; top-100 via per-partition heaps.
    q("q162_bipartite_projection",
      "supplier co-occurrence projection through degree-capped parts (top 100 edges)")(
      """WITH e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
        |d AS (SELECT p, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY p),
        |keep AS (SELECT e.p, e.s FROM e JOIN d USING (p) WHERE d.deg <= 25),
        |pairs AS (SELECT a.s AS s1, b.s AS s2, CAST(count(*) AS BIGINT) AS w
        |          FROM keep a JOIN keep b ON a.p = b.p AND a.s < b.s
        |          GROUP BY a.s, b.s)
        |SELECT s1, s2, w FROM pairs ORDER BY w DESC, s1, s2 LIMIT 100""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "lineitem")
        .select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
        .distinct() // the exchange also parallelizes the single-file scan
        .cache() // degree pass + both projection legs
      val d = e.groupBy("p").agg(count(lit(1)).as("deg")).cache()
      val nParts = d.count()
      val keep = e.join(maybeBroadcast(d.filter(col("deg") <= 25), nParts), "p")
        .select(col("p"), col("s"))
        .cache() // both legs of the self-join
      // materialize keep NOW so the e/d caches above it can be released
      // before returning, instead of pinning memory until the harness's
      // clearCache (cache, not checkpoint: the degree-cap filter stays
      // visible in the returned plan for the shape pin)
      keep.count()
      e.unpersist(false)
      d.unpersist(false)
      keep.select(col("p"), col("s").as("s1"))
        .join(keep.select(col("p"), col("s").as("s2")), Seq("p"))
        .filter(col("s1") < col("s2"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("w"))
        .orderBy(col("w").desc, col("s1"), col("s2")).limit(100)
    },

    // k-core decomposition (k=3) by iterative peeling: per round, drop
    // every node whose degree in the CURRENT edge set is < k, until the
    // fixpoint — the standard densest-region primitive (spam/boilerplate
    // cluster detection on a doc-similarity graph; degeneracy ordering).
    // Scale shape: each round is one partial-aggregated degree groupBy
    // over the surviving edges + two equi-joins against the |V|-bounded
    // surviving-node frame (size-switched broadcast); the edge frame only
    // ever SHRINKS, and per-round lineage is truncated with eager
    // localCheckpoint (NOTES.md — cache alone quadruples the plan per
    // round). Round count is fixed at 6 — measured fixpoint is 2 at both
    // fixture scales, and post-fixpoint rounds are exact no-ops in both
    // engines — so Spark and the 6-round unrolled oracle agree by
    // construction. Output: surviving nodes with their in-core degree.
    q("q182_kcore", "3-core of the part-supplier graph via 6 peel rounds")(
      kcoreSql
    ) { (s, dir) =>
      val k = 3
      var e = Tables.fanout(s, dir, "lineitem")
        .filter(col("l_quantity") < 3)
        .select((col("l_partkey") % 9973).as("a"), (col("l_suppkey") % 9973).as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct()
        .localCheckpoint(true)
      // |V| of the INITIAL graph bounds every round's surviving-node frame
      val nV = e.select(col("u").as("n")).union(e.select(col("v"))).distinct().count()
      for (_ <- 1 to KCoreRounds) {
        // eager checkpoint: the keep-frame is read by BOTH endpoint joins
        val keep = e.select(col("u").as("n")).unionAll(e.select(col("v")))
          .groupBy("n").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k)
          .select("n")
          .localCheckpoint(true)
        e = e.join(maybeBroadcast(keep.select(col("n").as("u")), nV), "u")
          .join(maybeBroadcast(keep.select(col("n").as("v")), nV), "v")
          .select("u", "v")
          .localCheckpoint(true)
      }
      e.select(col("u").as("node")).unionAll(e.select(col("v")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
        .orderBy("node")
    },

    // Community detection by deterministic label propagation (3 synchronous
    // rounds): labels start as node ids; each round every node adopts its
    // neighbors' MODE label, ties to the smallest label. The tie-break is
    // folded into one BIGINT encoding (cnt·C + (C-1-label), C = 1e8) so a
    // plain max() aggregate — identical in both engines — is the whole
    // update rule; no argmax tie-order contract anywhere. Scale shape =
    // PageRank's: per round, one equi-join of the cached doubled edge list
    // against the |V|-bounded label frame (size-switched broadcast), a
    // partial-aggregated (node, label) count, and a second partial-
    // aggregated max — nothing grows past |E|; lineage truncated per round.
    // Fixture yields 133 communities at sf0.01 / 1035 at sf0.1.
    q("q183_label_propagation",
      "3-round deterministic mode-label propagation over the sparse part-supplier graph")(
      lpaSql
    ) { (s, dir) =>
      val (_, _, lab) = lpGraph(s, dir)
      lab.select(col("node"), col("lab").cast("long").as("community")).orderBy("node")
    },

    // Weighted single-source shortest paths — Bellman-Ford relaxation, the
    // weighted completion of q122's unweighted BFS. Edge weight = min
    // l_quantity over the multi-edges of each undirected pair (small exact
    // integers — no float distance anywhere). Six synchronous relaxation
    // rounds: dist' = min(dist, min over in-edges (dist[u] + w)) — the
    // frame after round i holds the exact min-cost over paths of ≤ i edges,
    // a well-defined quantity whether or not the graph has converged, so
    // Spark and the 6-round unrolled oracle agree by construction (no
    // fixpoint-detection contract needed). Scale shape = q122/q80's Pregel
    // form: per round one equi-join of the |reached|-bounded distance frame
    // (size-switched broadcast) against the checkpointed edge list + one
    // partial-aggregated min groupBy; lineage truncated per round
    // (NOTES.md). At 100 TB the distance frame co-partitions with the
    // edges on u instead of broadcasting — same switch as PageRank.
    q("q204_weighted_sssp",
      "6-round Bellman-Ford distances from node 1 (min-quantity edge weights)")(
      {
        def round(i: Int) =
          s"""d$i AS MATERIALIZED (
             |  SELECT node, CAST(min(d) AS BIGINT) AS d FROM (
             |    SELECT node, d FROM d${i - 1}
             |    UNION ALL
             |    SELECT e.v AS node, x.d + e.w AS d
             |    FROM d${i - 1} x JOIN e ON e.u = x.node)
             |  GROUP BY node)""".stripMargin
        s"""WITH raw AS (SELECT l_partkey % 9973 AS a, l_suppkey % 9973 AS b,
           |                    CAST(l_quantity AS BIGINT) AS q
           |             FROM lineitem WHERE l_quantity < 4),
           |e0 AS MATERIALIZED (SELECT least(a, b) AS u, greatest(a, b) AS v,
           |                           CAST(min(q) AS BIGINT) AS w
           |                    FROM raw WHERE a <> b GROUP BY 1, 2),
           |e AS MATERIALIZED (SELECT u, v, w FROM e0 UNION ALL SELECT v, u, w FROM e0),
           |d0 AS (SELECT CAST(1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS d),
           |${(1 to 6).map(round).mkString(",\n")}
           |SELECT node, d FROM d6 ORDER BY node""".stripMargin
      }
    ) { (s, dir) =>
      import s.implicits._
      val e0 = Tables.fanout(s, dir, "lineitem")
        .filter(col("l_quantity") < 4)
        .select((col("l_partkey") % 9973).as("a"), (col("l_suppkey") % 9973).as("b"),
          col("l_quantity").cast("long").as("q"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"),
          col("q"))
        .groupBy("u", "v").agg(min(col("q")).as("w"))
      val e = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v"), col("w")))
        .localCheckpoint(true) // re-joined every round
      // the distance frame is bounded by |V| of the edge list — count once
      val nV = e.select(col("u")).distinct().count()
      var dist = Seq((1L, 0L)).toDF("node", "d")
      for (_ <- 1 to 6) {
        val relaxed = e.join(
            maybeBroadcast(dist.select(col("node").as("u"), col("d")), nV), "u")
          .select(col("v").as("node"), (col("d") + col("w")).as("d"))
        dist = dist.unionAll(relaxed)
          .groupBy("node").agg(min(col("d")).as("d"))
          .localCheckpoint(true) // truncate per-round lineage
      }
      dist.orderBy("node")
    },

    // Link prediction by common-neighbor count — friend-of-friend
    // recommendation over q204's sparse part–supplier affinity graph: for
    // every NON-adjacent pair reachable in 2 hops, count distinct shared
    // neighbors and surface the top 20 (the "people you may know"
    // primitive). Shape: one symmetric-adjacency self-join on the middle
    // vertex (Σ deg(v)² candidate rows), a broadcast-able anti-join
    // against the existing edge set to drop already-connected pairs, then
    // a partial-aggregated distinct-count and a native top-k. The Σ deg²
    // term is the whole 100 TB story — the DENSE q111 graph's supplier
    // hubs (deg ≈ 600 at sf0.1) inflate it to ~4·10⁸ candidates (measured
    // 250 s), so this runs on q204's quantity-filtered graph where
    // exactness stays inside budget; at production scale the same lever
    // is explicit hub degree-capping, which turns the count into a
    // documented lower bound.
    q("q240_fof_recommendations",
      "top-20 non-adjacent pairs by common-neighbor count (friend-of-friend)")(
      """WITH raw AS (SELECT l_partkey % 9973 AS a, l_suppkey % 9973 AS b
        |             FROM lineitem WHERE l_quantity < 4),
        |e AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM raw WHERE a <> b),
        |adj AS (SELECT u AS x, v AS y FROM e UNION ALL SELECT v, u FROM e),
        |cand AS (SELECT a1.x AS u, a2.y AS w, a1.y AS via
        |         FROM adj a1 JOIN adj a2 ON a2.x = a1.y
        |         WHERE a1.x < a2.y),
        |cn AS (SELECT cand.u, cand.w, CAST(count(DISTINCT via) AS BIGINT) AS common_n
        |       FROM cand LEFT JOIN e ON e.u = cand.u AND e.v = cand.w
        |       WHERE e.u IS NULL
        |       GROUP BY cand.u, cand.w)
        |SELECT u, w, common_n FROM cn
        |ORDER BY common_n DESC, u, w LIMIT 20""".stripMargin
    ) { (s, dir) =>
      val e = Tables.fanout(s, dir, "lineitem")
        .filter(col("l_quantity") < 4)
        .select((col("l_partkey") % 9973).as("a"), (col("l_suppkey") % 9973).as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct()
        .localCheckpoint(true) // adjacency + the anti-join probe
      val adj = e.select(col("u").as("x"), col("v").as("y"))
        .unionAll(e.select(col("v").as("x"), col("u").as("y")))
      val cand = adj.select(col("x").as("cu"), col("y").as("via"))
        .join(adj.select(col("x").as("via"), col("y").as("cw")), Seq("via"))
        .filter(col("cu") < col("cw"))
      cand.join(e, cand("cu") === e("u") && cand("cw") === e("v"), "left_anti")
        .groupBy(col("cu").as("u"), col("cw").as("w"))
        .agg(countDistinct(col("via")).as("common_n"))
        .orderBy(col("common_n").desc, col("u"), col("w")).limit(20)
    },

    // Modularity — the gate that says whether detected communities are
    // REAL: Q = Σ_c [e_c/m − (d_c/2m)²], cleared to integers as 4m²·Q =
    // Σ_c [4m·e_c − d_c²] and published as q_micro by one truncating
    // division (edge counts and degree sums are exact ints — no float
    // anywhere). Four arms make it a measurement with a verdict:
    //  - planted/true: a synthesized caveman graph (every edge inside a
    //    40-node block) scored with its true blocks → Q near its
    //    theoretical 1 − Σ(d_c/2m)² ≈ 0.99 — the metric's positive pole;
    //  - planted/rnd and real/rnd: hash-random labels of the same
    //    cardinalities → Q ≈ 0, the null pole;
    //  - real/lp: q183's 3-round LP labels on the real co-occurrence
    //    graph score BELOW random (min-id LP grows giant labels, and the
    //    mod-9973 co-occurrence graph has no modular structure to find) —
    //    which is the AUDIT's honest verdict: a community gate keyed on
    //    Q > 0 would reject shipping these labels. Spec-pinned at both
    //    poles. Scale shape: LP rounds are q183's; the audit itself is
    //    two |V|-row label joins onto each edge list and a per-community
    //    rollup — community-cardinality work, never |V|².
    q("q282_modularity",
      "integer modularity: planted blocks ~0.99, random ~0, LP on the real graph below 0")(
      {
        import graft.functions.PortableHash.md5LongSql
        def h(tag: String) =
          md5LongSql(s"'$tag:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)")
        s"""${lpaSqlPrefix},
           |pe0 AS MATERIALIZED (
           |  SELECT DISTINCT least(u0, v0) AS u, greatest(u0, v0) AS v FROM (
           |    SELECT ${h("pu")} % 4000 AS u0,
           |           ((${h("pu")} % 4000) // 40) * 40 + ${h("pv")} % 40 AS v0
           |    FROM lineitem) WHERE u0 <> v0),
           |edges AS (SELECT 'real' AS g, u, v FROM e0
           |          UNION ALL SELECT 'planted', u, v FROM pe0),
           |mm AS (SELECT g, CAST(count(*) AS BIGINT) AS m FROM edges GROUP BY g),
           |deg AS (SELECT g, node, CAST(count(*) AS BIGINT) AS d FROM
           |          (SELECT g, u AS node FROM edges UNION ALL SELECT g, v FROM edges)
           |        GROUP BY g, node),
           |nc AS (SELECT CAST(count(DISTINCT lab) AS BIGINT) AS k FROM l3),
           |pn AS (SELECT DISTINCT node FROM
           |         (SELECT u AS node FROM pe0 UNION ALL SELECT v FROM pe0)),
           |labs AS (SELECT 'real' AS g, 'lp' AS lb, node, CAST(lab AS BIGINT) AS lab FROM l3
           |         UNION ALL
           |         SELECT 'real', 'rnd', node,
           |                ${md5LongSql("'md:' || CAST(node AS VARCHAR)")} % (SELECT k FROM nc)
           |         FROM l3
           |         UNION ALL SELECT 'planted', 'true', node, node // 40 FROM pn
           |         UNION ALL
           |         SELECT 'planted', 'rnd', node,
           |                ${md5LongSql("'md:' || CAST(node AS VARCHAR)")} % 100 FROM pn),
           |ce AS (SELECT a.g, a.lb, a.lab, CAST(count(*) AS BIGINT) AS ec
           |       FROM edges JOIN labs a ON a.g = edges.g AND a.node = edges.u
           |                  JOIN labs b ON b.g = a.g AND b.lb = a.lb
           |                             AND b.node = edges.v AND b.lab = a.lab
           |       GROUP BY a.g, a.lb, a.lab),
           |cd AS (SELECT labs.g, labs.lb, labs.lab, CAST(sum(deg.d) AS BIGINT) AS dc
           |       FROM labs JOIN deg ON deg.g = labs.g AND deg.node = labs.node
           |       GROUP BY labs.g, labs.lb, labs.lab),
           |sc AS (SELECT cd.g, cd.lb, CAST(count(*) AS BIGINT) AS n_comms,
           |              CAST(sum(4 * mm.m * coalesce(ce.ec, 0) - cd.dc * cd.dc) AS BIGINT)
           |                AS q_scaled,
           |              CAST(max(mm.m) AS BIGINT) AS m
           |       FROM cd LEFT JOIN ce ON ce.g = cd.g AND ce.lb = cd.lb AND ce.lab = cd.lab
           |            JOIN mm ON mm.g = cd.g
           |       GROUP BY cd.g, cd.lb)
           |SELECT g AS graph, lb AS labeling, n_comms, m, q_scaled,
           |       CAST((1000000 * q_scaled) // (4 * m * m) AS BIGINT) AS q_micro
           |FROM sc ORDER BY 1, 2""".stripMargin
      }
    ) { (s, dir) =>
      import graft.functions.PortableHash.md5Long
      val (e0, _, lab) = lpGraph(s, dir)
      def hl(tag: String) = md5Long(concat(lit(s"$tag:"),
        col("l_orderkey").cast("string"), lit(":"), col("l_linenumber").cast("string")))
      val pe = Tables.fanout(s, dir, "lineitem")
        .select((hl("pu") % 4000).as("u0"), (hl("pv") % 40).as("r"))
        .select(col("u0"), (expr("(u0 div 40) * 40") + col("r")).as("v0"))
        .filter(col("u0") =!= col("v0"))
        .select(least(col("u0"), col("v0")).as("u"), greatest(col("u0"), col("v0")).as("v"))
        .distinct()
      val edges = e0.select(lit("real").as("g"), col("u"), col("v"))
        .unionAll(pe.select(lit("planted").as("g"), col("u"), col("v")))
        .localCheckpoint(true) // label joins + degree + m
      val mm = edges.groupBy("g").agg(count(lit(1)).as("m"))
      val deg = edges.select(col("g"), col("u").as("node"))
        .unionAll(edges.select(col("g"), col("v").as("node")))
        .groupBy("g", "node").agg(count(lit(1)).as("d"))
      val nc = lab.agg(countDistinct(col("lab")).as("k"))
      val pn = edges.filter(col("g") === "planted")
        .select(col("u").as("node")).unionAll(
          edges.filter(col("g") === "planted").select(col("v").as("node")))
        .distinct()
      val rndLab = (c: org.apache.spark.sql.Column) =>
        md5Long(concat(lit("md:"), c.cast("string")))
      val labs = lab.select(lit("real").as("g"), lit("lp").as("lb"), col("node"),
          col("lab").cast("long").as("lab"))
        .unionAll(lab.crossJoin(broadcast(nc))
          .select(lit("real").as("g"), lit("rnd").as("lb"), col("node"),
            (rndLab(col("node")) % col("k")).as("lab")))
        .unionAll(pn.select(lit("planted").as("g"), lit("true").as("lb"), col("node"),
          expr("node div 40").as("lab")))
        .unionAll(pn.select(lit("planted").as("g"), lit("rnd").as("lb"), col("node"),
          (rndLab(col("node")) % 100).as("lab")))
        .localCheckpoint(true) // |V|-bounded (mod-9973/4000 vertex spaces)
      val ce = edges
        .join(labs.select(col("g"), col("lb"), col("node").as("u"), col("lab")), Seq("g", "u"))
        .join(labs.select(col("g"), col("lb"), col("node").as("v"), col("lab")),
          Seq("g", "lb", "v", "lab"))
        .groupBy("g", "lb", "lab").agg(count(lit(1)).as("ec"))
      val cd = labs.join(deg, Seq("g", "node")).groupBy("g", "lb", "lab")
        .agg(sum(col("d")).as("dc"))
      cd.join(ce, Seq("g", "lb", "lab"), "left").join(broadcast(mm), Seq("g"))
        .groupBy("g", "lb")
        .agg(count(lit(1)).as("n_comms"),
          sum(lit(4L) * col("m") * coalesce(col("ec"), lit(0L))
            - col("dc") * col("dc")).as("q_scaled"),
          max(col("m")).as("m"))
        .select(col("g").as("graph"), col("lb").as("labeling"), col("n_comms"), col("m"),
          col("q_scaled"),
          expr("cast((1000000 * q_scaled) div (4 * m * m) as bigint)").as("q_micro"))
        .orderBy("graph", "labeling")
    },

    // Critical-path / CPM longest path over a LAYERED task DAG — the
    // scheduling-analytics member the SSSP family lacks (q122/q204 are
    // min-plus; this is MAX-plus, and max-plus has no Dijkstra: the
    // correct distributed shape is level-synchronous relaxation, one
    // bounded round per layer). The DAG is synthesized with known
    // structure: 8 layers (p_partkey mod 8), every node in layer ℓ<7
    // fans out 2 hash-chosen edges into layer ℓ+1, node cost = centi
    // retail price. L(v) = w(v) + max over predecessors of L(u),
    // seeded at layer 0 — exactly 7 relaxation rounds, each ONE
    // equi-join on the frontier + ONE partial-aggregated max per
    // target, regardless of data size (the layer count bounds rounds,
    // not |V|). The report pins per-layer reachability and the
    // strictly-growing critical length; the argmax endpoint tiebreaks
    // to min node id so the row is deterministic.
    q("q330_critical_path",
      "CPM longest path over an 8-layer synthesized DAG: 7 max-plus relaxation rounds")({
      val md5e = "(('0x' || substr(md5('cp:' || CAST(n.pk AS VARCHAR) || " +
        "':' || CAST(ks.k AS VARCHAR)), 1, 15))::BIGINT)"
      val lcte = ("l0 AS (SELECT pk AS node, w AS l FROM nodes WHERE layer = 0)" +:
        (1 to 7).map(r =>
          s"l$r AS (SELECT e.v AS node, n.w + max(p.l) AS l " +
            s"FROM l${r - 1} p JOIN edges e ON e.u = p.node AND e.lv = $r " +
            s"JOIN nodes n ON n.pk = e.v GROUP BY e.v, n.w)")).mkString(",\n")
      val lall = (0 to 7).map(r => s"SELECT $r AS layer, node, l FROM l$r")
        .mkString(" UNION ALL ")
      s"""WITH nodes AS (SELECT p_partkey AS pk, p_partkey % 8 AS layer,
         |                      CAST(round(p_retailprice * 100) AS BIGINT) AS w
         |               FROM part),
         |cnt AS (SELECT layer, CAST(count(*) AS BIGINT) AS c FROM nodes GROUP BY layer),
         |edges AS (SELECT n.pk AS u, n.layer + 1 AS lv,
         |                 8 * ($md5e % c.c) + n.layer + 1 AS v
         |          FROM nodes n JOIN cnt c ON c.layer = n.layer + 1
         |          CROSS JOIN (SELECT unnest([1, 2]) AS k) ks
         |          WHERE n.layer < 7),
         |$lcte,
         |lall AS ($lall),
         |mx AS (SELECT layer, CAST(count(*) AS BIGINT) AS n_reached,
         |              CAST(max(l) AS BIGINT) AS max_len
         |       FROM lall GROUP BY layer),
         |nn AS (SELECT layer, CAST(count(*) AS BIGINT) AS n_nodes FROM nodes GROUP BY layer),
         |ep AS (SELECT a.layer, CAST(min(a.node) AS BIGINT) AS critical_node
         |       FROM lall a JOIN mx ON mx.layer = a.layer AND a.l = mx.max_len
         |       GROUP BY a.layer)
         |SELECT CAST(nn.layer AS BIGINT) AS layer, nn.n_nodes, mx.n_reached,
         |       mx.max_len, ep.critical_node
         |FROM nn JOIN mx USING (layer) JOIN ep USING (layer) ORDER BY nn.layer""".stripMargin
    }) { (sp, dir) =>
      import graft.functions.PortableHash.md5Long
      val nodes = Tables(sp, dir, "part")
        .select(col("p_partkey").as("pk"), (col("p_partkey") % 8).as("layer"),
          expr("cast(round(p_retailprice * 100) as bigint)").as("w"))
        .cache() // edge build + 7 relaxation joins + the per-layer report
      val cnt = nodes.groupBy("layer").agg(count(lit(1)).as("c"))
      val edges = nodes.filter(col("layer") < 7)
        .join(broadcast(cnt.select((col("layer") - 1).as("layer"), col("c"))), Seq("layer"))
        .select(col("pk").as("u"), (col("layer") + 1).as("lv"), col("c"),
          explode(array(lit(1), lit(2))).as("k"))
        .select(col("u"), col("lv"),
          (lit(8) * (md5Long(concat(lit("cp:"), col("u").cast("string"), lit(":"),
            col("k").cast("string"))) % col("c")) + col("lv")).as("v"))
        .cache() // 7 per-round frontier joins
      var frontier = nodes.filter(col("layer") === 0)
        .select(col("pk").as("node"), col("w").as("l"))
      var all = frontier.select(lit(0L).as("layer"), col("node"), col("l"))
      for (r <- 1 to 7) {
        frontier = frontier
          .join(edges.filter(col("lv") === r), col("node") === col("u"))
          .groupBy(col("v")).agg(max(col("l")).as("ml"))
          .join(nodes.select(col("pk").as("v"), col("w")), Seq("v"))
          .select(col("v").as("node"), (col("w") + col("ml")).as("l"))
          // round-11 (guide §2.4/§3.3): truncate per-layer lineage. The
          // layer-r frontier is |layer|-bounded, but WITHOUT the eager
          // checkpoint each later layer's plan (and all three report legs
          // below, which reference `all` twice and `mx` twice) re-plans and
          // re-executes the whole prefix chain — the executed query ran 352
          // Spark jobs (~220 s of summed job time behind 169 broadcast
          // builds) for 8 bounded relaxation rounds. Checkpointing each
          // layer makes every round one join+aggregate job: 44 jobs,
          // 9.7 → 2.6 s measured, identical output.
          .localCheckpoint(true)
        all = all.unionByName(frontier.select(lit(r.toLong).as("layer"), col("node"), col("l")))
      }
      val mx = all.groupBy("layer")
        .agg(count(lit(1)).as("n_reached"), max(col("l")).as("max_len"))
      val nn = nodes.groupBy("layer").agg(count(lit(1)).as("n_nodes"))
        .select(col("layer").cast("long").as("layer"), col("n_nodes"))
      val ep = all.join(mx.select(col("layer"), col("max_len").as("l")), Seq("layer", "l"))
        .groupBy("layer").agg(min(col("node")).as("critical_node"))
      nn.join(mx.select(col("layer").cast("long").as("layer"), col("n_reached"),
          col("max_len")), Seq("layer"))
        .join(ep.select(col("layer").cast("long").as("layer"), col("critical_node")),
          Seq("layer"))
        .orderBy("layer")
    },

    // q350: Luby's maximal independent set — the classic symmetry-breaking
    // primitive the graph family still lacked (CC partitions, k-core
    // filters, label-prop clusters; MIS SELECTS a mutually non-adjacent
    // cover — the scheduling/parallel-matching building block). Graph:
    // custkeys 1..N with two hash-edges per node (avg degree ~4).
    // Luby round: an active node enters the set iff its hash PRIORITY
    // beats every active neighbor's ((p, id) lexicographic — deterministic
    // symmetry breaking, no randomness to disagree on); winners and their
    // neighborhoods deactivate. 8 unrolled rounds reach the empty active
    // set at both fixture scales, and the oracle unrolls the same rounds.
    // The output carries per-round selection/active counts AND the two
    // correctness invariants as columns — independence violations (edges
    // inside the set) and maximality violations (nodes outside the set
    // with no set neighbor), both constant 0 — so the hash check proves
    // MIS-ness, not just engine agreement. Scale shape: each round is two
    // equi-joins on the edge list + anti-joins, all keyed by vertex; work
    // per round shrinks with the active set (Luby kills a constant
    // fraction of EDGES per round in expectation — O(log m) rounds);
    // per-round lineage is localCheckpoint-truncated (NOTES law).
    q("q350_luby_mis",
      "Luby's maximal independent set: 8 hash-priority rounds, invariants carried")(
      LubyMis.oracleSql
    ) { (s, dir) => LubyMis(s, dir) }
  )
}

/** q350's shared machinery: one SQL template per Luby round and the
  * matching Spark fold (the GradientBoost pattern), so the round
  * semantics — strict (p, id) dominance, winner+neighborhood removal —
  * cannot drift between engines. */
private[operators] object LubyMis {
  import graft.functions.PortableHash.{md5Long, md5LongSql}
  import org.apache.spark.sql.{DataFrame, SparkSession}

  val rounds = 8

  private def roundSql(i: Int): String = {
    val a = s"a$i"; val n = i + 1
    s"""s$i AS MATERIALIZED (
       |  SELECT a.v, a.p FROM $a a
       |  LEFT JOIN (
       |    SELECT DISTINCT e.v FROM e2 e
       |    JOIN $a au ON au.v = e.u
       |    JOIN $a av ON av.v = e.v
       |    WHERE au.p > av.p OR (au.p = av.p AND e.u > e.v)) b ON b.v = a.v
       |  WHERE b.v IS NULL),
       |rm$i AS MATERIALIZED (SELECT DISTINCT e.v FROM e2 e JOIN s$i s ON s.v = e.u),
       |a$n AS MATERIALIZED (
       |  SELECT a.v, a.p FROM $a a
       |  LEFT JOIN s$i s ON s.v = a.v
       |  LEFT JOIN rm$i r ON r.v = a.v
       |  WHERE s.v IS NULL AND r.v IS NULL)""".stripMargin
  }

  val oracleSql: String = {
    val body = (0 until rounds).map(roundSql).mkString(",\n")
    val statRows = (0 until rounds).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS round,
         |       (SELECT CAST(count(*) AS BIGINT) FROM s$i) AS n_selected,
         |       (SELECT CAST(count(*) AS BIGINT) FROM a${i + 1}) AS n_active_after
         |FROM (VALUES (1)) t(one)""".stripMargin
    }.mkString("\nUNION ALL\n")
    val selUnion = (0 until rounds).map(i => s"SELECT v FROM s$i")
      .mkString(" UNION ALL ")
    s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer),
       |nodes AS (SELECT c_custkey AS v FROM customer),
       |eraw AS (
       |  SELECT v AS u,
       |         1 + ${md5LongSql("'mis:e:' || CAST(v AS VARCHAR) || ':' || CAST(j AS VARCHAR)")} % (SELECT n FROM nn) AS v2
       |  FROM nodes, (SELECT unnest([1, 2]) AS j)),
       |eu AS MATERIALIZED (SELECT DISTINCT LEAST(u, v2) AS u, GREATEST(u, v2) AS v
       |       FROM eraw WHERE u <> v2),
       |e2 AS MATERIALIZED (SELECT u, v FROM eu UNION ALL SELECT v AS u, u AS v FROM eu),
       |a0 AS MATERIALIZED (SELECT v, ${md5LongSql("'mis:p:' || CAST(v AS VARCHAR)")} AS p
       |       FROM nodes),
       |$body,
       |mis AS MATERIALIZED ($selUnion),
       |chk AS (
       |  SELECT
       |    (SELECT CAST(count(*) AS BIGINT) FROM mis) AS mis_size,
       |    (SELECT CAST(count(*) AS BIGINT) FROM eu
       |     WHERE eu.u IN (SELECT v FROM mis)
       |       AND eu.v IN (SELECT v FROM mis)) AS indep_violations,
       |    (SELECT CAST(count(*) AS BIGINT) FROM nodes nd
       |     WHERE nd.v NOT IN (SELECT v FROM mis)
       |       AND NOT EXISTS (SELECT 1 FROM e2 e JOIN mis m ON m.v = e.u
       |                       WHERE e.v = nd.v)) AS max_violations),
       |st AS ($statRows)
       |SELECT st.round, st.n_selected, st.n_active_after,
       |       chk.mis_size, chk.indep_violations, chk.max_violations
       |FROM st CROSS JOIN chk
       |ORDER BY st.round""".stripMargin
  }

  def apply(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val nodes = Tables(s, dir, "customer").select(col("c_custkey").as("v"))
    val nn = nodes.agg(count(lit(1)).cast("long").as("n"))
    val eraw = nodes.crossJoin(broadcast(nn))
      .select(col("v").as("u"), col("n"),
        explode(array(lit(1), lit(2))).as("j"))
      .select(col("u"),
        (lit(1) + md5Long(concat(lit("mis:e:"), col("u").cast("string"),
          lit(":"), col("j").cast("string"))) % col("n")).as("v2"))
    val eu = eraw.filter(col("u") =!= col("v2"))
      .select(least(col("u"), col("v2")).as("u"),
        greatest(col("u"), col("v2")).as("v"))
      .distinct()
      .localCheckpoint(true) // invariant checks + symmetrized copy
    val e2 = eu.unionByName(eu.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(true) // re-joined every round
    var active = nodes.select(col("v"),
      md5Long(concat(lit("mis:p:"), col("v").cast("string"))).as("p"))
      .localCheckpoint(true)
    var sel = Vector.empty[DataFrame]
    var stats = Vector.empty[DataFrame]
    for (i <- 0 until rounds) {
      val au = active.select(col("v").as("u"), col("p").as("pu"))
      val blockers = e2.join(au, Seq("u"))
        .join(active.select(col("v"), col("p").as("pv")), Seq("v"))
        .filter(col("pu") > col("pv") ||
          (col("pu") === col("pv") && col("u") > col("v")))
        .select("v").distinct()
      val sI = active.join(blockers, Seq("v"), "left_anti")
        .localCheckpoint(true) // removal leg + stats leg + mis union
      val removed = e2.join(sI.select(col("v").as("u")), Seq("u"))
        .select("v").distinct()
      active = active
        .join(sI.select("v"), Seq("v"), "left_anti")
        .join(removed, Seq("v"), "left_anti")
        .localCheckpoint(true)
      sel = sel :+ sI.select("v")
      stats = stats :+ sI.agg(count(lit(1)).cast("long").as("n_selected"))
        .withColumn("round", lit(i.toLong))
        .crossJoin(broadcast(
          active.agg(count(lit(1)).cast("long").as("n_active_after"))))
    }
    val mis = sel.reduce(_ unionByName _).localCheckpoint(true)
    val indep = eu
      .join(mis.select(col("v").as("u")), Seq("u"), "left_semi")
      .join(mis, Seq("v"), "left_semi")
      .agg(count(lit(1)).cast("long").as("indep_violations"))
    val covered = e2.join(mis.select(col("v").as("u")), Seq("u"), "left_semi")
      .select("v").distinct()
    val maxv = nodes.join(mis, Seq("v"), "left_anti")
      .join(covered, Seq("v"), "left_anti")
      .agg(count(lit(1)).cast("long").as("max_violations"))
    val chk = mis.agg(count(lit(1)).cast("long").as("mis_size"))
      .crossJoin(broadcast(indep)).crossJoin(broadcast(maxv))
    stats.reduce(_ unionByName _)
      .crossJoin(broadcast(chk))
      .select(col("round"), col("n_selected"), col("n_active_after"),
        col("mis_size"), col("indep_violations"), col("max_violations"))
      .orderBy("round")
  }
}
