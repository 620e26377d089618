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

  val all: Seq[Q] = Seq(

    q("q80_pagerank", "5-iteration integer-arithmetic PageRank over the customer→supplier graph")(
      pagerankSql
    ) { (s, dir) =>
      val edges = Tables.fanout(s, dir, "orders")
        .join(Tables.fanout(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey").cast("string")).as("src"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
        .distinct()
        .cache() // read 4× (outdeg, contribBase, and both node legs)
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst"))).distinct().cache()
      val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      // (src, dst, deg) is re-joined every iteration — materialize it once
      val contribBase = edges.join(outdeg, "src").cache()
      var rank = nodes.select(col("node").as("rnode"), lit(1000000L).as("pr"))
      for (_ <- 1 to 5) {
        // rank is |nodes|-sized (tiny next to edges) — broadcast it so the
        // cached edge frame never reshuffles; the dst groupBy collapses
        // map-side (|dst| distinct keys)
        val m = contribBase.join(broadcast(rank), col("src") === col("rnode"))
          .select(col("dst").as("node"), expr("pr div deg").as("contrib"))
          .groupBy("node").agg(sum(col("contrib")).as("m"))
        rank = nodes.join(broadcast(m), Seq("node"), "left")
          .select(col("node").as("rnode"),
            expr("150000L + (850000L * coalesce(m, 0L)) div 1000000L").as("pr"))
          .localCheckpoint(true) // truncate lineage per round (NOTES.md)
      }
      rank.select(col("rnode").as("node"), col("pr").as("rank"))
        .orderBy(col("rank").desc, col("node")).limit(20)
    }
  )
}
