package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Alternating large-star/small-star connected components (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * extreme-diameter upgrade to [[DedupQueries]]' min-label propagation:
  * label propagation needs O(diameter) rounds, star contraction converges
  * in O(log² n) rounds regardless of diameter, with the same per-round
  * plan shape (one shuffle groupBy over edges).
  *
  * Each round rewrites the edge set:
  *  - large-star: per node u, link every neighbor v > u to m = min(N(u) ∪ u)
  *  - small-star: per node u, link every neighbor v ≤ u (v ≠ m) to m
  * Fixpoint: every edge is (node → component-minimum); the edge set itself
  * is the (node, root) labeling for all non-root members.
  *
  * Near-dup graphs are shallow, so q34g keeps propagation as its primary
  * (fewer rounds in practice there); StarContractionSpec proves this
  * implementation produces the IDENTICAL labeling on the fixture's real
  * edge set and on adversarial long-path graphs where propagation needs
  * 10× the rounds.
  */
object StarContraction {

  /** Connected components of an undirected edge list `edges(d1, d2)`.
    * Returns (doc_id, component) for every non-isolated vertex, component =
    * the minimum vertex id of its component (the q34g contract). */
  def components(edges: DataFrame): DataFrame = {
    // canonical direction u > v (parent candidates always smaller).
    // localCheckpoint (eager) — NOT cache — because an iterative rewrite
    // must truncate lineage each round: a cache keeps the full logical
    // plan, which quadruples per round (two unions + two groupings
    // re-reference it) and blows past any plan-size budget by round ~8;
    // checkpointing makes every round's plan O(1). Production swaps this
    // for reliable checkpointing on the same seam.
    var e = edges
      .select(greatest(col("d1"), col("d2")).as("u"), least(col("d1"), col("d2")).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint(true)
    var converged = false
    while (!converged) {
      // Round-11 rewrite (guide §2.3 "aggregate before you shuffle", §2.5
      // skew): both star phases previously built per-vertex neighbor SETS
      // (collect_set + explode) — an object hash aggregate whose hot-vertex
      // arrays are exactly the skew a contraction round creates (the root
      // of a big star collects its whole component). The min-label join
      // form below computes the same links with a PARTIAL-AGGREGATED min
      // and one equi-join per phase — no arrays, map-side combine, no
      // single-key blowup at any scale.
      // large-star: link every strictly-larger neighbor v of u to
      // m(u) = min(N(u) ∪ {u}) (min over BOTH directions, u folded in)
      val nbrs = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val mL = nbrs.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val ls = nbrs.filter(col("v") > col("u"))
        .join(mL, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(e) // keep existing (larger, smaller) links so stars stay attached
        .filter(col("u") =!= col("v")).distinct()
      // small-star: over ≤-neighbors, link every neighbor AND u itself to
      // the group minimum (the original emitted vs ∪ {u} → m, w ≠ m)
      val nb2 = ls.select(col("u"), col("v"))
        .union(ls.select(col("v").as("u"), col("u").as("v")))
        .filter(col("v") <= col("u"))
      val mS = nb2.groupBy("u").agg(min(col("v")).as("m"))
      val ss = nb2.join(mS, "u")
        .select(col("v").as("w"), col("m"))
        .union(mS.select(col("u").as("w"), col("m")))
        .filter(col("w") =!= col("m"))
        .select(col("w").as("u"), col("m").as("v"))
        .distinct().localCheckpoint(true)
      // both sides are distinct: equal counts + empty one-sided diff ⇒ equal
      converged = ss.count() == e.count() && ss.except(e).isEmpty
      e = ss
    }
    // members carry (member → root) edges; roots label themselves (a root
    // is a v that never occurs as a u at fixpoint)
    val roots = e.select(col("v")).distinct()
      .join(e.select(col("u").as("v")).distinct(), Seq("v"), "left_anti")
    e.select(col("u").as("doc_id"), col("v").as("component"))
      .union(roots.select(col("v").as("doc_id"), col("v").as("component")))
      .distinct()
  }
}
