package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers (SCALE.md): when a grouping key is hot enough
  * that one shuffle partition drowns (AQE's skew-join split only covers
  * joins), the classic fix is two-phase aggregation through a salted key.
  *
  * Only ALGEBRAIC aggregates compose across the two phases; this helper
  * exposes the common ones (count/sum/min/max) — the same set the engine's
  * own sketches (MinHash element-min, SimHash signed sums) rely on, which is
  * what makes every sketch here hot-key-safe by construction.
  */
object SkewTools {

  /** Two-phase salted aggregation: phase 1 groups by (keys..., salt) with
    * `salt = pmod(hash(all columns), buckets)` spreading each hot key over
    * `buckets` partitions and combining map-side; phase 2 re-aggregates the
    * per-salt partials by the true keys.
    *
    * @param aggs (outputName, phase1Agg, phase2Combine) triples, e.g.
    *             ("n", count(lit(1)), sum(_)) — combine receives the
    *             phase-1 column.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
      aggs: Seq[(String, Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(buckets)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head._2.as(s"__p_${aggs.head._1}"),
        aggs.tail.map(a => a._2.as(s"__p_${a._1}")): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(aggs.head._3(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map(a => a._3(col(s"__p_${a._1}")).as(a._1)): _*)
  }

  /** Salted equi-join for hot-KEY skew on the FACT side of a fact⋈dim
    * join (the manual form of AQE's skew-join split, for when the skew is
    * known up front or AQE is unavailable — e.g. the dim is too big to
    * broadcast but a hot fact key still drowns one shuffle partition):
    * fact rows salt deterministically into `buckets` sub-keys via a hash
    * of `saltOn` (any column(s) that vary WITHIN a key — never random, so
    * reruns and retries agree), and the dim side replicates ×`buckets` so
    * every (key, salt) pair finds its match. The output is EXACTLY the
    * plain join's rows — salting only splits each hot key's shuffle
    * partition `buckets` ways at the cost of a ×`buckets` dim shuffle. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltOn: Column, buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val saltedFact = fact.withColumn("__salt", pmod(hash(saltOn), lit(buckets)))
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(repDim, Seq(key, "__salt")).drop("__salt")
  }
}
