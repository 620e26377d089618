package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Bounds checks for the operators the oracle can only rows-check:
  * approx_count_distinct accuracy (B11) and ANN recall vs the brute-force
  * baseline (q35c LSH, q35e IVF). */
class ApproxAndRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("B11 approx_count_distinct within declared 2% rsd (allow 4 sigma)") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables(spark, dir, "lineitem")
    val rows = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("exact"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx"))
      .collect()
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.08,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("q41b histogram percentiles within one bin width of exact; native GK in rank window") {
    import org.apache.spark.sql.functions._
    val exact = graft.Tables(spark, dir, "lineitem").groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, array(0.25, 0.50, 0.75))").as("e"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // the registry row (round-11: width-4 interpolated histogram, hash-
    // verified by the oracle) — value error ≤ the bin width by construction
    val approx = graft.SparkEntry.queries("q41b_approx_percentiles")(spark, dir).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val e = exact(r.getString(0))
      Seq(1, 2, 3).foreach { i =>
        assert(math.abs(r.getDouble(i) - e(i - 1)) <= 4.0 + 1e-9,
          s"p${Seq(25, 50, 75)(i - 1)} off by more than the bin width: $r vs $e")
      }
    }
    // the native GK sketch the row replaced stays covered here: accuracy
    // 1e4 ⇒ rank error ≤ n/1e4; assert the far looser ±5-centile window so
    // the test is robust to partitioning-dependent merge order
    val win = graft.Tables(spark, dir, "lineitem").groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, array(0.20, 0.30, 0.45, 0.55, 0.70, 0.80))").as("e"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val gk = graft.Tables(spark, dir, "lineitem").groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 10000)").as("qs"))
      .select(col("l_returnflag"),
        col("qs")(0).as("q25"), col("qs")(1).as("q50"), col("qs")(2).as("q75"))
      .collect()
    gk.foreach { r =>
      val e = win(r.getString(0))
      assert(r.getDouble(1) >= e(0) && r.getDouble(1) <= e(1), s"GK q25 out of window: $r")
      assert(r.getDouble(2) >= e(2) && r.getDouble(2) <= e(3), s"GK q50 out of window: $r")
      assert(r.getDouble(3) >= e(4) && r.getDouble(3) <= e(5), s"GK q75 out of window: $r")
    }
  }

  /** recall@k of an ANN result against the brute-force top-k. */
  private def recallAt(ann: Map[Long, Seq[Long]], exact: Map[Long, Seq[Long]], k: Int): Double = {
    val scores = exact.keys.toSeq.map { q =>
      val e = exact(q).take(k).toSet
      val a = ann.getOrElse(q, Seq.empty).take(k).toSet
      if (e.isEmpty) 1.0 else (e & a).size.toDouble / e.size
    }
    scores.sum / scores.size
  }

  private def neighbors(name: String, atDir: String = dir): Map[Long, Seq[Long]] =
    SparkEntry.queries(name)(spark, atDir)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq }

  test("ANN recall vs brute force is meaningfully better than chance") {
    val exact = neighbors("q35_cosine_topk")
    val lsh = neighbors("q35c_lsh_search")
    val ivf = neighbors("q35e_ivf_search")
    val rLsh = recallAt(lsh, exact, 3)
    val rIvf = recallAt(ivf, exact, 3)
    // 500 candidates, top-3: chance recall ≈ 3/500. The ANN paths must do
    // far better while scanning a fraction of the corpus.
    assert(rLsh > 0.2 && rIvf > 0.2, s"LSH recall@3 = $rLsh, IVF recall@3 = $rIvf")
  }

  test("filtered IVF search honors the predicate and keeps useful recall") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q35m_filtered_ivf_search")(spark, dir).collect()
    assert(rows.nonEmpty)
    // pre-filter contract: every returned candidate satisfies the predicate
    rows.foreach(r => assert(r.getLong(1) % 7 == 0, s"predicate violated: $r"))
    // recall vs the brute-force top-3 over the FILTERED corpus
    val v = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
      .withColumn("nrm", sqrt(aggregate(zip_with(col("e"), col("e"), _ * _), lit(0.0), _ + _)))
    val qs = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cs").desc, col("cid"))
    val exact = v.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("cid"), col("e").as("ce"), col("nrm").as("cn"))
      .join(broadcast(qs), col("cid") =!= col("qid"))
      .withColumn("cs", aggregate(zip_with(col("qe"), col("ce"), _ * _), lit(0.0), _ + _)
        / (col("qn") * col("cn")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("qid", "cid", "rn").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq }
    val ann = rows.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq }
    val r = recallAt(ann, exact, 3)
    assert(r > 0.5, s"filtered IVF recall@3 vs filtered brute force = $r")
  }

  test("k-means IVF lifts recall over fixed-seed IVF (deterministic Lloyd)") {
    val exact = neighbors("q35_cosine_topk")
    val seedIvf = neighbors("q35e_ivf_search")
    val kmeans = neighbors("q35g_kmeans_ivf_search")
    val rSeed = recallAt(seedIvf, exact, 3)
    val rKm = recallAt(kmeans, exact, 3)
    // measured on the fixture: seed IVF 0.833, k-means IVF 0.9 — the Lloyd
    // refinement must keep a strictly better-than-seed, ≥0.85 recall
    assert(rKm >= 0.85, s"k-means IVF recall@3 = $rKm")
    assert(rKm >= rSeed, s"k-means ($rKm) fell below seed IVF ($rSeed)")
  }

  test("PQ ADC search recall is far above chance despite 32:1 compression") {
    // PQ is graded against its own metric (L2): the ADC top-3 from 64-bit
    // codes vs the exact-L2 top-3 over raw vectors. Chance ≈ 3/500; the
    // fixture measures 0.2 recall@3 (0.41 at recall@10) — assert a floor
    // ~25× above chance.
    import org.apache.spark.sql.functions._
    val v = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
    val qs = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d"), col("cid"))
    val exact = v.select(col("vec_id").as("cid"), col("e").as("ce"))
      .join(broadcast(qs), col("cid") =!= col("qid"))
      .withColumn("d", aggregate(zip_with(col("qe"), col("ce"),
        (a, b) => (a - b) * (a - b)), lit(0.0), _ + _))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("qid", "cid", "rn").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq }
    val pq = neighbors("q35i_pq_adc_search")
    val r = recallAt(pq, exact, 3)
    assert(r > 0.15, s"PQ ADC recall@3 vs exact L2 = $r")

    // OPQ-lite (signed-permutation rotation) holds the same floor. On this
    // synthetic corpus the rotation is recall-neutral (fixture: 0.27 vs
    // 0.20 at sf0.01, 0.23 vs 0.27 at sf0.1) — the variance is already
    // uniform across dims by construction, so there is nothing for the
    // rotation to rebalance; the test pins the exactness contract (an
    // orthogonal rotation must not DEGRADE the quantizer below the flat
    // floor), not a gain.
    val opq = neighbors("q35l_opq_adc_search")
    val rOpq = recallAt(opq, exact, 3)
    assert(rOpq > 0.15, s"OPQ ADC recall@3 vs exact L2 = $rOpq")
  }

  /** Exact L2 top-3 per query (vec_id < 10) for `atDir`. */
  private def exactL2Top3(atDir: String): Map[Long, Seq[Long]] = {
    import org.apache.spark.sql.functions._
    val v = graft.Tables(spark, atDir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
    val qs = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d"), col("cid"))
    v.select(col("vec_id").as("cid"), col("e").as("ce"))
      .join(broadcast(qs), col("cid") =!= col("qid"))
      .withColumn("d", aggregate(zip_with(col("qe"), col("ce"),
        (a, b) => (a - b) * (a - b)), lit(0.0), _ + _))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("qid", "cid", "rn").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq }
  }

  test("IVF-PQ with exact re-rank holds the 0.8 recall budget at BOTH scales") {
    // the composed index (coarse routing + residual codes + adaptive
    // max(100, 8√n)-deep exact re-rank) must beat flat PQ by a wide margin
    // AND hold its recall budget as the corpus grows — the round-5 fixed
    // 100-deep shortlist held 0.83 at sf0.01 but sagged to 0.73 at sf0.1,
    // which is the number a real user gets; the adaptive depth restores it.
    for (atDir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val exact = exactL2Top3(atDir)
      val ivfpq = neighbors("q35j_ivfpq_search", atDir)
      val r = recallAt(ivfpq, exact, 3)
      assert(r >= 0.8, s"IVF-PQ re-ranked recall@3 vs exact L2 at $atDir = $r")
    }

    // SQ8 (8 bits/dim) must be near-lossless: fixture measures 1.0 at
    // sf0.01, 0.967 at sf0.1
    val sq8 = neighbors("q35k_sq8_search")
    val rSq = recallAt(sq8, exactL2Top3(dir), 3)
    assert(rSq >= 0.9, s"SQ8 recall@3 vs exact L2 = $rSq")
  }

  test("q137 kNN self-join probe-ball recall vs exact all-pairs cosine") {
    // exact top-3 per vector, computed in-driver (500×500 cosines)
    val vecs = graft.Tables(spark, dir, "embeddings")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val norms = vecs.map { case (id, v) => id -> math.sqrt(v.map(x => x * x).sum) }
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (vecs(a), vecs(b))
      var s = 0.0; var i = 0
      while (i < va.length) { s += va(i) * vb(i); i += 1 }
      s / (norms(a) * norms(b))
    }
    val ids = vecs.keys.toSeq
    val exact = ids.map { q =>
      q -> ids.filter(_ != q).map(o => (-cos(q, o), o)).sorted.take(3).map(_._2)
    }.toMap
    val approx = SparkEntry.queries("q137_knn_join")(spark, dir)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    val hits = exact.toSeq.map { case (q, ex) =>
      approx.getOrElse(q, Seq.empty).count(ex.toSet).toDouble / 3 }
    val recall = hits.sum / hits.size
    // radius-2 probe ball over 8 sign planes: fixture measures 0.343 —
    // ~57× the 3/499 chance floor; bound loosely for stability
    assert(recall > 0.25, s"kNN-join recall@3 = $recall")
  }

  test("q187 KMV rollup: merged sketch equals direct; native HLL union law; errors bounded") {
    import org.apache.spark.sql.functions._
    import graft.functions.PortableHash.{md5Long, kmvEstimateSql}
    val ev = graft.Tables(spark, dir, "events")
    // KMV closure law: the registry row merges per-hour sketches; the
    // direct single-pass sketch over raw rows must agree EXACTLY (the
    // bottom-k of a union is drawn from the cells' own bottom-k lists)
    val kmv = udaf(new graft.functions.KmvAggregator(128))
    val directKmv = ev
      .select(col("event_type"),
        md5Long(concat(lit("u:"), col("user_id").cast("string"))).as("h"))
      .groupBy("event_type").agg(kmv(col("h")).as("m"))
      .select(col("event_type"),
        expr(kmvEstimateSql("size(m)", "element_at(m, 128)", 128)).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rolled = SparkEntry.queries("q187_kmv_rollup")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rolled.keySet == directKmv.keySet)
    rolled.foreach { case (t, est) =>
      assert(est == directKmv(t), s"$t: merged $est != direct ${directKmv(t)}")
    }
    // native HLL surface the row replaced (round-11): union of per-hour
    // sketches must equal the single-pass sketch EXACTLY — HLL updates/
    // unions are register-wise max, so any partition of the input yields
    // identical registers
    val directHll = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14))).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rolledHll = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolledHll.keySet == directHll.keySet)
    rolledHll.foreach { case (t, est) =>
      assert(est == directHll(t), s"$t: HLL merged $est != direct ${directHll(t)}")
    }
    // accuracy vs exact: KMV k=128 rsd ≈ 1/√126 ≈ 8.9% (allow 4σ);
    // HLL lgK=14 rsd ≈ 0.8% (allow 4σ)
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rolled.foreach { case (t, est) =>
      assert(math.abs(est.toDouble - exact(t)) / exact(t) < 0.36,
        s"$t: KMV est=$est exact=${exact(t)}")
    }
    rolledHll.foreach { case (t, est) =>
      assert(math.abs(est.toDouble - exact(t)) / exact(t) < 0.035,
        s"$t: HLL est=$est exact=${exact(t)}")
    }
  }

  test("q11b portable KMV distinct estimate within 4 sigma of exact") {
    import org.apache.spark.sql.functions._
    // k=256 ⇒ rel. σ ≈ 1/√254 ≈ 6.3%; allow 4σ = 25%
    val exact = graft.Tables(spark, dir, "lineitem").groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = SparkEntry.queries("q11b_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (f, e) =>
      assert(math.abs(e.toDouble - exact(f)) / exact(f) < 0.25,
        s"$f: est=$e exact=${exact(f)}")
    }
  }
}
