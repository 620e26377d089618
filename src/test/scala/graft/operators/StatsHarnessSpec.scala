package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the round-6 statistical-harness additions — the
  * oracle proves Spark ≡ DuckDB on these, but the DISCRIMINATION claims
  * (robust estimator resists contamination, quiet arm stays quiet,
  * conformal coverage lands at 1−α) live here so a fixture regeneration
  * or a constant drift can't silently hollow them out. */
class StatsHarnessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("q265 Theil-Sen: outlier contamination moves OLS far more than the median slope") {
    val rows = SparkEntry.queries("q265_theil_sen")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(3), r.getLong(4))).toMap
    val series = rows.keys.map(_._2).toSeq.distinct
    assert(series.size >= 3)
    var tsShift = 0L; var olsShift = 0L
    series.foreach { et =>
      val (tsC, olsC) = rows(("clean", et))
      val (tsO, olsO) = rows(("outlier", et))
      val dTs = math.abs(tsO - tsC); val dOls = math.abs(olsO - olsC)
      assert(dTs <= dOls, s"$et: Theil-Sen shifted $dTs > OLS $dOls under contamination")
      tsShift += dTs; olsShift += dOls
    }
    // 5% x10 outliers: the pairwise-slope median barely moves, OLS flies
    assert(olsShift > 3 * tsShift,
      s"contamination resistance collapsed: ts=$tsShift ols=$olsShift")
  }

  test("q266 Benford: synthetic Benford arm quiet, totalprice arm fires") {
    val rows = SparkEntry.queries("q266_benford_audit")(spark, dir).collect()
    assert(rows.length == 18) // 2 arms x full 9-digit spine
    val byArm = rows.groupBy(_.getString(0))
      .map { case (a, rs) => a -> (rs.head.getLong(5), rs.head.getLong(6)) }
    val (chiSyn, sigSyn) = byArm("benford_synth")
    val (chiTp, sigTp) = byArm("totalprice")
    assert(sigSyn == 0L && chiSyn < 15507000L, s"synthetic arm fired: chi2_micro=$chiSyn")
    assert(sigTp == 1L && chiTp > 10L * 15507000L, s"totalprice arm too quiet: $chiTp")
  }

  test("q267 conformal coverage lands at 1-alpha at both fixture scales") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = SparkEntry.queries("q267_conformal")(spark, d).collect()
        .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(5))).toMap
      val (q5, cov5) = rows(5L)
      val (q10, cov10) = rows(10L)
      // marginal guarantee >= 1-alpha; finite-sample noise a few permille
      assert(cov5 >= 930 && cov5 <= 985, s"$d alpha=5%: coverage $cov5")
      assert(cov10 >= 880 && cov10 <= 940, s"$d alpha=10%: coverage $cov10")
      assert(q5 >= q10, s"$d: qhat not monotone in confidence: $q5 < $q10")
    }
  }

  test("q268 Markov holdout: planted self-loops learned, real arm stays at modal share") {
    val rows = SparkEntry.queries("q268_markov_holdout")(spark, dir).collect()
      .filter(_.getString(1) == "__all")
      .map(r => r.getString(0) -> r.getLong(6)).toMap
    assert(rows("planted") >= 700, s"planted arm too weak: ${rows("planted")}")
    // 5 independent types: top-1 accuracy must hover near the 200-permille modal share
    assert(rows("real") >= 120 && rows("real") <= 320, s"real arm off modal share: ${rows("real")}")
    assert(rows("planted") >= rows("real") + 300)
  }

  test("q269 k-fold CV: fold MAEs agree within a few percent (spread row)") {
    val rows = SparkEntry.queries("q269_kfold_cv")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (_, spread) = rows(-1L)
    val maes = rows.filter(_._1 >= 0).values.map(_._2)
    assert(maes.size == 5 && maes.forall(_ > 0))
    assert(spread * 10 < maes.min, s"fold spread $spread vs min MAE ${maes.min}")
  }

  test("q271 dim ablation: full-dim leg is its own truth, recall monotone in dims") {
    val rows = SparkEntry.queries("q271_dim_ablation")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows(64L) == 1000L, s"ground-truth leg must self-recall: ${rows(64L)}")
    assert(rows(64L) >= rows(32L) && rows(32L) >= rows(16L) && rows(16L) >= rows(8L),
      s"recall not monotone in dims: $rows")
  }

  test("q272 t-closeness flags skewed classes at sf0.01 and stays in [0, 1] EMD") {
    val rows = SparkEntry.queries("q272_t_closeness")(spark, dir).collect()
    assert(rows.length == 125)
    assert(rows.map(_.getLong(3)).forall(e => e >= 0 && e <= 1000000))
    assert(rows.map(_.getLong(4)).sum >= 1, "no class violated t=0.2 at sf0.01")
  }

  test("q273 Shapley satisfies the efficiency axiom exactly") {
    val rows = SparkEntry.queries("q273_shapley_sources")(spark, dir).collect()
    assert(rows.length == 5)
    val phiSum = rows.map(_.getLong(3)).sum
    val vFull = rows.head.getLong(4)
    assert(phiSum == 120L * vFull, s"sum(phi_x120)=$phiSum != 120*v_full=${120L * vFull}")
    assert(rows.map(_.getLong(3)).forall(_ > 0), "a contributing source valued <= 0")
  }

  test("q274 Heaps curve: cumulative vocabulary monotone, new types decay, volume conserved") {
    val rows = SparkEntry.queries("q274_heaps_curve")(spark, dir).collect()
    assert(rows.length == 10)
    val cum = rows.map(_.getLong(3))
    assert(cum.zip(cum.tail).forall { case (a, b) => b >= a }, "cum_types not monotone")
    assert(rows.head.getLong(2) > 2 * rows.last.getLong(2),
      s"no saturation: first-decile new=${rows.head.getLong(2)} last=${rows.last.getLong(2)}")
    assert(rows.last.getLong(4) == rows.map(_.getLong(1)).sum, "unit volume not conserved")
  }

  test("q275 permutation importance: gate features flip, noise feature flips exactly zero") {
    val rows = SparkEntry.queries("q275_permutation_importance")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (n, _) = rows("chars")
    assert(rows("chars")._2 * 20 > n, s"chars flips too rare: ${rows("chars")._2}/$n")
    assert(rows("tokens")._2 * 20 > n, s"tokens flips too rare: ${rows("tokens")._2}/$n")
    assert(rows("noise")._2 == 0L, s"noise feature flipped ${rows("noise")._2} decisions")
  }

  test("q277 ACF/Ljung-Box: white-noise arm quiet, planted daily cycle lights lag 24") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = SparkEntry.queries("q277_acf_ljungbox")(spark, d).collect()
      val byArm = rows.groupBy(_.getString(0))
      assert(byArm("null").head.getLong(4) == 0L, s"$d: null arm fired Ljung-Box")
      assert(byArm("planted").head.getLong(4) == 1L, s"$d: planted cycle missed")
      val r24p = byArm("planted").find(_.getLong(1) == 24L).get.getLong(2)
      val r24n = byArm("null").find(_.getLong(1) == 24L).get.getLong(2)
      assert(r24p > 250000, s"$d: planted lag-24 too weak: $r24p")
      assert(math.abs(r24n) < 100000, s"$d: null lag-24 structure: $r24n")
    }
  }

  test("q278 LOO encoding: full-mean arm leaks on a noise target, LOO arm near zero") {
    val rows = SparkEntry.queries("q278_loo_target_encoding")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rows("full") > 5000, s"full-mean leak invisible: ${rows("full")}")
    assert(math.abs(rows("loo")) < rows("full") / 10,
      s"LOO not leak-free: loo=${rows("loo")} full=${rows("full")}")
  }

  test("q282 modularity: planted blocks near the 0.99 theoretical pole, randoms near zero") {
    val rows = SparkEntry.queries("q282_modularity")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    assert(rows(("planted", "true")) > 950000, s"planted pole: ${rows(("planted", "true"))}")
    assert(math.abs(rows(("planted", "rnd"))) < 20000, s"planted null: ${rows(("planted", "rnd"))}")
    assert(math.abs(rows(("real", "rnd"))) < 20000, s"real null: ${rows(("real", "rnd"))}")
    // the audit's verdict on this fixture: LP labels carry no modular
    // structure (giant min-id labels score at or below random)
    assert(rows(("real", "lp")) < 20000, s"real/lp unexpectedly modular: ${rows(("real", "lp"))}")
  }

  test("q285 Wilson ranking: shrinkage below phat everywhere, and it genuinely reorders") {
    val rows = SparkEntry.queries("q285_wilson_ranking")(spark, dir).collect()
    assert(rows.length == 20)
    rows.foreach(r => assert(r.getLong(4) < r.getLong(3),
      s"lb >= phat for part ${r.getLong(0)}"))
    val phats = rows.map(_.getLong(3))
    assert(phats.zip(phats.tail).exists { case (a, b) => a < b },
      "Wilson order identical to naive phat order — no shrinkage visible")
  }

  test("q286 Good-Turing estimate lands in a 1.5x band of the measured novel rate, both scales") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = SparkEntry.queries("q286_good_turing")(spark, d).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val (gt, actual) = (rows("a_gt_unseen_micro"), rows("b_actual_unseen_micro"))
      assert(actual > 0 && gt > 0)
      assert(gt * 2 > actual && gt < actual * 2,
        s"$d: GT estimate $gt vs measured $actual — outside the band")
    }
  }

  test("q287 dispersion: real hourly counts near Poisson 1.0, bursty arm far above") {
    val rows = SparkEntry.queries("q287_dispersion_index")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4))
    val (bursty, real) = rows.partition(_._1._1 == "bursty")
    assert(real.forall { case (_, d) => d >= 850 && d <= 1150 },
      s"real series not Poisson-like: ${real.toMap}")
    assert(bursty.forall { case (_, d) => d >= 1500 },
      s"bursty overdispersion invisible: ${bursty.toMap}")
  }

  test("q288 capture-recapture lands near truth, denser sampling lands nearer") {
    val rows = SparkEntry.queries("q288_capture_recapture")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(6)).toMap
    assert(rows("10pct") <= 150, s"10% arm err ${rows("10pct")} permille")
    assert(rows("30pct") <= 50, s"30% arm err ${rows("30pct")} permille")
    assert(rows("30pct") <= rows("10pct"), "denser sampling did not improve the estimate")
  }

  test("q289 Chao1 beats naive S_obs at both scales (improvement law)") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val r = SparkEntry.queries("q289_chao1_richness")(spark, d).collect().head
      val (sObs, chao1, truth) = (r.getLong(0), r.getLong(3), r.getLong(4))
      assert(chao1 > sObs, s"$d: no unseen mass added")
      assert(math.abs(chao1 - truth) < math.abs(sObs - truth),
        s"$d: chao1=$chao1 not closer to $truth than s_obs=$sObs")
      assert(chao1 < 2 * truth, s"$d: chao1 wild: $chao1 vs $truth")
    }
  }

  test("q290 jackknife SE brackets an independent half-split perturbation") {
    val r = SparkEntry.queries("q290_jackknife_se")(spark, dir).collect().head
    val (theta, se, halfGap) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(se > 0 && se * 20 < theta, s"SE implausible: $se vs theta $theta")
    assert(halfGap < 6 * se, s"half-split gap $halfGap outside 6 jackknife SEs ($se)")
  }

  test("q293 DiD recovers the planted lift EXACTLY as planted-minus-placebo") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = SparkEntry.queries("q293_diff_in_diff")(spark, d).collect()
        .map(r => r.getString(0) -> r.getLong(6)).toMap
      // +50 deci on treated-post shifts m11 by exactly 50000 milli: the
      // recovery is an algebraic identity, not an approximation
      assert(rows("planted") - rows("null") == 50000L,
        s"$d: planted=${rows("planted")} null=${rows("null")}")
      assert(math.abs(rows("null")) < 30000, s"$d: placebo DiD too large: ${rows("null")}")
    }
  }

  test("q294 NDCG: oracle ranker at 1000 for every query, random ranker well below") {
    val rows = SparkEntry.queries("q294_ndcg")(spark, dir).collect()
    val (oracle, random) = rows.partition(_.getString(0) == "a_oracle")
    assert(oracle.length == 10 && random.length == 10)
    assert(oracle.forall(_.getLong(4) == 1000L), "oracle ranker not ideal somewhere")
    val avgRandom = random.map(_.getLong(4)).sum / 10
    assert(avgRandom < 850, s"random ranker suspiciously good: $avgRandom")
  }

  test("q295 Markov attribution: removals all hurt, symmetrically on an iid stream") {
    val rows = SparkEntry.queries("q295_markov_attribution")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (baseConv, _) = rows("base")
    assert(baseConv > 800000 && baseConv <= 1000000, s"base conversion $baseConv")
    val removals = rows.filterNot(_._1 == "base").values.map(_._2)
    assert(removals.forall(r => r > 300 && r < 600),
      s"removal effects out of band: $rows")
    // the fixture's channels are iid => near-symmetric credit
    assert(removals.max - removals.min < 100,
      s"asymmetric credit on an iid stream: $rows")
  }

  test("q296 off-policy eval: SNIPS audits exactly, IPS unbiased, ordering preserved") {
    val rows = SparkEntry.queries("q296_offpolicy_eval")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (ipsOpt, snipsOpt, trueOpt) = rows("a_opt")
    assert(trueOpt == 1000L && snipsOpt == 1000L, s"optimal policy: $rows")
    assert(math.abs(ipsOpt - 1000) < 150, s"IPS far from truth: $ipsOpt")
    assert(rows("b_bad") == ((0L, 0L, 0L)), s"bad policy nonzero: ${rows("b_bad")}")
    val (ipsM, snipsM, trueM) = rows("c_mixed")
    assert(math.abs(ipsM - trueM) < 150 && math.abs(snipsM - trueM) < 100,
      s"mixed policy estimates off: $rows")
  }

  test("q297 bootstrap A/B diff: A/A straddles zero, planted CI is the exact +60000 shift") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = SparkEntry.queries("q297_bootstrap_ab_diff")(spark, d).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val (aaLo, aaHi, aaSig) = rows("aa")
      val (pLo, pHi, pSig) = rows("planted")
      assert(aaLo <= 0 && aaHi >= 0 && aaSig == 0L, s"$d: A/A fired: $rows")
      assert(pLo == aaLo + 60000 && pHi == aaHi + 60000,
        s"$d: shift identity broken: $rows")
      assert(pSig == 1L && pLo > 0, s"$d: planted lift not detected: $rows")
    }
  }

  test("q298 CUPED: strong covariate found, big variance cut, lift preserved exactly") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = SparkEntry.queries("q298_cuped")(spark, d).collect()
        .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
      val (thN, naiveN, cupedN, redN) = rows("null")
      val (thP, naiveP, cupedP, redP) = rows("planted")
      assert(thN > 700 && thN < 1100, s"$d: theta off: $thN")
      assert(redN > 600 && redN < 900 && redP > 600, s"$d: variance cut off: $redN/$redP")
      // constant +30-deci shift of treated-post rows moves the naive lift exactly
      assert(naiveP - naiveN == 30000L, s"$d: naive shift ${naiveP - naiveN}")
      assert(math.abs((cupedP - cupedN) - 30000L) < 500,
        s"$d: CUPED distorted the effect: ${cupedP - cupedN}")
    }
  }

  test("q299 SRM gate: fair split passes, planted 30/70 assignment fires, both scales") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = SparkEntry.queries("q299_srm_gate")(spark, d).collect()
        .map(r => r.getString(0) -> r.getLong(4)).toMap
      assert(rows("fair") == 0L, s"$d: fair split flagged")
      assert(rows("biased") == 1L, s"$d: biased assignment missed")
    }
  }

  test("q300 readout: SRM passes, variance cut holds, verdict significant, both scales") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = SparkEntry.queries("q300_experiment_readout")(spark, d).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows("b_srm_pass") == 1L, s"$d: SRM gate failed")
      assert(rows("f_var_reduction_permille") > 600, s"$d: variance cut ${rows("f_var_reduction_permille")}")
      assert(rows("g_z2_cuped_milli") > 3841 && rows("h_significant") == 1L,
        s"$d: planted experiment not significant: $rows")
    }
  }

  test("q301 Qini: oracle dominates every interior decile, curves meet exactly at the end") {
    val rows = SparkEntry.queries("q301_qini_curve")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
    (1 to 9).foreach { d =>
      assert(rows(("a_oracle", d.toLong)) >= rows(("b_random", d.toLong)),
        s"random above oracle at decile $d")
    }
    assert(rows(("a_oracle", 10L)) == rows(("b_random", 10L)),
      "endpoint identity broken: same population must meet")
    assert(rows(("a_oracle", 5L)) > rows(("b_random", 5L)) * 6 / 5,
      s"oracle targeting gain invisible at the half-way decile")
  }

  test("q302 SPRT: correct decisions, and both arms stop far before the fixed-n sample") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = SparkEntry.queries("q302_sprt")(spark, d).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
      val (nNull, rejNull) = rows("null")
      val (nAlt, rejAlt) = rows("planted")
      assert(rejNull == 0L, s"$d: null coin rejected H0")
      assert(rejAlt == 1L, s"$d: 70% coin not detected")
      assert(nNull <= 100 && nAlt <= 100, s"$d: not early: null=$nNull alt=$nAlt")
    }
  }

  test("q306 content drift: consecutive-decile Jaccard is flat on the uniform corpus") {
    val rows = SparkEntry.queries("q306_content_drift")(spark, dir).collect()
    assert(rows.length == 9)
    val j = rows.map(_.getLong(4))
    assert(j.forall(_ > 0))
    assert(j.max - j.min < math.max(j.max / 3, 10),
      s"drift curve not flat on a uniform corpus: ${j.toSeq}")
  }

  test("q307 leakage-free split: naive split leaks near-dup pairs, cluster split leaks zero") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = SparkEntry.queries("q307_leakage_free_split")(spark, d).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val (nt, ns, leakNaive) = rows("a_naive")
      val (ct, cs, leakCluster) = rows("b_cluster")
      assert(leakNaive > 0, s"$d: naive split shows no leakage to catch")
      assert(leakCluster == 0L, s"$d: cluster split leaked $leakCluster pairs")
      assert(math.abs(ct - cs) * 5 < ct + cs, s"$d: cluster split unbalanced: $ct/$cs")
      assert(nt + ns == ct + cs)
    }
  }

  test("q309 Neyman: allocation tracks the planted dispersion gradient and beats proportional") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = SparkEntry.queries("q309_neyman_allocation")(spark, d).collect()
        .sortBy(_.getLong(0))
      assert(rows.length == 5)
      val ney = rows.map(_.getLong(3))
      // σ_h ∝ h+1 by construction → the allocation must be strictly increasing
      assert(ney.sliding(2).forall(p => p(0) < p(1)), s"$d: not monotone: ${ney.toSeq}")
      // floored shares still exhaust the budget to within one unit per stratum
      assert(ney.sum >= 995 && ney.sum <= 1000, s"$d: budget ${ney.sum}")
      // Cauchy-Schwarz strictly: Neyman variance genuinely below proportional
      // (theory for sd ∝ 1..5 with equal N_h: (Σσ)²/(5Σσ²) = 225/275 ≈ 0.818)
      val ratio = rows.head.getLong(5)
      assert(ratio < 900 && ratio > 700, s"$d: ratio_permille $ratio")
    }
  }

  test("q308 snapshot diff: class counts obey the version-predicate algebra") {
    val rows = SparkEntry.queries("q308_snapshot_diff")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // v1 = keys %4<3, v2 = keys %4>0: the %4=0 class deletes, %4=3 inserts —
    // equal-sized residue classes, so inserts == deletes exactly
    assert(rows("insert") == rows("delete"))
    // updates are the %5=0 keys inside the %4∈{1,2} overlap: 2/4 · 1/5 of keyspace
    val overlap = rows("update") + rows("same")
    assert(math.abs(rows("update") * 10 - overlap * 2) <= 10,
      s"update share off: ${rows("update")} of $overlap")
  }

  test("q313 grid search: selection is by validation accuracy and the grid discriminates") {
    val rows = SparkEntry.queries("q313_lr_grid_search")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getLong(8))).toMap
    assert(rows.keySet == Set(1L, 2L, 4L))
    val winners = rows.filter(_._2._2 == 1L)
    assert(winners.size == 1)
    val (wlr, (wval, _)) = winners.head
    // the flag must match the val-argmax (tiebreak smaller lr)
    assert(rows.values.forall(_._1 <= wval))
    // lr=1 is genuinely undertrained at 4 epochs (NOTES: slope-1 needs 8+)
    assert(rows(1L)._1 < wval, s"grid degenerate: ${rows.toSeq.sortBy(_._1)}")
    assert(wlr != 1L)
  }

  test("q312 imputation: planted missingness is ~10% and median bias is small per group") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = SparkEntry.queries("q312_median_impute")(spark, d).collect()
      assert(rows.length == 6)
      rows.foreach { r =>
        val (n, miss, bias) = (r.getLong(2), r.getLong(3), r.getLong(5))
        assert(miss * 10 > n * 8 / 10 && miss * 10 < n * 12 / 10, s"$d: miss rate $miss/$n")
        // median ≈ mean on this corpus: per-hole bias well under the ~30k spread
        assert(math.abs(bias) < miss * 5000L, s"$d: bias $bias over $miss holes")
      }
    }
  }

  test("q317 median CI: order holds and width shrinks like 1/sqrt(n) across scales") {
    def widths(d: String) = SparkEntry.queries("q317_median_ci")(spark, d).collect()
      .map { r =>
        val (lo, med, hi) = (r.getLong(4), r.getLong(5), r.getLong(6))
        assert(lo <= med && med <= hi, s"$d: order violated ($lo,$med,$hi)")
        r.getString(0) -> (hi - lo)
      }.toMap
    val w1 = widths("/root/testdata/sf0.01")
    val w2 = widths("/root/testdata/sf0.1")
    w1.keys.foreach { et =>
      // 10× the rows → ~1/√10 ≈ 0.32 of the width (allow 0.2–0.55)
      assert(w2(et) * 100 < w1(et) * 55 && w2(et) * 100 > w1(et) * 20,
        s"$et: width ${w1(et)} → ${w2(et)} not a √n shrink")
    }
  }

  test("q319 CE: the 2-D histogram beats independence on the correlated conjunction") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val err = SparkEntry.queries("q319_cardinality_estimation")(spark, d).collect()
        .map(r => r.getString(0) -> r.getLong(3)).toMap
      assert(err("a_true") == 0L)
      // independence under-counts the planted correlation ~7× (≈860‰);
      // the coarse misaligned 2-D cell stays within ~300‰
      assert(err("c_indep") > 700, s"$d: indep err ${err("c_indep")}")
      assert(err("b_hist2d") < 350, s"$d: hist2d err ${err("b_hist2d")}")
      assert(err("b_hist2d") * 2 < err("c_indep"))
    }
  }

  test("q321 repair: lattice is monotone and more data needs less generalization") {
    def levels(d: String) = SparkEntry.queries("q321_anonymize_repair")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    def chosen(rows: Array[(Long, Long, Long)]) = {
      val mins = rows.sortBy(_._1).map(_._2)
      assert(mins.sliding(2).forall(p => p(0) <= p(1)), s"lattice not monotone: ${mins.toSeq}")
      val ch = rows.filter(_._3 == 1L)
      assert(ch.length == 1 && ch.head._2 >= 25)
      // minimality: every finer level must fail k
      rows.filter(_._1 < ch.head._1).foreach(r => assert(r._2 < 25))
      ch.head._1
    }
    val c1 = chosen(levels("/root/testdata/sf0.01"))
    val c2 = chosen(levels("/root/testdata/sf0.1"))
    assert(c2 <= c1, s"10× the rows should not need MORE generalization ($c1 → $c2)")
  }

  test("q324 BH-FDR: planted segments all reject, no null segment rejects") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = SparkEntry.queries("q324_bh_fdr")(spark, d).collect()
      assert(rows.length == 24)
      rows.foreach { r =>
        val (pNum, rejected, planted) = (r.getLong(2), r.getLong(4), r.getLong(5))
        assert(pNum >= 2L && pNum <= 1048576L, s"$d: p_num $pNum out of [2/2^20, 1]")
        if (planted == 1L) assert(rejected == 1L, s"$d: planted seg ${r.getLong(0)} not rejected")
        else assert(rejected == 0L, s"$d: null seg ${r.getLong(0)} falsely rejected (p=$pNum/2^20)")
      }
      // step-up coherence: rejected set is exactly a prefix of the p-rank order
      val rejRanks = rows.filter(_.getLong(4) == 1L).map(_.getLong(3)).sorted
      assert(rejRanks.sameElements(1L to rejRanks.length.toLong))
    }
  }

  test("q325 stump: recovers the planted (quantity > 30) rule among null features") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = SparkEntry.queries("q325_decision_stump")(spark, d).collect()
      assert(rows.length == 3)
      val chosen = rows.filter(_.getLong(7) == 1L)
      assert(chosen.length == 1)
      assert(chosen.head.getString(0) == "quantity" && chosen.head.getLong(1) == 30L,
        s"$d: chose ${chosen.head.getString(0)}@${chosen.head.getLong(1)}")
      // planted rule: stump accuracy ≈ 1 − 15% noise; null features near coin-flip+base
      assert(chosen.head.getLong(6) > 800L, s"$d: acc ${chosen.head.getLong(6)}")
      rows.filterNot(_.getString(0) == "quantity").foreach { r =>
        assert(r.getLong(6) < 650L, s"$d: null feature ${r.getString(0)} acc ${r.getLong(6)}")
        assert(r.getLong(4) > chosen.head.getLong(4),
          s"$d: null feature ${r.getString(0)} scored below the planted split")
      }
      // gain sanity: the chosen split's impurity is far under the root's
      assert(chosen.head.getLong(4) * 3 < rows.head.getLong(5) * 2,
        s"$d: wg ${chosen.head.getLong(4)} vs root ${rows.head.getLong(5)}")
    }
  }

  test("q326 ALS: training SSE strictly improves and then never regresses") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val sse = SparkEntry.queries("q326_als_rank1")(spark, d).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sse.keySet == Set(0L, 1L, 2L))
      // round 1 must cut the predict-zero baseline hard; round 2 monotone
      assert(sse(1L) * 3 < sse(0L), s"$d: round 1 ${sse(1L)} vs baseline ${sse(0L)}")
      assert(sse(2L) <= sse(1L), s"$d: ALS regressed ${sse(1L)} → ${sse(2L)}")
      assert(sse(2L) > 0L, s"$d: degenerate zero SSE")
    }
  }

  test("q327 KN: smoothing covers every held-out trigram, raw MLE only a third") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val r = SparkEntry.queries("q327_kneser_ney")(spark, d).collect().head
      val (mleCov, knCov) = (r.getLong(3), r.getLong(4))
      assert(knCov == 1000L, s"$d: KN coverage $knCov permille")
      assert(mleCov < 500L, s"$d: MLE coverage $mleCov — train slice no longer sparse")
      // probability mass sanity: both averages in (0, 1e6)
      assert(r.getLong(5) > 0L && r.getLong(5) < 1000000L)
      assert(r.getLong(6) > 0L && r.getLong(6) < 1000000L)
    }
  }

  test("q333 quantile regression: pinball loss falls monotonically, arms stay ordered") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = SparkEntry.queries("q333_quantile_regression")(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(rows.length == 32)
      Seq(5L, 9L).foreach { td =>
        val arm = rows.filter(_._1 == td).sortBy(_._2)
        // loss_deci at epoch i is evaluated at the pre-update state: the
        // trajectory must never increase and must end well below start
        arm.map(_._3).sliding(2).foreach(p =>
          assert(p(1) <= p(0), s"$d tau=$td: loss rose ${p(0)} → ${p(1)}"))
        assert(arm.last._3 * 10 < arm.head._3 * 7, s"$d tau=$td: weak drop")
        // the fitted band has positive level and slope by the end
        assert(arm.last._4 > 0 && arm.last._5 > 0, s"$d tau=$td: degenerate fit")
      }
      // quantile ordering: the 0.9 band sits strictly above the median fit
      val f5 = rows.filter(r => r._1 == 5L && r._2 == 16L).head
      val f9 = rows.filter(r => r._1 == 9L && r._2 == 16L).head
      assert(f9._4 > f5._4 && f9._5 > f5._5, s"$d: bands crossed ($f5 vs $f9)")
    }
  }

  test("q320 attribution: per-conversion normalized credit sums to ≤1000 milli each") {
    val rows = SparkEntry.queries("q320_time_decay_attribution")(spark, dir).collect()
    assert(rows.length == 2)
    val norm = rows.map(_.getLong(3)).sum
    val nConv = rows.map(_.getLong(1)).sum // touches, not conversions — bound only
    assert(norm > 0 && rows.forall(_.getLong(2) > 0))
    assert(norm <= nConv * 1000)
  }

  test("q322 resharding: minimal-movement schemes move ~1/9, mod moves ~8/9") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = SparkEntry.queries("q322_resharding")(spark, d).collect()
        .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
      assert(rows("a_mod")._1 > 800, s"$d: mod moved ${rows("a_mod")._1}")
      assert(rows("b_rendezvous")._1 < 200, s"$d: rendezvous moved ${rows("b_rendezvous")._1}")
      assert(rows("c_ring")._1 < 250, s"$d: ring moved ${rows("c_ring")._1}")
      // balance price: the 16-vnode ring is lumpier than rendezvous
      assert(rows("c_ring")._2 >= rows("b_rendezvous")._2, s"$d: $rows")
      // everyone's max share stays a sane multiple of the ideal 111‰
      rows.values.foreach { case (_, share) => assert(share < 300) }
    }
  }

  test("q338 ACF: planted weekly cycle spikes r7 far above lags 1-6") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = SparkEntry.queries("q338_autocorrelation")(spark, d).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(rows.keySet == (1L to 7L).toSet)
      val r7 = rows(7L)._2
      val offCycle = (1L to 6L).map(k => math.abs(rows(k)._2))
      assert(r7 > 0, s"$d: r7=$r7 not positive")
      assert(r7 > 3 * offCycle.max,
        s"$d: r7=$r7 does not dominate off-cycle lags ${offCycle.mkString(",")}")
      // near-complete calendar: each extra lag loses at most a few pairs
      (1L to 6L).foreach(k => assert(rows(k)._1 - rows(k + 1)._1 <= 3))
    }
  }

  test("q339 seasonal decomposition hands back the planted dow-3 bump") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = SparkEntry.queries("q339_seasonal_decomposition")(spark, d).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(rows.keySet == (0L to 6L).toSet)
      val s3 = rows(3L)
      val others = (0L to 6L).filter(_ != 3L).map(k => math.abs(rows(k)))
      // +5/day plant, centered MA absorbs 1/7: expect ≈ 5·6/7·1000 ≈ 4286
      assert(s3 > 3000 && s3 < 4800, s"$d: dow-3 seasonal $s3 off the plant")
      assert(s3 > 2 * others.max,
        s"$d: planted dow does not dominate: s3=$s3 others=${others.mkString(",")}")
    }
  }

  test("q270 Poisson bootstrap: CI brackets the full-sample mean per series") {
    val rows = SparkEntry.queries("q270_poisson_bootstrap")(spark, dir).collect()
    assert(rows.length >= 3)
    rows.foreach { r =>
      val (mean, lo, hi) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo <= mean && mean <= hi, s"${r.getString(0)}: CI [$lo,$hi] misses mean $mean")
      assert(hi > lo, s"${r.getString(0)}: degenerate CI")
    }
  }
}
