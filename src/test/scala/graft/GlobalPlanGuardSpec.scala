package graft

import org.scalatest.funsuite.AnyFunSuite

/** Global scale-discipline guard: NO registered query may plan a
  * CartesianProduct or BroadcastNestedLoopJoin unless it is on the
  * explicit allowlist below with a justification. This is the property
  * that kills 100 TB deployments silently — a refactor that turns an
  * equi-join into a product would pass every value-correctness check and
  * then run for days at scale. Plans are built at sf0.001 (AQE initial
  * plan); streaming queries are skipped (building them executes real
  * micro-batch runs, and their joins are covered by their own specs).
  */
class GlobalPlanGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Intended product joins — every entry is a BOUNDED fan-out (a 1-row
    * scalar frame or a K-row constant grid broadcast against the data),
    * never a data×data product. Anything not listed here fails the test. */
  private val allowed: Map[String, String] = Map(
    "q98_gapfill" -> "per-series hourly spine: bounded generated sequence × series keys",
    "q36f_tfidf" -> "1-row corpus doc-count frame × term table (IDF)",
    "q36g_pmi_collocations" -> "1-row total-counts frame × bigram table",
    "q72_bigram_lm" -> "1-row vocab-size frame × scoring stream",
    "q76_bpe_train" -> "1-row argmax merge-pair frame per unrolled round (3 rounds)",
    "q76b_bpe_encode" -> "3-row trained-merge table × distinct-token frame",
    "q76c_bpe_train_deep" -> "1-row argmax merge-pair frame per checkpointed round (32 rounds; products live inside the materialized rounds, not the final plan)",
    "q110_bm25" -> "1-row corpus stats (N, avgdl) × term-match stream",
    "q203_rrf_hybrid" -> "1-row corpus stats (q110's shape) + 1-row query-vector frame × corpus scan",
    "q175_retrieval_eval" -> "1-row corpus stats (N, avgdl) × term-match stream (q110's shape)",
    "q90_skew_report" -> "1-row grand-total frame × per-key share table",
    "q102_quantile_norm" -> "1-row global-count frame × ranked rows; ≤(parts×|lang|)-row rank-offset triangular join (DistributedRank)",
    "q52_decontaminate" -> "1-row count + 1-row cutoff scalars; ≤parts-row rank-offset triangular join (DistributedRank)",
    "q74_zorder_layout" -> "1-row zmax scalar × lineitem (range-bin bucket off one broadcast bound)",
    "q160_hilbert_layout" -> "1-row hmax scalar × lineitem (range-bin bucket off one broadcast bound)",
    "q168_negative_sampling" -> "1-row total-count scalar × anchor draws (hash-into-id-space modulus)",
    "q130_skyline" -> "≤parts-row partition-maxima triangular join (DistributedRank prefix scan)",
    "q220_balanced_shards" -> "≤parts-row rank-offset triangular join (DistributedRank) + 1-row corpus-total frame × the 8 shard sums",
    "q221_suffix_array_lcp" -> "≤parts-row rank-offset triangular joins (DistributedRank — one per prefix-doubling round)",
    "q224_layout_probe_compare" -> "1-row column-maxima frame × the fact scan (q74's shape) + 24-probe × 48-envelope metadata product",
    "q226_fk_integrity" -> "1-row child-stats × 1-row parent-cardinality frames, one pair per FK edge",
    "q227_ann_scorecard" -> "brute-force exact leg BY DESIGN (q35's 10-query broadcast × corpus) + K=8 centroid grids × vectors",
    "q172_exact_auc" -> "≤parts-row rank-offset triangular join (DistributedRank)",
    "q174_exact_average_precision" -> "≤parts-row rank/prefix-sum triangular joins (DistributedRank)",
    "q117_temperature_mix" -> "1-row total-char-mass frame × per-source quota table",
    "q117b_temperature_mix_capped" -> "1-row total-char-mass frame × per-source quota table (q117's shape, capped TopK arm)",
    "q35_cosine_topk" -> "brute-force baseline BY DESIGN: 10 query vectors broadcast × corpus",
    "q35d_ivf_assign" -> "K=8 seed-centroid grid broadcast × vectors (coarse quantizer)",
    "q35e_ivf_search" -> "K=8 centroid grid × query vectors (probe scoring)",
    "q35f_kmeans_ivf_assign" -> "K=8 Lloyd-centroid grid × vectors per iteration",
    "q35g_kmeans_ivf_search" -> "K=8 Lloyd-centroid grid × query vectors",
    "q35m_filtered_ivf_search" -> "K=8 centroid grid × query vectors (filtered probe)",
    "q35j_ivfpq_search" -> "K=8 coarse grid + 16-codeword PQ tables × queries",
    "q35k_sq8_search" -> "1-row per-dim min/max frame × vectors (quantizer bounds)",
    "q113_semdedup" -> "K=8 centroid grid × vectors (cluster assignment)",
    "q206_knn_classifier" -> "100-row held-out query frame broadcast × train corpus (bounded eval slice)",
    "q207_cluster_purity" -> "K=8 Lloyd-centroid grid × vectors (q35f's assignment shape)",
    "q216_vector_index_readback" -> "K=8 Lloyd-centroid grid × vectors (q35f's assignment shape, feeding the persisted index)",
    "q40_pipeline_throughput" -> "deliberate ×3 bench fan-out of the wire-line fixture",
    "q99_assoc_rules" -> "1-row basket-count frame × itemset supports",
    "q154_chi2_independence" -> "1-row n/dof frames × the ≤10-cell contingency table",
    "q355_mix_temperature" -> "|sources|-row (20) largest-remainder rank triangular self-join + 1-row budget/total scalars",
    "q155_decay_trending" -> "1-row max-hour frame × the event scan (age anchor)",
    "q184_dsir_selection" -> "1-row corpus-totals frame (nt, nr) × the 256-row feature-weight table",
    "q188_heavy_hitters" -> "1-row total-token-count scalar × the ≤63-row verified-candidate counts",
    "q190b_kmv_intersection" -> "1-row × 1-row KMV sketch frames (64-element arrays)",
    "q190c_kmv_difference" -> "1-row × 1-row KMV sketch frames (64-element arrays)",
    "q195_pca_power" -> "1-row norm and eigenvalue scalars × the 64-row component frame (post-checkpoint final round)",
    "q230_holt_forecast" -> "1-row hour-bounds frame × series keys (q98's spine shape)",
    "q232_woe_iv" -> "1-row class-totals and 1-row IV scalars × the 10-bin spine",
    "q234_lag_xcorr" -> "1-row hour-bounds frame × the 1-row spine seed",
    "q239_join_size_sketch" -> "2-row sketch inner products × the 1-row exact-count audit frame",
    "q244_also_bought" -> "1-row basket-count frame × the co-occurrence table (q99's shape)",
    "q245_lsh_scorecard" -> "1-row × 1-row × 1-row scorecard-count frames",
    "q383_lsh_tuning_curve" -> "1-row truth-count frame × the 4-row banding spine (q245's scorecard shape)",
    "q246_rfm_segments" -> "1-row max-ts anchor × events; 1-row user-count scalar × the per-dim histograms",
    "q247_holt_backtest" -> "1-row hour-bounds frame × series keys (q98's spine shape)",
    "q248_k_anonymity" -> "1-row population-totals frame × the ≤|sizes|×4 threshold grid",
    "q261_l_diversity" -> "1-row population-totals frame × the ≤|(ld,sz)|×3 threshold grid (q248's shape)",
    "q250_anomaly_hours" -> "1-row hour-bounds frame × series keys (q247's spine shape)",
    "q252_mixture_waterfill" -> "|sources|² triangular comparison + 1-row budget/saturated-prefix scalars",
    "q255_ab_test" -> "≤|np values|² median triangular + 1-row user-count/median scalars × the user rollup",
    "q256_kaplan_meier" -> "1-row user-count scalar × the 14-bin histogram fold",
    "q258_logrank" -> "1-row cohort-sizes scalar × the 2-arm 14-bin histogram folds",
    "q260_cusum_canary" -> "1-row hour-bounds frame × series keys (q247's spine) + 2-row arm grid × the per-series folds",
    "q262_isotonic_calibration" -> "bins³ interval ranges over the 10-row score histogram (PAV closed form)",
    "q265_theil_sen" -> "1-row global-min-hour scalar × hourly bins (pair join itself is (arm, series) equi)",
    "q266_benford_audit" -> "9-row digit-probability grid × 2-arm spine (pure metadata)",
    "q267_conformal" -> "1-row train-ratio scalars × cal/test scan + 2-row alpha/threshold/count frames",
    "q268_markov_holdout" -> "1-row time-bounds frame × the transition stream (temporal split cut)",
    "q269_kfold_cv" -> "1-row grand-total frame × the scoring scan (fold complements via 5-row equi broadcast)",
    "q270_poisson_bootstrap" -> "32-row replicate grid × the event scan (deliberate bootstrap fan-out, collapses map-side)",
    "q271_dim_ablation" -> "brute-force ablation BY DESIGN: 4-dim grid × 10-query broadcast × corpus (q35's allowance)",
    "q272_t_closeness" -> "10-bin sensitive spine × class list + 1-row global-total frame (pure metadata)",
    "q273_shapley_sources" -> "32-coalition × ≤32-mask-histogram grids + 1-row totals (post-scan metadata)",
    "q274_heaps_curve" -> "1-row corpus-size scalar × scans + 10×10 decile triangular cum (replaces a global-cum window)",
    "q275_permutation_importance" -> "no products expected; bucket-local cyclic-shift windows only",
    "q277_acf_ljungbox" -> "1-row hour-bounds/series-stats frames × time-bounded spine + 24-row lag grid (q260's spine shape)",
    "q280_greedy_set_cover" -> "5-group/32-coalition grids × the ≤32-row mask histogram + 1-row pick/total frames (q273's lattice)",
    "q282_modularity" -> "1-row community-count scalar × the |V|-bounded label frame (random-null label draw)",
    "q286_good_turing" -> "1-row corpus-size scalar × the shingle stream (decile split cut)",
    "q287_dispersion_index" -> "1-row hour-bounds frame × series keys (q247's spine shape)",
    "q289_chao1_richness" -> "1-row corpus-size scalar × the shingle stream + 1-row estimate frames",
    "q290_jackknife_se" -> "1-row total/variance/half-split frames × the 32-row replicate fold",
    "q293_diff_in_diff" -> "1-row time-midpoint scalar × the event scan (period split cut)",
    "q295_markov_attribution" -> "5-arm grid × the ≤30-row transition table + 1-row base-value frame (post-scan metadata)",
    "q296_offpolicy_eval" -> "3-policy grid × the logged-bandit scan (conditional sums per policy)",
    "q297_bootstrap_ab_diff" -> "32-row replicate grid × the event scan (q270's bootstrap fan-out)",
    "q298_cuped" -> "1-row time-midpoint scalar × the event scan + 1-row theta frame × the user rollup",
    "q300_experiment_readout" -> "1-row midpoint/theta/srm/moment frames chained over one user rollup (q298's shape)",
    "q302_sprt" -> "2-row decision frame × the ≤|users|/10 block walk (user-count metadata)",
    "q306_content_drift" -> "1-row corpus-size scalar × the shingle stream (decile assignment)",
    "q309_neyman_allocation" -> "1-row allocation-totals frame × the 5-row stratum frame (pure metadata)",
    "q311_exchange_reuse" -> "1-row global-mean frame × the per-order rollup (the reused exchange's second consumer)",
    "q313_lr_grid_search" -> "1-row val × 1-row test eval frames per arm + 1-row best-key frame × the 3-row grid",
    "q321_anonymize_repair" -> "1-row chosen-level frame × the 4-row lattice report (pure metadata)",
    "q322_resharding" -> "9-row shard grid and 144-row vnode grid × the key scan (broadcast assignment fan-out)",
    "q324_bh_fdr" -> "≤|deci values|² median triangular (q255's shape) + 24² BH rank triangular + 1-row median/m/kmax scalars",
    "q326_als_rank1" -> "1-row round-0 SSE scalar × the 3-row round report",
    "q332_jaro_winkler" -> "64-row mangled-probe frame × 64-row name dictionary (bounded metadata pairs)",
    "q334_gdpr_erasure" -> "1-row before/kept/orphan count scalars chained per table (12 1-row frames)",
    "q327_kneser_ney" -> "1-row trigram-type-count frame × the eval trigram stream (q72's vocab-scalar shape)",
    "q325_decision_stump" -> "1-row global-argmin frame × the ≤93-row per-feature best-split table",
    "q336_geo_cell_join" -> "1-row completeness-count scalar × the radius-pair stream (carried n_pairs proof column)",
    "q337_survival_estimators" -> "1-row corpus-max-date scalar × the per-customer lifetime frame (censoring cutoff)",
    "q338_autocorrelation" -> "1-row series mean/variance scalar × the ≤|days| daily series; lag pairs are an equi-join",
    "q339_seasonal_decomposition" -> "1-row residual-sigma scalar × the ≤|days| daily series (extreme flagging)",
    "q343_item_cf_similarity" -> "1-row pair-total and 1-row cap-count scalars × the projected pair frame",
    "q344_gradient_boosting" -> "1-row global-mean / per-round argmax-stump / SSE scalars × the residual frame (3 rounds)",
    "q348_mahalanobis" -> "1-row mean / 1-row covariance-moment / 1-row outlier-count scalars × the scoring scan",
    "q350_luby_mis" -> "1-row node-count scalar × node frame (edge hashing) + per-round 1-row stat scalars + 1-row invariant frame",
    "q351_lcs_alignment" -> "1-row anchor-doc frame × the 8-row sampled-doc frame (cross arm)",
    "q359_prototype_prune" -> "K=8 Lloyd-centroid grid × vectors (q35f's assignment shape) + 8-row cluster-size frame; per-cluster rank is DistributedRank's ≤parts-row triangular",
    "q365_lm_score_tertiles" -> "q327's 1-row trigram-type-count frame × the eval stream + 1-row doc-count frame × per-doc scores (tertile cuts); global rank is DistributedRank's ≤parts-row triangular",
    "q372_bradley_terry" -> "1-row collected duel-array frame × 1-row win-map frame (K=|event_type| metadata, K² duel array)",
    "q378_fairness_audit" -> "1-row majority-class frame × the per-doc prediction frame (group census)",
    "q379_mmr_rerank" -> "3-query broadcast × corpus pool cut (q35's brute-force allowance); greedy runs in a fold over 20-row collected pools",
    "q380_cluster_validity" -> "K=8 Lloyd-centroid grid × vectors (q35f's assignment shape) + K² centroid-pair grid (validity metadata)",
    "q381_rbo_ann_fidelity" -> "10-query broadcast × corpus exact leg (q35's allowance) + K=8 Lloyd grid (q35f's shape); RBO itself is a 5-rows-per-query join")

  /** Unpartitioned (empty partitionSpec) WindowExec funnels its ENTIRE
    * input through one task — Spark's own "No Partition Defined" warning.
    * Correct at sf0.1, dead at 100 TB. Every entry here must be a frame
    * whose size is bounded by something other than the data (a constant
    * LIMIT, a fixed grid, a distinct-value set with a documented ceiling),
    * never the raw fact/corpus table. The four data-sized offenders this
    * guard was written against (q74 ntile, q102 global rank, q52 cutoff
    * rank, q36g top-k rank) are fixed — range-bin buckets, the two-pass
    * DistributedRank, and TakeOrdered + sorted-array rank — and this test
    * fails on any regression to that shape. */
  private val allowedGlobalWindows: Map[String, String] = Map.empty

  test("no registry query plans an unintended unpartitioned WindowExec") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExecBase
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
        case _ => p.children
      }
      (p +: kids.flatMap(flatten)) ++ p.subqueries.flatMap(flatten)
    }
    val offenders = SparkEntry.registry
      .filterNot(q => q.name.contains("stream"))
      .flatMap { q =>
        val found =
          try flatten(q.fn(spark, dir).queryExecution.executedPlan)
            .collect { case w: WindowExecBase if w.partitionSpec.isEmpty =>
              w.windowExpression.map(_.sql).mkString(";").take(80) }
          catch {
            case e: Throwable => Seq(s"plan-failed: ${e.getClass.getSimpleName} ${e.getMessage}")
          } finally {
            try spark.catalog.clearCache() catch { case _: Throwable => () }
          }
        if (found.nonEmpty && !allowedGlobalWindows.contains(q.name))
          Some(s"${q.name}: ${found.mkString(" | ")}")
        else None
      }
    assert(offenders.isEmpty, "\n" + offenders.mkString("\n"))
  }

  test("no registry query plans an unintended cartesian or nested-loop join") {
    val offenders = SparkEntry.registry
      .filterNot(q => q.name.contains("stream"))
      .flatMap { q =>
        val found =
          try {
            val plan = q.fn(spark, dir).queryExecution.executedPlan.toString
            Seq("CartesianProduct", "BroadcastNestedLoopJoin").filter(plan.contains)
          } catch {
            case e: Throwable => Seq(s"plan-failed: ${e.getClass.getSimpleName} ${e.getMessage}")
          } finally {
            try spark.catalog.clearCache() catch { case _: Throwable => () }
          }
        if (found.nonEmpty && !allowed.contains(q.name)) Some(s"${q.name}: ${found.mkString(",")}")
        else None
      }
    assert(offenders.isEmpty, "\n" + offenders.mkString("\n"))
  }
}
