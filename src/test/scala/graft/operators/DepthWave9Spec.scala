package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Discrimination properties for the round-8 continuation wave
  * (q366–q374) that the value-hash oracle can't express: metric laws
  * (BLEU's composition, Sinkhorn ≥ W1, Hill positivity), conservation
  * invariants (confusion-matrix and cartography mass, block census), and
  * the EM noise-control contract. Runs on the sf0.01 fixtures. */
class DepthWave9Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, dir).collect()

  test("q366 BLEU: bounds, clip law, and the reported score recomposes from its parts") {
    val rows = run("q366_bleu")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m, t) = ((0 until 4).map(i => r.getLong(4 + 2 * i)),
        (0 until 4).map(i => r.getLong(5 + 2 * i)))
      m.zip(t).foreach { case (mi, ti) => assert(mi >= 0 && mi <= ti) }
      val (cLen, rLen, bleu) = (r.getLong(2), r.getLong(3), r.getDouble(12))
      assert(bleu >= 0.0 && bleu <= 1.0)
      if (m.exists(_ == 0L)) assert(bleu == 0.0)
      else {
        val bp = math.exp(math.min(0.0, 1.0 - rLen.toDouble / cLen))
        val gm = math.exp(m.zip(t).map { case (mi, ti) =>
          math.log(mi.toDouble / ti) }.sum / 4)
        assert(math.abs(bleu - bp * gm) < 5e-4, s"bleu decomposition: $bleu vs ${bp * gm}")
      }
    }
  }

  test("q367 Sinkhorn: cost dominates exact W1, marginals near-converged") {
    val ot = run("q367_sinkhorn_drift").map(r => r.getString(0) -> r).toMap
    val w1 = run("q357_wasserstein_drift").map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(ot.keySet == w1.keySet)
    ot.foreach { case (et, r) =>
      val (cost, resid) = (r.getDouble(3), r.getDouble(4))
      assert(cost >= 0.0 && resid >= 0.0)
      // the entropic plan is a FEASIBLE-up-to-resid coupling for the linear
      // cost, whose exact optimum on the line IS W1 — suboptimality means
      // cost ≥ W1 minus the b-marginal slack (each unit of unmatched mass
      // can hide at most the max bin distance, 9)
      assert(cost + 9 * resid + 1e-3 >= w1(et), s"$et: $cost vs w1=${w1(et)} resid=$resid")
      assert(resid < 0.05, s"$et Sinkhorn failed to converge: resid=$resid")
    }
  }

  test("q368 NB confusion matrix: mass conservation against an independent census") {
    val rows = run("q368_nb_langid")
    val predMass = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum)
    import org.apache.spark.sql.functions._
    val census = graft.Tables(spark, dir, "documents")
      .filter(length(col("text")) > 0 && col("doc_id") % 2 === 1)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(predMass.toMap == census, "every scored test doc lands in exactly one cell")
    rows.foreach(r => assert(r.getLong(2) > 0))
  }

  test("q369 matrix profile: arm census, non-negativity, motif ≤ discord") {
    val rows = run("q369_matrix_profile")
    val motifs = rows.filter(_.getString(0) == "motif")
    val discords = rows.filter(_.getString(0) == "discord")
    assert(motifs.length == 10 && discords.length == 3)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0)
      // the nearest neighbor sits inside the band on BOTH sides
      val gap = math.abs(r.getLong(2) - r.getLong(1))
      assert(gap >= 8 && gap <= 168)
    }
    assert(motifs.map(_.getLong(3)).max <= discords.map(_.getLong(3)).min,
      "a motif (low profile) can never exceed a discord (high profile)")
  }

  test("q370 span corruption: block census and mask-ratio band") {
    val rows = run("q370_span_corruption")
    import org.apache.spark.sql.functions._
    val blocks = graft.Tables(spark, dir, "documents")
      .filter(length(col("text")) > 0)
      .select(expr("(size(split(text, ' ')) + 19) div 20 AS nb"))
      .agg(sum("nb")).collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum == blocks, "every 20-token block is visited once")
    rows.foreach { r =>
      val (nBlocks, nSpans, nTok, nMask, milli) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(nSpans <= nBlocks && nMask <= nTok)
      assert(nMask >= nSpans, "each span masks at least one token")
      assert(milli >= 50 && milli <= 150, s"mask ratio drifted: $milli milli")
    }
  }

  test("q371 FS EM: posteriors in range and monotone in the agreement partial order") {
    val rows = run("q371_fs_em_weights")
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    // With the m=0.8/u=0.2 init the fit keeps every mᵢ > uᵢ, so MORE
    // agreement can only RAISE the match weight: the weight must be
    // monotone along every edge of the pattern lattice. (A "noise field
    // ≈ 0 weight" assertion would be WRONG here: pair-level agreements
    // cluster through shared block members, so even a per-record coin
    // flip carries real pair-level information — see the query comment.)
    val byPat = rows.map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
      r.getDouble(5))).toMap
    for (g1 <- 0L to 1L; g2 <- 0L to 1L; g3 <- 0L to 1L) {
      if (g1 == 0) assert(byPat((0L, g2, g3)) < byPat((1L, g2, g3)))
      if (g2 == 0) assert(byPat((g1, 0L, g3)) < byPat((g1, 1L, g3)))
      if (g3 == 0) assert(byPat((g1, g2, 0L)) < byPat((g1, g2, 1L)))
    }
    // full agreement is the strongest evidence, full disagreement the weakest
    assert(byPat((1L, 1L, 1L)) == rows.map(_.getDouble(5)).max)
    assert(byPat((0L, 0L, 0L)) == rows.map(_.getDouble(5)).min)
    assert(byPat((1L, 1L, 1L)) > byPat((0L, 0L, 0L)) + 2.0)
  }

  test("q372 Bradley-Terry: strengths form a distribution, wins bounded by comparisons") {
    val rows = run("q372_bradley_terry")
    assert(rows.length >= 2)
    val pSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(pSum - 1.0) < 1e-3, s"strengths must renormalize: $pSum")
    rows.foreach { r =>
      assert(r.getDouble(3) > 0.0)
      assert(r.getLong(1) <= r.getLong(2), "wins cannot exceed comparisons")
    }
  }

  test("q373 cartography: zone mass conservation and zone-definition bounds") {
    val rows = run("q373_data_cartography")
    import org.apache.spark.sql.functions._
    val testDocs = graft.Tables(spark, dir, "documents")
      .filter(length(col("text")) > 0 && col("doc_id") % 2 === 1).count()
    assert(rows.map(_.getLong(2)).sum == testDocs, "zones partition the test half")
    rows.foreach { r =>
      val (zone, conf) = (r.getString(1), r.getDouble(3))
      assert(conf >= 0.0 && conf <= 1.0)
      if (zone == "easy") assert(conf >= 0.667)
      if (zone == "hard") assert(conf < 0.333)
    }
  }

  test("q375 kappa: integer recomposition, bounds, and the measured kappa paradox") {
    val r = run("q375_cohens_kappa")(0)
    val (n, agree, pen, kappa) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5))
    assert(agree <= n && pen <= n * n)
    assert(kappa >= -1.0 && kappa <= 1.0)
    // κ must recompose EXACTLY from the emitted integers
    val expect = BigDecimal((agree * n - pen).toDouble / (n * n - pen))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(kappa - expect) < 1e-9, s"kappa $kappa vs recomposed $expect")
    // the fixture's shared wordlist makes both classifiers near-constant:
    // raw agreement is high while chance-corrected agreement collapses —
    // the paradox the query comment documents must actually be present
    assert(r.getDouble(3) > 0.9, "raw agreement should be high here")
    assert(kappa < 0.2, "chance-corrected agreement should collapse here")
  }

  test("q376 Brier: Murphy identity exact on binned forecasts, raw dominates binned") {
    val r = run("q376_brier_decomposition")(0)
    val (braw, rel, res, unc) = (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val (bbin, bmur) = (r.getDouble(5), r.getDouble(6))
    assert(rel >= 0.0 && res >= 0.0)
    assert(unc >= 0.0 && unc <= 0.25, "uncertainty of a Bernoulli base rate")
    assert(math.abs(bbin - bmur) <= 1e-4 + 1e-9,
      s"Murphy identity: direct $bbin vs rel-res+unc $bmur")
    // NOT asserted: bbin ≤ braw. Replacing forecasts by bin MEANS is not
    // outcome-conditioning, so binned Brier may exceed raw (measured here:
    // 0.2863 vs 0.2860) — only proximity is a sound check.
    assert(math.abs(bbin - braw) < 0.05)
  }

  test("q377 confident joint: cell law, mass bounded by the test half") {
    val rows = run("q377_confident_joint")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) > 0)
      val expectFlag = if (r.getString(0) == r.getString(1)) 0L else 1L
      assert(r.getLong(3) == expectFlag)
    }
    import org.apache.spark.sql.functions._
    val testDocs = graft.Tables(spark, dir, "documents")
      .filter(length(col("text")) > 0 && col("doc_id") % 2 === 1).count()
    // docs confident for NO class drop out of the joint — mass can only shrink
    assert(rows.map(_.getLong(2)).sum <= testDocs)
    assert(rows.map(_.getLong(2)).sum > 0)
  }

  test("q378 fairness audit: conservation, milli recomposition, gaps well-defined") {
    val rows = run("q378_fairness_audit")
    assert(rows.length >= 2, "needs at least two groups to audit")
    import org.apache.spark.sql.functions._
    val testDocs = graft.Tables(spark, dir, "documents")
      .filter(length(col("text")) > 0 && col("doc_id") % 2 === 1).count()
    assert(rows.map(_.getLong(1)).sum == testDocs, "groups partition the test half")
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(2) * 1000 / r.getLong(1))
      assert(r.getLong(5) == r.getLong(4) * 1000 / r.getLong(1))
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(4) <= r.getLong(1))
    }
    val accGap = rows.map(_.getLong(3)).max - rows.map(_.getLong(3)).min
    val dpGap = rows.map(_.getLong(5)).max - rows.map(_.getLong(5)).min
    assert(accGap >= 0 && accGap <= 1000 && dpGap >= 0 && dpGap <= 1000)
  }

  test("q379 MMR: pick census, relevance-first law, and visible diversity reorder") {
    val rows = run("q379_mmr_rerank")
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 3)
    byQ.foreach { case (_, picks) =>
      assert(picks.length == 8)
      assert(picks.map(_.getLong(2)).distinct.length == 8, "greedy must never re-pick")
      assert(picks.map(_.getLong(1)).sorted.toSeq == (1L to 8L))
      // the first pick maximizes pure relevance (its penalty term is zero)
      val first = picks.minBy(_.getLong(1)).getDouble(3)
      assert(picks.forall(_.getDouble(3) <= first + 1e-9))
    }
    // if MMR never deviated from the relevance order the λ-penalty would be
    // dead code — at least one query must show a non-monotone qs sequence
    assert(byQ.values.exists { picks =>
      val seq = picks.sortBy(_.getLong(1)).map(_.getDouble(3))
      seq.sliding(2).exists { case Array(a, b) => b > a + 1e-9 }
    }, "diversity penalty never reordered any pick chain")
  }

  test("q380 cluster validity: silhouette bounds, positive indices, mass conservation") {
    val rows = run("q380_cluster_validity")
    assert(rows.length == 8)
    val corpus = graft.Tables(spark, dir, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == corpus, "clusters partition the corpus")
    rows.foreach { r =>
      val (msil, scat, db) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(msil >= -1.0 && msil <= 1.0, "silhouette is bounded by construction")
      assert(scat >= 0.0, "cosine distance scatter is non-negative")
      assert(db > 0.0, "Davies-Bouldin ratios of positive scatters are positive")
    }
  }

  test("q381 RBO: bounds, zero-iff-disjoint, and weight-mass ceiling") {
    val rows = run("q381_rbo_ann_fidelity")
    assert(rows.length == 10)
    val maxMass = 1 - math.pow(0.9, 5)
    rows.foreach { r =>
      val (nc, rbo, norm) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(nc >= 0 && nc <= 5)
      assert(rbo >= 0.0 && rbo <= maxMass + 1e-9, "RBO cannot exceed the truncated mass")
      assert(norm >= 0.0 && norm <= 1.0 + 1e-9)
      assert((rbo == 0.0) == (nc == 0), "zero overlap iff no common members")
      // 5 common members at identical ranks means full mass — and full
      // agreement is the ONLY way to reach it
      if (norm > 1.0 - 1e-4) assert(nc == 5)
    }
    // the IVF probe must find SOMETHING for the metric to mean anything
    assert(rows.exists(_.getLong(1) > 0), "ANN ranking never overlapped exact")
  }

  test("q374 Hill: positive tail exponent, frequency cut ordered") {
    val rows = run("q374_hill_zipf")
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) >= 17, "vocab must cover the k+1 cut")
      assert(r.getLong(2) >= r.getLong(3), "top frequency dominates the cut frequency")
      assert(r.getDouble(4) > 0.0, "Hill estimate is positive by construction")
    }
  }
}
