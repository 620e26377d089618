package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Discrimination properties for the round-8 depth wave (q357–q365) that
  * the value-hash oracle can't express: metric laws (k-center's radius
  * curve), decision invariants (pruning fractions, gate implications), and
  * degenerate-input behavior. Runs on the sf0.001/sf0.01 fixtures. */
class DepthWave8Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private def run(name: String, dir: String) =
    graft.SparkEntry.queries(name)(spark, dir).collect()

  test("q358 k-center: radii non-increasing, strictly positive, picks distinct") {
    val rows = run("q358_kcenter_coreset", "/root/testdata/sf0.01")
    assert(rows.length == 8)
    val radii = rows.sortBy(_.getLong(0)).map(_.getDouble(2))
    assert(radii.head == 0.0) // seed pick carries no covering radius yet
    // Gonzalez invariant: each pick's max-min distance can only shrink —
    // a violation means the running min-distance update lost a center
    radii.tail.sliding(2).foreach { case Array(a, b) => assert(a >= b) }
    assert(radii.tail.forall(_ > 0.0))
    val ids = rows.map(_.getLong(1))
    assert(ids.distinct.length == 8)
  }

  test("q359 prototype prune: exact tenth per cluster, id sums partition the cluster") {
    val rows = run("q359_prototype_prune", "/root/testdata/sf0.01")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, pruned) = (r.getLong(1), r.getLong(2))
      assert(pruned == n / 10) // the cut is n div 10, never a float fraction
    }
    // pruned + kept id sums must equal the cluster's full id mass: the two
    // checksums PARTITION the assignment (no row dropped or double-counted)
    val assignTotal = rows.map(r => r.getLong(3) + r.getLong(4)).sum
    val vecIdTotal = graft.Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .agg(org.apache.spark.sql.functions.sum("vec_id")).collect()(0).getLong(0)
    assert(assignTotal == vecIdTotal)
  }

  test("q362 scene cuts: cut count bounded by pair count; single-frame clips are all-zero") {
    val rows = run("q362_scene_cuts", "/root/testdata/sf0.01")
    rows.foreach { r =>
      val (nf, cuts, first) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cuts <= math.max(0L, nf - 1))
      // strictly-above-mean rule: at least one pair diff sits AT or below
      // the mean, so a multi-pair clip can never be all-cuts
      if (nf > 2) assert(cuts < nf - 1)
      if (nf == 1) assert(cuts == 0 && first == 0 && r.getLong(4) == 0)
      if (cuts > 0) assert(first >= 2 && first <= nf)
    }
    assert(rows.exists(_.getLong(2) > 0), "threshold rule never fired")
    assert(rows.exists(r => r.getLong(1) > 1 && r.getLong(2) == 0) ||
      rows.exists(_.getLong(1) == 1), "threshold rule always fired")
  }

  test("q361 audio decimate: halved geometry and container law") {
    val rows = run("q361_audio_decimate", "/root/testdata/sf0.01")
    rows.foreach { r =>
      val (n, out, bytes) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(out == (n + 1) / 2)
      assert(bytes == 44 + 2 * out) // RIFF/PCM16 size law on the NEW geometry
      assert(r.getInt(3) == 4000)
    }
  }

  test("q363 chat render: keep gate implies both structural conditions") {
    val rows = run("q363_chat_sft_render", "/root/testdata/sf0.01")
    rows.foreach { r =>
      val (turns, chars, kept) = (r.getLong(2), r.getLong(3), r.getLong(5))
      assert(kept == (if (turns >= 2 && chars <= 128) 1L else 0L))
    }
    // both gates must genuinely bite on the fixture or the query proves nothing
    assert(rows.exists(_.getLong(5) == 1L))
    assert(rows.exists(r => r.getLong(2) < 2))
    assert(rows.exists(r => r.getLong(2) >= 2 && r.getLong(3) > 128))
  }

  test("q364 survivorship: provenance matches the field rule on every pair") {
    val rows = run("q364_golden_record", "/root/testdata/sf0.01")
    assert(rows.nonEmpty)
    // every provenance class must occur (the rules genuinely discriminate)
    val nameSrc = rows.map(_.getString(3)).toSet
    val centsSrc = rows.map(_.getString(5)).toSet
    assert(nameSrc.contains("tie") && nameSrc.contains("clean"))
    assert(Set("clean", "dirty", "tie").subsetOf(centsSrc))
    // drift is the stewardship measure: bounded by the synthesis (±2 cents)
    assert(rows.forall(r => r.getLong(8) <= 2))
  }

  test("q365 LM tertiles: thirds by construction, head outscores tail") {
    val rows = run("q365_lm_score_tertiles", "/root/testdata/sf0.01")
    val byBucket = rows.map(r => r.getString(0) -> r).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    val n = rows.map(_.getLong(1)).sum
    assert(byBucket("head").getLong(1) == n / 3)
    val avg = (b: String) => byBucket(b).getLong(3)
    assert(avg("head") > avg("middle") && avg("middle") > avg("tail"))
  }

  test("q357 Wasserstein: zero on identical halves, positive on the fixture split") {
    val rows = run("q357_wasserstein_drift", "/root/testdata/sf0.01")
    assert(rows.nonEmpty)
    // W1 is a metric: the fixture's parity halves differ, so every series
    // must report a strictly positive distance consistent with its numerator
    rows.foreach { r =>
      val (nr, nc, num, w1) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(num > 0 && w1 > 0.0)
      assert(math.abs(w1 - num.toDouble / (nr * nc)) < 1e-6 + 1e-9)
    }
  }
}
