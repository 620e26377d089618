package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Scale-shape and semantics checks for the pipeline-operator family
  * (decontamination, repetition gate, scrubbing, packing). */
class PipelineQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("q334 erasure: every table loses subjects, every kept frame audits orphan-free") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = SparkEntry.queries("q334_gdpr_erasure")(spark, d).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      assert(rows.keySet == Set("customer", "orders", "lineitem", "events"))
      rows.foreach { case (t, (before, erased, after, orphans)) =>
        assert(erased > 0, s"$d/$t: nothing erased — subject hash drifted")
        assert(before == erased + after, s"$d/$t: counts do not reconcile")
        assert(orphans == 0, s"$d/$t: $orphans orphans survived the cascade")
      }
      // the subject rate is the designed ~2% of customers
      val (cb, ce, _, _) = rows("customer")
      assert(ce * 100 >= cb && ce * 100 <= cb * 3, s"$d: subject rate $ce/$cb")
      spark.catalog.clearCache()
    }
  }

  test("q335 phrase search: positional matches are internally consistent") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = SparkEntry.queries("q335_phrase_search")(spark, d).collect()
      val phrases = rows.map(_.getString(0)).distinct
      assert(phrases.length == 3, s"$d: ${phrases.toSeq}")
      phrases.foreach { p =>
        val pr = rows.filter(_.getString(0) == p).sortBy(_.getLong(3))
        assert(pr.map(_.getLong(3)).sameElements(1L to pr.length.toLong))
        val (nDocs, nHits) = (pr.head.getLong(1), pr.head.getLong(2))
        assert(nHits >= nDocs && nDocs >= pr.length,
          s"$d/$p: hits $nHits docs $nDocs rows ${pr.length}")
        // ranked doc hit counts are non-increasing
        pr.map(_.getLong(5)).sliding(2).foreach(w =>
          if (w.length == 2) assert(w(0) >= w(1), s"$d/$p: rank order broken"))
        assert(p.split(" ").length == 3, s"$d: phrase '$p' is not a trigram")
      }
      spark.catalog.clearCache()
    }
  }

  test("q52 decontamination joins hash keys with a broadcast benchmark side") {
    val df = SparkEntry.queries("q52_decontaminate")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the quintile cutoff flows back as a 1-row broadcast scalar (a
    // nested-loop join of the output frame × one row is the INTENDED
    // shape); what must NOT appear is a data-sized single-partition
    // window — the rank behind the cutoff is DistributedRank's
    // range-partitioned two-pass
    import org.apache.spark.sql.execution.window.WindowExecBase
    val bad = df.queryExecution.executedPlan.collect {
      case w: WindowExecBase if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, "unpartitioned WindowExec in q52's plan")
    spark.catalog.clearCache()
  }

  test("q52 quantile gate flags roughly the top-quintile overlap") {
    val out = SparkEntry.queries("q52_decontaminate")(spark, dir)
    // every train doc appears exactly once; the quantile gate flags ~20%
    // (ties at the cutoff may widen it slightly) and is monotone in the
    // overlap fraction
    val rows = out.collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    val flagged = rows.count(_.getBoolean(3))
    assert(flagged >= rows.length / 6 && flagged <= rows.length / 3,
      s"$flagged of ${rows.length} flagged")
    val minFlagged = rows.filter(_.getBoolean(3)).map(_.getDouble(2)).min
    val maxClean = rows.filter(!_.getBoolean(3)).map(_.getDouble(2)).max
    assert(maxClean <= minFlagged, s"gate not monotone: $maxClean vs $minFlagged")
  }

  test("q53 repetition metrics bound correctly") {
    val rows = SparkEntry.queries("q53_repetition")(spark, dir).collect()
    rows.foreach { r =>
      val distinctRatio = r.getDouble(2)
      val topBi = r.getDouble(3)
      val dupTri = r.getDouble(4)
      assert(distinctRatio > 0 && distinctRatio <= 1.0, r)
      assert(topBi > 0 && topBi <= 1.0001, r)
      assert(dupTri >= 0 && dupTri <= 1.0, r)
    }
    assert(rows.exists(_.getBoolean(5)) && rows.exists(!_.getBoolean(5)))
  }

  test("q54 scrub masks entities and changes the fingerprint only when it hits") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q54_text_scrub")(spark, dir)
      .join(graft.Tables(spark, dir, "documents"), "doc_id")
      .select(col("doc_id"), col("n_ent"), col("scrubbed_fp"), md5(col("text")).as("raw_fp"))
      .collect()
    out.foreach { r =>
      val hit = r.getLong(1) > 0
      assert((r.getString(2) != r.getString(3)) == hit, r)
    }
  }

  test("q55 packing window is partitioned (no single-partition global sort)") {
    val df = SparkEntry.queries("q55_seq_packing")(spark, dir)
    // the running sum must be partitioned by the shard key (lang), never a
    // global single-partition window
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      df.queryExecution.optimizedPlan.toString))
  }

  test("q49b TPC-H Q5 plans broadcasts for the small dims, no nested loop") {
    val df = SparkEntry.queries("q49b_sql_tpch_q5")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // at least nation/region/supplier should resolve to broadcast hash joins
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 3, s"expected >=3 broadcast joins, got $nBroadcast\n$plan")
  }

  test("q57 incremental dedup is an anti join on the hash, never on text") {
    val df = SparkEntry.queries("q57_incremental_dedup")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q55 packing never exceeds the budget boundary semantics") {
    val rows = SparkEntry.queries("q55_seq_packing")(spark, dir).collect()
    rows.foreach { r =>
      val nTok = r.getLong(2); val seqNo = r.getLong(3); val off = r.getLong(4)
      assert(off >= 0 && off < 512, r)
      assert(seqNo >= 0, r)
      assert(nTok > 0, r)
    }
  }

  test("q59 bloom pre-filter has no false negatives and a small FP rate") {
    val rows = SparkEntry.queries("q59_bloom_prefilter")(spark, dir).collect()
    assert(rows.nonEmpty)
    // Bloom contract: every exact duplicate MUST hit the filter
    rows.foreach { r =>
      if (r.getBoolean(2)) assert(r.getBoolean(1), s"false negative: $r")
    }
    // and non-duplicates rarely should (m=4096, k=3, n≈400 ⇒ ~1-2%)
    val clean = rows.filter(!_.getBoolean(2))
    val fp = clean.count(_.getBoolean(1))
    assert(fp.toDouble / clean.length < 0.1, s"$fp/${clean.length} false positives")
  }

  test("q59 bloom filter is built as an aggregate and broadcast to the probe side") {
    val df = SparkEntry.queries("q59_bloom_prefilter")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q61 dup-span detection flags every exact-duplicate doc") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q61_dup_spans")(spark, dir)
    // an exact content duplicate shares every shingle with its twin, so its
    // duplicated-position fraction is 1.0 and it must be flagged
    val dupDocs = graft.Tables(spark, dir, "documents")
      .groupBy(md5(col("text")).as("h"))
      .agg(collect_list(col("doc_id")).as("ids"), count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select(explode(col("ids")).as("doc_id"))
    val missed = dupDocs.join(out.filter(!col("flagged")), "doc_id").count()
    assert(missed == 0, s"$missed exact-duplicate docs not flagged")
    // and the gate separates: some docs flagged, most not
    val rows = out.collect()
    val flagged = rows.count(_.getBoolean(4))
    assert(flagged > 0 && flagged < rows.length / 2, s"$flagged of ${rows.length}")
  }

  test("q60 token budget: per-lang cumulative sums stay within budget and hash order") {
    val rows = SparkEntry.queries("q60_token_budget")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r => assert(r.getLong(3) <= 2048 && r.getLong(2) > 0, r) }
    // within each lang the selection is a prefix: cum_tok values are the
    // running sums of the selected docs' n_tok in selection order
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(3))
      var cum = 0L
      sorted.foreach { r => cum += r.getLong(2); assert(r.getLong(3) == cum, r) }
    }
  }

  test("q167 K-fold: per-stratum fold sizes are exact (differ by at most 1)") {
    val rows = SparkEntry.queries("q167_stratified_kfold")(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_._2).map(_._2.size)
      assert(sizes.size == 5, s"$lang has ${sizes.size} folds")
      assert(sizes.max - sizes.min <= 1,
        s"$lang folds uneven: ${sizes.toSeq.sorted}")
    }
    spark.catalog.clearCache()
  }

  test("q184 DSIR weights equal an independent in-memory derivation") {
    import graft.functions.PortableHash
    val sf = "/root/testdata/sf0.001" // 500 docs — brute-force scale
    val out = SparkEntry.queries("q184_dsir_selection")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // independent reference: same arithmetic in plain Scala (md5 twin,
    // math.log, HALF_UP rounds, exact decimal sum)
    def r6(x: Double) = BigDecimal.decimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val feats = docs.flatMap { case (id, lang, text) =>
      text.split(" ", -1).map(t => (id, lang, PortableHash.md5LongScala(t) % 256))
    }
    val nt = feats.count(_._2 == "en").toLong
    val nr = feats.length.toLong
    val ct = feats.filter(_._2 == "en").groupBy(_._3).map { case (f, xs) => f -> xs.length }
    val cr = feats.groupBy(_._3).map { case (f, xs) => f -> xs.length }
    val lw = cr.map { case (f, c) =>
      f -> r6(math.log((ct.getOrElse(f, 0) + 1.0) / (nt + 256))
            - math.log((c + 1.0) / (nr + 256)))
    }
    val expected = feats.filter(_._2 != "en").groupBy(_._1).toSeq
      .map { case (id, xs) =>
        val s = xs.map(x => lw(x._3)).sum
        (id, xs.length.toLong,
          BigDecimal.decimal(s.toDouble / xs.length)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, _, w) => (-w, id) }
      .take(50)
    assert(out.toSeq == expected)
    spark.catalog.clearCache()
  }

  test("q197 logreg gate genuinely learns: accuracy strictly above majority baseline") {
    val row = SparkEntry.queries("q197_logreg_gd")(spark, dir).head()
    val (nCorrect, n) = (row.getAs[Long]("n_correct"), row.getAs[Long]("n"))
    // majority baseline at sf0.01: 277 positive / 500 docs (q36c gate)
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(n == docs)
    val majority = math.max(277L, docs - 277L)
    assert(nCorrect > majority + 100,
      s"trained gate $nCorrect/$n should clearly beat majority $majority")
    // weights must be non-trivial (not the all-zero init, not bias-only)
    assert(row.getAs[Long]("w1") != 0L)
    spark.catalog.clearCache()
  }

  test("q201 holdout gate generalizes: held-out accuracy beats the held-out majority") {
    val row = SparkEntry.queries("q201_holdout_eval")(spark, dir).head()
    val (tp, fp, tn, fneg) = (row.getAs[Long]("tp"), row.getAs[Long]("fp"),
      row.getAs[Long]("tn"), row.getAs[Long]("fneg"))
    val nTest = row.getAs[Long]("n_test")
    assert(tp + fp + tn + fneg == nTest)
    val majority = math.max(tp + fneg, tn + fp) // best constant predictor
    assert(tp + tn > majority + 20,
      s"holdout ${tp + tn}/$nTest should clearly beat majority $majority")
    spark.catalog.clearCache()
  }

  test("q200 calibration bins are monotone in predicted probability and partition the corpus") {
    val bins = SparkEntry.queries("q200_calibration")(spark, dir).collect()
    val preds = bins.map(_.getAs[Long]("pred_milli"))
    assert(preds.sameElements(preds.sorted), "bin means must increase with bin index")
    val total = bins.map(_.getAs[Long]("n")).sum
    assert(total == spark.read.parquet(s"$dir/documents.parquet").count())
    spark.catalog.clearCache()
  }

  test("q198 exact AUC matches a brute-force pair count per source") {
    val out = SparkEntry.queries("q198_auc_eval")(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("np"), r.getAs[Long]("nn"), r.getAs[Long]("u2")))
      .toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "n_chars", "lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2) == "en"))
    for ((src, group) <- docs.groupBy(_._1)) {
      val pos = group.filter(_._3).map(_._2)
      val neg = group.filterNot(_._3).map(_._2)
      // 2U = 2·#{(p,n): p>n} + #{(p,n): p==n}  (tie-corrected Mann–Whitney)
      val u2 = pos.map(p => 2L * neg.count(p > _) + neg.count(p == _)).sum
      assert(out(src) == (pos.length.toLong, neg.length.toLong, u2),
        s"source $src: got ${out(src)}, want (${pos.length},${neg.length},$u2)")
    }
    spark.catalog.clearCache()
  }
}
