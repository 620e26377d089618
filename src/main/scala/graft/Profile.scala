package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-job wall-clock profiler for a single registry query (round-11 perf
  * triage, guide §1/§7): runs the named queries under the EXACT Bench
  * session config and prints one line per Spark job — start offset,
  * duration, stage/task counts, and the callsite/description — so a
  * multi-round query's cost decomposes into its passes without the UI
  * (disabled in the bench sandbox). Diagnostic only; never part of a
  * declared query path. */
object Profile {
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
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup as Bench
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
      spark.range(2).selectExpr(
        "md5(trim(regexp_replace(lower(concat('A b', string(id))), '\\\\s+', ' ')))",
        "initcap(lower(upper(string(id))))").collect()
    } catch { case _: Throwable => () }

    final case class JobRec(id: Int, t0: Long, desc: String,
                            var tEnd: Long = 0L, var nStages: Int = 0, var nTasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.put(e.jobId, JobRec(e.jobId, e.time, desc))
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId); if (r != null) r.tEnd = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        // attribute stages to the most recent unfinished job (good enough
        // for a sequential local profile)
        val it = jobs.values().iterator()
        var best: JobRec = null
        while (it.hasNext) {
          val r = it.next()
          if (r.tEnd == 0L && (best == null || r.id > best.id)) best = r
        }
        if (best != null) { best.nStages += 1; best.nTasks += e.stageInfo.numTasks }
      }
    })

    val names = if (args.nonEmpty) args.toSeq
                else Seq("q221_suffix_array_lcp")
    names.foreach { name =>
      jobs.clear(); order.clear()
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      try graft.operators.DistributedRank.unpersistAll() catch { case _: Throwable => () }
      println(s"\n===== $name  total=${"%.2f".format(total)}s  jobs=${jobs.size} =====")
      var wall0 = Long.MaxValue
      val recs = {
        import scala.jdk.CollectionConverters._
        order.asScala.toSeq.flatMap(id => Option(jobs.get(id)))
      }
      recs.foreach(r => if (r.t0 < wall0) wall0 = r.t0)
      recs.foreach { r =>
        val dur = if (r.tEnd > 0) (r.tEnd - r.t0) / 1e3 else -1.0
        println(f"  job ${r.id}%3d  +${(r.t0 - wall0) / 1e3}%7.2fs  ${dur}%7.2fs  " +
          f"stages=${r.nStages}%2d tasks=${r.nTasks}%4d  ${r.desc.take(110)}")
      }
    }
    spark.stop()
  }
}
