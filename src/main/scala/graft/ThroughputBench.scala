package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest-throughput measurement for the reference pipeline (BASELINE.md §c,
  * re-measured on the current build per VERDICT r6 task 6 — the ~700 K
  * lines/s figure predates the ZMTP framing and nanos columns).
  *
  * Synthesizes `events × REPS` OANDA wire lines (the q40 shape), writes
  * them to a capture file, then times:
  *   - scan:    newline-framed line read only (IO + framing floor)
  *   - parse:   + P3-P6 (blank filter, tolerant JSON parse, dispatch,
  *              typed validation)
  *   - derive:  + P8-P10 (spread coercion, two-format timestamp + nanos,
  *              display TZ)
  *   - encode:  + P12-P13 (protobuf wire encode) = the full q40 path
  *   - stream:  the same full path executed through the OandaReplaySource
  *              DataSourceV2 MicroBatchStream (Trigger.AvailableNow,
  *              rate-limited micro-batches) — the REAL streaming engine,
  *              checkpoint commits included
  *
  * Prints one JSON line: lines/s per stage plus the per-stage marginal
  * cost, so the figure BASELINE.md cites is reproducible:
  *   sbt "runMain graft.ThroughputBench"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_TPUT_REPS (default
  * 30), SPARK_GRAFT_TPUT_LPT (linesPerTrigger, default 500000).
  */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_TPUT_REPS", "30").toInt
    val lpt = sys.env.getOrElse("SPARK_GRAFT_TPUT_LPT", "500000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- synthesize the capture file (q40's wire shape, events × reps) ----
    import graft.streaming.WireLines._
    val lines = Tables(spark, sfDir, "events")
      .crossJoin(spark.range(reps).select(col("id").as("rep")))
      .select(tickLine(
        asks = array(level(col("value"), col("rep") + 1)),
        bids = array(level(col("value") - 0.01, lit(1L))),
        closeoutAsk = col("value"), closeoutBid = col("value") - 0.01,
        instrument = col("event_type"), time = isoMicros(col("ts"))).as("value"))
    val capDir = java.nio.file.Files.createTempDirectory("graft-tput").toString
    lines.repartition(1).write.mode("overwrite").text(s"$capDir/cap")
    // match part-* rather than a .txt suffix: a configured compression codec
    // renames the output part-*.txt.gz/.snappy and the suffix probe NPEs
    val capFile = new java.io.File(s"$capDir/cap").listFiles()
      .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
      .sortBy(_.getName).headOption
      .getOrElse(sys.error(s"no part-* file under $capDir/cap; contents: " +
        new java.io.File(s"$capDir/cap").listFiles().map(_.getName).mkString(", ")))
      .getAbsolutePath
    val nLines = spark.read.text(capFile).count()

    // warm codegen/reader paths once
    spark.read.text(capFile).limit(1000).count()

    def timed(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }
    import graft.streaming.OandaPipeline
    def scanDf: DataFrame = spark.read.text(capFile)
      .repartition(spark.sparkContext.defaultParallelism)
    val stages: Seq[(String, () => Long)] = Seq(
      "scan" -> (() => scanDf.count()),
      "parse" -> (() => OandaPipeline.parse(scanDf)
        .filter(col("message_type") === "price_tick").count()),
      "derive" -> (() => OandaPipeline.derive(OandaPipeline.parse(scanDf))
        .filter(col("spread") >= 0).count()),
      "encode" -> (() => OandaPipeline.pipeline(scanDf)
        .filter(length(col("proto")) > 0).count()))
    // median of 3 per stage — same discipline as Bench's slow tail
    val batch = stages.map { case (name, f) =>
      val runs = Seq.fill(3)(timed(f())._1).sorted
      name -> runs(1)
    }
    // fast-parser observability (same JVM in local mode): a near-zero hit
    // share means the synthesized corpus is falling back to Jackson and the
    // parse figure isn't measuring the fast path at all
    val hits = graft.functions.FastWireParser.fastHits.sum()
    val falls = graft.functions.FastWireParser.fallbacks.sum()
    System.err.println(s"[tput] fast-parse hits=$hits fallbacks=$falls")

    // ---- the streaming leg: real MicroBatchStream + checkpoints ----
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tput-ckpt").toString
    val (streamSec, _) = timed {
      val q = spark.readStream.format("oanda-replay")
        .option("path", capFile).option("linesPerTrigger", lpt.toString)
        .load()
      val out = OandaPipeline.pipeline(q)
        .groupBy("message_type").agg(count(col("proto")).as("n"))
      val sq = out.writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("tput")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      sq.awaitTermination()
      spark.table("tput").agg(sum("n")).collect()(0).getLong(0)
    }

    def r0(v: Double) = math.round(v)
    val m = batch.toMap
    val js = Seq(
      s""""n_lines":$nLines""",
      s""""scan_lps":${r0(nLines / m("scan"))}""",
      s""""parse_lps":${r0(nLines / m("parse"))}""",
      s""""derive_lps":${r0(nLines / m("derive"))}""",
      s""""encode_lps":${r0(nLines / m("encode"))}""",
      s""""stream_lps":${r0(nLines / streamSec)}""",
      s""""stage_sec":{${batch.map { case (k, v) => s""""$k":${"%.2f".format(v)}""" }.mkString(",")},"stream":${"%.2f".format(streamSec)}}""",
      s""""lines_per_trigger":$lpt""")
    println(s"""{"metric":"ingest_throughput",${js.mkString(",")}}""")
    spark.stop()
  }
}
