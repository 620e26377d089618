package graft

import java.nio.file.{Files, Path, StandardOpenOption}
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{ForeachWriter, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Per-record end-to-end latency of the reference's forward path
  * (parse→derive→encode, `/root/reference/src/main.rs:67-121`) under
  * Trigger.Continuous vs short-interval micro-batch — the empirical answer
  * to the north star's "Structured Streaming with continuous processing"
  * clause.
  *
  * Method: a driver thread appends one tick line every `intervalMs` whose
  * instrument field carries the send time (`T<nanoTime>`); a per-record
  * ForeachWriter sink records receive time; latency = receive − send,
  * after a warmup prefix is discarded. Both modes run the IDENTICAL plan
  * over the IDENTICAL source (`oanda-replay`, file transport tailing the
  * same growing capture): continuous tails with pollMs=1 inside one
  * long-lived task; micro-batch re-plans per trigger with tail=true head
  * recounts and Trigger.ProcessingTime(0).
  *
  * Usage: `sbt "runMain graft.LatencyBench [continuous|microbatch] [n] [intervalMs]"`
  * Prints one JSON line: {"metric":"record_latency","mode":...,"n":...,
  * "p50_ms":...,"p90_ms":...,"p99_ms":...,"mean_ms":...}
  */
object LatencyBench {
  val received = new ConcurrentHashMap[String, Long]()

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("continuous")
    val n = args.lift(1).map(_.toInt).getOrElse(300)
    val intervalMs = args.lift(2).map(_.toLong).getOrElse(20L)
    val warmup = math.min(100, n / 3)

    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("graft-latency")
    val capture = dir.resolve("capture.jsonl")
    Files.write(capture, java.util.Collections.singletonList(line("WARM0")))

    val src = spark.readStream.format("oanda-replay")
      .option("path", capture.toString)
      .option("pollMs", "1")
      .option("tail", "true")             // micro-batch head recount per trigger
      .option("linesPerTrigger", "10000") // don't rate-limit the bench
      .load()
    val wire = graft.streaming.OandaPipeline.pipeline(src)
      .selectExpr("tick.instrument AS instrument", "proto")
    val writer = wire.writeStream
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .foreach(new LatencyCollector)
    val q = (mode match {
      case "continuous" => writer.trigger(Trigger.Continuous("1 second"))
      case "microbatch" => writer.trigger(Trigger.ProcessingTime(0L))
      case other => sys.error(s"unknown mode '$other' (continuous|microbatch)")
    }).start()

    // wait for the warm seed record to flow — query fully up before timing
    val deadline = System.nanoTime() + 120e9.toLong
    while (!received.containsKey("WARM0") && System.nanoTime() < deadline)
      Thread.sleep(10)
    require(received.containsKey("WARM0"), s"query never delivered the seed record ($mode)")

    val sent = new java.util.ArrayList[String]()
    var i = 0
    while (i < n) {
      val key = s"T${System.nanoTime()}"
      append(capture, line(key))
      sent.add(key)
      i += 1
      Thread.sleep(intervalMs)
    }
    // drain: every sent record must arrive (at-least-once; keyed map dedups)
    val drainDeadline = System.nanoTime() + 120e9.toLong
    while (received.size < sent.size() + 1 && System.nanoTime() < drainDeadline)
      Thread.sleep(20)
    q.stop()

    import scala.jdk.CollectionConverters._
    val lat = sent.asScala.drop(warmup).flatMap { key =>
      Option(received.get(key)).map(recv => (recv - key.drop(1).toLong) / 1e6)
    }.toSeq.sorted
    require(lat.nonEmpty, "no measured records survived warmup")
    def pct(p: Double): Double =
      lat(math.min(lat.size - 1, (p * lat.size).toInt))
    println(f"""{"metric":"record_latency","mode":"$mode","n":${lat.size},""" +
      f""""delivered":${received.size - 1},"sent":${sent.size()},""" +
      f""""p50_ms":${pct(0.50)}%.2f,"p90_ms":${pct(0.90)}%.2f,""" +
      f""""p99_ms":${pct(0.99)}%.2f,"mean_ms":${lat.sum / lat.size}%.2f}""")
    spark.stop()
  }

  private def line(instrument: String): String =
    s"""{"asks":[{"price":"1.08425","liquidity":1000000}],"bids":[{"price":"1.08405","liquidity":500000}],""" +
      s""""closeoutAsk":"1.08430","closeoutBid":"1.08410","instrument":"$instrument",""" +
      s""""status":"tradeable","time":"2024-01-15T09:30:00.123456789Z"}"""

  private def append(f: Path, s: String): Unit =
    Files.write(f, java.util.Collections.singletonList(s), StandardOpenOption.APPEND)
}

/** Per-record receive-time recorder (same-JVM local mode). */
final class LatencyCollector extends ForeachWriter[Row] {
  override def open(partitionId: Long, epochId: Long): Boolean = true
  override def process(r: Row): Unit = {
    val k = r.getAs[String]("instrument")
    LatencyBench.received.putIfAbsent(k, System.nanoTime())
  }
  override def close(errorOrNull: Throwable): Unit = ()
}
