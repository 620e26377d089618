package graft.sources

import graft.SparkTestSession
import graft.streaming.OandaPipeline
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The custom MicroBatchStream connector (P1/P2/P7): line framing, schema,
  * rate-limited micro-batches, exactly-once line accounting, and composition
  * with the full pipeline. */
class OandaReplaySourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def captureFile(lines: Seq[String]): String = {
    val f = Files.createTempFile("oanda-capture", ".jsonl")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  private val ticks = (1 to 10).map { i =>
    s"""{"asks":[{"price":"1.0$i","liquidity":100}],"bids":[{"price":"1.00","liquidity":100}],""" +
      s""""closeoutAsk":"1.0$i","closeoutBid":"1.00","instrument":"EUR_USD",""" +
      s""""status":"tradeable","time":"2024-01-15T09:30:0${i % 10}Z"}"""
  }

  test("streaming read: all lines delivered once, rate-limited micro-batches") {
    val path = captureFile(ticks)
    val name = s"replay_${System.nanoTime()}"
    val batchSizes = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("oanda-replay")
      .option("path", path).option("linesPerTrigger", "3").load()
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("replay-ckpt").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes += df.count(); ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(batchSizes.sum == 10)
    assert(batchSizes.forall(_ <= 3)) // linesPerTrigger honored (P7 backpressure)
    assert(batchSizes.size >= 4)      // 10 lines at ≤3/batch
  }

  test("composes with the full pipeline: source → parse → derive → proto → publish") {
    val path = captureFile(ticks ++ Seq("{bad", """{"type":"HEARTBEAT","time":"2024-01-15T09:31:00Z"}"""))
    val lines = spark.readStream.format("oanda-replay")
      .option("path", path).option("linesPerTrigger", "5").load()
    val name = s"replaypipe_${System.nanoTime()}"
    val q = OandaPipeline.pipeline(lines)
      .writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("replay-ckpt2").toString)
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    val byType = spark.table(name).groupBy("message_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("price_tick" -> 10L, "heartbeat" -> 1L, "malformed" -> 1L))
  }

  test("checkpoint restart resumes at the committed offset without duplicates") {
    val path = captureFile(ticks)
    val ckpt = Files.createTempDirectory("replay-restart").toString
    val pub = s"replay_restart_${System.nanoTime()}"
    // memory sink can't recover from a checkpoint; foreachBatch can
    def run(): Unit = {
      val q = spark.readStream.format("oanda-replay")
        .option("path", path).option("linesPerTrigger", "4").load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r =>
            graft.streaming.InMemoryPublisher.queue(pub).add(r.getString(0).getBytes))
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(graft.streaming.InMemoryPublisher.drain(pub).size == 10)
    // restart against the same checkpoint: offsets resume at the end, the
    // (already fully consumed) capture must not be re-emitted
    run()
    assert(graft.streaming.InMemoryPublisher.drain(pub).isEmpty)
  }

  test("Trigger.AvailableNow drains the whole capture in rate-limited batches") {
    // round-1 bug: latestOffset ignored the passed ReadLimit and only ever
    // advanced one linesPerTrigger chunk, so run-to-completion triggers
    // silently truncated a capture longer than one batch
    val path = captureFile(ticks)
    val name = s"replay_an_${System.nanoTime()}"
    val q = spark.readStream.format("oanda-replay")
      .option("path", path).option("linesPerTrigger", "3").load()
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("replay-an").toString)
      .format("memory").queryName(name).start()
    try q.awaitTermination(60000) finally q.stop()
    assert(spark.table(name).count() == 10, "AvailableNow must drain all 10 lines")
  }

  test("batch read of the same capture works through the same table") {
    val path = captureFile(ticks)
    val n = spark.read.format("oanda-replay").option("path", path).load().count()
    assert(n == 10)
  }

  test("batch read with transport=http fails with intent, not an NPE") {
    val e = intercept[Exception] {
      spark.read.format("oanda-replay").option("transport", "http").load().count()
    }
    // Spark may wrap the planner exception; the root message must survive
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("batch read is only supported for transport=file")),
      s"got: ${messages(e)}")
  }

  test("gzip capture replays identically to the plain file (streaming + batch)") {
    val plain = captureFile(ticks)
    val gz = Files.createTempFile("oanda-capture", ".jsonl.gz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gz))
    try out.write(ticks.mkString("\n").getBytes("UTF-8")) finally out.close()
    def drain(path: String): Seq[String] = {
      val name = s"gzrep_${System.nanoTime()}"
      val q = spark.readStream.format("oanda-replay")
        .option("path", path).option("linesPerTrigger", "4").load()
        .writeStream
        .option("checkpointLocation", Files.createTempDirectory("gz-ckpt").toString)
        .format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
      spark.table(name).collect().map(_.getString(0)).toSeq.sorted
    }
    assert(drain(gz.toString) == drain(plain), "gzip stream diverges from plain")
    val batchGz = spark.read.format("oanda-replay").option("path", gz.toString)
      .load().collect().map(_.getString(0)).toSeq.sorted
    assert(batchGz == drain(plain), "gzip batch read diverges")
  }
}
