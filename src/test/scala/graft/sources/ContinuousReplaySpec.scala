package graft.sources

import java.nio.file.{Files, Path, StandardOpenOption}
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import graft.SparkTestSession
import graft.streaming.OandaPipeline
import org.apache.spark.sql.{ForeachWriter, Row}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.time.{Seconds, Span}

/** Continuous-processing arm of the replay source (BASELINE.json north star:
  * "Structured Streaming with continuous processing"; the reference's own
  * execution model is a per-record loop, `main.rs:67-121`). Proves the
  * stateless P3→P13 forward pipeline — parse → derive → encode — actually
  * RUNS under Trigger.Continuous as epoch-marked long-lived tasks, that a
  * live-appended capture tails through with per-record latency, and that
  * the wire bytes match the micro-batch path exactly.
  */
class ContinuousReplaySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val tickLine =
    """{"asks":[{"price":"1.08425","liquidity":1000000}],"bids":[{"price":"1.08405","liquidity":500000}],""" +
      """"closeoutAsk":"1.08430","closeoutBid":"1.08410","instrument":"EUR_USD",""" +
      """"status":"tradeable","time":"2024-01-15T09:30:00.123456789Z"}"""
  private val hbLine = """{"type":"HEARTBEAT","time":"2024-01-15T09:30:05Z"}"""

  private def newCapture(lines: String*): Path = {
    val dir = Files.createTempDirectory("graft-cont")
    val f = dir.resolve("capture.jsonl")
    Files.write(f, lines.asJava)
    f
  }

  private def appendLine(f: Path, line: String): Unit =
    Files.write(f, java.util.Arrays.asList(line),
      StandardOpenOption.APPEND) // whole line + \n in one call (tail contract)

  /** Runs the full forward pipeline continuously into an in-memory
    * collector; returns (query, collected rows queue). */
  private def startContinuous(capture: Path, epoch: String = "1 second") = {
    val sink = new ConcurrentLinkedQueue[(String, String, Array[Byte])]()
    ContinuousCollector.queues.put(capture.toString, sink)
    val wire = OandaPipeline.pipeline(
      spark.readStream.format("oanda-replay")
        .option("path", capture.toString)
        .option("pollMs", "5")
        .load())
      .selectExpr("message_type", "tick.instrument AS instrument", "proto")
    val q = wire.writeStream
      .trigger(Trigger.Continuous(epoch))
      .foreach(new ContinuousCollector(capture.toString))
      .start()
    (q, sink)
  }

  test("records flow end-to-end under Trigger.Continuous (parse→derive→encode)") {
    val capture = newCapture(tickLine, hbLine)
    val (q, sink) = startContinuous(capture)
    try {
      eventually(timeout(Span(60, Seconds)), interval(Span(1, Seconds))) {
        assert(sink.size >= 2)
      }
      val rows = sink.asScala.toSeq
      val tick = rows.find(_._1 == "price_tick").get
      assert(tick._2 == "EUR_USD")
      // wire bytes are byte-identical to the direct construction — the
      // continuous path reuses the exact same codegen'd encode expressions
      val expected = graft.proto.ProtoWire.envelope(1, graft.proto.ProtoWire.priceTick(
        Seq(("1.08425", 1000000L)), Seq(("1.08405", 500000L)),
        "1.08430", "1.08410", "EUR_USD", "tradeable",
        java.time.Instant.parse("2024-01-15T09:30:00Z").getEpochSecond, 123456789))
      assert(tick._3.sameElements(expected))
      assert(rows.exists(_._1 == "heartbeat"))
      // the run really is continuous execution, not micro-batch in disguise
      import org.apache.spark.sql.execution.streaming.continuous.ContinuousExecution
      val underlying = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery
      assert(underlying.isInstanceOf[ContinuousExecution],
        s"expected ContinuousExecution, got ${underlying.getClass}")
    } finally q.stop()
  }

  test("a live-appended capture tails through the continuous query (unbounded source)") {
    val capture = newCapture(tickLine)
    val (q, sink) = startContinuous(capture)
    try {
      eventually(timeout(Span(60, Seconds)), interval(Span(1, Seconds))) {
        assert(sink.size >= 1)
      }
      // the reader is now blocked at EOF, tailing; appends must flow through
      appendLine(capture, hbLine)
      appendLine(capture, tickLine)
      eventually(timeout(Span(60, Seconds)), interval(Span(1, Seconds))) {
        assert(sink.size >= 3)
      }
      assert(sink.asScala.count(_._1 == "price_tick") >= 2)
      assert(sink.asScala.exists(_._1 == "heartbeat"))
    } finally q.stop()
  }
}

/** Executor-side per-record collector (same-JVM local mode, like
  * InMemoryPublisher): ForeachWriter is the per-record sink continuous mode
  * supports — foreachBatch is micro-batch-only by definition. */
final class ContinuousCollector(key: String)
    extends ForeachWriter[Row] {
  override def open(partitionId: Long, epochId: Long): Boolean = true
  override def process(r: Row): Unit =
    ContinuousCollector.queues.get(key).add(
      (r.getAs[String]("message_type"), r.getAs[String]("instrument"),
        r.getAs[Array[Byte]]("proto")))
  override def close(errorOrNull: Throwable): Unit = ()
}

object ContinuousCollector {
  val queues = new java.util.concurrent.ConcurrentHashMap[
    String, ConcurrentLinkedQueue[(String, String, Array[Byte])]]()
}
