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
  private def startContinuous(capture: Path, epoch: String = "1 second",
      checkpoint: Option[String] = None, sinkKey: Option[String] = None) = {
    val key = sinkKey.getOrElse(capture.toString)
    val sink = new ConcurrentLinkedQueue[(String, String, Array[Byte])]()
    ContinuousCollector.queues.put(key, sink)
    val wire = OandaPipeline.pipeline(
      spark.readStream.format("oanda-replay")
        .option("path", capture.toString)
        .option("pollMs", "5")
        .load())
      .selectExpr("message_type", "tick.instrument AS instrument", "proto")
    var w = wire.writeStream
      .trigger(Trigger.Continuous(epoch))
      .foreach(new ContinuousCollector(key))
    checkpoint.foreach(c => w = w.option("checkpointLocation", c))
    val q = w.start()
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

  private def tickFor(instrument: String): String =
    tickLine.replace("EUR_USD", instrument)

  test("kill-and-restart resumes from the committed epoch checkpoint (no loss)") {
    // The reference's liveness gap closed at per-record latency: a
    // continuous query dies mid-stream and a restart must pick up from the
    // COMMITTED epoch offset — never from zero (duplicating the world) and
    // never past it (losing records). File transport stands in for the
    // wire; the epoch-checkpoint machinery under test is transport-blind.
    val capture = newCapture(tickFor("L1"), tickFor("L2"), tickFor("L3"))
    val ckpt = Files.createTempDirectory("graft-cont-ckpt").toString
    val (q1, sink1) = startContinuous(capture, epoch = "100 milliseconds",
      checkpoint = Some(ckpt), sinkKey = Some(ckpt + "#1"))
    try {
      eventually(timeout(Span(60, Seconds)), interval(Span(1, Seconds))) {
        assert(sink1.size >= 3)
        // wait for an epoch COMMIT covering all three lines, so the restart
        // has a durable offset to resume from
        val commits = new java.io.File(ckpt, "commits").list()
        assert(commits != null && commits.exists(_.forall(_.isDigit)))
        val offsets = new java.io.File(ckpt, "offsets").listFiles()
        val maxLine = offsets.filter(_.getName.forall(_.isDigit))
          .flatMap(f => """"line":(\d+)""".r.findAllMatchIn(
            new String(Files.readAllBytes(f.toPath))).map(_.group(1).toLong))
        assert(maxLine.nonEmpty && maxLine.max >= 3)
      }
    } finally q1.stop()

    appendLine(capture, tickFor("L4"))
    appendLine(capture, tickFor("L5"))
    OandaReplayContinuousStream.plannedStarts.clear()
    val (q2, sink2) = startContinuous(capture, epoch = "100 milliseconds",
      checkpoint = Some(ckpt), sinkKey = Some(ckpt + "#2"))
    try {
      eventually(timeout(Span(60, Seconds)), interval(Span(1, Seconds))) {
        assert(sink2.asScala.exists(_._2 == "L4"))
        assert(sink2.asScala.exists(_._2 == "L5"))
      }
      // ALL of the restart's epoch plans for THIS capture (a retry or
      // reconfiguration replans; a concurrent stream uses another path) —
      // every one must resume from a restored committed offset, never zero
      val planned = OandaReplayContinuousStream.plannedStarts.asScala
        .filter(_._1 == capture.toString).map(_._2).toSeq
      assert(planned.nonEmpty && planned.forall(_ >= 1),
        s"restart planned from $planned — expected restored committed " +
          "offsets only, not a from-zero replay")
      // at-least-once across the restart boundary: nothing below the
      // LOWEST resume offset may re-flow (subset, not exact equality —
      // a replan after early emissions legitimately overlaps the tail),
      // and nothing is lost (union check below)
      val minResume = planned.min
      val allowed = ((minResume + 1) to 5L).map(i => s"L$i").toSet
      val seen2 = sink2.asScala.map(_._2).toSet
      assert(seen2.subsetOf(allowed),
        s"restart emitted $seen2 — rows below resume offset $minResume re-flowed")
      val all = sink1.asScala.map(_._2).toSet ++ seen2
      assert((1 to 5).map(i => s"L$i").toSet.subsetOf(all), s"records lost: $all")
    } finally q2.stop()
  }

  test("continuous HTTP reader survives a mid-stream disconnect (reconnect arm)") {
    // The micro-batch transport's reconnect spec, mirrored onto the
    // per-record arm: the wire drops after two lines, the in-task transport
    // reconnects (oanda_client.rs:89-92 is the gap — its producer task just
    // dies), and the reader keeps emitting with no query-visible failure.
    val cfg = graft.Config("token", "acct", "fxpractice", "EUR_USD", "tcp://*:9500")
    val served = new java.util.concurrent.atomic.AtomicInteger(0)
    val connector = new HttpConnector {
      override def get(url: String, headers: Map[String, String]): HttpConnector.Response =
        served.getAndIncrement() match {
          case 0 => // two lines, then a hard disconnect (IOException)
            HttpConnector.Response(200, new java.io.InputStream {
              private val bytes = "l1\nl2\n".getBytes("UTF-8"); private var i = 0
              override def read(): Int =
                if (i < bytes.length) { i += 1; bytes(i - 1) & 0xff }
                else throw new java.io.IOException("connection reset")
            })
          case _ => // reconnected: two more lines, then block like a live wire
            HttpConnector.Response(200, new java.io.InputStream {
              private val bytes = "l3\nl4\n".getBytes("UTF-8"); private var i = 0
              private val latch = new java.util.concurrent.CountDownLatch(1)
              override def read(): Int =
                if (i < bytes.length) { i += 1; bytes(i - 1) & 0xff }
                else { latch.await(); -1 } // released by close()
              // serve what is available per call — the JDK default loops
              // single-byte reads until the buffer FILLS, which would park
              // the decoder before it ever returns the served lines
              override def read(b: Array[Byte], off: Int, len: Int): Int = {
                if (i >= bytes.length) { latch.await(); return -1 }
                val n = math.min(len, bytes.length - i)
                System.arraycopy(bytes, i, b, off, n); i += n; n
              }
              override def close(): Unit = latch.countDown()
            })
        }
    }
    val reader = new ContinuousHttpLineReader(pollMs = 2, maxBuffered = 10,
      mkTransport = mb => new HttpLineTransport(cfg, connector, mb))
    try {
      val got = (1 to 4).map { _ =>
        assert(reader.next())
        reader.get().getUTF8String(0).toString
      }
      assert(got == Seq("l1", "l2", "l3", "l4"),
        s"lines must flow ACROSS the disconnect in order, got $got")
      assert(reader.transport.connects >= 2, "the transport must have reconnected")
      assert(reader.getOffset.asInstanceOf[LinePartitionOffset].line == 4L)
    } finally reader.close()
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
