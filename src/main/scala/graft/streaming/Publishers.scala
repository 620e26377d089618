package graft.streaming

import java.net.Socket
import java.nio.ByteBuffer
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Sink-side publishing (SURVEY.md §2A P14-P16).
  *
  * The reference publishes each encoded message on a ZeroMQ PUB socket with
  * fire-and-forget semantics — a send error is logged and the stream
  * continues (`/root/reference/src/main.rs:89-93`, `publisher.rs:19-24`).
  * No ZeroMQ library exists in this environment, so the engine defines the
  * publisher as an interface with (a) an in-memory implementation for tests
  * and (b) a plain-TCP length-prefixed implementation documenting the wire
  * difference; a jeromq-backed PUB implementation is a drop-in third
  * implementation of the same trait when the jar is available.
  *
  * Delivery semantics note (SURVEY.md §7.3#4): ZMQ PUB is at-most-once;
  * Spark foreachBatch replays batches on recovery (at-least-once), so
  * subscribers that need exactly-once dedup on (batch_id, payload) — the
  * batch id is carried in the TCP frame header; a replayed batch re-sends
  * the same (batch_id, payload) pairs.
  */
trait MessagePublisher extends Serializable with AutoCloseable {
  /** Fire-and-forget publish of one encoded message; must not throw. */
  def publish(message: Array[Byte]): Unit
  /** Publish with the originating micro-batch id — the dedup key subscribers
    * use to get exactly-once on top of Spark's at-least-once batch replay
    * (SURVEY.md §7.3#4). Default ignores the id. */
  def publishBatch(batchId: Long, message: Array[Byte]): Unit = publish(message)
  override def close(): Unit = ()
}

/** Test/debug publisher collecting frames into a process-wide queue keyed by
  * name (local-mode executors share the JVM). */
final class InMemoryPublisher(name: String) extends MessagePublisher {
  override def publish(message: Array[Byte]): Unit =
    InMemoryPublisher.queue(name).add(message)
}
object InMemoryPublisher {
  private val queues = new java.util.concurrent.ConcurrentHashMap[String, ConcurrentLinkedQueue[Array[Byte]]]()
  def queue(name: String): ConcurrentLinkedQueue[Array[Byte]] =
    queues.computeIfAbsent(name, _ => new ConcurrentLinkedQueue[Array[Byte]]())
  def drain(name: String): Seq[Array[Byte]] = {
    val q = queue(name)
    Iterator.continually(q.poll()).takeWhile(_ != null).toSeq
  }
}

/** Plain-TCP stand-in for the ZMQ PUB socket. Frame layout: 4-byte
  * big-endian payload length, 8-byte big-endian micro-batch id, then the
  * protobuf payload — the batch id is the subscriber-side dedup key for
  * exactly-once over batch replay. Errors are logged and swallowed
  * (at-most-once per send, mirroring publisher.rs:19-24). */
final class TcpPublisher(host: String, port: Int) extends MessagePublisher {
  @transient private var opened = false
  @transient private lazy val socket = {
    opened = true
    try new Socket(host, port) catch {
      case e: Exception =>
        System.err.println(s"[publisher] connect to $host:$port failed — " +
          s"ALL messages from this partition will be dropped: ${e.getMessage}")
        null
    }
  }
  override def publish(message: Array[Byte]): Unit = publishBatch(-1L, message)
  override def publishBatch(batchId: Long, message: Array[Byte]): Unit =
    if (socket != null) try {
      val out = socket.getOutputStream
      out.write(ByteBuffer.allocate(12).putInt(message.length).putLong(batchId).array())
      out.write(message); out.flush()
    } catch {
      case e: Exception =>
        System.err.println(s"[publisher] send failed (message skipped): ${e.getMessage}")
    }
  override def close(): Unit = if (opened && socket != null) socket.close()
}

object Sinks {

  /** P14: publish the non-null `proto` column of a wire frame via
    * foreachBatch; each partition opens its own publisher (executor-side —
    * the node boundary of SURVEY.md §3.4#3). */
  def publishStream(wire: DataFrame, factory: () => MessagePublisher,
      checkpoint: String): StreamingQuery =
    wire.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.select("proto").where("proto IS NOT NULL")
          .foreachPartition { (it: Iterator[Row]) =>
            val p = factory()
            try it.foreach(r => p.publishBatch(batchId, r.getAs[Array[Byte]](0)))
            finally p.close()
          }
      }
      .start()

  /** P15: the dead-letter side — unknown/malformed rows retained with their
    * raw payload (strict superset of the reference's log-and-drop). */
  def deadLetters(parsed: DataFrame): DataFrame =
    parsed.filter(parsed("message_type").isin("unknown", "malformed"))
      .select("message_type", "raw")

  /** P16: graceful shutdown — stop the query on JVM shutdown (SIGTERM /
    * Ctrl-C ≙ main.rs:122-134), then let awaitTermination return. */
  def stopOnShutdown(q: StreamingQuery): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try q.stop() catch { case _: Exception => () }))
}
