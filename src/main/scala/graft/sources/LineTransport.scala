package graft.sources

import java.io.{BufferedReader, InputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import graft.Config
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.unsafe.types.UTF8String

/** Transport seam of the OANDA source (SURVEY.md §2A P1/P2/P7): the
  * offset/commit/planInputPartitions machinery of
  * [[OandaReplayMicroBatchStream]] is transport-independent; implementations
  * only answer "how many lines exist so far" and "give me lines [start,
  * end)". Two transports:
  *
  *   - [[FileLineTransport]] — replays a capture file; partitions are
  *     (path, range) so executors read the file themselves.
  *   - [[HttpLineTransport]] — the live-wire twin of the reference's
  *     `connect_to_stream` (`/root/reference/src/oanda_client.rs:10-39`):
  *     chunked GET with bearer auth, newline framing, bounded in-flight
  *     buffer as backpressure (≙ the mpsc channel cap at `main.rs:52`), plus
  *     the reconnect-on-disconnect the reference lacks (its producer task
  *     just exits at `oanda_client.rs:89-92` — SURVEY §3.2's liveness gap).
  */
trait LineTransport extends AutoCloseable {
  /** Absolute count of lines available so far (the stream head). Monotone;
    * may grow between calls for a live transport. Never throws — terminal
    * transport failure is surfaced via [[failure]]. */
  def head(): Long

  /** Partitions covering lines [start, end). Must be replayable for any
    * range at or past the last committed offset (micro-batch retry). */
  def planPartitions(start: Long, end: Long): Array[InputPartition]

  def readerFactory: PartitionReaderFactory

  /** Lines below `upTo` are durably committed downstream; the transport may
    * discard them and release backpressure. */
  def commit(upTo: Long): Unit = ()

  /** Terminal failure, if the transport can produce no further lines
    * (non-2xx connect, reconnect budget exhausted). Already-buffered lines
    * stay readable; the stream fails once they are drained. */
  def failure: Option[Throwable] = None

  override def close(): Unit = ()
}

/** Line-stream opener shared by the transport head-count (driver) and the
  * partition readers (executors): real capture files ship gzipped, so a
  * `.gz` path decodes through GZIPInputStream transparently. */
object LineIo {
  def lineStream(path: String): java.util.stream.Stream[String] =
    if (path.endsWith(".gz")) {
      val in = new java.util.zip.GZIPInputStream(
        java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path)), 1 << 16)
      val br = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
      br.lines().onClose(() => br.close())
    } else
      java.nio.file.Files.lines(java.nio.file.Paths.get(path), StandardCharsets.UTF_8)

  /** Raw reader over a (possibly gzipped) capture — the tail-capable opener
    * for the continuous reader: after `readLine()` returns null at EOF, a
    * later call picks up lines appended to a PLAIN file since (gzip streams
    * cannot grow; a continuous query over a .gz capture drains it and then
    * idles). */
  def lineReader(path: String): BufferedReader = {
    val raw = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
    val in = if (path.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw, 1 << 16) else raw
    new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
  }
}

/** Replay transport: a finite newline-delimited capture file (plain or
  * gzip). The head is counted once (a capture does not grow) unless
  * `tail=true`, which re-counts per call so a live-appended capture keeps
  * feeding micro-batches (the latency-bench twin of the continuous tail).
  * Partition readers open the file on the executor, so no line data moves
  * through the driver. */
final class FileLineTransport(path: String, tail: Boolean = false) extends LineTransport {
  private def countLines(): Long = {
    val s = LineIo.lineStream(path)
    try s.count() finally s.close()
  }
  private lazy val totalLines: Long = countLines()

  override def head(): Long = if (tail) countLines() else totalLines

  override def planPartitions(start: Long, end: Long): Array[InputPartition] =
    if (path.endsWith(".gz"))
      // gzip is unsplittable: a range reader must decode from byte 0, so N
      // chunked partitions would decode the stream N times. One partition
      // per admitted range; a deployment needing parallel replay of big
      // captures recompresses to a splittable codec or splits the files.
      Array(LineRangePartition(path, start, end))
    else {
      // chunk the admitted range so partitions parallelize across threads
      val chunk = math.max(1L, (end - start) / 4)
      (start until end by chunk)
        .map(lo => LineRangePartition(path, lo, math.min(end, lo + chunk)))
        .toArray[InputPartition]
    }

  override def readerFactory: PartitionReaderFactory = LineReaderFactory
}

/** Minimal HTTP seam so the live transport is unit-testable without a
  * network: one chunked GET. The production connector is [[HttpConnector.Jdk]]. */
trait HttpConnector {
  def get(url: String, headers: Map[String, String]): HttpConnector.Response
}

object HttpConnector {
  /** Status code + (chunked) body stream of a GET. */
  final case class Response(status: Int, body: InputStream)

  /** JDK-only production connector (`HttpURLConnection`); read timeout 0 =
    * block forever, matching a long-lived pricing stream. */
  object Jdk extends HttpConnector {
    override def get(url: String, headers: Map[String, String]): Response = {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("GET")
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      conn.setConnectTimeout(30000)
      conn.setReadTimeout(0)
      val status = conn.getResponseCode
      val body =
        if (status >= 400) Option(conn.getErrorStream).getOrElse(InputStream.nullInputStream())
        else conn.getInputStream
      Response(status, body)
    }
  }
}

/** A micro-batch of buffered lines shipped with the partition (driver-side
  * buffering, like Spark's own socket source): batches are bounded by
  * `linesPerTrigger`, so a partition carries at most that many lines. */
final case class BufferedLinesPartition(lines: Array[String]) extends InputPartition

object BufferedLinesReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val lines = partition.asInstanceOf[BufferedLinesPartition].lines
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < lines.length }
      override def get(): InternalRow = InternalRow(UTF8String.fromString(lines(i)))
      override def close(): Unit = ()
    }
  }
}

/** Live-wire transport mirroring `oanda_client.rs:10-39`:
  *
  *   - GET `config.streamUrl` with `Authorization: Bearer <token>`
  *     (`oanda_client.rs:23-26`).
  *   - Non-2xx fails fast with no retry, like `error_for_status`
  *     (`oanda_client.rs:28-30`) — an auth/config error does not heal.
  *   - The body is framed into `\n`-delimited lines (`:34-48`); framing is
  *     chunk-boundary-safe (a line split across two chunks reassembles).
  *   - At most `maxBuffered` uncommitted lines are held; the reader blocks
  *     beyond that (backpressure ≙ `mpsc::channel(100)`, `main.rs:52`).
  *   - Mid-stream disconnect or EOF (a live pricing stream never ends
  *     cleanly) reconnects up to `maxReconnects` consecutive failures —
  *     the liveness fix over the reference, which lets the producer die
  *     (`oanda_client.rs:89-92`). Lines ticked during the gap are gone
  *     (the OANDA stream is live-only, no resume cursor) — same data
  *     contract as the reference, minus the permanent stall.
  */
final class HttpLineTransport(
    config: Config,
    http: HttpConnector,
    maxBuffered: Int = 100,
    maxReconnects: Int = 3)
  extends LineTransport {

  private val lock = new Object
  private var base = 0L // absolute index of buf(0) = last committed offset
  private val buf = scala.collection.mutable.ArrayBuffer.empty[String]
  private var terminal: Option[Throwable] = None
  @volatile private var closed = false
  // the in-flight response body: close() must close it, because a reader
  // blocked in readLine() on a no-timeout socket ignores Thread.interrupt —
  // without this every stopped query leaks the thread AND holds the HTTP
  // stream open (duplicate consumption if a new query starts)
  @volatile private var inFlight: InputStream = _

  /** GETs issued so far (observable for reconnect tests). */
  @volatile private[sources] var connects = 0

  private final class FailFast(val e: Throwable) extends RuntimeException(e)

  private val reader = new Thread(() => runReader(), "oanda-http-reader")
  reader.setDaemon(true)
  reader.start()

  private def runReader(): Unit = {
    var consecutiveFailures = 0
    var done = false
    while (!done && !closed) {
      try {
        connects += 1
        val resp = http.get(config.streamUrl,
          Map("Authorization" -> s"Bearer ${config.authToken}"))
        if (resp.status < 200 || resp.status >= 300)
          throw new FailFast(new java.io.IOException(
            s"OANDA stream returned HTTP ${resp.status}"))
        inFlight = resp.body
        if (closed) { try resp.body.close() catch { case _: Exception => () }; return }
        val br = new BufferedReader(new InputStreamReader(resp.body, StandardCharsets.UTF_8))
        try {
          var line = br.readLine()
          while (line != null && !closed) {
            offer(line)
            consecutiveFailures = 0 // progress heals the reconnect budget
            line = br.readLine()
          }
          if (!closed) throw new java.io.IOException("stream ended (EOF)")
        } finally { br.close(); inFlight = null }
      } catch {
        case f: FailFast => done = true; fail(f.e)
        case _: InterruptedException => done = true
        case e: Exception =>
          consecutiveFailures += 1
          if (consecutiveFailures > maxReconnects) { done = true; fail(e) }
      }
    }
  }

  private def offer(line: String): Unit = lock.synchronized {
    while (!closed && buf.size >= maxBuffered) lock.wait()
    if (!closed) { buf += line; lock.notifyAll() }
  }

  private def fail(e: Throwable): Unit = lock.synchronized {
    if (terminal.isEmpty) terminal = Some(e)
    lock.notifyAll()
  }

  override def head(): Long = lock.synchronized(base + buf.size)

  override def failure: Option[Throwable] = lock.synchronized(terminal)

  override def planPartitions(start: Long, end: Long): Array[InputPartition] =
    lock.synchronized {
      require(start >= base, s"range [$start,$end) starts below committed offset $base")
      // a range past the buffered head means a checkpoint replay this fresh
      // transport never buffered (live stream, no resume cursor): surface it
      // loudly instead of returning a silently-empty batch
      require(end <= base + buf.size,
        s"range [$start,$end) extends past buffered head ${base + buf.size}: " +
          "uncommitted-batch replay against a fresh live transport is not replayable")
      val lines = buf.slice((start - base).toInt, (end - base).toInt).toArray
      Array(BufferedLinesPartition(lines))
    }

  override def readerFactory: PartitionReaderFactory = BufferedLinesReaderFactory

  override def commit(upTo: Long): Unit = lock.synchronized {
    if (upTo > base) {
      buf.remove(0, math.min(buf.size, (upTo - base).toInt))
      base = upTo
      lock.notifyAll() // release backpressure
    }
  }

  override def close(): Unit = {
    closed = true
    lock.synchronized(lock.notifyAll())
    // closing the body makes the blocked readLine() throw, so the reader
    // thread actually exits and the server-side stream is released
    val s = inFlight
    if (s != null) { try s.close() catch { case _: Exception => () } }
    reader.interrupt()
  }
}
