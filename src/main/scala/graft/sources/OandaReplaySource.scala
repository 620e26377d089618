package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom streaming source for the OANDA wire (SURVEY.md §2A P1/P2/P7,
  * §4.2#3): a DataSourceV2 `MicroBatchStream` that frames a captured stream
  * file into newline-delimited records and feeds them out in rate-limited
  * micro-batches.
  *
  * The reference's source is an HTTP chunked stream
  * (`/root/reference/src/oanda_client.rs:10-39`) framed into lines
  * (`:34-48`) with a bounded channel as backpressure (`main.rs:52`, cap
  * 100). The offset/commit/planInputPartitions machinery here is
  * transport-independent over the [[LineTransport]] seam: `transport=file`
  * (default) replays a capture file — the only transport exercisable in a
  * zero-egress environment — and `transport=http` runs [[HttpLineTransport]],
  * the live-wire twin (bearer auth, fail-fast non-2xx, chunk-safe framing,
  * bounded buffer, reconnect), unit-tested against a fake connector in
  * HttpLineTransportSpec. `linesPerTrigger` (default 100, the reference's
  * channel capacity) is the backpressure knob ≙ P7; the passed ReadLimit is
  * honored (maxOffsetsPerTrigger etc.), and Trigger.AvailableNow drains the
  * whole capture in rate-limited batches.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("oanda-replay")
  *     .option("path", "/data/capture.jsonl")
  *     .option("linesPerTrigger", "100")
  *     .load()                       // schema: value STRING
  * }}}
  */
class OandaReplayProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "oanda-replay"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OandaReplaySource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new OandaReplayTable(properties.get("path"),
      Option(properties.get("linesPerTrigger")).map(_.toInt).getOrElse(100),
      Option(properties.get("transport")).getOrElse("file"))
}

object OandaReplaySource {
  val schema: StructType = StructType(Seq(StructField("value", StringType)))
}

class OandaReplayTable(path: String, linesPerTrigger: Int, transport: String = "file")
    extends Table with SupportsRead {
  require(transport == "http" || path != null, "oanda-replay requires option 'path'")
  override def name(): String = s"oanda-replay(${if (transport == "http") "http" else path})"
  override def schema(): StructType = OandaReplaySource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava

  private def newTransport(): LineTransport = transport match {
    case "file" => new FileLineTransport(path)
    case "http" =>
      // live wire: config from env exactly like the reference's main
      // (config.rs:14-36); errors carry the reference's usage text
      val cfg = graft.Config.fromEnv().fold(
        err => throw new IllegalArgumentException(s"$err\n\n${graft.Config.usage}"),
        identity)
      new HttpLineTransport(cfg, HttpConnector.Jdk, maxBuffered = linesPerTrigger)
    case other => throw new IllegalArgumentException(
      s"unknown transport '$other' (expected file|http)")
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = OandaReplaySource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new OandaReplayMicroBatchStream(newTransport(), linesPerTrigger)
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] = {
          // a live HTTP stream has no finite extent to batch-scan; fail with
          // intent instead of NPE-ing on the absent capture path
          if (transport == "http") throw new UnsupportedOperationException(
            "oanda-replay: batch read is only supported for transport=file " +
              "(a live HTTP pricing stream has no finite extent); use readStream")
          Array(LineRangePartition(path, 0L, Long.MaxValue))
        }
        override def createReaderFactory(): PartitionReaderFactory = LineReaderFactory
      }
    }
}

/** Offset = number of lines already emitted (monotone). */
case class LineOffset(line: Long) extends Offset {
  override def json(): String = s"""{"line":$line}"""
}

case class LineRangePartition(path: String, start: Long, end: Long) extends InputPartition

object LineReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LineRangePartition]
    new PartitionReader[InternalRow] {
      private val stream = LineIo.lineStream(p.path) // plain or .gz capture
      private val it = stream.skip(p.start)
        .limit(math.max(0L, p.end - p.start)).iterator()
      private var current: String = _
      override def next(): Boolean = { val has = it.hasNext; if (has) current = it.next(); has }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(current))
      override def close(): Unit = stream.close() // one FD per partition otherwise
    }
  }
}

class OandaReplayMicroBatchStream(transport: LineTransport, linesPerTrigger: Int)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  /** Replay-path convenience constructor (the round-1 signature). */
  def this(path: String, linesPerTrigger: Int) =
    this(new FileLineTransport(path), linesPerTrigger)

  /** Head frozen at prepare time so Trigger.AvailableNow drains exactly the
    * lines that existed when the run started, in rate-limited batches, then
    * stops — instead of truncating at one batch (round-1 bug: latestOffset
    * ignored run-to-completion triggers). */
  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(transport.head())

  override def initialOffset(): Offset = LineOffset(0L)

  /** Rate control (P7, ≙ the reference's bounded channel cap): each
    * micro-batch admits at most linesPerTrigger lines past `start`. */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(linesPerTrigger.toLong)

  /** Upper bound implied by a ReadLimit for a batch starting at `start`
    * with stream head `head` (ReadMinRows and other non-capping limits put
    * no upper bound). */
  private def applyLimit(start: Long, head: Long, limit: ReadLimit): Long = limit match {
    case r: ReadMaxRows => math.min(head, start + r.maxRows())
    case _: ReadAllAvailable => head
    case c: CompositeReadLimit => c.getReadLimits.map(applyLimit(start, head, _)).min
    case _ => head
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[LineOffset].line
    val head = availableNowCap.getOrElse(transport.head())
    // a dead transport with nothing left to deliver must fail the query,
    // not hang it (the reference's silent-idle liveness gap, SURVEY §3.2)
    transport.failure.filter(_ => head <= s).foreach(e => throw e)
    LineOffset(math.max(s, applyLimit(s, head, limit)))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is used")

  override def deserializeOffset(json: String): Offset =
    LineOffset("""\d+""".r.findFirstIn(json).map(_.toLong).getOrElse(0L))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    transport.planPartitions(
      start.asInstanceOf[LineOffset].line, end.asInstanceOf[LineOffset].line)

  override def createReaderFactory(): PartitionReaderFactory = transport.readerFactory
  override def commit(end: Offset): Unit =
    transport.commit(end.asInstanceOf[LineOffset].line)
  override def stop(): Unit = transport.close()
}
