package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
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
  * 100). This connector reproduces that contract against a capture file —
  * the only transport available in a zero-egress environment; a live HTTP
  * transport is the same class with the line iterator reading a chunked
  * response body instead of a file (the offset/commit/planInputPartitions
  * machinery is transport-independent). `linesPerTrigger` (default 100,
  * the reference's channel capacity) is the backpressure knob ≙ P7.
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
      Option(properties.get("linesPerTrigger")).map(_.toInt).getOrElse(100))
}

object OandaReplaySource {
  val schema: StructType = StructType(Seq(StructField("value", StringType)))
}

class OandaReplayTable(path: String, linesPerTrigger: Int)
    extends Table with SupportsRead {
  require(path != null, "oanda-replay requires option 'path'")
  override def name(): String = s"oanda-replay($path)"
  override def schema(): StructType = OandaReplaySource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = OandaReplaySource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new OandaReplayMicroBatchStream(path, linesPerTrigger)
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          Array(LineRangePartition(path, 0L, Long.MaxValue))
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
      private val stream = Files.lines(Paths.get(p.path), StandardCharsets.UTF_8)
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

class OandaReplayMicroBatchStream(path: String, linesPerTrigger: Int)
    extends MicroBatchStream with SupportsAdmissionControl {

  /** Total lines in the capture — the "stream head" this replay can reach.
    * Counted lazily once; a live transport would instead track the bytes
    * received so far. */
  private lazy val totalLines: Long = {
    val s = Files.lines(Paths.get(path), StandardCharsets.UTF_8)
    try s.count() finally s.close()
  }

  override def initialOffset(): Offset = LineOffset(0L)

  /** Rate control (P7, ≙ the reference's bounded channel cap): each
    * micro-batch admits at most linesPerTrigger lines past `start`. */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(linesPerTrigger.toLong)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[LineOffset].line
    LineOffset(math.min(totalLines, s + linesPerTrigger))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is used")

  override def deserializeOffset(json: String): Offset =
    LineOffset("""\d+""".r.findFirstIn(json).map(_.toLong).getOrElse(0L))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LineOffset].line
    val e = end.asInstanceOf[LineOffset].line
    // chunk the admitted range so partitions parallelize across threads
    val chunk = math.max(1L, (e - s) / 4)
    (s until e by chunk)
      .map(lo => LineRangePartition(path, lo, math.min(e, lo + chunk)))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = LineReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
