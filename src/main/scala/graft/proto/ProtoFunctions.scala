package graft.proto

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions encoding the reference wire contract
  * (`StreamMessageProto`, oanda_stream.proto:27-32) straight from Spark's
  * internal row format — no UDF serialization hop. Sink-side encode runs
  * once per row at the pipeline edge, so eval-mode (CodegenFallback) costs
  * nothing measurable next to the network write it feeds (P13/P14).
  */
object ProtoFunctions {

  /** `StreamMessageProto{price_tick=...}` from (tick struct, event_ts, nanos).
    * Tick struct field order: asks, bids, closeout_ask, closeout_bid,
    * instrument, status, time (see OandaPipeline.parse). */
  def encodePriceTickEnvelope(tick: Column, eventTs: Column, nanos: Column): Column =
    column(EncodePriceTickEnvelope(expression(tick), expression(eventTs), expression(nanos)))

  /** `StreamMessageProto{heartbeat=...}` from (hb struct, event_ts, nanos).
    * Heartbeat struct field order: time, message_type. */
  def encodeHeartbeatEnvelope(hb: Column, eventTs: Column, nanos: Column): Column =
    column(EncodeHeartbeatEnvelope(expression(hb), expression(eventTs), expression(nanos)))

  private[proto] def levels(arr: ArrayData): Seq[(String, Long)] =
    (0 until arr.numElements()).map { i =>
      val row = arr.getStruct(i, 2)
      (Option(row.getUTF8String(0)).map(_.toString).getOrElse(""), row.getLong(1))
    }

  private[proto] def str(row: InternalRow, i: Int): String =
    if (row.isNullAt(i)) "" else row.getUTF8String(i).toString
}

/** Proto timestamp pieces from a µs TimestampType value + the 9-digit nanos
  * sidecar (SURVEY.md §7.3#1): seconds = floor(µs / 1e6); nanos = sidecar
  * when present (full wire fidelity) else the µs remainder × 1000. */
trait TimestampPieces {
  def pieces(microsRaw: Any, nanosRaw: Any): (Long, Int) = {
    val micros = microsRaw.asInstanceOf[Long]
    val seconds = Math.floorDiv(micros, 1000000L)
    val nanos =
      if (nanosRaw != null) nanosRaw.asInstanceOf[Int]
      else (Math.floorMod(micros, 1000000L) * 1000L).toInt
    (seconds, nanos)
  }
}

case class EncodePriceTickEnvelope(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback with TimestampPieces {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "encode_price_tick_proto"

  override def eval(input: InternalRow): Any = {
    val tickRaw = first.eval(input)
    val tsRaw = second.eval(input)
    if (tickRaw == null || tsRaw == null) return null
    val tick = tickRaw.asInstanceOf[InternalRow]
    val (seconds, nanos) = pieces(tsRaw, third.eval(input))
    val body = ProtoWire.priceTick(
      ProtoFunctions.levels(tick.getArray(0)),
      ProtoFunctions.levels(tick.getArray(1)),
      ProtoFunctions.str(tick, 2), ProtoFunctions.str(tick, 3),
      ProtoFunctions.str(tick, 4), ProtoFunctions.str(tick, 5),
      seconds, nanos)
    ProtoWire.envelope(1, body)
  }

  override protected def nullSafeEval(t: Any, ts: Any, n: Any): Any =
    throw new IllegalStateException("eval overridden")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

case class EncodeHeartbeatEnvelope(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback with TimestampPieces {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "encode_heartbeat_proto"

  override def eval(input: InternalRow): Any = {
    val hbRaw = first.eval(input)
    val tsRaw = second.eval(input)
    if (hbRaw == null || tsRaw == null) return null
    val hb = hbRaw.asInstanceOf[InternalRow]
    val (seconds, nanos) = pieces(tsRaw, third.eval(input))
    ProtoWire.envelope(2,
      ProtoWire.heartbeat(seconds, nanos, ProtoFunctions.str(hb, 1)))
  }

  override protected def nullSafeEval(t: Any, ts: Any, n: Any): Any =
    throw new IllegalStateException("eval overridden")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}
