package graft.proto

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions encoding the reference wire contract
  * (`StreamMessageProto`, oanda_stream.proto:27-32) straight from Spark's
  * internal row format — no UDF serialization hop. Both expressions carry
  * real `doGenCode` (a static-helper call over codegen'd child values):
  * round 7's throughput re-measure showed the earlier CodegenFallback
  * form evicting the ENTIRE sink projection from whole-stage codegen
  * (CollapseCodegenStages rejects any plan node containing a fallback
  * expression), which made the encode stage the pipeline's bottleneck.
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

  /** Java-callable encode bodies shared by eval and generated code (the
    * object's static forwarders make `ProtoFunctions.tickEnvelope(...)`
    * valid in janino-generated Java). `nanos` boxed, null ⇒ derive from the
    * µs remainder — the timestamp-pieces contract (SURVEY.md §7.3#1):
    * seconds = floorDiv(µs, 1e6); nanos = the 9-digit sidecar when present
    * (full wire fidelity) else floorMod(µs, 1e6) × 1000. */
  def tickEnvelope(tick: InternalRow, micros: Long, nanos: java.lang.Integer): Array[Byte] = {
    val seconds = Math.floorDiv(micros, 1000000L)
    val ns = if (nanos != null) nanos.intValue()
      else (Math.floorMod(micros, 1000000L) * 1000L).toInt
    ProtoWire.envelope(1, ProtoWire.priceTick(
      levels(tick.getArray(0)), levels(tick.getArray(1)),
      str(tick, 2), str(tick, 3), str(tick, 4), str(tick, 5),
      seconds, ns))
  }

  def heartbeatEnvelope(hb: InternalRow, micros: Long, nanos: java.lang.Integer): Array[Byte] = {
    val seconds = Math.floorDiv(micros, 1000000L)
    val ns = if (nanos != null) nanos.intValue()
      else (Math.floorMod(micros, 1000000L) * 1000L).toInt
    ProtoWire.envelope(2, ProtoWire.heartbeat(seconds, ns, str(hb, 1)))
  }
}

/** Shared doGenCode for the two envelope encoders: evaluate the three
  * children in the enclosing generated stage, then call the static encode
  * body — null iff the struct or the timestamp is null (a null nanos
  * sidecar falls back to the µs remainder, so it is passed BOXED). */
private[proto] trait EnvelopeCodegen { self: TernaryExpression =>
  protected def helperName: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = children.head.genCode(ctx)
    val s = children(1).genCode(ctx)
    val n = children(2).genCode(ctx)
    ev.copy(code = code"""
      ${t.code}
      ${s.code}
      ${n.code}
      boolean ${ev.isNull} = true;
      byte[] ${ev.value} = null;
      if (!${t.isNull} && !${s.isNull}) {
        ${ev.value} = graft.proto.ProtoFunctions.$helperName(
          ${t.value}, ${s.value},
          ${n.isNull} ? null : java.lang.Integer.valueOf(${n.value}));
        ${ev.isNull} = false;
      }""")
  }
}

case class EncodePriceTickEnvelope(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with EnvelopeCodegen {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "encode_price_tick_proto"
  override protected def helperName: String = "tickEnvelope"

  override def eval(input: InternalRow): Any = {
    val tickRaw = first.eval(input)
    val tsRaw = second.eval(input)
    if (tickRaw == null || tsRaw == null) return null
    ProtoFunctions.tickEnvelope(tickRaw.asInstanceOf[InternalRow],
      tsRaw.asInstanceOf[Long], third.eval(input).asInstanceOf[java.lang.Integer])
  }

  override protected def nullSafeEval(t: Any, ts: Any, n: Any): Any =
    throw new IllegalStateException("eval overridden")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

case class EncodeHeartbeatEnvelope(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with EnvelopeCodegen {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "encode_heartbeat_proto"
  override protected def helperName: String = "heartbeatEnvelope"

  override def eval(input: InternalRow): Any = {
    val hbRaw = first.eval(input)
    val tsRaw = second.eval(input)
    if (hbRaw == null || tsRaw == null) return null
    ProtoFunctions.heartbeatEnvelope(hbRaw.asInstanceOf[InternalRow],
      tsRaw.asInstanceOf[Long], third.eval(input).asInstanceOf[java.lang.Integer])
  }

  override protected def nullSafeEval(t: Any, ts: Any, n: Any): Any =
    throw new IllegalStateException("eval overridden")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}
