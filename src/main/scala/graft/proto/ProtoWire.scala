package graft.proto

import java.io.ByteArrayOutputStream

/** Minimal proto3 wire-format writer/reader (public format, see
  * protobuf.dev/programming-guides/encoding). Implements exactly the three
  * shapes the reference contract needs — varint, length-delimited, embedded
  * message — with proto3 default-skipping semantics (a scalar equal to its
  * default is not emitted; an explicitly-present embedded message always is),
  * matching prost's encoder so the byte stream is what reference subscribers
  * already decode (`/root/reference/proto/oanda_stream.proto:7-32`).
  *
  * No protobuf-java dependency exists in this environment; the format is
  * simple enough that a clean-room encoder is smaller than a descriptor
  * bootstrap would be.
  */
object ProtoWire {

  final class Writer {
    private val out = new ByteArrayOutputStream()

    def writeVarint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
    }

    private def tag(field: Int, wire: Int): Unit = writeVarint((field.toLong << 3) | wire)

    /** string/bytes field — skipped when empty (proto3 default). */
    def strField(field: Int, s: String): Unit =
      if (s != null && s.nonEmpty) bytesField(field, s.getBytes("UTF-8"))

    def bytesField(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); writeVarint(b.length.toLong); out.write(b)
    }

    /** varint scalar — skipped when zero (proto3 default). */
    def uintField(field: Int, v: Long): Unit =
      if (v != 0L) { tag(field, 0); writeVarint(v) }

    /** embedded message — always emitted (presence semantics). */
    def msgField(field: Int, body: Array[Byte]): Unit = bytesField(field, body)

    def toBytes: Array[Byte] = out.toByteArray
  }

  /** google.protobuf.Timestamp: seconds=1, nanos=2. */
  def timestamp(seconds: Long, nanos: Int): Array[Byte] = {
    val w = new Writer
    w.uintField(1, seconds)
    w.uintField(2, nanos.toLong)
    w.toBytes
  }

  /** PriceLevelProto: price=1, liquidity=2 (oanda_stream.proto:7-10). */
  def priceLevel(price: String, liquidity: Long): Array[Byte] = {
    val w = new Writer
    w.strField(1, price)
    w.uintField(2, liquidity)
    w.toBytes
  }

  /** PriceTickProto (oanda_stream.proto:12-20). `time` always present
    * (prost Option::Some, main.rs:170). */
  def priceTick(asks: Seq[(String, Long)], bids: Seq[(String, Long)],
      closeoutAsk: String, closeoutBid: String, instrument: String,
      status: String, seconds: Long, nanos: Int): Array[Byte] = {
    val w = new Writer
    asks.foreach { case (p, l) => w.msgField(1, priceLevel(p, l)) }
    bids.foreach { case (p, l) => w.msgField(2, priceLevel(p, l)) }
    w.strField(3, closeoutAsk)
    w.strField(4, closeoutBid)
    w.strField(5, instrument)
    w.strField(6, status)
    w.msgField(7, timestamp(seconds, nanos))
    w.toBytes
  }

  /** HeartbeatProto: time=1 (message), type=2 (oanda_stream.proto:22-25). */
  def heartbeat(seconds: Long, nanos: Int, tpe: String): Array[Byte] = {
    val w = new Writer
    w.msgField(1, timestamp(seconds, nanos))
    w.strField(2, tpe)
    w.toBytes
  }

  /** StreamMessageProto envelope: oneof price_tick=1 | heartbeat=2. */
  def envelope(oneofField: Int, body: Array[Byte]): Array[Byte] = {
    val w = new Writer
    w.msgField(oneofField, body)
    w.toBytes
  }

  // ----- reader (round-trip tests + subscriber-side decode) -----

  final case class Field(number: Int, wire: Int, varint: Long, bytes: Array[Byte])

  /** Decode one message's top-level fields in stream order. */
  def readFields(b: Array[Byte]): Seq[Field] = {
    var i = 0
    def varint(): Long = {
      var shift = 0; var v = 0L
      var more = true
      while (more) {
        val x = b(i) & 0xff; i += 1
        v |= (x & 0x7fL) << shift; shift += 7; more = (x & 0x80) != 0
      }
      v
    }
    val out = Seq.newBuilder[Field]
    while (i < b.length) {
      val t = varint()
      val num = (t >>> 3).toInt; val wire = (t & 7).toInt
      wire match {
        case 0 => out += Field(num, wire, varint(), Array.empty)
        case 2 =>
          val len = varint().toInt
          out += Field(num, wire, 0L, b.slice(i, i + len)); i += len
        case 5 => out += Field(num, wire, 0L, b.slice(i, i + 4)); i += 4
        case 1 => out += Field(num, wire, 0L, b.slice(i, i + 8)); i += 8
        case other => throw new IllegalArgumentException(s"wire type $other")
      }
    }
    out.result()
  }
}
