package graft.proto

import graft.SparkTestSession
import graft.streaming.OandaPipeline
import org.scalatest.funsuite.AnyFunSuite

/** Locks the wire contract (oanda_stream.proto:7-32): golden bytes for the
  * FIXTURES.md happy-path lines, structural decode, and proto3
  * default-skipping semantics (prost parity).
  */
class ProtoWireSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("varint encoding") {
    def enc(v: Long) = { val w = new ProtoWire.Writer; w.writeVarint(v); w.toBytes }
    assert(hex(enc(0)) == "00")
    assert(hex(enc(1)) == "01")
    assert(hex(enc(127)) == "7f")
    assert(hex(enc(128)) == "8001")
    assert(hex(enc(300)) == "ac02")
    assert(hex(enc(1000000)) == "c0843d")
  }

  test("varint round-trips over random 64-bit values (property)") {
    val rnd = new scala.util.Random(1234)
    val values = Seq(0L, 1L, 127L, 128L, Long.MaxValue, -1L, Long.MinValue) ++
      (1 to 200).map(_ => rnd.nextLong())
    values.foreach { v =>
      val w = new ProtoWire.Writer; w.uintField(1, v)
      if (v == 0L) assert(w.toBytes.isEmpty) // default skipping
      else {
        val f = ProtoWire.readFields(w.toBytes)
        assert(f.head.varint == v, s"varint round-trip failed for $v")
      }
    }
  }

  /** Independent varint decoder: folds the varint's bytes from the LAST
    * continuation byte backwards — a deliberately different algorithm from
    * the reader's streaming shift-accumulate, so a shared bug can't hide. */
  private def varintBackwards(b: Array[Byte], start: Int): (Long, Int) = {
    var end = start
    while ((b(end) & 0x80) != 0) end += 1
    var v = 0L
    var j = end
    while (j >= start) { v = (v << 7) | (b(j) & 0x7fL); j -= 1 }
    (v, end + 1 - start)
  }

  test("10-byte varints: negative longs, byte-exact + independent-decoder parity") {
    def enc(v: Long) = { val w = new ProtoWire.Writer; w.writeVarint(v); w.toBytes }
    // -1 as uint64 = 2^64-1 → ten bytes, nine 0xff continuations then 0x01
    assert(hex(enc(-1L)) == "ffffffffffffffffff01")
    assert(hex(enc(Long.MinValue)) == "80808080808080808001")
    val rnd = new scala.util.Random(99)
    val edges = Seq(-1L, Long.MinValue, Long.MinValue + 1, -127L, -128L,
      Long.MaxValue, Long.MaxValue - 1) ++ (1 to 200).map(_ => rnd.nextLong())
    edges.foreach { v =>
      val bytes = enc(v)
      assert(bytes.length == (if (v < 0) 10 else (64 - java.lang.Long.numberOfLeadingZeros(v max 1) + 6) / 7),
        s"wrong length for $v")
      val (decA, lenA) = varintBackwards(bytes, 0)
      assert(decA == v && lenA == bytes.length, s"independent decode failed for $v")
      val w = new ProtoWire.Writer; w.uintField(1, v)
      if (v != 0) assert(ProtoWire.readFields(w.toBytes).head.varint == v)
    }
  }

  test("reader skips unknown fields of every wire type to reach known ones") {
    // a newer producer may add fields; a subscriber must skip what it does
    // not know (varint, fixed64, length-delimited, fixed32) without losing
    // frame alignment
    val w = new ProtoWire.Writer
    w.uintField(99, 12345L)                       // unknown varint
    w.bytesField(98, Array[Byte](1, 2, 3, 4, 5))  // unknown length-delimited
    w.strField(5, "EUR_USD")                      // known field
    w.uintField(97, 7L)                           // unknown varint after known
    w.msgField(7, ProtoWire.timestamp(1705311000L, 42)) // known message field
    val raw = w.toBytes ++
      // hand-rolled fixed64 (field 90, wire 1) and fixed32 (field 91, wire 5)
      ({ val x = new ProtoWire.Writer; x.writeVarint((90L << 3) | 1); x.toBytes } ++
        Array.fill[Byte](8)(0x11) ++
        { val x = new ProtoWire.Writer; x.writeVarint((91L << 3) | 5); x.toBytes } ++
        Array.fill[Byte](4)(0x22))
    val fields = ProtoWire.readFields(raw)
    assert(fields.map(_.number) == Seq(99, 98, 5, 97, 7, 90, 91))
    assert(new String(fields.find(_.number == 5).get.bytes) == "EUR_USD")
    val ts = ProtoWire.readFields(fields.find(_.number == 7).get.bytes)
    assert(ts.find(_.number == 1).get.varint == 1705311000L)
    assert(fields.find(_.number == 90).get.bytes.length == 8)
    assert(fields.find(_.number == 91).get.bytes.length == 4)
  }

  test("property: random unknown fields spliced into golden bytes never disturb known fields") {
    // prost decoders skip unknown fields; the clean-room reader must too —
    // inject 1-4 random unknown fields (all four wire types, random field
    // numbers outside the schema) at random field boundaries of the golden
    // tick message, and the known-field view must be byte-identical
    val rnd = new scala.util.Random(4242)
    val secs = java.time.Instant.parse("2024-01-15T09:30:00Z").getEpochSecond
    val tick = ProtoWire.priceTick(
      asks = Seq(("1.08425", 1000000L), ("1.08427", 2000000L)),
      bids = Seq(("1.08412", 1000000L)),
      closeoutAsk = "1.08430", closeoutBid = "1.08410",
      instrument = "EUR_USD", status = "tradeable",
      seconds = secs, nanos = 123456789)
    val known = ProtoWire.readFields(tick)
    // re-encode one decoded field byte-canonically (the writer is canonical,
    // so known fields reconstruct to their original bytes)
    def encodeKnown(f: ProtoWire.Field): Array[Byte] = {
      val w = new ProtoWire.Writer
      w.writeVarint((f.number.toLong << 3) | f.wire)
      f.wire match {
        case 0 => w.writeVarint(f.varint); w.toBytes
        case 2 => w.writeVarint(f.bytes.length.toLong); w.toBytes ++ f.bytes
        case _ => w.toBytes ++ f.bytes // fixed32/fixed64 payload as read
      }
    }
    assert(known.flatMap(encodeKnown).toSeq == tick.toSeq, "canonical re-encode sanity")
    def unknownField(): Array[Byte] = {
      val num = 8 + rnd.nextInt(1 << 20) // any number outside the schema's 1-7
      val w = new ProtoWire.Writer
      rnd.nextInt(4) match {
        case 0 => w.writeVarint((num.toLong << 3) | 0); w.writeVarint(rnd.nextLong()); w.toBytes
        case 1 => w.writeVarint((num.toLong << 3) | 1)
          w.toBytes ++ Array.fill[Byte](8)(rnd.nextInt().toByte)
        case 2 => val body = Array.fill[Byte](rnd.nextInt(24))(rnd.nextInt().toByte)
          w.writeVarint((num.toLong << 3) | 2); w.writeVarint(body.length.toLong)
          w.toBytes ++ body
        case _ => w.writeVarint((num.toLong << 3) | 5)
          w.toBytes ++ Array.fill[Byte](4)(rnd.nextInt().toByte)
      }
    }
    (1 to 200).foreach { trial =>
      val chunks = scala.collection.mutable.ArrayBuffer(known.map(encodeKnown): _*)
      (1 to 1 + rnd.nextInt(4)).foreach { _ =>
        chunks.insert(rnd.nextInt(chunks.size + 1), unknownField())
      }
      val mutated = chunks.toArray.flatten
      val decoded = ProtoWire.readFields(mutated)
      val knownView = decoded.filter(_.number <= 7)
      assert(knownView.size == known.size, s"trial $trial: known field lost")
      knownView.zip(known).foreach { case (g, e) =>
        assert(g.number == e.number && g.wire == e.wire &&
          g.varint == e.varint && g.bytes.toSeq == e.bytes.toSeq,
          s"trial $trial: field ${e.number} disturbed")
      }
      // the consumer path (q37's decode) still reads the timestamp through
      // the noise
      val ts = ProtoWire.readFields(knownView.find(_.number == 7).get.bytes)
      assert(ts.find(_.number == 1).get.varint == secs)
    }
  }

  test("proto3 default skipping: empty string and zero scalar omitted; empty message emitted") {
    assert(ProtoWire.priceLevel("", 0L).isEmpty)
    assert(hex(ProtoWire.timestamp(0L, 0)) == "")
    // an embedded message field is emitted even when its body is empty
    assert(hex(ProtoWire.envelope(2, Array.empty)) == "1200")
  }

  test("golden StreamMessageProto bytes for the fixture tick line") {
    // PriceLevelProto "1.08425"/1000000: 0a(price tag) 07 "1.08425" 10(liq tag) c0843d
    val lvl = ProtoWire.priceLevel("1.08425", 1000000L)
    assert(hex(lvl) == "0a07" + hex("1.08425".getBytes) + "10c0843d")

    val secs = java.time.Instant.parse("2024-01-15T09:30:00Z").getEpochSecond
    val tick = ProtoWire.priceTick(
      asks = Seq(("1.08425", 1000000L), ("1.08427", 2000000L)),
      bids = Seq(("1.08412", 1000000L)),
      closeoutAsk = "1.08430", closeoutBid = "1.08410",
      instrument = "EUR_USD", status = "tradeable",
      seconds = secs, nanos = 123456789)
    val env = ProtoWire.envelope(1, tick)
    // decode structurally and assert every field round-trips
    val top = ProtoWire.readFields(env)
    assert(top.map(_.number) == Seq(1)) // oneof price_tick
    val fields = ProtoWire.readFields(top.head.bytes)
    assert(fields.map(_.number) == Seq(1, 1, 2, 3, 4, 5, 6, 7))
    assert(new String(fields(4).bytes) == "1.08410")
    assert(new String(fields(5).bytes) == "EUR_USD")
    val ts = ProtoWire.readFields(fields(7).bytes)
    assert(ts.find(_.number == 1).get.varint == secs)
    assert(ts.find(_.number == 2).get.varint == 123456789L)
    // full golden lock (regression pin; cross-derived from an independent
    // encoder implementation of the proto3 wire format)
    assert(hex(env) ==
      "0a60" +                                     // envelope: field 1, len 96
        "0a0d0a07312e303834323510c0843d" +         // asks[0]
        "0a0d0a07312e30383432371080897a" +         // asks[1]
        "120d0a07312e303834313210c0843d" +         // bids[0]
        "1a07312e3038343330" +                     // closeout_ask
        "2207312e3038343130" +                     // closeout_bid
        "2a074555525f555344" +                     // instrument EUR_USD
        "3209747261646561626c65" +                 // status tradeable
        "3a0b" + "0898f693ad06" + "10959aef3a")    // time{seconds=1705311000,nanos}
  }

  test("pipeline end-to-end encode matches direct ProtoWire construction") {
    val line =
      """{"asks":[{"price":"1.08425","liquidity":1000000}],"bids":[],""" +
        """"closeoutAsk":"1.08430","closeoutBid":"1.08410","instrument":"EUR_USD",""" +
        """"status":"tradeable","time":"2024-01-15T09:30:00.123456789Z"}"""
    val proto = OandaPipeline.pipeline(Seq(line).toDF("value"))
      .select("proto").collect().head.getAs[Array[Byte]](0)
    val expected = ProtoWire.envelope(1, ProtoWire.priceTick(
      Seq(("1.08425", 1000000L)), Seq.empty,
      "1.08430", "1.08410", "EUR_USD", "tradeable",
      java.time.Instant.parse("2024-01-15T09:30:00Z").getEpochSecond, 123456789))
    assert(hex(proto) == hex(expected))
  }

  test("envelope encode projection plans INSIDE WholeStageCodegen (no fallback eviction)") {
    // Guards the doGenCode path: if janino rejected the generated encode call
    // (e.g. an illegal boxing cast), CollapseCodegenStages would silently
    // evict the whole sink projection from codegen and no value-level test
    // would fail — only this plan-shape assertion would.
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    // go through a file scan — a local Seq is constant-folded to a
    // LocalTableScan at plan time and never exercises codegen at all
    val tmp = java.nio.file.Files.createTempDirectory("graft-codegen-probe")
    java.nio.file.Files.write(tmp.resolve("cap.jsonl"), java.util.Arrays.asList(
      """{"asks":[{"price":"1.1","liquidity":10}],"bids":[],"closeoutAsk":"1.1","closeoutBid":"1.0","instrument":"EUR_USD","status":"tradeable","time":"2024-01-15T09:30:00.000000000Z"}""",
      """{"type":"HEARTBEAT","time":"2024-01-15T09:30:05Z"}"""))
    val lines = spark.read.text(tmp.resolve("cap.jsonl").toString)
    val df = OandaPipeline.pipeline(lines).select("proto")
    df.collect()
    val codegenSpans = SparkTestSession.flattenExecuted(df.queryExecution.executedPlan)
      .collect { case w: WholeStageCodegenExec => w.child.toString }
    assert(codegenSpans.exists(s =>
      s.contains("encode_price_tick_proto") && s.contains("encode_heartbeat_proto")),
      s"envelope encoders not inside any WholeStageCodegen span:\n${df.queryExecution.executedPlan}")
  }

  test("heartbeat envelope encodes oneof field 2 with type string") {
    val line = """{"type":"HEARTBEAT","time":"2024-01-15T09:30:05Z"}"""
    val proto = OandaPipeline.pipeline(Seq(line).toDF("value"))
      .select("proto").collect().head.getAs[Array[Byte]](0)
    val top = ProtoWire.readFields(proto)
    assert(top.head.number == 2)
    val hb = ProtoWire.readFields(top.head.bytes)
    assert(new String(hb.find(_.number == 2).get.bytes) == "HEARTBEAT")
  }
}
