package graft.functions

import graft.SparkTestSession
import graft.model.OandaSchemas
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence proof for `parse_oanda_wire` (round 8): over the FIXTURES §A
  * corpus, systematic shape variations, and a seeded char-level fuzz of the
  * happy-path line, the fast parser's result must equal
  * `from_json(value, wireSchema, PERMISSIVE)` row-for-row — the fast path
  * accepts a line only when its result is provably identical, and
  * everything else delegates to the same Jackson machinery from_json uses.
  * Plus the plan property that motivates it: the parse projection stays
  * inside WholeStageCodegen (from_json's CodegenFallback evicts it).
  */
class FastWireParseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val tickLine =
    """{"asks":[{"price":"1.08425","liquidity":1000000},{"price":"1.08427","liquidity":2000000}],""" +
      """"bids":[{"price":"1.08412","liquidity":1000000}],""" +
      """"closeoutAsk":"1.08430","closeoutBid":"1.08410",""" +
      """"instrument":"EUR_USD","status":"tradeable",""" +
      """"time":"2024-01-15T09:30:00.123456789Z"}"""
  private val hbLine = """{"type":"HEARTBEAT","time":"2024-01-15T09:30:05.000000000Z"}"""

  private val systematic: Seq[String] = Seq(
    tickLine, hbLine,
    // shape variations the fast path must handle bit-identically
    """{}""",
    """{ "instrument" : "EUR_USD" , "status" : "halted" }""",
    """{"type":"HEARTBEAT","time":null}""",
    """{"instrument":null,"asks":null,"bids":[]}""",
    """{"asks":[],"bids":[{"price":"1.1","liquidity":0}]}""",
    """{"asks":[{}],"bids":[{"liquidity":5}]}""",
    """{"asks":[{"price":null,"liquidity":null}],"bids":[]}""",
    """{"asks":[{"price":"1.1","liquidity":-42}],"bids":[]}""",
    """{"bids":[{"price":"1.08412","liquidity":1}],"asks":[{"price":"1.1","liquidity":2}],"time":"t","type":"PRICE","status":"s","instrument":"i","closeoutBid":"b","closeoutAsk":"a"}""",
    """{"unknownKey":123,"instrument":"EUR_USD"}""",
    """{"nested":{"a":[1,2,{"b":null}],"c":"d"},"instrument":"EUR_USD"}""",
    """{"arr":[true,false,null,1.5,-2e3,"x"],"status":"ok"}""",
    "{\"instrument\":\"EUR\\\"_\\\\U\\" + "u0053D\\n\",\"status\":\"a\\tb\"}",
    """{"instrument":"€ünïcode-𝄞-emoji-😀","status":"ok"}""",
    """{"asks":[{"price":"1.1","liquidity":1,"extra":{"deep":[{}]}}],"bids":[]}""",
    // lines that MUST bail to Jackson and still match from_json exactly
    """{"instrument":"EUR_USD","instrument":"USD_JPY"}""",
    """{"instrument":"X","instrument":null}""",
    "{\"inst\\" + "u0072ument\":\"escaped-key\"}",
    """{"liquidityless":"x","asks":[{"price":"1.1","liquidity":"notanumber"}],"bids":[]}""",
    """{"asks":[{"price":"1.1","liquidity":1.5}],"bids":[]}""",
    """{"asks":[{"price":"1.1","liquidity":007}],"bids":[]}""",
    """{"asks":[{"price":"1.1","liquidity":99999999999999999999999}],"bids":[]}""",
    """{"asks":[{"price":1.08425,"liquidity":1}],"bids":[]}""",
    """{"asks":"not-an-array","bids":[]}""",
    """{"asks":[1,2],"bids":[]}""",
    """{"closeoutAsk":1.5,"closeoutBid":true,"instrument":"X"}""",
    """{"status":false}""",
    """{"time":2024}""",
    """{not json""",
    """"hello"""",
    """42""",
    """[1, 2]""",
    """{} trailing""",
    """{"a":1}{"b":2}""",
    """{"a":1,}""",
    """{"a":01}""",
    """{"a":--1}""",
    """{"a":1.2.3}""",
    """{"a":"unterminated""",
    "{\"a\":\"bad\\escape\"}",
    "{\"a\":\"bad\\" + "u00zz\"}",
    """null""", """true""",
    """   {"instrument":"WS_PADDED"}   """,
    "\t{\n\"instrument\"\r:\n\"EUR_USD\"\n}\t")

  /** Seeded char-level fuzz of the two fixture lines: insert/delete/replace
    * random chars — most mutants are corrupt, some stay parseable; either
    * way the two parsers must agree. */
  private val fuzz: Seq[String] = {
    val rnd = new scala.util.Random(42)
    val alphabet = """{}[]":,\0123456789.eE+-abz """
    (0 until 600).map { _ =>
      val base = if (rnd.nextBoolean()) tickLine else hbLine
      val pos = rnd.nextInt(base.length)
      rnd.nextInt(3) match {
        case 0 => base.substring(0, pos) + alphabet(rnd.nextInt(alphabet.length)) + base.substring(pos)
        case 1 => base.substring(0, pos) + base.substring(math.min(base.length, pos + 1))
        case _ => base.substring(0, pos) +
          alphabet(rnd.nextInt(alphabet.length)) + base.substring(math.min(base.length, pos + 1))
      }
    }
  }

  private def assertEquivalent(lines: Seq[String]): Unit = {
    val rows = lines.toDF("value")
      .select(col("value"),
        ParseOandaWire.parseWire(col("value")).as("fast"),
        from_json(col("value"), OandaSchemas.wireSchema,
          Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")).as("jackson"))
      .collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"parser divergence on line <${r.getString(0)}>:\n fast=${r.get(1)}\n jackson=${r.get(2)}")
    }
  }

  test("systematic corpus: parse_oanda_wire ≡ from_json row-for-row") {
    assertEquivalent(systematic)
  }

  test("600 seeded fuzz mutants of the fixture lines: parsers agree on every one") {
    assertEquivalent(fuzz)
  }

  test("happy-path lines take the fast path; corrupt lines take the Jackson delegate") {
    FastWireParser.fastHits.reset()
    FastWireParser.fallbacks.reset()
    // driver-side direct calls (collect() through Spark would also count
    // plan-compilation probe evaluations)
    import org.apache.spark.unsafe.types.UTF8String
    Seq(tickLine, hbLine).foreach(l =>
      FastWireParser.parseOrFallback(UTF8String.fromString(l)))
    assert(FastWireParser.fastHits.sum() == 2 && FastWireParser.fallbacks.sum() == 0)
    Seq("""{not json""", """{"instrument":"EUR_USD","instrument":"D"}""").foreach(l =>
      FastWireParser.parseOrFallback(UTF8String.fromString(l)))
    assert(FastWireParser.fallbacks.sum() == 2)
  }

  test("the parse projection plans INSIDE WholeStageCodegen (from_json cannot)") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val tmp = java.nio.file.Files.createTempDirectory("graft-fastparse")
    java.nio.file.Files.write(tmp.resolve("cap.jsonl"),
      java.util.Arrays.asList(tickLine, hbLine))
    val fast = spark.read.text(tmp.resolve("cap.jsonl").toString)
      .select(ParseOandaWire.parseWire(col("value")).as("j"))
    fast.collect()
    val spans = SparkTestSession.flattenExecuted(fast.queryExecution.executedPlan)
      .collect { case w: WholeStageCodegenExec => w.child.toString }
    assert(spans.exists(_.contains("parse_oanda_wire")),
      s"parse_oanda_wire not inside codegen:\n${fast.queryExecution.executedPlan}")
    // and the negative control: the from_json form is evicted
    val slow = spark.read.text(tmp.resolve("cap.jsonl").toString)
      .select(from_json(col("value"), OandaSchemas.wireSchema).as("j"))
    slow.collect()
    val slowSpans = SparkTestSession.flattenExecuted(slow.queryExecution.executedPlan)
      .collect { case w: WholeStageCodegenExec => w.child.toString }
    assert(!slowSpans.exists(_.contains("from_json")),
      "expected from_json to be evicted from codegen — Spark behavior changed?")
  }
}
