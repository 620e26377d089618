package graft

import org.scalatest.funsuite.AnyFunSuite

/** P17 config surface vs the reference (`config.rs:14-41`, `main.rs:30-44`). */
class ConfigSpec extends AnyFunSuite {

  private val full = Map(
    "OANDA_AUTH_TOKEN" -> "tok-secret-123",
    "OANDA_ACCOUNT_ID" -> "001-001-1234567-001")

  test("required vars missing → reference error text, token first") {
    assert(Config.fromEnv(Map.empty) ==
      Left("OANDA_AUTH_TOKEN environment variable not set"))
    assert(Config.fromEnv(Map("OANDA_AUTH_TOKEN" -> "t")) ==
      Left("OANDA_ACCOUNT_ID environment variable not set"))
  }

  test("defaults match config.rs:20-27") {
    val c = Config.fromEnv(full).toOption.get
    assert(c.environment == "fxpractice")
    assert(c.instruments == "EUR_USD")
    assert(c.zmqAddress == "tcp://*:9500")
  }

  test("explicit vars override defaults") {
    val c = Config.fromEnv(full ++ Map(
      "OANDA_ENVIRONMENT" -> "fxtrade",
      "OANDA_INSTRUMENTS" -> "EUR_USD,USD_CAD",
      "ZMQ_PUBLISHER_ADDRESS" -> "tcp://*:9600")).toOption.get
    assert(c.environment == "fxtrade")
    assert(c.instruments == "EUR_USD,USD_CAD")
    assert(c.zmqAddress == "tcp://*:9600")
  }

  test("stream URL mirrors oanda_client.rs:14-19 incl. percent-encoding") {
    val c = Config.fromEnv(full ++ Map(
      "OANDA_INSTRUMENTS" -> "EUR_USD,USD_CAD")).toOption.get
    assert(c.baseUrl == "https://stream-fxpractice.oanda.com")
    assert(c.streamUrl ==
      "https://stream-fxpractice.oanda.com/v3/accounts/001-001-1234567-001" +
        "/pricing/stream?instruments=EUR_USD%2CUSD_CAD")
  }

  test("token never appears in toString (secret hygiene, config.rs parity)") {
    val c = Config.fromEnv(full).toOption.get
    assert(!c.toString.contains("tok-secret-123"))
    assert(c.toString.contains("<redacted>"))
  }

  test("usage text lists every variable main.rs:33-41 documents") {
    Seq("OANDA_AUTH_TOKEN", "OANDA_ACCOUNT_ID", "OANDA_ENVIRONMENT",
      "OANDA_INSTRUMENTS", "ZMQ_PUBLISHER_ADDRESS")
      .foreach(v => assert(Config.usage.contains(v), v))
  }
}
