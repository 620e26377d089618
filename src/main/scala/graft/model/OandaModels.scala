package graft.model

import org.apache.spark.sql.types._

/** Typed data model of the OANDA pricing stream, mirroring the reference's
  * record types (`/root/reference/src/models.rs:3-34`) and its protobuf wire
  * twins (`/root/reference/proto/oanda_stream.proto:7-32`).
  *
  * JSON wire names are camelCase (`closeoutAsk`) per the serde rename at
  * `models.rs:4,11`; engine-internal names are snake_case like the proto.
  * Prices stay decimal strings at ingest fidelity (`models.rs:5,15-16`);
  * doubles are derived only where the reference derives them (spread,
  * `main.rs:70-72`).
  */
final case class PriceLevel(price: String, liquidity: Long)

final case class PriceTick(
    asks: Seq[PriceLevel],
    bids: Seq[PriceLevel],
    closeout_ask: String,
    closeout_bid: String,
    instrument: String,
    status: String,
    time: String)

final case class Heartbeat(time: String, message_type: String)

/** Discriminated union over the stream (`models.rs:29-34`): exactly one of
  * tick/heartbeat is set; `unknown` carries the raw JSON dead-letter payload
  * (the engine retains it instead of dropping — SURVEY.md §2A P15). */
final case class StreamMessage(
    message_type: String, // price_tick | heartbeat | unknown | malformed
    tick: Option[PriceTick],
    heartbeat: Option[Heartbeat],
    raw: String)

object OandaSchemas {

  /** Order-book level as it appears on the JSON wire. */
  val priceLevelSchema: StructType = StructType(Seq(
    StructField("price", StringType),
    StructField("liquidity", LongType)))

  /** Superset wire schema: every field of both record types plus the
    * corrupt-record capture column, so one `from_json` pass (PERMISSIVE)
    * parses the whole union (SURVEY.md §2A P4-P6). */
  val wireSchema: StructType = StructType(Seq(
    StructField("asks", ArrayType(priceLevelSchema)),
    StructField("bids", ArrayType(priceLevelSchema)),
    StructField("closeoutAsk", StringType),
    StructField("closeoutBid", StringType),
    StructField("instrument", StringType),
    StructField("status", StringType),
    StructField("time", StringType),
    StructField("type", StringType),
    StructField("_corrupt_record", StringType)))
}
