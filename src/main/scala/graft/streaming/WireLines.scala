package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Single source of truth for synthesizing OANDA wire lines from fixture
  * columns (used by the flagship entry, the proto round-trip, fault
  * injection, and throughput queries — the JSON field names/shape are the
  * ingest contract, so they live in exactly one place). */
object WireLines {

  /** `[]` typed as the order-book ladder array. */
  def emptyLevels: Column =
    array().cast("array<struct<price:string,liquidity:bigint>>")

  /** One ladder level. */
  def level(price: Column, liquidity: Column): Column =
    struct(price.cast("string").as("price"), liquidity.cast("long").as("liquidity"))

  /** Wire timestamp: ISO-8601 with µs fraction and literal Z. */
  def isoMicros(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")

  /** A tick-shaped JSON line (camelCase wire names per models.rs:4,11). */
  def tickLine(asks: Column, bids: Column, closeoutAsk: Column,
      closeoutBid: Column, instrument: Column, time: Column): Column =
    to_json(struct(
      asks.as("asks"), bids.as("bids"),
      closeoutAsk.cast("string").as("closeoutAsk"),
      closeoutBid.cast("string").as("closeoutBid"),
      instrument.as("instrument"), lit("tradeable").as("status"),
      time.as("time")))
}
