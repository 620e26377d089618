package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression library freezing the reference's semantics-critical
  * derivations (SURVEY.md §2A P8-P10). These are the behaviors that are easy
  * to silently get wrong with a plain cast, so they live in one place and
  * are property-tested against a model of the reference behavior.
  */
object OandaColumns {

  /** Rust `str::parse::<f64>()` grammar: optional sign, then inf/infinity/
    * nan (any case) or a decimal/exponent number — NO surrounding
    * whitespace (Spark's cast would trim, silently widening the accepted
    * set). */
  private val rustF64 =
    "^[+-]?((?i)inf(inity)?|(?i)nan|(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?)$"

  /** One side of P8: parse exactly like rust `parse::<f64>().unwrap_or(0.0)`
    * (`/root/reference/src/main.rs:70-72`) — padded strings and garbage
    * coerce to 0.0 (not null), `inf`/`nan` spellings parse like rust. */
  def parseF64Or0(c: Column): Column =
    when(!c.rlike(rustF64), lit(0.0))
      .when(lower(c).rlike("inf"), // ±inf/infinity
        when(c.startsWith("-"), lit(Double.NegativeInfinity))
          .otherwise(lit(Double.PositiveInfinity)))
      .when(lower(c).rlike("nan"), lit(Double.NaN))
      .otherwise(coalesce(c.try_cast("double"), lit(0.0)))

  /** P8 — bid/ask spread with the reference's 0.0-coercion: each side that
    * fails to parse as f64 coerces to 0.0, NOT null
    * (`/root/reference/src/main.rs:70-72`, `unwrap_or(0.0)`). A plain
    * `cast - cast` would null-propagate instead. */
  def spread(closeoutAsk: Column, closeoutBid: Column): Column =
    parseF64Or0(closeoutAsk) - parseF64Or0(closeoutBid)

  /** P9 — two-format timestamp parse: RFC3339 (offset form) first, then the
    * literal-Z fractional pattern (`/root/reference/src/main.rs:140-151`).
    * Spark's ISO-8601 timestamp cast accepts both shapes (offset `+HH:MM`
    * and literal `Z`, 0-9 fractional digits, truncating to µs), so a single
    * try_cast covers the union; unparseable → null (the reference errors the
    * record out — callers route those to the dead-letter side). */
  def parseEventTime(time: Column): Column =
    coalesce(
      time.try_cast("timestamp"),
      try_to_timestamp(time, lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSSSSS]'Z'")))

  /** P9 fidelity sidecar — nanosecond component of the wire timestamp.
    * Spark TimestampType is µs; the proto carries nanos
    * (`main.rs:147-150`), so full fidelity keeps nanos alongside
    * (SURVEY.md §7.3#1). Extracted textually from the fractional part. */
  def timeNanos(time: Column): Column =
    coalesce(
      rpad(regexp_extract(time, "\\.(\\d{1,9})", 1), 9, "0").try_cast("int"),
      lit(0))

  /** P10 — display projection `YYYY-MM-dd HH:mm:ss` in a configured zone.
    * The reference formats in machine-local time (`main.rs:74-81`); the
    * engine makes the zone explicit (UTC default) for determinism —
    * documented deviation, SURVEY.md §7.3#3. */
  def displayTime(ts: Column, zone: String = "UTC"): Column =
    date_format(from_utc_timestamp(ts, zone), "yyyy-MM-dd HH:mm:ss")

  /** P11 — the reference's verbose console line for a tick:
    * `{time} {instrument} {ask} {bid} {spread:.5}` (`main.rs:84`). */
  def consoleLine(display: Column, instrument: Column, ask: Column,
      bid: Column, spreadCol: Column): Column =
    format_string("%s %s %s %s %.5f", display, instrument, ask, bid, spreadCol)
}
