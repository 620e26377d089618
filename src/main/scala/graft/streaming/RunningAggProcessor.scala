package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** B32 on the arbitrary-state v2 API (`transformWithState`, Spark 4):
  * per-key running (count, max) kept in explicit ValueState — the
  * generalization of the reference's would-be per-instrument tick state
  * (SURVEY.md §2B B32), successor API to flatMapGroupsWithState (which the
  * engine also implements in StreamingQueries.q32). Requires the RocksDB
  * state store provider.
  *
  * `ttl` bounds the per-key ValueState lifetime (the q152-class risk:
  * running aggregates for keys never seen again live forever without it).
  * Default NONE keeps the bounded-replay registry path on TimeMode.None;
  * a production deployment passes a TTL and TimeMode.ProcessingTime —
  * both laws (pre-expiry equivalence, cross-batch expiry) are proven for
  * this processor in StateTtlSpec's ValueState arm.
  */
class RunningAggProcessor(ttl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {

  @transient private var state: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Double)]("agg",
      Encoders.product[(Long, Double)], ttl)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
      timers: TimerValues): Iterator[(Long, Long, Double)] = {
    var (n, mx) = if (state.exists()) state.get() else (0L, Double.NegativeInfinity)
    rows.foreach { r => n += 1; mx = math.max(mx, r._2) }
    state.update((n, mx))
    Iterator((key, n, mx))
  }
}
