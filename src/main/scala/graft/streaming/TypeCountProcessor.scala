package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Per-user event-type counters in MAP state — the MapState leg of the
  * arbitrary-state v2 API (ValueState [[RunningAggProcessor]], ListState
  * [[RollingMedianProcessor]], event-time timers
  * [[SessionTimerProcessor]]; this completes the quartet). The map is
  * keyed by event type WITHIN the user's state row, so a batch touching
  * one type reads and writes ONLY that entry — the point of MapState over
  * a ValueState holding a whole Map (which would round-trip every entry
  * per update; at 100 TB per-key maps are the difference between O(types
  * touched) and O(types held) state IO per batch). Emits the updated
  * (user, type, n) rows per batch; counts are monotone, so the standard
  * max-reduction sink discipline (q32/q149) keeps the latest under
  * multi-batch replay.
  *
  * `ttl` is the EVICTION POLICY for the map entries: with a TTL set (which
  * requires TimeMode.ProcessingTime), an entry not rewritten within the
  * TTL window is dropped by the state store and a later event for that
  * (user, type) restarts its count at 1. This is what bounds the state at
  * 100 TB with unbounded user cardinality — without it the map grows
  * monotonically with |users|·|types| forever; with it, state holds only
  * keys active within the TTL window (SCALE.md §streaming-state). The
  * default NONE keeps the exact-forever semantics for bounded replays.
  */
class TypeCountProcessor(ttl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[Long, (Long, String), (Long, String, Long)] {

  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long]("counts",
      Encoders.STRING, Encoders.scalaLong, ttl)

  override def handleInputRows(user: Long, rows: Iterator[(Long, String)],
      timers: TimerValues): Iterator[(Long, String, Long)] = {
    val touched = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    rows.foreach { case (_, et) =>
      touched(et) = touched.getOrElse(et,
        if (counts.containsKey(et)) counts.getValue(et) else 0L) + 1
    }
    touched.foreach { case (et, n) => counts.updateValue(et, n) }
    touched.iterator.map { case (et, n) => (user, et, n) }
  }
}
