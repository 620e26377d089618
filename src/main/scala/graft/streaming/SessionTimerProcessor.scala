package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Timer-driven session assembly on the arbitrary-state v2 API — the
  * EVENT-TIME-TIMER leg of `transformWithState` (ValueState is
  * [[RunningAggProcessor]], ListState is [[RollingMedianProcessor]]; this
  * completes the surface): sessions are held open in state and emitted
  * ONLY from [[handleExpiredTimer]], once the watermark proves the gap
  * after their last event can no longer be filled — the v2 twin of
  * `GroupStateTimeout.EventTimeTimeout`, and the generalization of the
  * reference's would-be per-instrument inactivity handling (SURVEY.md §2B
  * B32/B28).
  *
  * Input: (user, event-time µs). Output: (user, start µs, end µs, n) per
  * closed session. State per key: the pending (start, last, n) islands in
  * ascending order with pairwise gaps > `gapUs` — bounded by the key's
  * open-session count, never the stream. Each batch merges its events
  * into the islands (a bridging event CONCATENATES two pending islands —
  * merge is order-insensitive within the watermark), then registers one
  * event-time timer per island close. Timers are ms-resolution: a close
  * at `last + gap` µs registers at floor(·/1000)+1 ms so the µs close is
  * strictly covered; stale timers left behind by an extended island fire
  * harmlessly (the expiry handler re-checks every island against the
  * fired expiry and emits only what is provably closed).
  */
class SessionTimerProcessor(gapUs: Long)
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long, Long)] {
  require(gapUs >= 1, s"gap must be >= 1µs, got $gapUs")

  @transient private var pending: ListState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    pending = getHandle.getListState[(Long, Long, Long)]("sessions",
      Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[(Long, Long)],
      timers: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    // drop watermark-late events HERE: the query projects the event time
    // into a plain long, so the engine's own late-row filter (keyed to the
    // watermarked column) no longer applies, and a late event would
    // otherwise re-open a session that already emitted — producing
    // overlapping duplicate emissions. An in-time event can never overlap
    // an emitted session (emission required last + gap < watermark, so any
    // event at or past the watermark is > gap after that session's end).
    val wmUs = timers.getCurrentWatermarkInMs() * 1000
    val events = rows.collect {
      case r if r._2 >= wmUs => (r._2, r._2, 1L)
    }.toVector
    val merged = (pending.get().toVector ++ events).sortBy(s => (s._1, s._2))
      .foldLeft(Vector.empty[(Long, Long, Long)]) { (acc, s) =>
        acc.lastOption match {
          case Some(p) if s._1 - p._2 <= gapUs =>
            acc.init :+ ((p._1, math.max(p._2, s._2), p._3 + s._3))
          case _ => acc :+ s
        }
      }
    if (merged.isEmpty) pending.clear() else pending.put(merged.toArray)
    merged.foreach(s => getHandle.registerTimer((s._2 + gapUs) / 1000 + 1))
    Iterator.empty // emission is exclusively watermark-gated
  }

  override def handleExpiredTimer(user: Long, timers: TimerValues,
      info: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long)] = {
    val all = pending.get().toVector
    val (closed, open) = all.partition(_._2 + gapUs < info.getExpiryTimeInMs * 1000)
    if (closed.nonEmpty) {
      if (open.isEmpty) pending.clear() else pending.put(open.toArray)
    }
    closed.iterator.map(s => (user, s._1, s._2, s._3))
  }
}
