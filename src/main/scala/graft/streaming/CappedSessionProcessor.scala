package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Gap + HARD-CAP sessionization — q180's timer machinery with the second
  * close condition every production sessionizer carries: a session also
  * ends when it would span more than `capUs` from its first event (billing
  * windows, bot-session splitting, dashboard force-close). The cap makes
  * sessionization ORDER-SENSITIVE — a bridging event can move every later
  * split point — so unlike [[SessionTimerProcessor]]'s mergeable islands,
  * state here is the raw pending event times (watermark-bounded: events
  * of emitted sessions are dropped, late events are dropped, so the
  * buffer holds only open-session events — per key that is at most the
  * events inside one cap span plus one gap horizon, never the stream).
  *
  * Fold semantics (the oracle's recursive CTE replays it exactly): scan
  * events in time order; an event joins the current session iff
  * t − last ≤ gap AND t − start ≤ cap, else it closes the session and
  * starts a new one. Equal-timestamp events join the same session
  * whichever order the sort leaves them in, so the fold is deterministic
  * even with duplicate times.
  *
  * Emission is timer-driven and PREFIX-STABLE: a folded session is final
  * once the watermark passes min(last+gap, start+cap) — by the fold rule
  * every event of such a session is < that close point ≤ watermark, new
  * events arrive ≥ watermark and therefore can neither join it (gap or
  * cap excludes them) nor re-order anything before it. The handler emits
  * the closed prefix, drops exactly those events from the buffer, and
  * re-registers timers for the open tail; stale timers fire harmlessly
  * (each expiry re-derives the fold from state).
  */
class CappedSessionProcessor(gapUs: Long, capUs: Long)
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long, Long)] {
  require(gapUs >= 1 && capUs >= 1, s"gap/cap must be >= 1µs")

  @transient private var buf: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    buf = getHandle.getListState[Long]("pending", Encoders.scalaLong, TTLConfig.NONE)

  private def fold(ts: Vector[Long]): Vector[(Long, Long, Long)] =
    ts.foldLeft(Vector.empty[(Long, Long, Long)]) { (acc, t) =>
      acc.lastOption match {
        case Some((st, la, n)) if t - la <= gapUs && t - st <= capUs =>
          acc.init :+ ((st, math.max(la, t), n + 1))
        case _ => acc :+ ((t, t, 1L))
      }
    }

  private def closeMs(s: (Long, Long, Long)): Long =
    math.min(s._2 + gapUs, s._1 + capUs) / 1000 + 1

  override def handleInputRows(user: Long, rows: Iterator[(Long, Long)],
      timers: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    // same late-drop as SessionTimerProcessor: the event-time column was
    // projected to a long, so the engine's own late filter no longer
    // applies and a late event would corrupt an already-emitted prefix
    val wmUs = timers.getCurrentWatermarkInMs() * 1000
    val events = rows.collect { case r if r._2 >= wmUs => r._2 }.toVector
    val all = (buf.get().toVector ++ events).sorted
    if (all.isEmpty) buf.clear() else buf.put(all.toArray)
    fold(all).foreach(s => getHandle.registerTimer(closeMs(s)))
    Iterator.empty
  }

  override def handleExpiredTimer(user: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long)] = {
    val wmMs = timers.getCurrentWatermarkInMs()
    val all = buf.get().toVector.sorted
    val sessions = fold(all)
    val closed = sessions.takeWhile(s => closeMs(s) <= wmMs)
    if (closed.nonEmpty) {
      val drop = closed.map(_._3).sum.toInt // events consumed by the prefix
      val rest = all.drop(drop)
      if (rest.isEmpty) buf.clear() else buf.put(rest.toArray)
      fold(rest).foreach(s => getHandle.registerTimer(closeMs(s)))
    }
    closed.iterator.map(s => (user, s._1, s._2, s._3))
  }
}
