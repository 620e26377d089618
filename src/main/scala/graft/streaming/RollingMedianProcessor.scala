package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Exact streaming rolling median over the last `window` values per key —
  * q147's batch frame (`ROWS BETWEEN 10 PRECEDING AND CURRENT ROW`,
  * selection not averaging) maintained as keyed streaming state on the
  * arbitrary-state v2 API (ListState here, next to RunningAggProcessor's
  * ValueState).
  *
  * State is the ordered tail of the series: the last `window - 1`
  * (ts, event_id, value) rows in (ts, event_id) ORDER — BOUNDED by the
  * frame width, not the stream (the state-size property that makes this
  * runnable forever). Keeping the ordering key in state (not bare values)
  * means batches need NOT arrive in timestamp order: each new row is
  * inserted at its (ts, event_id) position in the merged tail and its
  * frame is the `window` retained rows AT OR BEFORE that position, so a
  * late row that lands inside the retained tail gets the batch-window
  * frame, not the arrival-order one. Two bounds are inherent to streaming
  * without retraction and documented rather than hidden: already-emitted
  * medians are never retracted when a late row would have entered their
  * frames, and a row older than the entire retained tail computes its
  * median over the retained horizon only.
  *
  * Group iterators are NOT ordered (NOTES.md), so each batch materializes
  * and sorts before folding; the median is the 1-based (n+1)/2-th element
  * of the sorted frame — the same discrete selection as the oracle's
  * `vs[(len(vs) + 1) // 2]`, so doubles pass through untouched and a
  * single-batch replay equals the batch window bit-for-bit.
  */
class RollingMedianProcessor(window: Int = 11)
    extends StatefulProcessor[String, (String, Long, Long, Double), (String, Long, Long, Double)] {
  require(window >= 1, s"window must be >= 1, got $window")

  @transient private var tailState: ListState[(Long, Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    tailState = getHandle.getListState[(Long, Long, Double)]("tail",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble),
      TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long, Long, Double)],
      timers: TimerValues): Iterator[(String, Long, Long, Double)] = {
    // retained tail, ascending (ts, event_id) — ≤ window-1 rows
    var history = tailState.get().toVector
    val batch = rows.toVector.sortBy(r => (r._2, r._3))
    val out = batch.map { case (et, ts, id, v) =>
      val pos = {
        val i = history.indexWhere(t => t._1 > ts || (t._1 == ts && t._2 > id))
        if (i < 0) history.size else i
      }
      history = (history.take(pos) :+ ((ts, id, v))) ++ history.drop(pos)
      val frame = history.slice(math.max(0, pos - window + 1), pos + 1).map(_._3)
      // the batch is sorted, so every later row inserts at or after `pos`
      // and frames at or after `pos - window + 1`: the prefix before that
      // can never be read again (and the end-of-batch takeRight never
      // reaches it) — dropping it keeps `history` bounded by the frame
      // width plus the retained tail instead of growing with the batch
      // (an O(batch²) scan-and-rebuild otherwise: the whole per-key series
      // in a single-file replay)
      history = history.drop(math.max(0, pos - window + 1))
      val sorted = frame.sorted
      (et, ts, id, sorted((sorted.size + 1) / 2 - 1))
    }
    val keep = history.takeRight(window - 1)
    // ListState.put rejects empty arrays — window = 1 keeps no tail
    if (keep.isEmpty) tailState.clear() else tailState.put(keep.toArray)
    out.iterator
  }
}
