package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Exact streaming rolling median over the last `window` values per key —
  * q147's batch frame (`ROWS BETWEEN 10 PRECEDING AND CURRENT ROW`,
  * selection not averaging) maintained as keyed streaming state on the
  * arbitrary-state v2 API (ListState here, next to RunningAggProcessor's
  * ValueState).
  *
  * State is the ordered tail of the series: the last `window - 1` values
  * in (ts, event_id) arrival order — BOUNDED by the frame width, not the
  * stream (the state-size property that makes this runnable forever).
  * Group iterators are NOT ordered (NOTES.md), so each batch materializes
  * and sorts before folding; the median is the 1-based (n+1)/2-th element
  * of the sorted frame — the same discrete selection as the oracle's
  * `vs[(len(vs) + 1) // 2]`, so doubles pass through untouched and a
  * single-batch replay equals the batch window bit-for-bit.
  */
class RollingMedianProcessor(window: Int = 11)
    extends StatefulProcessor[String, (String, Long, Long, Double), (String, Long, Long, Double)] {
  require(window >= 1, s"window must be >= 1, got $window")

  @transient private var tailState: ListState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    tailState = getHandle.getListState[Double]("tail",
      Encoders.scalaDouble, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long, Long, Double)],
      timers: TimerValues): Iterator[(String, Long, Long, Double)] = {
    var tail = tailState.get().toVector
    val batch = rows.toVector.sortBy(r => (r._2, r._3))
    val out = batch.map { case (et, ts, id, v) =>
      tail = (tail :+ v).takeRight(window) // current row + ≤(window-1) preceding
      val sorted = tail.sorted
      (et, ts, id, sorted((sorted.size + 1) / 2 - 1))
    }
    val keep = tail.takeRight(window - 1)
    // ListState.put rejects empty arrays — window = 1 keeps no tail
    if (keep.isEmpty) tailState.clear() else tailState.put(keep.toArray)
    out.iterator
  }
}
