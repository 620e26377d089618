package graft.streaming

/** The q71b funnel regex `v+c+p` compiled to a 3-state DFA so streaming
  * state per user is O(1) — (dfa state, events seen, funnels completed) —
  * instead of the accumulated symbol STRING the first implementation kept,
  * which grew with the stream (the difference between bounded keyed state
  * and an unbounded one at 100 TB replay).
  *
  * Equivalence to leftmost non-overlapping regex matching (`findAllIn` /
  * DuckDB `regexp_extract_all`): a match can only start at 'v', and
  * between a candidate start and a failure the consumed input is v-runs
  * then c-runs only — so the regex engine's restart scan (next position
  * after the failed start) can first make progress exactly where the
  * DFA's failure transition lands: at the failure char itself ('v' → the
  * in-v-run state, anything else → idle). Property-tested exhaustively
  * against the regex on random strings in StreamSeqPatternSpec.
  */
object FunnelDfa {
  /** One transition. States: 0 idle, 1 inside `v+`, 2 inside `c+`.
    * Returns (next state, funnel completed by this char). */
  def step(st: Int, c: String): (Int, Boolean) = (st, c) match {
    case (0, "v") => (1, false)
    case (1, "v") => (1, false)
    case (1, "c") => (2, false)
    case (2, "c") => (2, false)
    case (2, "v") => (1, false)
    case (2, "p") => (0, true)
    case _        => (0, false)
  }
}
