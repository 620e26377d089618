package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q61c — the length-doubling duplicated-span ladder, pinned on seeded
  * corpora where the true duplicate structure is known by construction:
  *
  *  1. CERTIFICATION: an exact 40-token cross-doc duplicate is reported
  *     at EVERY level, including one level-32 span covering the full 40
  *     tokens — the coarse resolution certifies the duplicate as a unit
  *     (9 consecutive 32-gram hits), which 8-gram flags alone cannot.
  *  2. REFINEMENT: when a doc shares tokens 0–19 with one partner and
  *     12–39 with ANOTHER, the 8-gram islands fuse them into a single
  *     40-token span that NO single partner shares (q61b's over-merge);
  *     level 16 splits it into the two per-partner extents and level 32
  *     correctly reports nothing.
  */
class DupSpanLadderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ladder(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    PipelineQueries.dupSpanLadder(docs.toDF("doc_id", "text"), Seq(8, 16, 32))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
  }

  private def toks(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("a 40-token duplicate is certified as one maximal span at level 32") {
    val shared = toks("a", 40)
    val docA = (shared ++ toks("fillerA", 12)).mkString(" ")
    val docB = (shared ++ toks("fillerB", 12)).mkString(" ")
    val rows = ladder(Seq(1L -> docA, 2L -> docB))
    for (doc <- Seq(1L, 2L); lvl <- Seq(8L, 16L, 32L)) {
      val spans = rows.filter(r => r._1 == doc && r._2 == lvl)
      // one span, starting at 0, covering exactly the 40 duplicated tokens
      assert(spans == Seq((doc, lvl, 0L, 40L, 40L - lvl + 1)),
        s"doc $doc level $lvl: $spans")
    }
  }

  test("chained partners: level 8 over-merges, level 16 refines, level 32 abstains") {
    val u = toks("u", 40)
    val doc3 = (u ++ toks("f3_", 12)).mkString(" ")                  // whole block
    val doc4 = (u.take(20) ++ toks("f4_", 12)).mkString(" ")         // shares 0..19
    val doc5 = (u.drop(12) ++ toks("f5_", 12)).mkString(" ")         // shares 12..39
    val rows = ladder(Seq(3L -> doc3, 4L -> doc4, 5L -> doc5))
    val d3 = (lvl: Long) => rows.filter(r => r._1 == 3L && r._2 == lvl)
      .map(r => (r._3, r._4)) // (span_start, span_tokens)

    // level 8: positions 0..12 (via doc4) and 12..32 (via doc5) fuse into
    // ONE 40-token island — the over-merged span no single partner shares
    assert(d3(8L) == Seq((0L, 40L)), s"level 8: ${d3(8L)}")
    // level 16 splits it into the two per-partner maximal extents:
    // doc4's 20 tokens (16-gram starts 0..4) and doc5's 28 (starts 12..24)
    assert(d3(16L) == Seq((0L, 20L), (12L, 28L)), s"level 16: ${d3(16L)}")
    // level 32: neither partner shares 32 contiguous tokens — no span
    assert(d3(32L).isEmpty, s"level 32: ${d3(32L)}")
    // and the refined extents sit strictly inside the over-merged one
    assert(d3(16L).forall { case (s, n) => s >= 0L && s + n <= 40L })
  }
}
