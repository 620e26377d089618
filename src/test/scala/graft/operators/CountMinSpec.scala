package graft.operators

import graft.SparkTestSession
import graft.functions.PortableHash._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-level invariants for the q75 count-min heavy hitters that the
  * oracle's cell-for-cell hash match can't express: the one-sided error
  * direction and the magnitude of the over-count across the WHOLE vocabulary
  * (the registry query outputs only the top 20). */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Full-vocabulary (tok, exact, est) frame — same construction as q75. */
  private lazy val est = {
    val cand = graft.Tables(spark, dir, "documents")
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("exact_n"))
    val ic = cand.select(col("tok"), col("exact_n"),
      explode(array((0 until 4).map(i => struct(lit(i).as("i"),
        (md5Long(concat(lit(s"$i:"), col("tok"))) % 256).as("cell"))): _*)).as("h"))
      .select(col("tok"), col("exact_n"), col("h.i").as("i"), col("h.cell").as("cell"))
      .cache()
    val cells = ic.groupBy("i", "cell").agg(sum(col("exact_n")).as("c"))
    ic.join(broadcast(cells), Seq("i", "cell"))
      .groupBy("tok", "exact_n").agg(min(col("c")).as("cm_est"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
  }

  test("count-min never under-estimates (one-sided error)") {
    assert(est.nonEmpty)
    est.foreach { case (tok, exact, e) =>
      assert(e >= exact, s"$tok: est $e < exact $exact")
    }
  }

  test("count-min over-count stays within the d/w collision budget") {
    val n = est.map(_._2).sum // total token occurrences
    // E[row over-count] = N/w; min over d=4 rows sits far below one row's
    // expectation on real data — assert the loose 4N/w ceiling per token
    val bound = 4.0 * n / 256.0
    est.foreach { case (tok, exact, e) =>
      assert(e - exact <= bound, s"$tok: over-count ${e - exact} > $bound")
    }
  }

  test("the exact top-1 heavy hitter tops the estimate ranking too") {
    val exactTop = est.maxBy(r => (r._2, r._1))._1
    val estTop = est.maxBy(r => (r._3, r._1))._1
    assert(exactTop === estTop)
  }

  test("sketches merge: per-partition cell grids sum to the global grid") {
    // the property that makes count-min distributable: build one sketch per
    // half of the corpus, merge by cell-wise addition, and the result must
    // equal the sketch of the whole corpus
    def cells(pred: org.apache.spark.sql.Column): Map[(Int, Long), Long] =
      graft.Tables(spark, dir, "documents").filter(pred)
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .select(col("n"), explode(array((0 until 4).map(i => struct(lit(i).as("i"),
          (md5Long(concat(lit(s"$i:"), col("tok"))) % 256).as("cell"))): _*)).as("h"))
        .groupBy("h.i", "h.cell").agg(sum(col("n")).as("c"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val lo = cells(col("doc_id") < 250)
    val hi = cells(col("doc_id") >= 250)
    val all = cells(lit(true))
    val merged = (lo.keySet ++ hi.keySet).map(k =>
      k -> (lo.getOrElse(k, 0L) + hi.getOrElse(k, 0L))).toMap
    assert(merged == all)
  }
}
