package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** TopKAggregator's algebraic contract: any split of the input into
  * partial buffers merged in any order must equal the single-pass fold —
  * the property that lets Spark trim map-side and keep k-bounded state in
  * streaming windows (q176). Seeded-random partitions, no ScalaCheck
  * (offline env — NOTES.md). */
class TopKAggregatorSpec extends AnyFunSuite {
  private val agg = new TopKAggregator(3)

  private def foldAll(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("merge of arbitrary partials equals the single-pass fold") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 50) {
      val xs = Seq.fill(1 + rnd.nextInt(40))(
        (rnd.nextInt(10).toDouble, rnd.nextLong().abs % 100))
      val expected = foldAll(xs)
      // random split into 1-5 partials, merged in shuffled order
      val parts = xs.grouped(1 + rnd.nextInt(5)).map(foldAll).toSeq
      val merged = rnd.shuffle(parts).foldLeft(agg.zero)(agg.merge)
      assert(merged == expected, s"trial $trial: $xs")
    }
  }

  test("ties on value break by ascending id; k bounds the buffer") {
    val out = foldAll(Seq((5.0, 9L), (5.0, 2L), (5.0, 7L), (1.0, 1L)))
    assert(out == Seq((5.0, 2L), (5.0, 7L), (5.0, 9L)))
    assert(out.size == 3)
  }

  test("k < 1 rejected") {
    intercept[IllegalArgumentException] { new TopKAggregator(0) }
  }
}
