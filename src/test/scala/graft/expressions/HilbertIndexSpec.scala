package graft.expressions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HilbertIndex correctness: the known first-order curve, an exhaustive
  * bijectivity + grid-adjacency proof on the 16×16 grid (the property that
  * distinguishes Hilbert from z-order), interpreted/codegen parity, and
  * input masking. */
class HilbertIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def d(x: Long, y: Long, bits: Int): Long =
    HilbertIndex(
      org.apache.spark.sql.catalyst.expressions.Literal(x),
      org.apache.spark.sql.catalyst.expressions.Literal(y),
      bits).eval(null).asInstanceOf[Long]

  test("first-order curve visits the quadrants in U order") {
    assert(d(0, 0, 1) == 0L)
    assert(d(0, 1, 1) == 1L)
    assert(d(1, 1, 1) == 2L)
    assert(d(1, 0, 1) == 3L)
  }

  test("bits=4: bijective on the 16x16 grid and consecutive cells are neighbors") {
    val cells = for (x <- 0 until 16; y <- 0 until 16) yield (x, y, d(x, y, 4))
    // bijection: indices are exactly 0..255
    assert(cells.map(_._3).sorted == (0L until 256L))
    // Hilbert property: walking the curve moves one grid step at a time
    val byD = cells.sortBy(_._3)
    byD.sliding(2).foreach { case Seq((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
  }

  test("codegen path matches interpreted eval") {
    val pts = (0 until 500).map { i =>
      val rnd = new scala.util.Random(i)
      (rnd.nextLong().abs % 65536, rnd.nextLong().abs % 65536)
    }
    val viaDf = pts.toDF("x", "y")
      .select(HilbertFunctions.hilbertIndex(col("x"), col("y"), 16).as("d"))
      .as[Long].collect().toSeq
    val viaEval = pts.map { case (x, y) => d(x, y, 16) }
    assert(viaDf == viaEval)
  }

  test("inputs beyond the grid mask to the low bits") {
    assert(d(65536L + 7, 65536L * 3 + 11, 16) == d(7, 11, 16))
  }

  test("null inputs yield null") {
    val out = Seq((Some(1L), None: Option[Long])).toDF("x", "y")
      .select(HilbertFunctions.hilbertIndex(col("x"), col("y"), 8).as("d"))
      .collect()
    assert(out.head.isNullAt(0))
  }
}
