package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for q348 (Mahalanobis outliers). The oracle proves
  * Spark ≡ DuckDB; these pins hold the statistical claim the hash can't:
  * the score is genuinely CORRELATION-AWARE — the top outliers are rows
  * whose marginal z-scores are unremarkable (the z-score/MAD family would
  * never flag them), and the χ² cut arm actually fires on the fixture. */
class MahalanobisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
    test(s"q348 flags correlation outliers invisible to marginal z at $dir") {
      val rows = SparkEntry.queries("q348_mahalanobis")(spark, dir).collect()
      assert(rows.length == 20)
      // the cut arm fires (0.95 cut chosen because 0.99 never does here)
      assert(rows.head.getLong(5) >= 1, "no outliers under the chi2 cut")
      assert(rows.head.getLong(6) > 0)
      // d2 is the sort key, descending
      val d2 = rows.map(_.getLong(4))
      assert(d2.sameElements(d2.sorted.reverse))
      // marginal moments for the z contrast
      val m = graft.Tables(spark, dir, "lineitem").agg(
        avg(col("l_quantity")), stddev_pop(col("l_quantity")),
        avg(floor(col("l_extendedprice"))),
        stddev_pop(floor(col("l_extendedprice")))).head()
      val (mx, sx, my, sy) =
        (m.getDouble(0), m.getDouble(1), m.getDouble(2), m.getDouble(3))
      // EVERY top-20 Mahalanobis outlier is marginally bland: |z| < 3 on
      // both axes — the whole point of covariance-aware scoring
      for (r <- rows) {
        val zx = math.abs(r.getLong(2) - mx) / sx
        val zy = math.abs(r.getLong(3) - my) / sy
        assert(zx < 3 && zy < 3, s"top outlier marginally extreme: $zx $zy")
      }
      // and the top row is STRICTLY inside 2 sigma on at least one axis
      val top = rows.head
      val zx0 = math.abs(top.getLong(2) - mx) / sx
      val zy0 = math.abs(top.getLong(3) - my) / sy
      assert(math.min(zx0, zy0) < 2, s"$zx0 $zy0")
    }
  }
}
