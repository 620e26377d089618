package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence + convergence checks for the large-star/small-star CC
  * implementation — the extreme-diameter alternative to q34g's min-label
  * propagation (same (doc_id, component=min-id) contract). */
class StarContractionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  private def labels(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("star contraction matches label propagation on the fixture edge set") {
    val edges = DedupQueries.jaccardEdges(spark, dir)
    val star = labels(StarContraction.components(edges))
    val prop = labels(graft.SparkEntry.queries("q34g_dedup_components")(spark, dir))
    assert(star == prop, s"star=${star.size} prop=${prop.size}, diff=${(star diff prop).take(5)}")
  }

  test("star contraction labels a 64-node path in few rounds (diameter-free)") {
    import spark.implicits._
    // a path 0-1-...-63: label propagation needs ~diameter rounds; star
    // contraction must still produce component 0 for every node
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("d1", "d2")
    val got = labels(StarContraction.components(edges))
    assert(got == (0L to 63L).map(i => (i, 0L)).toSet, got.toSeq.sortBy(_._1).take(8))
  }

  test("star contraction keeps disjoint components apart") {
    import spark.implicits._
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 30L))
      .toDF("d1", "d2")
    val got = labels(StarContraction.components(edges))
    assert(got == Set((10L, 10L), (11L, 10L), (12L, 10L),
      (20L, 20L), (21L, 20L), (30L, 30L), (31L, 30L)), got)
  }
}
