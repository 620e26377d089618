package graft.multimodal

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Locks the multimodal plumbing contract: schema, kind routing, batch-shape
  * determinism, and stub-codec invariants (FIXTURES has no binary table, so
  * payloads are synthesized from documents). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  test("features: one row per media, kinds routed, metadata populated per kind") {
    val f = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(spark, dir)).cache()
    assert(f.count() == 500)
    val byKind = f.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind.keySet == Set("image", "audio", "video"))
    import org.apache.spark.sql.functions._
    // image rows have dims, audio rows have samples, video rows have frames
    assert(f.filter(col("kind") === "image" && (col("width") <= 0 || col("height") <= 0)).count() == 0)
    assert(f.filter(col("kind") === "audio" && col("n_samples") <= 0).count() == 0)
    assert(f.filter(col("kind") === "video" && col("n_frames") <= 0).count() == 0)
    // histogram normalized
    val s = f.selectExpr("abs(aggregate(histogram, 0d, (a,x) -> a + x) - 1.0) AS err")
      .agg(max("err")).collect().head.getDouble(0)
    assert(s < 1e-9)
  }

  test("determinism: two runs produce identical feature rows (incl. partitioning changes)") {
    val a = Multimodal.featuresQuery(spark, dir).collect()
    val b = Multimodal.featuresQuery(spark, dir).collect()
    assert(a.sameElements(b))
  }

  test("q310 VAD: both classes populated, island laws hold per clip at both scales") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = Multimodal.vadSegmentsQuery(spark, d).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val (nf, ns) = (rows.map(_._1).sum, rows.map(_._2).sum)
      // the median threshold must genuinely split the corpus's frames
      assert(ns > nf / 4 && ns < 3 * nf / 4, s"$d: degenerate split $ns/$nf")
      rows.foreach { case (f, s, seg, mx) =>
        assert(s <= f && seg <= s && mx <= s, s"$d: island law violated ($f,$s,$seg,$mx)")
        // a clip's longest run times its segment count bounds its active frames
        assert(seg == 0 || mx * seg >= s, s"$d: max run $mx × $seg segments < $s active")
      }
    }
  }

  test("resize halves image dims only") {
    val f = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(spark, dir))
    val r = Multimodal.resizeHalf(f)
    import org.apache.spark.sql.functions._
    val joined = f.toDF().select(col("media_id"), col("kind"), col("width").as("w0"))
      .join(r.toDF().select(col("media_id"), col("width").as("w1")), "media_id")
    assert(joined.filter(col("kind") === "image"
      && col("w1") =!= greatest(lit(1), (col("w0") / 2).cast("int"))).count() == 0)
    assert(joined.filter(col("kind") =!= "image" && col("w1") =!= col("w0")).count() == 0)
  }
}
