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

  test("q328 Sobel: every image has a real edge, census laws hold at both scales") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = Multimodal.sobelQuery(spark, d).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (h, nInt, total, mx, edges) =
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        assert(nInt == (h - 2) * 14, s"$d: interior count $nInt for height $h")
        assert(mx > 100, s"$d: flat image (max $mx) — synthesis drifted")
        assert(edges < nInt, s"$d: edge census degenerate ($edges/$nInt)")
        assert(total >= mx && total <= nInt * mx, s"$d: magnitude sum out of bounds")
      }
      // corpus-level: nearly every image clears the 300 threshold, yet
      // edges stay a clear minority of interior pixels
      val withEdge = rows.count(_.getLong(5) >= 1L)
      assert(withEdge * 100 >= rows.length * 95, s"$d: only $withEdge/${rows.length} with edges")
      val permille = rows.map(_.getLong(6)).sum / rows.length
      assert(permille > 30 && permille < 400, s"$d: mean edge share $permille permille")
    }
  }

  test("q329 spectral: per-clip DFT energies are consistent with frame count") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = Multimodal.spectralQuery(spark, d).collect()
      rows.foreach { r =>
        val (n, nf) = (r.getLong(1), r.getLong(2))
        assert(nf == n / 40, s"$d: frame count $nf for $n samples")
        Seq(3, 4, 5, 6).foreach(i => assert(r.getLong(i) >= 0L))
        // alternating letter/space text is high-frequency: the 2 kHz bin
        // must carry real mass somewhere in the corpus
      }
      assert(rows.map(_.getLong(6)).max > rows.map(_.getLong(3)).max / 10,
        s"$d: 2 kHz bin empty — synthesis or table drifted")
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
