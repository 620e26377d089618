package graft.functions

import graft.SparkTestSession
import graft.functions.PortableHash._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** 64-bit SimHash aggregator: consistency with a sequential Scala model,
  * low-16-bit agreement with the oracle-checked q34d formulation, and
  * merge associativity. */
class SimHashAggregatorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def tokensOf(n: Int) = graft.Tables(spark, dir, "documents").limit(n)
    .select(col("doc_id"), explode(tokens(col("text"))).as("w")).distinct()
    .withColumn("hv", md5Long(col("w")))

  /** Scala model of the same fold. */
  private def model(hashes: Seq[Long]): Long = {
    val c = new Array[Int](64)
    hashes.foreach { h =>
      (0 until 64).foreach(i => c(i) += (((h >>> i) & 1L).toInt * 2) - 1)
    }
    (0 until 64).foldLeft(0L)((acc, i) => if (c(i) > 0) acc | (1L << i) else acc)
  }

  test("aggregator == sequential model per doc; low 16 bits == q34d pattern") {
    val tok = tokensOf(30).cache()
    val agg = udaf(new SimHashAggregator)
    val got = tok.groupBy("doc_id").agg(agg(col("hv")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = tok.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSeq).toMap
    byDoc.foreach { case (doc, hs) =>
      assert(got(doc) == model(hs), s"doc $doc")
    }
    // low 16 bits must equal the oracle-checked 16-bit query's values
    val q34d = graft.SparkEntry.queries("q34d_simhash")(spark, dir)
      .filter(col("doc_id") < 30).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    q34d.foreach { case (doc, s16) =>
      assert((got(doc) & 0xffffL) == s16, s"doc $doc low bits")
    }
  }

  test("merge associativity across repartitionings + hamming sanity") {
    val tok = tokensOf(20)
    val agg = udaf(new SimHashAggregator)
    val a = tok.repartition(1).groupBy("doc_id").agg(agg(col("hv")).as("sh"))
    val b = tok.repartition(11).groupBy("doc_id").agg(agg(col("hv")).as("sh"))
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
    assert(SimHash.hamming(0L, -1L) == 64 && SimHash.hamming(5L, 5L) == 0)
  }
}
