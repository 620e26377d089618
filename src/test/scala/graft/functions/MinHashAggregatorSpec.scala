package graft.functions

import graft.SparkTestSession
import graft.functions.PortableHash._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The typed MinHash Aggregator (one-pass, partial-aggregable) must produce
  * the exact signatures of the oracle-checked SQL formulation (q34b). */
class MinHashAggregatorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("MinHashAggregator signatures == q34b SQL-formulation signatures") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables(spark, dir, "documents").limit(50)
    val sh = docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(shingles(col("t"), 3)).as("s")).distinct()
      .withColumn("h1", h1(col("s")))

    val agg = udaf(new MinHashAggregator)
    val fromAgg = sh.groupBy("doc_id").agg(agg(col("h1")).as("sig"))
      .select(col("doc_id"), posexplode(col("sig")))
      .select(col("doc_id"), col("pos").cast("long").as("j"), col("col").as("mh"))

    val fromSql = sh
      .select(col("doc_id"), posexplode(array(
        minhashPerms.map { case (a, b) => (lit(a) * col("h1") + lit(b)) % P }: _*)))
      .groupBy(col("doc_id"), col("pos")).agg(min(col("col")).as("mh"))
      .select(col("doc_id"), col("pos").cast("long").as("j"), col("mh"))

    assert(fromAgg.except(fromSql).count() == 0)
    assert(fromSql.except(fromAgg).count() == 0)
    assert(fromAgg.count() == 50L * minhashPerms.size)
  }

  test("merge associativity: repartitioned input yields identical signatures") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables(spark, dir, "documents").limit(20)
    val sh = docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(shingles(col("t"), 3)).as("s")).distinct()
      .withColumn("h1", h1(col("s")))
    val agg = udaf(new MinHashAggregator)
    val a = sh.repartition(1).groupBy("doc_id").agg(agg(col("h1")).as("sig"))
    val b = sh.repartition(7).groupBy("doc_id").agg(agg(col("h1")).as("sig"))
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }
}
