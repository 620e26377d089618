package graft.operators

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the q160b layout loop actually SKIPS data — the property the
  * DuckDB oracle cannot see (the aggregate is layout-invariant): writing
  * lineitem Hilbert-bucketed and reading a box back must (a) return exactly
  * the directly-filtered rows, (b) eliminate dead buckets as static
  * partition filters so their files are never opened, and (c) prune
  * strictly better than an unclustered (hash-shuffled) layout of the same
  * data, whose per-bucket envelopes span the whole space. */
class LayoutPruningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private val (xlo, xhi, ylo, yhi) = (1L, 100L, 1L, 3L)

  private def lineitem = graft.Tables(spark, dir, "lineitem")
    .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
      col("l_returnflag"))

  private def hilbertKey = graft.expressions.HilbertFunctions
    .hilbertIndex(col("l_partkey"), col("l_suppkey"), 16)

  test("box read over the Hilbert layout matches the direct filter row-for-row") {
    val out = Files.createTempDirectory("hlay").toString
    LayoutWriter.write(lineitem, "l_partkey", "l_suppkey", hilbertKey, out)
    val viaLayout = LayoutWriter
      .readBox(spark, out, "l_partkey", xlo, xhi, "l_suppkey", ylo, yhi)
      .orderBy("l_partkey", "l_suppkey", "l_quantity", "l_returnflag").collect()
    val direct = lineitem
      .filter(col("l_partkey").between(xlo, xhi) && col("l_suppkey").between(ylo, yhi))
      .orderBy("l_partkey", "l_suppkey", "l_quantity", "l_returnflag").collect()
    assert(viaLayout.length == direct.length && viaLayout.sameElements(direct))
  }

  test("dead buckets become static partition filters: fewer files opened, " +
       "box pushed into the survivors") {
    val out = Files.createTempDirectory("hlay2").toString
    LayoutWriter.write(lineitem, "l_partkey", "l_suppkey", hilbertKey, out)
    val live = LayoutWriter.intersectingBuckets(spark, out, xlo, xhi, ylo, yhi)
    val total = spark.read.parquet(s"$out/stats").count()
    assert(total == 16, s"expected 16 buckets, got $total")
    assert(live.length < total,
      s"the box must not intersect every envelope (live=${live.length})")
    val scan = LayoutWriter
      .readBox(spark, out, "l_partkey", xlo, xhi, "l_suppkey", ylo, yhi)
    val plan = scan.queryExecution.executedPlan.toString
    // the bucket IN list is a static partition filter (directory pruning)
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan)
    // the box predicates reach the parquet reader (row-group pruning);
    // the FileScan summary truncates the PushedFilters list, so assert on
    // its head
    assert(plan.contains("PushedFilters: [IsNotNull(l_partkey)")
      && plan.contains("GreaterThanOrEqual(l_partkey,1)"), plan)
    // and the scan really opens only the surviving buckets' files: every
    // returned row comes from a live bucket directory
    val filesRead = scan.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(filesRead.nonEmpty && filesRead.size <= live.length,
      s"read ${filesRead.size} files for ${live.length} live buckets")
    assert(filesRead.forall(f => live.exists(b => f.contains(s"bucket=$b/"))),
      s"scan touched a dead bucket: $filesRead vs live=${live.mkString(",")}")
  }

  test("empty input round-trips: schema-only layout, empty pruned read") {
    val out = Files.createTempDirectory("hlay0").toString
    LayoutWriter.write(lineitem.filter(col("l_partkey") < 0),
      "l_partkey", "l_suppkey", hilbertKey, out)
    assert(LayoutWriter.intersectingBuckets(spark, out, xlo, xhi, ylo, yhi).isEmpty)
    assert(LayoutWriter
      .readBox(spark, out, "l_partkey", xlo, xhi, "l_suppkey", ylo, yhi)
      .count() == 0)
  }

  test("both curve layouts beat the unclustered layout across a box battery") {
    // measured honestly: at 16 buckets on this fixture the two curves are
    // statistically indistinguishable (repartitionByRange boundary
    // sampling is seeded per RDD id, so curve-vs-curve flips between runs
    // — observed hilbert 39..40 vs z-order 37..39 on the same data); the
    // DETERMINISTIC property is that either curve clusters far better
    // than an unclustered layout, whose every envelope spans ~the full
    // space. Curve-vs-curve numbers are reported for the record.
    val zKey = (0 until 16).map { i =>
      shiftleft(shiftright(col("l_partkey"), i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftright(col("l_suppkey"), i).bitwiseAND(1), 2 * i + 1)
    }.reduce(_ + _).cast("long")
    val rKey = abs(hash(col("l_partkey"), col("l_suppkey"), col("l_quantity"))).cast("long")
    val hOut = Files.createTempDirectory("hcmp").toString
    val zOut = Files.createTempDirectory("zcmp").toString
    val rOut = Files.createTempDirectory("rcmp").toString
    LayoutWriter.write(lineitem, "l_partkey", "l_suppkey", hilbertKey, hOut)
    LayoutWriter.write(lineitem, "l_partkey", "l_suppkey", zKey, zOut)
    LayoutWriter.write(lineitem, "l_partkey", "l_suppkey", rKey, rOut)
    val boxes = Seq((1L, 50L, 1L, 10L), (50L, 100L, 1L, 3L), (1L, 200L, 4L, 6L),
      (120L, 160L, 2L, 8L), (1L, 25L, 1L, 2L), (90L, 110L, 5L, 10L))
    val (hSum, zSum, rSum) = boxes.map { case (a, b, c, d) =>
      (LayoutWriter.intersectingBuckets(spark, hOut, a, b, c, d).length,
        LayoutWriter.intersectingBuckets(spark, zOut, a, b, c, d).length,
        LayoutWriter.intersectingBuckets(spark, rOut, a, b, c, d).length)
    }.reduce((p, q) => (p._1 + q._1, p._2 + q._2, p._3 + q._3))
    info(s"summed intersecting envelopes over ${boxes.size} boxes: " +
      s"hilbert=$hSum zorder=$zSum unclustered=$rSum")
    assert(hSum < rSum, s"hilbert ($hSum) must beat unclustered ($rSum)")
    assert(zSum < rSum, s"z-order ($zSum) must beat unclustered ($rSum)")
  }

  test("Hilbert clustering prunes strictly better than an unclustered layout") {
    val hOut = Files.createTempDirectory("hlay3").toString
    val rOut = Files.createTempDirectory("rlay3").toString
    LayoutWriter.write(lineitem, "l_partkey", "l_suppkey", hilbertKey, hOut)
    // same writer, same bucket count, but a content-hash key: buckets are
    // random samples, so every envelope spans ~the full (pk, sk) space
    LayoutWriter.write(lineitem, "l_partkey", "l_suppkey",
      abs(hash(col("l_partkey"), col("l_suppkey"), col("l_quantity"))).cast("long"),
      rOut)
    val hLive = LayoutWriter.intersectingBuckets(spark, hOut, xlo, xhi, ylo, yhi).length
    val rLive = LayoutWriter.intersectingBuckets(spark, rOut, xlo, xhi, ylo, yhi).length
    assert(hLive < rLive,
      s"hilbert layout must intersect fewer envelopes (hilbert=$hLive, random=$rLive)")
    // identical results from both layouts regardless
    val a = LayoutWriter.readBox(spark, hOut, "l_partkey", xlo, xhi, "l_suppkey", ylo, yhi).count()
    val b = LayoutWriter.readBox(spark, rOut, "l_partkey", xlo, xhi, "l_suppkey", ylo, yhi).count()
    assert(a == b)
  }
}
