package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q216's scale claim is that the persisted IVF index is read back
  * PARTITION-PRUNED: the probe list lands in the scan's PartitionFilters,
  * so only the probed centroids' directories are opened. A filter that
  * degraded to a post-scan predicate (e.g. after a schema change that
  * stops `cent` being a partition column) would stay value-correct and
  * silently re-read the whole index — exactly the class of regression the
  * plan fingerprints exist to catch, but PLANMAP does not record partition
  * filters, hence this pin.
  */
class VectorIndexPruningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q216 read-back scan carries the probe IN-list as a partition filter") {
    val df = VectorQueries.indexReadbackSearch(spark, dir)
    try {
      val plan = df.queryExecution.executedPlan.toString
      // the index scan must prune on cent at the PARTITION level
      val scanLines = plan.linesIterator.filter(l =>
        l.contains("FileScan parquet") && l.contains("ivf_index")).toSeq
      assert(scanLines.nonEmpty, s"no index scan in plan:\n$plan")
      assert(scanLines.exists(l => l.contains("PartitionFilters") &&
        l.replaceAll(".*PartitionFilters", "").contains("cent")),
        s"index scan does not partition-prune on cent:\n${scanLines.mkString("\n")}")
      // and the query itself returns the exact 2-probe top-3 (rows exist)
      assert(df.count() == 30L)
    } finally spark.catalog.clearCache()
  }
}
