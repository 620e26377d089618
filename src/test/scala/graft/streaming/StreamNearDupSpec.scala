package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Multi-batch semantics of the streaming near-dup miner (q56): the
  * band-bucket state must persist across micro-batches, so a duplicate
  * arriving in a LATER batch still pairs with the batch-1 keeper — the
  * property the single-batch oracle replay cannot itself prove. */
class StreamNearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("band-bucket state pairs cross-batch duplicates with the first-batch keeper") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // (doc_id, bucket): same bucket key ⇒ near-dup candidates. The miner
    // below is the q56 stateful core with an identity "band": state carries
    // the minimum doc_id per bucket across batches.
    val ms = MemoryStream[(Long, Long)]
    val pairs = ms.toDS()
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val ds = rows.map(_._1).toArray.sorted
          var mn = state.getOption.getOrElse(Long.MaxValue)
          val out = Seq.newBuilder[(Long, Long, Long)]
          ds.foreach { d => if (d < mn) mn = d else out += ((bucket, mn, d)) }
          state.update(mn)
          out.result().iterator
      }
      .toDF("bucket", "keeper", "dup")

    val ckpt = Files.createTempDirectory("graft-neardup-ckpt").toString
    val name = s"neardup_${System.nanoTime()}"
    val query = pairs.writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .format("memory").queryName(name).start()
    try {
      ms.addData((1L, 7L), (5L, 7L), (3L, 9L)) // batch 1: keeper(7)=1, pair (1,5)
      query.processAllAvailable()
      ms.addData((9L, 7L), (4L, 9L)) // batch 2: must pair with batch-1 keepers
      query.processAllAvailable()
    } finally query.stop()

    val got = spark.table(name)
      .select("bucket", "keeper", "dup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((7L, 1L, 5L), (7L, 1L, 9L), (9L, 3L, 4L)), got)
  }
}
