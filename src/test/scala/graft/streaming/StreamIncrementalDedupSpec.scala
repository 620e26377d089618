package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Multi-batch semantics of the streaming incremental dedup (q62): the
  * keep-first state must persist across micro-batches, so a content hash
  * re-arriving in a LATER batch is suppressed — the property the
  * single-batch oracle replay cannot itself prove. */
class StreamIncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("keep-first state suppresses re-arrivals of a hash in later batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // (doc_id, hash): the q62 stateful core — emit the min doc_id the first
    // time a hash is seen, nothing on any later sighting.
    val ms = MemoryStream[(Long, String)]
    val kept = ms.toDS()
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, (Long, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (h: String, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          val mn = rows.map(_._1).min
          if (state.getOption.isEmpty) { state.update(mn); Iterator((mn, h)) }
          else Iterator.empty
      }
      .toDF("doc_id", "h")

    val ckpt = Files.createTempDirectory("graft-incdedup-ckpt").toString
    val name = s"incdedup_${System.nanoTime()}"
    val query = kept.writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .format("memory").queryName(name).start()
    try {
      // batch 1: two docs share hash "a" → min wins; "b" kept
      ms.addData((7L, "a"), (3L, "a"), (5L, "b"))
      query.processAllAvailable()
      // batch 2: "a" re-arrives with a LOWER id — must still be suppressed
      // (the corpus already kept doc 3); new hash "c" goes through
      ms.addData((1L, "a"), (9L, "c"))
      query.processAllAvailable()
    } finally query.stop()

    val got = spark.table(name)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((3L, "a"), (5L, "b"), (9L, "c")), got)
  }
}
