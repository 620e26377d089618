package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Multi-batch semantics of the streaming sequence-pattern matcher (q71b):
  * the per-user symbol string must accumulate across micro-batches, so a
  * funnel whose prefix arrives in batch 1 and completion in batch 2 is
  * still found — the property the single-batch oracle replay cannot prove.
  */
class StreamSeqPatternSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("per-user sequence state completes funnels across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val pat = "v+c+p".r
    // (user, seqNo, chr) — seqNo plays the (ts, event_id) ordering role
    val ms = MemoryStream[(Long, Long, String)]
    val matches = ms.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[String, (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, String)], state: GroupState[String]) =>
          val add = rows.toArray.sortBy(_._2).map(_._3).mkString
          val seq = state.getOption.getOrElse("") + add
          state.update(seq)
          val n = pat.findAllIn(seq).length
          if (n > 0) Iterator((user, seq.length.toLong, n.toLong)) else Iterator.empty
      }
      .toDF("user_id", "seq_len", "n_funnels")

    val ckpt = Files.createTempDirectory("graft-seqpat-ckpt").toString
    val name = s"seqpat_${System.nanoTime()}"
    val query = matches.writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .format("memory").queryName(name).start()
    try {
      // batch 1: user 1 has views+click (no purchase yet → no emission);
      // user 2 completes a funnel immediately
      ms.addData((1L, 1L, "v"), (1L, 2L, "v"), (1L, 3L, "c"),
        (2L, 1L, "v"), (2L, 2L, "c"), (2L, 3L, "p"))
      query.processAllAvailable()
      val afterB1 = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(afterB1 == Set((2L, 3L, 1L)), s"batch1: $afterB1")

      // batch 2: user 1's purchase arrives → the cross-batch funnel v v c p
      // completes; a second full funnel for user 2 bumps its count to 2
      ms.addData((1L, 4L, "p"), (2L, 4L, "v"), (2L, 5L, "c"), (2L, 6L, "p"))
      query.processAllAvailable()
    } finally query.stop()

    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((2L, 3L, 1L), (1L, 4L, 1L), (2L, 6L, 2L)), got)
  }
}
