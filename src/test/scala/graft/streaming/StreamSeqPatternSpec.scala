package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Multi-batch semantics of the streaming sequence-pattern matcher (q71b):
  * the per-user DFA state must carry across micro-batches, so a funnel
  * whose prefix arrives in batch 1 and completion in batch 2 is still
  * found — the property the single-batch oracle replay cannot prove. Also
  * proves the O(1)-state FunnelDfa equivalent to the leftmost
  * non-overlapping regex matching the oracle runs, on random strings.
  */
class StreamSeqPatternSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("FunnelDfa equals leftmost non-overlapping regex matching on random strings") {
    val pat = "v+c+p".r
    val rnd = new scala.util.Random(42)
    val alphabet = "vcpse"
    for (_ <- 1 to 5000) {
      val s = (0 until rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(5))).mkString
      val expected = pat.findAllIn(s).length
      var st = 0; var n = 0
      s.foreach { ch =>
        val (s2, done) = FunnelDfa.step(st, ch.toString)
        st = s2; if (done) n += 1
      }
      assert(n == expected, s"seq=$s dfa=$n regex=$expected")
    }
  }

  test("per-user sequence state completes funnels across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // (user, seqNo, chr) — seqNo plays the (ts, event_id) ordering role
    val ms = MemoryStream[(Long, Long, String)]
    val matches = ms.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Int, Long, Long), (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, String)],
         state: GroupState[(Int, Long, Long)]) =>
          var (st, len, n) = state.getOption.getOrElse((0, 0L, 0L))
          rows.toArray.sortBy(_._2).foreach { r =>
            len += 1
            val (st2, done) = FunnelDfa.step(st, r._3)
            st = st2; if (done) n += 1
          }
          state.update((st, len, n))
          if (n > 0) Iterator((user, len, n)) else Iterator.empty
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
