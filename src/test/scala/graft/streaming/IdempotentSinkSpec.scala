package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once file output from an at-least-once foreachBatch sink: the
  * batch-id-partitioned overwrite write must make batch replay a no-op
  * (Sinks.idempotentParquet / Sinks.writeBatch). */
class IdempotentSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streamed batches land in batch_id partitions; replaying one is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft-idem-out").toString
    val ckpt = Files.createTempDirectory("graft-idem-ckpt").toString

    val ms = MemoryStream[(Long, String)]
    val query = Sinks.idempotentParquet(ms.toDF().toDF("id", "v"), out, ckpt)
    try {
      ms.addData((1L, "a"), (2L, "b"))
      query.processAllAvailable()
      ms.addData((3L, "c"))
      query.processAllAvailable()
    } finally query.stop()

    def readAll() = spark.read.option("basePath", out).parquet(out)
      .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val afterStream = readAll()
    assert(afterStream == Seq((1L, "a"), (2L, "b"), (3L, "c")), afterStream)

    // crash-replay contract: re-delivering batch 1 (the (3,"c") batch) must
    // overwrite its own partition, not append — same rows after as before
    Sinks.writeBatch(Seq((3L, "c")).toDF("id", "v"), out, 1L)
    val afterReplay = readAll()
    assert(afterReplay == afterStream, afterReplay)

    // and a replay with corrected content replaces the partition wholesale
    Sinks.writeBatch(Seq((4L, "d")).toDF("id", "v"), out, 1L)
    val afterRewrite = readAll()
    assert(afterRewrite == Seq((1L, "a"), (2L, "b"), (4L, "d")), afterRewrite)
  }
}
