package graft.streaming

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** eventsStream's both-generations contract, proven against real files:
  * the driver regenerated the fixtures mid-round-5 from ns-precision to µs
  * timestamps, and the streaming source must keep working on EITHER (the
  * batch `Tables` loader's documented don't-crash rule). The µs branch is
  * exercised by every streaming query in the suite; this spec pins the ns
  * branch with a committed pyarrow-written timestamp[ns] fixture — the
  * footer probe must pick the LongType schema + µs truncation and produce
  * exactly what the batch path computes over the same file. */
class EventsStreamCompatSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("ns-precision events fixture streams and matches the batch formulation") {
    import org.apache.spark.sql.functions._
    val dir = getClass.getResource("/ns_events").getPath
    // streaming leg: the registry's watermarked window agg over the ns dir
    val streamed = SparkEntry.queries("q29_stream_watermark")(spark, dir)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed.nonEmpty, "watermark closed no windows on the ns fixture")
    // batch leg: identical window arithmetic through the batch loader
    // (which applies the same ns→µs truncation), with q29's close gate
    val ev = graft.Tables(spark, dir, "events")
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val batch = ev
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
      .select(col("window.start").as("ws"), col("n"), col("sv"))
      .filter(col("ws") + expr("INTERVAL 1 HOUR") <=
        lit(maxTs) - expr("INTERVAL 10 MINUTE"))
      .orderBy("ws")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
  }
}
