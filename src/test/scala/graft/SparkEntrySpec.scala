package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: the flagship entry produces rows, every
  * oracle key has a query, names are unique, and the SQL-function surface
  * registers and evaluates. */
class SparkEntrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("entry() answers the flagship ingest query with rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSet == Set("instrument", "n_ticks", "avg_spread", "latest_tick"))
    // spread of the synthesized ticks is the constructed 0.01 gap
    assert(rows.forall(r => math.abs(r.getDouble(2) - 0.01) < 1e-6))
  }

  test("registry: unique names, every oracle key has a query") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
    assert(qs.size >= 55, s"registry shrank: ${qs.size}")
  }

  test("GraftExtensions: custom expressions callable from SQL") {
    GraftExtensions.register(spark)
    val cos = spark.sql(
      "SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))").collect().head.getDouble(0)
    assert(cos == 1.0)
    val proto = spark.sql(
      "SELECT encode_heartbeat_proto(named_struct('time', '2024-01-15T09:30:05Z', " +
        "'message_type', 'HEARTBEAT'), TIMESTAMP '2024-01-15 09:30:05', 0)").collect().head
    assert(proto.getAs[Array[Byte]](0).nonEmpty)
  }
}
