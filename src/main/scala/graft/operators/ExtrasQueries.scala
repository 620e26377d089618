package graft.operators

import graft.Registry.{Q, q, rowsOnly}
import graft.Tables
import graft.functions.OandaColumns
import org.apache.spark.sql.functions._

/** Remaining declared-surface entries: the UDF/expression surface (B38,
  * exercising the P8 spread semantics through the engine's column library
  * over fixture data) and the multimodal plumbing query (north-star; binary
  * payload + stubbed codec — no oracle, locked by MultimodalSpec).
  */
object ExtrasQueries {

  val all: Seq[Q] = Seq(

    // B38: the engine's spread column function (P8 0.0-coercion) applied to
    // string-cast fixture columns: the numeric side round-trips through a
    // string cast, the garbage side (a flag letter) coerces to 0.0.
    q("q38_udf_spread", "B38 engine spread function over string-cast columns (P8 semantics)")(
      """SELECT l_orderkey, l_linenumber,
        |       round(coalesce(try_cast(CAST(l_extendedprice AS VARCHAR) AS DOUBLE), 0.0)
        |             - coalesce(try_cast(l_returnflag AS DOUBLE), 0.0), 4) AS spread
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        round(OandaColumns.spread(
          col("l_extendedprice").cast("string"), col("l_returnflag")), 4).as("spread"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Multimodal: binary columns + typed metadata + mapPartitions codec
    // plumbing (stubbed decode — see Multimodal.FakeCodec).
    rowsOnly("q39_multimodal_features", "multimodal decode/feature/resize over binary payloads") {
      (s, dir) => graft.multimodal.Multimodal.featuresQuery(s, dir)
    }
  )
}
