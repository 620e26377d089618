package graft.operators

import graft.Registry.{Q, q, rowsOnly}
import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch relational surface (SURVEY.md §2B B1–B25), expressed Spark-first:
  * declarative DataFrame plans that Catalyst plans (pushdown, pruning,
  * broadcast-vs-SMJ, partial aggregation, TakeOrderedAndProject) — no
  * hand-scheduling. Each query carries an equivalent DuckDB SQL oracle.
  *
  * Determinism: explicit ORDER BY w/ tiebreak keys, round(·,4) on doubles,
  * BIGINT casts where Spark/DuckDB integer widths diverge (count/rank/ceil).
  */
object RelationalQueries {

  private def r4(c: Column): Column = round(c, 4)

  /** Order-independent big sum: round each double to the 4-decimal grid,
    * sum exactly in DECIMAL (associative), return double. Large double sums
    * otherwise diverge from the oracle in the 4th decimal at sf≥0.1 because
    * summation order differs between engines. */
  private def dsum(c: Column): Column =
    sum(round(c, 4).cast("decimal(28,4)")).cast("double")

  /** q196's join frame, written in the WORST order — lineitem ⋈ orders
    * (the two facts) first, the filtered customer dim last — over
    * ANALYZE'd external catalog twins of the fixture tables. With
    * cbo.enabled + cbo.joinReorder.enabled the optimizer rewrites the
    * order from the catalog stats; without them the written order stands.
    * Factored out so CboPlanSpec can build the same frame under both conf
    * arms and inspect the optimized plan. CREATE + ANALYZE run once per
    * (session, sf): external tables over the fixture files (no copy), one
    * stats scan each. */
  private[graft] def cboJoinFrame(s: SparkSession, dir: String): DataFrame = {
    val sf = new java.io.File(dir).getName.replace('.', '_')
    // per-application location: same concurrency defense as q186
    val loc = s"/tmp/graft_cbo_db_${s.sparkContext.applicationId}"
    s.sql(s"CREATE DATABASE IF NOT EXISTS graft_cbo LOCATION '$loc'")
    val names = Seq("lineitem", "orders", "customer").map { t =>
      val tbl = s"graft_cbo.${t}_$sf"
      if (!s.catalog.tableExists(tbl)) {
        s.sql(s"CREATE TABLE $tbl USING parquet LOCATION '$dir/$t.parquet'")
        s.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS")
        s.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR ALL COLUMNS")
      }
      t -> tbl
    }.toMap
    s.sql(
      s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue
         |FROM ${names("lineitem")} JOIN ${names("orders")} ON l_orderkey = o_orderkey
         |                          JOIN ${names("customer")} ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  val all: Seq[Q] = Seq(

    // B1: parquet scan — row counts of every fixture table.
    q("q01_table_counts", "B1 parquet scan: row counts of all fixture tables")(
      Tables.names.map(n => s"SELECT '$n' AS tbl, count(*) AS n FROM $n")
        .mkString("", " UNION ALL ", " ORDER BY tbl")
    ) { (s, dir) =>
      Tables.names.map { n =>
        Tables(s, dir, n).agg(count(lit(1)).as("n")).select(lit(n).as("tbl"), col("n"))
      }.reduce(_.unionAll(_)).orderBy("tbl")
    },

    // B2: projection with derived arithmetic column.
    q("q02_projection", "B2 projection: derived revenue column")(
      """SELECT l_orderkey, l_linenumber,
        |       round(l_extendedprice * (1 - l_discount), 4) AS revenue
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          r4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // B3: filter — BETWEEN, IN, LIKE, conjunction (pushed to parquet scan).
    q("q03_filter", "B3 filters: BETWEEN + IN + LIKE conjunction")(
      """SELECT l_orderkey, l_linenumber, round(l_quantity,4) AS qty
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1997-12-31 23:59:59'
        |  AND l_returnflag IN ('N','R') AND l_linestatus LIKE 'O%' AND l_discount > 0.02
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate").between(lit("1997-01-01 00:00:00").cast("timestamp"),
          lit("1997-12-31 23:59:59").cast("timestamp"))
          && col("l_returnflag").isin("N", "R")
          && col("l_linestatus").like("O%")
          && col("l_discount") > 0.02)
        .select(col("l_orderkey"), col("l_linenumber"), r4(col("l_quantity")).as("qty"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // B4: inner equi-join; dim side broadcast (customer is small vs orders).
    q("q04_join_inner", "B4 broadcast inner equi-join orders⋈customer")(
      """SELECT o_orderkey, c_name, round(o_totalprice,4) AS price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "orders")
        .join(broadcast(Tables(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), r4(col("o_totalprice")).as("price"))
        .orderBy("o_orderkey")
    },

    // B5: left outer join + aggregation over the nullable side.
    q("q05_join_left", "B5 left outer join customer⟕orders, null-aware agg")(
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |       round(CAST(coalesce(sum(CAST(round(o_totalprice, 4) AS DECIMAL(28,4))), 0) AS DOUBLE), 4) AS total
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"), col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          r4(coalesce(dsum(col("o_totalprice")), lit(0.0))).as("total"))
        .orderBy("c_custkey")
    },

    // B5: full outer join between two filtered/aggregated sides.
    q("q05b_join_full", "B5 full outer join of high-balance customers vs big-order custkeys")(
      """SELECT coalesce(c_custkey, o_custkey) AS custkey,
        |       (c_custkey IS NOT NULL) AS has_cust,
        |       coalesce(n_big, 0) AS n_big
        |FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 4000) c
        |FULL JOIN (SELECT o_custkey, count(*) AS n_big FROM orders
        |           WHERE o_totalprice > 150000 GROUP BY o_custkey) o
        |  ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin
    ) { (s, dir) =>
      val c = Tables(s, dir, "customer").filter(col("c_acctbal") > 4000).select("c_custkey")
      val o = Tables(s, dir, "orders").filter(col("o_totalprice") > 150000)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_big"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_custkey").isNotNull.as("has_cust"),
          coalesce(col("n_big"), lit(0L)).as("n_big"))
        .orderBy("custkey")
    },

    // B6: left-semi join ≙ EXISTS.
    q("q06_join_semi", "B6 left-semi join: customers having orders")(
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"), col("o_custkey") === col("c_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },

    // B6: left-anti join ≙ NOT EXISTS (against a filtered right side so the
    // result is non-empty at every sf).
    q("q06b_join_anti", "B6 left-anti join: customers without any 250k+ order")(
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        |ORDER BY c_custkey""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders").filter(col("o_totalprice") > 250000),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },

    // B7: multi-way join chain (TPC-H Q5 shape); small dims broadcast.
    q("q07_join_multiway", "B7 region→nation→customer→orders→lineitem revenue by nation")(
      """SELECT n_name,
        |       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue
        |FROM region
        |JOIN nation   ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders   ON o_custkey   = c_custkey
        |JOIN lineitem ON l_orderkey  = o_orderkey
        |WHERE r_name IN ('ASIA','EUROPE')
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin
    ) { (s, dir) =>
      val region = Tables(s, dir, "region").filter(col("r_name").isin("ASIA", "EUROPE"))
      val nation = Tables(s, dir, "nation")
      val customer = Tables(s, dir, "customer")
      val orders = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      val lineitem = Tables(s, dir, "lineitem")
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(r4(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // B8: non-equi range join. Spark side uses the scalable range-bin rewrite:
    // equi-join on (user_id, 5-min bin) with the follower exploded into the two
    // candidate bins, then the exact theta predicate — avoids the O(n·m)
    // BroadcastNestedLoopJoin a naive theta join plans at 100 TB.
    q("q08_range_join", "B8 range self-join: follow-up events within 5 minutes, binned rewrite")(
      """SELECT e1.user_id AS user_id, count(*) AS n_pairs
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id
        | AND e2.ts::TIMESTAMP >  e1.ts::TIMESTAMP
        | AND e2.ts::TIMESTAMP <= e1.ts::TIMESTAMP + INTERVAL 5 MINUTE
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val binSec = 300L
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), (unix_timestamp(col("ts")) / binSec).cast("long").as("bin"))
      val lead = e.select(col("user_id").as("u2"), col("ts").as("ts2"), col("bin").as("bin2"))
        .withColumn("jbin", explode(array(col("bin2"), col("bin2") - 1)))
      e.join(lead,
          col("user_id") === col("u2") && col("bin") === col("jbin")
            && col("ts2") > col("ts")
            && col("ts2") <= col("ts") + expr("INTERVAL 5 MINUTES"))
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    },

    // B9: grouped hash aggregation (TPC-H Q1): partial+final HashAggregate.
    q("q09_agg_q1", "B9 TPC-H Q1 grouped aggregation over lineitem")(
      """SELECT l_returnflag, l_linestatus,
        |       round(CAST(sum(CAST(round(l_quantity, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_qty,
        |       round(CAST(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_base,
        |       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_disc,
        |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))), 4) AS DOUBLE) AS sum_charge,
        |       round(avg(l_quantity), 4)                              AS avg_qty,
        |       round(avg(l_extendedprice), 4)                         AS avg_price,
        |       count(*)                                               AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          r4(dsum(col("l_quantity"))).as("sum_qty"),
          r4(dsum(col("l_extendedprice"))).as("sum_base"),
          r4(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc"),
          // charge is an exact 6-decimal value per row (three 2-decimal
          // factors); rounding per-row at 4 would sit exactly on .XX50 ties
          // that the engines break differently — so sum the exact decimals
          // and round once at the end
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))).cast("decimal(28,6)")), 4)
            .cast("double").as("sum_charge"),
          r4(avg(col("l_quantity"))).as("avg_qty"),
          r4(avg(col("l_extendedprice"))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // B10: global (no-group) aggregation incl. exact count-distinct.
    q("q10_agg_global", "B10 global aggregation over orders")(
      """SELECT count(*) AS n, count(DISTINCT o_custkey) AS n_cust,
        |       round(CAST(sum(CAST(round(o_totalprice, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS total,
        |       round(avg(o_totalprice), 4) AS avg_price,
        |       round(min(o_totalprice), 4) AS min_price,
        |       round(max(o_totalprice), 4) AS max_price
        |FROM orders""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "orders").agg(
        count(lit(1)).as("n"), countDistinct(col("o_custkey")).as("n_cust"),
        r4(dsum(col("o_totalprice"))).as("total"),
        r4(avg(col("o_totalprice"))).as("avg_price"),
        r4(min(col("o_totalprice"))).as("min_price"),
        r4(max(col("o_totalprice"))).as("max_price"))
    },

    // B11: distinct projection.
    q("q11_distinct", "B11 distinct flag/status combinations")(
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem").select("l_returnflag", "l_linestatus")
        .distinct().orderBy("l_returnflag", "l_linestatus")
    },

    // B11: approximate count-distinct via the engine's PORTABLE KMV
    // bottom-256 sketch (same estimator family the optimizer rewrite q345
    // applies transparently) — bounded O(k) state per (partition, group)
    // on both sides of the shuffle, rel. σ ≈ 1/√254 ≈ 6.3 %. Unlike the
    // HLL++ row this replaces (rows-only for 10 rounds), the k smallest
    // distinct md5 hashes are pure set arithmetic, so DuckDB reproduces
    // the sketch — and the estimate — bit-for-bit and the row carries a
    // full hash oracle. Spark's native approx_count_distinct (HLL++)
    // stays covered by ApproxAndRecallSpec's error-bound test.
    {
      import graft.functions.PortableHash.{md5Long, md5LongSql, kmvEstimateSql}
      q("q11b_approx_distinct",
        "B11 approx distinct orders per returnflag (portable KMV bottom-256, hash-verified)")(
        s"""WITH h AS (SELECT DISTINCT l_returnflag,
           |                  ${md5LongSql("'o:' || l_orderkey")} AS h FROM lineitem),
           |r AS (SELECT l_returnflag, h,
           |             row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn,
           |             count(*) OVER (PARTITION BY l_returnflag) AS nd
           |      FROM h),
           |g AS (SELECT l_returnflag, max(nd) AS nd,
           |             max(CASE WHEN rn = 256 THEN h END) AS h256
           |      FROM r GROUP BY l_returnflag)
           |SELECT l_returnflag, ${kmvEstimateSql("nd", "h256", 256)} AS approx_orders
           |FROM g ORDER BY l_returnflag""".stripMargin
      ) { (s, dir) =>
        val kmv = udaf(new graft.functions.KmvAggregator(256))
        Tables(s, dir, "lineitem")
          .select(col("l_returnflag"),
            md5Long(concat(lit("o:"), col("l_orderkey").cast("string"))).as("h"))
          .groupBy("l_returnflag").agg(kmv(col("h")).as("mins"))
          .select(col("l_returnflag"),
            expr(kmvEstimateSql("size(mins)", "element_at(mins, 256)", 256))
              .as("approx_orders"))
          .orderBy("l_returnflag")
      }
    },

    // B12: rollup w/ GROUPING() markers (orders ⋈ customer ⋈ nation).
    q("q12_rollup", "B12 rollup(n_name, o_orderpriority) with grouping markers")(
      """SELECT n_name, o_orderpriority,
        |       CAST(grouping(n_name) AS BIGINT) AS g1,
        |       CAST(grouping(o_orderpriority) AS BIGINT) AS g2,
        |       count(*) AS n,
        |       round(CAST(sum(CAST(round(o_totalprice, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS total
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, o_orderpriority)
        |ORDER BY g1, g2, n_name NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "orders")
        .join(broadcast(Tables(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("o_orderpriority"))
        .agg(grouping(col("n_name")).cast("long").as("g1"),
          grouping(col("o_orderpriority")).cast("long").as("g2"),
          count(lit(1)).as("n"), r4(dsum(col("o_totalprice"))).as("total"))
        .select(col("n_name"), col("o_orderpriority"), col("g1"), col("g2"), col("n"), col("total"))
        .orderBy(col("g1"), col("g2"), col("n_name").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // B13: ranking window functions, deterministic total order per partition.
    q("q13_window_rank", "B13 row_number/rank/dense_rank/ntile: top-3 orders per customer")(
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS price,
        |       CAST(rn AS BIGINT) AS rn, CAST(rk AS BIGINT) AS rk,
        |       CAST(drk AS BIGINT) AS drk, CAST(nt AS BIGINT) AS nt
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER w AS rn, rank() OVER w AS rk,
        |             dense_rank() OVER w AS drk, ntile(4) OVER w AS nt
        |      FROM orders
        |      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"), rank().over(w).cast("long").as("rk"),
          dense_rank().over(w).cast("long").as("drk"), ntile(4).over(w).cast("long").as("nt"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), r4(col("o_totalprice")).as("price"),
          col("rn").cast("long").as("rn"), col("rk"), col("drk"), col("nt"))
        .orderBy("o_custkey", "rn")
    },

    // B14: analytic window functions lag/lead/first/last per user.
    q("q14_window_lag", "B14 lag/lead/first/last value deltas per user over events")(
      """SELECT event_id, user_id, round(value, 4) AS v,
        |       round(value - lag(value)  OVER w, 4) + 0 AS delta_prev,
        |       round(lead(value) OVER w - value, 4) + 0 AS delta_next,
        |       first_value(event_type) OVER w AS first_et,
        |       last_value(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_et
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), r4(col("value")).as("v"),
          r4(col("value") - lag(col("value"), 1).over(w)).as("delta_prev"),
          r4(lead(col("value"), 1).over(w) - col("value")).as("delta_next"),
          first(col("event_type")).over(w).as("first_et"),
          last(col("event_type")).over(wFull).as("last_et"))
        .orderBy("event_id")
    },

    // B15: frame-spec window aggregates (ROWS and RANGE frames).
    q("q15_window_frame", "B15 7-row moving average + 10-minute range frame per user")(
      """SELECT event_id, user_id,
        |       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS mv7,
        |       round(sum(value) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT)
        |                              RANGE BETWEEN 600 PRECEDING AND CURRENT ROW), 4) AS sum10m
        |FROM events ORDER BY event_id""".stripMargin
    ) { (s, dir) =>
      val wRows = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-6, Window.currentRow)
      val wRange = Window.partitionBy(col("user_id")).orderBy(unix_timestamp(col("ts")))
        .rangeBetween(-600, Window.currentRow)
      Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          r4(avg(col("value")).over(wRows)).as("mv7"),
          r4(sum(col("value")).over(wRange)).as("sum10m"))
        .orderBy("event_id")
    },

    // B16: multi-key sort with explicit null ordering (null injected via nullif).
    q("q16_sort_multi", "B16 multi-key sort, DESC NULLS LAST")(
      """SELECT c_custkey, nullif(c_mktsegment, 'FURNITURE') AS seg, round(c_acctbal, 4) AS bal
        |FROM customer
        |ORDER BY seg DESC NULLS LAST, bal DESC, c_custkey""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "customer")
        .select(col("c_custkey"), nullif(col("c_mktsegment"), lit("FURNITURE")).as("seg"),
          r4(col("c_acctbal")).as("bal"))
        .orderBy(col("seg").desc_nulls_last, col("bal").desc, col("c_custkey"))
    },

    // B17: top-k → Spark plans TakeOrderedAndProject (no full sort at scale).
    q("q17_topk", "B17 top-10 lineitems by extendedprice with tiebreak")(
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 4) AS price
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10)
        .select(col("l_orderkey"), col("l_linenumber"), r4(col("l_extendedprice")).as("price"))
    },

    // B18: set operations with DISTINCT semantics, tagged and unioned.
    q("q18_setops", "B18 union/intersect/except of buyer vs high-balance custkeys")(
      """WITH buyers AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
        |     rich   AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
        |SELECT 'union' AS op, custkey FROM (SELECT custkey FROM buyers UNION SELECT custkey FROM rich)
        |UNION ALL
        |SELECT 'intersect' AS op, custkey FROM (SELECT custkey FROM buyers INTERSECT SELECT custkey FROM rich)
        |UNION ALL
        |SELECT 'except' AS op, custkey FROM (SELECT custkey FROM buyers EXCEPT SELECT custkey FROM rich)
        |ORDER BY op, custkey""".stripMargin
    ) { (s, dir) =>
      val buyers = Tables(s, dir, "orders").select(col("o_custkey").as("custkey")).distinct()
      val rich = Tables(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey"))
      val u = buyers.union(rich).distinct().select(lit("union").as("op"), col("custkey"))
      val i = buyers.intersect(rich).select(lit("intersect").as("op"), col("custkey"))
      val e = buyers.except(rich).select(lit("except").as("op"), col("custkey"))
      u.unionAll(i).unionAll(e).orderBy("op", "custkey")
    },

    // B19: scalar string functions.
    q("q19_string_fns", "B19 string functions over part")(
      """SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
        |       substring(p_name, 1, 5) AS sub, CAST(length(p_name) AS BIGINT) AS len,
        |       trim(concat(' ', p_name, ' ')) AS tr,
        |       str_split(p_name, ' ')[1] AS tok1,
        |       regexp_extract(p_name, '([a-z]+)', 1) AS rex,
        |       regexp_replace(p_name, 'widget', 'gadget', 'g') AS rrep,
        |       concat_ws('|', p_brand, p_type) AS cw,
        |       lpad(p_brand, 12, '.') AS pad, reverse(p_brand) AS rev
        |FROM part ORDER BY p_partkey""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "part").select(
        col("p_partkey"), upper(col("p_name")).as("up"), lower(col("p_brand")).as("lo"),
        substring(col("p_name"), 1, 5).as("sub"), length(col("p_name")).cast("long").as("len"),
        trim(concat(lit(" "), col("p_name"), lit(" "))).as("tr"),
        element_at(split(col("p_name"), " "), 1).as("tok1"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("rex"),
        regexp_replace(col("p_name"), "widget", "gadget").as("rrep"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cw"),
        lpad(col("p_brand"), 12, ".").as("pad"), reverse(col("p_brand")).as("rev"))
        .orderBy("p_partkey")
    },

    // B20: date/time functions (replicating P9/P10 bucket semantics in batch).
    q("q20_date_fns", "B20 date/time functions over events")(
      """SELECT event_id,
        |       date_trunc('hour', ts::TIMESTAMP) AS h,
        |       CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS mo,
        |       CAST(day(ts) AS BIGINT) AS d,
        |       strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M') AS fmt,
        |       CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) AS unix_s,
        |       CAST(date_diff('day', DATE '2024-01-01', ts::DATE) AS BIGINT) AS dd
        |FROM events ORDER BY event_id""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "events").select(
        col("event_id"),
        date_trunc("hour", col("ts")).as("h"),
        year(col("ts")).cast("long").as("y"), month(col("ts")).cast("long").as("mo"),
        dayofmonth(col("ts")).cast("long").as("d"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm").as("fmt"),
        unix_timestamp(col("ts")).as("unix_s"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).cast("long").as("dd"))
        .orderBy("event_id")
    },

    // B21: math functions.
    q("q21_math_fns", "B21 math functions over lineitem")(
      """SELECT l_orderkey, l_linenumber,
        |       round(abs(l_quantity - 25), 4) AS a,
        |       CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ce,
        |       CAST(floor(l_quantity / 7.0) AS BIGINT) AS fl,
        |       round(pow(l_quantity, 1.5), 4) AS pw,
        |       round(ln(l_extendedprice), 4) AS lg,
        |       round(sqrt(l_extendedprice), 4) AS sq,
        |       CAST(sign(l_discount - 0.05) AS BIGINT) AS sg
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        r4(abs(col("l_quantity") - 25)).as("a"),
        ceil(col("l_quantity") / 7.0).cast("long").as("ce"),
        floor(col("l_quantity") / 7.0).cast("long").as("fl"),
        r4(pow(col("l_quantity"), 1.5)).as("pw"),
        r4(log(col("l_extendedprice"))).as("lg"),
        r4(sqrt(col("l_extendedprice"))).as("sq"),
        signum(col("l_discount") - 0.05).cast("long").as("sg"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // B22: conditional/null functions, incl. the reference's P8 semantics:
    // a failed numeric parse coerces to 0.0, NOT null (main.rs:70-71).
    q("q22_conditional_fns", "B22 when/coalesce/nullif/try_cast incl. P8 0.0-coercion")(
      """SELECT l_orderkey, l_linenumber,
        |       CASE WHEN l_quantity > 40 THEN 'high'
        |            WHEN l_quantity > 20 THEN 'mid' ELSE 'low' END AS band,
        |       coalesce(try_cast(l_returnflag AS DOUBLE), 0.0) AS coerced,
        |       round(coalesce(nullif(l_discount, 0.0), -1.0), 4) AS disc
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") > 40, "high")
          .when(col("l_quantity") > 20, "mid").otherwise("low").as("band"),
        coalesce(expr("try_cast(l_returnflag AS DOUBLE)"), lit(0.0)).as("coerced"),
        r4(coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0))).as("disc"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // B23: array/higher-order functions over the embedding column.
    q("q23_array_fns", "B23 array fns: size/slice/aggregate/sort/element over embeddings")(
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |       round(list_sum(list_transform(embedding[1:4], x -> x::DOUBLE)), 4) + 0 AS first4,
        |       round(list_max(list_transform(embedding, x -> x::DOUBLE)), 4) + 0 AS mx,
        |       round(list_sort(list_transform(embedding, x -> x::DOUBLE))[1], 4) + 0 AS mn,
        |       list_contains(range(1, 6), label) AS lab15
        |FROM embeddings ORDER BY vec_id""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "embeddings").select(
        col("vec_id"), size(col("embedding")).cast("long").as("dim"),
        r4(aggregate(slice(col("embedding"), 1, 4), lit(0.0),
          (acc, x) => acc + x.cast("double"))).as("first4"),
        r4(array_max(col("embedding")).cast("double")).as("mx"),
        r4(element_at(sort_array(col("embedding")), 1).cast("double")).as("mn"),
        array_contains(sequence(lit(1), lit(5)), col("label")).as("lab15"))
        .orderBy("vec_id")
    },

    // B23: posexplode (lateral array expansion), 1-based position for parity.
    q("q23b_explode", "B23 posexplode embedding elements (vec_id < 10)")(
      """SELECT vec_id, CAST(i AS BIGINT) AS pos, round(e::DOUBLE, 4) + 0 AS val
        |FROM (SELECT vec_id, unnest(embedding) AS e, generate_subscripts(embedding, 1) AS i
        |      FROM embeddings WHERE vec_id < 10)
        |ORDER BY vec_id, pos""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "embeddings").filter(col("vec_id") < 10)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("pos"),
          r4(col("col").cast("double")).as("val"))
        .orderBy("vec_id", "pos")
    },

    // B23 (maps): construct / concat / lookup / keys / values over MAP
    // columns — the collection family q23 covers for arrays. Outputs are
    // extracted SCALARS only (never a raw map: map iteration order is the
    // one thing the engines need not share; key sort + order-free value
    // max make every output deterministic).
    q("q23c_map_fns", "B23 map construct/concat/lookup/keys/values (scalar outputs)")(
      """SELECT l_orderkey AS o, l_linenumber AS n,
        |       m['qty'][1] AS qty,
        |       CAST(cardinality(map_concat(m, MAP {'disc': l_discount})) AS BIGINT) AS n_keys,
        |       array_to_string(list_sort(map_keys(map_concat(m, MAP {'disc': l_discount}))), ',') AS ks,
        |       round(list_max(map_values(m)), 4) AS vmax
        |FROM (SELECT l_orderkey, l_linenumber, l_discount,
        |             MAP {'qty': l_quantity, 'price': l_extendedprice} AS m
        |      FROM lineitem)
        |ORDER BY o, n""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_linenumber").as("n"),
          col("l_discount"),
          map(lit("qty"), col("l_quantity"),
            lit("price"), col("l_extendedprice")).as("m"))
        .withColumn("mc", map_concat(col("m"), map(lit("disc"), col("l_discount"))))
        .select(col("o"), col("n"),
          element_at(col("m"), "qty").as("qty"),
          size(col("mc")).cast("long").as("n_keys"),
          concat_ws(",", array_sort(map_keys(col("mc")))).as("ks"),
          round(array_max(map_values(col("m"))), 4).as("vmax"))
        .orderBy("o", "n")
    },

    // B24: JSON extraction from the events.props string column (≙ P4/P6).
    q("q24_json_fns", "B24 JSON field extraction from events.props")(
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |       (json_extract_string(props, '$.missing') IS NULL) AS no_miss
        |FROM events ORDER BY event_id""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        get_json_object(col("props"), "$.missing").isNull.as("no_miss"))
        .orderBy("event_id")
    },

    // B25: CSV line parse round-trip (replays the reference's line-oriented
    // ingest in batch: serialize → parse → project, oracle = identity).
    q("q25_csv_parse", "B25 from_csv round-trip of serialized lineitem columns")(
      """SELECT l_orderkey AS o, l_linenumber AS n, round(l_quantity, 4) AS q
        |FROM lineitem ORDER BY o, n""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("o", LongType), StructField("n", IntegerType), StructField("q", DoubleType)))
      Tables(s, dir, "lineitem")
        .select(concat_ws(",", col("l_orderkey"), col("l_linenumber"), col("l_quantity")).as("line"))
        .select(from_csv(col("line"), schema, Map.empty[String, String]).as("p"))
        .select(col("p.o").as("o"), col("p.n").as("n"), r4(col("p.q")).as("q"))
        .orderBy("o", "n")
    },

    // B25: JSON line parse round-trip via to_json/from_json (≙ P4/P6 batch).
    q("q25b_json_parse", "B25 from_json round-trip of serialized event rows")(
      """SELECT event_id AS id, event_type AS et, round(value, 4) AS v
        |FROM events ORDER BY id""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("et", StringType), StructField("v", DoubleType)))
      Tables(s, dir, "events")
        .select(to_json(struct(col("event_id").as("id"), col("event_type").as("et"),
          col("value").as("v"))).as("line"))
        .select(from_json(col("line"), schema).as("p"))
        .select(col("p.id").as("id"), col("p.et").as("et"), r4(col("p.v")).as("v"))
        .orderBy("id")
    },

    // Second columnar format, full sink→source round-trip: a lineitem
    // projection is WRITTEN as ORC (snappy, overwrite — rerun-safe) and read
    // back before aggregating. Doubles/longs round-trip bit-exactly through
    // ORC, so the oracle can aggregate the original parquet directly. The
    // write is a parallel executor-side sink (one ORC file per partition, no
    // driver collect); the read-back scan prunes to the aggregation columns
    // exactly as the parquet path does.
    q("q73_orc_roundtrip", "write lineitem projection to ORC, read back, aggregate")(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       round(CAST(sum(CAST(round(l_quantity, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS qty,
        |       round(CAST(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS price
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
    ) { (s, dir) =>
      val orcDir = s"/tmp/graft_orc/${new java.io.File(dir).getName}/lineitem"
      Tables(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
        .write.mode("overwrite").orc(orcDir)
      s.read.orc(orcDir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          round(sum(round(col("l_quantity"), 4)
            .cast(org.apache.spark.sql.types.DecimalType(28, 4))).cast("double"), 4).as("qty"),
          round(sum(round(col("l_extendedprice"), 4)
            .cast(org.apache.spark.sql.types.DecimalType(28, 4))).cast("double"), 4).as("price"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Schema evolution — the lake reality q73/q118 skip: partitions written
    // MONTHS apart carry different schemas (a column added mid-stream), and
    // the reader must union them BY NAME with nulls for the missing column
    // (parquet mergeSchema). v1 files hold (o_orderkey, o_totalprice); v2
    // adds o_orderstatus; the split is a deterministic key parity. The
    // merged read aggregates per status with v1's rows in the NULL group —
    // exactly the oracle's union. At 100 TB mergeSchema's footer sweep is
    // the cost to watch: the schema union is driver-side over file footers
    // (bounded by file count, distributed since Spark reads footers in a
    // job), not data.
    q("q178_schema_evolution",
      "two parquet schema versions merged by name at read (mergeSchema)")(
      """SELECT o_orderstatus, count(*) AS n,
        |       round(CAST(sum(CAST(round(o_totalprice, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS tot
        |FROM (
        |  SELECT o_orderkey, o_totalprice, NULL AS o_orderstatus
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, o_orderstatus
        |  FROM orders WHERE o_orderkey % 2 = 1)
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus NULLS FIRST""".stripMargin
    ) { (s, dir) =>
      val base = s"/tmp/graft_evolve/${new java.io.File(dir).getName}/orders"
      val orders = Tables(s, dir, "orders")
      orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(s"$base/v=1")
      orders.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .write.mode("overwrite").parquet(s"$base/v=2")
      s.read.option("mergeSchema", "true").parquet(s"$base/v=1", s"$base/v=2")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          round(sum(round(col("o_totalprice"), 4)
            .cast(org.apache.spark.sql.types.DecimalType(28, 4))).cast("double"), 4).as("tot"))
        .orderBy(col("o_orderstatus").asc_nulls_first)
    },

    // Small-file compaction — the other lake maintenance verb LayoutWriter's
    // write path implies: a table fragmented into many tiny files (here 64,
    // via an explicit repartition at write) is rewritten into few
    // right-sized ones (4 — at 100 TB the target count comes from
    // size-stats ÷ target-file-bytes, same arithmetic). The compacted
    // rewrite is ONE round-robin repartition (no sort, no skew pivot);
    // the aggregate proves row preservation, and PartitioningSpec pins the
    // file-count shrinkage the oracle cannot see.
    q("q179_compaction", "rewrite a 64-small-file table into 4 compacted files")(
      """SELECT l_returnflag, count(*) AS n,
        |       round(CAST(sum(CAST(round(l_quantity, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      val base = s"/tmp/graft_compact/${new java.io.File(dir).getName}/lineitem"
      Tables(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"))
        .repartition(64)
        .write.mode("overwrite").parquet(s"$base/small")
      s.read.parquet(s"$base/small").repartition(4)
        .write.mode("overwrite").parquet(s"$base/compact")
      s.read.parquet(s"$base/compact")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(sum(round(col("l_quantity"), 4)
            .cast(org.apache.spark.sql.types.DecimalType(28, 4))).cast("double"), 4).as("qty"))
        .orderBy("l_returnflag")
    },

    // Bucketed co-located join — the write-side amortization that kills
    // the shuffle entirely: both fact tables are WRITTEN bucketed (8
    // buckets, Spark's Murmur3 hash) on the join key via the session
    // catalog, so the subsequent join reads bucket i against bucket i
    // directly — no Exchange on either side (PlanShapeSpec pins the
    // exchange-free sort-merge join with broadcasting disabled). The
    // repartition before each write aligns write tasks with buckets
    // (same hash), yielding exactly one file per bucket — which also lets
    // the scan trust the written sort order. At 100 TB this is THE pattern
    // for repeatedly-joined fact tables: pay one bucketed rewrite, then
    // every orderkey join/aggregation runs shuffle-free forever; the
    // oracle proves the bucketed result equals the plain join.
    q("q186_bucketed_join",
      "bucketed-table co-located join on orderkey: zero exchanges under the join")(
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 AS qty,
        |       CAST(sum(CAST(round(l_extendedprice * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    ) { (s, dir) =>
      val sf = new java.io.File(dir).getName.replace('.', '_')
      // Location is suffixed with the Spark applicationId so two concurrent
      // JVMs on the same fixture never race on DROP + recursive delete +
      // overwrite of a shared path (ADVICE r5); within one JVM the id is
      // stable, so reruns still hit the drop-both-layers defense below.
      val loc = s"/tmp/graft_bkt_db_${s.sparkContext.applicationId}"
      s.sql(s"CREATE DATABASE IF NOT EXISTS graft_bkt LOCATION '$loc'")
      val ot = s"graft_bkt.orders_$sf"
      val lt = s"graft_bkt.lineitem_$sf"
      // the in-memory catalog dies with the JVM but the managed-table files
      // don't: a later session's CREATE refuses the orphaned location, so
      // drop both layers before writing (rerun- and cross-JVM-safe)
      Seq(ot -> s"orders_$sf", lt -> s"lineitem_$sf").foreach { case (tbl, leaf) =>
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        val p = new org.apache.hadoop.fs.Path(s"$loc/$leaf")
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }
      Tables(s, dir, "orders").select("o_orderkey", "o_orderpriority")
        .repartition(8, col("o_orderkey")) // one write task per bucket → one file per bucket
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ot)
      Tables(s, dir, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
        .repartition(8, col("l_orderkey"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(lt)
      s.table(ot).join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          (sum(round(col("l_quantity") * 100).cast("long")).cast("double") / 100).as("qty"),
          (sum(round(col("l_extendedprice") * 10000).cast("long")).cast("double") / 10000).as("revenue"))
        .orderBy("o_orderpriority")
    },

    // Dynamic partition pruning — the third pruning lever after static
    // filters (q49h) and layout envelopes (q160b): the fact table is
    // WRITTEN partitioned by ship-month, and the join's dim side (months
    // that saw a >499k urgent order — knowable only at RUNTIME) becomes a
    // dynamicpruning partition filter on the fact scan, so non-matching
    // month directories are never read (plan-pinned in PlanShapeSpec; 4
    // of 83 months survive at sf0.01). At 100 TB this is the
    // date-partitioned-fact ⋈ filtered-dim pattern every warehouse query
    // leans on — scans scale with the dim filter's selectivity, not the
    // fact's history length.
    q("q192_dpp",
      "dynamic partition pruning: runtime dim months prune the ship-month-partitioned fact")(
      """WITH dim AS (SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS sm
        |            FROM orders
        |            WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 499000)
        |SELECT sm, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 AS qty
        |FROM (SELECT strftime(l_shipdate, '%Y-%m') AS sm, l_quantity FROM lineitem) f
        |JOIN dim USING (sm)
        |GROUP BY sm ORDER BY sm""".stripMargin
    ) { (s, dir) =>
      val base = s"/tmp/graft_dpp/${new java.io.File(dir).getName}/lineitem"
      Tables(s, dir, "lineitem")
        .select(date_format(col("l_shipdate"), "yyyy-MM").as("sm"), col("l_quantity"))
        .write.mode("overwrite").partitionBy("sm").parquet(base)
      // Read the partition column as an EXPLICIT string: inference would
      // otherwise be free to parse 'yyyy-MM' values as dates (stringToDate
      // accepts '1992-01', and inference behavior has shifted across Spark
      // versions), silently retyping the USING(sm) join key and emptying
      // the result. An explicit schema disables partition-type inference
      // for exactly this read without touching session-wide conf.
      val fact = s.read
        .schema("l_quantity DOUBLE, sm STRING")
        .option("basePath", base).parquet(base)
      val dim = Tables(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 499000)
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("sm")).distinct()
      fact.join(dim, Seq("sm"))
        .groupBy("sm")
        .agg(count(lit(1)).as("n"),
          (sum(round(col("l_quantity") * 100).cast("long")).cast("double") / 100).as("qty"))
        .orderBy("sm")
    },

    // Stats-driven (CBO) planning — the principled twin of q103's manual
    // hint and GraphQueries' runtime count() size switch: ANALYZE writes
    // rowCount + per-column NDV/min/max into the catalog, cbo.enabled +
    // joinReorder.enabled let the optimizer REORDER a flat inner-join
    // written in the worst order (fact ⋈ fact first) so the filtered
    // customer dim joins orders before lineitem ever enters — no hint, no
    // hand count. Relative table sizes are scale-invariant, so the
    // reorder decision holds from sf0.001 to 100 TB, where ANALYZE-backed
    // stats are exactly how a warehouse avoids hand-tuning every query
    // (CboPlanSpec pins both arms: cbo on → orders⋈customer innermost;
    // cbo off → the written fact-fact order survives).
    q("q196_cbo_join_reorder",
      "ANALYZE-backed cost-based join reorder: filtered dim joins first, hint-free")(
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |              JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    ) { (s, dir) =>
      val confs = Map("spark.sql.cbo.enabled" -> "true",
        "spark.sql.cbo.joinReorder.enabled" -> "true")
      val prev = confs.keys.map(k => k -> s.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      // materialize UNDER the CBO confs (plans optimize at action time, so
      // returning a lazy frame would re-plan after the finally restores);
      // the checkpointed result is 5 aggregated rows
      try cboJoinFrame(s, dir).localCheckpoint(true)
      finally prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    },

    // CSV sink→source round-trip — the text-format sibling of q73's ORC:
    // proves the engine can EMIT csv (header, typed columns) and re-ingest
    // it losslessly. Doubles are rounded to 4 dp before the write; Spark's
    // shortest-repr double printing then parses back to the identical
    // double, so the post-read aggregate is exact. Write is parallel
    // (one file per partition), read is schema-explicit — no inference
    // nondeterminism in the query path.
    q("q118_csv_roundtrip", "write events projection to CSV, read back, aggregate")(
      """SELECT event_type, count(*) AS n,
        |       round(CAST(sum(CAST(round(value, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS value_sum
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      val csvDir = s"/tmp/graft_csv/${new java.io.File(dir).getName}/events"
      Tables(s, dir, "events")
        .select(col("event_id"), col("event_type"), round(col("value"), 4).as("value"))
        .write.mode("overwrite").option("header", "true").csv(csvDir)
      s.read
        .schema("event_id BIGINT, event_type STRING, value DOUBLE")
        .option("header", "true").csv(csvDir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(sum(round(col("value"), 4)
            .cast(org.apache.spark.sql.types.DecimalType(28, 4))).cast("double"), 4).as("value_sum"))
        .orderBy("event_type")
    },

    // JSON-lines sink→source round-trip — the third interchange format
    // (q73 ORC columnar, q118 CSV flat text, this one nested text): the
    // projection carries a genuinely NESTED struct through the write so
    // the round-trip proves structure preservation, not just scalars.
    q("q119_jsonl_roundtrip", "write nested-struct JSONL, read back, aggregate")(
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT) AS value_u
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      val jsonDir = s"/tmp/graft_jsonl/${new java.io.File(dir).getName}/events"
      Tables(s, dir, "events")
        .select(col("event_id"),
          struct(col("event_type").as("t"),
            floor(col("value") * 10000).cast("long").as("vu")).as("payload"))
        .write.mode("overwrite").json(jsonDir)
      s.read
        .schema("event_id BIGINT, payload STRUCT<t: STRING, vu: BIGINT>")
        .json(jsonDir)
        .groupBy(col("payload.t").as("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("payload.vu")).as("value_u"))
        .orderBy("event_type")
    },

    // Incremental materialized-view maintenance — the algebraic-merge
    // identity every warehouse MV engine relies on: a base aggregate plus
    // a delta-batch aggregate merged by key equals the full recompute
    // (counts add; sums add in exact DECIMAL). The oracle IS the full
    // recompute, so the compare verifies the maintenance algebra itself.
    // At 100 TB this is the difference between touching one day's
    // partition and re-scanning the table.
    q("q120_incremental_agg", "base + delta algebraic merge == full recompute per priority")(
      """SELECT o_orderpriority, count(*) AS n,
        |       round(CAST(sum(CAST(round(o_totalprice, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS total
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
    ) { (s, dir) =>
      val cut = lit(java.sql.Timestamp.valueOf("1997-07-01 00:00:00"))
      def agg(df: org.apache.spark.sql.DataFrame) = df
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice"), 4)
            .cast(org.apache.spark.sql.types.DecimalType(28, 4))).as("ts"))
      val orders = Tables(s, dir, "orders")
      val base = agg(orders.filter(col("o_orderdate") < cut))
        .withColumnRenamed("n", "n1").withColumnRenamed("ts", "ts1")
      val delta = agg(orders.filter(col("o_orderdate") >= cut))
        .withColumnRenamed("n", "n2").withColumnRenamed("ts", "ts2")
      base.join(delta, Seq("o_orderpriority"), "fullOuter")
        .select(col("o_orderpriority"),
          (coalesce(col("n1"), lit(0L)) + coalesce(col("n2"), lit(0L))).as("n"),
          round((coalesce(col("ts1"), lit(0).cast(org.apache.spark.sql.types.DecimalType(28, 4)))
            + coalesce(col("ts2"), lit(0).cast(org.apache.spark.sql.types.DecimalType(28, 4))))
            .cast("double"), 4).as("total"))
        .orderBy("o_orderpriority")
    },

    // Spatial ε-neighborhood join — the grid-bucketed shape every
    // distributed spatial engine uses (and the 2-D sibling of q08's range
    // bins): each point lands in one ε-sized cell, probes its 3×3 cell
    // neighborhood via a pure EQUI-join on (cx, cy), and only candidates
    // pass the exact distance test — no all-pairs product at any scale.
    // A neighbor lies in exactly one probed cell, so no dedup is needed.
    // The oracle is brute-force (IEJoin range pruning at ±10.5 — SLACK on
    // purpose: a tight ±10 bound computed as b.x + 10 can round below a
    // pair whose exact distance is within ε — plus the exact filter): an
    // INDEPENDENT derivation that verifies the grid pruning loses nothing.
    // Distances compare in a fixed-order double expression (identical
    // bits both engines). Points with zero neighbors don't emit (count
    // over an inner join) — documented shape.
    q("q123_spatial_grid_join", "ε=10 neighbor counts via 3×3 grid-cell equi-join (views as 2-D points)")(
      """WITH p AS (SELECT event_id AS id, value AS x, user_id * 3.3 AS y
        |           FROM events WHERE event_type = 'view')
        |SELECT a.id AS event_id, CAST(count(*) AS BIGINT) AS n_neighbors
        |FROM p a JOIN p b
        |  ON a.x >= b.x - 10.5 AND a.x <= b.x + 10.5
        | AND a.y >= b.y - 10.5 AND a.y <= b.y + 10.5
        | AND a.id <> b.id
        |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 100.0
        |GROUP BY a.id ORDER BY a.id""".stripMargin
    ) { (s, dir) =>
      val pts = Tables.fanout(s, dir, "events")
        .filter(col("event_type") === "view")
        .select(col("event_id").as("id"), col("value").as("x"),
          (col("user_id") * 3.3).as("y"))
        .withColumn("cx", floor(col("x") / 10).cast("long"))
        .withColumn("cy", floor(col("y") / 10).cast("long"))
        .cache() // probe side + build side
      val offsets = for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy)
      val probes = pts
        .withColumn("o", explode(array(offsets.map { case (dx, dy) =>
          struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")) }: _*)))
        .select(col("id").as("aid"), col("x").as("ax"), col("y").as("ay"),
          (col("cx") + col("o.dx")).as("cx"), (col("cy") + col("o.dy")).as("cy"))
      probes
        .join(pts.select(col("id").as("bid"), col("x").as("bx"),
          col("y").as("by"), col("cx"), col("cy")), Seq("cx", "cy"))
        .filter(col("aid") =!= col("bid"))
        .filter((col("ax") - col("bx")) * (col("ax") - col("bx"))
          + (col("ay") - col("by")) * (col("ay") - col("by")) <= 100.0)
        .groupBy(col("aid").as("event_id"))
        .agg(count(lit(1)).as("n_neighbors"))
        .orderBy("event_id")
    },

    // MERGE/upsert emulation — vanilla Spark has no MERGE INTO target (that
    // is a table-format concern), but the SEMANTICS are one full-outer join:
    // matched→update, source-only→insert, target-only→keep. The update feed
    // is a windowed order aggregate plus genuinely new keys, so all three
    // branches are exercised. At scale the join shuffles on the merge key —
    // exactly what a format-backed MERGE compiles to.
    q("q82_upsert_merge", "full-outer MERGE emulation: update/insert/keep per customer")(
      """WITH updates AS (
        |  SELECT o_custkey AS k,
        |         round(CAST(sum(CAST(round(o_totalprice, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS new_bal
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY o_custkey
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 0.0 FROM customer WHERE c_custkey % 113 = 0),
        |merged AS (
        |  SELECT COALESCE(t.c_custkey, u.k) AS c_custkey,
        |         COALESCE(t.c_name, 'New#' || CAST(u.k AS VARCHAR)) AS c_name,
        |         round(CASE WHEN u.k IS NOT NULL THEN u.new_bal ELSE t.c_acctbal END, 4) AS bal,
        |         CASE WHEN t.c_custkey IS NULL THEN 'insert'
        |              WHEN u.k IS NOT NULL THEN 'update' ELSE 'keep' END AS op
        |  FROM customer t FULL OUTER JOIN updates u ON t.c_custkey = u.k)
        |SELECT c_custkey, c_name, bal, op FROM merged ORDER BY c_custkey""".stripMargin
    ) { (s, dir) =>
      val cust = Tables(s, dir, "customer")
      val updates = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("o_custkey").as("k"))
        .agg(round(sum(round(col("o_totalprice"), 4)
          .cast(org.apache.spark.sql.types.DecimalType(28, 4))).cast("double"), 4).as("new_bal"))
        .union(cust.filter(col("c_custkey") % 113 === 0)
          .select((col("c_custkey") + 1000000L).as("k"), lit(0.0).as("new_bal")))
      cust.join(updates, col("c_custkey") === col("k"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("k")).as("merged_key"),
          coalesce(col("c_name"), concat(lit("New#"), col("k").cast("string"))).as("c_name"),
          round(when(col("k").isNotNull, col("new_bal")).otherwise(col("c_acctbal")), 4).as("bal"),
          when(col("c_custkey").isNull, "insert")
            .when(col("k").isNotNull, "update").otherwise("keep").as("op"))
        .withColumnRenamed("merged_key", "c_custkey")
        .orderBy("c_custkey")
    },

    // Distribution window functions — percent_rank and cume_dist complete
    // the B13 ranking surface. Both are exact integer-ratio doubles, so the
    // cross-engine values are bit-identical before the display rounding.
    q("q84_dist_windows", "percent_rank + cume_dist over quantity per returnflag")(
      """SELECT l_orderkey, l_linenumber,
        |       round(percent_rank() OVER w, 6) AS pr,
        |       round(cume_dist() OVER w, 6) AS cd
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber)
        |ORDER BY l_orderkey, l_linenumber, pr, cd LIMIT 1000""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy("l_returnflag")
        .orderBy("l_quantity", "l_orderkey", "l_linenumber")
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        // (l_orderkey, l_linenumber) is NOT unique in the fixture — order by
        // the full output tuple so the LIMIT cut is engine-independent
        .orderBy("l_orderkey", "l_linenumber", "pr", "cd").limit(1000)
    },

    // Value-picking window functions — first_value (default running frame),
    // last_value (explicit full frame: the default frame's last row is the
    // CURRENT row, the classic trap), nth_value (null until the frame holds
    // 3 rows). The order key is unique, so RANGE peers are single rows and
    // both engines agree frame-for-frame.
    q("q84b_value_windows", "first/last/nth_value over quantity per returnflag")(
      """SELECT l_orderkey, l_linenumber,
        |       first_value(l_orderkey) OVER w AS fv,
        |       last_value(l_orderkey) OVER
        |         (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv,
        |       nth_value(l_orderkey, 3) OVER w AS nv
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber)
        |ORDER BY l_orderkey, l_linenumber, fv, lv, nv LIMIT 1000""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy("l_returnflag")
        .orderBy("l_quantity", "l_orderkey", "l_linenumber")
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          first(col("l_orderkey")).over(w).as("fv"),
          last(col("l_orderkey")).over(full).as("lv"),
          nth_value(col("l_orderkey"), 3).over(w).as("nv"))
        // (l_orderkey, l_linenumber) is NOT unique in the fixture — order by
        // the full output tuple so the LIMIT cut is engine-independent
        .orderBy("l_orderkey", "l_linenumber", "fv", "lv", "nv").limit(1000)
    },

    // B23/B24 companion: the MAP higher-order-function family —
    // map_from_arrays, transform_values, map_filter, map_entries. The
    // oracle states the equivalent list arithmetic (maps are unordered, so
    // the contract is the SORTED entry list).
    q("q107_map_hofs", "map HOFs: build → transform_values → map_filter → sorted entries")(
      // entries serialize to a '|'-joined string: the driver's comparator
      // sorts pandas frames, and list-typed cells are unhashable there
      // (coalesce: DuckDB array_to_string([]) is NULL, Spark array_join is '')
      """WITH t AS (SELECT doc_id, list_distinct((string_split(text, ' '))[1:3]) AS ts
        |           FROM documents)
        |SELECT doc_id,
        |       coalesce(array_to_string(
        |         list_sort(list_transform(list_filter(ts, x -> (2 * length(x)) % 4 = 0),
        |                                  x -> x || ':' || CAST(2 * length(x) AS VARCHAR))),
        |         '|'), '') AS entries
        |FROM t ORDER BY doc_id LIMIT 200""".stripMargin
    ) { (s, dir) =>
      val toks3 = array_distinct(slice(split(col("text"), " "), 1, 3))
      Tables(s, dir, "documents")
        .select(col("doc_id"), toks3.as("ts"))
        .withColumn("m", map_from_arrays(col("ts"), transform(col("ts"), t => length(t))))
        .withColumn("m2", transform_values(col("m"), (_, v) => v * 2))
        .withColumn("mf", map_filter(col("m2"), (_, v) => v % 4 === 0))
        .select(col("doc_id"),
          array_join(array_sort(transform(map_entries(col("mf")),
            e => concat(e.getField("key"), lit(":"),
              e.getField("value").cast("string")))), "|").as("entries"))
        .orderBy("doc_id").limit(200)
    },

    // B19 companion: binary/digest functions — md5, sha2-256, hex encoding
    // of raw bytes, and a base64 encode→decode round-trip (both engines
    // emit lowercase digests and uppercase hex).
    q("q108_binary_fns", "digest + binary encodings: md5, sha256, hex, base64 round-trip")(
      """SELECT doc_id,
        |       md5(text) AS md5_hex,
        |       sha256(text) AS sha256_hex,
        |       hex(substr(text, 1, 8)) AS head_hex,
        |       from_base64(to_base64(substr(text, 1, 16)::BLOB)) = substr(text, 1, 16)::BLOB AS b64_roundtrip
        |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          md5(col("text")).as("md5_hex"),
          sha2(col("text"), 256).as("sha256_hex"),
          hex(substring(col("text"), 1, 8).cast("binary")).as("head_hex"),
          (unbase64(base64(substring(col("text"), 1, 16).cast("binary")))
            === substring(col("text"), 1, 16).cast("binary")).as("b64_roundtrip"))
        .orderBy("doc_id").limit(200)
    },

    // B15 companion: time-RANGE frames — a rolling 1-hour sum/count per
    // series ordered by event time (RANGE BETWEEN INTERVAL ... PRECEDING).
    // Rolling FLOAT sums are engine-divergent (frame re-summation order),
    // so the frame sum runs in exact DECIMAL — order-free by construction.
    // Routed through spark.sql: interval range frames are SQL-only surface.
    q("q15b_range_interval_frame", "rolling 1h RANGE-interval frame sum/count per event_type")(
      """SELECT event_id, event_type,
        |       round(CAST(sum(CAST(round(value, 4) AS DECIMAL(28,4))) OVER w AS DOUBLE), 4) AS roll_sum,
        |       count(*) OVER w AS roll_n
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts::TIMESTAMP
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id LIMIT 2000""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "events").createOrReplaceTempView("events")
      s.sql(
        """SELECT event_id, event_type,
          |       round(CAST(sum(CAST(round(value, 4) AS DECIMAL(28,4))) OVER w AS DOUBLE), 4) AS roll_sum,
          |       count(*) OVER w AS roll_n
          |FROM events
          |WINDOW w AS (PARTITION BY event_type ORDER BY ts
          |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
          |ORDER BY event_id LIMIT 2000""".stripMargin)
    },

    // GROUPS window frames (SQL:2011) — the third frame mode NEITHER engine
    // implements (Spark: unsupported; DuckDB: "not implemented yet"). The
    // engine provides the semantics by construction: pre-aggregate each
    // peer group (rows tied on the ORDER BY key), run a ROWS frame over the
    // per-group table — ROWS-over-groups ≡ GROUPS-over-rows — and carry the
    // group's row count alongside. This is also the preferred plan at
    // 100 TB: the window runs over |distinct keys| rows, not corpus rows,
    // after a partial-aggregated shuffle. The oracle derives the same
    // semantics through a rank-distance self-join — a genuinely independent
    // formulation, so the compare checks the semantics, not the plan.
    q("q114_groups_frame",
      "GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING emulated via group pre-aggregation")(
      """WITH g AS (SELECT l_returnflag, l_quantity, count(*) AS n,
        |                  sum(CAST(round(l_extendedprice, 4) AS DECIMAL(28,4))) AS gs
        |           FROM lineitem GROUP BY l_returnflag, l_quantity),
        |r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rk FROM g)
        |SELECT a.l_returnflag, a.l_quantity, CAST(a.n AS BIGINT) AS n_rows,
        |       round(CAST(sum(b.gs) AS DOUBLE), 4) AS frame_sum
        |FROM r a JOIN r b ON a.l_returnflag = b.l_returnflag AND abs(a.rk - b.rk) <= 1
        |GROUP BY a.l_returnflag, a.l_quantity, a.n
        |ORDER BY a.l_returnflag, a.l_quantity""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val groups = Tables(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("l_extendedprice"), 4)
            .cast(org.apache.spark.sql.types.DecimalType(28, 4))).as("gs"))
      val w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
        .rowsBetween(-1, 1)
      groups
        .select(col("l_returnflag"), col("l_quantity"), col("n_rows"),
          round(sum(col("gs")).over(w).cast("double"), 4).as("frame_sum"))
        .orderBy("l_returnflag", "l_quantity")
    },

    // Salted skew join — the MANUAL hot-key split (SkewTools.saltedJoin),
    // demonstrated as a runnable oracle-checked query rather than a doc
    // note: the join key floor(sqrt(user_id)) is skewed by construction
    // (key k covers 2k+1 user ids — the hottest key holds ~77× the
    // coldest's rows at sf0.1), the fact side salts each key 8 ways off a
    // hash of the event id (deterministic — retries agree), and the dim
    // replicates ×8 so every (key, salt) sub-partition joins locally.
    // Salting is OUTPUT-INVISIBLE: the oracle is the plain unsalted join,
    // and the hash match proves the split is pure partitioning. Post-join
    // sums run in DECIMAL so grouping order can't move them.
    q("q177_salted_skew_join",
      "hot-key fact⋈dim join split 8 ways by deterministic salting (oracle = plain join)")(
      """WITH f AS (SELECT CAST(floor(sqrt(user_id)) AS BIGINT) AS k, value FROM events),
        |d AS (SELECT DISTINCT CAST(floor(sqrt(user_id)) AS BIGINT) AS k FROM events),
        |dim AS (SELECT k, 'grp-' || CAST(k AS VARCHAR) AS label FROM d)
        |SELECT f.k, dim.label, count(*) AS n,
        |       round(CAST(sum(CAST(round(f.value, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS sv
        |FROM f JOIN dim ON f.k = dim.k
        |GROUP BY f.k, dim.label ORDER BY f.k""".stripMargin
    ) { (s, dir) =>
      val events = Tables(s, dir, "events")
      val fact = events.select(
        floor(sqrt(col("user_id"))).cast("long").as("k"),
        col("event_id"), col("value"))
      val dim = fact.select(col("k")).distinct()
        .select(col("k"), concat(lit("grp-"), col("k").cast("string")).as("label"))
      SkewTools.saltedJoin(fact, dim, "k", col("event_id"), buckets = 8)
        .groupBy("k", "label")
        .agg(count(lit(1)).as("n"),
          round(sum(round(col("value"), 4)
            .cast(org.apache.spark.sql.types.DecimalType(28, 4))).cast("double"), 4).as("sv"))
        .orderBy("k")
    },

    // AQE automatic skew split — the PRINCIPLED twin of q177's manual
    // salting, exactly as q196 (catalog-stats CBO) is the principled twin
    // of q103's hand hint: at 100 TB you don't hand-salt every hot join,
    // you let the runtime re-planner split skewed shuffle partitions from
    // MEASURED map-output sizes. The fixture funnels every user_id NOT
    // divisible by 3 into key 0 (two thirds of the fact under one key),
    // the dim is forced off the broadcast path so the join is a genuine
    // shuffle SMJ, and the skew thresholds are scaled to the fixture so
    // OptimizeSkewedJoin fires at every sf (production keeps the 256 MB
    // defaults — same plan machinery, bigger numbers).
    // forceOptimizeSkewedJoin is on because the post-join same-key
    // aggregate would otherwise veto the split (splitting un-hashes the
    // join output, costing the agg one extra exchange — the right trade
    // when one partition holds two thirds of the data). The split is
    // OUTPUT-INVISIBLE, so the oracle is the plain unsalted join — the
    // hash match proves AQE's re-plan is pure partitioning;
    // RuntimeReplanSpec pins `skew=true` on the executed SMJ so the
    // demonstration can't silently degrade to an unsplit join.
    q("q217_aqe_skew_split",
      "AQE skew-join: runtime split of a hot shuffle partition (oracle = plain join)")(
      """WITH f AS (SELECT CASE WHEN user_id % 3 <> 0 THEN 0 ELSE user_id END AS k,
        |                  value FROM events),
        |dim AS (SELECT DISTINCT CASE WHEN user_id % 3 <> 0 THEN 0 ELSE user_id END AS k
        |        FROM events),
        |d2 AS (SELECT k, 'grp-' || CAST(k AS VARCHAR) AS label FROM dim)
        |SELECT f.k, d2.label, count(*) AS n,
        |       round(CAST(sum(CAST(round(f.value, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS sv
        |FROM f JOIN d2 ON f.k = d2.k
        |GROUP BY f.k, d2.label ORDER BY f.k""".stripMargin
    ) { (s, dir) =>
      val confs = Map(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1", // dim off the BHJ path
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
        // fixture-scaled detection: hot partition ~7 KB at sf0.001; the
        // median partition is a few hundred bytes, so factor 2 + 1 KB
        // floor detects the manufactured key everywhere
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512b")
      val prev = confs.keys.map(k => k -> s.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      // materialize UNDER the skew confs (q196's discipline); 11–1001
      // aggregated rows come back
      try aqeSkewFrame(s, dir).localCheckpoint(true)
      finally prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    },

    // Optimizer-INJECTED runtime Bloom filter — the principled twin of
    // q59's hand-built 4096-bit filter: Spark's InjectRuntimeFilter sees a
    // selective predicate on one join side and plants a
    // BloomFilterAggregate subquery whose bloom_filter_might_contain()
    // gates the OTHER side's scan, so the big fact never shuffles rows
    // whose keys can't match. At 100 TB this is the difference between
    // shuffling all of lineitem and shuffling the ~20% that joins urgent
    // orders — with zero user code. Broadcast is disabled (a BHJ wouldn't
    // need the filter) and the application-side floor is dropped to the
    // fixture scale; production keeps the 10 GB default. The filter is
    // advisory-only (false positives just shuffle, never emit), so the
    // oracle is the plain join; RuntimeReplanSpec pins the injected
    // might_contain(bloom_filter_agg(...)) in the executed plan.
    q("q218_runtime_bloom_join",
      "optimizer-injected Bloom runtime filter prunes the fact side of a selective join")(
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |       round(CAST(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      val confs = Map(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
        // fixture-scaled: any application-side scan qualifies (prod: 10 GB)
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
      val prev = confs.keys.map(k => k -> s.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      try runtimeBloomFrame(s, dir).localCheckpoint(true)
      finally prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    },

    // Referential-integrity audit — the constraint suite a pipeline runs
    // before promoting a snapshot (Deequ-style data quality as a QUERY,
    // not a framework): for every FK edge of the fixture schema, count
    // child rows, orphaned child rows (anti-join against the parent key),
    // parent keys, and how many parent keys are actually referenced. One
    // anti-join + one distinct-count pair per edge, dims broadcast; at
    // 100 TB each edge is the standard left-anti shuffle on the key with
    // the parent side broadcast when it fits — the orphan count is the
    // gate, the reference coverage is the fact a join-reorderer wants.
    q("q226_fk_integrity",
      "per-FK-edge orphan and reference-coverage audit across the fixture schema")(
      Seq(
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey")
      ).map { case (c, ck, p, pk) =>
        s"""SELECT '$c.$ck' AS edge,
           |       (SELECT count(*) FROM $c) AS n_child,
           |       (SELECT count(*) FROM $c WHERE $ck NOT IN (SELECT $pk FROM $p)) AS n_orphans,
           |       (SELECT count(DISTINCT $pk) FROM $p) AS parent_keys,
           |       (SELECT count(DISTINCT $ck) FROM $c
           |        WHERE $ck IN (SELECT $pk FROM $p)) AS keys_referenced""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY edge")
    ) { (s, dir) =>
      Seq(
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey")
      ).map { case (c, ck, p, pk) =>
        // one declarative plan per edge (no driver-side counting): a
        // broadcast left join against the DISTINCT parent keys yields
        // child count, orphan count, and referenced-key count in one
        // aggregate; parent cardinality is a 1-row frame joined on
        val parent = Tables(s, dir, p).select(col(pk).as("pk")).distinct()
        val childStats = Tables(s, dir, c).select(col(ck).as("k"))
          .join(broadcast(parent), col("k") === col("pk"), "left_outer")
          .agg(count(lit(1)).as("n_child"),
            sum(when(col("pk").isNull, 1L).otherwise(0L)).as("n_orphans"),
            countDistinct(when(col("pk").isNotNull, col("k"))).as("keys_referenced"))
        val parentKeys = parent.agg(count(lit(1)).as("parent_keys"))
        childStats.crossJoin(broadcast(parentKeys))
          .select(lit(s"$c.$ck").as("edge"), col("n_child"), col("n_orphans"),
            col("parent_keys"), col("keys_referenced"))
      }.reduce(_ unionByName _).orderBy("edge")
    },

    // Snapshot-versioned table reads (time travel) — the lakehouse read
    // path under Delta/Iceberg, built from first principles on plain
    // parquet: commit v0 is a base load, v1 appends a second batch, v2
    // commits a DELETION VECTOR (a key file, not a rewrite — the merge-on-
    // read shape). Reading "AS OF v" composes exactly the files ≤ v:
    // v0 = base; v1 = base ∪ append; v2 = v1 ⟕̸ deletes (broadcast anti-
    // join on the vector). All three snapshots are audited in one result.
    // At 100 TB this is why deletes are O(|deleted keys|) not O(table):
    // the vector rides a broadcast anti-join at read time and compaction
    // (q179) folds it in asynchronously. The oracle recomputes each
    // snapshot from the fixture with the same commit predicates — the
    // hash match proves the version composition, not just the writes.
    q("q228_time_travel",
      "snapshot-versioned reads over base/append/deletion-vector commits (time travel)")(
      """WITH base AS (SELECT * FROM orders WHERE o_orderkey % 3 = 0),
        |app AS (SELECT * FROM orders WHERE o_orderkey % 3 = 1),
        |v1 AS (SELECT * FROM base UNION ALL SELECT * FROM app),
        |del AS (SELECT o_orderkey FROM v1 WHERE o_orderstatus = 'F'),
        |v2 AS (SELECT * FROM v1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del)),
        |snap AS (
        |  SELECT 0 AS version, count(*) AS n_rows, count(DISTINCT o_custkey) AS n_cust,
        |         sum(CAST(round(o_totalprice, 4) AS DECIMAL(28,4))) AS tot FROM base
        |  UNION ALL
        |  SELECT 1, count(*), count(DISTINCT o_custkey),
        |         sum(CAST(round(o_totalprice, 4) AS DECIMAL(28,4))) FROM v1
        |  UNION ALL
        |  SELECT 2, count(*), count(DISTINCT o_custkey),
        |         sum(CAST(round(o_totalprice, 4) AS DECIMAL(28,4))) FROM v2)
        |SELECT CAST(version AS BIGINT) AS version, CAST(n_rows AS BIGINT) AS n_rows,
        |       CAST(n_cust AS BIGINT) AS n_cust,
        |       round(CAST(tot AS DOUBLE), 4) AS total
        |FROM snap ORDER BY version""".stripMargin
    ) { (s, dir) =>
      val sf = new java.io.File(dir).getName.replace('.', '_')
      // per-application location (q186's concurrency defense), cleaned
      // before writing so reruns never read a stale commit chain
      val loc = s"/tmp/graft_tt_${s.sparkContext.applicationId}/$sf"
      val p = new org.apache.hadoop.fs.Path(loc)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val orders = Tables(s, dir, "orders")
      // commit v0: initial load; commit v1: append; commit v2: deletion
      // vector ONLY (keys, not rewritten data files)
      orders.filter(col("o_orderkey") % 3 === 0).write.parquet(s"$loc/base")
      orders.filter(col("o_orderkey") % 3 === 1).write.parquet(s"$loc/append")
      s.read.parquet(s"$loc/base").unionByName(s.read.parquet(s"$loc/append"))
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey")).write.parquet(s"$loc/deletes")
      // snapshot reads: every version is composed purely from files ≤ v
      val v0 = s.read.parquet(s"$loc/base")
      val v1 = v0.unionByName(s.read.parquet(s"$loc/append"))
      val v2 = v1.join(broadcast(s.read.parquet(s"$loc/deletes")),
        Seq("o_orderkey"), "left_anti")
      Seq(0 -> v0, 1 -> v1, 2 -> v2).map { case (v, df) =>
        df.agg(count(lit(1)).as("n_rows"),
          countDistinct(col("o_custkey")).as("n_cust"),
          round(dsum(col("o_totalprice")), 4).as("total"))
          .select(lit(v.toLong).as("version"), col("n_rows"), col("n_cust"), col("total"))
      }.reduce(_ unionByName _).orderBy("version")
    },

    // Nested-schema pruning — the struct twin of column pruning: the
    // lineitem row is WRITTEN as two structs plus a payload array, and the
    // read-back query touches only k.rf and m.price — Spark's nested-
    // schema pruning (on by default) narrows the parquet ReadSchema to
    // exactly those two LEAVES, never decoding the sibling fields or the
    // payload array (NestedPruningSpec pins the scan's readSchema). At
    // 100 TB nested telemetry/feature records are the norm, and reading
    // 2 leaves instead of 7 fields + an array is the same 10–100× I/O
    // lever flat projection pushdown gives — but only if plans keep the
    // struct access as field extraction, which this query demonstrates.
    q("q233_nested_pruning",
      "struct-nested write + leaf-pruned read-back: only k.rf and m.price are scanned")(
      """SELECT rf, CAST(count(*) AS BIGINT) AS n,
        |       round(CAST(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS rev
        |FROM (SELECT l_returnflag AS rf, l_extendedprice FROM lineitem)
        |GROUP BY rf ORDER BY rf""".stripMargin
    ) { (s, dir) =>
      nestedPrunedFrame(s, dir)
    },

    // CDC log apply (latest-wins materialization) — the third leg of the
    // mutation family after SCD2 history (q81) and two-table MERGE (q82):
    // replay an ordered insert/update/delete change log and materialize
    // the CURRENT table state. The log is the events stream recast as CDC
    // ops (signup→I, error→D, else U per entity); apply = one row_number
    // per key by (ts, event_id) DESC — the newest op wins, a trailing
    // delete removes the key — plus per-key op counts from the same
    // grouped pass. At 100 TB this is the standard CDC-compaction shape:
    // one hash shuffle on the key, no sort of the full log, and the
    // arbitrarily-long history collapses map-side into (1 winner + 3
    // counters) per key before the exchange.
    q("q237_cdc_apply",
      "latest-wins CDC apply: insert/update/delete log → current state + op audit")(
      """WITH log AS (
        |  SELECT user_id, ts, event_id, value,
        |         CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' ELSE 'U' END AS op
        |  FROM events),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM log),
        |audit AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ops,
        |         CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes
        |  FROM log GROUP BY user_id)
        |SELECT r.user_id, r.op AS last_op, round(r.value, 4) AS val, a.n_ops, a.n_deletes
        |FROM ranked r JOIN audit a ON a.user_id = r.user_id
        |WHERE r.rn = 1 AND r.op <> 'D'
        |ORDER BY r.user_id""".stripMargin
    ) { (s, dir) =>
      val log = Tables(s, dir, "events").select(col("user_id"), col("ts"),
        col("event_id"), col("value"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "error", "D").otherwise("U").as("op"))
      // last row per user via argmax-by-struct folded into the SAME hash
      // agg that computes the audit counts: one partial-aggregated shuffle
      // (1 row/user/task) replaces a rank window full-sorting the log AND
      // a second aggregate + join. (ts, event_id) is unique per user, so
      // the struct max picks exactly the window's rn=1 row
      val ranked = log.groupBy("user_id").agg(
        max(struct(col("ts"), col("event_id"), col("op"), col("value"))).as("last"),
        count(lit(1)).as("n_ops"),
        sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_deletes"))
        .select(col("user_id"), col("last.op").as("op"), col("last.value").as("value"),
          col("n_ops"), col("n_deletes"))
      ranked
        .filter(col("op") =!= "D")
        .select(col("user_id"), col("op").as("last_op"), r4(col("value")).as("val"),
          col("n_ops"), col("n_deletes"))
        .orderBy("user_id")
    },

    // Multi-format federated scan — one declarative plan over a lake that
    // mixes parquet, CSV, and JSONL: the fixture is sliced three ways by
    // format, written, and read back through three format-specific readers
    // (explicit schemas — no inference pass at 100 TB) into ONE union
    // lineage whose aggregate must equal the single-source truth. The
    // union is format-transparent to Catalyst: partial aggregation runs
    // inside each branch before the one exchange, so adding a legacy CSV
    // feed to a parquet lake costs its own scan, not a second pipeline.
    // Doubles survive the text round-trips exactly (shortest-repr
    // printing parses back to the same bit pattern in both engines).
    q("q238_multiformat_union",
      "parquet ∪ CSV ∪ JSONL slices of one table re-aggregated to the single-source truth")(
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       round(CAST(sum(CAST(round(value, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS sv
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      val sf = new java.io.File(dir).getName.replace('.', '_')
      val loc = s"/tmp/graft_fed_${s.sparkContext.applicationId}/$sf"
      val p = new org.apache.hadoop.fs.Path(loc)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val e = Tables(s, dir, "events").select(col("event_id"), col("event_type"), col("value"))
      e.filter(col("event_id") % 3 === 0).write.parquet(s"$loc/pq")
      e.filter(col("event_id") % 3 === 1).write.option("header", "true").csv(s"$loc/csv")
      e.filter(col("event_id") % 3 === 2).write.json(s"$loc/jsonl")
      val schema = "event_id BIGINT, event_type STRING, value DOUBLE"
      s.read.parquet(s"$loc/pq")
        .unionByName(s.read.schema(schema).option("header", "true").csv(s"$loc/csv"))
        .unionByName(s.read.schema(schema).json(s"$loc/jsonl"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(dsum(col("value")), 4).as("sv"))
        .orderBy("event_type")
    },

    // Incremental materialized-view maintenance — the lakehouse refresh
    // pattern that makes 100 TB aggregation affordable: the monthly sales
    // rollup is MATERIALIZED once over the base epoch (orders before
    // 1997-01-01, written to parquet and read back — the query never
    // touches those base rows again), then a delta batch (the 1997+
    // orders) arrives and the view is refreshed by aggregating ONLY the
    // delta and merging it into the stored view with a full-outer
    // combine of algebraic partials (count→sum, sum→sum, min→least,
    // max→greatest; money in exact integer cents so the merge is
    // bit-stable). Refresh cost is |delta| + |touched groups| — never a
    // base rescan; the oracle recomputes the rollup from scratch over
    // the whole table, proving merge(view, Δ) ≡ full recompute. Exactly-
    // mergeable metrics only by design — a distinct-count column would
    // break the algebra, which is what the q187 KMV-sketch rollup is for.
    q("q249_incremental_mv",
      "incremental materialized-view refresh: merge(delta agg, stored view) ≡ full recompute")(
      """SELECT strftime(o_orderdate, '%Y-%m') AS mon,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |       CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS min_cents,
        |       CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents
        |FROM orders GROUP BY mon ORDER BY mon""".stripMargin
    ) { (s, dir) =>
      val sf = new java.io.File(dir).getName.replace('.', '_')
      val loc = s"/tmp/graft_mv_${s.sparkContext.applicationId}/$sf"
      val p = new org.apache.hadoop.fs.Path(loc)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val cents = round(col("o_totalprice") * 100).cast("long")
      def rollup(df: DataFrame): DataFrame = df
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
        .agg(count(lit(1)).as("n_orders"), sum(cents).as("sum_cents"),
          min(cents).as("min_cents"), max(cents).as("max_cents"))
      val orders = Tables(s, dir, "orders")
      val cutoff = "1997-01-01"
      // ingest-time materialization: the view parquet IS the base state
      rollup(orders.filter(col("o_orderdate") < cutoff)).write.parquet(s"$loc/view_v1")
      val view = s.read.parquet(s"$loc/view_v1")
      val delta = rollup(orders.filter(col("o_orderdate") >= cutoff))
      // algebraic merge: both sides are already one row per group, so the
      // full-outer join is group-cardinality work, not data-cardinality;
      // least/greatest skip NULLs, so one-sided groups pass through intact
      view.join(delta, view("mon") === delta("mon"), "full_outer")
        .select(coalesce(view("mon"), delta("mon")).as("mon"),
          (coalesce(view("n_orders"), lit(0L)) + coalesce(delta("n_orders"), lit(0L))).as("n_orders"),
          (coalesce(view("sum_cents"), lit(0L)) + coalesce(delta("sum_cents"), lit(0L))).as("sum_cents"),
          least(view("min_cents"), delta("min_cents")).as("min_cents"),
          greatest(view("max_cents"), delta("max_cents")).as("max_cents"))
        .orderBy("mon")
    },

    // Materialized-view SUBSTITUTION — q249 maintains a view, this one
    // makes the optimizer USE one: MvAggRewrite (a conf-gated
    // Rule[LogicalPlan]) recognizes an aggregate over the base lineitem
    // scan whose grouping is a subset of the view's (l_returnflag,
    // l_linestatus) dims and whose measures the view carries, and swaps
    // the fact scan for a rollup over the |dims|-row view — count(*)
    // becomes sum(cnt), the DECIMAL(28,4) quantity sum becomes
    // sum(qty4_sum), exact by algebra (no float reassociation). The
    // grouping here is a STRICT subset (l_returnflag only), so the
    // rewrite must genuinely re-aggregate, not copy. The oracle computes
    // from the base table — the hash match proves the substituted plan
    // returns byte-identical results — and MvRewriteSpec pins the plan
    // side: flag on → the executed plan scans the view parquet and never
    // touches lineitem; flag off → base scan. The body materializes
    // eagerly (localCheckpoint) and then clears the conf so no later
    // registry query can be silently rewritten.
    q("q281_mv_substitution",
      "optimizer rewrites a coarser lineitem aggregate onto the materialized view")(
      """SELECT l_returnflag,
        |       round(CAST(sum(CAST(round(l_quantity, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      val d28 = org.apache.spark.sql.types.DecimalType(28, 4)
      val mvDir = s"/tmp/graft_layout/${new java.io.File(dir).getName}/mv_lineitem"
      // the rule matches the raw relation, so read the file directly
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(round(col("l_quantity"), 4).cast(d28)).as("qty4_sum"),
          count(lit(1)).as("cnt"))
        .coalesce(1).write.mode("overwrite").parquet(mvDir)
      if (!s.experimental.extraOptimizations.contains(graft.plans.MvAggRewrite))
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ graft.plans.MvAggRewrite
      s.conf.set("spark.graft.mv.path", mvDir)
      s.conf.set("spark.graft.mv.enabled", "true")
      try {
        li.groupBy("l_returnflag")
          .agg(round(sum(round(col("l_quantity"), 4).cast(d28)).cast("double"), 4).as("sum_qty"),
            count(lit(1)).as("n"))
          .localCheckpoint(true) // run the substituted plan NOW, inside the gate
          .orderBy("l_returnflag")
      } finally s.conf.set("spark.graft.mv.enabled", "false")
    },

    // Snapshot diff — the audit twin of time travel (q228) and CDC apply
    // (q237): given two table versions, classify every key as insert /
    // delete / update / same. The 100 TB discipline is in WHAT shuffles:
    // each side projects to (key, 8-byte md5 fingerprint of the compared
    // payload) BEFORE the full-outer join, so the diff of an arbitrarily
    // wide table moves 16 bytes per row through the exchange; the wide
    // rows are only re-fetched (by key, for the changed keys) if a caller
    // drills in. Versions are derived from deterministic predicates
    // (v2 drops key%4=0, adds key%4=3, rewrites the status of key%5=0) so
    // the oracle reproduces both sides exactly; the class histogram plus
    // min/max key per class is the whole-table reconciliation report.
    q("q308_snapshot_diff",
      "full-outer fingerprint diff of two table versions: insert/delete/update/same audit")(
      {
        import graft.functions.PortableHash.md5LongSql
        s"""WITH v1 AS (SELECT o_orderkey AS k,
           |                   ${md5LongSql("'fp:' || o_orderstatus")} AS fp
           |            FROM orders WHERE o_orderkey % 4 < 3),
           |v2 AS (SELECT o_orderkey AS k,
           |              ${md5LongSql(
                "'fp:' || (CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END)")} AS fp
           |       FROM orders WHERE o_orderkey % 4 > 0),
           |d AS (SELECT coalesce(v1.k, v2.k) AS k,
           |             CASE WHEN v1.k IS NULL THEN 'insert'
           |                  WHEN v2.k IS NULL THEN 'delete'
           |                  WHEN v1.fp <> v2.fp THEN 'update'
           |                  ELSE 'same' END AS change_type
           |      FROM v1 FULL OUTER JOIN v2 ON v2.k = v1.k)
           |SELECT change_type, CAST(count(*) AS BIGINT) AS n,
           |       CAST(min(k) AS BIGINT) AS min_key, CAST(max(k) AS BIGINT) AS max_key
           |FROM d GROUP BY change_type ORDER BY change_type""".stripMargin
      }
    ) { (s, dir) =>
      import graft.functions.PortableHash.md5Long
      val orders = Tables(s, dir, "orders")
      val v1 = orders.filter(col("o_orderkey") % 4 < 3)
        .select(col("o_orderkey").as("k"),
          md5Long(concat(lit("fp:"), col("o_orderstatus"))).as("fp1"))
      val v2 = orders.filter(col("o_orderkey") % 4 > 0)
        .select(col("o_orderkey").as("k"),
          md5Long(concat(lit("fp:"),
            when(col("o_orderkey") % 5 === 0, "X").otherwise(col("o_orderstatus")))).as("fp2"))
      v1.join(v2, Seq("k"), "full_outer")
        .select(col("k"),
          when(col("fp1").isNull, "insert")
            .when(col("fp2").isNull, "delete")
            .when(col("fp1") =!= col("fp2"), "update")
            .otherwise("same").as("change_type"))
        .groupBy("change_type")
        .agg(count(lit(1)).as("n"), min(col("k")).as("min_key"), max(col("k")).as("max_key"))
        .orderBy("change_type")
    },

    // Exchange reuse — the last un-demonstrated member of Spark's
    // runtime-optimization family (DPP q192, AQE skew q217, runtime
    // Bloom q218, CBO q196, MV rewrite q281): the per-order quantity
    // rollup feeds BOTH the row stream and its own global mean, and the
    // identical aggregation subtree appears under two plan branches —
    // Spark's ReuseExchange/stage-reuse rule computes the shuffle ONCE
    // and wires the second consumer to the same materialized stage
    // (PlanShapeSpec pins a ReusedExchange/StageReuse node in the
    // executed plan). At 100 TB this is the difference between one and
    // two full shuffles of the fact table for every "compare each group
    // to the global statistic" query. The comparison itself is cleared
    // to integers (oq·n_orders > total_qty — no mean division).
    q("q311_exchange_reuse",
      "above-average-order classification: one shuffle feeds both the rows and the global mean")(
      """WITH g AS (SELECT l_orderkey,
        |                  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS oq
        |           FROM lineitem GROUP BY l_orderkey),
        |m AS (SELECT CAST(sum(oq) AS BIGINT) AS tq, CAST(count(*) AS BIGINT) AS no FROM g)
        |SELECT CASE WHEN g.oq * m.no > m.tq THEN 'above' ELSE 'at_or_below' END AS cls,
        |       CAST(count(*) AS BIGINT) AS n_orders, CAST(sum(g.oq) AS BIGINT) AS qty_sum
        |FROM g CROSS JOIN m GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val g = Tables(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(expr("cast(floor(l_quantity) as bigint)")).as("oq"))
      val m = g.agg(sum(col("oq")).as("tq"), count(lit(1)).as("no"))
      g.crossJoin(broadcast(m))
        .select(when(col("oq") * col("no") > col("tq"), "above")
          .otherwise("at_or_below").as("cls"), col("oq"))
        .groupBy("cls")
        .agg(count(lit(1)).as("n_orders"), sum(col("oq")).as("qty_sum"))
        .orderBy("cls")
    },

    // Multi-column cardinality estimation — WHY q196's CBO needs more
    // than per-column stats: on a PLANTED correlated pair (b = a + hash%5
    // — the fixture's columns are independent, so the correlation is
    // constructed, q309's discipline) the selectivity of a ≤ 7 AND b ≤ 7
    // is estimated three ways: the truth, a coarse 2-D histogram cell
    // with uniform-within-cell fractions (49/110 of the deliberately
    // MISALIGNED 10×11 corner cell), and the attribute-independence
    // product every single-column-stats optimizer uses. Measured law
    // (spec-pinned): independence under-counts the correlated
    // conjunction ~7× (err ≈ 860‰) while the 2-D cell lands within
    // ~250‰ — the reason multi-column histograms exist. One scan → five
    // integer counters → a 3-row metadata report.
    q("q319_cardinality_estimation",
      "conjunctive selectivity on a planted-correlated pair: truth vs 2-D histogram vs independence")(
      s"""WITH l AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS a,
         |                  CAST(floor(l_quantity) AS BIGINT)
         |                  + ${graft.functions.PortableHash.md5LongSql(
              "'ce:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)")} % 5 AS b
         |           FROM lineitem),
         |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(CASE WHEN a <= 7 AND b <= 7 THEN 1 ELSE 0 END) AS BIGINT) AS tr,
         |             CAST(sum(CASE WHEN a <= 7 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |             CAST(sum(CASE WHEN b <= 7 THEN 1 ELSE 0 END) AS BIGINT) AS cb,
         |             CAST(sum(CASE WHEN a <= 10 AND b <= 11 THEN 1 ELSE 0 END) AS BIGINT) AS c00
         |      FROM l),
         |e AS (SELECT 'a_true' AS method, tr AS est_n, tr FROM c
         |      UNION ALL SELECT 'b_hist2d', (c00 * 49) // 110, tr FROM c
         |      UNION ALL SELECT 'c_indep', (ca * cb) // n, tr FROM c)
         |SELECT method, est_n, tr AS true_n,
         |       CAST((1000 * abs(est_n - tr)) // tr AS BIGINT) AS err_permille
         |FROM e ORDER BY method""".stripMargin
    ) { (s, dir) =>
      import graft.functions.PortableHash.md5Long
      val l = Tables(s, dir, "lineitem").select(
        expr("cast(floor(l_quantity) as bigint)").as("a"),
        (expr("cast(floor(l_quantity) as bigint)")
          + md5Long(concat(lit("ce:"), col("l_orderkey").cast("string"), lit(":"),
            col("l_linenumber").cast("string"))) % 5).as("b"))
      val c = l.agg(count(lit(1)).as("n"),
        sum(when(col("a") <= 7 && col("b") <= 7, 1L).otherwise(0L)).as("tr"),
        sum(when(col("a") <= 7, 1L).otherwise(0L)).as("ca"),
        sum(when(col("b") <= 7, 1L).otherwise(0L)).as("cb"),
        sum(when(col("a") <= 10 && col("b") <= 11, 1L).otherwise(0L)).as("c00"))
      val e = c.select(lit("a_true").as("method"), col("tr").as("est_n"), col("tr"))
        .unionAll(c.select(lit("b_hist2d"), expr("(c00 * 49) div 110"), col("tr")))
        .unionAll(c.select(lit("c_indep"), expr("(ca * cb) div n"), col("tr")))
      e.select(col("method"), col("est_n"), col("tr").as("true_n"),
          expr("cast((1000 * abs(est_n - tr)) div tr as bigint)").as("err_permille"))
        .orderBy("method")
    },

    // Data-contract expectation suite — the declarative gate a dataset
    // passes before anything downstream consumes it, as ONE query: six
    // rule families (range, not-null, uniqueness, referential integrity,
    // enum domain, positivity) each reduced to (checked, violations,
    // pass) by a scalar aggregate; the FK rule broadcasts the distinct
    // parent keys (q226's shape). One rule is deliberately written
    // against a stale sample — quantity ≤ 45 — and the suite CATCHES it
    // (~10% violations, pass = 0): a contract report where everything is
    // green demonstrates nothing. 100 TB shape: every rule is a partial
    // aggregate over one scan of its table; the two lineitem rule groups
    // share a scan per branch and nothing is row-ordered.
    q("q323_data_contract",
      "six-rule expectation suite with per-rule verdicts; the stale range rule must fail")(
      """WITH li AS (SELECT l_quantity, l_shipdate, l_extendedprice, l_orderkey FROM lineitem),
        |ok AS (SELECT DISTINCT o_orderkey FROM orders),
        |r1 AS (SELECT 'r1_quantity_le_45' AS rule, CAST(count(*) AS BIGINT) AS n_checked,
        |              CAST(sum(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        |       FROM li),
        |r2 AS (SELECT 'r2_shipdate_not_null', CAST(count(*) AS BIGINT),
        |              CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM li),
        |r3 AS (SELECT 'r3_orderkey_unique', CAST(count(*) AS BIGINT),
        |              CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders),
        |r4 AS (SELECT 'r4_fk_orders', CAST(count(*) AS BIGINT),
        |              CAST(sum(CASE WHEN ok.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |       FROM li LEFT JOIN ok ON ok.o_orderkey = li.l_orderkey),
        |r5 AS (SELECT 'r5_status_enum', CAST(count(*) AS BIGINT),
        |              CAST(sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END) AS BIGINT)
        |       FROM orders),
        |r6 AS (SELECT 'r6_price_positive', CAST(count(*) AS BIGINT),
        |              CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM li),
        |u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
        |      UNION ALL SELECT * FROM r4 UNION ALL SELECT * FROM r5 UNION ALL SELECT * FROM r6)
        |SELECT rule, n_checked, n_violations,
        |       CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass
        |FROM u ORDER BY rule""".stripMargin
    ) { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      val orders = Tables(s, dir, "orders")
      val ok = orders.select(col("o_orderkey")).distinct()
      def rule(name: String, df: DataFrame, viol: Column) = df
        .agg(count(lit(1)).as("n_checked"), sum(viol).as("n_violations"))
        .select(lit(name).as("rule"), col("n_checked"), col("n_violations"))
      val r4 = li.select(col("l_orderkey"))
        .join(broadcast(ok.withColumnRenamed("o_orderkey", "pk")),
          col("l_orderkey") === col("pk"), "left_outer")
      Seq(
        rule("r1_quantity_le_45", li, when(col("l_quantity") > 45, 1L).otherwise(0L)),
        rule("r2_shipdate_not_null", li, when(col("l_shipdate").isNull, 1L).otherwise(0L)),
        orders.agg(count(lit(1)).as("n_checked"),
            (count(lit(1)) - countDistinct(col("o_orderkey"))).as("n_violations"))
          .select(lit("r3_orderkey_unique").as("rule"), col("n_checked"), col("n_violations")),
        rule("r4_fk_orders", r4, when(col("pk").isNull, 1L).otherwise(0L)),
        rule("r5_status_enum", orders,
          when(!col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L)),
        rule("r6_price_positive", li, when(col("l_extendedprice") <= 0, 1L).otherwise(0L))
      ).reduce(_ unionByName _)
        .select(col("rule"), col("n_checked"), col("n_violations"),
          when(col("n_violations") === 0, 1L).otherwise(0L).as("pass"))
        .orderBy("rule")
    },

    // Right-to-be-forgotten erasure cascade — the governance verb the
    // audit family (q226 FK integrity, q248 k-anonymity, q323 contract)
    // checks but never EXECUTES: ~2% of customers (hash-chosen, so the
    // subject set is deterministic) are erased, and the deletion
    // CASCADES along the FK chain customer → orders → lineitem, plus
    // the events of those users (events.user_id shares the custkey
    // space). Every kept frame is a LEFT ANTI join against a
    // subject/erased-key set — the 100 TB shape: the subject list is
    // the small side (broadcast), facts never shuffle wide — and the
    // orphans_after column is a real post-erasure audit ON THE KEPT
    // ROWS (a semi-join count that must come back 0 for every table),
    // not an assumption. One row per table: before/erased/after/orphans.
    q("q334_gdpr_erasure",
      "2% subject erasure cascaded customer→orders→lineitem→events, audited orphan-free")(
      s"""WITH subj AS (SELECT c_custkey AS ck FROM customer
         |              WHERE ${graft.functions.PortableHash.md5LongSql("'gdpr:' || CAST(c_custkey AS VARCHAR)")} % 50 = 0),
         |eo AS (SELECT o_orderkey AS ok FROM orders WHERE o_custkey IN (SELECT ck FROM subj)),
         |kc AS (SELECT count(*) AS k FROM customer WHERE c_custkey NOT IN (SELECT ck FROM subj)),
         |ko AS (SELECT count(*) AS k,
         |              sum(CASE WHEN o_custkey IN (SELECT ck FROM subj) THEN 1 ELSE 0 END) AS orph
         |       FROM orders WHERE o_custkey NOT IN (SELECT ck FROM subj)),
         |kl AS (SELECT count(*) AS k,
         |              sum(CASE WHEN l_orderkey IN (SELECT ok FROM eo) THEN 1 ELSE 0 END) AS orph
         |       FROM lineitem WHERE l_orderkey NOT IN (SELECT ok FROM eo)),
         |ke AS (SELECT count(*) AS k,
         |              sum(CASE WHEN user_id IN (SELECT ck FROM subj) THEN 1 ELSE 0 END) AS orph
         |       FROM events WHERE user_id NOT IN (SELECT ck FROM subj))
         |SELECT tbl, CAST(n_before AS BIGINT) AS n_before,
         |       CAST(n_before - n_after AS BIGINT) AS n_erased,
         |       CAST(n_after AS BIGINT) AS n_after,
         |       CAST(orphans AS BIGINT) AS orphans_after
         |FROM (
         |  SELECT 'customer' AS tbl, (SELECT count(*) FROM customer) AS n_before,
         |         (SELECT k FROM kc) AS n_after, 0 AS orphans
         |  UNION ALL SELECT 'orders', (SELECT count(*) FROM orders),
         |         (SELECT k FROM ko), (SELECT COALESCE(orph, 0) FROM ko)
         |  UNION ALL SELECT 'lineitem', (SELECT count(*) FROM lineitem),
         |         (SELECT k FROM kl), (SELECT COALESCE(orph, 0) FROM kl)
         |  UNION ALL SELECT 'events', (SELECT count(*) FROM events),
         |         (SELECT k FROM ke), (SELECT COALESCE(orph, 0) FROM ke)) z
         |ORDER BY tbl""".stripMargin
    ) { (sp, dir) =>
      import graft.functions.PortableHash.md5Long
      val cust = Tables(sp, dir, "customer")
      val subj = cust
        .filter(md5Long(concat(lit("gdpr:"), col("c_custkey").cast("string"))) % 50 === 0)
        .select(col("c_custkey").as("ck"))
        .cache() // 3 anti joins + 3 audits + erased-order derivation
      val orders = Tables(sp, dir, "orders")
      val eo = orders.join(broadcast(subj), col("o_custkey") === col("ck"), "left_semi")
        .select(col("o_orderkey").as("ok"))
        .cache() // lineitem anti join + audit
      def report(tbl: String, before: DataFrame, kept: DataFrame,
          orphans: DataFrame): DataFrame =
        before.agg(count(lit(1)).as("n_before"))
          .crossJoin(kept.agg(count(lit(1)).as("n_after")))
          .crossJoin(orphans.agg(count(lit(1)).as("orphans_after")))
          .select(lit(tbl).as("tbl"), col("n_before"),
            (col("n_before") - col("n_after")).as("n_erased"),
            col("n_after"), col("orphans_after"))
      val kc = cust.join(broadcast(subj), col("c_custkey") === col("ck"), "left_anti")
      val ko = orders.join(broadcast(subj), col("o_custkey") === col("ck"), "left_anti")
        .cache() // kept count + orphan audit
      val kl = Tables(sp, dir, "lineitem")
        .join(broadcast(eo), col("l_orderkey") === col("ok"), "left_anti")
        .cache()
      val ke = Tables(sp, dir, "events")
        .join(broadcast(subj), col("user_id") === col("ck"), "left_anti")
        .cache()
      report("customer", cust, kc, kc.limit(0))
        .unionByName(report("orders", orders, ko,
          ko.join(broadcast(subj), col("o_custkey") === col("ck"), "left_semi")))
        .unionByName(report("lineitem", Tables(sp, dir, "lineitem"), kl,
          kl.join(broadcast(eo), col("l_orderkey") === col("ok"), "left_semi")))
        .unionByName(report("events", Tables(sp, dir, "events"), ke,
          ke.join(broadcast(subj), col("user_id") === col("ck"), "left_semi")))
        .orderBy("tbl")
    }
  )

  /** q233's write + pruned read-back, factored out so NestedPruningSpec can
    * build the same frame and assert the scan's readSchema holds ONLY the
    * two touched leaves (k.rf, m.price) — not the sibling fields, not the
    * payload array. */
  private[graft] def nestedPrunedFrame(s: SparkSession, dir: String): DataFrame = {
    val sf = new java.io.File(dir).getName.replace('.', '_')
    val loc = s"/tmp/graft_nested_${s.sparkContext.applicationId}/$sf"
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    Tables(s, dir, "lineitem")
      .select(
        struct(col("l_orderkey").as("okey"), col("l_linenumber").as("line"),
          col("l_returnflag").as("rf")).as("k"),
        struct(col("l_extendedprice").as("price"), col("l_quantity").as("qty"),
          col("l_discount").as("disc"), col("l_tax").as("tax")).as("m"),
        array(col("l_shipdate").cast("string"), col("l_linestatus")).as("payload"))
      .write.parquet(loc)
    s.read.parquet(loc)
      .groupBy(col("k.rf").as("rf"))
      .agg(count(lit(1)).as("n"), round(dsum(col("m.price")), 4).as("rev"))
      .orderBy("rf")
  }

  /** q217's join frame, factored out so RuntimeReplanSpec can materialize
    * it under the same confs and assert `skew=true` on the executed SMJ. */
  private[graft] def aqeSkewFrame(s: SparkSession, dir: String): DataFrame = {
    // repartition(32) first: a skewed REDUCE partition can only be split
    // along its MAP outputs, and the fixture parquet reads in one split —
    // on a real cluster the fact arrives from thousands of map tasks and
    // this round-robin exchange is unnecessary
    val fact = Tables(s, dir, "events").repartition(32).select(
      when(col("user_id") % 3 =!= 0, lit(0L))
        .otherwise(col("user_id")).as("k"),
      col("value"))
    // the dim is materialized (≤501 rows) so its join input is a plain
    // scan→exchange: OptimizeSkewedJoin only matches SMJ(Sort(stage),
    // Sort(stage)), and the distinct's post-shuffle final aggregate would
    // otherwise sit between the Sort and the stage and silently veto the
    // split on BOTH sides
    val dim = fact.select(col("k")).distinct()
      .select(col("k"), concat(lit("grp-"), col("k").cast("string")).as("label"))
      .localCheckpoint(true)
    fact.join(dim, Seq("k"))
      .groupBy("k", "label")
      .agg(count(lit(1)).as("n"),
        round(sum(round(col("value"), 4)
          .cast(org.apache.spark.sql.types.DecimalType(28, 4))).cast("double"), 4).as("sv"))
      .orderBy("k")
  }

  /** q218's join frame, factored out so RuntimeReplanSpec can materialize
    * it under the same confs and assert the injected might_contain
    * Bloom gate on the lineitem side. */
  private[graft] def runtimeBloomFrame(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val ord = Tables(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(sum(round(col("l_extendedprice"), 4)
          .cast(org.apache.spark.sql.types.DecimalType(28, 4))).cast("double"), 4).as("rev"))
      .orderBy("l_returnflag")
  }
}
