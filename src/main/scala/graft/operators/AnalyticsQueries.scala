package graft.operators

import graft.Registry.{Q, q, rowsOnly}
import graft.Tables
import graft.functions.PortableHash.{kmvEstimateSql, md5Long, md5LongSql}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session/behavioral analytics pack (round 3): gaps-and-islands, interval
  * concurrency, bitmap audience overlap, EWMA smoothing, running distinct
  * counts, conditional-aggregate surface, skyline (Pareto frontier),
  * hierarchical OHLC rollup cascade, and last-touch attribution.
  *
  * All queries follow the FIXTURES.md determinism contract: full-tuple
  * ORDER BY, round(·,4) on double outputs, BIGINT casts wherever DuckDB
  * widens (window sums, bit_count sums), and µs integer time arithmetic
  * (`unix_micros` ≙ `epoch_us`) instead of fractional epoch seconds.
  *
  * 100 TB notes per query inline — every shape here is a partition-local
  * window or an equi-join; nothing is all-pairs or driver-side.
  */
object AnalyticsQueries {

  private def us(c: Column): Column = unix_micros(c)

  /** q250's trailing-24h 3σ finalize, shared with the streaming twin
    * (q253): takes per-(event_type, hour-bucket) counts, zero-fills the
    * hour spine, scores each full window with the integer z²>9 test, and
    * rolls up per series. Input columns: event_type, hb (hour bucket), y. */
  private[graft] def anomalyReport(b0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val b = b0.cache() // bounds + type list + spine left-join
    val bounds = b.agg(min(col("hb")).as("lo"), max(col("hb")).as("hi"))
    // the spine side re-aliases its columns (fresh exprIds): all three
    // frames descend from the same input, which for a memory-sink-backed
    // b (q253) would otherwise make the left-join self-conflicting
    val spine = b.select(col("event_type").as("sty")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("sty"), col("lo"), explode(sequence(col("lo"), col("hi"))).as("shb"))
    val series = spine.join(b,
        col("sty") === col("event_type") && col("shb") === col("hb"), "left")
      .select(col("sty").as("event_type"), (col("shb") - col("lo") + 1).as("idx"),
        coalesce(col("y"), lit(0L)).as("y"))
    val win = Window.partitionBy("event_type").orderBy("idx").rowsBetween(-24, -1)
    val dev = lit(24L) * col("y") - col("s1")
    series.select(col("event_type"), col("y"),
        count(lit(1)).over(win).as("n"), sum(col("y")).over(win).as("s1"),
        sum(col("y") * col("y")).over(win).as("s2"))
      .filter(col("n") === 24)
      .select(col("event_type"), col("y"),
        when(dev * dev > lit(9L) * (lit(24L) * col("s2") - col("s1") * col("s1")), 1L)
          .otherwise(0L).as("flag"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_scored"), sum(col("flag")).as("n_anom"),
        max(when(col("flag") === 1L, col("y"))).as("max_anom_y"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(

    // Gaps-and-islands: split each user's event stream into activity
    // islands wherever the gap exceeds 1 h, then profile islands per user.
    // The classic sessionization-without-session_window shape: one window
    // pass marks island starts, a running sum labels islands, two grouped
    // aggregations roll up. At 100 TB everything is partitioned by user_id
    // — no cross-key traffic beyond the initial shuffle; the window and
    // both groupBys reuse the same hash partitioning (one exchange total).
    q("q124_islands", "gaps-and-islands per user: island count, peak size, longest span")(
      """WITH o AS (
        |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS t,
        |         CASE WHEN lag(epoch_us(ts::TIMESTAMP)) OVER w IS NULL
        |                OR epoch_us(ts::TIMESTAMP) - lag(epoch_us(ts::TIMESTAMP)) OVER w > 3600000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |lab AS (
        |  SELECT user_id, t,
        |         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS isl
        |  FROM o),
        |isles AS (
        |  SELECT user_id, isl, count(*) AS n, (max(t) - min(t)) // 1000000 AS dur_s
        |  FROM lab GROUP BY user_id, isl)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
        |       CAST(max(n) AS BIGINT) AS peak_events,
        |       CAST(max(dur_s) AS BIGINT) AS longest_s
        |FROM isles GROUP BY user_id ORDER BY user_id""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val t = us(col("ts"))
      val brk = when(lag(t, 1).over(w).isNull ||
        t - lag(t, 1).over(w) > 3600L * 1000000L, 1).otherwise(0)
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), t.as("t"), brk.as("brk"))
        .withColumn("isl",
          sum(col("brk")).over(Window.partitionBy("user_id").orderBy("t", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "isl")
        .agg(count(lit(1)).as("n"),
          ((max(col("t")) - min(col("t"))) / 1000000L).cast("long").as("dur_s"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_islands"),
          max(col("n")).as("peak_events"),
          max(col("dur_s")).as("longest_s"))
        .orderBy("user_id")
    },

    // Interval-overlap concurrency via sweep line: each event opens a
    // 30-minute interval [ts, ts+30m); +1/−1 boundary points, a running sum
    // per event_type, and the max is the peak concurrency. Sorting −1
    // before +1 at equal timestamps implements the half-open contract.
    // The scale shape for "max concurrent sessions/connections" reports:
    // one shuffle on the partition key, one window pass — never an
    // interval self-join (which is quadratic on dense overlap).
    q("q125_max_concurrency", "peak concurrent 30-min intervals per event_type (sweep line)")(
      """WITH pts AS (
        |  SELECT event_type, epoch_us(ts::TIMESTAMP) AS t, 1 AS d FROM events
        |  UNION ALL
        |  SELECT event_type, epoch_us(ts::TIMESTAMP) + 1800000000, -1 FROM events),
        |run AS (
        |  SELECT event_type,
        |         CAST(sum(d) OVER (PARTITION BY event_type ORDER BY t, d
        |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
        |  FROM pts)
        |SELECT event_type, max(c) AS peak
        |FROM run GROUP BY event_type ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val pts = ev.select(col("event_type"), us(col("ts")).as("t"), lit(1).as("d"))
        .unionAll(ev.select(col("event_type"),
          (us(col("ts")) + 1800L * 1000000L).as("t"), lit(-1).as("d")))
      pts.withColumn("c",
          sum(col("d")).over(Window.partitionBy("event_type").orderBy("t", "d")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("event_type").agg(max(col("c")).as("peak"))
        .orderBy("event_type")
    },

    // Audience overlap via bitmap indexes: each event_type's user set is
    // packed into 63-bit BIGINT words (word = user_id div 63; DuckDB's
    // shift is overflow-checked at bit 63, q59's lesson), pairwise overlap
    // is AND + popcount on word-aligned equi-joined segments. The roaring-
    // bitmap shape: set intersection cost is O(words), not O(members), and
    // the word equi-join co-partitions — at 100 TB each (segment, word)
    // cell is independent, so overlap matrices over billions of users are
    // a map-side AND away once the bitmaps exist.
    q("q126_bitmap_overlap", "pairwise audience overlap via 63-bit word bitmaps")(
      """WITH m AS (SELECT DISTINCT event_type, user_id FROM events),
        |b AS (
        |  SELECT event_type, user_id // 63 AS w,
        |         bit_or(1::BIGINT << CAST(user_id % 63 AS INT)) AS bits
        |  FROM m GROUP BY event_type, user_id // 63)
        |SELECT a.event_type AS t1, c.event_type AS t2,
        |       CAST(sum(bit_count(a.bits & c.bits)) AS BIGINT) AS overlap
        |FROM b a JOIN b c ON a.w = c.w AND a.event_type < c.event_type
        |GROUP BY t1, t2 ORDER BY t1, t2""".stripMargin
    ) { (s, dir) =>
      val b = Tables(s, dir, "events")
        .select(col("event_type"), col("user_id")).distinct()
        .select(col("event_type"), expr("user_id div 63").as("w"),
          expr("shiftleft(1L, cast(user_id % 63 as int))").as("bit"))
        .groupBy("event_type", "w").agg(expr("bit_or(bit)").as("bits"))
      val a = b.select(col("event_type").as("t1"), col("w"), col("bits").as("ba"))
      val c = b.select(col("event_type").as("t2"), col("w"), col("bits").as("bc"))
      a.join(c, Seq("w")).filter(col("t1") < col("t2"))
        .groupBy("t1", "t2")
        .agg(sum(bit_count(col("ba").bitwiseAND(col("bc")))).cast("long").as("overlap"))
        .orderBy("t1", "t2")
    },

    // EWMA (α = 1/2) over each event_type's last 16 values, computed as a
    // SEQUENTIAL left fold over the windowed value list — `aggregate` and
    // DuckDB's `list_reduce` run the identical (a+x)/2 chain in the same
    // order, so the doubles are bit-identical cross-engine (NOTES.md:
    // sequential folds are the deterministic way to verify smoothing).
    // One window pass, partition-local; the 16-element list bounds state.
    q("q127_ewma", "EWMA (α=1/2) of the last 16 values per event_type")(
      """WITH l AS (
        |  SELECT event_type, ts, event_id,
        |         list(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |                           ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS vs,
        |         row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn,
        |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM events)
        |SELECT event_type, n, round(list_reduce(vs, (a, x) -> (a + x) / 2), 4) AS ewma
        |FROM l WHERE rn = 1 ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      val ord = Window.partitionBy("event_type").orderBy("ts", "event_id")
      Tables(s, dir, "events")
        .select(col("event_type"), col("ts"), col("event_id"), col("value"))
        .withColumn("vs", collect_list(col("value")).over(ord.rowsBetween(-15, 0)))
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy(col("ts").desc, col("event_id").desc)))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("n"),
          round(aggregate(
            slice(col("vs"), lit(2), size(col("vs")) - 1),
            element_at(col("vs"), 1),
            (a, x) => (a + x) / lit(2.0)), 4).as("ewma"))
        .orderBy("event_type")
    },

    // Running distinct count over a window — the window COUNT(DISTINCT)
    // Spark and DuckDB both lack, emulated exactly: mark each (user,
    // event_type)'s first occurrence with row_number()=1, then running-sum
    // the marks along the user's timeline. Two window passes over the SAME
    // user_id partitioning (one exchange); scales as pure partition-local
    // state — the standard trick for "distinct items seen so far" feeds.
    q("q128_running_distinct", "running distinct event_type count along each user's timeline")(
      """WITH f AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
        |                                      ORDER BY ts, event_id) = 1
        |              THEN 1 ELSE 0 END AS fst
        |  FROM events)
        |SELECT user_id, event_id,
        |       CAST(sum(fst) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS k_types
        |FROM f ORDER BY user_id, ts, event_id LIMIT 500""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "events")
        .withColumn("fst", when(row_number().over(
          Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")) === 1, 1)
          .otherwise(0))
        .withColumn("k_types", sum(col("fst")).over(
          Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("user_id", "ts", "event_id")
        .select(col("user_id"), col("event_id"), col("k_types"))
        .limit(500)
    },

    // Conditional-aggregate surface: count_if / bool_and / bool_or /
    // max_by / min_by — the same five names resolve in both engines.
    // min_by/max_by are keyed on the UNIQUE event_id (keying them on value
    // would be tie-nondeterministic cross-engine). All partial-aggregate
    // map-side; 5 groups.
    q("q129_agg_variants", "count_if / bool_and / bool_or / max_by / min_by per event_type")(
      """SELECT event_type,
        |       CAST(count_if(value > 50) AS BIGINT) AS n_hi,
        |       bool_and(value >= 0) AS all_nonneg,
        |       bool_or(value > 480) AS any_extreme,
        |       round(max_by(value, event_id), 4) AS latest_value,
        |       round(min_by(value, event_id), 4) AS earliest_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy("event_type")
        .agg(expr("count_if(value > 50)").cast("long").as("n_hi"),
          expr("bool_and(value >= 0)").as("all_nonneg"),
          expr("bool_or(value > 480)").as("any_extreme"),
          round(expr("max_by(value, event_id)"), 4).as("latest_value"),
          round(expr("min_by(value, event_id)"), 4).as("earliest_value"))
        .orderBy("event_type")
    },

    // Skyline (Pareto frontier) on part: minimize retail price, maximize
    // size, strict dominance on both axes. The O(n log n) shape —
    // pre-aggregate max size per distinct price, strict-prefix running max
    // over the price ordering, keep rows beating every strictly-cheaper
    // part. NEVER the quadratic NOT-EXISTS self-join. The running max is
    // the two-pass distributed scan (DistributedRank.withStrictPrefixMax:
    // per-range-partition maxima prefix-combined by broadcast) — even
    // though the frame is the distinct-price table, price grids are only
    // quantized-cents-bounded by ASSUMPTION, and the distributed form costs
    // the same here while surviving a continuous-valued column at 100 TB.
    q("q130_skyline", "Pareto frontier of part (min price, max size) via running max")(
      """WITH g AS (SELECT p_retailprice AS pr, max(p_size) AS ms FROM part GROUP BY p_retailprice),
        |c AS (SELECT pr, max(ms) OVER (ORDER BY pr ROWS BETWEEN UNBOUNDED PRECEDING
        |                               AND 1 PRECEDING) AS below FROM g)
        |SELECT p.p_partkey, p.p_size, round(p.p_retailprice, 4) AS price
        |FROM part p JOIN c ON p.p_retailprice = c.pr
        |WHERE p.p_size > COALESCE(c.below, -1)
        |ORDER BY price, p.p_partkey""".stripMargin
    ) { (s, dir) =>
      val part = Tables(s, dir, "part")
      val g = part.groupBy(col("p_retailprice").as("pr")).agg(max(col("p_size")).as("ms"))
      val c = DistributedRank.withStrictPrefixMax(g, col("pr"), col("ms"), "below")
      part.join(c, part("p_retailprice") === c("pr"))
        .filter(col("p_size") > coalesce(col("below"), lit(-1)))
        .select(col("p_partkey"), col("p_size"), round(col("p_retailprice"), 4).as("price"))
        .orderBy("price", "p_partkey")
    },

    // Hierarchical OHLC rollup cascade: 1-minute bars aggregate into
    // 10-minute bars into 1-hour bars — each level computed FROM THE LEVEL
    // BELOW (open = first child's open, close = last child's close,
    // high/low/volume compose). The oracle recomputes every level directly
    // from raw events, so the query PROVES the cascade is lossless — the
    // incremental-rollup contract that lets a 100 TB deployment maintain
    // coarse bars from fine bars without ever rescanning raw data.
    q("q139_rollup_cascade", "OHLC 1m→10m→1h cascade; each level from the level below")({
      // the oracle computes each level DIRECTLY from raw events — the Spark
      // side cascades level-from-level, so a hash match proves the cascade
      // is lossless (open/close/high/low/volume compose exactly)
      def direct(widthUs: Long, lvl: String) =
        s"""SELECT '$lvl' AS lvl, event_type, bar,
           |       max(value) AS h, min(value) AS l, count(*) AS n,
           |       max(o) AS o, max(c) AS c
           |FROM (SELECT event_type, value,
           |        (epoch_us(ts::TIMESTAMP) // $widthUs) * $widthUs AS bar,
           |        first_value(value) OVER (PARTITION BY event_type, epoch_us(ts::TIMESTAMP) // $widthUs
           |                                 ORDER BY ts, event_id) AS o,
           |        first_value(value) OVER (PARTITION BY event_type, epoch_us(ts::TIMESTAMP) // $widthUs
           |                                 ORDER BY ts DESC, event_id DESC) AS c
           |      FROM events)
           |GROUP BY event_type, bar""".stripMargin
      s"""SELECT lvl, event_type, make_timestamp(bar) AS bar_start,
         |       round(o, 4) AS open, round(h, 4) AS high, round(l, 4) AS low,
         |       round(c, 4) AS close, CAST(n AS BIGINT) AS volume
         |FROM (${direct(3600000000L, "1h")} UNION ALL ${direct(600000000L, "10m")})
         |ORDER BY lvl, event_type, bar_start""".stripMargin
    }) { (s, dir) =>
      def lift(df: org.apache.spark.sql.DataFrame, width: Long) = {
        val bucket = (col("bar") / lit(width)).cast("long") * lit(width)
        val wAsc = Window.partitionBy(col("event_type"), bucket).orderBy(col("bar"))
        val wDesc = Window.partitionBy(col("event_type"), bucket).orderBy(col("bar").desc)
        df.withColumn("o2", first(col("o")).over(wAsc))
          .withColumn("c2", first(col("c")).over(wDesc))
          .groupBy(col("event_type"), bucket.as("bar"))
          .agg(max(col("h")).as("h"), min(col("l")).as("l"), sum(col("n")).as("n"),
            max(col("o2")).as("o"), max(col("c2")).as("c"))
      }
      val t = us(col("ts"))
      val minuteBar = (t / lit(60000000L)).cast("long") * lit(60000000L)
      val base = Tables(s, dir, "events")
        .select(col("event_type"), col("ts"), col("event_id"), col("value"),
          minuteBar.as("bar"))
      val wAsc = Window.partitionBy("event_type", "bar").orderBy("ts", "event_id")
      val wDesc = Window.partitionBy("event_type", "bar")
        .orderBy(col("ts").desc, col("event_id").desc)
      val b1 = base
        .withColumn("o", first(col("value")).over(wAsc))
        .withColumn("c", first(col("value")).over(wDesc))
        .groupBy("event_type", "bar")
        .agg(max(col("value")).as("h"), min(col("value")).as("l"), count(lit(1)).as("n"),
          max(col("o")).as("o"), max(col("c")).as("c"))
      val b10 = lift(b1, 600000000L)
      val b60 = lift(b10, 3600000000L)
      b60.withColumn("lvl", lit("1h")).unionByName(b10.withColumn("lvl", lit("10m")))
        .select(col("lvl"), col("event_type"), timestamp_micros(col("bar")).as("bar_start"),
          round(col("o"), 4).as("open"), round(col("h"), 4).as("high"),
          round(col("l"), 4).as("low"), round(col("c"), 4).as("close"),
          col("n").cast("long").as("volume"))
        .orderBy("lvl", "event_type", "bar_start")
    },

    // Last-touch attribution: each purchase credits the user's most recent
    // prior click/view within 7 days. One window pass carries the last
    // touch forward (last_value IGNORE NULLS over the user timeline) — the
    // attribution join that is usually written as an expensive as-of
    // self-join collapses into partition-local state. Revenue sums run in
    // DECIMAL(28,4) over pre-rounded values (FIXTURES.md: grouped double
    // sums are order-dependent cross-engine).
    q("q140_attribution", "last-touch purchase attribution (7-day lookback) per source")(
      """WITH tl AS (
        |  SELECT user_id, event_type, value, epoch_us(ts::TIMESTAMP) AS t,
        |    last_value(CASE WHEN event_type IN ('click','view') THEN epoch_us(ts::TIMESTAMP) END
        |               IGNORE NULLS) OVER w AS lt_t,
        |    last_value(CASE WHEN event_type IN ('click','view') THEN event_type END
        |               IGNORE NULLS) OVER w AS source
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT source, CAST(count(*) AS BIGINT) AS n_purchases,
        |       round(CAST(sum(CAST(round(value, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue
        |FROM tl
        |WHERE event_type = 'purchase' AND lt_t IS NOT NULL AND t - lt_t <= 604800000000
        |GROUP BY source ORDER BY source""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val isTouch = col("event_type").isin("click", "view")
      val t = us(col("ts"))
      Tables(s, dir, "events")
        .withColumn("t", t)
        .withColumn("lt_t", last(when(isTouch, t), ignoreNulls = true).over(w))
        .withColumn("source", last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase" && col("lt_t").isNotNull &&
          col("t") - col("lt_t") <= 604800000000L)
        .groupBy("source")
        .agg(count(lit(1)).as("n_purchases"),
          round(sum(round(col("value"), 4)
            .cast(org.apache.spark.sql.types.DecimalType(28, 4))).cast("double"), 4)
            .as("revenue"))
        .orderBy("source")
    },

    // Behavioral Markov chain: the event_type → next event_type transition
    // matrix over each user's timeline. One lead() window pass emits the
    // transitions, one groupBy counts them; probabilities are EXACT integer
    // micro-units (count·10⁶ div row-total — q80's no-float-ordering
    // contract). The per-user window partitioning is the only exchange;
    // the 25-cell matrix partial-aggregates map-side at any scale.
    q("q141_markov", "event_type transition matrix in integer micro-units")(
      """WITH tr AS (
        |  SELECT event_type AS cur,
        |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |c AS (SELECT cur, nxt, count(*) AS n FROM tr WHERE nxt IS NOT NULL GROUP BY cur, nxt)
        |SELECT cur, nxt, CAST(n AS BIGINT) AS n,
        |       CAST(n * 1000000 // sum(n) OVER (PARTITION BY cur) AS BIGINT) AS p_micro
        |FROM c ORDER BY cur, nxt""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "events")
        .select(col("event_type").as("cur"),
          lead(col("event_type"), 1).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")).as("nxt"))
        .filter(col("nxt").isNotNull)
        .groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
        .withColumn("tot", sum(col("n")).over(Window.partitionBy("cur")))
        .select(col("cur"), col("nxt"), col("n"),
          expr("(n * 1000000L) div tot").as("p_micro"))
        .orderBy("cur", "nxt")
    },

    // Robust outlier detection via MAD (median absolute deviation) — the
    // robust sibling of q97's z-score (one wild value cannot drag the
    // gate). Both medians are DISCRETE (element at ceil(n/2) of the sorted
    // list — q58's no-interpolation contract, so no float blending
    // cross-engine); the 3·MAD flag is an integer-free double compare of
    // exactly-selected values. Two window/agg passes per group key.
    q("q145_mad_outliers", "per-type MAD and |x−med| > 3·MAD outlier counts")(
      // medians run over the DISTINCT-VALUE count table, not raw rows
      // (lower median = smallest v with cum-count ≥ (n+1) div 2): the
      // few-partition-key window — the usual skew wall for per-group
      // medians — shrinks ~12× and every later stage stays on grouped
      // counts; outliers are counted from the same table
      """WITH vc AS (SELECT event_type, value, count(*) AS k FROM events GROUP BY event_type, value),
        |tot AS (SELECT event_type, CAST(sum(k) AS BIGINT) AS n FROM vc GROUP BY event_type),
        |cum AS (SELECT event_type, value,
        |               CAST(sum(k) OVER (PARTITION BY event_type ORDER BY value
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
        |        FROM vc),
        |med AS (SELECT cum.event_type, min(value) AS med
        |        FROM cum JOIN tot USING (event_type)
        |        WHERE c >= (n + 1) // 2 GROUP BY cum.event_type),
        |adc AS (SELECT e.event_type, abs(e.value - m.med) AS ad, count(*) AS k
        |        FROM events e JOIN med m USING (event_type)
        |        GROUP BY e.event_type, abs(e.value - m.med)),
        |cum2 AS (SELECT event_type, ad,
        |                CAST(sum(k) OVER (PARTITION BY event_type ORDER BY ad
        |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
        |         FROM adc),
        |mad AS (SELECT cum2.event_type, min(ad) AS mad
        |        FROM cum2 JOIN tot USING (event_type)
        |        WHERE c >= (n + 1) // 2 GROUP BY cum2.event_type)
        |SELECT m.event_type, round(m.med, 4) AS median, round(mad.mad, 4) AS mad,
        |       CAST(COALESCE(sum(CASE WHEN a.ad > 3 * mad.mad THEN a.k END), 0) AS BIGINT) AS n_outliers
        |FROM med m JOIN mad USING (event_type) JOIN adc a USING (event_type)
        |GROUP BY m.event_type, m.med, mad.mad ORDER BY m.event_type""".stripMargin
    ) { (s, dir) =>
      // lower median over a (key, count) table: smallest v with cum ≥ ⌈n/2⌉
      def medianOfCounts(counts: org.apache.spark.sql.DataFrame, valueCol: String,
          tot: org.apache.spark.sql.DataFrame, out: String): org.apache.spark.sql.DataFrame =
        counts.withColumn("c", sum(col("k")).over(
            Window.partitionBy("event_type").orderBy(valueCol)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .join(broadcast(tot), "event_type")
          .filter(col("c") >= expr("(n + 1L) div 2"))
          .groupBy("event_type").agg(min(col(valueCol)).as(out))
      val ev = Tables(s, dir, "events")
      val vc = ev.groupBy("event_type", "value").agg(count(lit(1)).as("k"))
      val tot = vc.groupBy("event_type").agg(sum(col("k")).as("n"))
      val med = medianOfCounts(vc, "value", tot, "med")
      val adc = ev.join(broadcast(med), "event_type")
        .groupBy(col("event_type"), abs(col("value") - col("med")).as("ad"))
        .agg(count(lit(1)).as("k"))
      val mad = medianOfCounts(adc, "ad", tot, "mad")
      adc.join(broadcast(mad), "event_type").join(broadcast(med), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(coalesce(sum(when(col("ad") > col("mad") * 3, col("k"))), lit(0L))
          .cast("long").as("n_outliers"))
        .select(col("event_type"), round(col("med"), 4).as("median"),
          round(col("mad"), 4).as("mad"), col("n_outliers"))
        .orderBy("event_type")
    },

    // Decile binning (ntile) + per-bin profile — the feature-bucketing op
    // for score calibration and equi-depth histograms. ntile ties are
    // order-dependent, so the window orders by the full unique (value,
    // event_id) tuple — deterministic bin edges in both engines. One
    // window pass + one grouped roll-up on the same partitioning.
    q("q146_deciles", "ntile(10) decile binning per event_type with per-bin profile")(
      """WITH d AS (
        |  SELECT event_type, value,
        |         CAST(ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS decile
        |  FROM events)
        |SELECT event_type, decile, CAST(count(*) AS BIGINT) AS n,
        |       round(min(value), 4) AS lo, round(max(value), 4) AS hi
        |FROM d GROUP BY event_type, decile ORDER BY event_type, decile""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "events")
        .withColumn("decile", ntile(10).over(
          Window.partitionBy("event_type").orderBy("value", "event_id")).cast("long"))
        .groupBy("event_type", "decile")
        .agg(count(lit(1)).as("n"),
          round(min(col("value")), 4).as("lo"), round(max(col("value")), 4).as("hi"))
        .orderBy("event_type", "decile")
    },

    // Exact rolling median (11-row centered-tail window) — the robust
    // smoother for noisy series; selection (sort + middle element), never
    // averaging, so the doubles pass through both engines untouched.
    // Partition-local window state bounded by the frame width.
    q("q147_rolling_median", "exact rolling median of the last 11 values per event_type")(
      """WITH l AS (
        |  SELECT event_type, ts, event_id, value,
        |         list_sort(list(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |                        ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)) AS vs
        |  FROM events)
        |SELECT event_type, event_id, round(vs[(len(vs) + 1) // 2], 4) AS roll_med
        |FROM l ORDER BY event_type, ts, event_id LIMIT 1000""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "events")
        .withColumn("vs", sort_array(collect_list(col("value")).over(
          Window.partitionBy("event_type").orderBy("ts", "event_id").rowsBetween(-10, 0))))
        .withColumn("roll_med",
          round(element_at(col("vs"), ((size(col("vs")) + 1) / 2).cast("int")), 4))
        .orderBy("event_type", "ts", "event_id")
        .select(col("event_type"), col("event_id"), col("roll_med"))
        .limit(1000)
    },

    // Chi-square test of independence (event_type × high-value flag) — the
    // categorical feature-selection primitive. All contingency counts are
    // exact BIGINTs; expected counts and (O−E)²/E terms are doubles built
    // with ONE fixed expression order (r·c then /n), and the 10 cell terms
    // fold SEQUENTIALLY in (event_type, hi) order (q143's contract — a
    // grouped float sum would be merge-order-dependent). The contingency
    // build is one partial-aggregated groupBy; everything after runs on
    // ≤10 rows.
    q("q154_chi2_independence", "chi-square independence test: event_type × value>245")(
      """WITH c AS (SELECT event_type, CASE WHEN value > 245 THEN 1 ELSE 0 END AS hi,
        |                  count(*) AS o
        |           FROM events GROUP BY event_type, CASE WHEN value > 245 THEN 1 ELSE 0 END),
        |rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM c GROUP BY event_type),
        |ct AS (SELECT hi, CAST(sum(o) AS BIGINT) AS cc FROM c GROUP BY hi),
        |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM c),
        |terms AS (
        |  SELECT c.event_type, c.hi,
        |         (c.o - CAST(rt.r AS DOUBLE) * ct.cc / nn.n)
        |           * (c.o - CAST(rt.r AS DOUBLE) * ct.cc / nn.n)
        |           / (CAST(rt.r AS DOUBLE) * ct.cc / nn.n) AS t
        |  FROM c JOIN rt USING (event_type) JOIN ct USING (hi) CROSS JOIN nn),
        |folded AS (SELECT list(t ORDER BY event_type, hi) AS ts FROM terms)
        |SELECT (SELECT n FROM nn) AS n,
        |       CAST((SELECT count(*) FROM rt) - 1 AS BIGINT)
        |         * CAST((SELECT count(*) FROM ct) - 1 AS BIGINT) AS dof,
        |       round(list_reduce(ts, (a, b) -> a + b), 4) AS chi2
        |FROM folded""".stripMargin
    ) { (s, dir) =>
      val c = Tables(s, dir, "events")
        .groupBy(col("event_type"), when(col("value") > 245, 1).otherwise(0).as("hi"))
        .agg(count(lit(1)).as("o"))
        .cache() // row totals, col totals, n, and the term join all read it
      val rt = c.groupBy("event_type").agg(sum(col("o")).as("r"))
      val ct = c.groupBy("hi").agg(sum(col("o")).as("cc"))
      val nn = c.agg(sum(col("o")).as("n"))
      val e = col("r").cast("double") * col("cc") / col("n")
      val terms = c.join(broadcast(rt), "event_type").join(broadcast(ct), "hi")
        .crossJoin(broadcast(nn))
        .select(col("event_type"), col("hi"),
          ((col("o") - e) * (col("o") - e) / e).as("t"))
      val dof = broadcast(rt.agg((count(lit(1)) - 1).as("dr")))
        .crossJoin(broadcast(ct.agg((count(lit(1)) - 1).as("dc"))))
        .select((col("dr") * col("dc")).as("dof"))
      terms
        .agg(sort_array(collect_list(struct(col("event_type"), col("hi"), col("t")))).as("ts"))
        .crossJoin(broadcast(nn)).crossJoin(broadcast(dof))
        .select(col("n"), col("dof"),
          round(aggregate(col("ts"), lit(0.0), (a, m) => a + m.getField("t")), 4).as("chi2"))
    },

    // Exponential time-decay trending score (12 h half-life, hour
    // granularity): score = Σ count_h · 2^(−age/12). Counts are exact
    // BIGINTs; 2^(−age div 12) is an exact power of two, and the 12
    // fractional-step factors are PRECOMPUTED DOUBLE LITERALS inlined into
    // both engines' expressions (cross-engine pow() bit-compatibility is
    // not a documented contract — literals are). Terms fold SEQUENTIALLY
    // in age order. One groupBy to hour buckets (partial map-side), then
    // per-key folds over ≤ 720 buckets — the feature-store
    // "recency-weighted count" at any scale.
    q("q155_decay_trending", "half-life-decayed event counts per type (12h half-life)")({
      val factors = (0 until 12).map(m => math.pow(2.0, -m / 12.0).toString)
      s"""WITH mx AS (SELECT max(epoch_us(ts::TIMESTAMP)) // 3600000000 AS top FROM events),
         |hb AS (SELECT event_type,
         |              CAST(mx.top - epoch_us(ts::TIMESTAMP) // 3600000000 AS BIGINT) AS age_h,
         |              count(*) AS c
         |       FROM events CROSS JOIN mx
         |       GROUP BY event_type, mx.top - epoch_us(ts::TIMESTAMP) // 3600000000),
         |f AS (SELECT event_type,
         |             list(c * pow(2.0, -CAST(age_h // 12 AS DOUBLE))
         |                    * ([${factors.mkString(", ")}])[CAST(age_h % 12 AS INT) + 1]
         |                  ORDER BY age_h) AS terms,
         |             CAST(sum(c) AS BIGINT) AS n
         |      FROM hb GROUP BY event_type)
         |SELECT event_type, n, round(list_reduce(terms, (a, b) -> a + b), 4) AS trending
         |FROM f ORDER BY event_type""".stripMargin
    }) { (s, dir) =>
      val factors = (0 until 12).map(m => math.pow(2.0, -m / 12.0))
      val hour = (unix_micros(col("ts")) / lit(3600000000L)).cast("long")
      val ev = Tables(s, dir, "events")
      val top = ev.agg(max(hour).as("top"))
      val hb = ev.crossJoin(broadcast(top))
        .groupBy(col("event_type"), (col("top") - hour).as("age_h"))
        .agg(count(lit(1)).as("c"))
      val term = col("c") * pow(lit(2.0), -(expr("age_h div 12").cast("double"))) *
        element_at(array(factors.map(lit): _*), (col("age_h") % 12).cast("int") + 1)
      hb.select(col("event_type"), col("age_h"), term.as("t"), col("c"))
        .groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("age_h"), col("t")))).as("terms"),
          sum(col("c")).as("n"))
        .select(col("event_type"), col("n"),
          round(aggregate(col("terms"), lit(0.0), (a, m) => a + m.getField("t")), 4)
            .as("trending"))
        .orderBy("event_type")
    },

    // Rate burst detection: hours whose event count exceeds 1.5× the
    // trailing-24-hour mean (1.5×: the uniform fixture has no true
    // bursts, so the gate sits where hour-to-hour variance trips it at
    // both verification scales) — the alerting primitive over streams.
    // The gate is pure integer CROSS-MULTIPLICATION (c · window_n >
    // 3 · window_sum, all BIGINT) — no float ever enters the comparison.
    // One groupBy + one partition-local window; a 12-hour burn-in skips
    // the undersampled head of each series.
    q("q156_burst_detection", "hours with event count > 1.5× trailing-24h mean, per type")(
      """WITH hb AS (SELECT event_type,
        |                   CAST(epoch_us(ts::TIMESTAMP) // 3600000000 AS BIGINT) AS hr,
        |                   count(*) AS c
        |            FROM events GROUP BY event_type, epoch_us(ts::TIMESTAMP) // 3600000000),
        |w AS (SELECT event_type, hr, c,
        |             CAST(sum(c) OVER tw AS BIGINT) AS tsum,
        |             CAST(count(*) OVER tw AS BIGINT) AS tn
        |      FROM hb
        |      WINDOW tw AS (PARTITION BY event_type ORDER BY hr
        |                    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, hr, CAST(c AS BIGINT) AS c, tsum, tn
        |FROM w WHERE tn >= 12 AND c * tn * 2 > 3 * tsum
        |ORDER BY event_type, hr""".stripMargin
    ) { (s, dir) =>
      val hour = (unix_micros(col("ts")) / lit(3600000000L)).cast("long")
      val tw = Window.partitionBy("event_type").orderBy("hr").rowsBetween(-24, -1)
      Tables(s, dir, "events")
        .groupBy(col("event_type"), hour.as("hr"))
        .agg(count(lit(1)).as("c"))
        .withColumn("tsum", sum(col("c")).over(tw))
        .withColumn("tn", count(lit(1)).over(tw))
        .filter(col("tn") >= 12 && col("c") * col("tn") * 2 > col("tsum") * 3)
        .select(col("event_type"), col("hr"), col("c"), col("tsum"), col("tn"))
        .orderBy("event_type", "hr")
    },

    // Top user-flow paths: the most common 3-event sequences within a
    // 1-hour step gap — the Sankey/user-journey staple. Two lead() windows
    // over the user timeline emit each consecutive triple (path mining
    // without a self-join — an event participates in ≤3 triples), a gap
    // guard keeps only within-session steps, one partial-aggregated
    // groupBy counts. q141's Markov matrix generalized one step deeper.
    q("q157_top_paths", "top-20 within-hour 3-event user paths")(
      """WITH tl AS (
        |  SELECT user_id, event_type AS e1, epoch_us(ts::TIMESTAMP) AS t1,
        |         lead(event_type) OVER w AS e2,
        |         lead(epoch_us(ts::TIMESTAMP)) OVER w AS t2,
        |         lead(event_type, 2) OVER w AS e3,
        |         lead(epoch_us(ts::TIMESTAMP), 2) OVER w AS t3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT e1 || '>' || e2 || '>' || e3 AS path, CAST(count(*) AS BIGINT) AS n
        |FROM tl
        |WHERE e3 IS NOT NULL AND t2 - t1 <= 3600000000 AND t3 - t2 <= 3600000000
        |GROUP BY path ORDER BY n DESC, path LIMIT 20""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val t = us(col("ts"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_type").as("e1"), t.as("t1"),
          lead(col("event_type"), 1).over(w).as("e2"), lead(t, 1).over(w).as("t2"),
          lead(col("event_type"), 2).over(w).as("e3"), lead(t, 2).over(w).as("t3"))
        .filter(col("e3").isNotNull &&
          col("t2") - col("t1") <= 3600000000L && col("t3") - col("t2") <= 3600000000L)
        .select(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path")).limit(20)
    },

    // Seasonal-baseline anomaly gate — q156's trailing-mean cousin with a
    // SEASONALITY-AWARE baseline: each (type, hour) cell compares against
    // the mean of the SAME hour-of-day on all OTHER days (leave-one-out,
    // so a cell never inflates its own baseline). The gate stays pure
    // integer cross-multiplication: c·(n−1)·2 > 3·(S−c) ⟺ c > 1.5× the
    // other-days mean. Two partial-aggregated groupBys + one equi-join on
    // the (type, hod) baseline key — 120 baseline rows broadcast at any
    // scale.
    q("q158_seasonal_anomaly", "hours exceeding 1.5× their hour-of-day baseline (leave-one-out)")(
      """WITH hb AS (SELECT event_type,
        |                   CAST(epoch_us(ts::TIMESTAMP) // 3600000000 AS BIGINT) AS hr,
        |                   count(*) AS c
        |            FROM events GROUP BY event_type, epoch_us(ts::TIMESTAMP) // 3600000000),
        |hod AS (SELECT event_type, hr, c, hr % 24 AS hod FROM hb),
        |base AS (SELECT event_type, hod, CAST(sum(c) AS BIGINT) AS s,
        |                CAST(count(*) AS BIGINT) AS n
        |         FROM hod GROUP BY event_type, hod)
        |SELECT h.event_type, h.hr, CAST(h.c AS BIGINT) AS c,
        |       b.s - h.c AS other_sum, b.n - 1 AS other_n
        |FROM hod h JOIN base b USING (event_type, hod)
        |WHERE b.n >= 8 AND h.c * (b.n - 1) * 2 > 3 * (b.s - h.c)
        |ORDER BY h.event_type, h.hr""".stripMargin
    ) { (s, dir) =>
      val hour = (unix_micros(col("ts")) / lit(3600000000L)).cast("long")
      val hb = Tables(s, dir, "events")
        .groupBy(col("event_type"), hour.as("hr"))
        .agg(count(lit(1)).as("c"))
        .withColumn("hod", col("hr") % 24)
      val base = hb.groupBy("event_type", "hod")
        .agg(sum(col("c")).as("s"), count(lit(1)).as("n"))
      hb.join(broadcast(base), Seq("event_type", "hod"))
        .filter(col("n") >= 8 &&
          col("c") * (col("n") - 1) * 2 > (col("s") - col("c")) * 3)
        .select(col("event_type"), col("hr"), col("c"),
          (col("s") - col("c")).as("other_sum"), (col("n") - 1).as("other_n"))
        .orderBy("event_type", "hr")
    },

    // Deterministic weighted-bootstrap confidence intervals — error bars
    // for a per-group metric WITHOUT resampling shuffles: 16 replicas,
    // each reweighting every row by a DETERMINISTIC integer weight 0-3
    // hashed from (event_id, replica) — the distributed random-weighting
    // bootstrap (the Poisson-bootstrap shape with a portable hash in
    // place of RNG state, so reruns and both engines agree exactly).
    // Each replica mean = one DECIMAL-exact weighted sum / BIGINT weight
    // sum (single double division); the CI is rank selection (2nd/15th of
    // the 16 sorted replica means). Cost: a ×16 row-local fan-out into a
    // partial-aggregated groupBy on (type, replica) — 80 output cells —
    // never a per-replica pass over the data.
    q("q171_bootstrap_ci",
      "16-replica deterministic weighted-bootstrap CI for the per-type mean value")(
      s"""WITH b AS (SELECT event_type, value, event_id,
         |                  unnest(generate_series(0, 15)) AS rep FROM events),
         |w AS (SELECT event_type, rep, value,
         |             ${md5LongSql("CAST(event_id AS VARCHAR) || ':' || CAST(rep AS VARCHAR)")} % 4 AS wt
         |      FROM b),
         |m AS (SELECT event_type, rep,
         |             CAST(sum(wt * CAST(round(value, 4) AS DECIMAL(28,4))) AS DOUBLE)
         |               / CAST(CAST(sum(wt) AS BIGINT) AS DOUBLE) AS mu
         |      FROM w GROUP BY event_type, rep),
         |a AS (SELECT event_type, list_sort(list(mu)) AS mus FROM m GROUP BY event_type)
         |SELECT event_type, round(mus[2], 4) AS ci_lo, round(mus[15], 4) AS ci_hi
         |FROM a ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      import graft.functions.PortableHash.md5Long
      val reps = Tables(s, dir, "events")
        .select(col("event_type"), col("value"), col("event_id"),
          explode(sequence(lit(0), lit(15))).as("rep"))
        .withColumn("wt", md5Long(concat(col("event_id").cast("string"),
          lit(":"), col("rep").cast("string"))) % 4)
      val mus = reps.groupBy("event_type", "rep")
        .agg((sum(col("wt") * round(col("value"), 4)
            .cast(org.apache.spark.sql.types.DecimalType(28, 4))).cast("double")
          / sum(col("wt")).cast("double")).as("mu"))
      mus.groupBy("event_type")
        .agg(sort_array(collect_list(col("mu"))).as("mus"))
        .select(col("event_type"),
          round(element_at(col("mus"), 2), 4).as("ci_lo"),
          round(element_at(col("mus"), 15), 4).as("ci_hi"))
        .orderBy("event_type")
    },

    // Mergeable distinct-count sketches — the piece q185's incremental
    // maintenance can NOT do with plain aggregates: COUNT DISTINCT does not
    // merge, but bottom-k (KMV) sketches do, EXACTLY: the k smallest
    // distinct hashes of a union are drawn from the cells' own bottom-k
    // lists, so per-(type, hour) sketches roll up to per-type estimates by
    // union+trim WITHOUT touching raw rows again — at 100 TB you persist
    // the hourly sketch table (k longs per cell) and answer any coarser-
    // grained distinct-user question from sketch merges alone. Round-11
    // conversion from the HLL rows-only row: because the closure law makes
    // hourly-then-merged == direct-from-raw, DuckDB reproduces the merged
    // sketch with a direct ORDER BY h LIMIT k — the full hash compare IS
    // the mergeability proof, cell for cell (k=128 to keep the row distinct
    // from q190's direct k=64 sketch). The native HLL union law
    // (hll_union_agg == direct, exactly) stays pinned in
    // ApproxAndRecallSpec alongside this row's KMV merge law.
    q("q187_kmv_rollup",
      "per-hour KMV bottom-128 user sketches merged to event_type distinct estimates (closure law hash-verified)")(
      s"""WITH h AS (SELECT DISTINCT event_type,
         |                  ${md5LongSql("'u:' || user_id")} AS h FROM events),
         |r AS (SELECT event_type, h,
         |             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         |             count(*) OVER (PARTITION BY event_type) AS nd
         |      FROM h),
         |g AS (SELECT event_type, max(nd) AS nd,
         |             max(CASE WHEN rn = 128 THEN h END) AS h128
         |      FROM r GROUP BY event_type),
         |hrs AS (SELECT event_type,
         |               count(DISTINCT date_trunc('hour', ts::TIMESTAMP)) AS n_hourly_sketches
         |        FROM events GROUP BY event_type)
         |SELECT g.event_type, CAST(hrs.n_hourly_sketches AS BIGINT) AS n_hourly_sketches,
         |       ${kmvEstimateSql("nd", "h128", 128)} AS est_users
         |FROM g JOIN hrs ON g.event_type = hrs.event_type
         |ORDER BY g.event_type""".stripMargin
    ) { (s, dir) =>
      val kmv = udaf(new graft.functions.KmvAggregator(128))
      val kmvMerge = udaf(new graft.functions.KmvMergeAggregator(128))
      val hourly = Tables(s, dir, "events")
        .select(col("event_type"), date_trunc("hour", col("ts")).as("hr"),
          md5Long(concat(lit("u:"), col("user_id").cast("string"))).as("h"))
        .groupBy("event_type", "hr")
        .agg(kmv(col("h")).as("sk")) // the persisted hourly sketch table
      hourly.groupBy("event_type")
        .agg(count(lit(1)).as("n_hourly_sketches"),
          kmvMerge(col("sk")).as("m"))
        .select(col("event_type"), col("n_hourly_sketches"),
          expr(kmvEstimateSql("size(m)", "element_at(m, 128)", 128)).as("est_users"))
        .orderBy("event_type")
    },

    // KMV (k-minimum-values) distinct sketch — the ORACLE-CHECKABLE sibling
    // of q187's hourly rollup: the k smallest distinct portable hashes are pure set
    // arithmetic (order- and merge-free), so DuckDB reproduces the sketch
    // — and therefore the estimate — bit-for-bit with ORDER BY h LIMIT k,
    // and the full hash compare applies where HLL had to settle for
    // rows-only. Estimator (Beyer et al. 2007): |D| ≈ (k−1)·2⁶⁰/h_k;
    // under k distinct values the sketch IS the set (exact branch — live
    // at sf0.001 where each type has 15 users). All arithmetic is integer
    // or fixed-shape double division (IEEE-identical cross-engine). Scale:
    // O(k) state per group on both sides of the shuffle, like MinHash.
    q("q190_kmv_sketch",
      "KMV bottom-64 distinct-user sketch per event_type, estimator vs exact branch")(
      s"""WITH h AS (SELECT DISTINCT event_type,
         |                  ${md5LongSql("'u:' || user_id")} AS h FROM events),
         |r AS (SELECT event_type, h,
         |             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         |             count(*) OVER (PARTITION BY event_type) AS nd
         |      FROM h),
         |g AS (SELECT event_type, max(nd) AS nd,
         |             max(CASE WHEN rn = 64 THEN h END) AS h64
         |      FROM r GROUP BY event_type)
         |SELECT event_type, CAST(least(nd, 64) AS BIGINT) AS n_sketch,
         |       ${kmvEstimateSql("nd", "h64", 64)} AS est_users
         |FROM g ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      import graft.functions.PortableHash.md5Long
      val kmv = udaf(new graft.functions.KmvAggregator(64))
      Tables(s, dir, "events")
        .select(col("event_type"),
          md5Long(concat(lit("u:"), col("user_id").cast("string"))).as("h"))
        .groupBy("event_type").agg(kmv(col("h")).as("mins"))
        .select(col("event_type"),
          size(col("mins")).cast("long").as("n_sketch"),
          expr(kmvEstimateSql("size(mins)", "element_at(mins, 64)", 64))
            .as("est_users"))
        .orderBy("event_type")
    },

    // KMV intersection — the set operation HLL cannot estimate without
    // inclusion–exclusion blowup (Beyer et al. §4): take the bottom-k L of
    // A ∪ B (merge the two sketches, trim to k); ρ = |L ∩ A ∩ B| gives
    // Jaccard ≈ ρ/min(k,|L|) and |A∩B| ≈ that ratio · |A∪B|-est (the min
    // keeps the small-|L| regime exact instead of biased low). After the two
    // O(k) sketches is array arithmetic over 64-element lists on a 1-row
    // frame — at 100 TB the sketches come off the q190 aggregation and the
    // intersection math costs nothing. Integer milli-Jaccard and floored
    // estimates keep the compare exact.
    q("q190b_kmv_intersection",
      "KMV sketch intersection: even-id click users ∩ 3divisible-id view users")(
      s"""WITH h AS (SELECT DISTINCT event_type, ${md5LongSql("'u:' || user_id")} AS h
         |           FROM events
         |           WHERE (event_type = 'click' AND user_id % 2 = 0)
         |              OR (event_type = 'view' AND user_id % 3 = 0)),
         |a AS (SELECT h FROM h WHERE event_type = 'click' ORDER BY h LIMIT 64),
         |b AS (SELECT h FROM h WHERE event_type = 'view' ORDER BY h LIMIT 64),
         |u AS (SELECT DISTINCT h FROM ((SELECT h FROM a) UNION (SELECT h FROM b))
         |      ORDER BY h LIMIT 64),
         |st AS (SELECT (SELECT count(*) FROM u) AS nl,
         |              (SELECT max(h) FROM u) AS hk,
         |              (SELECT count(*) FROM u
         |               WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b)) AS rho)
         |SELECT CAST(rho AS BIGINT) AS rho,
         |       CAST((rho * 1000) // greatest(least(nl, 64), 1) AS BIGINT) AS jaccard_milli,
         |       ${kmvEstimateSql("nl", "hk", 64)} AS est_union,
         |       CAST(floor(rho * ${kmvEstimateSql("nl", "hk", 64)}
         |                  / CAST(greatest(least(nl, 64), 1) AS DOUBLE)) AS BIGINT) AS est_intersection
         |FROM st""".stripMargin
    ) { (s, dir) =>
      import graft.functions.PortableHash.md5Long
      val kmv = udaf(new graft.functions.KmvAggregator(64))
      val ev = Tables(s, dir, "events")
        .filter((col("event_type") === "click" && col("user_id") % 2 === 0)
          || (col("event_type") === "view" && col("user_id") % 3 === 0))
        .select(col("event_type"),
          md5Long(concat(lit("u:"), col("user_id").cast("string"))).as("h"))
        .cache() // both sketch legs below
      // GLOBAL aggs, not groupBy+filter: an empty audience still yields one
      // row (empty sketch), matching the oracle's always-1-row scalar CTE
      val a = ev.filter(col("event_type") === "click").agg(kmv(col("h")).as("am"))
      val b = ev.filter(col("event_type") === "view").agg(kmv(col("h")).as("bm"))
      a.crossJoin(broadcast(b)) // 1-row x 1-row sketch frames
        .withColumn("l", slice(array_sort(array_union(col("am"), col("bm"))), 1, 64))
        .withColumn("nl", size(col("l")))
        .withColumn("rho", size(filter(col("l"),
          x => array_contains(col("am"), x) && array_contains(col("bm"), x))))
        .withColumn("uest", expr(kmvEstimateSql("nl", "element_at(l, 64)", 64)))
        // Jaccard denominator is the LIVE union-sketch size least(nl, k), not
        // the fixed k: when the union has nl < k elements L is the exact
        // union and rho the exact intersection, so dividing by k would
        // systematically understate exactly where the sketch is exact
        // (ADVICE r5). greatest(...,1) guards the empty-audience row (rho=0
        // there, so the ratio is 0 either way, in both engines).
        .select(col("rho").cast("long").as("rho"),
          expr("CAST((rho * 1000) div greatest(least(nl, 64), 1) AS BIGINT)")
            .as("jaccard_milli"),
          col("uest").as("est_union"),
          expr("CAST(floor(rho * uest / CAST(greatest(least(nl, 64), 1) AS DOUBLE)) AS BIGINT)")
            .as("est_intersection"))
    },

    // KMV set DIFFERENCE — closes the sketch set algebra (q190 cardinality,
    // q190b intersection, this one A\B and B\A): the bottom-k L of A ∪ B
    // partitions exactly into (A-only, B-only, both) because every element
    // of L came from one of the two sketches, so the three disjoint counts
    // scale by the same est_union/|L| factor the intersection used — one
    // merged sketch answers all three set operations without re-reading a
    // single raw row. Audiences deliberately differ (even-id clickers vs
    // 5-divisible purchasers) so both differences are non-trivial. Same
    // 1-row × 1-row broadcast shape as q190b: at 100 TB the cost is the two
    // O(k) partial aggregations; the set algebra is array arithmetic on 64
    // longs.
    q("q190c_kmv_difference",
      "KMV sketch difference: even-id click users vs 5divisible-id purchase users, A\\B + B\\A + A∩B from one merged sketch")(
      s"""WITH h AS (SELECT DISTINCT event_type, ${md5LongSql("'u:' || user_id")} AS h
         |           FROM events
         |           WHERE (event_type = 'click' AND user_id % 2 = 0)
         |              OR (event_type = 'purchase' AND user_id % 5 = 0)),
         |a AS (SELECT h FROM h WHERE event_type = 'click' ORDER BY h LIMIT 64),
         |b AS (SELECT h FROM h WHERE event_type = 'purchase' ORDER BY h LIMIT 64),
         |u AS (SELECT DISTINCT h FROM ((SELECT h FROM a) UNION (SELECT h FROM b))
         |      ORDER BY h LIMIT 64),
         |st AS (SELECT (SELECT count(*) FROM u) AS nl,
         |              (SELECT max(h) FROM u) AS hk,
         |              (SELECT count(*) FROM u
         |               WHERE h IN (SELECT h FROM a) AND h NOT IN (SELECT h FROM b)) AS da,
         |              (SELECT count(*) FROM u
         |               WHERE h IN (SELECT h FROM b) AND h NOT IN (SELECT h FROM a)) AS db,
         |              (SELECT count(*) FROM u
         |               WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b)) AS rho)
         |SELECT CAST(da AS BIGINT) AS da, CAST(db AS BIGINT) AS db,
         |       CAST(rho AS BIGINT) AS rho,
         |       ${kmvEstimateSql("nl", "hk", 64)} AS est_union,
         |       CAST(floor(da * ${kmvEstimateSql("nl", "hk", 64)}
         |                  / CAST(greatest(least(nl, 64), 1) AS DOUBLE)) AS BIGINT) AS est_a_only,
         |       CAST(floor(db * ${kmvEstimateSql("nl", "hk", 64)}
         |                  / CAST(greatest(least(nl, 64), 1) AS DOUBLE)) AS BIGINT) AS est_b_only
         |FROM st""".stripMargin
    ) { (s, dir) =>
      import graft.functions.PortableHash.md5Long
      val kmv = udaf(new graft.functions.KmvAggregator(64))
      val ev = Tables(s, dir, "events")
        .filter((col("event_type") === "click" && col("user_id") % 2 === 0)
          || (col("event_type") === "purchase" && col("user_id") % 5 === 0))
        .select(col("event_type"),
          md5Long(concat(lit("u:"), col("user_id").cast("string"))).as("h"))
        .cache() // both sketch legs below
      // GLOBAL aggs (q190b): an empty audience still yields one empty-sketch row
      val a = ev.filter(col("event_type") === "click").agg(kmv(col("h")).as("am"))
      val b = ev.filter(col("event_type") === "purchase").agg(kmv(col("h")).as("bm"))
      a.crossJoin(broadcast(b)) // 1-row x 1-row sketch frames
        .withColumn("l", slice(array_sort(array_union(col("am"), col("bm"))), 1, 64))
        .withColumn("nl", size(col("l")))
        .withColumn("da", size(filter(col("l"),
          x => array_contains(col("am"), x) && !array_contains(col("bm"), x))))
        .withColumn("db", size(filter(col("l"),
          x => array_contains(col("bm"), x) && !array_contains(col("am"), x))))
        .withColumn("rho", size(filter(col("l"),
          x => array_contains(col("am"), x) && array_contains(col("bm"), x))))
        .withColumn("uest", expr(kmvEstimateSql("nl", "element_at(l, 64)", 64)))
        .select(col("da").cast("long").as("da"), col("db").cast("long").as("db"),
          col("rho").cast("long").as("rho"),
          col("uest").as("est_union"),
          expr("CAST(floor(da * uest / CAST(greatest(least(nl, 64), 1) AS DOUBLE)) AS BIGINT)")
            .as("est_a_only"),
          expr("CAST(floor(db * uest / CAST(greatest(least(nl, 64), 1) AS DOUBLE)) AS BIGINT)")
            .as("est_b_only"))
    },

    // Mergeable histogram quantiles — the quantile member of the sketch
    // algebra family (q185 algebraic, q187/q190 distinct, q188 frequency):
    // fixed unit-width integer bins count per (type, hour) — the persisted
    // sketch table — then roll up to per-type histograms by SUMMING BINS
    // (pure algebraic merge) and read p50/p90/p99 as the smallest bin
    // whose cumulative count reaches the integer-cross-multiplied rank
    // threshold. Resolution is the bin width (here 1.0 ⇒ the reported
    // value floors the true percentile), which is the explicit, verifiable
    // trade GK/t-digest make opaquely — and unlike those, every number
    // here hash-matches the oracle. Scale: the sketch table is
    // |types|·|hours|·|bins| rows regardless of event volume; the rollup
    // and cumulative pass are per-type partitioned.
    q("q194_histogram_quantiles",
      "per-(type,hour) unit-bin histograms merged to per-type p50/p90/p99 (bin-resolution exact)")(
      """WITH hb AS (SELECT event_type,
        |                   make_timestamp((CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 3600)
        |                                  * 3600 * 1000000) AS hr,
        |                   CAST(floor(value) AS BIGINT) AS bin, count(*) AS c
        |            FROM events GROUP BY event_type, hr, bin),
        |m AS (SELECT event_type, bin, sum(c) AS c FROM hb GROUP BY event_type, bin),
        |cum AS (SELECT event_type, bin, c,
        |               sum(c) OVER (PARTITION BY event_type ORDER BY bin
        |                            ROWS UNBOUNDED PRECEDING) AS cc,
        |               sum(c) OVER (PARTITION BY event_type) AS n
        |        FROM m)
        |SELECT event_type,
        |       CAST(min(CASE WHEN cc * 100 >= n * 50 THEN bin END) AS BIGINT) AS p50_bin,
        |       CAST(min(CASE WHEN cc * 100 >= n * 90 THEN bin END) AS BIGINT) AS p90_bin,
        |       CAST(min(CASE WHEN cc * 100 >= n * 99 THEN bin END) AS BIGINT) AS p99_bin,
        |       CAST(max(n) AS BIGINT) AS n
        |FROM cum GROUP BY event_type ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      val hourly = Tables(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"),
          floor(col("value")).cast("long").as("bin"))
        .agg(count(lit(1)).as("c")) // the persisted sketch table
      val merged = hourly.groupBy("event_type", "bin").agg(sum(col("c")).as("c"))
      val wCum = Window.partitionBy("event_type").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("event_type")
      merged
        .withColumn("cc", sum(col("c")).over(wCum))
        .withColumn("n", sum(col("c")).over(wAll))
        .groupBy("event_type")
        .agg(min(when(col("cc") * 100 >= col("n") * 50, col("bin"))).as("p50_bin"),
          min(when(col("cc") * 100 >= col("n") * 90, col("bin"))).as("p90_bin"),
          min(when(col("cc") * 100 >= col("n") * 99, col("bin"))).as("p99_bin"),
          max(col("n")).as("n"))
        .orderBy("event_type")
    },

    // Per-group closed-form OLS — the trend-per-key operator (chars-per-
    // token slope by language): slope = (nΣxy − ΣxΣy)/(nΣxx − Σx²) off
    // FIVE integer partial-aggregated sums in ONE grouped scan — the
    // canonical "fit millions of tiny models with zero extra passes"
    // shape (map-side combine carries 5 longs per (partition, group)).
    // All moments and the milli-scaled slope/intercept are integer
    // arithmetic with truncating div, so every group row hash-matches.
    q("q202_grouped_ols",
      "per-lang OLS chars-on-tokens: slope/intercept (milli) from one pass of integer moments")(
      """WITH d AS (SELECT lang, len(str_split(text, ' ')) AS x, n_chars AS y FROM documents),
        |g AS (SELECT lang, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |             sum(x*y) AS sxy, sum(x*x) AS sxx FROM d GROUP BY lang)
        |SELECT lang, CAST(n AS BIGINT) AS n,
        |       CAST((1000*(n*sxy - sx*sy)) // (n*sxx - sx*sx) AS BIGINT) AS slope_milli,
        |       CAST((1000*sy - ((1000*(n*sxy - sx*sy)) // (n*sxx - sx*sx)) * sx) // n AS BIGINT) AS icept_milli
        |FROM g ORDER BY lang""".stripMargin
    ) { (s, dir) =>
      Tables.fanout(s, dir, "documents")
        .select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("x"),
          col("n_chars").as("y"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        .select(col("lang"), col("n"),
          expr("CAST((1000*(n*sxy - sx*sy)) div (n*sxx - sx*sx) AS BIGINT)").as("slope_milli"),
          expr("CAST((1000*sy - ((1000*(n*sxy - sx*sy)) div (n*sxx - sx*sx)) * sx) div n AS BIGINT)")
            .as("icept_milli"))
        .orderBy("lang")
    },

    // Robust per-group outlier detection via MAD (median absolute
    // deviation) — the resistant twin of q97's mean/stddev z-score (one
    // gross outlier corrupts a mean; the median/MAD pair shrugs it off).
    // Exactness discipline: values quantize to integer centi-units via
    // floor (floor is bit-identical cross-engine; round-half is not), and
    // every median is interpolated over INTEGERS — both engines compute
    // (a+b)/2 of int64-range integers, exact in doubles — so med is a
    // half-integer, |v−med| a half-integer, MAD a quarter-integer, and the
    // 4× / 2× scalings published below are EXACT BIGINTs (no display
    // rounding of .25/.5 values, where engine half-rounding rules would
    // diverge). The outlier test |v−med| > 3·MAD compares exact dyadic
    // doubles. Scale shape: two grouped medians + two equi-joins against
    // the |groups|-bounded med/MAD frames (broadcast). Exact grouped
    // median buffers one group's values per task — fine while per-group
    // cardinality is memory-bounded; at unbounded cardinality swap in the
    // mergeable-sketch quantiles (q41b GK / q194 histogram), same shape.
    q("q205_mad_outliers",
      "per-type robust outliers: |v - median| > 3*MAD in exact integer centi-units")(
      """WITH x AS (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v FROM events),
        |med AS (SELECT event_type, median(v) AS med FROM x GROUP BY event_type),
        |dev AS (SELECT x.event_type, x.v, abs(x.v - m.med) AS ad
        |        FROM x JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, median(ad) AS mad FROM dev GROUP BY event_type)
        |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(2 * min(me.med) AS BIGINT) AS med2,
        |       CAST(4 * min(ma.mad) AS BIGINT) AS mad4,
        |       CAST(sum(CASE WHEN d.ad > 3 * ma.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       CAST(max(CASE WHEN d.ad > 3 * ma.mad THEN d.v END) AS BIGINT) AS worst_v
        |FROM dev d JOIN mad ma USING (event_type) JOIN med me USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin
    ) { (s, dir) =>
      val x = Tables.fanout(s, dir, "events")
        .select(col("event_type"), floor(col("value") * 100).cast("long").as("v"))
        .cache() // median pass + deviation pass
      val med = x.groupBy("event_type").agg(median(col("v")).as("med"))
      val dev = x.join(broadcast(med), "event_type")
        .select(col("event_type"), col("v"), abs(col("v") - col("med")).as("ad"))
        .cache() // MAD pass + final scan
      val mad = dev.groupBy("event_type").agg(median(col("ad")).as("mad"))
      dev.join(broadcast(mad), "event_type").join(broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          (lit(2) * min(col("med"))).cast("long").as("med2"),
          (lit(4) * min(col("mad"))).cast("long").as("mad4"),
          sum(when(col("ad") > lit(3) * col("mad"), 1L).otherwise(0L)).as("n_outliers"),
          max(when(col("ad") > lit(3) * col("mad"), col("v"))).as("worst_v"))
        .orderBy("event_type")
    },

    // Approximate query processing by deterministic sampling — the
    // remaining approximation class next to the sketch family (KMV/HLL
    // estimate distincts, GK/histograms quantiles, MG heavy hitters; this
    // estimates plain GROUP-BY counts from a 10% sample WITH an error
    // bound). The sample is a HASH of the row key (md5 % 10 = 0), so it is
    // rerun- and engine-stable, stratification-free, and at 100 TB it is a
    // materialized 1/10th table the estimator scans INSTEAD of the fact
    // scan — the query-time win is the point (this demo derives both sides
    // inline to let the oracle verify the math). est = 10·n_s; the 99% CI
    // half-width 2.576·√(90·n_s) comes from Var(10·Binomial(N, .1)) ≈
    // 90·n_s — floor'd to BIGINT, all IEEE ops in one fixed shape so both
    // engines agree bit-for-bit; `within_ci` SHOWS the bound holding
    // against the exact count on every stratum.
    q("q209_aqp_sample_agg",
      "approximate group counts from a 10% hash sample with exact-checked 99% CI")(
      s"""WITH s AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
         |                  ${md5LongSql("CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)")} % 10 AS smp
         |           FROM lineitem),
         |tru AS (SELECT rf, ls, CAST(count(*) AS BIGINT) AS true_cnt FROM s GROUP BY rf, ls),
         |est AS (SELECT rf, ls, CAST(count(*) AS BIGINT) AS n_s,
         |               CAST(10 * count(*) AS BIGINT) AS est_cnt
         |        FROM s WHERE smp = 0 GROUP BY rf, ls)
         |SELECT t.rf, t.ls, e.n_s, e.est_cnt, t.true_cnt,
         |       CAST(1000 * abs(e.est_cnt - t.true_cnt) // t.true_cnt AS BIGINT) AS err_milli,
         |       CAST(floor(2.576 * sqrt(90.0 * e.n_s)) AS BIGINT) AS ci99,
         |       abs(e.est_cnt - t.true_cnt) <= CAST(floor(2.576 * sqrt(90.0 * e.n_s)) AS BIGINT) AS within_ci
         |FROM tru t JOIN est e USING (rf, ls)
         |ORDER BY rf, ls""".stripMargin
    ) { (s, dir) =>
      val base = Tables.fanout(s, dir, "lineitem")
        .select(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
          (md5Long(concat(col("l_orderkey").cast("string"), lit(":"),
            col("l_linenumber").cast("string"))) % 10).as("smp"))
        .cache() // exact pass + sample pass
      val tru = base.groupBy("rf", "ls").agg(count(lit(1)).as("true_cnt"))
      val est = base.filter(col("smp") === 0).groupBy("rf", "ls")
        .agg(count(lit(1)).as("n_s"), (lit(10) * count(lit(1))).as("est_cnt"))
      val ci = floor(lit(2.576) * sqrt(lit(90.0) * col("n_s"))).cast("long")
      tru.join(est, Seq("rf", "ls"))
        .select(col("rf"), col("ls"), col("n_s"), col("est_cnt"), col("true_cnt"),
          expr("CAST(1000 * abs(est_cnt - true_cnt) div true_cnt AS BIGINT)").as("err_milli"),
          ci.as("ci99"),
          (abs(col("est_cnt") - col("true_cnt")) <= ci).as("within_ci"))
        .orderBy("rf", "ls")
    },

    // Population-stability-index drift report — the monitoring primitive a
    // 100 TB feature pipeline runs between every two snapshots: per series,
    // bin the value distribution (10 fixed-width bins, top bin open), split
    // the population into reference/current halves (deterministic
    // event_id parity here; in production: yesterday vs today), and report
    // PSI = Σ_b (p_cur − p_ref)·ln(p_cur/p_ref) with +1 Laplace smoothing
    // so empty bins stay finite. Every probability is a ratio of exact
    // BIGINT counts, and the 10-term sum runs through an ORDERED list fold
    // (q143's discipline) so both engines add the same doubles in the same
    // order. Shape: one grouped count + a 10-row-per-series bin spine —
    // map-side explode, no product, no global window.
    q("q229_psi_drift", "PSI distribution drift per event_type between event_id-parity halves")(
      """WITH e AS (SELECT event_type, event_id % 2 AS side,
        |                  least(CAST(floor(value / 50) AS BIGINT), 9) AS bin
        |           FROM events),
        |c AS (SELECT event_type, side, bin, count(*) AS k
        |      FROM e GROUP BY event_type, side, bin),
        |t AS (SELECT event_type, unnest(generate_series(0, 9)) AS bin
        |      FROM (SELECT DISTINCT event_type FROM e)),
        |f AS (SELECT t.event_type, t.bin,
        |             coalesce(rr.k, 0) + 1 AS kr, coalesce(u.k, 0) + 1 AS kc
        |      FROM t LEFT JOIN (SELECT event_type, bin, k FROM c WHERE side = 0) rr
        |             ON rr.event_type = t.event_type AND rr.bin = t.bin
        |           LEFT JOIN (SELECT event_type, bin, k FROM c WHERE side = 1) u
        |             ON u.event_type = t.event_type AND u.bin = t.bin),
        |g AS (SELECT event_type, CAST(sum(kr) AS BIGINT) AS nr,
        |             CAST(sum(kc) AS BIGINT) AS nc
        |      FROM f GROUP BY event_type),
        |tm AS (SELECT f.event_type, f.bin, g.nr, g.nc,
        |              (CAST(kc AS DOUBLE) / nc - CAST(kr AS DOUBLE) / nr)
        |              * ln((CAST(kc AS DOUBLE) / nc) / (CAST(kr AS DOUBLE) / nr)) AS term
        |       FROM f JOIN g ON g.event_type = f.event_type)
        |SELECT event_type, CAST(nr - 10 AS BIGINT) AS n_ref, CAST(nc - 10 AS BIGINT) AS n_cur,
        |       round(list_reduce(list(term ORDER BY bin), (a, b) -> a + b), 6) AS psi
        |FROM tm GROUP BY event_type, nr, nc ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "events").select(col("event_type"),
        (col("event_id") % 2).as("side"),
        least(floor(col("value") / 50).cast("long"), lit(9L)).as("bin"))
      val c = e.groupBy("event_type", "side", "bin").agg(count(lit(1)).as("k"))
      val t = e.select("event_type").distinct()
        .select(col("event_type"), explode(sequence(lit(0L), lit(9L))).as("bin"))
      def sideCounts(sd: Int, as: String) = c.filter(col("side") === sd)
        .select(col("event_type"), col("bin"), col("k").as(as))
      val f = t.join(sideCounts(0, "rk"), Seq("event_type", "bin"), "left")
        .join(sideCounts(1, "ck"), Seq("event_type", "bin"), "left")
        .select(col("event_type"), col("bin"),
          (coalesce(col("rk"), lit(0L)) + 1).as("kr"),
          (coalesce(col("ck"), lit(0L)) + 1).as("kc"))
      val g = f.groupBy("event_type").agg(sum(col("kr")).as("nr"), sum(col("kc")).as("nc"))
      f.join(g, Seq("event_type"))
        .select(col("event_type"), col("bin"), col("nr"), col("nc"),
          ((col("kc").cast("double") / col("nc") - col("kr").cast("double") / col("nr"))
            * log((col("kc").cast("double") / col("nc"))
              / (col("kr").cast("double") / col("nr")))).as("term"))
        .groupBy("event_type", "nr", "nc")
        .agg(sort_array(collect_list(struct(col("bin"), col("term")))).as("tms"))
        .select(col("event_type"), (col("nr") - 10).as("n_ref"), (col("nc") - 10).as("n_cur"),
          round(aggregate(col("tms"), lit(0.0), (a, m) => a + m.getField("term")), 6).as("psi"))
        .orderBy("event_type")
    },

    // Holt double-exponential smoothing (level + trend, α=β=1/2) over the
    // zero-filled hourly series — the fixed-step forecaster that q98's
    // resample feeds. The recurrence is EXACT integer milli-units with
    // toward-zero halving (Spark `(c - c%2) >> 1` on evens ≡ DuckDB `//`,
    // both truncate toward zero — q197's verified discipline), so the
    // 720-step fold produces identical BIGINTs in both engines — no float
    // drift across 720 iterations, the thing that makes naive smoothing
    // oracles flap. Spark shape: ONE grouped sorted-array fold per series
    // (codegen'd higher-order aggregate, no 720-round join chain);
    // the oracle replays the same recurrence as a recursive CTE. Series
    // length is bounded by the time span (720 h), never by row count — at
    // 100 TB the pre-aggregation to hourly counts is the only wide op.
    q("q230_holt_forecast", "Holt level+trend (α=β=1/2) over zero-filled hourly counts, integer-exact")(
      """WITH RECURSIVE b AS (
        |  SELECT event_type, (CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 3600) AS hb,
        |         count(*) AS y
        |  FROM events GROUP BY event_type, hb),
        |rr AS (SELECT CAST(min(hb) AS BIGINT) AS lo, CAST(max(hb) AS BIGINT) AS hi FROM b),
        |spine AS (SELECT t.event_type, g.hb
        |          FROM (SELECT DISTINCT event_type FROM b) t
        |          CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM rr), (SELECT hi FROM rr))) AS hb) g),
        |s AS (SELECT spine.event_type,
        |             spine.hb - (SELECT lo FROM rr) + 1 AS idx,
        |             coalesce(b.y, 0) AS y
        |      FROM spine LEFT JOIN b ON b.event_type = spine.event_type AND b.hb = spine.hb),
        |h AS (
        |  SELECT event_type, idx, y * 1000 AS l, CAST(0 AS BIGINT) AS tr
        |  FROM s WHERE idx = 1
        |  UNION ALL
        |  SELECT n.event_type, n.idx,
        |         (n.y * 1000 + h.l + h.tr) // 2,
        |         (((n.y * 1000 + h.l + h.tr) // 2) - h.l + h.tr) // 2
        |  FROM h JOIN s n ON n.event_type = h.event_type AND n.idx = h.idx + 1)
        |SELECT event_type,
        |       CAST((SELECT hi - lo + 1 FROM rr) AS BIGINT) AS n_hours,
        |       CAST(l AS BIGINT) AS level_milli, CAST(tr AS BIGINT) AS trend_milli,
        |       CAST(l + tr AS BIGINT) AS forecast_milli
        |FROM h WHERE idx = (SELECT hi - lo + 1 FROM rr) ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      // toward-zero halving of a Long column: strip the toward-zero
      // remainder (Java % has the dividend's sign), then shift the even
      // result — stays in integer codegen, exact for negatives
      def half(c: Column): Column = shiftright(c - (c % 2), 1)
      val b = Tables(s, dir, "events")
        .selectExpr("event_type", "cast(ts as bigint) div 3600 AS hb")
        .groupBy("event_type", "hb").agg(count(lit(1)).as("y"))
        .cache() // bounds + series list + the left join
      val bounds = b.agg(min(col("hb")).as("lo"), max(col("hb")).as("hi"))
      val spine = b.select("event_type").distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"), col("lo"), explode(sequence(col("lo"), col("hi"))).as("hb"))
      val series = spine.join(b, Seq("event_type", "hb"), "left")
        .select(col("event_type"), (col("hb") - col("lo") + 1).as("idx"),
          coalesce(col("y"), lit(0L)).as("y"))
      series.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("idx"), col("y")))).as("sy"),
          count(lit(1)).as("n_hours"))
        .select(col("event_type"), col("n_hours"),
          aggregate(
            slice(col("sy"), lit(2), size(col("sy")) - 1),
            named_struct(lit("l"), element_at(col("sy"), 1).getField("y") * 1000L,
              lit("tr"), lit(0L)),
            (acc, x) => {
              val nl = half(x.getField("y") * 1000L + acc.getField("l") + acc.getField("tr"))
              named_struct(lit("l"), nl,
                lit("tr"), half(nl - acc.getField("l") + acc.getField("tr")))
            }).as("st"))
        .select(col("event_type"), col("n_hours"),
          col("st.l").as("level_milli"), col("st.tr").as("trend_milli"),
          (col("st.l") + col("st.tr")).as("forecast_milli"))
        .orderBy("event_type")
    },

    // Weight-of-evidence / information-value feature audit — the credit-
    // scoring-lineage scorecard a feature platform computes per candidate
    // feature before training: bin the feature (10 fixed-width acctbal
    // bins), label each customer (placed ≥1 URGENT order), and per bin
    // report WOE = ln((good_b/G)/(bad_b/B)) with +1 smoothing, plus the
    // corpus IV = Σ_b (good_b/G − bad_b/B)·WOE_b through an ordered fold.
    // All ratios come from exact BIGINT counts; the label join is a
    // broadcast of distinct urgent buyers. The bin spine × 1-row totals
    // products are metadata-scale (10 rows) — allowlisted in
    // GlobalPlanGuardSpec like every other scalar-stats frame.
    q("q232_woe_iv", "weight-of-evidence + IV of acctbal bins vs urgent-buyer label")(
      """WITH urg AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        |lab AS (SELECT c_custkey,
        |               CAST(floor((c_acctbal + 1000) / 1100) AS BIGINT) AS bin,
        |               CASE WHEN c_custkey IN (SELECT o_custkey FROM urg) THEN 1 ELSE 0 END AS good
        |        FROM customer),
        |c AS (SELECT bin, CAST(sum(good) AS BIGINT) AS g,
        |             CAST(count(*) - sum(good) AS BIGINT) AS bd
        |      FROM lab GROUP BY bin),
        |t AS (SELECT unnest(generate_series(0, 9)) AS bin),
        |f AS (SELECT t.bin, coalesce(c.g, 0) + 1 AS kg, coalesce(c.bd, 0) + 1 AS kb
        |      FROM t LEFT JOIN c ON c.bin = t.bin),
        |g AS (SELECT CAST(sum(kg) AS BIGINT) AS tg, CAST(sum(kb) AS BIGINT) AS tb FROM f),
        |w AS (SELECT f.bin, kg, kb, tg, tb,
        |             ln((CAST(kg AS DOUBLE) / tg) / (CAST(kb AS DOUBLE) / tb)) AS woe,
        |             (CAST(kg AS DOUBLE) / tg - CAST(kb AS DOUBLE) / tb)
        |             * ln((CAST(kg AS DOUBLE) / tg) / (CAST(kb AS DOUBLE) / tb)) AS term
        |      FROM f CROSS JOIN g)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(kg - 1 AS BIGINT) AS n_good,
        |       CAST(kb - 1 AS BIGINT) AS n_bad, round(woe, 6) AS woe,
        |       round((SELECT list_reduce(list(term ORDER BY bin), (a, b) -> a + b) FROM w), 6) AS iv
        |FROM w ORDER BY bin""".stripMargin
    ) { (s, dir) =>
      val urg = Tables(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")).distinct()
      val lab = Tables(s, dir, "customer")
        .join(broadcast(urg), col("c_custkey") === col("o_custkey"), "left_outer")
        .select(floor((col("c_acctbal") + 1000) / 1100).cast("long").as("bin"),
          when(col("o_custkey").isNotNull, 1L).otherwise(0L).as("good"))
      val c = lab.groupBy("bin")
        .agg(sum(col("good")).as("g"), (count(lit(1)) - sum(col("good"))).as("bd"))
      val t = s.range(0, 10).toDF("bin")
      val f = t.join(c, Seq("bin"), "left")
        .select(col("bin"), (coalesce(col("g"), lit(0L)) + 1).as("kg"),
          (coalesce(col("bd"), lit(0L)) + 1).as("kb"))
        .cache() // totals + IV fold + the output rows
      val g = f.agg(sum(col("kg")).as("tg"), sum(col("kb")).as("tb"))
      val w = f.crossJoin(broadcast(g))
        .select(col("bin"), col("kg"), col("kb"),
          log((col("kg").cast("double") / col("tg"))
            / (col("kb").cast("double") / col("tb"))).as("woe"),
          ((col("kg").cast("double") / col("tg") - col("kb").cast("double") / col("tb"))
            * log((col("kg").cast("double") / col("tg"))
              / (col("kb").cast("double") / col("tb")))).as("term"))
      val iv = w.agg(sort_array(collect_list(struct(col("bin"), col("term")))).as("tms"))
        .select(round(aggregate(col("tms"), lit(0.0), (a, m) => a + m.getField("term")), 6).as("iv"))
      w.crossJoin(broadcast(iv))
        .select(col("bin"), (col("kg") - 1).as("n_good"), (col("kb") - 1).as("n_bad"),
          round(col("woe"), 6).as("woe"), col("iv"))
        .orderBy("bin")
    },

    // Lead–lag cross-correlation between two event series — "do clicks
    // lead purchases, and by how many hours?": Pearson r of (clicks_t,
    // purchases_{t+lag}) for lags 0..12 over the zero-filled hourly spine.
    // Every moment (n, Σx, Σy, Σx², Σy², Σxy) is an exact BIGINT per lag,
    // so r is one deterministic double expression per lag (q100's
    // discipline). Spark shape: the 13 lags come from a map-side explode
    // on the x series — the shifted alignment is a plain equi-join on
    // (hb+lag), never a product — then one grouped aggregation; the hour
    // spine is time-bounded (720 rows), not data-bounded.
    q("q234_lag_xcorr", "hourly click→purchase cross-correlation at lags 0..12, exact moments")(
      """WITH b AS (SELECT (CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 3600) AS hb,
        |                  event_type, count(*) AS y
        |           FROM events WHERE event_type IN ('click', 'purchase')
        |           GROUP BY hb, event_type),
        |rr AS (SELECT CAST(min(hb) AS BIGINT) AS lo, CAST(max(hb) AS BIGINT) AS hi FROM b),
        |sp AS (SELECT unnest(generate_series((SELECT lo FROM rr), (SELECT hi FROM rr))) AS hb),
        |x AS (SELECT sp.hb, coalesce(b.y, 0) AS xv
        |      FROM sp LEFT JOIN b ON b.hb = sp.hb AND b.event_type = 'click'),
        |y AS (SELECT sp.hb, coalesce(b.y, 0) AS yv
        |      FROM sp LEFT JOIN b ON b.hb = sp.hb AND b.event_type = 'purchase'),
        |p AS (SELECT l.lg, x.xv, y.yv
        |      FROM (SELECT unnest(generate_series(0, 12)) AS lg) l
        |      CROSS JOIN x JOIN y ON y.hb = x.hb + l.lg),
        |m AS (SELECT lg, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(xv) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
        |             CAST(sum(xv * xv) AS BIGINT) AS sxx, CAST(sum(yv * yv) AS BIGINT) AS syy,
        |             CAST(sum(xv * yv) AS BIGINT) AS sxy
        |      FROM p GROUP BY lg)
        |SELECT CAST(lg AS BIGINT) AS lg, n,
        |       round((n * sxy - sx * sy)
        |             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS r
        |FROM m ORDER BY lg""".stripMargin
    ) { (s, dir) =>
      val b = Tables(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .selectExpr("cast(ts as bigint) div 3600 AS hb", "event_type")
        .groupBy("hb", "event_type").agg(count(lit(1)).as("y"))
        .cache() // bounds + two spine joins
      val bounds = b.agg(min(col("hb")).as("lo"), max(col("hb")).as("hi"))
      val sp = b.select(lit(1).as("one")).limit(1)
        .crossJoin(broadcast(bounds))
        .select(explode(sequence(col("lo"), col("hi"))).as("hb"))
      def series(et: String, as: String) = sp
        .join(b.filter(col("event_type") === et).select(col("hb"), col("y")), Seq("hb"), "left")
        .select(col("hb"), coalesce(col("y"), lit(0L)).as(as))
      val x = series("click", "xv")
        .select(col("hb"), col("xv"), explode(sequence(lit(0L), lit(12L))).as("lg"))
      val p = x.join(series("purchase", "yv").withColumnRenamed("hb", "yhb"),
        col("yhb") === col("hb") + col("lg"))
      p.groupBy("lg")
        .agg(count(lit(1)).as("n"), sum(col("xv")).as("sx"), sum(col("yv")).as("sy"),
          sum(col("xv") * col("xv")).as("sxx"), sum(col("yv") * col("yv")).as("syy"),
          sum(col("xv") * col("yv")).as("sxy"))
        .select(col("lg"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy"))
            / (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
              * sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))), 6).as("r"))
        .orderBy("lg")
    },

    // Join-size estimation from count sketches — the cardinality-
    // estimation primitive a cost-based planner needs BEFORE running a
    // join: |A ⋈ B| on a key equals the inner product of the two key-
    // frequency vectors, estimated here as min over 2 salted CMS rows
    // (portable md5 hashes) of Σ_b cntA[b]·cntB[b]. The bucket count is
    // the whole design: collision noise adds ≈ |A|·|B|/w, so w must be
    // sized ≫ |A|·|B|/|A⋈B| — 2²⁰ here puts the noise near 10% of the
    // true size (w=256 would drown the signal 500×). Each side still
    // collapses to ≤ min(n, w) sketch rows via one partial-aggregated
    // count — the join is SIZED without being RUN, and at 100 TB the
    // sketch is megabytes against a multi-billion-row join. The exact
    // join count rides along as the audit; err_milli is the oracle-
    // checked estimator quality. All arithmetic is BIGINT — both engines
    // hash, bucket, and multiply identically.
    q("q239_join_size_sketch",
      "CMS inner-product estimate of |orders ⋈ lineitem| vs the exact join count")(
      s"""WITH ca AS (SELECT r, ${md5LongSql("'j' || r || ':' || o_orderkey")} % 1048576 AS b,
         |                   CAST(count(*) AS BIGINT) AS c
         |            FROM orders CROSS JOIN (VALUES (0), (1)) AS sa(r)
         |            GROUP BY r, b),
         |cb AS (SELECT r, ${md5LongSql("'j' || r || ':' || l_orderkey")} % 1048576 AS b,
         |              CAST(count(*) AS BIGINT) AS c
         |       FROM lineitem CROSS JOIN (VALUES (0), (1)) AS sb(r)
         |       GROUP BY r, b),
         |ip AS (SELECT ca.r, CAST(sum(ca.c * cb.c) AS BIGINT) AS est
         |       FROM ca JOIN cb ON cb.r = ca.r AND cb.b = ca.b
         |       GROUP BY ca.r),
         |tru AS (SELECT CAST(count(*) AS BIGINT) AS n
         |        FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
         |SELECT tru.n AS true_size, CAST(min(ip.est) AS BIGINT) AS est_size,
         |       CAST(abs(min(ip.est) - tru.n) * 1000 // tru.n AS BIGINT) AS err_milli
         |FROM ip CROSS JOIN tru GROUP BY tru.n""".stripMargin
    ) { (s, dir) =>
      def sketch(df: org.apache.spark.sql.DataFrame, key: String) = df
        .select(explode(array(lit(0), lit(1))).as("r"), col(key).as("k"))
        .groupBy(col("r"),
          (md5Long(concat(lit("j"), col("r").cast("string"), lit(":"),
            col("k").cast("string"))) % 1048576).as("b"))
        .agg(count(lit(1)).as("c"))
      // fanout (guide §2.5): the 2×-salted md5 sketch pass over the one-row-
      // group fixture files otherwise runs as one ~3 s task per side
      val ca = sketch(Tables.fanout(s, dir, "orders"), "o_orderkey")
      val cb = sketch(Tables.fanout(s, dir, "lineitem"), "l_orderkey")
      val ip = ca.join(cb.withColumnRenamed("c", "c2"), Seq("r", "b"))
        .groupBy("r").agg(sum(col("c") * col("c2")).as("est"))
      val tru = Tables(s, dir, "orders").join(Tables(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("n"))
      ip.crossJoin(broadcast(tru))
        .groupBy("n").agg(min(col("est")).as("est_size"))
        .select(col("n").as("true_size"), col("est_size"),
          expr("CAST(abs(est_size - n) * 1000 div n AS BIGINT)").as("err_milli"))
    },

    // Time-horizon conversion funnel — ClickHouse's windowFunnel as one
    // declarative plan: did signup → click → purchase happen IN ORDER
    // within 24 h of the user's first signup? The chain is the greedy
    // earliest-step construction (first signup, first click ≥ it, first
    // purchase ≥ that click), which is optimal for the ∃-chain question:
    // an earlier click can only widen the purchase window. Every step is
    // an equi-join on user_id with a range predicate + a min — three
    // partial-aggregated passes over the user partition, no window over
    // raw events, no product; timestamps compare at exact µs. The funnel
    // report is one row of BIGINT stage counts.
    q("q241_window_funnel",
      "ordered signup→click→purchase funnel within 24h of first signup (greedy-exact)")(
      """WITH s AS (SELECT user_id, min(ts::TIMESTAMP) AS st
        |           FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |c AS (SELECT s.user_id, min(e.ts::TIMESTAMP) AS ct
        |      FROM s JOIN events e ON e.user_id = s.user_id
        |           AND e.event_type = 'click' AND e.ts::TIMESTAMP >= s.st
        |      GROUP BY s.user_id),
        |p AS (SELECT c.user_id, min(e.ts::TIMESTAMP) AS pt
        |      FROM c JOIN events e ON e.user_id = c.user_id
        |           AND e.event_type = 'purchase' AND e.ts::TIMESTAMP >= c.ct
        |      GROUP BY c.user_id),
        |j AS (SELECT s.user_id, s.st, c.ct, p.pt
        |      FROM s LEFT JOIN c ON c.user_id = s.user_id
        |             LEFT JOIN p ON p.user_id = s.user_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_signup,
        |       CAST(sum(CASE WHEN ct IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_chain_click,
        |       CAST(sum(CASE WHEN pt IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_chain_full,
        |       CAST(sum(CASE WHEN ct IS NOT NULL AND ct <= st + INTERVAL 24 HOUR
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_click24,
        |       CAST(sum(CASE WHEN pt IS NOT NULL AND pt <= st + INTERVAL 24 HOUR
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase24
        |FROM j""".stripMargin
    ) { (s, dir) =>
      val ev = Tables(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"))
        .cache() // three stage scans
      val sg = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts")).as("st"))
      val ck = sg.join(ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("cts")), Seq("user_id"))
        .filter(col("cts") >= col("st"))
        .groupBy("user_id").agg(min(col("cts")).as("ct"))
      val pu = ck.join(ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts")), Seq("user_id"))
        .filter(col("pts") >= col("ct"))
        .groupBy("user_id").agg(min(col("pts")).as("pt"))
      val horizon = col("st") + expr("INTERVAL 24 HOURS")
      sg.join(ck, Seq("user_id"), "left").join(pu, Seq("user_id"), "left")
        .agg(count(lit(1)).as("n_signup"),
          sum(when(col("ct").isNotNull, 1L).otherwise(0L)).as("n_chain_click"),
          sum(when(col("pt").isNotNull, 1L).otherwise(0L)).as("n_chain_full"),
          sum(when(col("ct").isNotNull && col("ct") <= horizon, 1L).otherwise(0L)).as("n_click24"),
          sum(when(col("pt").isNotNull && col("pt") <= horizon, 1L).otherwise(0L)).as("n_purchase24"))
    },

    // Watermark-sizing report — the out-of-orderness audit that answers
    // the ONE question every streaming deployment must answer before
    // picking withWatermark's delay: how late do events actually arrive?
    // The fixture feed is perfectly ordered, so a deterministic transport
    // delay (md5(event_id) mod 600 s) models the shuffled arrival; per
    // series, lateness = running max of EVENT time along ARRIVAL order
    // minus own event time (exactly the definition Spark's watermark
    // tracks), and the report gives p50/p95/p99/max lateness in whole
    // seconds from an integer histogram (q194's bins-not-rows discipline
    // — quantiles come from cumulated bin counts, never a sort of raw
    // events). Reading it: a 10-minute watermark (q29/q193's setting)
    // covers p99 here; max tells you what it drops.
    q("q242_lateness_report",
      "per-series arrival-lateness percentiles under a deterministic transport delay")(
      s"""WITH e AS (SELECT event_type, event_id, epoch_us(ts::TIMESTAMP) AS et,
         |                  epoch_us(ts::TIMESTAMP)
         |                  + (${md5LongSql("'d:' || event_id")} % 600) * 1000000 AS at
         |           FROM events),
         |l AS (SELECT event_type,
         |             greatest(max(et) OVER (PARTITION BY event_type ORDER BY at, event_id
         |                                    ROWS UNBOUNDED PRECEDING) - et, 0) // 1000000 AS late_s
         |      FROM e),
         |h AS (SELECT event_type, late_s, count(*) AS k FROM l GROUP BY event_type, late_s),
         |c AS (SELECT event_type, late_s, k,
         |             sum(k) OVER (PARTITION BY event_type ORDER BY late_s
         |                          ROWS UNBOUNDED PRECEDING) AS cum,
         |             sum(k) OVER (PARTITION BY event_type) AS n
         |      FROM h)
         |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         |       CAST(sum(CASE WHEN late_s > 0 THEN k ELSE 0 END) AS BIGINT) AS n_late,
         |       CAST(min(CASE WHEN cum * 2 >= n THEN late_s END) AS BIGINT) AS p50_late_s,
         |       CAST(min(CASE WHEN cum * 20 >= 19 * n THEN late_s END) AS BIGINT) AS p95_late_s,
         |       CAST(min(CASE WHEN cum * 100 >= 99 * n THEN late_s END) AS BIGINT) AS p99_late_s,
         |       CAST(max(late_s) AS BIGINT) AS max_late_s
         |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "events").select(col("event_type"), col("event_id"),
        us(col("ts")).as("et"),
        (us(col("ts")) + (md5Long(concat(lit("d:"), col("event_id").cast("string")))
          % 600) * 1000000L).as("at"))
      val l = e.select(col("event_type"),
        greatest(max(col("et")).over(
          Window.partitionBy("event_type").orderBy("at", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("et"),
          lit(0L)).as("late_us"))
        .select(col("event_type"), (col("late_us") / 1000000L).cast("long").as("late_s"))
      val h = l.groupBy("event_type", "late_s").agg(count(lit(1)).as("k"))
      val c = h.select(col("event_type"), col("late_s"), col("k"),
        sum(col("k")).over(Window.partitionBy("event_type").orderBy("late_s")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"),
        sum(col("k")).over(Window.partitionBy("event_type")).as("n"))
      c.groupBy("event_type")
        .agg(max(col("n")).as("n"),
          sum(when(col("late_s") > 0, col("k")).otherwise(0L)).as("n_late"),
          min(when(col("cum") * 2 >= col("n"), col("late_s"))).as("p50_late_s"),
          min(when(col("cum") * 20 >= col("n") * 19, col("late_s"))).as("p95_late_s"),
          min(when(col("cum") * 100 >= col("n") * 99, col("late_s"))).as("p99_late_s"),
          max(col("late_s")).as("max_late_s"))
        .orderBy("event_type")
    },

    // "Also bought" recommendations by association lift — per anchor part,
    // the top-3 co-purchased parts ranked by lift = P(a,b)/(P(a)·P(b)) in
    // exact integer micro-units (q99's association-rule machinery turned
    // into the per-item recommendation table a retail surface serves).
    // Basket pairs come from a self-join on the order key — bounded by
    // (basket size)² per order, never corpus² — supports are one grouped
    // count, and the per-anchor top-3 runs through the native
    // TopKPerKeyExec (bounded per-key heaps, partial→exchange→final), so
    // only ≤ 3 rows per anchor per task ever cross the shuffle. The 1-row
    // basket-count frame broadcasts (allowlisted scalar product, q99's
    // own shape).
    q("q244_also_bought",
      "per-part top-3 co-purchased recommendations by exact integer lift")(
      """WITH bl AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS nb FROM bl),
        |s AS (SELECT p, CAST(count(*) AS BIGINT) AS sp FROM bl GROUP BY p),
        |co AS (SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS c
        |       FROM bl a JOIN bl b ON b.o = a.o AND b.p <> a.p
        |       GROUP BY a.p, b.p),
        |lf AS (SELECT co.pa, co.pb, co.c,
        |              CAST(co.c * n.nb * 1000000 // (sa.sp * sb.sp) AS BIGINT) AS lift_micro
        |       FROM co CROSS JOIN n
        |            JOIN s sa ON sa.p = co.pa JOIN s sb ON sb.p = co.pb),
        |r AS (SELECT *, row_number() OVER (PARTITION BY pa
        |                ORDER BY lift_micro DESC, c DESC, pb) AS rn
        |      FROM lf)
        |SELECT pa, pb, c AS n_co, lift_micro, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 3 ORDER BY pa, rn LIMIT 150""".stripMargin
    ) { (s, dir) =>
      val bl = Tables(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
        .cache() // basket count + supports + the pair join
      val n = bl.agg(countDistinct(col("o")).as("nb"))
      val sup = bl.groupBy("p").agg(count(lit(1)).as("sp"))
      val co = bl.select(col("o"), col("p").as("pa"))
        .join(bl.select(col("o"), col("p").as("pb")), Seq("o"))
        .filter(col("pa") =!= col("pb"))
        .groupBy("pa", "pb").agg(count(lit(1)).as("c"))
      val lf = co.crossJoin(broadcast(n))
        .join(broadcast(sup.select(col("p").as("pa"), col("sp").as("sa"))), Seq("pa"))
        .join(broadcast(sup.select(col("p").as("pb"), col("sp").as("sb"))), Seq("pb"))
        .select(col("pa"), col("pb"), col("c"),
          expr("CAST(c * nb * 1000000 div (sa * sb) AS BIGINT)").as("lift_micro"))
      // per-anchor top-3 via the native TopKPerKeyExec (bounded heaps +
      // map-side pre-reduction: ≤ 3 rows/key/task cross the exchange) —
      // the window formulation full-sorts and full-shuffles the entire
      // co-occurrence frame. Ranks come from a per-key sorted array over
      // the ≤ 3 survivors (no WindowExec at all); the negated sort keys
      // are safe — both lift_micro and c are non-negative by construction
      graft.plans.TopKPerKey.topK(lf, Seq(col("pa")),
          Seq(col("lift_micro").desc, col("c").desc, col("pb")), 3)
        .groupBy("pa")
        .agg(sort_array(collect_list(struct(
          (-col("lift_micro")).as("k1"), (-col("c")).as("k2"), col("pb"),
          col("c").as("n_co"), col("lift_micro").as("lm")))).as("arr"))
        .select(col("pa"), posexplode(col("arr")))
        .select(col("pa"), col("col.pb").as("pb"), col("col.n_co").as("n_co"),
          col("col.lm").as("lift_micro"), (col("pos") + 1).cast("long").as("rn"))
        .orderBy("pa", "rn").limit(150)
    },

    // RFM segmentation — the classic marketing partition (recency /
    // frequency / monetary quintiles) with every boundary histogram-exact:
    // per-user R (whole days since last event vs the corpus max), F
    // (event count), and M (4-dp value units, binned ×50 for the
    // histogram) are integers; each dimension's quintile score is the
    // user's strict percentile rank (below·5 // n, capped at 4) computed
    // from a per-dim value histogram via a dim-keyed triangular join —
    // bins², never users², and NO global window (the trap ntile() would
    // plan). Scores land back on users through three broadcast-able
    // histogram joins; the report is the 5×5×5 cell census. Lower R score
    // = more recent, lower F/M = lighter — documented, not normalized.
    q("q246_rfm_segments",
      "recency/frequency/monetary quintile census with histogram-exact boundaries")(
      s"""WITH mx AS (SELECT max(epoch_us(ts::TIMESTAMP)) AS mt FROM events),
         |u AS (SELECT user_id,
         |             CAST((mx.mt - max(epoch_us(ts::TIMESTAMP))) // 86400000000 AS BIGINT) AS rv,
         |             CAST(count(*) AS BIGINT) AS fv,
         |             CAST(sum(CAST(round(value * 10000) AS BIGINT)) // 500000 AS BIGINT) AS mv
         |      FROM events CROSS JOIN mx GROUP BY user_id, mx.mt),
         |dims AS (SELECT user_id, 'r' AS dim, rv AS val FROM u
         |         UNION ALL SELECT user_id, 'f', fv FROM u
         |         UNION ALL SELECT user_id, 'm', mv FROM u),
         |h AS (SELECT dim, val, CAST(count(*) AS BIGINT) AS k FROM dims GROUP BY dim, val),
         |c AS (SELECT a.dim, a.val,
         |             CAST(sum(CASE WHEN b.val < a.val THEN b.k ELSE 0 END) AS BIGINT) AS below
         |      FROM h a JOIN h b ON b.dim = a.dim
         |      GROUP BY a.dim, a.val),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM u),
         |q AS (SELECT dim, val, least(below * 5 // nu, 4) AS sc FROM c CROSS JOIN n),
         |sc AS (SELECT d.user_id,
         |              max(CASE WHEN d.dim = 'r' THEN q.sc END) AS r_sc,
         |              max(CASE WHEN d.dim = 'f' THEN q.sc END) AS f_sc,
         |              max(CASE WHEN d.dim = 'm' THEN q.sc END) AS m_sc
         |       FROM dims d JOIN q ON q.dim = d.dim AND q.val = d.val
         |       GROUP BY d.user_id)
         |SELECT CAST(r_sc AS BIGINT) AS r_sc, CAST(f_sc AS BIGINT) AS f_sc,
         |       CAST(m_sc AS BIGINT) AS m_sc, CAST(count(*) AS BIGINT) AS n_users
         |FROM sc GROUP BY r_sc, f_sc, m_sc ORDER BY r_sc, f_sc, m_sc""".stripMargin
    ) { (s, dir) =>
      val mx = Tables(s, dir, "events").agg(max(us(col("ts"))).as("mt"))
      val u = Tables(s, dir, "events")
        .crossJoin(broadcast(mx))
        .groupBy("user_id", "mt")
        .agg(max(us(col("ts"))).as("lt"), count(lit(1)).as("fv"),
          sum(round(col("value") * 10000).cast("long")).as("mu"))
        .select(col("user_id"),
          expr("(mt - lt) div 86400000000").as("rv"), col("fv"),
          expr("mu div 500000").as("mv"))
        .cache() // three dim projections + the user count
      val dims = u.select(col("user_id"), lit("r").as("dim"), col("rv").as("val"))
        .unionAll(u.select(col("user_id"), lit("f").as("dim"), col("fv").as("val")))
        .unionAll(u.select(col("user_id"), lit("m").as("dim"), col("mv").as("val")))
      val h = dims.groupBy("dim", "val").agg(count(lit(1)).as("k"))
      val c = h.select(col("dim"), col("val").as("aval"))
        .join(h.select(col("dim"), col("val").as("bval"), col("k")), Seq("dim"))
        .groupBy("dim", "aval")
        .agg(sum(when(col("bval") < col("aval"), col("k")).otherwise(0L)).as("below"))
      val n = u.agg(count(lit(1)).as("nu"))
      val q245q = c.crossJoin(broadcast(n))
        .select(col("dim"), col("aval").as("val"),
          least(expr("below * 5 div nu"), lit(4L)).as("sc"))
      dims.join(broadcast(q245q), Seq("dim", "val"))
        .groupBy("user_id")
        .agg(max(when(col("dim") === "r", col("sc"))).as("r_sc"),
          max(when(col("dim") === "f", col("sc"))).as("f_sc"),
          max(when(col("dim") === "m", col("sc"))).as("m_sc"))
        .groupBy("r_sc", "f_sc", "m_sc").agg(count(lit(1)).as("n_users"))
        .orderBy("r_sc", "f_sc", "m_sc")
    },

    // Rolling-origin backtest of the q230 forecaster — the evaluation half
    // every forecasting deployment needs: replay the same integer Holt
    // recurrence, but BEFORE each update score the one-step-ahead forecast
    // (level+trend) against the arriving hour, accumulating |error| in
    // exact milli-units inside the same fold (error uses the PRE-update
    // state — the out-of-sample discipline). One pass, zero extra
    // shuffles vs q230; MAE lands as integer division over n−1 forecasts.
    // The oracle's recursive CTE carries the same 3-slot accumulator.
    q("q247_holt_backtest",
      "one-step-ahead Holt backtest: integer MAE over the zero-filled hourly series")(
      """WITH RECURSIVE b AS (
        |  SELECT event_type, (CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 3600) AS hb,
        |         count(*) AS y
        |  FROM events GROUP BY event_type, hb),
        |rr AS (SELECT CAST(min(hb) AS BIGINT) AS lo, CAST(max(hb) AS BIGINT) AS hi FROM b),
        |spine AS (SELECT t.event_type, g.hb
        |          FROM (SELECT DISTINCT event_type FROM b) t
        |          CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM rr), (SELECT hi FROM rr))) AS hb) g),
        |s AS (SELECT spine.event_type,
        |             spine.hb - (SELECT lo FROM rr) + 1 AS idx,
        |             coalesce(b.y, 0) AS y
        |      FROM spine LEFT JOIN b ON b.event_type = spine.event_type AND b.hb = spine.hb),
        |h AS (
        |  SELECT event_type, idx, y * 1000 AS l, CAST(0 AS BIGINT) AS tr,
        |         CAST(0 AS BIGINT) AS sae
        |  FROM s WHERE idx = 1
        |  UNION ALL
        |  SELECT n.event_type, n.idx,
        |         (n.y * 1000 + h.l + h.tr) // 2,
        |         (((n.y * 1000 + h.l + h.tr) // 2) - h.l + h.tr) // 2,
        |         h.sae + abs(h.l + h.tr - n.y * 1000)
        |  FROM h JOIN s n ON n.event_type = h.event_type AND n.idx = h.idx + 1)
        |SELECT event_type,
        |       CAST((SELECT hi - lo + 1 FROM rr) AS BIGINT) AS n_hours,
        |       CAST(sae AS BIGINT) AS sae_milli,
        |       CAST(sae // ((SELECT hi - lo FROM rr)) AS BIGINT) AS mae_milli
        |FROM h WHERE idx = (SELECT hi - lo + 1 FROM rr) ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      def half(c: Column): Column = shiftright(c - (c % 2), 1)
      val b = Tables(s, dir, "events")
        .selectExpr("event_type", "cast(ts as bigint) div 3600 AS hb")
        .groupBy("event_type", "hb").agg(count(lit(1)).as("y"))
        .cache()
      val bounds = b.agg(min(col("hb")).as("lo"), max(col("hb")).as("hi"))
      val spine = b.select("event_type").distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"), col("lo"), explode(sequence(col("lo"), col("hi"))).as("hb"))
      val series = spine.join(b, Seq("event_type", "hb"), "left")
        .select(col("event_type"), (col("hb") - col("lo") + 1).as("idx"),
          coalesce(col("y"), lit(0L)).as("y"))
      series.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("idx"), col("y")))).as("sy"),
          count(lit(1)).as("n_hours"))
        .select(col("event_type"), col("n_hours"),
          aggregate(
            slice(col("sy"), lit(2), size(col("sy")) - 1),
            named_struct(lit("l"), element_at(col("sy"), 1).getField("y") * 1000L,
              lit("tr"), lit(0L), lit("sae"), lit(0L)),
            (acc, x) => {
              val ym = x.getField("y") * 1000L
              val err = abs(acc.getField("l") + acc.getField("tr") - ym)
              val nl = half(ym + acc.getField("l") + acc.getField("tr"))
              named_struct(lit("l"), nl,
                lit("tr"), half(nl - acc.getField("l") + acc.getField("tr")),
                lit("sae"), acc.getField("sae") + err)
            }).as("st"))
        .select(col("event_type"), col("n_hours"),
          col("st.sae").as("sae_milli"),
          (col("st.sae") / (col("n_hours") - 1)).cast("long").as("mae_milli"))
        .orderBy("event_type")
    },

    // k-anonymity audit — the privacy-governance gate a training-data
    // pipeline runs before release: group the table by its quasi-
    // identifiers (nation × market segment × coarse balance bin) and
    // report, for each policy threshold k, how many equivalence classes
    // and how many INDIVIDUALS sit in classes smaller than k (the
    // re-identification risk mass a k-anonymization must suppress or
    // generalize away). Group sizes collapse to a size histogram first —
    // the k-grid explodes map-side over ≤|distinct sizes| rows, so the
    // audit costs one grouped count regardless of table width.
    q("q248_k_anonymity",
      "per-threshold k-anonymity risk report over (nation, segment, balance-bin)")(
      """WITH g AS (SELECT c_nationkey, c_mktsegment,
        |                  CAST(floor((c_acctbal + 1000) / 500) AS BIGINT) AS bb,
        |                  count(*) AS sz
        |           FROM customer GROUP BY c_nationkey, c_mktsegment, bb),
        |sh AS (SELECT sz, CAST(count(*) AS BIGINT) AS n_g FROM g GROUP BY sz),
        |tot AS (SELECT CAST(sum(sz * n_g) AS BIGINT) AS nu,
        |               CAST(sum(n_g) AS BIGINT) AS ng FROM sh),
        |ks AS (SELECT unnest([2, 5, 10, 20]) AS k)
        |SELECT CAST(ks.k AS BIGINT) AS k, tot.ng AS n_groups,
        |       CAST(coalesce(sum(CASE WHEN sh.sz < ks.k THEN sh.n_g END), 0) AS BIGINT) AS risky_groups,
        |       CAST(coalesce(sum(CASE WHEN sh.sz < ks.k THEN sh.sz * sh.n_g END), 0) AS BIGINT) AS risky_users,
        |       CAST(coalesce(sum(CASE WHEN sh.sz < ks.k THEN sh.sz * sh.n_g END), 0) * 1000
        |            // tot.nu AS BIGINT) AS risky_milli
        |FROM ks CROSS JOIN sh CROSS JOIN tot
        |GROUP BY ks.k, tot.ng, tot.nu ORDER BY k""".stripMargin
    ) { (s, dir) =>
      val g = Tables(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          floor((col("c_acctbal") + 1000) / 500).cast("long").as("bb"))
        .agg(count(lit(1)).as("sz"))
      val sh = g.groupBy("sz").agg(count(lit(1)).as("n_g")).cache()
      val tot = sh.agg(sum(col("sz") * col("n_g")).as("nu"), sum(col("n_g")).as("ng"))
      sh.select(col("sz"), col("n_g"),
          explode(array(lit(2L), lit(5L), lit(10L), lit(20L))).as("k"))
        .crossJoin(broadcast(tot))
        .groupBy("k", "ng", "nu")
        .agg(coalesce(sum(when(col("sz") < col("k"), col("n_g"))), lit(0L)).as("risky_groups"),
          coalesce(sum(when(col("sz") < col("k"), col("sz") * col("n_g"))), lit(0L)).as("risky_users"))
        .select(col("k"), col("ng").as("n_groups"), col("risky_groups"), col("risky_users"),
          expr("CAST(risky_users * 1000 div nu AS BIGINT)").as("risky_milli"))
        .orderBy("k")
    },

    // l-diversity audit — k-anonymity's necessary complement (q248 bounds
    // class SIZE; this bounds sensitive-value VARIETY): a class of 50
    // people who all share one market segment leaks the segment even
    // though k=50 passes. QI classes here are (nation × balance-bin),
    // the SENSITIVE attribute is the segment; per policy l the report
    // counts classes whose distinct-segment count falls short and the
    // individuals inside them. Same scale discipline as q248: classes
    // collapse to an (l-value, size) census first, so the policy grid
    // explodes over ≤|distinct (ld, sz)| rows — one grouped count plus a
    // distinct-count, metadata after that.
    q("q261_l_diversity",
      "per-threshold l-diversity risk over (nation, balance-bin) vs segment variety")(
      """WITH g AS (SELECT c_nationkey,
        |                  CAST(floor((c_acctbal + 1000) / 500) AS BIGINT) AS bb,
        |                  CAST(count(*) AS BIGINT) AS sz,
        |                  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS ld
        |           FROM customer GROUP BY c_nationkey, bb),
        |sh AS (SELECT ld, sz, CAST(count(*) AS BIGINT) AS n_g FROM g GROUP BY ld, sz),
        |tot AS (SELECT CAST(sum(sz * n_g) AS BIGINT) AS nu,
        |               CAST(sum(n_g) AS BIGINT) AS ng FROM sh),
        |ls AS (SELECT unnest([2, 3, 5]) AS l)
        |SELECT CAST(ls.l AS BIGINT) AS l, tot.ng AS n_groups,
        |       CAST(coalesce(sum(CASE WHEN sh.ld < ls.l THEN sh.n_g END), 0) AS BIGINT) AS risky_groups,
        |       CAST(coalesce(sum(CASE WHEN sh.ld < ls.l THEN sh.sz * sh.n_g END), 0) AS BIGINT) AS risky_users,
        |       CAST(coalesce(sum(CASE WHEN sh.ld < ls.l THEN sh.sz * sh.n_g END), 0) * 1000
        |            // tot.nu AS BIGINT) AS risky_milli
        |FROM ls CROSS JOIN sh CROSS JOIN tot
        |GROUP BY ls.l, tot.ng, tot.nu ORDER BY l""".stripMargin
    ) { (s, dir) =>
      val g = Tables(s, dir, "customer")
        .groupBy(col("c_nationkey"),
          floor((col("c_acctbal") + 1000) / 500).cast("long").as("bb"))
        .agg(count(lit(1)).as("sz"), countDistinct(col("c_mktsegment")).as("ld"))
      val sh = g.groupBy("ld", "sz").agg(count(lit(1)).as("n_g")).cache()
      val tot = sh.agg(sum(col("sz") * col("n_g")).as("nu"), sum(col("n_g")).as("ng"))
      sh.select(col("ld"), col("sz"), col("n_g"),
          explode(array(lit(2L), lit(3L), lit(5L))).as("l"))
        .crossJoin(broadcast(tot))
        .groupBy("l", "ng", "nu")
        .agg(coalesce(sum(when(col("ld") < col("l"), col("n_g"))), lit(0L)).as("risky_groups"),
          coalesce(sum(when(col("ld") < col("l"), col("sz") * col("n_g"))), lit(0L)).as("risky_users"))
        .select(col("l"), col("ng").as("n_groups"), col("risky_groups"), col("risky_users"),
          expr("CAST(risky_users * 1000 div nu AS BIGINT)").as("risky_milli"))
        .orderBy("l")
    },

    // Wasserstein-1 drift — completes the drift trio (q229 PSI is
    // bin-symmetric, q259 KS takes the single worst CDF gap; W1 is the
    // ORDINAL metric: the area between the two CDFs, i.e. how far mass
    // actually moved across bins, which PSI and KS both under-report for
    // a small shift spread over many bins). Same 10-bin value histogram
    // and event_id-parity halves as q229, but the statistic stays EXACT
    // integer to the last step: with unit bin spacing,
    // W1 = Σ_b |CDF_ref(b) − CDF_cur(b)| — cross-multiplied to
    // Σ_b |cumr_b·n_cur − cumc_b·n_ref| (BIGINT; ≤ 9·n² ≈ 2e12 at sf1,
    // far inside Long), divided once at the end. The cumulative runs in a
    // per-series window (10-row partitions — bin-spine-bounded, never
    // data-sized). Shape: one grouped count + the q229 bin spine.
    q("q357_wasserstein_drift",
      "Wasserstein-1 (earth-mover) drift per event_type between event_id-parity halves")(
      """WITH e AS (SELECT event_type, event_id % 2 AS side,
        |                  least(CAST(floor(value / 50) AS BIGINT), 9) AS bin
        |           FROM events),
        |c AS (SELECT event_type, side, bin, count(*) AS k
        |      FROM e GROUP BY event_type, side, bin),
        |t AS (SELECT event_type, unnest(generate_series(0, 9)) AS bin
        |      FROM (SELECT DISTINCT event_type FROM e)),
        |f AS (SELECT t.event_type, t.bin,
        |             coalesce(rr.k, 0) AS kr, coalesce(u.k, 0) AS kc
        |      FROM t LEFT JOIN (SELECT event_type, bin, k FROM c WHERE side = 0) rr
        |             ON rr.event_type = t.event_type AND rr.bin = t.bin
        |           LEFT JOIN (SELECT event_type, bin, k FROM c WHERE side = 1) u
        |             ON u.event_type = t.event_type AND u.bin = t.bin),
        |cm AS (SELECT event_type, bin,
        |              CAST(sum(kr) OVER w AS BIGINT) AS cumr,
        |              CAST(sum(kc) OVER w AS BIGINT) AS cumc
        |       FROM f WINDOW w AS (PARTITION BY event_type ORDER BY bin
        |                           ROWS UNBOUNDED PRECEDING)),
        |tot AS (SELECT event_type, CAST(max(cumr) AS BIGINT) AS nr,
        |               CAST(max(cumc) AS BIGINT) AS nc
        |        FROM cm GROUP BY event_type),
        |g AS (SELECT cm.event_type, tot.nr, tot.nc,
        |             CAST(sum(abs(cm.cumr * tot.nc - cm.cumc * tot.nr)) AS BIGINT) AS num
        |      FROM cm JOIN tot USING (event_type)
        |      GROUP BY cm.event_type, tot.nr, tot.nc)
        |SELECT event_type, nr AS n_ref, nc AS n_cur, num AS w1_num,
        |       round(CAST(num AS DOUBLE) / (nr * nc), 6) AS w1
        |FROM g ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "events").select(col("event_type"),
        (col("event_id") % 2).as("side"),
        least(floor(col("value") / 50).cast("long"), lit(9L)).as("bin"))
      val c = e.groupBy("event_type", "side", "bin").agg(count(lit(1)).as("k"))
      val t = e.select("event_type").distinct()
        .select(col("event_type"), explode(sequence(lit(0L), lit(9L))).as("bin"))
      def sideCounts(sd: Int, as: String) = c.filter(col("side") === sd)
        .select(col("event_type"), col("bin"), col("k").as(as))
      val f = t.join(sideCounts(0, "rk"), Seq("event_type", "bin"), "left")
        .join(sideCounts(1, "ck"), Seq("event_type", "bin"), "left")
        .select(col("event_type"), col("bin"),
          coalesce(col("rk"), lit(0L)).as("kr"), coalesce(col("ck"), lit(0L)).as("kc"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("bin")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      f.select(col("event_type"), col("bin"),
          sum(col("kr")).over(w).as("cumr"), sum(col("kc")).over(w).as("cumc"))
        .groupBy("event_type")
        .agg(max(col("cumr")).as("nr"), max(col("cumc")).as("nc"),
          // |cumr·nc − cumc·nr| needs the TOTALS, which are the last bin's
          // cumulatives: fold the 10 (bin, cumr, cumc) rows into one sorted
          // array and do the cross-multiplication row-locally against the
          // max-cum totals — one grouped pass, no second join
          sort_array(collect_list(struct(col("bin"), col("cumr"), col("cumc")))).as("cs"))
        .select(col("event_type"), col("nr").as("n_ref"), col("nc").as("n_cur"),
          aggregate(col("cs"), lit(0L),
            (a, m) => a + abs(m.getField("cumr") * col("nc") - m.getField("cumc") * col("nr")))
            .as("w1_num"))
        .select(col("event_type"), col("n_ref"), col("n_cur"), col("w1_num"),
          round(col("w1_num").cast("double") / (col("n_ref") * col("n_cur")), 6).as("w1"))
        .orderBy("event_type")
    },

    // Trailing-window anomaly detection, integer-exact: score each hour's
    // event count against its OWN trailing 24 h (mean ± 3σ) — but the
    // 3σ rule needs no sqrt and no floats: y is anomalous iff
    // (n·y − Σy)² > 9·(n·Σy² − (Σy)²), the z²>9 inequality cleared of
    // divisions, so both engines compare identical BIGINTs and the flag
    // set is hash-exact (a float z-score would waver at the boundary).
    // The window is ROWS 24-PRECEDING-to-1-PRECEDING over the zero-filled
    // hourly spine (q247's shape) — self-exclusion keeps the spike out of
    // its own baseline. At 100 TB: one partitioned window pass over
    // (series key, hour) counts — bins, not raw events; the monitor costs
    // the same grouped count the ingest already runs.
    q("q250_anomaly_hours",
      "trailing-24h 3-sigma anomaly flags per event_type, sqrt-free integer z-test")(
      """WITH b AS (
        |  SELECT event_type, (CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 3600) AS hb,
        |         count(*) AS y
        |  FROM events GROUP BY event_type, hb),
        |rr AS (SELECT CAST(min(hb) AS BIGINT) AS lo, CAST(max(hb) AS BIGINT) AS hi FROM b),
        |spine AS (SELECT t.event_type, g.hb
        |          FROM (SELECT DISTINCT event_type FROM b) t
        |          CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM rr), (SELECT hi FROM rr))) AS hb) g),
        |s AS (SELECT spine.event_type,
        |             spine.hb - (SELECT lo FROM rr) + 1 AS idx,
        |             coalesce(b.y, 0) AS y
        |      FROM spine LEFT JOIN b ON b.event_type = spine.event_type AND b.hb = spine.hb),
        |w AS (SELECT event_type, idx, y,
        |             count(*) OVER win AS n, sum(y) OVER win AS s1, sum(y*y) OVER win AS s2
        |      FROM s
        |      WINDOW win AS (PARTITION BY event_type ORDER BY idx
        |                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |f AS (SELECT event_type, y,
        |             CASE WHEN (24*y - s1)*(24*y - s1) > 9*(24*s2 - s1*s1)
        |                  THEN 1 ELSE 0 END AS flag
        |      FROM w WHERE n = 24)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_scored,
        |       CAST(sum(flag) AS BIGINT) AS n_anom,
        |       CAST(max(CASE WHEN flag = 1 THEN y END) AS BIGINT) AS max_anom_y
        |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      anomalyReport(Tables(s, dir, "events")
        .selectExpr("event_type", "cast(ts as bigint) div 3600 AS hb")
        .groupBy("event_type", "hb").agg(count(lit(1)).as("y")))
    },

    // Entropic optimal transport (Sinkhorn–Knopp; Cuturi 2013, public
    // arXiv:1306.0895) — the regularized transport-PLAN counterpart of
    // q357's closed-form W1: W1 gives the scalar distance on the line, OT
    // gives WHERE the mass moved (the coupling), which is what a mixture
    // rebalancer actually consumes. Same 10-bin value histograms per
    // event_type, event_id-parity halves; cost C_ij = |i−j|, kernel
    // K = exp(−C) (ε = 1), 8 Sinkhorn iterations. The Spark side runs the
    // WHOLE iteration as one fold: per event_type a single row carries the
    // two probability arrays and an `aggregate(sequence(1,8), (u,v)-state,
    // …)` HOF alternates v ← b⊘(Kᵀu), u ← a⊘(Kv) in fixed evaluation order
    // — zero per-iteration shuffles or checkpoints (the q344 trap never
    // arises because iteration lives inside one expression, not the plan).
    // The oracle replays the identical math as unrolled MATERIALIZED CTE
    // rounds — an independent tall formulation of the same fixpoint. The
    // u-marginal is exact by construction (u is updated last), so the
    // convergence witness is the b-side residual Σ|v∘(Kᵀu) − b|. Scale:
    // one grouped count + a per-type constant-size (10-element) state —
    // the iteration is metadata after the histogram pass.
    q("q367_sinkhorn_drift",
      "entropic OT (Sinkhorn, 8 iters) between event_id-parity value histograms")(
      {
        val rounds = (1 to 8).map { t =>
          val up = if (t == 1) "u0" else s"u${t - 1}"
          s"""v$t AS MATERIALIZED (
             |  SELECT h.event_type, h.i AS j,
             |         h.pb / sum(exp(-abs(u.i - h.i)) * u.u) AS v
             |  FROM h JOIN $up u ON u.event_type = h.event_type
             |  GROUP BY h.event_type, h.i, h.pb),
             |u$t AS MATERIALIZED (
             |  SELECT h.event_type, h.i,
             |         h.pa / sum(exp(-abs(h.i - v.j)) * v.v) AS u
             |  FROM h JOIN v$t v ON v.event_type = h.event_type
             |  GROUP BY h.event_type, h.i, h.pa)""".stripMargin
        }.mkString(",\n")
        s"""WITH e AS (SELECT event_type, event_id % 2 AS side,
           |                  least(CAST(floor(value / 50) AS BIGINT), 9) AS bin
           |           FROM events),
           |c AS (SELECT event_type, side, bin, count(*) AS k
           |      FROM e GROUP BY event_type, side, bin),
           |t AS (SELECT event_type, unnest(generate_series(0, 9)) AS bin
           |      FROM (SELECT DISTINCT event_type FROM e)),
           |f AS (SELECT t.event_type, t.bin AS i,
           |             coalesce(rr.k, 0) AS kr, coalesce(u.k, 0) AS kc
           |      FROM t LEFT JOIN (SELECT event_type, bin, k FROM c WHERE side = 0) rr
           |             ON rr.event_type = t.event_type AND rr.bin = t.bin
           |           LEFT JOIN (SELECT event_type, bin, k FROM c WHERE side = 1) u
           |             ON u.event_type = t.event_type AND u.bin = t.bin),
           |tot AS (SELECT event_type, CAST(sum(kr) AS BIGINT) AS nr,
           |               CAST(sum(kc) AS BIGINT) AS nc
           |        FROM f GROUP BY event_type HAVING sum(kr) > 0 AND sum(kc) > 0),
           |h AS MATERIALIZED (SELECT f.event_type, f.i,
           |            f.kr / CAST(tot.nr AS DOUBLE) AS pa,
           |            f.kc / CAST(tot.nc AS DOUBLE) AS pb
           |     FROM f JOIN tot USING (event_type)),
           |u0 AS (SELECT event_type, i, 1.0 AS u FROM h),
           |$rounds,
           |cost AS (SELECT u.event_type,
           |                sum(u.u * exp(-abs(u.i - v.j)) * v.v * abs(u.i - v.j)) AS ot
           |         FROM u8 u JOIN v8 v ON v.event_type = u.event_type
           |         GROUP BY u.event_type),
           |mar AS (SELECT v.event_type, v.j,
           |               v.v * sum(exp(-abs(u.i - v.j)) * u.u) AS m
           |        FROM v8 v JOIN u8 u ON u.event_type = v.event_type
           |        GROUP BY v.event_type, v.j, v.v),
           |res AS (SELECT mar.event_type, sum(abs(mar.m - h.pb)) AS rb
           |        FROM mar JOIN h ON h.event_type = mar.event_type AND h.i = mar.j
           |        GROUP BY mar.event_type)
           |SELECT tot.event_type, tot.nr AS n_ref, tot.nc AS n_cur,
           |       round(cost.ot, 4) AS ot_cost, round(res.rb, 4) AS b_resid
           |FROM tot JOIN cost USING (event_type) JOIN res USING (event_type)
           |ORDER BY event_type""".stripMargin
      }
    ) { (s, dir) =>
      val e = Tables(s, dir, "events").select(col("event_type"),
        (col("event_id") % 2).as("side"),
        least(floor(col("value") / 50).cast("long"), lit(9L)).as("bin"))
      val cnts = e.groupBy("event_type", "side", "bin").agg(count(lit(1)).as("k"))
      val maps = cnts.groupBy("event_type", "side")
        .agg(map_from_entries(collect_list(struct(col("bin"), col("k")))).as("m"),
          sum(col("k")).as("n"))
      val h = maps.filter(col("side") === 0).alias("a")
        .join(maps.filter(col("side") === 1).alias("b"), Seq("event_type"))
        .select(col("event_type"), col("a.n").as("n_ref"), col("b.n").as("n_cur"),
          expr("transform(sequence(0, 9), bb -> " +
            "coalesce(element_at(a.m, cast(bb as bigint)), 0L) / cast(a.n as double))").as("pa"),
          expr("transform(sequence(0, 9), bb -> " +
            "coalesce(element_at(b.m, cast(bb as bigint)), 0L) / cast(b.n as double))").as("pb"))
      // the whole Sinkhorn loop as one fixed-order fold; st.u / st.v are
      // bound variables, so each step evaluates the previous state once
      val fold =
        """aggregate(sequence(1, 8),
          |  named_struct('u', transform(sequence(0, 9), x -> 1.0d),
          |               'v', transform(sequence(0, 9), x -> 1.0d)),
          |  (st, t) -> named_struct(
          |    'u', transform(sequence(0, 9), i -> element_at(pa, i + 1) /
          |           aggregate(sequence(0, 9), 0.0d, (acc, j) -> acc +
          |             exp(-cast(abs(i - j) as double)) * (element_at(pb, j + 1) /
          |               aggregate(sequence(0, 9), 0.0d, (a2, i2) -> a2 +
          |                 exp(-cast(abs(i2 - j) as double)) * element_at(st.u, i2 + 1))))),
          |    'v', transform(sequence(0, 9), j -> element_at(pb, j + 1) /
          |           aggregate(sequence(0, 9), 0.0d, (a2, i2) -> a2 +
          |             exp(-cast(abs(i2 - j) as double)) * element_at(st.u, i2 + 1)))))""".stripMargin
      val st = h.withColumn("uv", expr(fold))
      st.select(col("event_type"), col("n_ref"), col("n_cur"),
          round(expr(
            """aggregate(sequence(0, 9), 0.0d, (acc, i) -> acc +
              |  element_at(uv.u, i + 1) * aggregate(sequence(0, 9), 0.0d,
              |    (a2, j) -> a2 + exp(-cast(abs(i - j) as double)) *
              |      element_at(uv.v, j + 1) * cast(abs(i - j) as double)))""".stripMargin), 4)
            .as("ot_cost"),
          round(expr(
            """aggregate(sequence(0, 9), 0.0d, (acc, j) -> acc +
              |  abs(element_at(uv.v, j + 1) * aggregate(sequence(0, 9), 0.0d,
              |    (a2, i) -> a2 + exp(-cast(abs(i - j) as double)) *
              |      element_at(uv.u, i + 1)) - element_at(pb, j + 1)))""".stripMargin), 4)
            .as("b_resid"))
        .orderBy("event_type")
    },
  )
}
