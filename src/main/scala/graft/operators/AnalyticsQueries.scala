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
    // merge, but HLL sketches do (register-wise max — order- and
    // partition-independent, so the rollup is fully deterministic within
    // the engine). Per-(type, hour) sketches roll up to per-type estimates
    // by union WITHOUT touching raw rows again — at 100 TB you persist the
    // hourly sketch table (a few KB per cell) and answer any
    // coarser-grained distinct-user question from sketch unions alone.
    // rows-only: DataSketches HLL and DuckDB's approx_count_distinct are
    // different estimators; mergeability (union == direct, exactly) and
    // the error bound vs exact are pinned in ApproxAndRecallSpec.
    rowsOnly("q187_hll_rollup",
      "per-hour HLL user sketches unioned to event_type distinct estimates") { (s, dir) =>
      val hourly = Tables(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      hourly.groupBy("event_type")
        .agg(count(lit(1)).as("n_hourly_sketches"),
          hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est_users"))
        .orderBy("event_type")
    },

    // KMV (k-minimum-values) distinct sketch — the ORACLE-CHECKABLE sibling
    // of q187's HLL: the k smallest distinct portable hashes are pure set
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
      val ca = sketch(Tables(s, dir, "orders"), "o_orderkey")
      val cb = sketch(Tables(s, dir, "lineitem"), "l_orderkey")
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
    // count, and the per-anchor rank is a partitioned window over the
    // co-occurrence table. The 1-row basket-count frame broadcasts
    // (allowlisted scalar product, q99's own shape).
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
      co.crossJoin(broadcast(n))
        .join(broadcast(sup.select(col("p").as("pa"), col("sp").as("sa"))), Seq("pa"))
        .join(broadcast(sup.select(col("p").as("pb"), col("sp").as("sb"))), Seq("pb"))
        .select(col("pa"), col("pb"), col("c"),
          expr("CAST(c * nb * 1000000 div (sa * sb) AS BIGINT)").as("lift_micro"))
        .withColumn("rn", row_number().over(Window.partitionBy("pa")
          .orderBy(col("lift_micro").desc, col("c").desc, col("pb"))))
        .filter(col("rn") <= 3)
        .select(col("pa"), col("pb"), col("c").as("n_co"), col("lift_micro"),
          col("rn").cast("long").as("rn"))
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

    // A/B experiment report with an exact integer significance gate. Two
    // arms over the same hash split (60-bit md5 of the salted user id —
    // rerun/append-stable assignment, the property product experiments
    // require): the NULL arm measures the real (effect-free) metric and
    // must NOT fire — a harness that finds effects in an A/A split is
    // broken; the UPLIFT arm injects a deterministic +20% treatment on B
    // and must fire. The metric is self-calibrating (converted = above
    // the corpus median purchase count, median histogram-exact via the
    // q246 triangular discipline), and the two-proportion z² test is
    // cleared of all division: significant ⇔ 10000·(ca·nb − cb·na)²·n >
    // 38415·na·nb·c·(n−c) (z² > 3.8415, p < 0.05), evaluated in
    // DECIMAL so the cross-products survive any cohort size — no float
    // boundary can flip the verdict between engines. At 100 TB:
    // assignment and conversion are map-side over the user rollup; the
    // test runs on a 2×2 table.
    q("q255_ab_test",
      "A/B harness: null arm must not fire, injected +20% uplift must; integer z² gate")(
      s"""WITH u AS (SELECT user_id,
         |                  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS np
         |           FROM events GROUP BY user_id),
         |h AS (SELECT np AS v, CAST(count(*) AS BIGINT) AS k FROM u GROUP BY np),
         |cum AS (SELECT a.v, CAST(sum(b.k) AS BIGINT) AS cm
         |        FROM h a JOIN h b ON b.v <= a.v GROUP BY a.v),
         |nu AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
         |m AS (SELECT CAST(min(v) AS BIGINT) AS med FROM cum CROSS JOIN nu WHERE 2 * cm >= n),
         |v AS (SELECT user_id, np,
         |             ${md5LongSql("'ab:' || CAST(user_id AS VARCHAR)")} % 2 AS vb
         |      FROM u),
         |arms AS (
         |  SELECT 'null' AS arm, vb, CASE WHEN np > med THEN 1 ELSE 0 END AS cv
         |  FROM v CROSS JOIN m
         |  UNION ALL
         |  SELECT 'uplift', vb,
         |         CASE WHEN (CASE WHEN vb = 1 THEN np * 6 // 5 ELSE np END) > med
         |              THEN 1 ELSE 0 END
         |  FROM v CROSS JOIN m),
         |agg AS (SELECT arm,
         |               CAST(sum(CASE WHEN vb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         |               CAST(sum(CASE WHEN vb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         |               CAST(sum(CASE WHEN vb = 0 THEN cv ELSE 0 END) AS BIGINT) AS ca,
         |               CAST(sum(CASE WHEN vb = 1 THEN cv ELSE 0 END) AS BIGINT) AS cb
         |        FROM arms GROUP BY arm)
         |SELECT arm, na, nb, ca, cb,
         |       CAST(cb * na * 1000 // greatest(ca * nb, 1) AS BIGINT) AS lift_milli,
         |       CAST(CASE WHEN 10000 * CAST(ca*nb - cb*na AS HUGEINT)
         |                        * CAST(ca*nb - cb*na AS HUGEINT) * (na+nb)
         |                  > 38415 * CAST(na AS HUGEINT) * nb * (ca+cb) * (na+nb-ca-cb)
         |            THEN 1 ELSE 0 END AS BIGINT) AS significant
         |FROM agg ORDER BY arm""".stripMargin
    ) { (s, dir) =>
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val u = Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"))
        .cache() // histogram + assignment + both arms
      val h = u.groupBy(col("np").as("v")).agg(count(lit(1)).as("k"))
      val cum = h.select(col("v").as("av"))
        .join(h.select(col("v").as("bv"), col("k")), col("bv") <= col("av"))
        .groupBy("av").agg(sum(col("k")).as("cm"))
      val nu = u.agg(count(lit(1)).as("n"))
      val med = cum.crossJoin(broadcast(nu)).filter(col("cm") * 2 >= col("n"))
        .agg(min(col("av")).as("med"))
      val v = u.select(col("user_id"), col("np"),
        (md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2).as("vb"))
      val arms = v.crossJoin(broadcast(med))
        .select(lit("null").as("arm"), col("vb"),
          when(col("np") > col("med"), 1L).otherwise(0L).as("cv"))
        .unionAll(v.crossJoin(broadcast(med))
          .select(lit("uplift").as("arm"), col("vb"),
            when(when(col("vb") === 1L, expr("np * 6 div 5")).otherwise(col("np"))
              > col("med"), 1L).otherwise(0L).as("cv")))
      val agg2 = arms.groupBy("arm")
        .agg(sum(when(col("vb") === 0L, 1L).otherwise(0L)).as("na"),
          sum(when(col("vb") === 1L, 1L).otherwise(0L)).as("nb"),
          sum(when(col("vb") === 0L, col("cv")).otherwise(0L)).as("ca"),
          sum(when(col("vb") === 1L, col("cv")).otherwise(0L)).as("cb"))
      val diff = (col("ca") * col("nb") - col("cb") * col("na")).cast(d38)
      agg2.select(col("arm"), col("na"), col("nb"), col("ca"), col("cb"),
          expr("CAST(cb * na * 1000 div greatest(ca * nb, 1) AS BIGINT)").as("lift_milli"),
          when(lit(10000).cast(d38) * diff * diff * (col("na") + col("nb")).cast(d38)
            > lit(38415).cast(d38) * col("na").cast(d38) * col("nb").cast(d38)
              * (col("ca") + col("cb")).cast(d38)
              * (col("na") + col("nb") - col("ca") - col("cb")).cast(d38), 1L)
            .otherwise(0L).as("significant"))
        .orderBy("arm")
    },

    // Kaplan–Meier survival curve — time-to-first-error per user under a
    // per-user consent window ((id mod 7)+1 days: deterministic staggered
    // right-censoring, the shape every retention/reliability analysis
    // has): a user DIES in the 12 h bin of their first error if it lands
    // inside their consent window, else is CENSORED when consent ends.
    // The 14-bin (death, censor) histogram is the only data-scale
    // output; the KM product Π(1 − d_b/n_b) runs as one ordered fold
    // over it (q143's discipline — both engines multiply the same IEEE
    // doubles in the same bin order), with censors leaving the risk set
    // at bin END (deaths-before-censors convention, stated here because
    // the estimate depends on it). At 100 TB: one grouped pass to
    // per-user (entry, first-error), one to the histogram — the curve
    // itself is metadata.
    q("q256_kaplan_meier",
      "KM survival of time-to-first-error under staggered consent censoring, 12h bins")(
      """WITH RECURSIVE u AS (SELECT user_id, min(ts::TIMESTAMP) AS t0,
        |                  min(CASE WHEN event_type = 'error' THEN ts::TIMESTAMP END) AS te,
        |                  (user_id % 7 + 1) AS cd
        |           FROM events GROUP BY user_id),
        |ev AS (SELECT user_id,
        |              CASE WHEN te IS NOT NULL AND epoch_us(te) - epoch_us(t0) < cd * 86400000000
        |                   THEN (epoch_us(te) - epoch_us(t0)) // 43200000000 + 1 END AS db,
        |              cd * 2 AS cb2 FROM u),
        |bins AS (SELECT unnest(generate_series(1, 14)) AS b),
        |dh AS (SELECT db AS b, CAST(count(*) AS BIGINT) AS d FROM ev
        |       WHERE db IS NOT NULL GROUP BY db),
        |ch AS (SELECT cb2 AS b, CAST(count(*) AS BIGINT) AS c FROM ev
        |       WHERE db IS NULL GROUP BY cb2),
        |hist AS (SELECT bins.b, coalesce(dh.d, 0) AS d, coalesce(ch.c, 0) AS c
        |         FROM bins LEFT JOIN dh ON dh.b = bins.b LEFT JOIN ch ON ch.b = bins.b),
        |nu AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
        |r AS (SELECT h.b, nu.n AS n_risk, h.d, h.c,
        |             1.0 - h.d / CAST(nu.n AS DOUBLE) AS surv
        |      FROM hist h CROSS JOIN nu WHERE h.b = 1
        |      UNION ALL
        |      SELECT h.b, r.n_risk - r.d - r.c, h.d, h.c,
        |             r.surv * (1 - h.d / CAST(greatest(r.n_risk - r.d - r.c, 1) AS DOUBLE))
        |      FROM r JOIN hist h ON h.b = r.b + 1)
        |SELECT CAST(b AS BIGINT) AS bin, n_risk, d AS n_deaths, c AS n_censored,
        |       round(surv, 6) AS surv
        |FROM r ORDER BY bin""".stripMargin
    ) { (s, dir) =>
      val u = Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(min(us(col("ts"))).as("t0"),
          min(when(col("event_type") === "error", us(col("ts")))).as("te"))
        .select(col("user_id"), col("t0"), col("te"),
          (col("user_id") % 7 + 1).as("cd"))
        .select(col("user_id"), col("cd"),
          when(col("te").isNotNull && col("te") - col("t0") < col("cd") * 86400000000L,
            expr("(te - t0) div 43200000000") + 1).as("db"))
        .cache() // death histogram + censor histogram + user count
      val dh = u.filter(col("db").isNotNull)
        .groupBy(col("db").as("b")).agg(count(lit(1)).as("d"))
      val ch = u.filter(col("db").isNull)
        .groupBy((col("cd") * 2).as("b")).agg(count(lit(1)).as("c"))
      val hist = s.range(1, 15).select(col("id").as("b"))
        .join(dh, Seq("b"), "left").join(ch, Seq("b"), "left")
        .select(col("b"), coalesce(col("d"), lit(0L)).as("d"),
          coalesce(col("c"), lit(0L)).as("c"))
      val nu = u.agg(count(lit(1)).as("n"))
      // the whole curve folds out of the 14-row histogram in one pass:
      // acc = (risk set, running product, emitted rows)
      hist.agg(sort_array(collect_list(struct(col("b"), col("d"), col("c")))).as("hs"))
        .crossJoin(broadcast(nu))
        .select(aggregate(col("hs"),
          named_struct(lit("n"), col("n"), lit("s"), lit(1.0),
            lit("out"), expr("CAST(array() AS ARRAY<STRUCT<bin BIGINT, n_risk BIGINT, n_deaths BIGINT, n_censored BIGINT, surv DOUBLE>>)")),
          (acc, x) => {
            val n = acc.getField("n")
            val term = lit(1.0) - x.getField("d").cast("double") /
              greatest(n, lit(1L)).cast("double")
            val sNew = acc.getField("s") * term
            named_struct(lit("n"), n - x.getField("d") - x.getField("c"),
              lit("s"), sNew,
              lit("out"), concat(acc.getField("out"), array(named_struct(
                lit("bin"), x.getField("b"), lit("n_risk"), n,
                lit("n_deaths"), x.getField("d"),
                lit("n_censored"), x.getField("c"),
                lit("surv"), round(sNew, 6)))))
          }).as("st"))
        .select(explode(col("st.out")).as("r"))
        .select(col("r.bin").as("bin"), col("r.n_risk").as("n_risk"),
          col("r.n_deaths").as("n_deaths"), col("r.n_censored").as("n_censored"),
          col("r.surv").as("surv"))
        .orderBy("bin")
    },

    // Two-sample Kolmogorov–Smirnov test, exact in integers — the
    // UNBINNED complement to the q229 PSI monitor: D = max |F₁ − F₂| is
    // computed as max |c₁·N₂ − c₂·N₁| over the value spine (cross-
    // multiplied empirical CDFs — no float CDF ever exists), and the
    // α=0.05 verdict is the cleared inequality 10⁴·D_cross² >
    // 18442·N₁·N₂·(N₁+N₂) in DECIMAL. Same harness discipline as q255:
    // the NULL arm (event-id-parity halves of the same distribution)
    // must stay quiet, the injected ×1.1 scale shift must fire — and
    // both verdicts land within ~15% of the critical value, so a float
    // boundary here would be a real cross-engine risk. Values quantize
    // to deci-units first: the CDFs walk a ≤|value range|·10-bin
    // histogram, so the cumulative windows are partitioned (arm, grp)
    // over BINS — bounded by value resolution, never by row count
    // (q194's discipline). At 100 TB: one grouped count to the
    // histogram; everything after is metadata.
    q("q257_ks_test",
      "exact two-sample KS: null halves stay quiet, injected 10% scale shift fires")(
      """WITH s0 AS (SELECT event_id % 2 AS grp, CAST(round(value * 10) AS BIGINT) AS v10
        |            FROM events),
        |samp AS (
        |  SELECT 'null' AS arm, grp, v10 FROM s0
        |  UNION ALL
        |  SELECT 'shift', grp, CASE WHEN grp = 1 THEN v10 * 11 // 10 ELSE v10 END FROM s0),
        |hist AS (SELECT arm, grp, v10, CAST(count(*) AS BIGINT) AS k
        |         FROM samp GROUP BY arm, grp, v10),
        |spine AS (SELECT DISTINCT arm, v10 FROM hist),
        |g AS (SELECT spine.arm, spine.v10, gg.grp, coalesce(hist.k, 0) AS k
        |      FROM spine CROSS JOIN (SELECT unnest([0, 1]) AS grp) gg
        |      LEFT JOIN hist ON hist.arm = spine.arm AND hist.grp = gg.grp
        |                    AND hist.v10 = spine.v10),
        |cum AS (SELECT arm, v10, grp,
        |               CAST(sum(k) OVER (PARTITION BY arm, grp ORDER BY v10
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
        |        FROM g),
        |w AS (SELECT arm, v10,
        |             max(CASE WHEN grp = 0 THEN c END) AS c1,
        |             max(CASE WHEN grp = 1 THEN c END) AS c2
        |      FROM cum GROUP BY arm, v10),
        |nn AS (SELECT arm, max(c1) AS n1, max(c2) AS n2 FROM w GROUP BY arm),
        |d AS (SELECT w.arm, CAST(max(abs(w.c1 * nn.n2 - w.c2 * nn.n1)) AS BIGINT) AS d_cross
        |      FROM w JOIN nn ON nn.arm = w.arm GROUP BY w.arm)
        |SELECT d.arm, nn.n1, nn.n2, d.d_cross,
        |       CAST(d_cross * 1000 // (nn.n1 * nn.n2) AS BIGINT) AS d_milli,
        |       CAST(CASE WHEN 10000 * CAST(d_cross AS HUGEINT) * d_cross
        |                  > 18442 * CAST(nn.n1 AS HUGEINT) * nn.n2 * (nn.n1 + nn.n2)
        |            THEN 1 ELSE 0 END AS BIGINT) AS significant
        |FROM d JOIN nn ON nn.arm = d.arm ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val s0 = Tables(s, dir, "events")
        .select((col("event_id") % 2).as("grp"),
          round(col("value") * 10).cast("long").as("v10"))
      val samp = s0.select(lit("null").as("arm"), col("grp"), col("v10"))
        .unionAll(s0.select(lit("shift").as("arm"), col("grp"),
          when(col("grp") === 1L, expr("v10 * 11 div 10")).otherwise(col("v10")).as("v10")))
      val hist = samp.groupBy("arm", "grp", "v10").agg(count(lit(1)).as("k"))
        .cache() // spine + the grouped left-join
      val g = hist.select(col("arm").as("sarm"), col("v10").as("sv")).distinct()
        .select(col("sarm"), col("sv"), explode(array(lit(0L), lit(1L))).as("sgrp"))
        .join(hist, col("sarm") === col("arm") && col("sgrp") === col("grp")
          && col("sv") === col("v10"), "left")
        .select(col("sarm").as("arm"), col("sv").as("v10"), col("sgrp").as("grp"),
          coalesce(col("k"), lit(0L)).as("k"))
      val win = Window.partitionBy("arm", "grp").orderBy("v10")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val w = g.select(col("arm"), col("v10"), col("grp"),
          sum(col("k")).over(win).as("c"))
        .groupBy("arm", "v10")
        .agg(max(when(col("grp") === 0L, col("c"))).as("c1"),
          max(when(col("grp") === 1L, col("c"))).as("c2"))
        .cache() // totals + the max-deviation scan
      val nn = w.groupBy("arm").agg(max(col("c1")).as("n1"), max(col("c2")).as("n2"))
      val d = w.join(nn, Seq("arm"))
        .groupBy("arm")
        .agg(max(abs(col("c1") * col("n2") - col("c2") * col("n1"))).as("d_cross"))
      d.join(nn, Seq("arm"))
        .select(col("arm"), col("n1"), col("n2"), col("d_cross"),
          expr("CAST(d_cross * 1000 div (n1 * n2) AS BIGINT)").as("d_milli"),
          when(lit(10000).cast(d38) * col("d_cross").cast(d38) * col("d_cross").cast(d38)
            > lit(18442).cast(d38) * col("n1").cast(d38) * col("n2").cast(d38)
              * (col("n1") + col("n2")).cast(d38), 1L)
            .otherwise(0L).as("significant"))
        .orderBy("arm")
    },

    // Log-rank test — the survival twin of the q255/q257 significance
    // harness: do two cohorts (stable hash split) share a hazard curve?
    // Same two-arm discipline: the NULL arm compares the real (identical)
    // time-to-first-error under q256's consent censoring and must stay
    // quiet; the HAZARD arm halves cohort B's failure times and must
    // fire. O₁/E₁/V accumulate over the 14-bin death/censor histogram in
    // one ordered fold; each term is ONE division of two exactly-
    // representable integer products (E₁ += d·n₁/n; V += d·n₁·n₂·(n−d)
    // / (n²·(n−1)), numerators ≤ N⁴ < 2⁵³), so both engines sum
    // identical doubles in identical order and χ² = (O₁−E₁)²/V is
    // bit-reproducible — the q143 discipline applied to a statistic.
    // At 100 TB the histogram is the only data-scale artifact (one
    // grouped pass per arm); the test itself is 14 rows of metadata.
    q("q258_logrank",
      "log-rank survival test: null cohorts stay quiet, halved failure times fire")(
      s"""WITH RECURSIVE u AS (SELECT user_id, epoch_us(min(ts::TIMESTAMP)) AS t0,
         |                  epoch_us(min(CASE WHEN event_type = 'error' THEN ts::TIMESTAMP END)) AS te,
         |                  (user_id % 7 + 1) AS cd,
         |                  ${md5LongSql("'lrk:' || CAST(user_id AS VARCHAR)")} % 2 AS g
         |           FROM events GROUP BY user_id),
         |arms AS (
         |  SELECT 'null' AS arm, u.*, te - t0 AS d0 FROM u
         |  UNION ALL
         |  SELECT 'hazard', u.*, CASE WHEN g = 1 THEN (te - t0) // 2 ELSE te - t0 END FROM u),
         |ev AS (SELECT arm, g,
         |              CASE WHEN d0 IS NOT NULL AND d0 < cd * 86400000000
         |                   THEN d0 // 43200000000 + 1 END AS db,
         |              cd * 2 AS cb2
         |       FROM arms),
         |hist AS (SELECT arm, coalesce(db, cb2) AS b,
         |                CAST(sum(CASE WHEN db IS NOT NULL AND g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
         |                CAST(sum(CASE WHEN db IS NOT NULL AND g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
         |                CAST(sum(CASE WHEN db IS NULL AND g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         |                CAST(sum(CASE WHEN db IS NULL AND g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
         |         FROM ev GROUP BY arm, coalesce(db, cb2)),
         |hx AS (SELECT hist.*, row_number() OVER (PARTITION BY arm ORDER BY b) AS i,
         |              count(*) OVER (PARTITION BY arm) AS ni
         |       FROM hist),
         |nn AS (SELECT CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |              CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2
         |       FROM u),
         |r AS (SELECT hx.arm, hx.i, hx.ni,
         |             nn.n1 - hx.d1 - hx.c1 AS n1, nn.n2 - hx.d2 - hx.c2 AS n2,
         |             CAST(hx.d1 AS BIGINT) AS o1,
         |             CASE WHEN hx.d1 + hx.d2 > 0 AND nn.n1 + nn.n2 > 1
         |                  THEN CAST((hx.d1 + hx.d2) * nn.n1 AS DOUBLE) / (nn.n1 + nn.n2)
         |                  ELSE 0.0 END AS e1,
         |             CASE WHEN hx.d1 + hx.d2 > 0 AND nn.n1 + nn.n2 > 1
         |                  THEN CAST((hx.d1 + hx.d2) * nn.n1 * nn.n2
         |                            * (nn.n1 + nn.n2 - hx.d1 - hx.d2) AS DOUBLE)
         |                       / CAST((nn.n1 + nn.n2) * (nn.n1 + nn.n2) * (nn.n1 + nn.n2 - 1) AS DOUBLE)
         |                  ELSE 0.0 END AS v
         |      FROM hx CROSS JOIN nn WHERE hx.i = 1
         |      UNION ALL
         |      SELECT h.arm, h.i, h.ni,
         |             r.n1 - h.d1 - h.c1, r.n2 - h.d2 - h.c2,
         |             r.o1 + h.d1,
         |             r.e1 + CASE WHEN h.d1 + h.d2 > 0 AND r.n1 + r.n2 > 1
         |                    THEN CAST((h.d1 + h.d2) * r.n1 AS DOUBLE) / (r.n1 + r.n2)
         |                    ELSE 0.0 END,
         |             r.v + CASE WHEN h.d1 + h.d2 > 0 AND r.n1 + r.n2 > 1
         |                   THEN CAST((h.d1 + h.d2) * r.n1 * r.n2
         |                             * (r.n1 + r.n2 - h.d1 - h.d2) AS DOUBLE)
         |                        / CAST((r.n1 + r.n2) * (r.n1 + r.n2) * (r.n1 + r.n2 - 1) AS DOUBLE)
         |                   ELSE 0.0 END
         |      FROM r JOIN hx h ON h.arm = r.arm AND h.i = r.i + 1)
         |SELECT arm, o1, round(e1, 4) AS e1, round(v, 4) AS v,
         |       round((o1 - e1) * (o1 - e1) / v, 4) AS chi2,
         |       CAST(CASE WHEN (o1 - e1) * (o1 - e1) / v > 3.8415 THEN 1 ELSE 0 END AS BIGINT)
         |         AS significant
         |FROM r WHERE i = ni ORDER BY arm""".stripMargin
    ) { (s, dir) =>
      val u = Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(min(us(col("ts"))).as("t0"),
          min(when(col("event_type") === "error", us(col("ts")))).as("te"))
        .select(col("user_id"), col("t0"), col("te"),
          (col("user_id") % 7 + 1).as("cd"),
          (md5Long(concat(lit("lrk:"), col("user_id").cast("string"))) % 2).as("g"))
        .cache() // both arms + the cohort sizes
      val arms = u.select(lit("null").as("arm"), col("g"), col("cd"),
          (col("te") - col("t0")).as("d0"))
        .unionAll(u.select(lit("hazard").as("arm"), col("g"), col("cd"),
          when(col("g") === 1L, expr("(te - t0) div 2")).otherwise(col("te") - col("t0")).as("d0")))
      val ev = arms.select(col("arm"), col("g"),
        when(col("d0").isNotNull && col("d0") < col("cd") * 86400000000L,
          expr("d0 div 43200000000") + 1).as("db"),
        (col("cd") * 2).as("cb2"))
      val hist = ev.groupBy(col("arm"), coalesce(col("db"), col("cb2")).as("b"))
        .agg(sum(when(col("db").isNotNull && col("g") === 0L, 1L).otherwise(0L)).as("d1"),
          sum(when(col("db").isNotNull && col("g") === 1L, 1L).otherwise(0L)).as("d2"),
          sum(when(col("db").isNull && col("g") === 0L, 1L).otherwise(0L)).as("c1"),
          sum(when(col("db").isNull && col("g") === 1L, 1L).otherwise(0L)).as("c2"))
      val nn = u.agg(sum(when(col("g") === 0L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("g") === 1L, 1L).otherwise(0L)).as("n2"))
      // ordered fold per arm over the ≤14-bin histogram: state =
      // (remaining n1, n2, O1, E1, V), each term one exact-int division
      hist.groupBy("arm")
        .agg(sort_array(collect_list(struct(col("b"), col("d1"), col("d2"),
          col("c1"), col("c2")))).as("hs"))
        .crossJoin(broadcast(nn))
        .select(col("arm"), aggregate(col("hs"),
          named_struct(lit("n1"), col("n1"), lit("n2"), col("n2"),
            lit("o1"), lit(0L), lit("e1"), lit(0.0), lit("v"), lit(0.0)),
          (acc, x) => {
            val n1 = acc.getField("n1"); val n2 = acc.getField("n2")
            val nb = n1 + n2
            val db = x.getField("d1") + x.getField("d2")
            val live = db > lit(0L) && nb > lit(1L)
            val eTerm = when(live, (db * n1).cast("double") / nb).otherwise(lit(0.0))
            val vTerm = when(live,
              (db * n1 * n2 * (nb - db)).cast("double")
                / (nb * nb * (nb - 1)).cast("double")).otherwise(lit(0.0))
            named_struct(
              lit("n1"), n1 - x.getField("d1") - x.getField("c1"),
              lit("n2"), n2 - x.getField("d2") - x.getField("c2"),
              lit("o1"), acc.getField("o1") + x.getField("d1"),
              lit("e1"), acc.getField("e1") + eTerm,
              lit("v"), acc.getField("v") + vTerm)
          }).as("st"))
        .select(col("arm"), col("st.o1").as("o1"),
          round(col("st.e1"), 4).as("e1"), round(col("st.v"), 4).as("v"),
          round((col("st.o1") - col("st.e1")) * (col("st.o1") - col("st.e1"))
            / col("st.v"), 4).as("chi2"),
          when((col("st.o1") - col("st.e1")) * (col("st.o1") - col("st.e1"))
            / col("st.v") > 3.8415, 1L).otherwise(0L).as("significant"))
        .orderBy("arm")
    },

    // CUSUM sustained-shift detector with a synthetic canary — the
    // change-point complement to q250's spike test (a +μ/4-allowance
    // CUSUM accumulates small persistent drifts a per-hour 3σ test never
    // sees), validated the way production alerting is: the NULL arm runs
    // the real (stationary) series and must raise ZERO alarms; the
    // CANARY arm injects an exactly-μ/2 level shift at hour 400 and must
    // alarm — detection latency (theory ≈ h/(δ−k) = 20 h, measured
    // 14–33 h across series) is the published number. Everything stays
    // in integers by working in 672·S space: T ← max(0, T + 672y −
    // 5·S₁₆₈) (allowance μ/4), the canary subtracts only 3·S₁₆₈ after
    // hour 400 (672·μ/2 = 2·S₁₆₈ exactly), alarm at T > 20·S₁₆₈ (5μ).
    // One fold per (arm, series) over the zero-filled spine — q247's
    // shape; at 100 TB the monitor costs the grouped count the ingest
    // already runs.
    q("q260_cusum_canary",
      "integer CUSUM: zero alarms on the real series, injected mu/2 shift caught in ~20h")(
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
        |base AS (SELECT event_type, CAST(sum(CASE WHEN idx <= 168 THEN y ELSE 0 END) AS BIGINT) AS s168,
        |                CAST(max(idx) AS BIGINT) AS n FROM s GROUP BY event_type),
        |arms AS (SELECT 'null' AS arm UNION ALL SELECT 'canary'),
        |r AS (
        |  SELECT arms.arm, s.event_type, s.idx, CAST(0 AS BIGINT) AS t,
        |         CAST(0 AS BIGINT) AS nal, CAST(NULL AS BIGINT) AS fst
        |  FROM s CROSS JOIN arms WHERE s.idx = 168
        |  UNION ALL
        |  SELECT r.arm, n.event_type, n.idx,
        |         greatest(0, r.t + 672 * n.y
        |                   - CASE WHEN r.arm = 'canary' AND n.idx > 400 THEN 3 ELSE 5 END * base.s168),
        |         r.nal + CASE WHEN greatest(0, r.t + 672 * n.y
        |                   - CASE WHEN r.arm = 'canary' AND n.idx > 400 THEN 3 ELSE 5 END * base.s168)
        |                   > 20 * base.s168 THEN 1 ELSE 0 END,
        |         coalesce(r.fst, CASE WHEN greatest(0, r.t + 672 * n.y
        |                   - CASE WHEN r.arm = 'canary' AND n.idx > 400 THEN 3 ELSE 5 END * base.s168)
        |                   > 20 * base.s168 THEN n.idx END)
        |  FROM r JOIN s n ON n.event_type = r.event_type AND n.idx = r.idx + 1
        |       JOIN base ON base.event_type = r.event_type)
        |SELECT r.arm, r.event_type, r.nal AS n_alarm_hours, r.fst AS first_alarm_idx,
        |       r.fst - 401 AS detect_latency
        |FROM r JOIN base ON base.event_type = r.event_type
        |WHERE r.idx = base.n ORDER BY 1, 2""".stripMargin
    ) { (s, dir) =>
      val b = Tables(s, dir, "events")
        .selectExpr("event_type", "cast(ts as bigint) div 3600 AS hb")
        .groupBy("event_type", "hb").agg(count(lit(1)).as("y"))
        .cache()
      val bounds = b.agg(min(col("hb")).as("lo"), max(col("hb")).as("hi"))
      val spine = b.select(col("event_type").as("sty")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("sty"), col("lo"), explode(sequence(col("lo"), col("hi"))).as("shb"))
      val series = spine.join(b,
          col("sty") === col("event_type") && col("shb") === col("hb"), "left")
        .select(col("sty").as("event_type"), (col("shb") - col("lo") + 1).as("idx"),
          coalesce(col("y"), lit(0L)).as("y"))
      val folded = series.groupBy("event_type")
        .agg(sum(when(col("idx") <= 168, col("y")).otherwise(0L)).as("s168"),
          sort_array(collect_list(struct(col("idx"), col("y")))).as("sy"))
        .crossJoin(broadcast(
          s.range(1).select(explode(array(lit("null"), lit("canary"))).as("arm"))))
      folded.select(col("arm"), col("event_type"),
          aggregate(
            filter(col("sy"), x => x.getField("idx") > 168),
            named_struct(lit("t"), lit(0L), lit("nal"), lit(0L),
              lit("fst"), lit(null).cast("long")),
            (acc, x) => {
              val sub = when(col("arm") === "canary" && x.getField("idx") > 400, 3L)
                .otherwise(5L)
              val t = greatest(lit(0L),
                acc.getField("t") + lit(672L) * x.getField("y") - sub * col("s168"))
              val alarm = t > lit(20L) * col("s168")
              named_struct(lit("t"), t,
                lit("nal"), acc.getField("nal") + when(alarm, 1L).otherwise(0L),
                lit("fst"), coalesce(acc.getField("fst"),
                  when(alarm, x.getField("idx"))))
            }).as("st"))
        .select(col("arm"), col("event_type"),
          col("st.nal").as("n_alarm_hours"),
          col("st.fst").as("first_alarm_idx"),
          (col("st.fst") - 401).as("detect_latency"))
        .orderBy("arm", "event_type")
    },

    // Isotonic regression (PAV) calibration — the monotone-fit step that
    // turns a raw score→rate curve into a usable calibrator. Instead of
    // the sequential pool-adjacent-violators loop, the fit uses PAV's
    // CLOSED FORM: fitted(i) = max_{j≤i} min_{k≥i} avg(y over bins
    // j..k) — three nested ranges over the BIN histogram (bins³ ≤ 1000
    // rows of metadata), fully declarative in both engines, provably
    // equal to the pooled solution. Each interval average is one
    // division of exact integer sums, so min/max compare identical
    // doubles. The input relation is a REAL noisy monotone curve built
    // from the corpus's own functional dependency (token count vs
    // n_chars) plus deterministic hash jitter on the feature and 10%
    // hash label noise — raw rates violate monotonicity at both fixture
    // scales, so the pooling genuinely bites. At 100 TB: one grouped
    // pass to the 10-bin histogram; the fit is metadata.
    q("q262_isotonic_calibration",
      "PAV monotone calibration via the max-min closed form over score bins")(
      s"""WITH d AS (SELECT n_chars
         |                  + ${md5LongSql("'j:' || CAST(doc_id AS VARCHAR)")} % 161 - 80 AS xj,
         |                  CASE WHEN (CASE WHEN len(str_split(text, ' ')) > 55 THEN 1 ELSE 0 END)
         |                       + (CASE WHEN ${md5LongSql("'n:' || CAST(doc_id AS VARCHAR)")} % 10 = 0
         |                          THEN 1 ELSE 0 END) = 1
         |                  THEN 1 ELSE 0 END AS y
         |           FROM documents),
         |h AS (SELECT greatest(least(CAST(floor((xj - 150) / 40) AS BIGINT), 9), 0) AS bin,
         |             CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s
         |      FROM d GROUP BY 1),
         |iv AS (SELECT a.bin AS j, b.bin AS k,
         |              CAST(sum(c.s) AS DOUBLE) / sum(c.n) AS a
         |       FROM h a JOIN h b ON a.bin <= b.bin
         |            JOIN h c ON c.bin BETWEEN a.bin AND b.bin
         |       GROUP BY a.bin, b.bin),
         |inner_min AS (SELECT h.bin AS i, iv.j, min(iv.a) AS mn
         |              FROM h JOIN iv ON iv.j <= h.bin AND iv.k >= h.bin
         |              GROUP BY h.bin, iv.j),
         |fit AS (SELECT i, max(mn) AS f FROM inner_min GROUP BY i)
         |SELECT h.bin, h.n, h.s, round(CAST(h.s AS DOUBLE) / h.n, 4) AS rate,
         |       round(fit.f, 4) AS fitted
         |FROM h JOIN fit ON fit.i = h.bin ORDER BY h.bin""".stripMargin
    ) { (s, dir) =>
      val d = Tables.fanout(s, dir, "documents")
        .select(
          (col("n_chars")
            + md5Long(concat(lit("j:"), col("doc_id").cast("string"))) % 161 - 80).as("xj"),
          when(when(size(split(col("text"), " ")) > 55, 1L).otherwise(0L)
            + when(md5Long(concat(lit("n:"), col("doc_id").cast("string"))) % 10 === 0, 1L)
              .otherwise(0L) === 1L, 1L).otherwise(0L).as("y"))
      val h = d.groupBy(
          greatest(least(floor((col("xj") - 150) / 40).cast("long"), lit(9L)), lit(0L)).as("bin"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
        .cache() // three arms of the bins³ interval build + the output join
      val iv = h.select(col("bin").as("j"), col("n").as("jn"))
        .join(h.select(col("bin").as("k")), col("j") <= col("k"))
        .join(h.select(col("bin").as("cb"), col("n").as("cn"), col("s").as("cs")),
          col("cb") >= col("j") && col("cb") <= col("k"))
        .groupBy("j", "k")
        .agg((sum(col("cs")).cast("double") / sum(col("cn"))).as("a"))
      val innerMin = h.select(col("bin").as("i"))
        .join(iv, col("j") <= col("i") && col("k") >= col("i"))
        .groupBy("i", "j").agg(min(col("a")).as("mn"))
      val fit = innerMin.groupBy("i").agg(max(col("mn")).as("f"))
      h.join(fit, col("bin") === col("i"))
        .select(col("bin"), col("n"), col("s"),
          round(col("s").cast("double") / col("n"), 4).as("rate"),
          round(col("f"), 4).as("fitted"))
        .orderBy("bin")
    },

    // Spearman rank correlation, exact in integers — the robust twin of
    // Pearson (q100): average ranks over tied values are half-integers,
    // so the whole computation runs in DOUBLED rank space (2r = 2·below
    // + ties + 1, an integer from the value histogram — q246's
    // triangular discipline, never a per-row rank window), and ρ is
    // published as the exact integer 10⁶·(1 − 6Σd²/(n(n²−1))) over the
    // 4×-scaled Σd². Two pairs prove discrimination: chars↔tokens is a
    // functional dependency (ρ ≈ 0.998) while chars↔hash-noise must
    // land at ≈ 0. At 100 TB: two value histograms + one row-level
    // lookup join per pair — rank tables are value-cardinality, the
    // data-scale work is one grouped count.
    q("q263_spearman",
      "exact integer Spearman: functional pair near 1, hash-noise pair near 0")(
      s"""WITH src AS (SELECT CAST(n_chars AS BIGINT) AS x,
         |                    CAST(len(str_split(text, ' ')) AS BIGINT) AS y,
         |                    ${md5LongSql("'sp:' || CAST(doc_id AS VARCHAR)")} % 1000 AS z
         |             FROM documents),
         |p AS (SELECT 'chars_tokens' AS pair, x AS a, y AS b FROM src
         |      UNION ALL SELECT 'chars_noise', x, z FROM src),
         |ha AS (SELECT pair, a AS v, CAST(count(*) AS BIGINT) AS k FROM p GROUP BY pair, a),
         |hb AS (SELECT pair, b AS v, CAST(count(*) AS BIGINT) AS k FROM p GROUP BY pair, b),
         |ra AS (SELECT x.pair, x.v,
         |              2 * CAST(coalesce(sum(CASE WHEN y.v < x.v THEN y.k END), 0) AS BIGINT)
         |                + x.k + 1 AS r2
         |       FROM ha x JOIN ha y ON y.pair = x.pair GROUP BY x.pair, x.v, x.k),
         |rb AS (SELECT x.pair, x.v,
         |              2 * CAST(coalesce(sum(CASE WHEN y.v < x.v THEN y.k END), 0) AS BIGINT)
         |                + x.k + 1 AS r2
         |       FROM hb x JOIN hb y ON y.pair = x.pair GROUP BY x.pair, x.v, x.k),
         |j AS (SELECT p.pair, ra.r2 - rb.r2 AS dd
         |      FROM p JOIN ra ON ra.pair = p.pair AND ra.v = p.a
         |             JOIN rb ON rb.pair = p.pair AND rb.v = p.b),
         |agg AS (SELECT pair, CAST(count(*) AS BIGINT) AS n,
         |               CAST(sum(dd * dd) AS BIGINT) AS sd2 FROM j GROUP BY pair)
         |SELECT pair, n, sd2,
         |       CAST(1000000 - 3000000 * CAST(sd2 AS HUGEINT) // (2 * n * (n*n - 1)) AS BIGINT)
         |         AS rho_micro
         |FROM agg ORDER BY pair""".stripMargin
    ) { (s, dir) =>
      val src = Tables.fanout(s, dir, "documents")
        .select(col("n_chars").as("x"),
          size(split(col("text"), " ")).cast("long").as("y"),
          (md5Long(concat(lit("sp:"), col("doc_id").cast("string"))) % 1000).as("z"))
      val p = src.select(lit("chars_tokens").as("pair"), col("x").as("a"), col("y").as("b"))
        .unionAll(src.select(lit("chars_noise").as("pair"), col("x").as("a"), col("z").as("b")))
        .cache() // two histograms + the rank lookup join
      def rank2(side: String): org.apache.spark.sql.DataFrame = {
        val h = p.groupBy(col("pair"), col(side).as("v")).agg(count(lit(1)).as("k"))
        h.select(col("pair"), col("v").as("xv"), col("k").as("xk"))
          .join(h.select(col("pair"), col("v").as("yv"), col("k").as("yk")), Seq("pair"))
          .groupBy(col("pair"), col("xv"), col("xk"))
          .agg(coalesce(sum(when(col("yv") < col("xv"), col("yk"))), lit(0L)).as("below"))
          .select(col("pair"), col("xv").as("v"),
            (col("below") * 2 + col("xk") + 1).as("r2"))
      }
      val j = p
        .join(rank2("a").select(col("pair"), col("v").as("a"), col("r2").as("r2a")),
          Seq("pair", "a"))
        .join(rank2("b").select(col("pair"), col("v").as("b"), col("r2").as("r2b")),
          Seq("pair", "b"))
        .select(col("pair"), (col("r2a") - col("r2b")).as("dd"))
      j.groupBy("pair")
        .agg(count(lit(1)).as("n"), sum(col("dd") * col("dd")).as("sd2"))
        .select(col("pair"), col("n"), col("sd2"),
          (lit(1000000L) - (lit(3000000L).cast(org.apache.spark.sql.types.DecimalType(38, 0))
            * col("sd2").cast(org.apache.spark.sql.types.DecimalType(38, 0))
            / (lit(2L) * col("n") * (col("n") * col("n") - 1))
              .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .cast("long")).cast("long").as("rho_micro"))
        .orderBy("pair")
    },

    // Mann–Whitney U — the rank-based two-sample test that sees median/
    // stochastic-dominance shifts the mean-based z² (q255) can miss, and
    // KS's (q257) distribution-free sibling for location alternatives.
    // Everything derives from the per-(arm, value) histogram: the
    // doubled rank-sum 2R₁ = Σ k₁·(2·below + ties + 1) needs only a
    // cumulative window over BINS, U follows arithmetically, and the
    // normal-approximation verdict is the cleared inequality
    // 3·10⁴·(2R₁ − n₁(n₁+1) − n₁n₂)² > 38415·n₁n₂(n₁+n₂+1) in DECIMAL
    // (untied-σ approximation, stated; the margins here are ~10×). Null
    // arm quiet, injected ×1.1 scale shift fires, both scales.
    q("q264_mann_whitney",
      "exact-rank Mann-Whitney U: null halves quiet, 10% scale shift fires")(
      """WITH s0 AS (SELECT event_id % 2 AS grp, CAST(round(value * 10) AS BIGINT) AS v10
        |            FROM events),
        |samp AS (SELECT 'null' AS arm, grp, v10 FROM s0
        |         UNION ALL
        |         SELECT 'shift', grp, CASE WHEN grp = 1 THEN v10 * 11 // 10 ELSE v10 END FROM s0),
        |h AS (SELECT arm, v10,
        |             CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS k1,
        |             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS k2
        |      FROM samp GROUP BY arm, v10),
        |cum AS (SELECT arm, v10, k1, k2,
        |               CAST(coalesce(sum(k1 + k2) OVER (PARTITION BY arm ORDER BY v10
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below
        |        FROM h),
        |agg AS (SELECT arm, CAST(sum(k1) AS BIGINT) AS n1, CAST(sum(k2) AS BIGINT) AS n2,
        |               CAST(sum(k1 * (2 * below + (k1 + k2) + 1)) AS BIGINT) AS r1x2
        |        FROM cum GROUP BY arm)
        |SELECT arm, n1, n2,
        |       CAST((r1x2 - n1 * (n1 + 1)) // 2 AS BIGINT) AS u,
        |       CAST(CASE WHEN 30000 * CAST(r1x2 - n1*(n1+1) - n1*n2 AS HUGEINT)
        |                        * (r1x2 - n1*(n1+1) - n1*n2)
        |                  > 38415 * CAST(n1 AS HUGEINT) * n2 * (n1 + n2 + 1)
        |            THEN 1 ELSE 0 END AS BIGINT) AS significant
        |FROM agg ORDER BY arm""".stripMargin
    ) { (s, dir) =>
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val s0 = Tables(s, dir, "events")
        .select((col("event_id") % 2).as("grp"),
          round(col("value") * 10).cast("long").as("v10"))
      val samp = s0.select(lit("null").as("arm"), col("grp"), col("v10"))
        .unionAll(s0.select(lit("shift").as("arm"), col("grp"),
          when(col("grp") === 1L, expr("v10 * 11 div 10")).otherwise(col("v10")).as("v10")))
      val h = samp.groupBy("arm", "v10")
        .agg(sum(when(col("grp") === 0L, 1L).otherwise(0L)).as("k1"),
          sum(when(col("grp") === 1L, 1L).otherwise(0L)).as("k2"))
      val win = Window.partitionBy("arm").orderBy("v10").rowsBetween(Long.MinValue, -1)
      val agg2 = h.select(col("arm"), col("k1"), col("k2"),
          coalesce(sum(col("k1") + col("k2")).over(win), lit(0L)).as("below"))
        .groupBy("arm")
        .agg(sum(col("k1")).as("n1"), sum(col("k2")).as("n2"),
          sum(col("k1") * (col("below") * 2 + col("k1") + col("k2") + 1)).as("r1x2"))
      val dd = (col("r1x2") - col("n1") * (col("n1") + 1) - col("n1") * col("n2")).cast(d38)
      agg2.select(col("arm"), col("n1"), col("n2"),
          expr("CAST((r1x2 - n1 * (n1 + 1)) div 2 AS BIGINT)").as("u"),
          when(lit(30000).cast(d38) * dd * dd
            > lit(38415).cast(d38) * col("n1").cast(d38) * col("n2").cast(d38)
              * (col("n1") + col("n2") + 1).cast(d38), 1L)
            .otherwise(0L).as("significant"))
        .orderBy("arm")
    },

    // Theil–Sen robust trend — the breakdown-point-resistant slope the
    // stats family (q255/q257/q263/q264) still lacked: the LOWER MEDIAN of
    // all pairwise slopes of the hourly deci-value series per event_type,
    // against an OLS slope on the same series. Validation is the family's
    // contamination discipline run in reverse: a 5%-of-hours ×10 outlier
    // arm (hash-chosen hours, deterministic) must move OLS by orders of
    // magnitude while Theil–Sen barely shifts — the robustness IS the
    // checked quantity, not prose. Everything stays integer-exact: slopes
    // quantize to milli-units via truncating division ((1000·Δy) div Δt —
    // Spark `div` ≡ DuckDB `//` toward zero), and the median comes from
    // the (arm, series, slope) HISTOGRAM with a cumulative below-count
    // window, so the rank layer is slope-cardinality metadata, never a
    // global sort (q263/q264's rank-space lesson). Scale shape: the pair
    // join is per-(arm, series) on hour indices — (time bins)², pure
    // metadata regardless of row count; the hourly fold is the grouped
    // count the ingest already runs. OLS in the same pass: (1000·(n·Σty −
    // Σt·Σy)) div (n·Σt² − (Σt)²) in DECIMAL — one truncating division,
    // no float anywhere.
    q("q265_theil_sen",
      "Theil-Sen milli-slope vs OLS: 5% x10 outlier hours barely move the median")(
      s"""WITH b AS (SELECT event_type,
         |                  (CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 3600) AS hb,
         |                  CAST(sum(CAST(round(value * 10) AS BIGINT)) AS BIGINT) AS y
         |           FROM events GROUP BY event_type, hb),
         |lo AS (SELECT CAST(min(hb) AS BIGINT) AS lo FROM b),
         |s0 AS (SELECT event_type, hb - (SELECT lo FROM lo) + 1 AS t, y FROM b),
         |s AS (SELECT 'clean' AS arm, event_type, t, y FROM s0
         |      UNION ALL
         |      SELECT 'outlier', event_type, t,
         |             CASE WHEN ${md5LongSql("'ts:' || event_type || ':' || CAST(t AS VARCHAR)")} % 20 = 0
         |                  THEN y * 10 ELSE y END
         |      FROM s0),
         |pr AS (SELECT a.arm, a.event_type,
         |              (1000 * (b.y - a.y)) // (b.t - a.t) AS sm
         |       FROM s a JOIN s b ON b.arm = a.arm AND b.event_type = a.event_type
         |                        AND b.t > a.t),
         |h AS (SELECT arm, event_type, sm, CAST(count(*) AS BIGINT) AS k
         |      FROM pr GROUP BY arm, event_type, sm),
         |c AS (SELECT arm, event_type, sm, k,
         |             CAST(coalesce(sum(k) OVER (PARTITION BY arm, event_type ORDER BY sm
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below,
         |             CAST(sum(k) OVER (PARTITION BY arm, event_type) AS BIGINT) AS np
         |      FROM h),
         |med AS (SELECT arm, event_type, sm AS ts_slope_milli
         |        FROM c WHERE below < (np + 1) // 2 AND (np + 1) // 2 <= below + k),
         |ols AS (SELECT arm, event_type, CAST(count(*) AS BIGINT) AS n,
         |               CAST((1000 * (count(*) * CAST(sum(t * y) AS HUGEINT)
         |                             - CAST(sum(t) AS HUGEINT) * sum(y)))
         |                    // (count(*) * CAST(sum(t * t) AS HUGEINT)
         |                       - CAST(sum(t) AS HUGEINT) * sum(t)) AS BIGINT) AS ols_slope_milli
         |        FROM s GROUP BY arm, event_type)
         |SELECT ols.arm, ols.event_type, ols.n, med.ts_slope_milli, ols.ols_slope_milli
         |FROM ols JOIN med ON med.arm = ols.arm AND med.event_type = ols.event_type
         |ORDER BY 1, 2""".stripMargin
    ) { (sp, dir) =>
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val b = Tables(sp, dir, "events")
        .selectExpr("event_type", "cast(ts as bigint) div 3600 AS hb",
          "cast(round(value * 10) as bigint) AS dy")
        .groupBy("event_type", "hb").agg(sum(col("dy")).as("y"))
      val lo = b.agg(min(col("hb")).as("lo"))
      val s0 = b.crossJoin(broadcast(lo))
        .select(col("event_type"), (col("hb") - col("lo") + 1).as("t"), col("y"))
      val s = s0.select(lit("clean").as("arm"), col("event_type"), col("t"), col("y"))
        .unionAll(s0.select(lit("outlier").as("arm"), col("event_type"), col("t"),
          when(md5Long(concat(lit("ts:"), col("event_type"), lit(":"),
            col("t").cast("string"))) % 20 === 0, col("y") * 10)
            .otherwise(col("y")).as("y")))
        .cache() // pair join (both legs) + OLS fold
      val pr = s.select(col("arm"), col("event_type"), col("t").as("t1"), col("y").as("y1"))
        .join(s.select(col("arm"), col("event_type"), col("t").as("t2"), col("y").as("y2")),
          Seq("arm", "event_type"))
        .filter(col("t2") > col("t1"))
        .select(col("arm"), col("event_type"),
          expr("(1000 * (y2 - y1)) div (t2 - t1)").as("sm"))
      val h = pr.groupBy("arm", "event_type", "sm").agg(count(lit(1)).as("k"))
      val wBelow = Window.partitionBy("arm", "event_type").orderBy("sm")
        .rowsBetween(Long.MinValue, -1)
      val wAll = Window.partitionBy("arm", "event_type")
      val med = h.select(col("arm"), col("event_type"), col("sm"), col("k"),
          coalesce(sum(col("k")).over(wBelow), lit(0L)).as("below"),
          sum(col("k")).over(wAll).as("np"))
        .withColumn("medpos", expr("(np + 1) div 2"))
        .filter(col("below") < col("medpos") &&
          col("medpos") <= col("below") + col("k"))
        .select(col("arm"), col("event_type"), col("sm").as("ts_slope_milli"))
      val ols = s.groupBy("arm", "event_type")
        .agg(count(lit(1)).as("n"), sum(col("t") * col("y")).as("sty"),
          sum(col("t")).as("st"), sum(col("y")).as("sy"),
          sum(col("t") * col("t")).as("stt"))
        .select(col("arm"), col("event_type"), col("n"),
          expr("cast((1000 * (n * cast(sty as decimal(38,0)) - cast(st as decimal(38,0)) * sy)) div (n * cast(stt as decimal(38,0)) - cast(st as decimal(38,0)) * st) as bigint)")
            .as("ols_slope_milli"))
      ols.join(med, Seq("arm", "event_type"))
        .select(col("arm"), col("event_type"), col("n"),
          col("ts_slope_milli"), col("ols_slope_milli"))
        .orderBy("arm", "event_type")
    },

    // Benford first-digit audit — the forensic data-quality gate (fraud /
    // synthetic-data detection) over a money column, run with the stats
    // family's two-arm discipline: the QUIET arm is Benford BY
    // CONSTRUCTION (inverse-CDF on the same 10⁻⁵-quantized digit
    // probabilities the test uses — digit d·10^k + r with r < 10^k keeps
    // the planted leading digit exactly, all integer hashes), so its χ²
    // sits at the df=8 mean; the totalprice arm fires hard (an
    // order-total is a bounded sum, not a multiplicative process — the
    // audit DETECTING that is the point). No float anywhere: probabilities
    // are integer 10⁻⁵ literals (they sum to exactly 100000), the leading
    // digit is the first character of the integer-cents decimal string,
    // and each χ² term is ONE truncating division (10⁶·(10⁵·obs − N·p)²
    // in 38-digit space over 10⁵·N·p) summed over the fixed 9-digit
    // spine — missing digits are zero-filled by the spine join, never
    // dropped. Scale shape: one grouped count per arm + an 18-row
    // metadata join; the audit costs a single scan regardless of table
    // width.
    q("q266_benford_audit",
      "Benford first-digit chi2: synthetic Benford arm quiet, totalprice fires")(
      s"""WITH p AS (SELECT * FROM (VALUES (1, 30103), (2, 17609), (3, 12494),
         |                                 (4, 9691), (5, 7918), (6, 6695),
         |                                 (7, 5799), (8, 5115), (9, 4576))
         |                AS t(digit, prob)),
         |syn AS (SELECT CASE WHEN u < 30103 THEN 1 WHEN u < 47712 THEN 2
         |                    WHEN u < 60206 THEN 3 WHEN u < 69897 THEN 4
         |                    WHEN u < 77815 THEN 5 WHEN u < 84510 THEN 6
         |                    WHEN u < 90309 THEN 7 WHEN u < 95424 THEN 8
         |                    ELSE 9 END AS d,
         |               CASE k WHEN 0 THEN 1 WHEN 1 THEN 10 WHEN 2 THEN 100
         |                      ELSE 1000 END AS pw,
         |               r
         |        FROM (SELECT ${md5LongSql("'bf:' || CAST(o_orderkey AS VARCHAR)")} % 100000 AS u,
         |                     ${md5LongSql("'bk:' || CAST(o_orderkey AS VARCHAR)")} % 4 AS k,
         |                     ${md5LongSql("'br:' || CAST(o_orderkey AS VARCHAR)")} AS r
         |              FROM orders)),
         |v AS (SELECT 'benford_synth' AS arm,
         |             CAST(d * pw + (r % pw) AS BIGINT) AS cents FROM syn
         |      UNION ALL
         |      SELECT 'totalprice', CAST(round(o_totalprice * 100) AS BIGINT) FROM orders),
         |obs AS (SELECT arm, CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         |               CAST(count(*) AS BIGINT) AS obs
         |        FROM v GROUP BY arm, digit),
         |spine AS (SELECT a.arm, p.digit, p.prob FROM (SELECT DISTINCT arm FROM v) a
         |          CROSS JOIN p),
         |f AS (SELECT spine.arm, CAST(spine.digit AS BIGINT) AS digit,
         |             CAST(spine.prob AS BIGINT) AS prob, coalesce(obs.obs, 0) AS obs
         |      FROM spine LEFT JOIN obs ON obs.arm = spine.arm AND obs.digit = spine.digit),
         |n AS (SELECT arm, CAST(sum(obs) AS BIGINT) AS n FROM f GROUP BY arm),
         |dev AS (SELECT f.arm, f.digit, f.obs,
         |               CAST((n.n * f.prob) // 100000 AS BIGINT) AS exp_cnt,
         |               CAST((1000000 * (100000 * CAST(f.obs AS HUGEINT) - CAST(n.n AS HUGEINT) * f.prob)
         |                             * (100000 * CAST(f.obs AS HUGEINT) - CAST(n.n AS HUGEINT) * f.prob))
         |                    // (100000 * CAST(n.n AS HUGEINT) * f.prob) AS BIGINT) AS dev_micro
         |        FROM f JOIN n ON n.arm = f.arm),
         |tot AS (SELECT arm, CAST(sum(dev_micro) AS BIGINT) AS chi2_micro FROM dev GROUP BY arm)
         |SELECT dev.arm, dev.digit, dev.obs, dev.exp_cnt, dev.dev_micro, tot.chi2_micro,
         |       CAST(CASE WHEN tot.chi2_micro > 15507000 THEN 1 ELSE 0 END AS BIGINT) AS significant
         |FROM dev JOIN tot ON tot.arm = dev.arm
         |ORDER BY 1, 2""".stripMargin
    ) { (sp, dir) =>
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val orders = Tables(sp, dir, "orders")
      def h(tag: String) =
        md5Long(concat(lit(tag), col("o_orderkey").cast("string")))
      val syn = orders.select((h("bf:") % 100000).as("u"), (h("bk:") % 4).as("k"),
          h("br:").as("r"))
        .select(
          when(col("u") < 30103, 1).when(col("u") < 47712, 2)
            .when(col("u") < 60206, 3).when(col("u") < 69897, 4)
            .when(col("u") < 77815, 5).when(col("u") < 84510, 6)
            .when(col("u") < 90309, 7).when(col("u") < 95424, 8)
            .otherwise(9).as("d"),
          when(col("k") === 0, 1L).when(col("k") === 1, 10L)
            .when(col("k") === 2, 100L).otherwise(1000L).as("pw"),
          col("r"))
      val v = syn.select(lit("benford_synth").as("arm"),
          (col("d") * col("pw") + col("r") % col("pw")).cast("long").as("cents"))
        .unionAll(orders.select(lit("totalprice").as("arm"),
          round(col("o_totalprice") * 100).cast("long").as("cents")))
        .cache() // obs histogram + arm spine
      val obs = v.groupBy(col("arm"),
          substring(col("cents").cast("string"), 1, 1).cast("long").as("digit"))
        .agg(count(lit(1)).as("obs"))
      val probs = sp.range(1).select(explode(array(
        Seq((1, 30103), (2, 17609), (3, 12494), (4, 9691), (5, 7918),
          (6, 6695), (7, 5799), (8, 5115), (9, 4576)).map { case (dg, pr) =>
          struct(lit(dg.toLong).as("digit"), lit(pr.toLong).as("prob"))
        }: _*)).as("x"))
        .select(col("x.digit").as("digit"), col("x.prob").as("prob"))
      val spine = v.select(col("arm")).distinct().crossJoin(broadcast(probs))
      val f = spine.join(obs, Seq("arm", "digit"), "left")
        .select(col("arm"), col("digit"), col("prob"),
          coalesce(col("obs"), lit(0L)).as("obs"))
      val n = f.groupBy("arm").agg(sum(col("obs")).as("n"))
      val dev = f.join(n, Seq("arm"))
        .select(col("arm"), col("digit"), col("obs"),
          expr("cast((n * prob) div 100000 as bigint)").as("exp_cnt"),
          expr(("cast((1000000 * (100000 * cast(obs as decimal(38,0)) - cast(n as decimal(38,0)) * prob)"
            + " * (100000 * cast(obs as decimal(38,0)) - cast(n as decimal(38,0)) * prob))"
            + " div (100000 * cast(n as decimal(38,0)) * prob) as bigint)")).as("dev_micro"))
      val tot = dev.groupBy("arm").agg(sum(col("dev_micro")).as("chi2_micro"))
      dev.join(tot, Seq("arm"))
        .select(col("arm"), col("digit"), col("obs"), col("exp_cnt"), col("dev_micro"),
          col("chi2_micro"),
          when(col("chi2_micro") > 15507000L, 1L).otherwise(0L).as("significant"))
        .orderBy("arm", "digit")
    },

    // Split-conformal prediction intervals — distribution-free uncertainty
    // calibration for any point predictor, the modern gate on "is this
    // model's confidence honest" before its outputs feed a training-data
    // filter. Three hash-disjoint splits of lineitem: TRAIN fits the
    // ratio-through-origin price predictor (two broadcast scalars —
    // deliberately crude; conformal wraps ANY scorer), CALIBRATION takes
    // the ceil((1−α)(n+1))-th smallest nonconformity score (|cents
    // residual| in whole dollars — quantizing the score keeps the
    // histogram value-domain-bounded at any corpus size, and ANY
    // measurable score preserves the coverage theorem), TEST measures
    // realized coverage. The guarantee P(covered) ≥ 1−α is
    // finite-sample and assumption-free under exchangeability — the
    // hash split provides it — and ConformalSpec asserts the measured
    // permille at both α's and both fixture scales. All integer: the
    // quantile is a (alpha, score)-histogram rank walk (q263's rank-space
    // lesson — cumulative window over ≤ dollar-range bins, partitioned by
    // α), the rank is ((100−α)·(n+1)+99)//100, coverage is one truncating
    // division. Scale shape: one scan per split, two broadcast scalars,
    // a 2-row broadcast of thresholds back onto the test scan.
    q("q267_conformal",
      "split-conformal |residual| intervals: per-alpha qhat + held-out coverage")(
      s"""WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS x,
         |                   CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
         |                   ${md5LongSql("'cp:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)")} % 10 AS u
         |            FROM lineitem),
         |tr AS (SELECT CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
         |       FROM li WHERE u < 5),
         |sc AS (SELECT li.u, abs(li.y - (li.x * tr.sy) // tr.sx) // 100 AS s
         |       FROM li CROSS JOIN tr WHERE li.u >= 5),
         |alphas AS (SELECT * FROM (VALUES (5), (10)) AS t(alpha_pct)),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM sc WHERE u < 8),
         |h AS (SELECT a.alpha_pct, sc.s, CAST(count(*) AS BIGINT) AS k
         |      FROM sc CROSS JOIN alphas a WHERE sc.u < 8 GROUP BY a.alpha_pct, sc.s),
         |c AS (SELECT alpha_pct, s, k,
         |             CAST(coalesce(sum(k) OVER (PARTITION BY alpha_pct ORDER BY s
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below
         |      FROM h),
         |qh AS (SELECT c.alpha_pct, c.s AS qhat_dollars
         |       FROM c CROSS JOIN nc
         |       WHERE c.below < ((100 - c.alpha_pct) * (nc.n_cal + 1) + 99) // 100
         |         AND ((100 - c.alpha_pct) * (nc.n_cal + 1) + 99) // 100 <= c.below + c.k),
         |tst AS (SELECT qh.alpha_pct, qh.qhat_dollars,
         |               CAST(count(*) AS BIGINT) AS n_test,
         |               CAST(sum(CASE WHEN sc.s <= qh.qhat_dollars THEN 1 ELSE 0 END) AS BIGINT) AS covered
         |        FROM sc CROSS JOIN qh WHERE sc.u >= 8
         |        GROUP BY qh.alpha_pct, qh.qhat_dollars)
         |SELECT CAST(t.alpha_pct AS BIGINT) AS alpha_pct, nc.n_cal, t.n_test,
         |       t.qhat_dollars, t.covered,
         |       CAST((1000 * t.covered) // t.n_test AS BIGINT) AS coverage_permille
         |FROM tst t CROSS JOIN nc ORDER BY 1""".stripMargin
    ) { (sp, dir) =>
      val li = Tables(sp, dir, "lineitem")
        .select(col("l_quantity").cast("long").as("x"),
          round(col("l_extendedprice") * 100).cast("long").as("y"),
          (md5Long(concat(lit("cp:"), col("l_orderkey").cast("string"), lit(":"),
            col("l_linenumber").cast("string"))) % 10).as("u"))
      val tr = li.filter(col("u") < 5).agg(sum(col("x")).as("sx"), sum(col("y")).as("sy"))
      val sc = li.filter(col("u") >= 5).crossJoin(broadcast(tr))
        .select(col("u"),
          expr("abs(y - (x * sy) div sx) div 100").as("s"))
        .cache() // calibration histogram + test coverage
      val alphas = sp.range(1).select(explode(array(lit(5L), lit(10L))).as("alpha_pct"))
      val nc = sc.filter(col("u") < 8).agg(count(lit(1)).as("n_cal"))
      val h = sc.filter(col("u") < 8).crossJoin(broadcast(alphas))
        .groupBy("alpha_pct", "s").agg(count(lit(1)).as("k"))
      val wBelow = Window.partitionBy("alpha_pct").orderBy("s")
        .rowsBetween(Long.MinValue, -1)
      val qh = h.select(col("alpha_pct"), col("s"), col("k"),
          coalesce(sum(col("k")).over(wBelow), lit(0L)).as("below"))
        .crossJoin(broadcast(nc))
        .withColumn("rnk", expr("((100 - alpha_pct) * (n_cal + 1) + 99) div 100"))
        .filter(col("below") < col("rnk") && col("rnk") <= col("below") + col("k"))
        .select(col("alpha_pct"), col("s").as("qhat_dollars"))
      val tst = sc.filter(col("u") >= 8).crossJoin(broadcast(qh))
        .groupBy("alpha_pct", "qhat_dollars")
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("s") <= col("qhat_dollars"), 1L).otherwise(0L)).as("covered"))
      tst.crossJoin(broadcast(nc))
        .select(col("alpha_pct"), col("n_cal"), col("n_test"), col("qhat_dollars"),
          col("covered"),
          expr("cast((1000 * covered) div n_test as bigint)").as("coverage_permille"))
        .orderBy("alpha_pct")
    },

    // First-order Markov next-event model with a TEMPORAL holdout — the
    // sequence-model eval harness: train transition counts on the first
    // 80% of the time range, predict argmax-next per previous type
    // (count-desc, label-asc tiebreak), measure top-1 accuracy on the
    // held-out tail. Two arms prove the harness DISCRIMINATES: the real
    // event stream's types are sequence-independent, so its accuracy must
    // sit at the modal-next share (the measured null); the planted arm
    // rewrites 80% of transitions (hash-chosen) into self-loops, which
    // the model must learn and exploit to ≥ ~0.75 top-1. All integer:
    // epoch-second cut at lo + 4(hi−lo)/5, accuracy one truncating
    // division. Scale shape: transitions from a per-user lag window
    // (partitioned by user — bounded state), the model is a
    // |types|²-row metadata frame broadcast back onto the test scan; the
    // per-arm rollup rides the same grouped pass.
    q("q268_markov_holdout",
      "temporal-holdout next-event accuracy: planted self-loop arm fires, real arm at modal share")(
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |                  CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) AS t
         |           FROM events),
         |bounds AS (SELECT CAST(min(t) AS BIGINT) AS lo, CAST(max(t) AS BIGINT) AS hi FROM e),
         |tr0 AS (SELECT user_id, event_id, t, event_type AS prev,
         |               lead(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id) AS nxt
         |        FROM e),
         |tr AS (SELECT t, prev, nxt,
         |              ${md5LongSql("'mk:' || CAST(event_id AS VARCHAR)")} % 10 AS u
         |       FROM tr0 WHERE nxt IS NOT NULL),
         |arms AS (SELECT 'real' AS arm, t, prev, nxt FROM tr
         |         UNION ALL
         |         SELECT 'planted', t, prev, CASE WHEN u < 8 THEN prev ELSE nxt END FROM tr),
         |split AS (SELECT a.arm, a.prev, a.nxt,
         |                 CASE WHEN a.t < b.lo + ((b.hi - b.lo) * 4) // 5
         |                      THEN 'train' ELSE 'test' END AS part
         |          FROM arms a CROSS JOIN bounds b),
         |cnt AS (SELECT arm, prev, nxt, CAST(count(*) AS BIGINT) AS c
         |        FROM split WHERE part = 'train' GROUP BY arm, prev, nxt),
         |model AS (SELECT arm, prev, nxt AS pred_next, c
         |          FROM (SELECT arm, prev, nxt, c,
         |                       row_number() OVER (PARTITION BY arm, prev
         |                                          ORDER BY c DESC, nxt) AS rn
         |                FROM cnt) WHERE rn = 1),
         |ntr AS (SELECT arm, prev, CAST(sum(c) AS BIGINT) AS n_train FROM cnt GROUP BY arm, prev),
         |ev AS (SELECT s.arm, s.prev, CAST(count(*) AS BIGINT) AS n_test,
         |              CAST(sum(CASE WHEN s.nxt = m.pred_next THEN 1 ELSE 0 END) AS BIGINT) AS hits
         |       FROM split s JOIN model m ON m.arm = s.arm AND m.prev = s.prev
         |       WHERE s.part = 'test' GROUP BY s.arm, s.prev),
         |per AS (SELECT ev.arm, ev.prev, m.pred_next, ntr.n_train, ev.n_test, ev.hits
         |        FROM ev JOIN model m ON m.arm = ev.arm AND m.prev = ev.prev
         |               JOIN ntr ON ntr.arm = ev.arm AND ntr.prev = ev.prev),
         |tot AS (SELECT arm, '__all' AS prev, '-' AS pred_next,
         |               CAST(sum(n_train) AS BIGINT) AS n_train,
         |               CAST(sum(n_test) AS BIGINT) AS n_test,
         |               CAST(sum(hits) AS BIGINT) AS hits
         |        FROM per GROUP BY arm)
         |SELECT arm, prev, pred_next, n_train, n_test, hits,
         |       CAST((1000 * hits) // n_test AS BIGINT) AS acc_permille
         |FROM (SELECT * FROM per UNION ALL SELECT * FROM tot)
         |ORDER BY 1, 2""".stripMargin
    ) { (sp, dir) =>
      val e = Tables(sp, dir, "events")
        .selectExpr("user_id", "event_id", "event_type", "cast(ts as bigint) AS t")
      val bounds = e.agg(min(col("t")).as("lo"), max(col("t")).as("hi"))
      val wSeq = Window.partitionBy("user_id").orderBy("t", "event_id")
      val tr = e.select(col("event_id"), col("t"), col("event_type").as("prev"),
          lead(col("event_type"), 1).over(wSeq).as("nxt"))
        .filter(col("nxt").isNotNull)
        .withColumn("u", md5Long(concat(lit("mk:"), col("event_id").cast("string"))) % 10)
      val arms = tr.select(lit("real").as("arm"), col("t"), col("prev"), col("nxt"))
        .unionAll(tr.select(lit("planted").as("arm"), col("t"), col("prev"),
          when(col("u") < 8, col("prev")).otherwise(col("nxt")).as("nxt")))
      val split = arms.crossJoin(broadcast(bounds))
        .withColumn("part",
          when(col("t") < col("lo") + expr("((hi - lo) * 4) div 5"), "train")
            .otherwise("test"))
        .cache() // model fit + holdout eval
      val cnt = split.filter(col("part") === "train")
        .groupBy("arm", "prev", "nxt").agg(count(lit(1)).as("c"))
      val wTop = Window.partitionBy("arm", "prev").orderBy(col("c").desc, col("nxt"))
      val model = cnt.withColumn("rn", row_number().over(wTop)).filter(col("rn") === 1)
        .select(col("arm"), col("prev"), col("nxt").as("pred_next"))
      val ntr = cnt.groupBy("arm", "prev").agg(sum(col("c")).as("n_train"))
      val ev = split.filter(col("part") === "test")
        .join(broadcast(model), Seq("arm", "prev"))
        .groupBy("arm", "prev", "pred_next")
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("nxt") === col("pred_next"), 1L).otherwise(0L)).as("hits"))
      val per = ev.join(broadcast(ntr), Seq("arm", "prev"))
        .select(col("arm"), col("prev"), col("pred_next"), col("n_train"),
          col("n_test"), col("hits"))
      val tot = per.groupBy("arm")
        .agg(sum(col("n_train")).as("n_train"), sum(col("n_test")).as("n_test"),
          sum(col("hits")).as("hits"))
        .select(col("arm"), lit("__all").as("prev"), lit("-").as("pred_next"),
          col("n_train"), col("n_test"), col("hits"))
      per.unionAll(tot)
        .withColumn("acc_permille", expr("cast((1000 * hits) div n_test as bigint)"))
        .orderBy("arm", "prev")
    },

    // Algebraic k-fold cross-validation — k-fold CV WITHOUT k training
    // scans: the ratio predictor's train statistics are plain sums, so
    // each fold's leave-one-fold-out fit is (SX − sx_f, SY − sy_f) —
    // per-fold partial sums from ONE grouped pass, totals from the 5-row
    // rollup, and scoring joins each row to its own fold's complement
    // scalars via a 5-row broadcast. The per-fold MAE spread is the
    // variance estimate a model-selection gate actually consumes. All
    // integer: fold = md5 % 5, predictions and MAE in truncating cents.
    // Scale shape: two scans total (stats + scoring) regardless of k —
    // the pattern that makes CV affordable at 100 TB, vs k re-scans.
    q("q269_kfold_cv",
      "5-fold CV of the ratio predictor via total-minus-fold algebra, two scans total")(
      s"""WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS x,
         |                   CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
         |                   ${md5LongSql("'cv:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)")} % 5 AS f
         |            FROM lineitem),
         |fs AS (SELECT f, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |              CAST(count(*) AS BIGINT) AS n
         |       FROM li GROUP BY f),
         |tot AS (SELECT CAST(sum(sx) AS BIGINT) AS tx, CAST(sum(sy) AS BIGINT) AS ty FROM fs),
         |sc AS (SELECT li.f, abs(li.y - (li.x * (tot.ty - fs.sy)) // (tot.tx - fs.sx)) AS ae
         |       FROM li JOIN fs ON fs.f = li.f CROSS JOIN tot),
         |per AS (SELECT f, CAST(count(*) AS BIGINT) AS n_test,
         |               CAST(sum(ae) // count(*) AS BIGINT) AS mae_cents
         |        FROM sc GROUP BY f)
         |SELECT CAST(f AS BIGINT) AS fold, n_test, mae_cents FROM per
         |UNION ALL
         |SELECT -1, CAST(sum(n_test) AS BIGINT),
         |       CAST(max(mae_cents) - min(mae_cents) AS BIGINT) FROM per
         |ORDER BY 1""".stripMargin
    ) { (sp, dir) =>
      val li = Tables(sp, dir, "lineitem")
        .select(col("l_quantity").cast("long").as("x"),
          round(col("l_extendedprice") * 100).cast("long").as("y"),
          (md5Long(concat(lit("cv:"), col("l_orderkey").cast("string"), lit(":"),
            col("l_linenumber").cast("string"))) % 5).as("f"))
      val fs = li.groupBy("f")
        .agg(sum(col("x")).as("sx"), sum(col("y")).as("sy"), count(lit(1)).as("n"))
      val tot = fs.agg(sum(col("sx")).as("tx"), sum(col("sy")).as("ty"))
      val sc = li.join(broadcast(fs), Seq("f")).crossJoin(broadcast(tot))
        .select(col("f"), expr("abs(y - (x * (ty - sy)) div (tx - sx))").as("ae"))
      val per = sc.groupBy("f")
        .agg(count(lit(1)).as("n_test"),
          expr("cast(sum(ae) div count(*) as bigint)").as("mae_cents"))
      per.select(col("f").cast("long").as("fold"), col("n_test"), col("mae_cents"))
        .unionAll(per.agg(sum(col("n_test")).as("n_test"),
            (max(col("mae_cents")) - min(col("mae_cents"))).as("mae_cents"))
          .select(lit(-1L).as("fold"), col("n_test"), col("mae_cents")))
        .orderBy("fold")
    },

    // Poisson bootstrap confidence intervals — THE scalable bootstrap:
    // resampling-with-replacement is a shuffle-killer, but giving every
    // row an independent Poisson(1) weight per replicate approximates the
    // multinomial bootstrap and collapses to B partial sums that merge
    // map-side (one scan, B·|series| rows after combine — no resample
    // materialization ever exists). Weights come from the integer
    // inverse-CDF of Poisson(1) on 10⁻⁵-quantized hash draws (capped at
    // 7, tail mass < 10⁻⁵ — stated approximation, like the quantized
    // Benford probs), so both engines draw IDENTICAL weights. The 90% CI
    // is the 2nd/31st smallest of the B=32 replicate milli-means — an
    // exact rank pick over a 32-row-per-series metadata frame.
    q("q270_poisson_bootstrap",
      "Poisson(1)-weighted bootstrap: 32 replicate means -> exact 90% CI per series")(
      s"""WITH e AS (SELECT event_id, event_type,
         |                  CAST(round(value * 1000) AS BIGINT) AS y
         |           FROM events),
         |fan AS (SELECT e.event_type, e.y, r.rep,
         |               ${md5LongSql("'bs:' || CAST(e.event_id AS VARCHAR) || ':' || CAST(r.rep AS VARCHAR)")} % 100000 AS u
         |        FROM e CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS rep) r),
         |w AS (SELECT event_type, y, rep,
         |             CASE WHEN u < 36788 THEN 0 WHEN u < 73576 THEN 1
         |                  WHEN u < 91970 THEN 2 WHEN u < 98101 THEN 3
         |                  WHEN u < 99634 THEN 4 WHEN u < 99941 THEN 5
         |                  WHEN u < 99992 THEN 6 ELSE 7 END AS wt
         |      FROM fan),
         |reps AS (SELECT event_type, rep,
         |                CAST(sum(wt * y) // sum(wt) AS BIGINT) AS mean_milli
         |         FROM w GROUP BY event_type, rep),
         |rk AS (SELECT event_type, mean_milli,
         |              row_number() OVER (PARTITION BY event_type ORDER BY mean_milli) AS rn
         |       FROM reps),
         |ci AS (SELECT event_type,
         |              CAST(max(CASE WHEN rn = 2 THEN mean_milli END) AS BIGINT) AS ci_lo_milli,
         |              CAST(max(CASE WHEN rn = 31 THEN mean_milli END) AS BIGINT) AS ci_hi_milli
         |       FROM rk GROUP BY event_type),
         |full0 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |                 CAST(sum(y) // count(*) AS BIGINT) AS mean_milli
         |          FROM e GROUP BY event_type)
         |SELECT f.event_type, f.n, f.mean_milli, c.ci_lo_milli, c.ci_hi_milli
         |FROM full0 f JOIN ci c ON c.event_type = f.event_type
         |ORDER BY 1""".stripMargin
    ) { (sp, dir) =>
      val e = Tables(sp, dir, "events")
        .select(col("event_id"), col("event_type"),
          round(col("value") * 1000).cast("long").as("y"))
      val reps = sp.range(1).select(explode(sequence(lit(0), lit(31))).as("rep"))
      val fan = e.crossJoin(broadcast(reps))
        .withColumn("u", md5Long(concat(lit("bs:"), col("event_id").cast("string"),
          lit(":"), col("rep").cast("string"))) % 100000)
        .withColumn("wt",
          when(col("u") < 36788, 0L).when(col("u") < 73576, 1L)
            .when(col("u") < 91970, 2L).when(col("u") < 98101, 3L)
            .when(col("u") < 99634, 4L).when(col("u") < 99941, 5L)
            .when(col("u") < 99992, 6L).otherwise(7L))
      val repMeans = fan.groupBy("event_type", "rep")
        .agg(expr("cast(sum(wt * y) div sum(wt) as bigint)").as("mean_milli"))
      val wRk = Window.partitionBy("event_type").orderBy("mean_milli")
      val ci = repMeans.withColumn("rn", row_number().over(wRk))
        .groupBy("event_type")
        .agg(max(when(col("rn") === 2, col("mean_milli"))).cast("long").as("ci_lo_milli"),
          max(when(col("rn") === 31, col("mean_milli"))).cast("long").as("ci_hi_milli"))
      val full0 = e.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          expr("cast(sum(y) div count(*) as bigint)").as("mean_milli"))
      full0.join(ci, Seq("event_type"))
        .select(col("event_type"), col("n"), col("mean_milli"),
          col("ci_lo_milli"), col("ci_hi_milli"))
        .orderBy("event_type")
    },

    // t-closeness — completes the privacy-audit trio (q248 k-anonymity,
    // q261 l-diversity): a class can be k-anonymous AND l-diverse while
    // its sensitive-value DISTRIBUTION still leaks (all its balances in
    // the top decile, say). For an ordered sensitive attribute the earth-
    // mover distance folds to (1/(m−1))·Σ|cumP − cumQ|, and clearing the
    // denominators makes it exact: Σ_j |cp_j·N − cq_j·n_c| over the
    // zero-filled 10-bin spine (missing bins MUST contribute — the spine
    // join is correctness, not cosmetics), verdict 10·score > 2·(m−1)·
    // n_c·N at t = 0.2. Scale shape: one grouped count per (class, bin),
    // a classes × 10-bin metadata spine, one broadcast global-histogram
    // row — the audit costs the grouped count regardless of table width.
    q("q272_t_closeness",
      "per-class EMD of the balance-decile distribution vs global, t=0.2 verdict")(
      """WITH c AS (SELECT c_nationkey, c_mktsegment,
        |                  least(greatest(CAST(floor((c_acctbal + 1000) / 1100) AS BIGINT), 0), 9) AS sb
        |           FROM customer),
        |cb AS (SELECT c_nationkey, c_mktsegment, sb, CAST(count(*) AS BIGINT) AS k
        |       FROM c GROUP BY 1, 2, 3),
        |cls AS (SELECT c_nationkey, c_mktsegment, CAST(sum(k) AS BIGINT) AS n_c FROM cb GROUP BY 1, 2),
        |gb AS (SELECT sb, CAST(sum(k) AS BIGINT) AS gk FROM cb GROUP BY sb),
        |tot AS (SELECT CAST(sum(gk) AS BIGINT) AS n FROM gb),
        |bins AS (SELECT unnest(generate_series(0, 9)) AS sb),
        |spine AS (SELECT cls.c_nationkey, cls.c_mktsegment, cls.n_c, bins.sb
        |          FROM cls CROSS JOIN bins),
        |cum AS (SELECT s.c_nationkey, s.c_mktsegment, s.n_c, s.sb,
        |               CAST(sum(coalesce(cb.k, 0)) OVER (PARTITION BY s.c_nationkey, s.c_mktsegment
        |                    ORDER BY s.sb) AS BIGINT) AS cp,
        |               CAST(sum(coalesce(gb.gk, 0)) OVER (PARTITION BY s.c_nationkey, s.c_mktsegment
        |                    ORDER BY s.sb) AS BIGINT) AS cq
        |        FROM spine s
        |        LEFT JOIN cb ON cb.c_nationkey = s.c_nationkey
        |                    AND cb.c_mktsegment = s.c_mktsegment AND cb.sb = s.sb
        |        LEFT JOIN gb ON gb.sb = s.sb),
        |sc AS (SELECT cum.c_nationkey, cum.c_mktsegment, cum.n_c,
        |              CAST(sum(abs(cp * tot.n - cq * cum.n_c)) AS BIGINT) AS score
        |       FROM cum CROSS JOIN tot GROUP BY 1, 2, 3),
        |fin AS (SELECT sc.c_nationkey, sc.c_mktsegment, sc.n_c AS n, tot.n AS nn, sc.score FROM sc CROSS JOIN tot)
        |SELECT c_nationkey, c_mktsegment, n,
        |       CAST((1000000 * score) // (9 * n * nn) AS BIGINT) AS emd_micro,
        |       CAST(CASE WHEN 10 * score > 2 * 9 * n * nn THEN 1 ELSE 0 END AS BIGINT) AS violates_t20
        |FROM fin ORDER BY 1, 2""".stripMargin
    ) { (sp, dir) =>
      val c = Tables(sp, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          least(greatest(floor((col("c_acctbal") + 1000) / 1100).cast("long"), lit(0L)),
            lit(9L)).as("sb"))
      val cb = c.groupBy("c_nationkey", "c_mktsegment", "sb").agg(count(lit(1)).as("k"))
        .cache() // class totals + global histogram + spine join
      val cls = cb.groupBy("c_nationkey", "c_mktsegment").agg(sum(col("k")).as("n_c"))
      val gb = cb.groupBy("sb").agg(sum(col("k")).as("gk"))
      val tot = gb.agg(sum(col("gk")).as("nn"))
      val bins = sp.range(1).select(explode(sequence(lit(0L), lit(9L))).as("sb"))
      val spine = cls.crossJoin(broadcast(bins))
      val wCum = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy("sb")
      val cum = spine
        .join(cb, Seq("c_nationkey", "c_mktsegment", "sb"), "left")
        .join(broadcast(gb), Seq("sb"), "left")
        .select(col("c_nationkey"), col("c_mktsegment"), col("n_c"), col("sb"),
          sum(coalesce(col("k"), lit(0L))).over(wCum).as("cp"),
          sum(coalesce(col("gk"), lit(0L))).over(wCum).as("cq"))
      cum.crossJoin(broadcast(tot))
        .groupBy("c_nationkey", "c_mktsegment", "n_c", "nn")
        .agg(sum(abs(col("cp") * col("nn") - col("cq") * col("n_c"))).as("score"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("n_c").as("n"),
          expr("cast((1000000 * score) div (9 * n_c * nn) as bigint)").as("emd_micro"),
          when(lit(10L) * col("score") > lit(18L) * col("n_c") * col("nn"), 1L)
            .otherwise(0L).as("violates_t20"))
        .orderBy("c_nationkey", "c_mktsegment")
    },

    // Permutation feature importance — the model-agnostic attribution
    // every feature-engineering loop runs: break one feature's joint
    // with the rest (permute it), re-score, and read the output flip
    // rate. The distributed permutation is the whole trick: a CYCLIC
    // SHIFT inside bounded hash buckets (lead + wrap to first_value over
    // the same window) is a genuine permutation computed by a
    // partition-local window — no global shuffle of positions, and the
    // bucket count should scale with n (8 here; the window never sees
    // more than a bucket). Validation is the family's two-arm rule:
    // permuting the two features the quality gate actually reads flips
    // a measurable share of decisions, permuting the noise feature the
    // gate ignores flips EXACTLY zero — the null-importance arm. All
    // integer; one scan, three windows over the same bucket order.
    q("q275_permutation_importance",
      "gate flip-rate under per-feature cyclic-shift permutation; noise feature flips zero")(
      s"""WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS f1,
         |                  CAST(len(str_split(text, ' ')) AS BIGINT) AS f2,
         |                  ${md5LongSql("'nz:' || CAST(doc_id AS VARCHAR)")} % 1000 AS f3,
         |                  ${md5LongSql("'pb:' || CAST(doc_id AS VARCHAR)")} % 8 AS b,
         |                  ${md5LongSql("'po:' || CAST(doc_id AS VARCHAR)")} AS r
         |           FROM documents),
         |p AS (SELECT doc_id, f1, f2, f3,
         |             coalesce(lead(f1) OVER wbr, first_value(f1) OVER wbr) AS p1,
         |             coalesce(lead(f2) OVER wbr, first_value(f2) OVER wbr) AS p2,
         |             coalesce(lead(f3) OVER wbr, first_value(f3) OVER wbr) AS p3
         |      FROM d WINDOW wbr AS (PARTITION BY b ORDER BY r, doc_id)),
         |g AS (SELECT doc_id,
         |             CASE WHEN f1 >= 300 AND f2 >= 50 THEN 1 ELSE 0 END AS g0,
         |             CASE WHEN p1 >= 300 AND f2 >= 50 THEN 1 ELSE 0 END AS gc,
         |             CASE WHEN f1 >= 300 AND p2 >= 50 THEN 1 ELSE 0 END AS gt,
         |             CASE WHEN f1 >= 300 AND f2 >= 50 AND p3 IS NOT NULL THEN 1 ELSE 0 END AS gn
         |      FROM p),
         |arms AS (SELECT 'chars' AS feature, g0, gc AS gp FROM g
         |         UNION ALL SELECT 'noise', g0, gn FROM g
         |         UNION ALL SELECT 'tokens', g0, gt FROM g)
         |SELECT feature, CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum(CASE WHEN gp <> g0 THEN 1 ELSE 0 END) AS BIGINT) AS flips,
         |       CAST((1000 * sum(CASE WHEN gp = g0 THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
         |         AS agree_permille
         |FROM arms GROUP BY feature ORDER BY feature""".stripMargin
    ) { (sp, dir) =>
      val d = Tables(sp, dir, "documents")
        .select(col("doc_id"), col("n_chars").as("f1"),
          size(split(col("text"), " ")).cast("long").as("f2"),
          (md5Long(concat(lit("nz:"), col("doc_id").cast("string"))) % 1000).as("f3"),
          (md5Long(concat(lit("pb:"), col("doc_id").cast("string"))) % 8).as("b"),
          md5Long(concat(lit("po:"), col("doc_id").cast("string"))).as("r"))
      val wbr = Window.partitionBy("b").orderBy("r", "doc_id")
      def perm(c: String) =
        coalesce(lead(col(c), 1).over(wbr), first(col(c)).over(wbr))
      val p = d.select(col("doc_id"), col("f1"), col("f2"), col("f3"),
        perm("f1").as("p1"), perm("f2").as("p2"), perm("f3").as("p3"))
      def gate(c1: Column, c2: Column) =
        when(c1 >= 300 && c2 >= 50, 1L).otherwise(0L)
      val g = p.select(col("doc_id"),
          gate(col("f1"), col("f2")).as("g0"),
          gate(col("p1"), col("f2")).as("gc"),
          gate(col("f1"), col("p2")).as("gt"),
          // the permuted noise flows through but cannot change the verdict
          // (never null by construction) — the null-importance arm
          when(col("f1") >= 300 && col("f2") >= 50 && col("p3").isNotNull, 1L)
            .otherwise(0L).as("gn"))
        .cache() // three arms off one window pass
      val arms = g.select(lit("chars").as("feature"), col("g0"), col("gc").as("gp"))
        .unionAll(g.select(lit("noise").as("feature"), col("g0"), col("gn").as("gp")))
        .unionAll(g.select(lit("tokens").as("feature"), col("g0"), col("gt").as("gp")))
      arms.groupBy("feature")
        .agg(count(lit(1)).as("n"),
          sum(when(col("gp") =!= col("g0"), 1L).otherwise(0L)).as("flips"),
          expr("cast((1000 * sum(case when gp = g0 then 1 else 0 end)) div count(*) as bigint)")
            .as("agree_permille"))
        .orderBy("feature")
    },

    // Autocorrelation function + Ljung–Box portmanteau — the time-series
    // diagnostic that decides whether a monitor can assume independent
    // hours (q250's 3σ does) or must whiten first. The real hourly count
    // series IS the null arm (the fixture has no daily cycle — measured,
    // hour-of-day totals are flat), and the effect arm plants a full-μ
    // spike on every 24th hour, which must light lag 24 and fire the Q
    // test (μ/2 was measured too weak against Poisson noise at sf0.01).
    // Exactness: residuals are pre-cleared to z_t = n·y_t − S (integer,
    // Σz = 0 by construction), each lag's numerator Σ z_t·z_{t+k} comes
    // from an equi-join of the series against itself on idx+k over a
    // 24-row lag grid (no window, (bins × lags) metadata volume), and
    // both the published r_micro and the Q statistic are truncating
    // integer divisions — Q sums PER-LAG floored terms in 38-digit space
    // (bias < 24 milli, order-free integer addition, both engines
    // identical). Scale: the series is time-bounded metadata; the only
    // data-sized work is the grouped hourly count the ingest already runs.
    q("q277_acf_ljungbox",
      "integer ACF lags 1-24 + Ljung-Box: white-noise arm quiet, planted daily cycle fires")(
      """WITH b AS (SELECT (CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 3600) AS hb,
        |                  CAST(count(*) AS BIGINT) AS y
        |           FROM events GROUP BY hb),
        |rr AS (SELECT CAST(min(hb) AS BIGINT) AS lo, CAST(max(hb) AS BIGINT) AS hi FROM b),
        |spine AS (SELECT g.hb FROM (SELECT unnest(generate_series((SELECT lo FROM rr),
        |                                                          (SELECT hi FROM rr))) AS hb) g),
        |s0 AS (SELECT spine.hb - (SELECT lo FROM rr) AS idx, coalesce(b.y, 0) AS y
        |       FROM spine LEFT JOIN b ON b.hb = spine.hb),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s FROM s0),
        |arms AS (SELECT 'null' AS arm, idx, y FROM s0
        |         UNION ALL
        |         SELECT 'planted', idx,
        |                y + CASE WHEN idx % 24 = 0 THEN (SELECT s // n FROM ns) ELSE 0 END
        |         FROM s0),
        |st AS (SELECT arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s
        |       FROM arms GROUP BY arm),
        |z AS (SELECT a.arm, a.idx, st.n, st.n * a.y - st.s AS z
        |      FROM arms a JOIN st ON st.arm = a.arm),
        |den AS (SELECT arm, CAST(max(n) AS BIGINT) AS n, CAST(sum(z * z) AS BIGINT) AS den
        |        FROM z GROUP BY arm),
        |lags AS (SELECT unnest(generate_series(1, 24)) AS k),
        |num AS (SELECT a.arm, l.k, CAST(sum(a.z * b.z) AS BIGINT) AS num
        |        FROM z a CROSS JOIN lags l
        |             JOIN z b ON b.arm = a.arm AND b.idx = a.idx + l.k
        |        GROUP BY a.arm, l.k),
        |r AS (SELECT num.arm, CAST(num.k AS BIGINT) AS lag, den.n,
        |             CAST((1000000 * CAST(num.num AS HUGEINT)) // den.den AS BIGINT) AS r_micro
        |      FROM num JOIN den ON den.arm = num.arm),
        |qs AS (SELECT arm, CAST(sum((1000 * n * (n + 2) * CAST(r_micro AS HUGEINT) * r_micro)
        |                            // ((n - lag) * 1000000000000)) AS BIGINT) AS q_milli
        |       FROM r GROUP BY arm)
        |SELECT r.arm, r.lag, r.r_micro, qs.q_milli,
        |       CAST(CASE WHEN qs.q_milli > 36415 THEN 1 ELSE 0 END AS BIGINT) AS significant
        |FROM r JOIN qs ON qs.arm = r.arm
        |ORDER BY 1, 2""".stripMargin
    ) { (sp, dir) =>
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val b = Tables(sp, dir, "events")
        .selectExpr("cast(ts as bigint) div 3600 AS hb")
        .groupBy("hb").agg(count(lit(1)).as("y"))
      val bounds = b.agg(min(col("hb")).as("lo"), max(col("hb")).as("hi"))
      val s0 = sp.range(1).select(col("id"))
        .crossJoin(broadcast(bounds))
        .select(explode(sequence(col("lo"), col("hi"))).as("shb"), col("lo"))
        .join(b, col("shb") === col("hb"), "left")
        .select((col("shb") - col("lo")).as("idx"), coalesce(col("y"), lit(0L)).as("y"))
      val ns = s0.agg(count(lit(1)).as("nn"), sum(col("y")).as("ss"))
      val arms = s0.select(lit("null").as("arm"), col("idx"), col("y"))
        .unionAll(s0.crossJoin(broadcast(ns))
          .select(lit("planted").as("arm"), col("idx"),
            (col("y") + when(col("idx") % 24 === 0, expr("ss div nn"))
              .otherwise(0L)).as("y")))
      val st = arms.groupBy("arm").agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
      val z = arms.join(broadcast(st), Seq("arm"))
        .select(col("arm"), col("idx"), col("n"),
          (col("n") * col("y") - col("s")).as("z"))
        .cache() // both legs of the lag join + the denominator
      val den = z.groupBy("arm").agg(max(col("n")).as("n"), sum(col("z") * col("z")).as("den"))
      val lags = sp.range(1).select(explode(sequence(lit(1L), lit(24L))).as("k"))
      val num = z.select(col("arm"), col("idx"), col("z"))
        .crossJoin(broadcast(lags))
        .join(z.select(col("arm"), col("idx").as("bidx"), col("z").as("bz")),
          Seq("arm"))
        .filter(col("bidx") === col("idx") + col("k"))
        .groupBy(col("arm"), col("k").as("lag"))
        .agg(sum(col("z") * col("bz")).as("num"))
      val r = num.join(broadcast(den), Seq("arm"))
        .select(col("arm"), col("lag"), col("n"),
          expr("cast((1000000 * cast(num as decimal(38,0))) div den as bigint)").as("r_micro"))
      val qs = r.groupBy("arm")
        .agg(sum(expr("(1000 * n * (n + 2) * cast(r_micro as decimal(38,0)) * r_micro)"
          + " div ((n - lag) * 1000000000000)")).cast("long").as("q_milli"))
      r.join(qs, Seq("arm"))
        .select(col("arm"), col("lag"), col("r_micro"), col("q_milli"),
          when(col("q_milli") > 36415L, 1L).otherwise(0L).as("significant"))
        .orderBy("arm", "lag")
    },

    // Leave-one-out target encoding — the leakage law, measured. Encoding
    // a category by its target mean INCLUDING the row's own label leaks
    // that label into the feature: on a pure-noise target over small
    // categories the full-mean encoding correlates with the label it is
    // supposed to predict, while the LOO encoding (S − y_i)/(n − 1) is
    // exactly orthogonal in expectation. Both arms run on a coin-flip
    // target (md5 parity) over ~5-member hash categories — the worst
    // case — and publish the signed scaled Pearson² between label and
    // encoding, cleared to integers: r²_signed_micro = sign(cov)·10⁶·
    // cov²/(varx·vary) with cov/var the standard n-cleared sums, one
    // truncating division in 38-digit space. The full arm must show a
    // LARGE positive value (the leak ≈ 1/n_cat), the LOO arm ~0 — the
    // pair is the spec. Scale shape: one grouped pass for category sums,
    // a broadcast-join back, one moment rollup per arm.
    q("q278_loo_target_encoding",
      "target-encoding leakage audit: full-mean arm leaks on a noise target, LOO arm doesn't")(
      s"""WITH e AS (SELECT event_id,
         |                  ${md5LongSql("'cat:' || CAST(user_id AS VARCHAR)")} % 2000 AS cat,
         |                  ${md5LongSql("'y:' || CAST(event_id AS VARCHAR)")} % 2 AS y
         |           FROM events),
         |cs AS (SELECT cat, CAST(count(*) AS BIGINT) AS n_cat, CAST(sum(y) AS BIGINT) AS s_cat
         |       FROM e GROUP BY cat),
         |enc AS (SELECT e.y,
         |               (1000 * cs.s_cat) // cs.n_cat AS enc_full,
         |               (1000 * (cs.s_cat - e.y)) // (cs.n_cat - 1) AS enc_loo
         |        FROM e JOIN cs ON cs.cat = e.cat WHERE cs.n_cat >= 2),
         |arms AS (SELECT 'full' AS arm, y, enc_full AS x FROM enc
         |         UNION ALL SELECT 'loo', y, enc_loo FROM enc),
         |m AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x) AS BIGINT) AS sx,
         |             CAST(sum(y * y) AS BIGINT) AS syy, CAST(sum(x * x) AS BIGINT) AS sxx,
         |             CAST(sum(x * y) AS BIGINT) AS sxy
         |      FROM arms GROUP BY arm)
         |SELECT arm, n,
         |       CAST(CASE WHEN n * sxy - sx * sy >= 0 THEN 1 ELSE -1 END
         |            * ((1000000 * (CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
         |                        * (CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy))
         |               // ((CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
         |                  * (CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy)))
         |         AS BIGINT) AS r2_signed_micro
         |FROM m ORDER BY arm""".stripMargin
    ) { (sp, dir) =>
      val e = Tables(sp, dir, "events")
        .select(col("event_id"),
          (md5Long(concat(lit("cat:"), col("user_id").cast("string"))) % 2000).as("cat"),
          (md5Long(concat(lit("y:"), col("event_id").cast("string"))) % 2).as("y"))
      val cs = e.groupBy("cat").agg(count(lit(1)).as("n_cat"), sum(col("y")).as("s_cat"))
      val enc = e.join(broadcast(cs), Seq("cat")).filter(col("n_cat") >= 2)
        .select(col("y"),
          expr("(1000 * s_cat) div n_cat").as("enc_full"),
          expr("(1000 * (s_cat - y)) div (n_cat - 1)").as("enc_loo"))
      val arms = enc.select(lit("full").as("arm"), col("y"), col("enc_full").as("x"))
        .unionAll(enc.select(lit("loo").as("arm"), col("y"), col("enc_loo").as("x")))
      val m = arms.groupBy("arm")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"), sum(col("x")).as("sx"),
          sum(col("y") * col("y")).as("syy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
      m.select(col("arm"), col("n"),
          (when(col("n") * col("sxy") - col("sx") * col("sy") >= 0, 1L).otherwise(-1L)
            * expr(("(1000000 * (cast(n as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy)"
              + " * (cast(n as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy))"
              + " div ((cast(n as decimal(38,0)) * sxx - cast(sx as decimal(38,0)) * sx)"
              + " * (cast(n as decimal(38,0)) * syy - cast(sy as decimal(38,0)) * sy))")))
            .cast("long").as("r2_signed_micro"))
        .orderBy("arm")
    },

    // Weighted median — the robust center the unweighted median (q78)
    // cannot give when rows carry different mass: per returnflag, the
    // price at which HALF THE SHIPPED QUANTITY sits below. Same
    // rank-space discipline as q263/q265: one (flag, cents) histogram of
    // integer weight sums, a cumulative below-weight window over
    // value-domain-bounded bins (partitioned by flag), and the pick is
    // the bin where the cumulative crosses ceil(W/2) — all integer, no
    // global sort, no per-row window.
    q("q284_weighted_median",
      "quantity-weighted median price per returnflag from the weight histogram")(
      """WITH h AS (SELECT l_returnflag,
        |                  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |                  CAST(sum(CAST(round(l_quantity, 4) * 10000 AS BIGINT)) AS BIGINT) AS w
        |           FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, cents, w,
        |             CAST(coalesce(sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below,
        |             CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
        |      FROM h)
        |SELECT l_returnflag, tw AS total_weight, cents AS wmedian_cents
        |FROM c WHERE below < (tw + 1) // 2 AND (tw + 1) // 2 <= below + w
        |ORDER BY l_returnflag""".stripMargin
    ) { (sp, dir) =>
      val h = Tables(sp, dir, "lineitem")
        .groupBy(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
        .agg(sum((round(col("l_quantity"), 4) * 10000).cast("long")).as("w"))
      val wBelow = Window.partitionBy("l_returnflag").orderBy("cents")
        .rowsBetween(Long.MinValue, -1)
      val wAll = Window.partitionBy("l_returnflag")
      h.select(col("l_returnflag"), col("cents"), col("w"),
          coalesce(sum(col("w")).over(wBelow), lit(0L)).as("below"),
          sum(col("w")).over(wAll).as("tw"))
        .withColumn("medpos", expr("(tw + 1) div 2"))
        .filter(col("below") < col("medpos") && col("medpos") <= col("below") + col("w"))
        .select(col("l_returnflag"), col("tw").as("total_weight"),
          col("cents").as("wmedian_cents"))
        .orderBy("l_returnflag")
    },

    // Wilson lower-bound ranking — "sort by average rating" is wrong at
    // small n; the 95% Wilson score interval's LOWER bound is the
    // standard fix (how to rank items with few observations without
    // letting 1-for-1 beat 96-for-100). Per part: n lineitems, r
    // returned ('R'); rank by the Wilson bound of the return RATE.
    // Float lesson (measured): the "identical expression tree" double
    // formulation diverged between engines in the 6th decimal — DuckDB
    // contracts multiply-adds — so the bound is cleared to INTEGERS with
    // exact rational z = 196/100, z² = 38416/10⁴: multiplying num and
    // den by 10⁴·n gives lb = (10⁴rn + 19208n − 98·√U) / (10⁴n² +
    // 38416n) with U = (4·10⁴·r(n−r) + 38416·n)·n an exact integer, and
    // √U replaced by the FLOOR isqrt — exact and engine-identical for
    // U < 2⁵² (a correctly-rounded double sqrt of an integer cannot
    // cross the next integer: the true gap ≥ 1/2k ≫ ulp), deterministic
    // micro-bias < 1e-4 stated. Scale shape: one grouped count + a
    // per-row closed form + top-k.
    q("q285_wilson_ranking",
      "top-20 parts by Wilson 95% lower bound of return rate (integer isqrt form)")(
      """WITH s AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
        |                  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r
        |           FROM lineitem GROUP BY l_partkey),
        |w AS (SELECT l_partkey, n, r,
        |             (1000000 * r) // n AS phat_micro,
        |             CAST(floor(sqrt(CAST((40000 * r * (n - r) + 38416 * n) * n AS DOUBLE)))
        |                  AS BIGINT) AS isq
        |      FROM s WHERE n >= 5)
        |SELECT l_partkey, n, r, CAST(phat_micro AS BIGINT) AS phat_micro,
        |       CAST((1000000 * (10000 * r * n + 19208 * n - 98 * isq))
        |            // (10000 * n * n + 38416 * n) AS BIGINT) AS lb_micro
        |FROM w ORDER BY lb_micro DESC, l_partkey LIMIT 20""".stripMargin
    ) { (sp, dir) =>
      val s0 = Tables(sp, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r"))
        .filter(col("n") >= 5)
      val w = s0
        .withColumn("phat_micro", expr("(1000000 * r) div n"))
        .withColumn("isq", expr(
          "cast(floor(sqrt(cast((40000 * r * (n - r) + 38416 * n) * n as double))) as bigint)"))
        .withColumn("lb_micro", expr(
          "cast((1000000 * (10000 * r * n + 19208 * n - 98 * isq))"
            + " div (10000 * n * n + 38416 * n) as bigint)"))
      w.orderBy(col("lb_micro").desc, col("l_partkey"))
        .select(col("l_partkey"), col("n"), col("r"),
          col("phat_micro").cast("long").as("phat_micro"), col("lb_micro"))
        .limit(20)
    },

    // Poisson dispersion index — the assumption audit UNDER the anomaly
    // monitors: q250's 3σ and q260's CUSUM both size their thresholds as
    // if hourly counts were Poisson (variance ≈ mean). D = s²/ȳ measures
    // that directly, integer-cleared: D_milli = 1000·(n·Σy² − S²) //
    // ((n−1)·S) — one grouped pass per series over the zero-filled hour
    // spine, no float. Arms per series: the real counts (D ≈ 1, the
    // monitors' license) and a BURSTY arm that doubles a hash-chosen
    // half of the hours — overdispersion a Poisson monitor under-alarms
    // on, which must push D well above 1 (spec-pinned discrimination).
    q("q287_dispersion_index",
      "variance-to-mean per series: real hours near Poisson 1.0, bursty arm far above")(
      s"""WITH b AS (SELECT event_type,
         |                  (CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 3600) AS hb,
         |                  CAST(count(*) AS BIGINT) AS y
         |           FROM events GROUP BY event_type, hb),
         |rr AS (SELECT CAST(min(hb) AS BIGINT) AS lo, CAST(max(hb) AS BIGINT) AS hi FROM b),
         |spine AS (SELECT t.event_type, g.hb
         |          FROM (SELECT DISTINCT event_type FROM b) t
         |          CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM rr),
         |                                                    (SELECT hi FROM rr))) AS hb) g),
         |s AS (SELECT spine.event_type, spine.hb, coalesce(b.y, 0) AS y
         |      FROM spine LEFT JOIN b ON b.event_type = spine.event_type AND b.hb = spine.hb),
         |arms AS (SELECT 'real' AS arm, event_type, y FROM s
         |         UNION ALL
         |         SELECT 'bursty', event_type,
         |                y * CASE WHEN ${md5LongSql("'bu:' || event_type || ':' || CAST(hb AS VARCHAR)")} % 2 = 0
         |                         THEN 2 ELSE 1 END
         |         FROM s),
         |m AS (SELECT arm, event_type, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(y) AS BIGINT) AS sy, CAST(sum(y * y) AS BIGINT) AS syy
         |      FROM arms GROUP BY arm, event_type)
         |SELECT arm, event_type, n, sy AS total,
         |       CAST((1000 * (n * CAST(syy AS HUGEINT) - CAST(sy AS HUGEINT) * sy))
         |            // ((n - 1) * CAST(sy AS HUGEINT)) AS BIGINT) AS dispersion_milli
         |FROM m ORDER BY 1, 2""".stripMargin
    ) { (sp, dir) =>
      val b = Tables(sp, dir, "events")
        .selectExpr("event_type", "cast(ts as bigint) div 3600 AS hb")
        .groupBy("event_type", "hb").agg(count(lit(1)).as("y"))
      val bounds = b.agg(min(col("hb")).as("lo"), max(col("hb")).as("hi"))
      val spine = b.select(col("event_type").as("sty")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("sty"), explode(sequence(col("lo"), col("hi"))).as("shb"))
      val s = spine.join(b,
          col("sty") === col("event_type") && col("shb") === col("hb"), "left")
        .select(col("sty").as("event_type"), col("shb").as("hb"),
          coalesce(col("y"), lit(0L)).as("y"))
      val arms = s.select(lit("real").as("arm"), col("event_type"), col("y"))
        .unionAll(s.select(lit("bursty").as("arm"), col("event_type"),
          (col("y") * when(md5Long(concat(lit("bu:"), col("event_type"), lit(":"),
            col("hb").cast("string"))) % 2 === 0, 2L).otherwise(1L)).as("y")))
      arms.groupBy("arm", "event_type")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("arm"), col("event_type"), col("n"), col("sy").as("total"),
          expr(("cast((1000 * (n * cast(syy as decimal(38,0)) - cast(sy as decimal(38,0)) * sy))"
            + " div ((n - 1) * cast(sy as decimal(38,0))) as bigint)")).as("dispersion_milli"))
        .orderBy("arm", "event_type")
    },

    // Capture–recapture (Lincoln–Petersen) — estimate a population you
    // cannot afford to enumerate from TWO independent samples and their
    // overlap: N̂ = n₁·n₂/m. At 100 TB this is how you size a dedup or
    // join before running it (two cheap hash-samples, one tiny
    // intersection) — and here the truth is known, so the estimator is
    // AUDITED: err_permille against the real table count, at two
    // sampling rates. All integer (hash membership, counts, one
    // truncating division per arm); the two samples are independent by
    // construction (disjoint hash salts). Scale shape: one scan
    // computing both memberships + a 2-row rollup.
    q("q288_capture_recapture",
      "Lincoln-Petersen population estimate from two hash samples, audited vs the true count")(
      s"""WITH d AS (SELECT o_orderkey AS id,
         |                  CASE WHEN ${md5LongSql("'cr1:' || CAST(o_orderkey AS VARCHAR)")} % 1000 < 100 THEN 1 ELSE 0 END AS s1a,
         |                  CASE WHEN ${md5LongSql("'cr2:' || CAST(o_orderkey AS VARCHAR)")} % 1000 < 100 THEN 1 ELSE 0 END AS s2a,
         |                  CASE WHEN ${md5LongSql("'cr3:' || CAST(o_orderkey AS VARCHAR)")} % 1000 < 300 THEN 1 ELSE 0 END AS s1b,
         |                  CASE WHEN ${md5LongSql("'cr4:' || CAST(o_orderkey AS VARCHAR)")} % 1000 < 300 THEN 1 ELSE 0 END AS s2b
         |           FROM orders),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS true_n,
         |             CAST(sum(s1a) AS BIGINT) AS n1a, CAST(sum(s2a) AS BIGINT) AS n2a,
         |             CAST(sum(s1a * s2a) AS BIGINT) AS ma,
         |             CAST(sum(s1b) AS BIGINT) AS n1b, CAST(sum(s2b) AS BIGINT) AS n2b,
         |             CAST(sum(s1b * s2b) AS BIGINT) AS mb
         |      FROM d),
         |arms AS (SELECT '10pct' AS arm, n1a AS n1, n2a AS n2, ma AS overlap, true_n FROM m
         |         UNION ALL SELECT '30pct', n1b, n2b, mb, true_n FROM m)
         |SELECT arm, n1, n2, overlap,
         |       CAST((n1 * n2) // overlap AS BIGINT) AS est_total, true_n,
         |       CAST((1000 * abs((n1 * n2) // overlap - true_n)) // true_n AS BIGINT)
         |         AS err_permille
         |FROM arms ORDER BY arm""".stripMargin
    ) { (sp, dir) =>
      def mem(tag: String, pm: Int) =
        when(md5Long(concat(lit(tag), col("o_orderkey").cast("string"))) % 1000 < pm, 1L)
          .otherwise(0L)
      val m = Tables(sp, dir, "orders")
        .select(mem("cr1:", 100).as("s1a"), mem("cr2:", 100).as("s2a"),
          mem("cr3:", 300).as("s1b"), mem("cr4:", 300).as("s2b"))
        .agg(count(lit(1)).as("true_n"),
          sum(col("s1a")).as("n1a"), sum(col("s2a")).as("n2a"),
          sum(col("s1a") * col("s2a")).as("ma"),
          sum(col("s1b")).as("n1b"), sum(col("s2b")).as("n2b"),
          sum(col("s1b") * col("s2b")).as("mb"))
      val arms = m.select(lit("10pct").as("arm"), col("n1a").as("n1"), col("n2a").as("n2"),
          col("ma").as("overlap"), col("true_n"))
        .unionAll(m.select(lit("30pct").as("arm"), col("n1b"), col("n2b"),
          col("mb"), col("true_n")))
      arms.select(col("arm"), col("n1"), col("n2"), col("overlap"),
          expr("cast((n1 * n2) div overlap as bigint)").as("est_total"), col("true_n"),
          expr("cast((1000 * abs((n1 * n2) div overlap - true_n)) div true_n as bigint)")
            .as("err_permille"))
        .orderBy("arm")
    },

    // Delete-one-group jackknife — standard-error bands for ANY plug-in
    // statistic at one-scan cost: the corpus tokens-per-char ratio's 32
    // leave-one-group-out replicates come from total-minus-group sums
    // (q269's algebra — per-group partials + a broadcast total, never 32
    // scans), and the jackknife variance (G−1)/G·Σ(θ₍₋g₎ − θ̄)² folds
    // over the 32-row replicate frame. Everything integer: θ in micro
    // units, the variance in micro² with one truncating division, the
    // SE via the exact floor-isqrt (q285's trick, engine-identical below
    // 2⁵²). The audit: a half-vs-half split difference must sit within
    // a few jackknife SEs — the SE is VALIDATED against an independent
    // perturbation, not just computed.
    q("q290_jackknife_se",
      "leave-one-group-out jackknife SE of the tokens-per-char ratio, one scan")(
      s"""WITH d AS (SELECT CAST(len(str_split(text, ' ')) AS BIGINT) AS tok,
         |                  CAST(n_chars AS BIGINT) AS ch,
         |                  ${md5LongSql("'jk:' || CAST(doc_id AS VARCHAR)")} % 32 AS g,
         |                  ${md5LongSql("'jh:' || CAST(doc_id AS VARCHAR)")} % 2 AS h
         |           FROM documents),
         |gs AS (SELECT g, CAST(sum(tok) AS BIGINT) AS t, CAST(sum(ch) AS BIGINT) AS c
         |       FROM d GROUP BY g),
         |tot AS (SELECT CAST(sum(t) AS BIGINT) AS tt, CAST(sum(c) AS BIGINT) AS tc,
         |               CAST(count(*) AS BIGINT) AS gn FROM gs),
         |reps AS (SELECT gs.g, (1000000 * (tot.tt - gs.t)) // (tot.tc - gs.c) AS th
         |         FROM gs CROSS JOIN tot),
         |jm AS (SELECT CAST(sum(th) AS BIGINT) AS sth, CAST(count(*) AS BIGINT) AS gn FROM reps),
         |vr AS (SELECT CAST(((jm.gn - 1) * (jm.gn * CAST(sum(reps.th * reps.th) AS HUGEINT)
         |                                   - CAST(jm.sth AS HUGEINT) * jm.sth))
         |                   // (jm.gn * jm.gn) AS BIGINT) AS v
         |       FROM reps CROSS JOIN jm GROUP BY jm.gn, jm.sth),
         |hs AS (SELECT CAST((1000000 * sum(CASE WHEN h = 0 THEN tok ELSE 0 END))
         |                   // sum(CASE WHEN h = 0 THEN ch ELSE 0 END) AS BIGINT) AS th0,
         |              CAST((1000000 * sum(CASE WHEN h = 1 THEN tok ELSE 0 END))
         |                   // sum(CASE WHEN h = 1 THEN ch ELSE 0 END) AS BIGINT) AS th1
         |       FROM d)
         |SELECT CAST((1000000 * tot.tt) // tot.tc AS BIGINT) AS theta_micro,
         |       CAST(floor(sqrt(CAST(vr.v AS DOUBLE))) AS BIGINT) AS se_micro,
         |       CAST(abs(hs.th0 - hs.th1) AS BIGINT) AS half_gap_micro,
         |       tot.gn AS n_groups
         |FROM tot CROSS JOIN vr CROSS JOIN hs""".stripMargin
    ) { (sp, dir) =>
      val d = Tables(sp, dir, "documents")
        .select(size(split(col("text"), " ")).cast("long").as("tok"),
          col("n_chars").as("ch"),
          (md5Long(concat(lit("jk:"), col("doc_id").cast("string"))) % 32).as("g"),
          (md5Long(concat(lit("jh:"), col("doc_id").cast("string"))) % 2).as("h"))
        .cache() // group sums + half split
      val gs = d.groupBy("g").agg(sum(col("tok")).as("t"), sum(col("ch")).as("c"))
      val tot = gs.agg(sum(col("t")).as("tt"), sum(col("c")).as("tc"),
        count(lit(1)).as("gn"))
      val reps = gs.crossJoin(broadcast(tot))
        .select(expr("(1000000 * (tt - t)) div (tc - c)").as("th"))
      val jm = reps.agg(sum(col("th")).as("sth"), count(lit(1)).as("gn2"),
        sum(col("th") * col("th")).as("sthh"))
      val vr = jm.select(expr(
        ("cast(((gn2 - 1) * (gn2 * cast(sthh as decimal(38,0)) - cast(sth as decimal(38,0)) * sth))"
          + " div (gn2 * gn2) as bigint)")).as("v"))
      val hs = d.agg(
        expr("cast((1000000 * sum(case when h = 0 then tok else 0 end))"
          + " div sum(case when h = 0 then ch else 0 end) as bigint)").as("th0"),
        expr("cast((1000000 * sum(case when h = 1 then tok else 0 end))"
          + " div sum(case when h = 1 then ch else 0 end) as bigint)").as("th1"))
      tot.crossJoin(broadcast(vr)).crossJoin(broadcast(hs))
        .select(expr("cast((1000000 * tt) div tc as bigint)").as("theta_micro"),
          expr("cast(floor(sqrt(cast(v as double))) as bigint)").as("se_micro"),
          abs(col("th0") - col("th1")).cast("long").as("half_gap_micro"),
          col("gn").as("n_groups"))
    },

    // Difference-in-differences — the workhorse causal estimator when
    // randomization isn't available: (treated-post − treated-pre) −
    // (control-post − control-pre) cancels both the group gap and the
    // common time trend. Groups by user-hash, periods by the time-range
    // midpoint, outcome in deci-units; each of the four cell means
    // publishes as ONE truncating milli division, and the DiD is their
    // alternating sum (deterministic bias ≤ 4 milli, identical both
    // engines). Two arms: the raw stream (true effect ZERO — the
    // placebo/A-A arm every DiD pipeline must pass) and a planted +50
    // deci lift on treated-post rows only, which the estimator must
    // recover as ≈ +50000 milli (spec-pinned with noise margins). Scale
    // shape: one grouped pass to 2×2×2 cells — the estimator is
    // metadata arithmetic after a single scan.
    q("q293_diff_in_diff",
      "2x2 DiD: placebo arm near zero, planted +50-deci lift recovered")(
      s"""WITH e AS (SELECT CAST(round(value * 10) AS BIGINT) AS y,
         |                  CASE WHEN ${md5LongSql("'tg:' || CAST(user_id AS VARCHAR)")} % 2 = 0
         |                       THEN 1 ELSE 0 END AS treated,
         |                  CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) AS t
         |           FROM events),
         |cut AS (SELECT (min(t) + max(t)) // 2 AS c FROM e),
         |cells AS (SELECT 'null' AS arm, e.treated,
         |                 CASE WHEN e.t >= cut.c THEN 1 ELSE 0 END AS post, e.y
         |          FROM e CROSS JOIN cut
         |          UNION ALL
         |          SELECT 'planted', e.treated,
         |                 CASE WHEN e.t >= cut.c THEN 1 ELSE 0 END,
         |                 e.y + CASE WHEN e.treated = 1 AND e.t >= cut.c THEN 50 ELSE 0 END
         |          FROM e CROSS JOIN cut),
         |m AS (SELECT arm, treated, post, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(y) AS BIGINT) AS s FROM cells GROUP BY arm, treated, post),
         |w AS (SELECT arm,
         |             CAST(max(CASE WHEN treated = 1 AND post = 1 THEN (1000 * s) // n END) AS BIGINT) AS m11,
         |             CAST(max(CASE WHEN treated = 1 AND post = 0 THEN (1000 * s) // n END) AS BIGINT) AS m10,
         |             CAST(max(CASE WHEN treated = 0 AND post = 1 THEN (1000 * s) // n END) AS BIGINT) AS m01,
         |             CAST(max(CASE WHEN treated = 0 AND post = 0 THEN (1000 * s) // n END) AS BIGINT) AS m00,
         |             CAST(sum(n) AS BIGINT) AS n
         |      FROM m GROUP BY arm)
         |SELECT arm, n, m11, m10, m01, m00,
         |       CAST(m11 - m10 - m01 + m00 AS BIGINT) AS did_milli
         |FROM w ORDER BY arm""".stripMargin
    ) { (sp, dir) =>
      val e = Tables(sp, dir, "events")
        .select(round(col("value") * 10).cast("long").as("y"),
          when(md5Long(concat(lit("tg:"), col("user_id").cast("string"))) % 2 === 0, 1L)
            .otherwise(0L).as("treated"),
          expr("cast(ts as bigint)").as("t"))
      val cut = e.agg(expr("(min(t) + max(t)) div 2").as("c"))
      val base = e.crossJoin(broadcast(cut))
        .withColumn("post", when(col("t") >= col("c"), 1L).otherwise(0L))
      val cells = base.select(lit("null").as("arm"), col("treated"), col("post"), col("y"))
        .unionAll(base.select(lit("planted").as("arm"), col("treated"), col("post"),
          (col("y") + when(col("treated") === 1 && col("post") === 1, 50L).otherwise(0L))
            .as("y")))
      val m = cells.groupBy("arm", "treated", "post")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
      def cell(tr: Int, po: Int) =
        max(when(col("treated") === tr && col("post") === po,
          expr("(1000 * s) div n"))).cast("long")
      m.groupBy("arm")
        .agg(cell(1, 1).as("m11"), cell(1, 0).as("m10"),
          cell(0, 1).as("m01"), cell(0, 0).as("m00"), sum(col("n")).as("n"))
        .select(col("arm"), col("n"), col("m11"), col("m10"), col("m01"), col("m00"),
          (col("m11") - col("m10") - col("m01") + col("m00")).cast("long").as("did_milli"))
        .orderBy("arm")
    },

    // NDCG@10 — the graded-relevance ranking metric (Järvelin &
    // Kekäläinen, public literature) completing the retrieval-eval kit
    // (exact AUC q172, AP q174, recall scorecards): discounts 1/log₂(i+1)
    // enter as EXACT micro-unit literals (a 10-row table — no float log
    // anywhere), DCG is one grouped integer dot product over the top-10
    // window, ideal DCG re-ranks the same candidates by relevance, and
    // NDCG publishes as one truncating milli division. Two ranker arms
    // give the metric its poles: an oracle ranker (score = rel·1000 +
    // hash noise) must hit NDCG ≈ 1000, the random ranker floats at the
    // corpus's relevance base rate — both against the SAME graded
    // relevance (hash-derived, 0–3). Scale shape: per-query candidate
    // sets are disjoint doc_id slices; two row_number windows per
    // (arm, query) partition; everything else is a 20-row rollup.
    q("q294_ndcg",
      "exact integer NDCG@10 per query: oracle ranker ~1000, random ranker at base rate")(
      s"""WITH cand AS (SELECT doc_id, doc_id % 10 AS qid,
         |                     ${md5LongSql("'rel:' || CAST(doc_id AS VARCHAR)")} % 4 AS rel,
         |                     ${md5LongSql("'rs:' || CAST(doc_id AS VARCHAR)")} % 1000 AS noise
         |              FROM documents),
         |arms AS (SELECT 'a_oracle' AS arm, qid, doc_id, rel, rel * 1000 + noise AS score FROM cand
         |         UNION ALL SELECT 'b_random', qid, doc_id, rel, noise FROM cand),
         |disc AS (SELECT * FROM (VALUES (1, 1000000), (2, 630930), (3, 500000),
         |                               (4, 430677), (5, 386853), (6, 356207),
         |                               (7, 333333), (8, 315465), (9, 301030),
         |                               (10, 289065)) AS t(pos, d)),
         |rk AS (SELECT arm, qid, rel,
         |              row_number() OVER (PARTITION BY arm, qid ORDER BY score DESC, doc_id) AS pos
         |       FROM arms),
         |ik AS (SELECT arm, qid, rel,
         |              row_number() OVER (PARTITION BY arm, qid ORDER BY rel DESC, doc_id) AS pos
         |       FROM arms),
         |dcg AS (SELECT arm, qid, CAST(sum(rel * disc.d) AS BIGINT) AS dcg
         |        FROM rk JOIN disc ON disc.pos = rk.pos GROUP BY arm, qid),
         |idcg AS (SELECT arm, qid, CAST(sum(rel * disc.d) AS BIGINT) AS idcg
         |         FROM ik JOIN disc ON disc.pos = ik.pos GROUP BY arm, qid)
         |SELECT dcg.arm, CAST(dcg.qid AS BIGINT) AS qid, dcg.dcg, idcg.idcg,
         |       CAST((1000 * dcg.dcg) // idcg.idcg AS BIGINT) AS ndcg_milli
         |FROM dcg JOIN idcg ON idcg.arm = dcg.arm AND idcg.qid = dcg.qid
         |ORDER BY 1, 2""".stripMargin
    ) { (sp, dir) =>
      val cand = Tables(sp, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 10).as("qid"),
          (md5Long(concat(lit("rel:"), col("doc_id").cast("string"))) % 4).as("rel"),
          (md5Long(concat(lit("rs:"), col("doc_id").cast("string"))) % 1000).as("noise"))
      val arms = cand.select(lit("a_oracle").as("arm"), col("qid"), col("doc_id"), col("rel"),
          (col("rel") * 1000 + col("noise")).as("score"))
        .unionAll(cand.select(lit("b_random").as("arm"), col("qid"), col("doc_id"),
          col("rel"), col("noise").as("score")))
        .cache() // ranked leg + ideal leg
      val disc = sp.range(1).select(explode(array(
        Seq((1, 1000000L), (2, 630930L), (3, 500000L), (4, 430677L), (5, 386853L),
          (6, 356207L), (7, 333333L), (8, 315465L), (9, 301030L), (10, 289065L))
          .map { case (p, d) => struct(lit(p).as("pos"), lit(d).as("d")) }: _*)).as("x"))
        .select(col("x.pos").as("pos"), col("x.d").as("d"))
      val wScore = Window.partitionBy("arm", "qid").orderBy(col("score").desc, col("doc_id"))
      val wIdeal = Window.partitionBy("arm", "qid").orderBy(col("rel").desc, col("doc_id"))
      val dcg = arms.withColumn("pos", row_number().over(wScore))
        .join(broadcast(disc), Seq("pos"))
        .groupBy("arm", "qid").agg(sum(col("rel") * col("d")).as("dcg"))
      val idcg = arms.withColumn("pos", row_number().over(wIdeal))
        .join(broadcast(disc), Seq("pos"))
        .groupBy("arm", "qid").agg(sum(col("rel") * col("d")).as("idcg"))
      dcg.join(idcg, Seq("arm", "qid"))
        .select(col("arm"), col("qid").cast("long").as("qid"), col("dcg"), col("idcg"),
          expr("cast((1000 * dcg) div idcg as bigint)").as("ndcg_milli"))
        .orderBy("arm", "qid")
    },

    // Markov removal-effect attribution — the principled alternative to
    // q140's last-touch: model user journeys as a first-order chain with
    // absorbing CONV/NULL states, compute the conversion probability
    // from START, then re-compute with each channel REMOVED (its visits
    // no longer convert — v(channel) ≡ 0); the relative drop is the
    // channel's credit. The 100 TB trick: ONE scan builds the
    // transition-count table and everything after is |states|²
    // METADATA — the absorbing-chain value function is an exact integer
    // fixed point, vₖ(s) = (Σ_t c(s,t)·wₖ₋₁(t) + c(s,CONV)·10⁶) // C(s),
    // iterated 12 rounds per (arm, state) over a ≤30-row frame (no
    // linear solver, no floats; monotone convergence, both engines run
    // the identical recursion so the oracle unrolls the same 12 rounds).
    // Path semantics pinned in the transition CTE: journeys end at the
    // FIRST purchase (→CONV) or at sequence end (→NULL); START feeds
    // the first pre-purchase event, or CONV directly when the journey
    // opens with a purchase.
    q("q295_markov_attribution",
      "absorbing-chain conversion value + per-channel removal effects, 12 exact rounds")(
      """WITH e AS (SELECT user_id, event_type,
        |                  row_number() OVER (PARTITION BY user_id
        |                                     ORDER BY ts, event_id) AS rn
        |           FROM events),
        |fp AS (SELECT user_id, min(CASE WHEN event_type = 'purchase' THEN rn END) AS f
        |       FROM e GROUP BY user_id),
        |pre AS (SELECT e.user_id, e.event_type, e.rn, fp.f
        |        FROM e JOIN fp ON fp.user_id = e.user_id
        |        WHERE fp.f IS NULL OR e.rn < fp.f),
        |chain AS (SELECT user_id, event_type AS s,
        |                 lead(event_type) OVER (PARTITION BY user_id ORDER BY rn) AS nx,
        |                 rn, f,
        |                 max(rn) OVER (PARTITION BY user_id) AS lastrn
        |          FROM pre),
        |edges AS (
        |  SELECT 'START' AS s, CASE WHEN f = 1 THEN 'CONV' ELSE event_type END AS t
        |  FROM (SELECT fp.user_id, fp.f, e.event_type
        |        FROM fp LEFT JOIN e ON e.user_id = fp.user_id AND e.rn = 1)
        |  UNION ALL
        |  SELECT s, nx FROM chain WHERE nx IS NOT NULL
        |  UNION ALL
        |  SELECT s, CASE WHEN f IS NOT NULL THEN 'CONV' ELSE 'NULL' END
        |  FROM chain WHERE rn = lastrn),
        |trans AS (SELECT s, t, CAST(count(*) AS BIGINT) AS c FROM edges GROUP BY s, t),
        |tots AS (SELECT s, CAST(sum(c) AS BIGINT) AS tot FROM trans GROUP BY s),
        |tr AS (SELECT trans.s, trans.t, trans.c, tots.tot
        |       FROM trans JOIN tots ON tots.s = trans.s),
        |arms AS (SELECT unnest(['base', 'click', 'error', 'signup', 'view']) AS arm),
        |v0 AS (SELECT a.arm, tots.s, CAST(0 AS BIGINT) AS v FROM tots CROSS JOIN arms a),
        |""".stripMargin +
        (1 to 12).map { k =>
          s"""v$k AS MATERIALIZED (
             |  SELECT a.arm, tr.s,
             |         CAST(sum(tr.c * CASE WHEN tr.t = 'CONV' THEN 1000000
             |                              WHEN tr.t = 'NULL' THEN 0
             |                              WHEN tr.t = a.arm THEN 0
             |                              ELSE coalesce(p.v, 0) END) // max(tr.tot) AS BIGINT) AS v
             |  FROM tr CROSS JOIN arms a
             |       LEFT JOIN v${k - 1} p ON p.arm = a.arm AND p.s = tr.t
             |  GROUP BY a.arm, tr.s)""".stripMargin
        }.mkString(",\n") +
        """
          |SELECT v.arm, v.v AS conv_micro,
          |       CAST(CASE WHEN v.arm = 'base' THEN 0
          |            ELSE (1000 * (b.v - v.v)) // b.v END AS BIGINT) AS removal_permille
          |FROM v12 v JOIN (SELECT v FROM v12 WHERE arm = 'base' AND s = 'START') b ON true
          |WHERE v.s = 'START'
          |ORDER BY v.arm""".stripMargin
    ) { (sp, dir) =>
      val wSeq = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val e = Tables(sp, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("rn", row_number().over(wSeq))
      val fp = e.groupBy("user_id")
        .agg(min(when(col("event_type") === "purchase", col("rn"))).as("f"))
      val pre = e.join(fp, Seq("user_id"))
        .filter(col("f").isNull || col("rn") < col("f"))
      val wPre = Window.partitionBy("user_id").orderBy("rn")
      val chain = pre.select(col("user_id"), col("event_type").as("s"),
        lead(col("event_type"), 1).over(wPre).as("nx"), col("rn"), col("f"),
        max(col("rn")).over(Window.partitionBy("user_id")).as("lastrn"))
      val startEdges = fp
        .join(e.filter(col("rn") === 1).select(col("user_id"), col("event_type")),
          Seq("user_id"), "left")
        .select(lit("START").as("s"),
          when(col("f") === 1, "CONV").otherwise(col("event_type")).as("t"))
      val edges = startEdges
        .unionAll(chain.filter(col("nx").isNotNull).select(col("s"), col("nx").as("t")))
        .unionAll(chain.filter(col("rn") === col("lastrn"))
          .select(col("s"), when(col("f").isNotNull, "CONV").otherwise("NULL").as("t")))
      val trans = edges.groupBy("s", "t").agg(count(lit(1)).as("c"))
      val tots = trans.groupBy("s").agg(sum(col("c")).as("tot"))
      val tr = trans.join(tots, Seq("s")).localCheckpoint(true) // 12 rounds re-join this
      val arms = sp.range(1).select(explode(array(
        lit("base"), lit("click"), lit("error"), lit("signup"), lit("view"))).as("arm"))
      var v = tots.crossJoin(arms).select(col("arm"), col("s"), lit(0L).as("v"))
        .localCheckpoint(true)
      for (_ <- 1 to 12) {
        v = tr.crossJoin(broadcast(arms))
          .join(broadcast(v.select(col("arm"), col("s").as("t"), col("v"))),
            Seq("arm", "t"), "left")
          .groupBy("arm", "s")
          .agg(sum(col("c") * when(col("t") === "CONV", 1000000L)
            .when(col("t") === "NULL", 0L)
            .when(col("t") === col("arm"), 0L)
            .otherwise(coalesce(col("v"), lit(0L)))).as("num"),
            max(col("tot")).as("tt"))
          .select(col("arm"), col("s"), expr("cast(num div tt as bigint)").as("v"))
          .localCheckpoint(true)
      }
      val base = v.filter(col("arm") === "base" && col("s") === "START")
        .select(col("v").as("bv"))
      v.filter(col("s") === "START")
        .crossJoin(broadcast(base))
        .select(col("arm"), col("v").as("conv_micro"),
          when(col("arm") === "base", 0L)
            .otherwise(expr("(1000 * (bv - v)) div bv")).cast("long")
            .as("removal_permille"))
        .orderBy("arm")
    },

    // Off-policy evaluation (IPS + SNIPS) — score a NEW policy from data
    // logged under an OLD one, the primitive behind every recommender /
    // bandit iteration that cannot afford an online test. Synthetic
    // bandit with KNOWN ground truth: uniform-1/5 logging policy,
    // deterministic context reward (r = 1 iff action = context mod 5),
    // so every target policy's true value is computable and the
    // estimators are AUDITED, not just computed: the optimal policy
    // (true 1000 milli), the worst (true 0), and a half-mixed one
    // (true ≈ 500). IPS = Σ 1[a=π(x)]·r·5 / n (importance weight 1/p =
    // 5 exactly — integer); SNIPS normalizes by the realized weight sum
    // (lower variance, small bias — both published). All integer milli
    // divisions; one scan, three policies as conditional sums.
    q("q296_offpolicy_eval",
      "IPS + SNIPS off-policy estimates vs known true policy values")(
      s"""WITH b AS (SELECT user_id % 10 AS c,
         |                  ${md5LongSql("'ac:' || CAST(event_id AS VARCHAR)")} % 5 AS a
         |           FROM events),
         |r AS (SELECT c, a, CASE WHEN a = c % 5 THEN 1 ELSE 0 END AS rew FROM b),
         |pol AS (SELECT r.c, r.a, r.rew, p.pol,
         |               CASE p.pol WHEN 'a_opt' THEN r.c % 5
         |                          WHEN 'b_bad' THEN (r.c + 1) % 5
         |                          ELSE CASE WHEN r.c % 2 = 0 THEN r.c % 5
         |                                    ELSE (r.c + 1) % 5 END END AS pa
         |        FROM r CROSS JOIN (SELECT unnest(['a_opt', 'b_bad', 'c_mixed']) AS pol) p),
         |m AS (SELECT pol, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(CASE WHEN a = pa THEN 5 * rew ELSE 0 END) AS BIGINT) AS wsum_r,
         |             CAST(sum(CASE WHEN a = pa THEN 5 ELSE 0 END) AS BIGINT) AS wsum,
         |             CAST(sum(CASE WHEN pa = c % 5 THEN 1 ELSE 0 END) AS BIGINT) AS true_hits
         |      FROM pol GROUP BY pol)
         |SELECT pol AS policy, n,
         |       CAST((1000 * wsum_r) // n AS BIGINT) AS ips_milli,
         |       CAST((1000 * wsum_r) // greatest(wsum, 1) AS BIGINT) AS snips_milli,
         |       CAST((1000 * true_hits) // n AS BIGINT) AS true_milli
         |FROM m ORDER BY policy""".stripMargin
    ) { (sp, dir) =>
      val b = Tables(sp, dir, "events")
        .select((col("user_id") % 10).as("c"),
          (md5Long(concat(lit("ac:"), col("event_id").cast("string"))) % 5).as("a"))
        .withColumn("rew", when(col("a") === col("c") % 5, 1L).otherwise(0L))
      val pols = sp.range(1).select(explode(array(
        lit("a_opt"), lit("b_bad"), lit("c_mixed"))).as("pol"))
      val pol = b.crossJoin(broadcast(pols))
        .withColumn("pa",
          when(col("pol") === "a_opt", col("c") % 5)
            .when(col("pol") === "b_bad", (col("c") + 1) % 5)
            .otherwise(when(col("c") % 2 === 0, col("c") % 5).otherwise((col("c") + 1) % 5)))
      pol.groupBy("pol")
        .agg(count(lit(1)).as("n"),
          sum(when(col("a") === col("pa"), lit(5L) * col("rew")).otherwise(0L)).as("wsum_r"),
          sum(when(col("a") === col("pa"), 5L).otherwise(0L)).as("wsum"),
          sum(when(col("pa") === col("c") % 5, 1L).otherwise(0L)).as("true_hits"))
        .select(col("pol").as("policy"), col("n"),
          expr("cast((1000 * wsum_r) div n as bigint)").as("ips_milli"),
          expr("cast((1000 * wsum_r) div greatest(wsum, 1) as bigint)").as("snips_milli"),
          expr("cast((1000 * true_hits) div n as bigint)").as("true_milli"))
        .orderBy("policy")
    },

    // Bootstrap CI on an A/B DIFFERENCE — q270's Poisson machinery
    // pointed at the question experiments actually ask: is the lift's
    // interval clear of zero? Per replicate, BOTH arms' weighted means
    // come from the same map-side-combined pass and the replicate
    // statistic is their difference; the 90% CI is the exact 2nd/31st
    // rank pick. Two scenarios: a hash A/A split (CI must straddle 0 —
    // the bootstrap's false-positive guard) and a planted +60-deci
    // treatment. Because the lift is a constant shift of one arm, each
    // replicate's difference moves by EXACTLY 60000 milli (the weighted
    // mean of y+60 is the mean of y plus 60, exactly, in integer
    // arithmetic) — so planted CI ≡ A/A CI + 60000, an identity the
    // spec asserts, and 60000 clears the measured A/A band at both
    // scales. Integer throughout; identical hash weights both engines.
    q("q297_bootstrap_ab_diff",
      "Poisson-bootstrap 90% CI of the A/B mean difference: A/A straddles 0, planted lift clears it")(
      s"""WITH e AS (SELECT event_id, CAST(round(value * 10) AS BIGINT) AS y,
         |                  ${md5LongSql("'ab:' || CAST(user_id AS VARCHAR)")} % 2 AS grp
         |           FROM events),
         |sc AS (SELECT 'aa' AS scen, event_id, grp, y FROM e
         |       UNION ALL
         |       SELECT 'planted', event_id, grp, y + CASE WHEN grp = 1 THEN 60 ELSE 0 END
         |       FROM e),
         |fan AS (SELECT sc.scen, sc.grp, sc.y, r.rep,
         |               ${md5LongSql("'bs:' || CAST(sc.event_id AS VARCHAR) || ':' || CAST(r.rep AS VARCHAR)")} % 100000 AS u
         |        FROM sc CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS rep) r),
         |w AS (SELECT scen, grp, y, rep,
         |             CASE WHEN u < 36788 THEN 0 WHEN u < 73576 THEN 1
         |                  WHEN u < 91970 THEN 2 WHEN u < 98101 THEN 3
         |                  WHEN u < 99634 THEN 4 WHEN u < 99941 THEN 5
         |                  WHEN u < 99992 THEN 6 ELSE 7 END AS wt
         |      FROM fan),
         |reps AS (SELECT scen, rep,
         |                CAST((1000 * sum(CASE WHEN grp = 1 THEN wt * y ELSE 0 END))
         |                     // greatest(sum(CASE WHEN grp = 1 THEN wt ELSE 0 END), 1)
         |                   - (1000 * sum(CASE WHEN grp = 0 THEN wt * y ELSE 0 END))
         |                     // greatest(sum(CASE WHEN grp = 0 THEN wt ELSE 0 END), 1) AS BIGINT)
         |                  AS diff_milli
         |         FROM w GROUP BY scen, rep),
         |rk AS (SELECT scen, diff_milli,
         |              row_number() OVER (PARTITION BY scen ORDER BY diff_milli) AS rn
         |       FROM reps)
         |SELECT scen,
         |       CAST(max(CASE WHEN rn = 2 THEN diff_milli END) AS BIGINT) AS ci_lo_milli,
         |       CAST(max(CASE WHEN rn = 31 THEN diff_milli END) AS BIGINT) AS ci_hi_milli,
         |       CAST(CASE WHEN max(CASE WHEN rn = 2 THEN diff_milli END) > 0
         |                   OR max(CASE WHEN rn = 31 THEN diff_milli END) < 0
         |            THEN 1 ELSE 0 END AS BIGINT) AS significant
         |FROM rk GROUP BY scen ORDER BY scen""".stripMargin
    ) { (sp, dir) =>
      val e = Tables(sp, dir, "events")
        .select(col("event_id"), round(col("value") * 10).cast("long").as("y"),
          (md5Long(concat(lit("ab:"), col("user_id").cast("string"))) % 2).as("grp"))
      val sc = e.select(lit("aa").as("scen"), col("event_id"), col("grp"), col("y"))
        .unionAll(e.select(lit("planted").as("scen"), col("event_id"), col("grp"),
          (col("y") + when(col("grp") === 1, 60L).otherwise(0L)).as("y")))
      val reps32 = sp.range(1).select(explode(sequence(lit(0), lit(31))).as("rep"))
      val w = sc.crossJoin(broadcast(reps32))
        .withColumn("u", md5Long(concat(lit("bs:"), col("event_id").cast("string"),
          lit(":"), col("rep").cast("string"))) % 100000)
        .withColumn("wt",
          when(col("u") < 36788, 0L).when(col("u") < 73576, 1L)
            .when(col("u") < 91970, 2L).when(col("u") < 98101, 3L)
            .when(col("u") < 99634, 4L).when(col("u") < 99941, 5L)
            .when(col("u") < 99992, 6L).otherwise(7L))
      val reps = w.groupBy("scen", "rep")
        .agg(sum(when(col("grp") === 1, col("wt") * col("y")).otherwise(0L)).as("s1"),
          sum(when(col("grp") === 1, col("wt")).otherwise(0L)).as("w1"),
          sum(when(col("grp") === 0, col("wt") * col("y")).otherwise(0L)).as("s0"),
          sum(when(col("grp") === 0, col("wt")).otherwise(0L)).as("w0"))
        .select(col("scen"),
          expr("cast((1000 * s1) div greatest(w1, 1) - (1000 * s0) div greatest(w0, 1) as bigint)")
            .as("diff_milli"))
      val wRk = Window.partitionBy("scen").orderBy("diff_milli")
      reps.withColumn("rn", row_number().over(wRk))
        .groupBy("scen")
        .agg(max(when(col("rn") === 2, col("diff_milli"))).cast("long").as("ci_lo_milli"),
          max(when(col("rn") === 31, col("diff_milli"))).cast("long").as("ci_hi_milli"))
        .select(col("scen"), col("ci_lo_milli"), col("ci_hi_milli"),
          when(col("ci_lo_milli") > 0 || col("ci_hi_milli") < 0, 1L)
            .otherwise(0L).as("significant"))
        .orderBy("scen")
    },

    // CUPED — the variance-reduction method every experimentation
    // platform runs (Deng et al. 2013, public literature): adjust the
    // post-period metric by θ·(pre-period covariate) and the experiment
    // needs a fraction of the traffic for the same power. The covariate
    // only helps when user behavior PERSISTS across periods, so a
    // hash-derived per-user rate multiplier (×1..5) is planted into the
    // metric on BOTH sides of the time split — the documented
    // construction (the fixture's raw values are iid, the q282 lesson:
    // only built dependencies carry signal). Everything integer: user
    // means in truncating milli, θ = (1000·(nΣXY − ΣXΣY)) //
    // (nΣX² − (ΣX)²) in 38-digit space, adjusted metric Y − θX//1000,
    // variances cleared the same way, and the planted +30-deci lift
    // shifts the naive lift EXACTLY (constant per-row shift of one
    // group's post rows). Output: θ, naive vs CUPED lift, and the
    // variance-reduction permille — the number that justifies the
    // method. Scale shape: one scan → per-(user, period) partials →
    // user-level frame → three moment rollups.
    q("q298_cuped",
      "CUPED adjusted lift + variance reduction from a persistent-user covariate")(
      s"""WITH e AS (SELECT user_id, CAST(round(value * 10) AS BIGINT) AS y0,
         |                  CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) AS t
         |           FROM events),
         |cut AS (SELECT (min(t) + max(t)) // 2 AS c FROM e),
         |r AS (SELECT user_id,
         |             y0 * (1 + ${md5LongSql("'um:' || CAST(user_id AS VARCHAR)")} % 5) AS y,
         |             CASE WHEN t >= cut.c THEN 1 ELSE 0 END AS post,
         |             CASE WHEN ${md5LongSql("'cg:' || CAST(user_id AS VARCHAR)")} % 2 = 0
         |                  THEN 1 ELSE 0 END AS g
         |      FROM e CROSS JOIN cut),
         |arms AS (SELECT 'null' AS arm, user_id, g, post, y FROM r
         |         UNION ALL
         |         SELECT 'planted', user_id, g, post,
         |                y + CASE WHEN g = 1 AND post = 1 THEN 30 ELSE 0 END FROM r),
         |u AS (SELECT arm, user_id, max(g) AS g,
         |             CAST((1000 * sum(CASE WHEN post = 0 THEN y END))
         |                  // count(CASE WHEN post = 0 THEN 1 END) AS BIGINT) AS x,
         |             CAST((1000 * sum(CASE WHEN post = 1 THEN y END))
         |                  // count(CASE WHEN post = 1 THEN 1 END) AS BIGINT) AS yy
         |      FROM arms GROUP BY arm, user_id
         |      HAVING count(CASE WHEN post = 0 THEN 1 END) > 0
         |         AND count(CASE WHEN post = 1 THEN 1 END) > 0),
         |th AS (SELECT arm,
         |              CAST((1000 * (count(*) * CAST(sum(x * yy) AS HUGEINT)
         |                            - CAST(sum(x) AS HUGEINT) * sum(yy)))
         |                   // (count(*) * CAST(sum(x * x) AS HUGEINT)
         |                      - CAST(sum(x) AS HUGEINT) * sum(x)) AS BIGINT) AS theta
         |       FROM u GROUP BY arm),
         |adj AS (SELECT u.arm, u.g, u.yy, u.yy - (th.theta * u.x) // 1000 AS yc
         |        FROM u JOIN th ON th.arm = u.arm),
         |agg AS (SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
         |               CAST((sum(CASE WHEN g = 1 THEN yy END) // count(CASE WHEN g = 1 THEN 1 END))
         |                  - (sum(CASE WHEN g = 0 THEN yy END) // count(CASE WHEN g = 0 THEN 1 END))
         |                 AS BIGINT) AS lift_naive_milli,
         |               CAST((sum(CASE WHEN g = 1 THEN yc END) // count(CASE WHEN g = 1 THEN 1 END))
         |                  - (sum(CASE WHEN g = 0 THEN yc END) // count(CASE WHEN g = 0 THEN 1 END))
         |                 AS BIGINT) AS lift_cuped_milli,
         |               CAST((count(*) * CAST(sum(yy * yy) AS HUGEINT)
         |                     - CAST(sum(yy) AS HUGEINT) * sum(yy)) // (count(*) * (count(*) - 1))
         |                 AS BIGINT) AS var_y,
         |               CAST((count(*) * CAST(sum(yc * yc) AS HUGEINT)
         |                     - CAST(sum(yc) AS HUGEINT) * sum(yc)) // (count(*) * (count(*) - 1))
         |                 AS BIGINT) AS var_yc
         |        FROM adj GROUP BY arm)
         |SELECT agg.arm, agg.n_users, th.theta AS theta_milli,
         |       agg.lift_naive_milli, agg.lift_cuped_milli,
         |       CAST((1000 * (agg.var_y - agg.var_yc)) // agg.var_y AS BIGINT)
         |         AS var_reduction_permille
         |FROM agg JOIN th ON th.arm = agg.arm ORDER BY agg.arm""".stripMargin
    ) { (sp, dir) =>
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val e = Tables(sp, dir, "events")
        .select(col("user_id"), round(col("value") * 10).cast("long").as("y0"),
          expr("cast(ts as bigint)").as("t"))
      val cut = e.agg(expr("(min(t) + max(t)) div 2").as("c"))
      val r = e.crossJoin(broadcast(cut))
        .select(col("user_id"),
          (col("y0") * (lit(1L) + md5Long(concat(lit("um:"),
            col("user_id").cast("string"))) % 5)).as("y"),
          when(col("t") >= col("c"), 1L).otherwise(0L).as("post"),
          when(md5Long(concat(lit("cg:"), col("user_id").cast("string"))) % 2 === 0, 1L)
            .otherwise(0L).as("g"))
      val arms = r.select(lit("null").as("arm"), col("user_id"), col("g"), col("post"), col("y"))
        .unionAll(r.select(lit("planted").as("arm"), col("user_id"), col("g"), col("post"),
          (col("y") + when(col("g") === 1 && col("post") === 1, 30L).otherwise(0L)).as("y")))
      val u = arms.groupBy("arm", "user_id")
        .agg(max(col("g")).as("g"),
          sum(when(col("post") === 0, col("y"))).as("sx"),
          count(when(col("post") === 0, 1)).as("nx"),
          sum(when(col("post") === 1, col("y"))).as("sy"),
          count(when(col("post") === 1, 1)).as("ny"))
        .filter(col("nx") > 0 && col("ny") > 0)
        .select(col("arm"), col("g"),
          expr("cast((1000 * sx) div nx as bigint)").as("x"),
          expr("cast((1000 * sy) div ny as bigint)").as("yy"))
        .cache() // theta fit + adjusted rollup
      val th = u.groupBy("arm")
        .agg(count(lit(1)).as("n"), sum(col("x") * col("yy")).as("sxy"),
          sum(col("x")).as("sx"), sum(col("yy")).as("sy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("arm"),
          expr(("cast((1000 * (n * cast(sxy as decimal(38,0)) - cast(sx as decimal(38,0)) * sy))"
            + " div (n * cast(sxx as decimal(38,0)) - cast(sx as decimal(38,0)) * sx) as bigint)"))
            .as("theta"))
      val adj = u.join(broadcast(th), Seq("arm"))
        .select(col("arm"), col("g"), col("yy"),
          (col("yy") - expr("(theta * x) div 1000")).as("yc"))
      val agg2 = adj.groupBy("arm")
        .agg(count(lit(1)).as("n_users"),
          expr("cast((sum(case when g = 1 then yy end) div count(case when g = 1 then 1 end))"
            + " - (sum(case when g = 0 then yy end) div count(case when g = 0 then 1 end)) as bigint)")
            .as("lift_naive_milli"),
          expr("cast((sum(case when g = 1 then yc end) div count(case when g = 1 then 1 end))"
            + " - (sum(case when g = 0 then yc end) div count(case when g = 0 then 1 end)) as bigint)")
            .as("lift_cuped_milli"),
          expr(("cast((count(*) * cast(sum(yy * yy) as decimal(38,0))"
            + " - cast(sum(yy) as decimal(38,0)) * sum(yy)) div (count(*) * (count(*) - 1)) as bigint)"))
            .as("var_y"),
          expr(("cast((count(*) * cast(sum(yc * yc) as decimal(38,0))"
            + " - cast(sum(yc) as decimal(38,0)) * sum(yc)) div (count(*) * (count(*) - 1)) as bigint)"))
            .as("var_yc"))
      agg2.join(th, Seq("arm"))
        .select(col("arm"), col("n_users"), col("theta").as("theta_milli"),
          col("lift_naive_milli"), col("lift_cuped_milli"),
          expr("cast((1000 * (var_y - var_yc)) div var_y as bigint)")
            .as("var_reduction_permille"))
        .orderBy("arm")
    },

    // Sample-ratio mismatch — the gate every experiment readout runs
    // FIRST: if the randomization didn't deliver the designed split,
    // every downstream lift is suspect. χ² for a 50:50 design folds to
    // (n₁−n₀)²/n, cleared to 1000·(n₁−n₀)² // n milli against the
    // 3841-milli critical value — pure integer, unit = DISTINCT users
    // (the randomization unit, not events). Two arms: the fair hash
    // split (must pass) and a 30%/70% assignment (must fire at
    // both scales; the fixture has only 150 randomization UNITS at
    // sf0.01 — a 2-point bias is statistically invisible there, so the
    // planted fault is sized to the unit count, the q260 lesson on the
    // randomization axis).
    q("q299_srm_gate",
      "sample-ratio-mismatch chi-square on distinct users: fair split passes, 48% bias fires")(
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |a AS (SELECT 'biased' AS arm,
         |             CASE WHEN ${md5LongSql("'sr:' || CAST(user_id AS VARCHAR)")} % 1000 < 300
         |                  THEN 1 ELSE 0 END AS g
         |      FROM u
         |      UNION ALL
         |      SELECT 'fair', CASE WHEN ${md5LongSql("'cg:' || CAST(user_id AS VARCHAR)")} % 2 = 0
         |                          THEN 1 ELSE 0 END
         |      FROM u),
         |m AS (SELECT arm, CAST(sum(g) AS BIGINT) AS n1,
         |             CAST(sum(1 - g) AS BIGINT) AS n0 FROM a GROUP BY arm)
         |SELECT arm, n0, n1,
         |       CAST((1000 * (n1 - n0) * (n1 - n0)) // (n1 + n0) AS BIGINT) AS chi2_milli,
         |       CAST(CASE WHEN (1000 * (n1 - n0) * (n1 - n0)) // (n1 + n0) > 3841
         |            THEN 1 ELSE 0 END AS BIGINT) AS srm_detected
         |FROM m ORDER BY arm""".stripMargin
    ) { (sp, dir) =>
      val u = Tables(sp, dir, "events").select(col("user_id")).distinct()
      def g(tag: String, cond: Column => Column) = cond(
        md5Long(concat(lit(tag), col("user_id").cast("string"))))
      val a = u.select(lit("biased").as("arm"),
          when(g("sr:", h => h % 1000 < 300), 1L).otherwise(0L).as("g"))
        .unionAll(u.select(lit("fair").as("arm"),
          when(g("cg:", h => h % 2 === 0), 1L).otherwise(0L).as("g")))
      a.groupBy("arm").agg(sum(col("g")).as("n1"), sum(lit(1L) - col("g")).as("n0"))
        .select(col("arm"), col("n0"), col("n1"),
          expr("cast((1000 * (n1 - n0) * (n1 - n0)) div (n1 + n0) as bigint)").as("chi2_milli"),
          when(expr("(1000 * (n1 - n0) * (n1 - n0)) div (n1 + n0)") > 3841, 1L)
            .otherwise(0L).as("srm_detected"))
        .orderBy("arm")
    },

    // The composed experiment READOUT — the capstone that proves the
    // experimentation family composes into the one table a decision
    // meeting actually reads, in ONE lineage: SRM gate on the
    // randomization units (q299), naive lift, CUPED θ/adjusted lift/
    // variance cut (q298's machinery verbatim, planted +200-deci
    // experiment — sized so the verdict clears critical against the
    // residual between-user variance at BOTH unit counts), and the
    // final z² significance of the CUPED lift
    // using its own reduced variance — every number integer-cleared,
    // every stage feeding the next without a re-scan (user-level frame
    // built once). Output is the (metric, value) report. The verdict
    // chain is the point: srm_pass must be 1 BEFORE the significant
    // flag means anything, and with the variance cut the planted lift
    // is significant where the naive one at sf0.01 would not be.
    q("q300_experiment_readout",
      "one-lineage experiment report: SRM gate, naive + CUPED lift, variance cut, z2 verdict")(
      s"""WITH e AS (SELECT user_id, CAST(round(value * 10) AS BIGINT) AS y0,
         |                  CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) AS t
         |           FROM events),
         |cut AS (SELECT (min(t) + max(t)) // 2 AS c FROM e),
         |r AS (SELECT user_id,
         |             y0 * (1 + ${md5LongSql("'um:' || CAST(user_id AS VARCHAR)")} % 5) AS y,
         |             CASE WHEN t >= cut.c THEN 1 ELSE 0 END AS post,
         |             CASE WHEN ${md5LongSql("'cg:' || CAST(user_id AS VARCHAR)")} % 2 = 0
         |                  THEN 1 ELSE 0 END AS g
         |      FROM e CROSS JOIN cut),
         |rx AS (SELECT user_id, g, post,
         |              y + CASE WHEN g = 1 AND post = 1 THEN 200 ELSE 0 END AS y FROM r),
         |u AS (SELECT user_id, max(g) AS g,
         |             CAST((1000 * sum(CASE WHEN post = 0 THEN y END))
         |                  // count(CASE WHEN post = 0 THEN 1 END) AS BIGINT) AS x,
         |             CAST((1000 * sum(CASE WHEN post = 1 THEN y END))
         |                  // count(CASE WHEN post = 1 THEN 1 END) AS BIGINT) AS yy
         |      FROM rx GROUP BY user_id
         |      HAVING count(CASE WHEN post = 0 THEN 1 END) > 0
         |         AND count(CASE WHEN post = 1 THEN 1 END) > 0),
         |srm AS (SELECT CAST(sum(g) AS BIGINT) AS n1, CAST(sum(1 - g) AS BIGINT) AS n0 FROM u),
         |th AS (SELECT CAST((1000 * (count(*) * CAST(sum(x * yy) AS HUGEINT)
         |                            - CAST(sum(x) AS HUGEINT) * sum(yy)))
         |                   // (count(*) * CAST(sum(x * x) AS HUGEINT)
         |                      - CAST(sum(x) AS HUGEINT) * sum(x)) AS BIGINT) AS theta
         |       FROM u),
         |adj AS (SELECT u.g, u.yy, u.yy - (th.theta * u.x) // 1000 AS yc
         |        FROM u CROSS JOIN th),
         |agg AS (SELECT CAST(sum(CASE WHEN g = 1 THEN yy END) // sum(CASE WHEN g = 1 THEN 1 END)
         |                  - sum(CASE WHEN g = 0 THEN yy END) // sum(CASE WHEN g = 0 THEN 1 END)
         |                 AS BIGINT) AS lift_naive,
         |               CAST(sum(CASE WHEN g = 1 THEN yc END) // sum(CASE WHEN g = 1 THEN 1 END)
         |                  - sum(CASE WHEN g = 0 THEN yc END) // sum(CASE WHEN g = 0 THEN 1 END)
         |                 AS BIGINT) AS lift_cuped,
         |               CAST((count(*) * CAST(sum(yy * yy) AS HUGEINT)
         |                     - CAST(sum(yy) AS HUGEINT) * sum(yy)) // (count(*) * (count(*) - 1))
         |                 AS BIGINT) AS var_y,
         |               CAST((count(*) * CAST(sum(yc * yc) AS HUGEINT)
         |                     - CAST(sum(yc) AS HUGEINT) * sum(yc)) // (count(*) * (count(*) - 1))
         |                 AS BIGINT) AS var_yc
         |        FROM adj)
         |SELECT * FROM (
         |  SELECT 'a_srm_chi2_milli' AS metric,
         |         CAST((1000 * (n1 - n0) * (n1 - n0)) // (n1 + n0) AS BIGINT) AS value FROM srm
         |  UNION ALL
         |  SELECT 'b_srm_pass', CAST(CASE WHEN (1000 * (n1 - n0) * (n1 - n0)) // (n1 + n0) <= 3841
         |                            THEN 1 ELSE 0 END AS BIGINT) FROM srm
         |  UNION ALL SELECT 'c_lift_naive_milli', lift_naive FROM agg
         |  UNION ALL SELECT 'd_theta_milli', theta FROM th
         |  UNION ALL SELECT 'e_lift_cuped_milli', lift_cuped FROM agg
         |  UNION ALL
         |  SELECT 'f_var_reduction_permille',
         |         CAST((1000 * (var_y - var_yc)) // var_y AS BIGINT) FROM agg
         |  UNION ALL
         |  SELECT 'g_z2_cuped_milli',
         |         CAST((1000 * (srm.n1 * srm.n0 // (srm.n1 + srm.n0)) * agg.lift_cuped * agg.lift_cuped)
         |              // agg.var_yc AS BIGINT)
         |  FROM agg CROSS JOIN srm
         |  UNION ALL
         |  SELECT 'h_significant',
         |         CAST(CASE WHEN (1000 * (srm.n1 * srm.n0 // (srm.n1 + srm.n0))
         |                         * agg.lift_cuped * agg.lift_cuped) // agg.var_yc > 3841
         |              THEN 1 ELSE 0 END AS BIGINT)
         |  FROM agg CROSS JOIN srm)
         |ORDER BY metric""".stripMargin
    ) { (sp, dir) =>
      val e = Tables(sp, dir, "events")
        .select(col("user_id"), round(col("value") * 10).cast("long").as("y0"),
          expr("cast(ts as bigint)").as("t"))
      val cut = e.agg(expr("(min(t) + max(t)) div 2").as("c"))
      val rx = e.crossJoin(broadcast(cut))
        .select(col("user_id"),
          (col("y0") * (lit(1L) + md5Long(concat(lit("um:"),
            col("user_id").cast("string"))) % 5)).as("y"),
          when(col("t") >= col("c"), 1L).otherwise(0L).as("post"),
          when(md5Long(concat(lit("cg:"), col("user_id").cast("string"))) % 2 === 0, 1L)
            .otherwise(0L).as("g"))
        .select(col("user_id"), col("g"), col("post"),
          (col("y") + when(col("g") === 1 && col("post") === 1, 200L).otherwise(0L)).as("y"))
      val u = rx.groupBy("user_id")
        .agg(max(col("g")).as("g"),
          sum(when(col("post") === 0, col("y"))).as("sx"),
          count(when(col("post") === 0, 1)).as("nx"),
          sum(when(col("post") === 1, col("y"))).as("sy"),
          count(when(col("post") === 1, 1)).as("ny"))
        .filter(col("nx") > 0 && col("ny") > 0)
        .select(col("g"), expr("cast((1000 * sx) div nx as bigint)").as("x"),
          expr("cast((1000 * sy) div ny as bigint)").as("yy"))
        .cache() // srm + theta + adjusted rollup, one user frame
      val srm = u.agg(sum(col("g")).as("n1"), sum(lit(1L) - col("g")).as("n0"))
      val th = u.agg(count(lit(1)).as("n"), sum(col("x") * col("yy")).as("sxy"),
          sum(col("x")).as("sx"), sum(col("yy")).as("sy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(expr(("cast((1000 * (n * cast(sxy as decimal(38,0)) - cast(sx as decimal(38,0)) * sy))"
          + " div (n * cast(sxx as decimal(38,0)) - cast(sx as decimal(38,0)) * sx) as bigint)"))
          .as("theta"))
      val adj = u.crossJoin(broadcast(th))
        .select(col("g"), col("yy"), (col("yy") - expr("(theta * x) div 1000")).as("yc"))
      val agg3 = adj.agg(
        expr("cast(sum(case when g = 1 then yy end) div sum(case when g = 1 then 1 end)"
          + " - sum(case when g = 0 then yy end) div sum(case when g = 0 then 1 end) as bigint)")
          .as("lift_naive"),
        expr("cast(sum(case when g = 1 then yc end) div sum(case when g = 1 then 1 end)"
          + " - sum(case when g = 0 then yc end) div sum(case when g = 0 then 1 end) as bigint)")
          .as("lift_cuped"),
        expr(("cast((count(*) * cast(sum(yy * yy) as decimal(38,0))"
          + " - cast(sum(yy) as decimal(38,0)) * sum(yy)) div (count(*) * (count(*) - 1)) as bigint)"))
          .as("var_y"),
        expr(("cast((count(*) * cast(sum(yc * yc) as decimal(38,0))"
          + " - cast(sum(yc) as decimal(38,0)) * sum(yc)) div (count(*) * (count(*) - 1)) as bigint)"))
          .as("var_yc"))
      val all3 = agg3.crossJoin(broadcast(srm)).crossJoin(broadcast(th))
      def row(name: String, v: Column) = all3.select(lit(name).as("metric"), v.cast("long").as("value"))
      row("a_srm_chi2_milli", expr("(1000 * (n1 - n0) * (n1 - n0)) div (n1 + n0)"))
        .unionAll(row("b_srm_pass",
          when(expr("(1000 * (n1 - n0) * (n1 - n0)) div (n1 + n0)") <= 3841, 1L).otherwise(0L)))
        .unionAll(row("c_lift_naive_milli", col("lift_naive")))
        .unionAll(row("d_theta_milli", col("theta")))
        .unionAll(row("e_lift_cuped_milli", col("lift_cuped")))
        .unionAll(row("f_var_reduction_permille",
          expr("(1000 * (var_y - var_yc)) div var_y")))
        .unionAll(row("g_z2_cuped_milli",
          expr("(1000 * (n1 * n0 div (n1 + n0)) * lift_cuped * lift_cuped) div var_yc")))
        .unionAll(row("h_significant",
          when(expr("(1000 * (n1 * n0 div (n1 + n0)) * lift_cuped * lift_cuped) div var_yc")
            > 3841, 1L).otherwise(0L)))
        .orderBy("metric")
    },

    // Qini curve — uplift-model evaluation: when a treatment only helps
    // SOME users, targeting by predicted uplift beats targeting anyone,
    // and the Qini curve measures by how much. Synthetic ground truth
    // (the family's discipline): conversion = deterministic hash draw
    // whose rate is base 30% but 70% for TREATED users in the
    // responsive half of segments — so per-user true uplift is known.
    // Two scorers: the oracle (true segment uplift + hash noise) and a
    // pure-noise ranker. Qini@decile = cum_treated_conv −
    // cum_control_conv·(cum_treated/cum_control), integer-cleared with
    // one truncating division per decile; the oracle curve must
    // dominate the random one early and both meet at decile 10
    // (endpoint identity — same population). Deciles come from the
    // score histogram rank walk, never a global sort.
    q("q301_qini_curve",
      "uplift Qini by score decile: oracle scorer dominates early, curves meet at the end")(
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |b AS (SELECT user_id,
         |             CASE WHEN ${md5LongSql("'qt:' || CAST(user_id AS VARCHAR)")} % 2 = 0
         |                  THEN 1 ELSE 0 END AS tr,
         |             CASE WHEN ${md5LongSql("'qs:' || CAST(user_id AS VARCHAR)")} % 2 = 0
         |                  THEN 1 ELSE 0 END AS responsive,
         |             ${md5LongSql("'qc:' || CAST(user_id AS VARCHAR)")} % 100 AS draw,
         |             ${md5LongSql("'qn:' || CAST(user_id AS VARCHAR)")} % 100 AS noise
         |      FROM u),
         |o AS (SELECT user_id, tr, responsive,
         |             CASE WHEN draw < 30 + CASE WHEN tr = 1 AND responsive = 1 THEN 40 ELSE 0 END
         |                  THEN 1 ELSE 0 END AS conv,
         |             responsive * 1000 + noise AS s_oracle,
         |             noise AS s_random
         |      FROM b),
         |arms AS (SELECT 'a_oracle' AS arm, user_id, tr, conv, s_oracle AS s FROM o
         |         UNION ALL SELECT 'b_random', user_id, tr, conv, s_random FROM o),
         |rk AS (SELECT arm, tr, conv, s,
         |              ntile(10) OVER (PARTITION BY arm ORDER BY s DESC, user_id) AS dec
         |       FROM arms),
         |d AS (SELECT arm, dec, CAST(sum(tr) AS BIGINT) AS nt,
         |             CAST(sum(1 - tr) AS BIGINT) AS nc,
         |             CAST(sum(tr * conv) AS BIGINT) AS ct,
         |             CAST(sum((1 - tr) * conv) AS BIGINT) AS cc
         |      FROM rk GROUP BY arm, dec),
         |c AS (SELECT arm, dec,
         |             CAST(sum(nt) OVER w AS BIGINT) AS cnt, CAST(sum(nc) OVER w AS BIGINT) AS cnc,
         |             CAST(sum(ct) OVER w AS BIGINT) AS cct, CAST(sum(cc) OVER w AS BIGINT) AS ccc
         |      FROM d WINDOW w AS (PARTITION BY arm ORDER BY dec
         |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT arm, CAST(dec AS BIGINT) AS dec, cct, ccc,
         |       CAST(1000 * cct - (1000 * ccc * cnt) // greatest(cnc, 1) AS BIGINT)
         |         AS qini_milli
         |FROM c ORDER BY arm, dec""".stripMargin
    ) { (sp, dir) =>
      val u = Tables(sp, dir, "events").select(col("user_id")).distinct()
      def h(tag: String) = md5Long(concat(lit(tag), col("user_id").cast("string")))
      val o = u.select(col("user_id"),
          when(h("qt:") % 2 === 0, 1L).otherwise(0L).as("tr"),
          when(h("qs:") % 2 === 0, 1L).otherwise(0L).as("responsive"),
          (h("qc:") % 100).as("draw"), (h("qn:") % 100).as("noise"))
        .select(col("user_id"), col("tr"), col("responsive"),
          when(col("draw") < lit(30L) +
            when(col("tr") === 1 && col("responsive") === 1, 40L).otherwise(0L), 1L)
            .otherwise(0L).as("conv"),
          (col("responsive") * 1000 + col("noise")).as("s_oracle"),
          col("noise").as("s_random"))
      val arms = o.select(lit("a_oracle").as("arm"), col("user_id"), col("tr"),
          col("conv"), col("s_oracle").as("s"))
        .unionAll(o.select(lit("b_random").as("arm"), col("user_id"), col("tr"),
          col("conv"), col("s_random").as("s")))
      val rk = arms.withColumn("dec",
        ntile(10).over(Window.partitionBy("arm").orderBy(col("s").desc, col("user_id"))))
      val d = rk.groupBy("arm", "dec")
        .agg(sum(col("tr")).as("nt"), sum(lit(1L) - col("tr")).as("nc"),
          sum(col("tr") * col("conv")).as("ct"),
          sum((lit(1L) - col("tr")) * col("conv")).as("cc"))
      val wCum = Window.partitionBy("arm").orderBy("dec")
        .rowsBetween(Long.MinValue, 0)
      d.select(col("arm"), col("dec").cast("long").as("dec"),
          sum(col("nt")).over(wCum).as("cnt"), sum(col("nc")).over(wCum).as("cnc"),
          sum(col("ct")).over(wCum).as("cct"), sum(col("cc")).over(wCum).as("ccc"))
        .select(col("arm"), col("dec"), col("cct"), col("ccc"),
          expr("cast(1000 * cct - (1000 * ccc * cnt) div greatest(cnc, 1) as bigint)")
            .as("qini_milli"))
        .orderBy("arm", "dec")
    },

    // SPRT — Wald's sequential test, the early-stopping design that
    // decides with a FRACTION of the fixed-n sample: cumulative
    // log-likelihood ratio against H0: p=0.5 vs H1: p=0.7, stop when it
    // exits (−ln19, +ln19) for α=β=0.05 (H1 sized so E[N] ≈ 35 fits the
    // fixture's 150 randomization units). LLR increments are integer
    // micro LITERALS (ln 1.4 → 336472, ln 0.6 → −510826 — quantized
    // constants, the q294 discount idiom), so the fold is exact integer
    // addition. Scale discipline: the walk is folded at BLOCK resolution
    // — blocks are HASH-VALUE RANGES (≈10 users each; no global
    // row_number — a folded-away constant partition IS a single-task
    // funnel, measured), per-block sums from one grouped pass, the
    // cumulative over the ≤|users|/10-block spine; DistributedRank is
    // the row-exact alternative, stated — so the decision index is
    // block-granular, which is how a streaming deployment would check
    // anyway. Null coin must accept H0, planted 60% coin must reject,
    // and BOTH must decide far earlier than the fixed-n design
    // (n_blocks·100 ≪ the q255-style fixed sample) — the method's whole
    // point, spec-pinned.
    q("q302_sprt",
      "block-resolution Wald SPRT: null accepts H0, planted 60% coin rejects, both early")(
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |s AS (SELECT ${md5LongSql("'so:' || CAST(user_id AS VARCHAR)")} % 1000000 AS ord,
         |             CASE WHEN ${md5LongSql("'sc:' || CAST(user_id AS VARCHAR)")} % 100 < 50
         |                  THEN 1 ELSE 0 END AS y_null,
         |             CASE WHEN ${md5LongSql("'sc:' || CAST(user_id AS VARCHAR)")} % 100 < 70
         |                  THEN 1 ELSE 0 END AS y_alt
         |      FROM u),
         |nb AS (SELECT greatest(count(*) // 10, 1) AS nb FROM s),
         |arms AS (SELECT 'null' AS arm, (s.ord * nb.nb) // 1000000 AS blk, y_null AS y
         |         FROM s CROSS JOIN nb
         |         UNION ALL
         |         SELECT 'planted', (s.ord * nb.nb) // 1000000, y_alt FROM s CROSS JOIN nb),
         |b AS (SELECT arm, blk, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS k
         |      FROM arms GROUP BY arm, blk),
         |c AS (SELECT arm, blk, n, k,
         |             CAST(sum(336472 * k - 510826 * (n - k)) OVER w AS BIGINT) AS llr,
         |             CAST(sum(n) OVER w AS BIGINT) AS cn
         |      FROM b WINDOW w AS (PARTITION BY arm ORDER BY blk
         |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |dec AS (SELECT arm, min(CASE WHEN llr >= 2944439 OR llr <= -2944439 THEN blk END) AS dblk
         |        FROM c GROUP BY arm),
         |fin AS (SELECT c.arm, c.cn, c.llr
         |        FROM c JOIN dec ON dec.arm = c.arm AND c.blk = dec.dblk)
         |SELECT arm, cn AS n_samples, llr AS llr_micro,
         |       CAST(CASE WHEN llr >= 2944439 THEN 1 ELSE 0 END AS BIGINT) AS reject_h0
         |FROM fin ORDER BY arm""".stripMargin
    ) { (sp, dir) =>
      val u = Tables(sp, dir, "events").select(col("user_id")).distinct()
      def h(tag: String) = md5Long(concat(lit(tag), col("user_id").cast("string")))
      val s = u.select((h("so:") % 1000000).as("ord"),
        when(h("sc:") % 100 < 50, 1L).otherwise(0L).as("y_null"),
        when(h("sc:") % 100 < 70, 1L).otherwise(0L).as("y_alt"))
      // arrival order = hash-value order, blocked by VALUE RANGE so no
      // global row_number (a folded-away constant partition would be a
      // single-task funnel — measured; block sizes are ~Poisson(10),
      // which the per-block (n, k) fold handles exactly)
      val nb = s.agg(greatest(expr("count(*) div 10"), lit(1L)).as("nb"))
      val sb = s.crossJoin(broadcast(nb))
        .withColumn("blk", expr("(ord * nb) div 1000000"))
      val arms = sb.select(lit("null").as("arm"), col("blk"), col("y_null").as("y"))
        .unionAll(sb.select(lit("planted").as("arm"), col("blk"), col("y_alt").as("y")))
      val b = arms.groupBy("arm", "blk").agg(count(lit(1)).as("n"), sum(col("y")).as("k"))
      val wCum = Window.partitionBy("arm").orderBy("blk").rowsBetween(Long.MinValue, 0)
      val c = b.select(col("arm"), col("blk"), col("n"), col("k"),
        sum(lit(336472L) * col("k") - lit(510826L) * (col("n") - col("k"))).over(wCum)
          .as("llr"),
        sum(col("n")).over(wCum).as("cn"))
      val dec = c.groupBy("arm")
        .agg(min(when(col("llr") >= 2944439L || col("llr") <= -2944439L, col("blk")))
          .as("dblk"))
        .select(col("arm").as("darm"), col("dblk"))
      c.join(broadcast(dec), col("arm") === col("darm") && col("blk") === col("dblk"))
        .select(col("arm"), col("cn").cast("long").as("n_samples"),
          col("llr").as("llr_micro"),
          when(col("llr") >= 2944439L, 1L).otherwise(0L).as("reject_h0"))
        .orderBy("arm")
    },

    // Neyman allocation — the survey-design answer to "which strata get
    // the sample budget": n_h ∝ N_h·σ_h, which halves the estimator
    // variance vs proportional allocation exactly when stratum spreads
    // differ. The integer key: N_h·σ_h = √(N_h·Σy² − (Σy)²) = isqrt(A_h)
    // — ONE exact integer per stratum from one grouped scan (dollars
    // quantization keeps every sum in 38-digit space). A_h here reaches
    // ~2·10²⁰, past q285's 2⁵² floor-sqrt validity bound, so the seed
    // isqrt gets a ±1 integer-compare clamp ((s0±1)² vs A in
    // DECIMAL/HUGEINT) — exact for any A below 2¹²⁴ in both engines.
    // Strata = quantity deciles of lineitem. The fixture's extendedprice
    // is statistically INDEPENDENT of quantity (measured: per-stratum σ
    // flat at ~30k dollars, Neyman ≡ proportional, ratio 999 — the
    // recurring fixture lesson, cf. q197/q262/q282), so the
    // heteroscedasticity is PLANTED constructively: y = price×(h+1)
    // scales stratum h's spread by h+1, the gradient a real survey
    // meets. The published ratio_permille = n·N²·V_neyman / n·N²·V_prop
    // = (ΣW)² / (N·Σ(A_h/N_h)) ≤ 1000 by Cauchy–Schwarz — the variance
    // saving as a checked column, not prose. Scale shape: one grouped
    // scan → 5-row stratum frame → 1-row totals broadcast.
    q("q309_neyman_allocation",
      "Neyman vs proportional stratified sampling allocation with exact-isqrt stratum weights")(
      """WITH l0 AS (SELECT CAST(floor(l_extendedprice) AS BIGINT) AS p,
        |                   (CAST(floor(l_quantity) AS BIGINT) - 1) // 10 AS stratum
        |            FROM lineitem),
        |li AS (SELECT stratum, p * (stratum + 1) AS yd FROM l0),
        |gs AS (SELECT stratum, CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(yd) AS BIGINT) AS s1,
        |              CAST(sum(CAST(yd AS HUGEINT) * yd) AS HUGEINT) AS s2
        |       FROM li GROUP BY stratum),
        |aa AS (SELECT stratum, n, CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS a
        |       FROM gs),
        |sq AS (SELECT stratum, n, a, CAST(floor(sqrt(CAST(a AS DOUBLE))) AS BIGINT) AS s0
        |       FROM aa),
        |ww AS (SELECT stratum, n, a,
        |              CASE WHEN CAST(s0 + 1 AS HUGEINT) * (s0 + 1) <= a THEN s0 + 1
        |                   WHEN CAST(s0 AS HUGEINT) * s0 > a THEN s0 - 1
        |                   ELSE s0 END AS w
        |       FROM sq),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(w) AS BIGINT) AS tw,
        |               CAST(sum(a // n) AS HUGEINT) AS sad FROM ww)
        |SELECT ww.stratum, ww.n AS n_rows, ww.w // ww.n AS sd_dollars,
        |       (1000 * ww.w) // tot.tw AS n_neyman,
        |       (1000 * ww.n) // tot.tn AS n_prop,
        |       CAST((1000 * CAST(tot.tw AS HUGEINT) * tot.tw)
        |            // (CAST(tot.tn AS HUGEINT) * tot.sad) AS BIGINT) AS ratio_permille
        |FROM ww CROSS JOIN tot ORDER BY ww.stratum""".stripMargin
    ) { (sp, dir) =>
      val li = Tables(sp, dir, "lineitem").select(
        expr("cast(floor(l_extendedprice) as bigint)").as("p"),
        expr("(cast(floor(l_quantity) as bigint) - 1) div 10").as("stratum"))
        .select(col("stratum"), expr("p * (stratum + 1)").as("yd"))
      val gs = li.groupBy("stratum").agg(count(lit(1)).as("n"),
        sum(col("yd")).as("s1"),
        sum(expr("cast(yd * yd as decimal(38,0))")).as("s2"))
      val ww = gs
        .withColumn("a", expr("cast(n as decimal(38,0)) * s2 - cast(s1 as decimal(38,0)) * s1"))
        .withColumn("s0", expr("cast(floor(sqrt(cast(a as double))) as bigint)"))
        .withColumn("w", expr(
          "case when cast(s0 + 1 as decimal(38,0)) * (s0 + 1) <= a then s0 + 1 " +
            "when cast(s0 as decimal(38,0)) * s0 > a then s0 - 1 else s0 end"))
      val tot = ww.agg(sum(col("n")).as("tn"), sum(col("w")).as("tw"),
        sum(expr("a div n")).as("sad"))
      ww.crossJoin(broadcast(tot))
        .select(col("stratum"), col("n").as("n_rows"),
          expr("w div n").as("sd_dollars"),
          expr("(1000 * w) div tw").as("n_neyman"),
          expr("(1000 * n) div tn").as("n_prop"),
          expr("cast((1000 * cast(tw as decimal(38,0)) * tw)" +
            " div (cast(tn as decimal(38,0)) * sad) as bigint)").as("ratio_permille"))
        .orderBy("stratum")
    },

    // Distribution-free CI for the median — the order-statistic result
    // every robust pipeline metric should ship with: P(X_(r_lo) ≤ median
    // ≤ X_(r_hi)) ≈ 95% with r_lo/r_hi = n/2 ∓ 0.98√n, NO distributional
    // assumption (binomial/normal rank approximation; √n via the exact
    // floor isqrt, so the ranks are engine-identical integers). The
    // order statistics themselves come from the deci-quantized value
    // HISTOGRAM (q257's bins): one grouped count, one value-bounded
    // cumulative window, one conditional-min pass — ranks are walked,
    // rows are never sorted. The CI complements q267 (conformal,
    // prediction) and q270 (bootstrap, mean): this one is for quantiles,
    // exact ranks, zero resampling. Spec pins lo ≤ med ≤ hi and the
    // 1/√n width shrink from sf0.01 to sf0.1.
    q("q317_median_ci",
      "95% order-statistic CI for each series median via exact integer ranks on the value histogram")(
      """WITH d AS (SELECT event_type AS et, CAST(floor(value * 10) AS BIGINT) AS x FROM events),
        |h AS (SELECT et, x, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY et, x),
        |cum AS (SELECT et, x, sum(c) OVER (PARTITION BY et ORDER BY x) AS cm FROM h),
        |st AS (SELECT et, CAST(count(*) AS BIGINT) AS n,
        |              CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS s
        |       FROM d GROUP BY et),
        |rk AS (SELECT et, n,
        |              greatest(1, (50 * n - 98 * s) // 100) AS r_lo,
        |              (n + 1) // 2 AS r_med,
        |              least(n, (50 * n + 98 * s + 99) // 100 + 1) AS r_hi
        |       FROM st)
        |SELECT rk.et AS event_type, rk.n, CAST(rk.r_lo AS BIGINT) AS rank_lo,
        |       CAST(rk.r_hi AS BIGINT) AS rank_hi,
        |       CAST(min(CASE WHEN cm >= r_lo THEN x END) AS BIGINT) AS lo_deci,
        |       CAST(min(CASE WHEN cm >= r_med THEN x END) AS BIGINT) AS med_deci,
        |       CAST(min(CASE WHEN cm >= r_hi THEN x END) AS BIGINT) AS hi_deci
        |FROM cum JOIN rk ON rk.et = cum.et
        |GROUP BY rk.et, rk.n, rk.r_lo, rk.r_med, rk.r_hi
        |ORDER BY rk.et""".stripMargin
    ) { (sp, dir) =>
      val d = Tables(sp, dir, "events")
        .select(col("event_type").as("et"), expr("cast(floor(value * 10) as bigint)").as("x"))
      val h = d.groupBy("et", "x").agg(count(lit(1)).as("c"))
      val cum = h.select(col("et"), col("x"),
        sum(col("c")).over(Window.partitionBy("et").orderBy("x")).as("cm"))
      val rk = d.groupBy("et").agg(count(lit(1)).as("n"))
        .withColumn("s", expr("cast(floor(sqrt(cast(n as double))) as bigint)"))
        .select(col("et"), col("n"),
          expr("greatest(1L, (50 * n - 98 * s) div 100)").as("r_lo"),
          expr("(n + 1) div 2").as("r_med"),
          expr("least(n, (50 * n + 98 * s + 99) div 100 + 1)").as("r_hi"))
      cum.join(rk, Seq("et"))
        .groupBy("et", "n", "r_lo", "r_med", "r_hi")
        .agg(min(when(col("cm") >= col("r_lo"), col("x"))).as("lo_deci"),
          min(when(col("cm") >= col("r_med"), col("x"))).as("med_deci"),
          min(when(col("cm") >= col("r_hi"), col("x"))).as("hi_deci"))
        .select(col("et").as("event_type"), col("n"), col("r_lo").as("rank_lo"),
          col("r_hi").as("rank_hi"), col("lo_deci"), col("med_deci"), col("hi_deci"))
        .orderBy("event_type")
    },

    // Golden-record survivorship — the MDM merge q237's latest-wins CDC
    // doesn't cover: CDC picks ONE newest op per key; survivorship picks
    // the newest value PER FIELD and pivots them into one golden row per
    // entity (a user's latest click value may be older than their latest
    // view value — each attribute survives independently). One window
    // partitioned by (user, field) ranks candidates with the full
    // (ts, event_id) tiebreak, one grouped pivot builds the record; at
    // 100 TB that is a single hash shuffle on the entity key and the
    // per-field history collapses map-side. Doubles round to the 4-dp
    // grid before the pivot (FIXTURES contract).
    q("q318_survivorship",
      "golden record per user: newest value per field (click/view/purchase) + audit counts")(
      """WITH r AS (SELECT user_id, event_type, round(value, 4) AS v, ts,
        |                  row_number() OVER (PARTITION BY user_id, event_type
        |                                     ORDER BY ts DESC, event_id DESC) AS rn
        |           FROM events),
        |g AS (SELECT user_id,
        |             max(CASE WHEN event_type = 'click' AND rn = 1 THEN v END) AS last_click,
        |             max(CASE WHEN event_type = 'view' AND rn = 1 THEN v END) AS last_view,
        |             max(CASE WHEN event_type = 'purchase' AND rn = 1 THEN v END) AS last_purchase,
        |             max(ts) AS last_seen,
        |             CAST(count(*) AS BIGINT) AS n_events,
        |             CAST(count(DISTINCT event_type) AS BIGINT) AS n_fields
        |      FROM r GROUP BY user_id)
        |SELECT user_id, last_click, last_view, last_purchase,
        |       last_seen::TIMESTAMP AS last_seen, n_events, n_fields
        |FROM g ORDER BY user_id""".stripMargin
    ) { (sp, dir) =>
      val r = Tables(sp, dir, "events")
        .select(col("user_id"), col("event_type"), round(col("value"), 4).as("v"),
          col("ts"), col("event_id"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id", "event_type")
            .orderBy(col("ts").desc, col("event_id").desc)))
      r.groupBy("user_id")
        .agg(max(when(col("event_type") === "click" && col("rn") === 1, col("v"))).as("last_click"),
          max(when(col("event_type") === "view" && col("rn") === 1, col("v"))).as("last_view"),
          max(when(col("event_type") === "purchase" && col("rn") === 1, col("v"))).as("last_purchase"),
          max(col("ts")).as("last_seen"),
          count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_fields"))
        .orderBy("user_id")
    },

    // Time-decay multi-touch attribution — the third attribution model
    // next to last-touch (q140) and Markov removal effect (q295): every
    // click/view in the 7 days before a purchase earns credit halved per
    // elapsed day, as EXACT integers (weight = 256 >> days — power-of-two
    // decay needs no float exponential), published both raw and
    // per-conversion-normalized (1000·w // journey total, so each
    // conversion distributes ≤1000 milli across its touches). Join shape:
    // purchases ⋈ touches on the USER key with a µs-interval predicate —
    // per-user journeys are short, so the pair fan-out is bounded by
    // touches-per-user × conversions-per-user, never |events|².
    q("q320_time_decay_attribution",
      "7-day half-per-day decay credit per channel, integer 256>>days weights")(
      """WITH p AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS pus, event_id AS pid
        |           FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS tus, event_type AS channel
        |      FROM events WHERE event_type IN ('click', 'view')),
        |j AS (SELECT t.channel, p.pid,
        |             (256 >> CAST((p.pus - t.tus) // 86400000000 AS INT)) AS w
        |      FROM p JOIN t ON t.user_id = p.user_id
        |                   AND t.tus < p.pus AND p.pus - t.tus < 604800000000),
        |tot AS (SELECT pid, CAST(sum(w) AS BIGINT) AS tw FROM j GROUP BY pid)
        |SELECT j.channel, CAST(count(*) AS BIGINT) AS n_touches,
        |       CAST(sum(j.w) AS BIGINT) AS credit_raw,
        |       CAST(sum((1000 * j.w) // tot.tw) AS BIGINT) AS credit_norm_milli
        |FROM j JOIN tot USING (pid) GROUP BY j.channel ORDER BY j.channel""".stripMargin
    ) { (sp, dir) =>
      val ev = Tables(sp, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), us(col("ts")).as("pus"), col("event_id").as("pid"))
      val t = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), us(col("ts")).as("tus"), col("event_type").as("channel"))
      val j = p.join(t, Seq("user_id"))
        .filter(col("tus") < col("pus") && col("pus") - col("tus") < 604800000000L)
        .select(col("channel"), col("pid"),
          expr("shiftright(256L, cast((pus - tus) div 86400000000 as int))").as("w"))
        .cache() // journey totals + the channel rollup
      val tot = j.groupBy("pid").agg(sum(col("w")).as("tw"))
      j.join(tot, Seq("pid"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_touches"), sum(col("w")).as("credit_raw"),
          sum(expr("(1000 * w) div tw")).as("credit_norm_milli"))
        .orderBy("channel")
    },

    // k-anonymity REPAIR — the audits (q248/q261/q272) measure risk;
    // this walks the generalization lattice and picks the minimal
    // coarsening that satisfies k=25: L0 (nation, segment, balance-bin)
    // → L1 drop the bin → L2 nation only → L3 global. Every level's
    // class sizes roll up ALGEBRAICALLY from the L0 frame (a child
    // class partitions its parent), so the whole lattice costs one scan
    // plus metadata rollups — never four scans. The chosen level is the
    // first whose MINIMUM class clears k; on this fixture the choice
    // moves DOWN the lattice as data grows (more rows ⇒ less
    // generalization needed — spec-pinned across the two scales), which
    // is the operational point of the repair.
    q("q321_anonymize_repair",
      "minimal generalization level achieving k=25 over the (nation, segment, balance) lattice")(
      """WITH l0 AS (SELECT c_nationkey AS nk, c_mktsegment AS seg,
        |                   CAST(floor((c_acctbal + 1000) / 500) AS BIGINT) AS bb,
        |                   CAST(count(*) AS BIGINT) AS sz
        |            FROM customer GROUP BY nk, seg, bb),
        |l1 AS (SELECT nk, seg, CAST(sum(sz) AS BIGINT) AS sz FROM l0 GROUP BY nk, seg),
        |l2 AS (SELECT nk, CAST(sum(sz) AS BIGINT) AS sz FROM l1 GROUP BY nk),
        |l3 AS (SELECT CAST(sum(sz) AS BIGINT) AS sz FROM l2),
        |lv AS (SELECT 0 AS level, CAST(min(sz) AS BIGINT) AS min_size,
        |              CAST(count(*) AS BIGINT) AS n_classes FROM l0
        |       UNION ALL SELECT 1, CAST(min(sz) AS BIGINT), CAST(count(*) AS BIGINT) FROM l1
        |       UNION ALL SELECT 2, CAST(min(sz) AS BIGINT), CAST(count(*) AS BIGINT) FROM l2
        |       UNION ALL SELECT 3, CAST(min(sz) AS BIGINT), CAST(count(*) AS BIGINT) FROM l3),
        |ch AS (SELECT min(level) AS cl FROM lv WHERE min_size >= 25)
        |SELECT CAST(lv.level AS BIGINT) AS level, lv.min_size, lv.n_classes,
        |       CAST(CASE WHEN lv.level = ch.cl THEN 1 ELSE 0 END AS BIGINT) AS chosen
        |FROM lv CROSS JOIN ch ORDER BY lv.level""".stripMargin
    ) { (sp, dir) =>
      val l0 = Tables(sp, dir, "customer")
        .groupBy(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
          expr("cast(floor((c_acctbal + 1000) / 500) as bigint)").as("bb"))
        .agg(count(lit(1)).as("sz"))
        .cache() // the three algebraic rollups below
      val l1 = l0.groupBy("nk", "seg").agg(sum(col("sz")).as("sz"))
      val l2 = l1.groupBy("nk").agg(sum(col("sz")).as("sz"))
      val l3 = l2.agg(sum(col("sz")).as("sz"))
      def lv(level: Int, df: org.apache.spark.sql.DataFrame) = df
        .agg(min(col("sz")).cast("long").as("min_size"),
          count(lit(1)).as("n_classes"))
        .select(lit(level.toLong).as("level"), col("min_size"), col("n_classes"))
      val levels = lv(0, l0).unionByName(lv(1, l1)).unionByName(lv(2, l2))
        .unionByName(lv(3, l3))
      val ch = levels.filter(col("min_size") >= 25).agg(min(col("level")).as("cl"))
      levels.crossJoin(broadcast(ch))
        .select(col("level"), col("min_size"), col("n_classes"),
          when(col("level") === col("cl"), 1L).otherwise(0L).as("chosen"))
        .orderBy("level")
    },

    // Benjamini–Hochberg FDR over EXACT binomial p-values — the
    // multiple-comparisons layer q255's single z² gate doesn't have:
    // when one readout runs m tests (24 segments here), per-test α=0.05
    // rejects ~m·α nulls; BH's step-up (reject ranks ≤ max{r : p_(r) ≤
    // r·α/m}) controls the EXPECTED false-discovery fraction instead.
    // Everything is engine-identical integers: each segment's test is a
    // fixed n=20 chronological sample (first-20 by (ts, event_id) — the
    // engine side runs it through the native TopKPerKey partial-heap
    // operator, so at 100 TB the sample is bounded at k rows per key on
    // BOTH sides of the shuffle, never a per-segment window sort), the
    // two-sided sign-test p-value is the exact binomial tail
    // 2·Σ_{i≤min(k,n−k)} C(20,i) in units of 2⁻²⁰ (C(n,i) via
    // factorial(20), exact in 64 bits in both engines), and the BH
    // condition p·m·20 ≤ r·2²⁰ is a pure integer comparison (α = 1/20).
    // Four segments carry a planted p=0.95 effect (hash-Bernoulli, so
    // ground truth is known); the null segments test value-above-global-
    // deci-median (the q317 histogram walk). StatsHarnessSpec pins
    // planted⊆rejected and zero null rejections at both scales.
    q("q324_bh_fdr",
      "BH step-up over exact binomial sign tests: 4 planted segments reject, nulls don't")(
      s"""WITH d AS (SELECT event_id, ts, CAST(floor(value * 10) AS BIGINT) AS x,
         |                  ${md5LongSql("'seg:' || CAST(event_id AS VARCHAR)")} % 24 AS seg
         |           FROM events),
         |h AS (SELECT x, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY x),
         |cum AS (SELECT x, sum(c) OVER (ORDER BY x) AS cm FROM h),
         |nu AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
         |med AS (SELECT CAST(min(x) AS BIGINT) AS t FROM cum CROSS JOIN nu WHERE 2 * cm >= n),
         |samp AS (SELECT seg, event_id, x,
         |                row_number() OVER (PARTITION BY seg ORDER BY ts, event_id) AS rn
         |         FROM d QUALIFY rn <= 20),
         |ind AS (SELECT seg,
         |               CASE WHEN seg < 4
         |                    THEN CASE WHEN ${md5LongSql("'bh:' || CAST(event_id AS VARCHAR)")} % 20 < 19
         |                              THEN 1 ELSE 0 END
         |                    ELSE CASE WHEN x > med.t THEN 1 ELSE 0 END END AS i
         |        FROM samp CROSS JOIN med),
         |tests AS (SELECT seg, CAST(sum(i) AS BIGINT) AS k,
         |                 least(CAST(sum(i) AS BIGINT), 20 - CAST(sum(i) AS BIGINT)) AS kmin
         |          FROM ind GROUP BY seg),
         |pv AS (SELECT seg, k,
         |              least(2 * CAST(list_sum(list_transform(generate_series(0, CAST(kmin AS INT)),
         |                    i -> CAST(factorial(20) // (factorial(CAST(i AS INT))
         |                              * factorial(CAST(20 - i AS INT))) AS BIGINT))) AS BIGINT),
         |                    1048576) AS p_num
         |       FROM tests),
         |rk AS (SELECT seg, k, CAST(p_num AS BIGINT) AS p_num,
         |              row_number() OVER (ORDER BY p_num, seg) AS r,
         |              CAST(count(*) OVER () AS BIGINT) AS m
         |       FROM pv),
         |ku AS (SELECT COALESCE(max(r), 0) AS kmax
         |       FROM rk WHERE p_num * m * 20 <= r * 1048576)
         |SELECT seg, k AS k_above, p_num, CAST(r AS BIGINT) AS p_rank,
         |       CAST(CASE WHEN r <= kmax THEN 1 ELSE 0 END AS BIGINT) AS rejected,
         |       CAST(CASE WHEN seg < 4 THEN 1 ELSE 0 END AS BIGINT) AS planted
         |FROM rk CROSS JOIN ku ORDER BY seg""".stripMargin
    ) { (sp, dir) =>
      val d = Tables(sp, dir, "events")
        .select(col("event_id"), col("ts"),
          expr("cast(floor(value * 10) as bigint)").as("x"),
          (md5Long(concat(lit("seg:"), col("event_id").cast("string"))) % 24).as("seg"))
      // global deci-median via the bounded-histogram triangular cum
      // (q255's shape: ≤|deci values|² pairs, never a global window)
      val h = d.groupBy("x").agg(count(lit(1)).as("c"))
      val hb = h.select(col("x").as("xb"), col("c").as("cb"))
      val cum = h.join(hb, col("xb") <= col("x"))
        .groupBy("x").agg(sum(col("cb")).as("cm"))
      val n = d.agg(count(lit(1)).as("n"))
      val med = cum.crossJoin(broadcast(n)).filter(col("cm") * 2 >= col("n"))
        .agg(min(col("x")).as("t"))
      // bounded chronological sample: native heap top-k per segment key
      val samp = graft.plans.TopKPerKey.topK(d,
        keys = Seq(col("seg")), order = Seq(col("ts"), col("event_id")), k = 20)
      val ind = samp.crossJoin(broadcast(med))
        .select(col("seg"),
          when(col("seg") < 4,
            when(md5Long(concat(lit("bh:"), col("event_id").cast("string"))) % 20 < 19, 1L)
              .otherwise(0L))
            .otherwise(when(col("x") > col("t"), 1L).otherwise(0L)).as("i"))
      val tests = ind.groupBy("seg").agg(sum(col("i")).as("k"))
        .withColumn("kmin", least(col("k"), lit(20L) - col("k")))
      val pv = tests.select(col("seg"), col("k"),
        least(expr("2 * aggregate(sequence(0L, kmin), 0L, (a, i) -> " +
          "a + factorial(20) div (factorial(cast(i as int)) * factorial(cast(20 - i as int))))"),
          lit(1048576L)).as("p_num"))
      // BH rank over the m=24 test rows: triangular count (m² pairs on a
      // segment-count-bounded frame) instead of a global row_number window
      val pvb = pv.select(col("seg").as("segb"), col("p_num").as("pb"))
      val rk = pv.join(pvb,
          col("pb") < col("p_num") || (col("pb") === col("p_num") && col("segb") <= col("seg")))
        .groupBy("seg", "k", "p_num").agg(count(lit(1)).as("r"))
      val m = pv.agg(count(lit(1)).as("m"))
      val rkm = rk.crossJoin(broadcast(m))
      val ku = rkm.filter(col("p_num") * col("m") * 20 <= col("r") * 1048576L)
        .agg(coalesce(max(col("r")), lit(0L)).as("kmax"))
      rkm.crossJoin(broadcast(ku))
        .select(col("seg"), col("k").as("k_above"), col("p_num"),
          col("r").as("p_rank"),
          when(col("r") <= col("kmax"), 1L).otherwise(0L).as("rejected"),
          when(col("seg") < 4, 1L).otherwise(0L).as("planted"))
        .orderBy("seg")
    },

    // One-level CART: the decision stump every gradient-boosting round
    // and every "which feature explains this label" triage starts with.
    // The label carries a PLANTED rule (y = (qty>30) XOR 15% hash noise
    // — ground truth stays known, the q312/q319 discipline) and the
    // stump must FIND it among three candidate features, two of them
    // null. Search is histogram-based, the 100 TB shape: one grouped
    // count per (feature, value, label) — never a per-row sort — then a
    // per-feature cumulative window over the ≤50-value histogram gives
    // every split's left/right class counts at once. Split score is the
    // weighted Gini numerator nL1·nL0/nL + nR1·nR0/nR compared on the
    // exact common-denominator integer grid ·10⁹ (DECIMAL/HUGEINT cross
    // products — no float ever orders candidates), argmin tiebroken by
    // (feature, value). Output: per-feature best split + the global
    // chosen row; acc_permille is the majority-vote stump's training
    // accuracy (≈850‰ on the planted rule = 1 − noise, vs ≈570‰ for the
    // null features). StatsHarnessSpec pins feature/threshold recovery
    // at both scales.
    q("q325_decision_stump",
      "histogram Gini stump recovers the planted (quantity>30) rule among null features")(
      s"""WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS qty,
         |                  CAST(floor(l_discount * 100) AS BIGINT) AS disc,
         |                  CAST(day(l_shipdate) AS BIGINT) AS dom,
         |                  CASE WHEN (l_quantity > 30) <>
         |                    (${md5LongSql("'ds:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)")} % 100 < 15)
         |                       THEN 1 ELSE 0 END AS y
         |           FROM lineitem),
         |t AS (SELECT 'quantity' AS f, qty AS v, y FROM b
         |      UNION ALL SELECT 'discount_centi', disc, y FROM b
         |      UNION ALL SELECT 'ship_dom', dom, y FROM b),
         |c AS (SELECT f, v, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS c1
         |      FROM t GROUP BY f, v),
         |tot AS (SELECT f, CAST(sum(c) AS BIGINT) AS n, CAST(sum(c1) AS BIGINT) AS n1
         |        FROM c GROUP BY f),
         |cu AS (SELECT f, v, CAST(sum(c) OVER (PARTITION BY f ORDER BY v) AS BIGINT) AS nl,
         |              CAST(sum(c1) OVER (PARTITION BY f ORDER BY v) AS BIGINT) AS nl1 FROM c),
         |cand AS (SELECT cu.f, cu.v, cu.nl, cu.nl1,
         |                CAST(tot.n - cu.nl AS BIGINT) AS nr,
         |                CAST(tot.n1 - cu.nl1 AS BIGINT) AS nr1, tot.n, tot.n1
         |         FROM cu JOIN tot USING (f) WHERE tot.n - cu.nl > 0),
         |sc AS (SELECT f, v, nl, nr, n, n1,
         |              CAST((CAST(nl1 AS HUGEINT) * (nl - nl1) * nr
         |                  + CAST(nr1 AS HUGEINT) * (nr - nr1) * nl) * 1000000000
         |                  // (CAST(nl AS HUGEINT) * nr) AS BIGINT) AS wg_nano,
         |              CAST(greatest(nl1, nl - nl1) + greatest(nr1, nr - nr1) AS BIGINT) AS n_correct
         |       FROM cand),
         |best AS (SELECT f, v, nl, nr, wg_nano, n_correct, n, n1,
         |                row_number() OVER (PARTITION BY f ORDER BY wg_nano, v) AS rf,
         |                row_number() OVER (ORDER BY wg_nano, f, v) AS rg
         |         FROM sc)
         |SELECT f AS feature, CAST(v AS BIGINT) AS threshold, nl AS n_left, nr AS n_right,
         |       wg_nano,
         |       CAST(CAST(n1 AS HUGEINT) * (n - n1) * 1000000000 // n AS BIGINT) AS root_nano,
         |       CAST(n_correct * 1000 // n AS BIGINT) AS acc_permille,
         |       CAST(CASE WHEN rg = 1 THEN 1 ELSE 0 END AS BIGINT) AS chosen
         |FROM best WHERE rf = 1 ORDER BY feature""".stripMargin
    ) { (sp, dir) =>
      val b = Tables(sp, dir, "lineitem")
        .select(col("l_quantity").cast("long").as("qty"),
          expr("cast(floor(l_discount * 100) as bigint)").as("disc"),
          expr("cast(day(l_shipdate) as bigint)").as("dom"),
          when((col("l_quantity") > 30) =!=
            (md5Long(concat(lit("ds:"), col("l_orderkey").cast("string"), lit(":"),
              col("l_linenumber").cast("string"))) % 100 < 15), 1L).otherwise(0L).as("y"))
      val t = b.select(lit("quantity").as("f"), col("qty").as("v"), col("y"))
        .unionByName(b.select(lit("discount_centi").as("f"), col("disc").as("v"), col("y")))
        .unionByName(b.select(lit("ship_dom").as("f"), col("dom").as("v"), col("y")))
      val c = t.groupBy("f", "v").agg(count(lit(1)).as("c"), sum(col("y")).as("c1"))
      val tot = c.groupBy("f").agg(sum(col("c")).as("n"), sum(col("c1")).as("n1"))
      val wf = Window.partitionBy("f").orderBy("v")
      val cu = c.select(col("f"), col("v"),
        sum(col("c")).over(wf).as("nl"), sum(col("c1")).over(wf).as("nl1"))
      val cand = cu.join(tot, Seq("f"))
        .withColumn("nr", col("n") - col("nl"))
        .withColumn("nr1", col("n1") - col("nl1"))
        .filter(col("nr") > 0)
      val sc2 = cand.select(col("f"), col("v"), col("nl"), col("nr"), col("n"), col("n1"),
        expr("cast((cast(nl1 as decimal(38,0)) * (nl - nl1) * nr" +
          " + cast(nr1 as decimal(38,0)) * (nr - nr1) * nl) * 1000000000" +
          " div (cast(nl as decimal(38,0)) * nr) as bigint)").as("wg_nano"),
        expr("greatest(nl1, nl - nl1) + greatest(nr1, nr - nr1)").as("n_correct"))
      // per-feature argmin stays a PARTITIONED window (≤50 candidate
      // values per feature); the global winner is a 1-row argmin frame
      // broadcast back — no unpartitioned window anywhere
      val best = sc2.select(col("*"),
        row_number().over(Window.partitionBy("f").orderBy("wg_nano", "v")).as("rf"))
        .filter(col("rf") === 1)
      val win = sc2.agg(min(struct(col("wg_nano"), col("f"), col("v"))).as("w"))
        .select(col("w.f").as("wf"), col("w.v").as("wv"))
      best.crossJoin(broadcast(win))
        .select(col("f").as("feature"), col("v").as("threshold"),
          col("nl").as("n_left"), col("nr").as("n_right"), col("wg_nano"),
          expr("cast(cast(n1 as decimal(38,0)) * (n - n1) * 1000000000 div n as bigint)")
            .as("root_nano"),
          expr("n_correct * 1000 div n").as("acc_permille"),
          when(col("f") === col("wf") && col("v") === col("wv"), 1L).otherwise(0L).as("chosen"))
        .orderBy("feature")
    },

    // Rank-1 ALS — distributed matrix factorization, THE canonical Spark
    // ML workload (MLlib's own recommender is ALS): customers × parts
    // with summed quantity as the implicit rating. Rank 1 makes each
    // half-step a CLOSED FORM — u_i = S·Σ_j r_ij·v_j / (Σ_j v_j²/S + λS)
    // — so the whole trainer is alternating grouped aggregates in 2²⁰
    // fixed-point (every product, floor-div, and λ=0.1·S term is the
    // same integer in both engines; sums ride DECIMAL(38)/HUGEINT so no
    // width divergence). Two full rounds, then the training SSE at
    // rounds 0 (predict 0) / 1 / 2 — monotone convergence (1000‰ → ~230‰
    // → strictly less) IS the oracle-checked demonstration, the q197
    // integer-GD discipline applied to factorization. At 100 TB: each
    // half-step is ONE shuffle keyed by the side being solved (the
    // classic ALS layout); factor frames are |users|/|items|-sized
    // equi-join sides, never broadcast-mandatory; nothing driver-side.
    q("q326_als_rank1",
      "rank-1 ALS in 2^20 fixed point: training SSE drops monotonically over 2 rounds")(
      """WITH r AS (SELECT o_custkey AS u, l_partkey AS it, CAST(sum(l_quantity) AS BIGINT) AS r
        |           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |           GROUP BY u, it),
        |u1 AS (SELECT u, CAST((1048576 * sum(r * 1048576))
        |                    // (sum(CAST(1048576 AS BIGINT) * 1048576) // 1048576 + 104858)
        |                  AS BIGINT) AS uf
        |       FROM r GROUP BY u),
        |v1 AS (SELECT it, CAST((1048576 * sum(u1.uf * r.r))
        |                     // (sum(u1.uf * u1.uf) // 1048576 + 104858) AS BIGINT) AS vf
        |       FROM r JOIN u1 USING (u) GROUP BY it),
        |u2 AS (SELECT u, CAST((1048576 * sum(r.r * v1.vf))
        |                    // (sum(v1.vf * v1.vf) // 1048576 + 104858) AS BIGINT) AS uf
        |       FROM r JOIN v1 USING (it) GROUP BY u),
        |v2 AS (SELECT it, CAST((1048576 * sum(u2.uf * r.r))
        |                     // (sum(u2.uf * u2.uf) // 1048576 + 104858) AS BIGINT) AS vf
        |       FROM r JOIN u2 USING (u) GROUP BY it),
        |s0 AS (SELECT CAST(sum(CAST(r * 1048576 AS HUGEINT) * (r * 1048576))
        |                 // (CAST(1048576 AS HUGEINT) * 1048576) AS BIGINT) AS sse FROM r),
        |s1 AS (SELECT CAST(sum(CAST(e AS HUGEINT) * e)
        |                 // (CAST(1048576 AS HUGEINT) * 1048576) AS BIGINT) AS sse
        |       FROM (SELECT r.r * 1048576 - (u1.uf * v1.vf) // 1048576 AS e
        |             FROM r JOIN u1 USING (u) JOIN v1 USING (it)) q),
        |s2 AS (SELECT CAST(sum(CAST(e AS HUGEINT) * e)
        |                 // (CAST(1048576 AS HUGEINT) * 1048576) AS BIGINT) AS sse
        |       FROM (SELECT r.r * 1048576 - (u2.uf * v2.vf) // 1048576 AS e
        |             FROM r JOIN u2 USING (u) JOIN v2 USING (it)) q)
        |SELECT CAST(rnd AS BIGINT) AS round, sse,
        |       CAST(sse * 1000 // (SELECT sse FROM s0) AS BIGINT) AS of_round0_permille
        |FROM (SELECT 0 AS rnd, sse FROM s0 UNION ALL SELECT 1, sse FROM s1
        |      UNION ALL SELECT 2, sse FROM s2) z
        |ORDER BY round""".stripMargin
    ) { (sp, dir) =>
      val r = Tables(sp, dir, "lineitem")
        .join(Tables(sp, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("u"), col("l_partkey").as("it"))
        .agg(sum(col("l_quantity")).cast("long").as("r"))
        .cache() // 4 half-steps + 3 SSE legs off one ratings shuffle
      // DECIMAL(38) sums mirror DuckDB's automatic HUGEINT widening
      val u1 = r.groupBy("u").agg(
        expr("cast((1048576 * sum(cast(r as decimal(38,0)) * 1048576))" +
          " div (sum(cast(1048576 as decimal(38,0)) * 1048576) div 1048576 + 104858)" +
          " as bigint)").as("uf"))
        .cache() // v1 step + s1 leg
      val v1 = r.join(u1, Seq("u")).groupBy("it").agg(
        expr("cast((1048576 * sum(cast(uf as decimal(38,0)) * r))" +
          " div (sum(cast(uf as decimal(38,0)) * uf) div 1048576 + 104858) as bigint)").as("vf"))
        .cache() // u2 step + s1 leg
      val u2 = r.join(v1, Seq("it")).groupBy("u").agg(
        expr("cast((1048576 * sum(cast(r as decimal(38,0)) * vf))" +
          " div (sum(cast(vf as decimal(38,0)) * vf) div 1048576 + 104858) as bigint)").as("uf"))
        .cache() // v2 step + s2 leg
      val v2 = r.join(u2, Seq("u")).groupBy("it").agg(
        expr("cast((1048576 * sum(cast(uf as decimal(38,0)) * r))" +
          " div (sum(cast(uf as decimal(38,0)) * uf) div 1048576 + 104858) as bigint)").as("vf"))
      def sse(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        df.agg(expr("cast(sum(cast(e as decimal(38,0)) * e)" +
          " div (cast(1048576 as decimal(38,0)) * 1048576) as bigint)").as("sse"))
      val s0 = sse(r.select(expr("r * 1048576").as("e")))
      val s1 = sse(r.join(u1, Seq("u")).join(v1, Seq("it"))
        .select(expr("r * 1048576 - (uf * vf) div 1048576").as("e")))
      val s2 = sse(r.join(u2, Seq("u")).join(v2, Seq("it"))
        .select(expr("r * 1048576 - (uf * vf) div 1048576").as("e")))
      val rounds = s0.select(lit(0L).as("round"), col("sse"))
        .unionByName(s1.select(lit(1L).as("round"), col("sse")))
        .unionByName(s2.select(lit(2L).as("round"), col("sse")))
      rounds.crossJoin(broadcast(s0.select(col("sse").as("sse0"))))
        .select(col("round"), col("sse"),
          expr("sse * 1000 div sse0").as("of_round0_permille"))
        .orderBy("round")
    },

    // q337: survival-estimator SUITE — Kaplan–Meier product-limit AND its
    // Nelson–Aalen cumulative-hazard companion off one risk table. The
    // survival family splits across designs: q256 estimates KM for
    // time-to-first-error under STAGGERED-CONSENT censoring (events table,
    // per-user consent horizons, 12h bins) and q258 compares groups by
    // log-rank; THIS entry covers the churn design — censoring induced by
    // the corpus boundary itself — and adds the hazard-scale estimator
    // (Σ d/n, exact micro) that none of them publish. Per market
    // segment, "customer lifetime" = first→last order date, bucketed to
    // years and capped at 8 buckets; a customer whose last order is >365
    // days before the corpus's max date is an EVENT (churn), otherwise
    // right-CENSORED at its observed duration (at risk through its bucket,
    // never an event — the distinction survival analysis exists for).
    // S(t_k) = Π_{j≤k} (n_j − d_j)/n_j carried in exact milli units by a
    // truncating integer recurrence: Spark folds each segment's sorted
    // 8-bucket array with the aggregate() higher-order function; the
    // oracle runs the SAME recurrence as a DuckDB recursive CTE, so the
    // product trajectory is bit-equal, not float-close. Scale shape: one
    // shuffle by custkey (per-customer min/max), one by (seg, bucket);
    // the risk-set suffix sum and the KM fold run on the |seg|×8
    // histogram — metadata, never row-scale. The 8-bucket cap is the
    // state bound: arbitrary horizons re-bucket, they don't grow state.
    q("q337_survival_estimators",
      "per-segment KM + Nelson-Aalen churn estimators, exact milli/micro, censoring-aware")(
      """WITH RECURSIVE
        |life AS (SELECT o_custkey AS ck, min(o_orderdate::DATE) AS fd,
        |                max(o_orderdate::DATE) AS ld
        |         FROM orders GROUP BY ck),
        |gm AS (SELECT max(o_orderdate::DATE) AS m FROM orders),
        |obs AS (SELECT c.c_mktsegment AS seg,
        |               LEAST(CAST(date_diff('day', l.fd, l.ld) AS BIGINT) // 365,
        |                     7) AS b,
        |               CASE WHEN date_diff('day', l.ld, (SELECT m FROM gm)) > 365
        |                    THEN 1 ELSE 0 END AS ev
        |        FROM life l JOIN customer c ON c.c_custkey = l.ck),
        |cnt AS (SELECT seg, b, CAST(sum(ev) AS BIGINT) AS d,
        |               CAST(sum(1 - ev) AS BIGINT) AS cens
        |        FROM obs GROUP BY seg, b),
        |spine AS (SELECT seg, b
        |          FROM (SELECT DISTINCT seg FROM obs) s,
        |               (SELECT unnest(generate_series(0, 7)) AS b) t),
        |base AS (SELECT sp.seg, CAST(sp.b AS BIGINT) AS b,
        |                COALESCE(c.d, 0) AS d, COALESCE(c.cens, 0) AS cens
        |         FROM spine sp LEFT JOIN cnt c ON c.seg = sp.seg AND c.b = sp.b),
        |risk AS (SELECT seg, b, d, cens,
        |                CAST(sum(d + cens) OVER (PARTITION BY seg ORDER BY b DESC)
        |                     AS BIGINT) AS n
        |         FROM base),
        |km(seg, b, s) AS (
        |  SELECT seg, CAST(-1 AS BIGINT), CAST(1000 AS BIGINT)
        |  FROM (SELECT DISTINCT seg FROM obs) z
        |  UNION ALL
        |  SELECT r.seg, km.b + 1,
        |         CASE WHEN r.n > 0 THEN km.s * (r.n - r.d) // r.n ELSE km.s END
        |  FROM km JOIN risk r ON r.seg = km.seg AND r.b = km.b + 1
        |  WHERE km.b < 7)
        |SELECT r.seg, r.b, r.n AS n_risk, r.d AS n_event, r.cens AS n_censored,
        |       k.s AS s_milli,
        |       CAST(sum(CASE WHEN r.n > 0 THEN r.d * 1000000 // r.n ELSE 0 END)
        |            OVER (PARTITION BY r.seg ORDER BY r.b) AS BIGINT) AS na_micro
        |FROM risk r JOIN km k ON k.seg = r.seg AND k.b = r.b
        |ORDER BY r.seg, r.b""".stripMargin
    ) { (sp, dir) =>
      val orders = Tables(sp, dir, "orders")
      val life = orders.groupBy(col("o_custkey").as("ck"))
        .agg(min(col("o_orderdate").cast("date")).as("fd"),
          max(col("o_orderdate").cast("date")).as("ld"))
      val gm = orders.agg(max(col("o_orderdate").cast("date")).as("m"))
      val obs = life
        .join(Tables(sp, dir, "customer"), col("c_custkey") === col("ck"))
        .crossJoin(broadcast(gm))
        .select(col("c_mktsegment").as("seg"),
          expr("least(cast(datediff(ld, fd) as bigint) div 365, 7)").as("b"),
          when(datediff(col("m"), col("ld")) > 365, 1L).otherwise(0L).as("ev"))
        .cache() // counts leg + segment spine leg
      val cnt = obs.groupBy("seg", "b")
        .agg(sum(col("ev")).as("d"), sum(lit(1L) - col("ev")).as("cens"))
      val spine = obs.select("seg").distinct()
        .select(col("seg"), explode(sequence(lit(0L), lit(7L))).as("b"))
      val base = spine.join(cnt, Seq("seg", "b"), "left")
        .select(col("seg"), col("b"),
          coalesce(col("d"), lit(0L)).as("d"),
          coalesce(col("cens"), lit(0L)).as("cens"))
      val risk = base.select(col("seg"), col("b"), col("d"), col("cens"),
        sum(col("d") + col("cens")).over(
          Window.partitionBy("seg").orderBy(col("b").desc)
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)).as("n"))
      // per-segment KM fold: 8 sorted buckets, truncating milli product —
      // `bs` is first-field-b structs so array_sort orders by bucket
      risk.groupBy("seg")
        .agg(collect_list(struct(col("b"), col("n"), col("d"), col("cens"))).as("bs"))
        .select(col("seg"), explode(expr(
          """aggregate(
            |  array_sort(bs),
            |  named_struct('s', cast(1000 as bigint),
            |    'out', cast(array() as
            |      array<struct<b: bigint, n: bigint, d: bigint,
            |                   cens: bigint, s: bigint>>)),
            |  (acc, x) -> named_struct(
            |    's', if(x.n > 0, acc.s * (x.n - x.d) div x.n, acc.s),
            |    'out', concat(acc.out, array(named_struct(
            |      'b', x.b, 'n', x.n, 'd', x.d, 'cens', x.cens,
            |      's', if(x.n > 0, acc.s * (x.n - x.d) div x.n, acc.s))))),
            |  acc -> acc.out)""".stripMargin)).as("r"))
        .select(col("seg"), col("r.b").as("b"), col("r.n").as("n_risk"),
          col("r.d").as("n_event"), col("r.cens").as("n_censored"),
          col("r.s").as("s_milli"))
        // Nelson–Aalen cumulative hazard (the KM companion q256 lacks):
        // Σ d_j·10⁶ // n_j over buckets so far — a partitioned window over
        // the same |seg|×8 histogram, still metadata-scale
        .withColumn("na_micro",
          sum(when(col("n_risk") > 0,
            expr("n_event * 1000000 div n_risk")).otherwise(0L))
            .over(Window.partitionBy("seg").orderBy("b")).cast("long"))
        .orderBy("seg", "b")
    },

    // q338: lag-k autocorrelation (ACF, lags 1–7) of the daily revenue
    // series, exact to the milli. A weekly cycle is PLANTED (dow-0 days
    // carry a 2x multiplier — the q324/q325 planted-signal
    // discipline) so the estimator has a truth to find: r₇ must spike
    // above r₁..r₆ (spec-pinned), which a flat random series would
    // never show. Mean-centering never leaves integers: z_t = N·y_t − S
    // (the N-scaled residual), r_k = Σ z_t·z_{t−k} / Σ z², carried as
    // DECIMAL(38)/HUGEINT products with a sign-safe truncating milli
    // division (num may be negative; both engines truncate the ABS then
    // re-sign, so floor-vs-trunc divergence can't bite). Lag pairing is
    // an equi-join on calendar day index (di = di − k), so calendar
    // gaps skip pairs instead of misaligning them — no global-order
    // window anywhere. Scale: one date shuffle reduces the fact table
    // to a ~2400-row daily series; the 7-lag expansion and joins are
    // metadata ops.
    q("q338_autocorrelation",
      "exact milli ACF lags 1-7 of daily revenue; planted weekly cycle spikes r7")(
      """WITH d0 AS (SELECT min(o_orderdate::DATE) AS d0 FROM orders),
        |daily AS (SELECT date_diff('day', (SELECT d0 FROM d0), o_orderdate::DATE) AS di,
        |                 sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y0
        |          FROM orders GROUP BY di),
        |pl AS (SELECT di, CAST(y0 * (10 + CASE WHEN di % 7 = 0 THEN 10 ELSE 0 END)
        |                       AS BIGINT) AS y
        |       FROM daily),
        |st AS (SELECT count(*) AS nn, CAST(sum(y) AS BIGINT) AS s1 FROM pl),
        |z AS (SELECT di, (SELECT nn FROM st) * y - (SELECT s1 FROM st) AS z FROM pl),
        |den AS (SELECT sum(CAST(z AS HUGEINT) * z) AS den FROM z),
        |acf AS (SELECT k.lag AS lag, count(*) AS n_pairs,
        |               sum(CAST(a.z AS HUGEINT) * b.z) AS num
        |        FROM (SELECT unnest(generate_series(1, 7)) AS lag) k
        |        JOIN z a ON TRUE
        |        JOIN z b ON b.di = a.di - k.lag
        |        GROUP BY k.lag)
        |SELECT CAST(lag AS BIGINT) AS lag, CAST(n_pairs AS BIGINT) AS n_pairs,
        |       CAST(CASE WHEN num < 0
        |                 THEN -((-num) * 1000 // (SELECT den FROM den))
        |                 ELSE num * 1000 // (SELECT den FROM den) END
        |            AS BIGINT) AS r_milli
        |FROM acf ORDER BY lag""".stripMargin
    ) { (sp, dir) =>
      val o = Tables(sp, dir, "orders")
      val mn = o.agg(min(col("o_orderdate").cast("date")).as("d0"))
      val daily = o.crossJoin(broadcast(mn))
        .select(
          datediff(col("o_orderdate").cast("date"), col("d0")).cast("long").as("di"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("c"))
        .groupBy("di").agg(sum(col("c")).as("y0"))
        .select(col("di"),
          (col("y0") * (lit(10L) +
            when(col("di") % 7 === 0, 10L).otherwise(0L))).as("y"))
      val st = daily.agg(count(lit(1)).as("nn"), sum(col("y")).as("s1"))
      val z = daily.crossJoin(broadcast(st))
        .select(col("di"), (col("nn") * col("y") - col("s1")).as("z"))
        .cache() // denominator + 7-lag join legs off one ~2400-row frame
      val den = z.agg(expr("sum(cast(z as decimal(38,0)) * z)").as("den"))
      val lhs = z.select(col("di"), col("z"),
          explode(sequence(lit(1L), lit(7L))).as("lag"))
        .select(col("lag"), (col("di") - col("lag")).as("dj"), col("z"))
      val rhs = z.select(col("di").as("dj"), col("z").as("zp"))
      lhs.join(rhs, Seq("dj"))
        .groupBy("lag")
        .agg(count(lit(1)).as("n_pairs"),
          expr("sum(cast(z as decimal(38,0)) * zp)").as("num"))
        .crossJoin(broadcast(den))
        .select(col("lag"), col("n_pairs"),
          expr("cast(case when num < 0 then -cast(((-num) * 1000) div den as bigint)" +
            " else cast((num * 1000) div den as bigint) end as bigint)").as("r_milli"))
        .orderBy("lag")
    },

    // q339: additive seasonal decomposition (STL-lite) of the daily
    // order-count series — trend is a CENTERED 7-day moving average,
    // the seasonal component is the per-day-of-week mean of the
    // detrended residual. Everything stays integer: the trend rides
    // 7-scaled (T7 = window sum, detrended = 7·y − T7) so the /7 never
    // happens, and the final per-dow mean divides once, sign-safely, in
    // milli units. The MA is built WITHOUT a global-order window (the
    // guard forbids single-task windows): the zero-filled day spine
    // expands to its −3..+3 offsets (7× a ~2400-row metadata frame) and
    // one equi-join + group-by sums each centered window — the 1-D twin
    // of q336's 3×3 cell expansion. A +5 bump is planted on dow 3; the
    // decomposition must hand it back (spec: dow-3 seasonal positive,
    // largest; others near zero). Scale: one date shuffle reduces the
    // fact to the daily series; spine, MA join, and dow means are
    // metadata ops.
    q("q339_seasonal_decomposition",
      "centered-7d-MA additive decomposition recovers a planted dow-3 bump, exact milli")(
      """WITH d0 AS (SELECT min(o_orderdate::DATE) AS d0,
        |                   max(o_orderdate::DATE) AS d1 FROM orders),
        |cnt AS (SELECT date_diff('day', (SELECT d0 FROM d0), o_orderdate::DATE) AS di,
        |               count(*) AS n
        |        FROM orders GROUP BY di),
        |spine AS (SELECT unnest(generate_series(0,
        |                   date_diff('day', (SELECT d0 FROM d0), (SELECT d1 FROM d0))))
        |                 AS di),
        |y AS (SELECT s.di,
        |             CAST(COALESCE(c.n, 0) + CASE WHEN s.di % 7 = 3 THEN 5 ELSE 0 END
        |                  AS BIGINT) AS y
        |      FROM spine s LEFT JOIN cnt c ON c.di = s.di),
        |ma AS (SELECT t.di, sum(y.y) AS t7
        |       FROM (SELECT di FROM y) t
        |       JOIN (SELECT unnest(generate_series(-3, 3)) AS off) o ON TRUE
        |       JOIN y ON y.di = t.di + o.off
        |       GROUP BY t.di HAVING count(*) = 7),
        |detr AS (SELECT y.di % 7 AS dow, 7 * y.y - ma.t7 AS d7
        |         FROM y JOIN ma ON ma.di = y.di),
        |agg AS (SELECT dow, count(*) AS n_days, sum(CAST(d7 AS HUGEINT)) AS num
        |        FROM detr GROUP BY dow)
        |SELECT CAST(dow AS BIGINT) AS dow, CAST(n_days AS BIGINT) AS n_days,
        |       CAST(CASE WHEN num < 0
        |                 THEN -((-num) * 1000 // (n_days * 7))
        |                 ELSE num * 1000 // (n_days * 7) END AS BIGINT) AS s_milli
        |FROM agg ORDER BY dow""".stripMargin
    ) { (sp, dir) =>
      val o = Tables(sp, dir, "orders")
      val bounds = o.agg(min(col("o_orderdate").cast("date")).as("d0"),
        max(col("o_orderdate").cast("date")).as("d1"))
      val cnt = o.crossJoin(broadcast(bounds))
        .select(datediff(col("o_orderdate").cast("date"), col("d0"))
          .cast("long").as("di"))
        .groupBy("di").agg(count(lit(1)).as("n"))
      val spine = bounds
        .select(explode(sequence(lit(0L),
          datediff(col("d1"), col("d0")).cast("long"))).as("di"))
      val y = spine.join(cnt, Seq("di"), "left")
        .select(col("di"),
          (coalesce(col("n"), lit(0L)) +
            when(col("di") % 7 === 3, 5L).otherwise(0L)).as("y"))
        .cache() // spine-offset MA join (both sides) + detrended join
      val ma = y.select(col("di"), explode(sequence(lit(-3L), lit(3L))).as("off"))
        .select((col("di") + col("off")).as("dj"), col("di"))
        .join(y.select(col("di").as("dj"), col("y")), Seq("dj"))
        .groupBy("di").agg(sum(col("y")).as("t7"), count(lit(1)).as("w"))
        .filter(col("w") === 7) // interior days only: full centered window
      y.join(ma, Seq("di"))
        .select((col("di") % 7).as("dow"), (lit(7L) * col("y") - col("t7")).as("d7"))
        .groupBy("dow")
        .agg(count(lit(1)).as("n_days"),
          expr("sum(cast(d7 as decimal(38,0)))").as("num"))
        .select(col("dow"), col("n_days"),
          expr("cast(case when num < 0 then -cast(((-num) * 1000) div (n_days * 7) as bigint)" +
            " else cast((num * 1000) div (n_days * 7) as bigint) end as bigint)")
            .as("s_milli"))
        .orderBy("dow")
    },

    // q344: gradient-boosted regression stumps, 3 sequential rounds — the
    // STAGE-WISE ensemble q325's single stump begins and q197's monolithic
    // GD never shows: each round fits a least-squares stump to the CURRENT
    // residuals, subtracts its piecewise prediction, and hands the shrunken
    // residuals to the next round. The label plants an ADDITIVE two-term
    // structure (q312/q319/q325 discipline): y = 20000 + 8000·[disc>5] +
    // 5000·[dom>15] + hash noise, with a third null feature in the
    // candidate set — so round 1 must recover disc@5, round 2 must recover
    // dom@15 FROM RESIDUALS (it is invisible to round 1 only as an
    // attenuated signal), and round 3 finds only noise; training SSE is
    // monotone non-increasing by construction of least-squares fits.
    // Everything is exact integer milli: split scoring compares
    // S_L²·n_R + S_R²·n_L on the common-denominator DECIMAL(38) grid
    // (q325's trick — no float ever orders candidates), leaf means are
    // truncating div (identical in Spark div / DuckDB //), and each round's
    // chosen stump flows to the next round as a BROADCAST 1-row frame
    // (CASE on the feature name picks the split column) — no driver-side
    // collect, no per-round re-read of anything but the cached base.
    // 100 TB shape per round: one unpivot scan + one (f, v) groupBy onto a
    // ≤67-value histogram; the cumulative window and argmax run on that
    // histogram — the whole fit after the scan is metadata-scale, which is
    // exactly how histogram-based GBDT (LightGBM-style) scales out.
    q("q344_gradient_boosting",
      "3-round boosted stumps recover the planted additive structure from residuals")(
      GradientBoost.oracleSql
    ) { (sp, dir) => GradientBoost(sp, dir) },

    // q348: Mahalanobis outliers — the CORRELATION-AWARE member of the
    // outlier family (q97 z-score, q145/q205 MAD, q89 winsorize are all
    // marginal; q189 DBSCAN is density-based). On lineitem's naturally
    // coupled (quantity, extended-price-in-dollars) pair, a row is scored
    // by its squared Mahalanobis distance — distance from the point cloud
    // MEASURED ALONG THE COVARIANCE: a mid-priced line on a huge quantity
    // sits far from the regression line while BOTH its marginal z-scores
    // stay unremarkable, and only this score sees it (spec-pinned: top
    // outliers exist whose marginal |z| < 3). Exactness: residuals are
    // taken against truncating integer means; the 2×2 covariance moments
    // a=ΣX²/n, b=ΣXY/n, c=ΣY²/n are truncating integer COVARIANCES
    // (pre-dividing by n keeps every per-row product in BIGINT); d² =
    // (c·X² − 2b·XY + a·Y²)/(ac − b²) is carried as d2_milli by one
    // integer division, and the χ²₂(0.95)=5.99 cut is the cross-product
    // 100·n·num > 599·den — no float ever orders or thresholds a row
    // (the 0.99 cut of 9.21 never fires on this fixture — max d² ≈ 6.0 —
    // so the 0.95 cut is what keeps the outlier arm genuinely exercised).
    // Shape: one pass for moments (1-row broadcast), one map-side scoring
    // pass, TakeOrdered top-20 + a carried outlier count. At 100 TB both
    // passes are full scans with O(1) state — the cheapest possible
    // two-pass robust detector.
    q("q348_mahalanobis",
      "exact-integer 2-D Mahalanobis outliers (chi2 0.95 cut) over (qty, price)")(
      """WITH b AS (
        |  SELECT l_orderkey AS ok, l_linenumber AS ln,
        |         CAST(l_quantity AS BIGINT) AS x,
        |         CAST(floor(l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(x) // count(*) AS BIGINT) AS xm,
        |             CAST(sum(y) // count(*) AS BIGINT) AS ym
        |      FROM b),
        |c AS (SELECT
        |        CAST(sum((x - xm) * (x - xm)) // max(n) AS BIGINT) AS a,
        |        CAST(sum((x - xm) * (y - ym)) // max(n) AS BIGINT) AS bb,
        |        CAST(sum(CAST(y - ym AS HUGEINT) * (y - ym)) // max(n) AS BIGINT) AS cc,
        |        max(xm) AS xm, max(ym) AS ym
        |      FROM b CROSS JOIN m),
        |fl AS (SELECT ok, ln, x, y,
        |              CAST((cc * ((x-xm)*(x-xm)) - 2 * bb * ((x-xm)*(y-ym))
        |                    + a * ((y-ym)*(y-ym))) * 1000
        |                   // (a * cc - bb * bb) AS BIGINT) AS d2_milli,
        |              CASE WHEN 100 * (cc * ((x-xm)*(x-xm)) - 2 * bb * ((x-xm)*(y-ym))
        |                              + a * ((y-ym)*(y-ym)))
        |                        > 599 * (a * cc - bb * bb)
        |                   THEN 1 ELSE 0 END AS is_outlier
        |       FROM b CROSS JOIN c),
        |tot AS (SELECT CAST(sum(is_outlier) AS BIGINT) AS n_outliers,
        |               CAST(count(*) AS BIGINT) AS n_rows FROM fl)
        |SELECT ok, ln, x, y, d2_milli, n_outliers, n_rows
        |FROM fl CROSS JOIN tot
        |ORDER BY d2_milli DESC, ok, ln LIMIT 20""".stripMargin
    ) { (sp, dir) =>
      // fanout: the fixture is ONE unsplittable row group — without the
      // repartition every scoring pass runs in a single task (measured
      // 7.6 s; ~3 s fanned out)
      val b = Tables.fanout(sp, dir, "lineitem").select(
        col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
        col("l_quantity").cast("long").as("x"),
        expr("cast(floor(l_extendedprice) as bigint)").as("y"))
        .cache() // moments pass + scoring pass
      val m = b.agg(count(lit(1)).cast("long").as("n"),
        expr("cast(sum(x) div count(*) as bigint)").as("xm"),
        expr("cast(sum(y) div count(*) as bigint)").as("ym"))
      // COVARIANCE moments (scatter div n, truncating) keep every later
      // product inside BIGINT: a <= ~900, |bb| <= ~2e6, cc <= ~5e9; the
      // per-row quadratic form <= ~4e12 and x1000 <= 4e15 — no DECIMAL in
      // the row-scale scoring pass (the decimal formulation measured
      // 7.9 s at sf0.1; this one ~2 s). Only cc'"'"'s SUM needs one wide
      // accumulator (decimal; scalar frame, never per row).
      val c = b.crossJoin(broadcast(m)).agg(
        expr("cast(sum((x - xm) * (x - xm)) div max(n) as bigint)").as("a"),
        expr("cast(sum((x - xm) * (y - ym)) div max(n) as bigint)").as("bb"),
        expr("cast(sum(cast(y - ym as decimal(38,0)) * (y - ym)) div max(n) as bigint)").as("cc"),
        max(col("xm")).as("xm"), max(col("ym")).as("ym"))
      val qf = "cc * ((x-xm)*(x-xm)) - 2 * bb * ((x-xm)*(y-ym)) + a * ((y-ym)*(y-ym))"
      val fl = b.crossJoin(broadcast(c))
        .withColumn("d2_milli",
          expr(s"cast(($qf) * 1000 div (a * cc - bb * bb) as bigint)"))
        .withColumn("is_outlier",
          when(expr(s"100 * ($qf)") > expr("599 * (a * cc - bb * bb)"), 1L)
            .otherwise(0L))
        .select("ok", "ln", "x", "y", "d2_milli", "is_outlier")
        .cache() // top-20 leg + count leg (narrow columns only)
      val tot = fl.agg(sum(col("is_outlier")).cast("long").as("n_outliers"),
        count(lit(1)).cast("long").as("n_rows"))
      fl.crossJoin(broadcast(tot))
        .select(col("ok"), col("ln"), col("x"), col("y"), col("d2_milli"),
          col("n_outliers"), col("n_rows"))
        .orderBy(col("d2_milli").desc, col("ok"), col("ln"))
        .limit(20)
    }
  )
}

/** q344's shared machinery: the per-round SQL template and the per-round
  * Spark fold, kept textually parallel (the logregStepSql pattern) so the
  * integer split-scoring formulas cannot drift between engines. */
private[operators] object GradientBoost {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import graft.functions.PortableHash.{md5Long, md5LongSql}

  private val noiseSql =
    md5LongSql("'gb:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)")

  /** One boosting round's CTE chain: unpivot → (f,v) histogram with
    * residual sums → per-feature cumulative split table → DECIMAL-grid
    * argmax (LIMIT 1) → residual update → SSE. */
  private def roundSql(m: Int): String = {
    val r = s"r$m"; val n = m + 1
    s"""t$m AS (SELECT 'disc' AS f, disc AS v, r FROM $r
       |        UNION ALL SELECT 'dom', dom, r FROM $r
       |        UNION ALL SELECT 'nullf', nullf, r FROM $r),
       |c$m AS (SELECT f, v, CAST(count(*) AS BIGINT) AS c, CAST(sum(r) AS BIGINT) AS s
       |        FROM t$m GROUP BY f, v),
       |tot$m AS (SELECT f, CAST(sum(c) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS st
       |          FROM c$m GROUP BY f),
       |cu$m AS (SELECT f, v,
       |                CAST(sum(c) OVER (PARTITION BY f ORDER BY v) AS BIGINT) AS nl,
       |                CAST(sum(s) OVER (PARTITION BY f ORDER BY v) AS BIGINT) AS sl
       |         FROM c$m),
       |w$m AS (SELECT f, v, nl, n - nl AS nr,
       |               CAST(sl // nl AS BIGINT) AS mul,
       |               CAST((st - sl) // (n - nl) AS BIGINT) AS mur,
       |               CAST((CAST(sl AS HUGEINT) * sl * (n - nl)
       |                   + CAST(st - sl AS HUGEINT) * (st - sl) * nl) * 1000
       |                   // (CAST(nl AS HUGEINT) * (n - nl)) AS BIGINT) AS gain_key
       |        FROM cu$m JOIN tot$m USING (f) WHERE n - nl > 0
       |        ORDER BY gain_key DESC, f, v LIMIT 1),
       |r$n AS (SELECT disc, dom, nullf,
       |               r - (CASE WHEN (CASE w$m.f WHEN 'disc' THEN disc
       |                                WHEN 'dom' THEN dom ELSE nullf END) <= w$m.v
       |                         THEN w$m.mul ELSE w$m.mur END) AS r
       |        FROM $r CROSS JOIN w$m),
       |s$m AS (SELECT CAST(sum(r * r) // count(*) AS BIGINT) AS sse_pr FROM r$n)""".stripMargin
  }

  val oracleSql: String = {
    val rounds = (1 to 3).map(roundSql).mkString(",\n")
    val rows = (1 to 3).map { m =>
      s"""SELECT CAST($m AS BIGINT) AS round, f AS feature, v AS threshold,
         |       nl AS n_left, nr AS n_right, mul AS mu_left_milli,
         |       mur AS mu_right_milli, gain_key,
         |       (SELECT sse_pr FROM s$m) AS sse_pr
         |FROM w$m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH b AS (
       |  SELECT CAST(floor(l_discount * 100) AS BIGINT) AS disc,
       |         CAST(day(l_shipdate::TIMESTAMP) AS BIGINT) AS dom,
       |         l_suppkey % 25 AS nullf,
       |         20000 + CASE WHEN floor(l_discount * 100) > 5 THEN 8000 ELSE 0 END
       |               + CASE WHEN day(l_shipdate::TIMESTAMP) > 15 THEN 5000 ELSE 0 END
       |               + ($noiseSql % 2001 - 1000) AS y
       |  FROM lineitem),
       |m0 AS (SELECT CAST(sum(y) // count(*) AS BIGINT) AS f0 FROM b),
       |r1 AS (SELECT disc, dom, nullf, y - f0 AS r FROM b CROSS JOIN m0),
       |$rounds
       |$rows
       |ORDER BY round""".stripMargin
  }

  /** Fit one least-squares stump to the residual frame: returns the 1-row
    * argmax (f, v, nl, nr, mul, mur, gain_key). */
  private def fitStump(r: DataFrame): DataFrame = {
    val t = r.select(lit("disc").as("f"), col("disc").as("v"), col("r"))
      .unionByName(r.select(lit("dom").as("f"), col("dom").as("v"), col("r")))
      .unionByName(r.select(lit("nullf").as("f"), col("nullf").as("v"), col("r")))
    val c = t.groupBy("f", "v")
      .agg(count(lit(1)).cast("long").as("c"), sum(col("r")).cast("long").as("s"))
    val tot = c.groupBy("f")
      .agg(sum(col("c")).cast("long").as("n"), sum(col("s")).cast("long").as("st"))
    val wf = Window.partitionBy("f").orderBy("v")
    val cu = c.select(col("f"), col("v"),
      sum(col("c")).over(wf).cast("long").as("nl"),
      sum(col("s")).over(wf).cast("long").as("sl"))
    cu.join(tot, Seq("f")).filter(col("n") - col("nl") > 0)
      .select(col("f"), col("v"), col("nl"), (col("n") - col("nl")).as("nr"),
        expr("cast(sl div nl as bigint)").as("mul"),
        expr("cast((st - sl) div (n - nl) as bigint)").as("mur"),
        expr("cast((cast(sl as decimal(38,0)) * sl * (n - nl)" +
          " + cast(st - sl as decimal(38,0)) * (st - sl) * nl) * 1000" +
          " div (cast(nl as decimal(38,0)) * (n - nl)) as bigint)").as("gain_key"))
      .orderBy(col("gain_key").desc, col("f"), col("v")).limit(1)
  }

  def apply(sp: SparkSession, dir: String): DataFrame = {
    val noise = md5Long(concat(lit("gb:"), col("l_orderkey").cast("string"),
      lit(":"), col("l_linenumber").cast("string"))) % 2001 - 1000
    val b = Tables(sp, dir, "lineitem").select(
      expr("cast(floor(l_discount * 100) as bigint)").as("disc"),
      expr("cast(day(l_shipdate) as bigint)").as("dom"),
      expr("l_suppkey % 25").as("nullf"),
      (lit(20000L)
        + when(expr("floor(l_discount * 100)") > 5, 8000L).otherwise(0L)
        + when(expr("day(l_shipdate)") > 15, 5000L).otherwise(0L)
        + noise).as("y"))
      .cache() // every round's unpivot + SSE re-reads the base
    val m0 = b.agg(expr("cast(sum(y) div count(*) as bigint)").as("f0"))
    var r = b.crossJoin(broadcast(m0))
      .select(col("disc"), col("dom"), col("nullf"), (col("y") - col("f0")).as("r"))
      .localCheckpoint(true) // 3 unpivot legs + round-2 update re-read it
    val rows = (1 to 3).map { m =>
      // TRUNCATE LINEAGE each round (NOTES: cache is not enough — the
      // chained crossJoin(argmax-subtree) plans compound per round and
      // re-optimizing/codegen'ing them dominates wall clock: measured
      // 120+ s at ANY fixture scale before checkpointing, seconds after).
      // The 1-row argmax and the residual frame both become plan leaves.
      val w = fitStump(r).localCheckpoint(true)
      r = r.crossJoin(broadcast(w))
        .select(col("disc"), col("dom"), col("nullf"),
          (col("r") - when(
            expr("case f when 'disc' then disc when 'dom' then dom else nullf end")
              <= col("v"), col("mul")).otherwise(col("mur"))).as("r"))
        .localCheckpoint(true)
      val sse = r.agg(expr("cast(sum(r * r) div count(*) as bigint)").as("sse_pr"))
      w.select(lit(m.toLong).as("round"), col("f").as("feature"),
        col("v").as("threshold"), col("nl").as("n_left"), col("nr").as("n_right"),
        col("mul").as("mu_left_milli"), col("mur").as("mu_right_milli"),
        col("gain_key"))
        .crossJoin(broadcast(sse))
    }
    rows.reduce(_ unionAll _).orderBy("round")
  }
}
