package graft.operators

import graft.Registry.{Q, q}
import graft.Tables
import org.apache.spark.sql.functions._

/** Event-time window operators (SURVEY.md §2B B26–B28) evaluated in batch
  * mode — the same `window()`/`session_window()` grouping expressions run
  * unchanged under Structured Streaming (streaming variants + watermark
  * tests live in graft.streaming). DuckDB oracles emulate the bucketing
  * with explicitly epoch-aligned arithmetic (`make_timestamp`), matching
  * Spark's epoch-aligned window start semantics.
  */
object TimeWindowQueries {

  val all: Seq[Q] = Seq(

    // B26: tumbling 1-hour event-time window.
    q("q26_window_tumble", "B26 tumbling 1h window: count + sum(value)")(
      """SELECT make_timestamp((CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 3600) * 3600 * 1000000) AS ws,
        |       count(*) AS n, round(sum(value), 4) AS sv
        |FROM events GROUP BY ws ORDER BY ws""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
        .select(col("window.start").as("ws"), col("n"), col("sv"))
        .orderBy("ws")
    },

    // B27: sliding 10-minute window, 5-minute slide (each event in 2 windows).
    q("q27_window_sliding", "B27 sliding 10m/5m window counts")(
      """SELECT make_timestamp(((CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 300) - i) * 300 * 1000000) AS ws,
        |       count(*) AS n, round(sum(value), 4) AS sv
        |FROM events CROSS JOIN (VALUES (0), (1)) AS sl(i)
        |GROUP BY ws ORDER BY ws""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
        .select(col("window.start").as("ws"), col("n"), col("sv"))
        .orderBy("ws")
    },

    // B28: session window, 30-minute gap, keyed by user. Oracle emulates with
    // the standard gap-break + running-sum island construction; session end is
    // last event + gap (Spark semantics).
    q("q28_window_session", "B28 30-minute-gap session windows per user")(
      """WITH e AS (SELECT user_id, ts::TIMESTAMP AS t FROM events),
        |m AS (SELECT user_id, t,
        |             CASE WHEN lag(t) OVER w IS NULL
        |                    OR t - lag(t) OVER w > INTERVAL 30 MINUTE
        |                  THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        |g AS (SELECT user_id, t,
        |             sum(brk) OVER (PARTITION BY user_id ORDER BY t
        |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM m)
        |SELECT user_id, min(t) AS s, max(t) + INTERVAL 30 MINUTE AS e, count(*) AS n
        |FROM g GROUP BY user_id, sid ORDER BY user_id, s""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("session_window.start").as("s"),
          col("session_window.end").as("e"), col("n"))
        .orderBy("user_id", "s")
    },

    // OHLC bars — the tick-to-candle aggregation the reference's FX domain
    // implies (oanda_client.rs streams per-instrument price ticks): per
    // (series, 1h window) the first/last/max/min of value, with open/close
    // pinned by (ts, event_id) order so duplicate timestamps can't flip
    // them. One grouped aggregation after two window ranks that share a
    // single sort per partition key; at scale this is the standard
    // bar-building shape (partition by series, window within).
    q("q63_ohlc_bars", "per (event_type, 1h) OHLC bars over value (tick→candle)")(
      """WITH e AS (SELECT event_type, ts::TIMESTAMP AS t, event_id, value FROM events),
        |w AS (SELECT event_type,
        |             make_timestamp((CAST(floor(epoch(t)) AS BIGINT) // 3600) * 3600 * 1000000) AS ws,
        |             t, event_id, value FROM e),
        |r AS (SELECT *,
        |             row_number() OVER (PARTITION BY event_type, ws ORDER BY t, event_id) AS rna,
        |             row_number() OVER (PARTITION BY event_type, ws ORDER BY t DESC, event_id DESC) AS rnd
        |      FROM w)
        |SELECT event_type, ws,
        |       round(max(CASE WHEN rna = 1 THEN value END), 4) AS open,
        |       round(max(value), 4) AS high,
        |       round(min(value), 4) AS low,
        |       round(max(CASE WHEN rnd = 1 THEN value END), 4) AS close,
        |       count(*) AS n
        |FROM r GROUP BY event_type, ws ORDER BY event_type, ws""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Tables(s, dir, "events")
        .select(col("event_type"), col("ts"), col("event_id"), col("value"))
        .withColumn("ws", window(col("ts"), "1 hour").getField("start"))
      val wAsc = Window.partitionBy(col("event_type"), col("ws"))
        .orderBy(col("ts"), col("event_id"))
      val wDesc = Window.partitionBy(col("event_type"), col("ws"))
        .orderBy(col("ts").desc, col("event_id").desc)
      w.withColumn("rna", row_number().over(wAsc))
        .withColumn("rnd", row_number().over(wDesc))
        .groupBy("event_type", "ws")
        .agg(round(max(when(col("rna") === 1, col("value"))), 4).as("open"),
          round(max(col("value")), 4).as("high"),
          round(min(col("value")), 4).as("low"),
          round(max(when(col("rnd") === 1, col("value"))), 4).as("close"),
          count(lit(1)).as("n"))
        .orderBy("event_type", "ws")
    },

    // SCD Type 2 — build slowly-changing-dimension validity intervals from
    // an event stream: detect state changes per key (lag), open a version
    // row at each change, close it with the next change's timestamp (lead;
    // null valid_to = current version). The warehouse op every dimension
    // pipeline runs; two windows over the same (key, time) partitioning =
    // ONE shuffle total.
    q("q81_scd2", "SCD Type 2 validity intervals from per-user event-type changes")(
      """WITH s AS (SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type,
        |            lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |           FROM events),
        |c AS (SELECT user_id, ts, event_id, event_type FROM s
        |      WHERE prev IS NULL OR prev <> event_type),
        |v AS (SELECT user_id, event_type AS state, ts AS valid_from, event_id,
        |             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |      FROM c)
        |SELECT user_id, state, valid_from, valid_to, event_id
        |FROM v ORDER BY user_id, valid_from, event_id""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val byKey = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val changes = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(byKey))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      changes
        .select(col("user_id"), col("event_type").as("state"),
          col("ts").as("valid_from"), col("event_id"),
          lead(col("ts"), 1).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")).as("valid_to"))
        .orderBy("user_id", "valid_from", "event_id")
    },

    // Point-in-time (temporal) join — the CONSUMER side of q81's SCD2
    // dimension: each purchase joins the state version valid AT its
    // timestamp (valid_from ≤ t < valid_to, null = current). The plan is an
    // equi hash join on the entity key with the interval as a post-filter —
    // at 100 TB both sides co-partition on user_id, and a fact row matches
    // exactly one version, so output ≙ fact cardinality.
    q("q81b_pit_join", "point-in-time join: purchases against the SCD2 state dimension")(
      """WITH s AS (SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type,
        |            lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |           FROM events),
        |c AS (SELECT user_id, ts, event_id, event_type FROM s
        |      WHERE prev IS NULL OR prev <> event_type),
        |v AS (SELECT user_id, event_type AS state, ts AS valid_from,
        |             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |      FROM c),
        |p AS (SELECT user_id, ts::TIMESTAMP AS pts, event_id FROM events
        |      WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, v.state, v.valid_from
        |FROM p JOIN v ON p.user_id = v.user_id
        | AND p.pts >= v.valid_from AND (v.valid_to IS NULL OR p.pts < v.valid_to)
        |ORDER BY p.event_id""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val byKey = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val events = Tables(s, dir, "events")
      val dim = events
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(byKey))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .select(col("user_id").as("d_user"), col("event_type").as("state"),
          col("ts").as("valid_from"),
          lead(col("ts"), 1).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")).as("valid_to"))
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"), col("event_id"))
      purchases.join(dim,
        col("user_id") === col("d_user")
          && col("pts") >= col("valid_from")
          && (col("valid_to").isNull || col("pts") < col("valid_to")))
        .select(col("event_id"), col("user_id"), col("state"), col("valid_from"))
        .orderBy("event_id")
    },

    // Gap filling / resampling — regularize a sparse series onto a dense
    // hourly spine: generate the (series, hour) grid (sequence + explode —
    // GENERATED, not scanned), left-join the actual buckets, and forward-
    // fill the last observation with ignore-nulls last_value. Missing
    // hours report n=0 with the carried value — the resample step before
    // any fixed-step time-series model. One window per series; the spine
    // is |series|×|hours| rows of two longs.
    q("q98_gapfill", "hourly spine per event_type with forward-filled last observation")(
      """WITH b AS (SELECT event_type,
        |                  (CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 3600) AS hb,
        |                  count(*) AS n,
        |                  round(CAST(sum(CAST(round(value, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS v
        |           FROM events GROUP BY event_type, hb),
        |r AS (SELECT CAST(min(hb) AS BIGINT) AS lo, CAST(max(hb) AS BIGINT) AS hi FROM b),
        |spine AS (SELECT t.event_type, g.hb
        |          FROM (SELECT DISTINCT event_type FROM b) t
        |          CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM r), (SELECT hi FROM r))) AS hb) g),
        |j AS (SELECT s.event_type, s.hb, b.n, b.v
        |      FROM spine s LEFT JOIN b ON s.event_type = b.event_type AND s.hb = b.hb)
        |SELECT event_type, make_timestamp(hb * 3600 * 1000000) AS bucket,
        |       COALESCE(n, 0) AS n,
        |       last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hb) AS v_ffill
        |FROM j ORDER BY event_type, bucket""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val b = Tables(s, dir, "events")
        .selectExpr("event_type", "cast(ts as bigint) div 3600 AS hb", "value")
        .groupBy("event_type", "hb")
        .agg(count(lit(1)).as("n"),
          round(sum(round(col("value"), 4).cast(DecimalType(28, 4))).cast("double"), 4).as("v"))
        .cache() // bounds + series list + the left join
      val bounds = b.agg(min(col("hb")).as("lo"), max(col("hb")).as("hi"))
      val spine = b.select("event_type").distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("hb"))
      spine.join(b, Seq("event_type", "hb"), "left")
        .select(col("event_type"),
          timestamp_micros(col("hb") * 3600L * 1000000L).as("bucket"),
          coalesce(col("n"), lit(0L)).as("n"),
          last(col("v"), ignoreNulls = true)
            .over(Window.partitionBy("event_type").orderBy("hb")).as("v_ffill"))
        .orderBy("event_type", "bucket")
    },

    // Time-WEIGHTED average price (TWAP) per (series, 6 h bucket) — the
    // finance twin of q63's OHLC: each observation holds until the next
    // observation of the same series, clipped at the bucket end (the last
    // observation carries to the bucket boundary). Weighting is EXACT
    // integer arithmetic end to end: µs durations (BIGINT) × 4-decimal
    // price units (BIGINT) — Σ(vi·dur) ≤ 5.6e6 × 2.16e10 ≈ 1.2e17 per
    // bucket, 76× inside Long range — so both engines divide identical
    // integers and the doubles match bit-for-bit. Shape: one lead() per
    // series partition + a keyed aggregation; at 100 TB the window is
    // partition-local per series and the aggregate is map-side partial —
    // no global sort, no product. Irregular ticks are the POINT here:
    // plain avg() over-weights burst periods; TWAP is the number a
    // fills/mark-out analysis actually wants.
    q("q231_twap", "time-weighted average price per (event_type, 6h bucket), exact µs×price integers")(
      """WITH e AS (SELECT event_type, epoch_us(ts::TIMESTAMP) AS tu,
        |                  CAST(round(value * 10000) AS BIGINT) AS vi, event_id
        |           FROM events),
        |w AS (SELECT event_type, tu, vi, tu // 21600000000 AS bk,
        |             lead(tu) OVER (PARTITION BY event_type ORDER BY tu, event_id) AS nxt
        |      FROM e),
        |d AS (SELECT event_type, bk, vi,
        |             least(coalesce(nxt, (bk + 1) * 21600000000), (bk + 1) * 21600000000) - tu AS dur
        |      FROM w)
        |SELECT event_type, make_timestamp(bk * 21600000000) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(dur) AS BIGINT) AS held_us,
        |       round(CAST(sum(vi * dur) AS DOUBLE) / (10000.0 * CAST(sum(dur) AS DOUBLE)), 4) AS twap
        |FROM d GROUP BY event_type, bk ORDER BY event_type, bucket""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Tables(s, dir, "events")
        .select(col("event_type"), unix_micros(col("ts")).as("tu"),
          round(col("value") * 10000).cast("long").as("vi"), col("event_id"))
        .withColumn("bk", expr("tu div 21600000000"))
        .withColumn("nxt", lead(col("tu"), 1).over(
          Window.partitionBy("event_type").orderBy("tu", "event_id")))
      val end = (col("bk") + 1) * 21600000000L
      w.select(col("event_type"), col("bk"), col("vi"),
        (least(coalesce(col("nxt"), end), end) - col("tu")).as("dur"))
        .groupBy("event_type", "bk")
        .agg(count(lit(1)).as("n"), sum(col("dur")).as("held_us"),
          round(sum(col("vi") * col("dur")).cast("double")
            / (lit(10000.0) * sum(col("dur")).cast("double")), 4).as("twap"))
        .select(col("event_type"), timestamp_micros(col("bk") * 21600000000L).as("bucket"),
          col("n"), col("held_us"), col("twap"))
        .orderBy("event_type", "bucket")
    },

    // B28 extension — DYNAMIC gap session windows (Spark's per-row gap
    // overload of session_window, public 3.2+ API): a purchase keeps the
    // session alive 30 minutes, everything else 10 — the "engagement
    // depends on what the user did" sessionization real funnels need.
    // Merge semantics differ subtly from the fixed-gap case: each event
    // extends the session to ts + ITS OWN gap, sessions merge while the
    // next event starts no later than the RUNNING MAX of prior ends, and
    // the session end is that running max (not last-event + gap). The
    // oracle reproduces exactly that with a running-max window + island
    // construction — the hash match pins Spark's dynamic-gap semantics,
    // not just the row counts. Scale shape: one partitioned sort per
    // user, no global window.
    q("q292_dynamic_session_gap",
      "per-row-gap session windows: purchases extend 30m, others 10m")(
      """WITH e AS (SELECT user_id, ts::TIMESTAMP AS t,
        |                  CASE WHEN event_type = 'purchase' THEN INTERVAL 30 MINUTE
        |                       ELSE INTERVAL 10 MINUTE END AS g
        |           FROM events),
        |m AS (SELECT user_id, t, g,
        |             max(t + g) OVER (PARTITION BY user_id ORDER BY t
        |                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
        |      FROM e),
        |b AS (SELECT user_id, t, g,
        |             CASE WHEN pe IS NULL OR t > pe THEN 1 ELSE 0 END AS brk
        |      FROM m),
        |gi AS (SELECT user_id, t, g,
        |              sum(brk) OVER (PARTITION BY user_id ORDER BY t
        |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |       FROM b)
        |SELECT user_id, min(t) AS s, max(t + g) AS e, count(*) AS n
        |FROM gi GROUP BY user_id, sid ORDER BY user_id, s""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("user_id"),
          session_window(col("ts"),
            when(col("event_type") === "purchase", "30 minutes").otherwise("10 minutes")))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("session_window.start").as("s"),
          col("session_window.end").as("e"), col("n"))
        .orderBy("user_id", "s")
    }
  )
}
