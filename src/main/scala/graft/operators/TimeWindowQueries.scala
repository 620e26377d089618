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
    }
  )
}
