package graft.streaming

import graft.Registry.{Q, q}
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, TimeMode, TTLConfig}
import org.apache.spark.sql.types._

/** Streaming operators (SURVEY.md §2B B26/B29/B31/B32) executed as REAL
  * Structured Streaming queries inside the verify harness: the events table
  * is replayed through a file streaming source, results land in a memory
  * sink, and the returned DataFrame is the sink table — so the correctness
  * gate exercises the streaming engine itself, not a batch stand-in. The
  * oracle states the batch-equivalent SQL (single-batch replay ⇒ watermark
  * drops are deterministic).
  */
object StreamingQueries {

  private val nameCounter = new AtomicInteger()

  /** events replayed as a stream, tolerant of BOTH fixture generations the
    * batch [[graft.Tables]] loader defends (its contract — don't crash on
    * either): r5+ stores ts as µs isAdjustedToUTC=false (read directly as
    * TimestampType — UTC sessions make the instants identical), pre-r5
    * stored ns-precision INT64 (surfaces as LongType under nanosAsLong;
    * truncate to µs exactly like the batch loader). One driver-side footer
    * probe per call picks the branch. */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    val tsIsNanosLong = {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      s.read.parquet(s"$dir/events.parquet").schema("ts").dataType == LongType
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", if (tsIsNanosLong) LongType else TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // the streaming file source requires a directory; pathGlobFilter pins it
    // to the events table inside the fixture dir
    val raw = s.readStream.schema(schema).option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    if (tsIsNanosLong) raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** embeddings replayed as a stream (single-file fixture ⇒ one data
    * batch, deterministic). */
  private def embeddingsStream(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    s.readStream.schema(schema).option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
  }

  /** Run a streaming frame to completion into a memory sink; return the
    * materialized table. */
  private def runToMemory(s: SparkSession, df: DataFrame,
      mode: OutputMode = OutputMode.Append): DataFrame = {
    val name = s"graft_stream_${nameCounter.incrementAndGet()}"
    val ckpt = Files.createTempDirectory(s"graft-ckpt-$name").toString
    val query = df.writeStream.outputMode(mode)
      .option("checkpointLocation", ckpt)
      .format("memory").queryName(name).start()
    try { query.processAllAvailable() } finally { query.stop() }
    s.table(name)
  }

  /** Run `body` with `spark.sql.shuffle.partitions` = `n`, restoring after.
    *
    * For the stateful streaming replays the partition count is ALSO the
    * state-store count, and every micro-batch (data or not) commits every
    * store through CheckpointFileManager's rename protocol — at 32
    * partitions a stream-stream join (4 stores per partition) writes 128+
    * checkpoint files per batch, which measured as ~95% of the q45
    * family's wall time at fixture scale. 8 partitions carry the same
    * fixture data (both join sides are ~10k rows) at a quarter of the
    * fixed cost. At 100 TB the partition count is sized to the STATE
    * (rows per store × row width vs executor memory), not to this
    * replay's fixed overhead — the knob is per-deployment either way;
    * the plan and results are partition-count-independent. */
  private def withShufflePartitions[A](s: SparkSession, n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }

  val all: Seq[Q] = Seq(

    // B29: watermark + append-mode event-time aggregation. With a single-file
    // replay the watermark after the data batch is max(ts) - 10min, and the
    // no-data flush batch finalizes exactly the windows whose end ≤ watermark
    // — the oracle's HAVING clause.
    q("q29_stream_watermark", "B29 streaming tumbling 1h agg with 10-minute watermark")(
      """SELECT make_timestamp((CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 3600) * 3600 * 1000000) AS ws,
        |       count(*) AS n, round(sum(value), 4) AS sv
        |FROM events
        |GROUP BY ws
        |HAVING ws + INTERVAL 1 HOUR <= (SELECT max(ts::TIMESTAMP) - INTERVAL 10 MINUTE FROM events)
        |ORDER BY ws""".stripMargin
    ) { (s, dir) =>
      val agg = eventsStream(s, dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
        .select(col("window.start").as("ws"), col("n"), col("sv"))
      runToMemory(s, agg).orderBy("ws")
    },

    // Streaming OHLC bars — q63 run as a REAL watermarked streaming
    // aggregation: open/close ride min/max over (ts, event_id, value)
    // structs (lexicographic struct ordering pins them exactly like q63's
    // (ts, event_id) row_numbers; event_id is unique so the value field
    // never decides), high/low are plain min/max — ALL algebraic, so the
    // streaming state per open window is two structs + two doubles + a
    // count, and partial aggregation works map-side. Append mode emits
    // exactly the windows the watermark closed — the oracle's HAVING gate.
    q("q63b_stream_ohlc_bars",
      "streaming per (event_type, 1h) OHLC bars, 10-minute watermark")(
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
        |FROM r GROUP BY event_type, ws
        |HAVING ws + INTERVAL 1 HOUR <= (SELECT max(ts::TIMESTAMP) - INTERVAL 10 MINUTE FROM events)
        |ORDER BY event_type, ws""".stripMargin
    ) { (s, dir) =>
      val agg = eventsStream(s, dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(col("event_type"), window(col("ts"), "1 hour"))
        .agg(min(struct(col("ts"), col("event_id"), col("value"))).as("o"),
          max(struct(col("ts"), col("event_id"), col("value"))).as("c"),
          round(max(col("value")), 4).as("high"),
          round(min(col("value")), 4).as("low"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("window.start").as("ws"),
          round(col("o.value"), 4).as("open"), col("high"), col("low"),
          round(col("c.value"), 4).as("close"), col("n"))
      runToMemory(s, agg).orderBy("event_type", "ws")
    },

    // B31: stream-static join — the streaming side joins a broadcast static
    // dimension per micro-batch (the 100 TB pattern for enriching streams).
    q("q31_stream_static_join", "B31 stream events ⋈ static customer dim")(
      """SELECT event_id, user_id, c_mktsegment AS seg FROM events
        |JOIN customer ON user_id = c_custkey
        |ORDER BY event_id""".stripMargin
    ) { (s, dir) =>
      val dim = broadcast(graft.Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment")))
      val joined = eventsStream(s, dir)
        .join(dim, col("user_id") === col("c_custkey"))
        .select(col("event_id"), col("user_id"), col("c_mktsegment").as("seg"))
      runToMemory(s, joined).orderBy("event_id")
    },

    // Stream-stream join: purchases join clicks of the same user within the
    // preceding 30 minutes — both sides streaming, watermarked, with the
    // event-time range constraint bounding join state (the scale requirement
    // for stream-stream joins). Single-file replay ⇒ deterministic; oracle
    // is the batch-equivalent theta join.
    q("q45_stream_stream_join", "stream-stream interval join: purchase ⋈ prior click ≤30m")(
      """SELECT p.event_id AS pid, c.event_id AS cid
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts::TIMESTAMP <= p.ts::TIMESTAMP
        | AND c.ts::TIMESTAMP >= p.ts::TIMESTAMP - INTERVAL 30 MINUTE
        |ORDER BY pid, cid""".stripMargin
    ) { (s, dir) =>
      withShufflePartitions(s, 8) {
        val p = eventsStream(s, dir).filter(col("event_type") === "purchase")
          .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts").as("pts"))
          .withWatermark("pts", "1 hour")
        val c = eventsStream(s, dir).filter(col("event_type") === "click")
          .select(col("event_id").as("cid"), col("user_id").as("cu"), col("ts").as("cts"))
          .withWatermark("cts", "1 hour")
        val joined = p.join(c,
          col("pu") === col("cu")
            && col("cts") <= col("pts")
            && col("cts") >= col("pts") - expr("INTERVAL 30 MINUTES"))
          .select(col("pid"), col("cid"))
        runToMemory(s, joined).orderBy("pid", "cid")
      }
    },

    // Stream-stream LEFT OUTER interval join: same pairing as q45, but
    // unmatched purchases must ALSO emit (with null cid) — and in streaming
    // that emission is watermark-gated: a null row appears only once the
    // watermark proves no matching click can still arrive. The EXACT
    // internal emission boundary proved batch-structure-dependent (observed
    // max(ts)-90min at sf0.01 but max(ts)-60min at sf0.1 for the same
    // plan), so the query does not depend on it: both sides keep matches
    // plus null rows older than a conservative max(ts) - 3h margin — far
    // below every plausible eviction boundary (watermark delay 1h + the
    // 30-minute interval span), making the result independent of the
    // engine's internal eviction schedule while still proving real
    // watermark-gated outer emission (a batch left join would also contain
    // the younger null rows the margin excludes).
    q("q45b_stream_stream_left_join",
      "stream-stream LEFT OUTER interval join w/ watermark-gated null emission")(
      """SELECT p.event_id AS pid, c.event_id AS cid
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts::TIMESTAMP <= p.ts::TIMESTAMP
        | AND c.ts::TIMESTAMP >= p.ts::TIMESTAMP - INTERVAL 30 MINUTE
        |WHERE c.event_id IS NOT NULL
        |   OR p.ts::TIMESTAMP < (SELECT max(ts::TIMESTAMP) - INTERVAL 3 HOUR FROM events)
        |ORDER BY pid, cid""".stripMargin
    ) { (s, dir) =>
      withShufflePartitions(s, 8) {
        val p = eventsStream(s, dir).filter(col("event_type") === "purchase")
          .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts").as("pts"))
          .withWatermark("pts", "1 hour")
        val c = eventsStream(s, dir).filter(col("event_type") === "click")
          .select(col("event_id").as("cid"), col("user_id").as("cu"), col("ts").as("cts"))
          .withWatermark("cts", "1 hour")
        val joined = p.join(c,
          col("pu") === col("cu")
            && col("cts") <= col("pts")
            && col("cts") >= col("pts") - expr("INTERVAL 30 MINUTES"),
          "leftOuter")
          .select(col("pid"), col("cid"), col("pts"))
        val mx = graft.Tables(s, dir, "events").agg(max(col("ts")).as("mx"))
        runToMemory(s, joined)
          .crossJoin(broadcast(mx))
          .filter(col("cid").isNotNull ||
            col("pts") < col("mx") - expr("INTERVAL 3 HOURS"))
          .select(col("pid"), col("cid"))
          .orderBy(col("pid"), col("cid").asc_nulls_last)
      }
    },

    // Stream-stream FULL OUTER interval join — the third (and last) outer
    // mode Spark supports for stream-stream joins: unmatched rows on BOTH
    // sides emit null-padded once the watermark proves no partner can
    // arrive. Same conservative max(ts) - 3h margin as q45b, applied
    // per-side (an unmatched click row carries a null pts and vice versa),
    // so the result is independent of the engine's internal eviction
    // schedule while still proving watermark-gated emission on both sides.
    q("q45c_stream_stream_full_join",
      "stream-stream FULL OUTER interval join, null emission gated both sides")(
      """SELECT p.event_id AS pid, c.event_id AS cid
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts::TIMESTAMP <= p.ts::TIMESTAMP
        | AND c.ts::TIMESTAMP >= p.ts::TIMESTAMP - INTERVAL 30 MINUTE
        |WHERE (p.event_id IS NOT NULL AND c.event_id IS NOT NULL)
        |   OR (c.event_id IS NULL AND p.ts::TIMESTAMP <
        |       (SELECT max(ts::TIMESTAMP) - INTERVAL 3 HOUR FROM events))
        |   OR (p.event_id IS NULL AND c.ts::TIMESTAMP <
        |       (SELECT max(ts::TIMESTAMP) - INTERVAL 3 HOUR FROM events))
        |ORDER BY pid NULLS LAST, cid NULLS LAST""".stripMargin
    ) { (s, dir) =>
      withShufflePartitions(s, 8) {
        val p = eventsStream(s, dir).filter(col("event_type") === "purchase")
          .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts").as("pts"))
          .withWatermark("pts", "1 hour")
        val c = eventsStream(s, dir).filter(col("event_type") === "click")
          .select(col("event_id").as("cid"), col("user_id").as("cu"), col("ts").as("cts"))
          .withWatermark("cts", "1 hour")
        val joined = p.join(c,
          col("pu") === col("cu")
            && col("cts") <= col("pts")
            && col("cts") >= col("pts") - expr("INTERVAL 30 MINUTES"),
          "fullOuter")
          .select(col("pid"), col("cid"), col("pts"), col("cts"))
        val mx = graft.Tables(s, dir, "events").agg(max(col("ts")).as("mx"))
        runToMemory(s, joined)
          .crossJoin(broadcast(mx))
          .filter((col("pid").isNotNull && col("cid").isNotNull) ||
            (col("cid").isNull && col("pts") < col("mx") - expr("INTERVAL 3 HOURS")) ||
            (col("pid").isNull && col("cts") < col("mx") - expr("INTERVAL 3 HOURS")))
          .select(col("pid"), col("cid"))
          .orderBy(col("pid").asc_nulls_last, col("cid").asc_nulls_last)
      }
    },

    // Stream-stream LEFT SEMI interval join — the fourth and last join mode
    // Spark supports for stream-stream joins (inner q45, leftOuter q45b,
    // fullOuter q45c): "did this purchase have ANY prior click ≤30m?" —
    // each matched purchase emits ONCE, however many clicks matched, and
    // unmatched purchases never emit (evicted silently at the watermark).
    // Exactly the existence-probe shape a 100 TB attribution pipeline runs
    // (semi join state stores no right-side payload and each left row at
    // most once — strictly lighter than the inner join's n×m emission).
    // Single-file replay ⇒ both sides land in one batch and every match is
    // in-batch; the oracle is the batch EXISTS. Cross-batch match arrival
    // and once-only emission are pinned in StreamingSemanticsSpec.
    q("q45d_stream_stream_semi_join",
      "stream-stream LEFT SEMI interval join: purchases with ≥1 prior click ≤30m")(
      """SELECT p.event_id AS pid FROM events p
        |WHERE p.event_type = 'purchase' AND EXISTS (
        |  SELECT 1 FROM events c
        |  WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |    AND c.ts::TIMESTAMP <= p.ts::TIMESTAMP
        |    AND c.ts::TIMESTAMP >= p.ts::TIMESTAMP - INTERVAL 30 MINUTE)
        |ORDER BY pid""".stripMargin
    ) { (s, dir) =>
      withShufflePartitions(s, 8) {
        val p = eventsStream(s, dir).filter(col("event_type") === "purchase")
          .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts").as("pts"))
          .withWatermark("pts", "1 hour")
        val c = eventsStream(s, dir).filter(col("event_type") === "click")
          .select(col("event_id").as("cid"), col("user_id").as("cu"), col("ts").as("cts"))
          .withWatermark("cts", "1 hour")
        val joined = p.join(c,
          col("pu") === col("cu")
            && col("cts") <= col("pts")
            && col("cts") >= col("pts") - expr("INTERVAL 30 MINUTES"),
          "leftSemi")
          .select(col("pid"))
        runToMemory(s, joined).orderBy("pid")
      }
    },

    // B28 as a REAL streaming execution (q28 checks the batch operator):
    // session windows finalize in append mode only when the watermark
    // passes the session end (last event + gap); with the single-file
    // replay the post-batch watermark is max(ts) - 10min, giving the
    // oracle's HAVING cutoff over the standard gap-break island SQL.
    q("q28b_stream_session_window",
      "B28 streaming 30m-gap session windows, watermark-finalized")(
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
        |FROM g GROUP BY user_id, sid
        |HAVING max(t) + INTERVAL 30 MINUTE <= (SELECT max(ts::TIMESTAMP) - INTERVAL 10 MINUTE FROM events)
        |ORDER BY user_id, s""".stripMargin
    ) { (s, dir) =>
      val agg = eventsStream(s, dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("session_window.start").as("s"),
          col("session_window.end").as("e"), col("n"))
      runToMemory(s, agg).orderBy("user_id", "s")
    },

    // B32: arbitrary stateful processing — per-user running (count, max)
    // via flatMapGroupsWithState (≙ the reference's per-instrument derived
    // state the north star generalizes; RocksDB state store at scale).
    q("q32_stream_stateful", "B32 flatMapGroupsWithState per-user count/max")(
      """SELECT user_id, count(*) AS n, round(max(value), 4) AS mx
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val updates = eventsStream(s, dir)
        .select(col("user_id"), col("value")).as[(Long, Double)]
        .groupByKey(_._1)
        .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
            var (n, mx) = state.getOption.getOrElse((0L, Double.NegativeInfinity))
            rows.foreach { r => n += 1; mx = math.max(mx, r._2) }
            state.update((n, mx))
            Iterator((uid, n, mx))
        }
        .toDF("user_id", "n", "mx_raw")
      // one running emission per user per batch; n is monotone, so the
      // max-n reduction keeps only the LATEST state under multi-batch
      // replay (the q152/q149 sink discipline — without it a multi-file
      // fixture would emit stale running totals as extra rows)
      runToMemory(s, updates)
        .groupBy("user_id")
        .agg(max(struct(col("n"), col("mx_raw"))).as("last"))
        .select(col("user_id"), col("last.n").as("n"),
          round(col("last.mx_raw"), 4).as("mx"))
        .orderBy("user_id")
    },

    // Streaming near-dup pair mining — the LLM-pipeline dedup operator run
    // ON THE STREAM: each incoming doc's 32-bit SimHash (computed as a pure
    // projection — a per-bit HOF fold over distinct token hashes, no
    // aggregation, so it composes with downstream stateful ops) splits into
    // 4×8-bit bands; per-(band, value) keyed state keeps the minimum doc_id
    // ever seen, and every later doc in the bucket emits a (band, keeper,
    // dup) candidate pair. State is one long per occupied bucket — bounded
    // by distinct band values, not corpus size; emission is incremental
    // (append mode). Docs arrive in doc_id order, so "state minimum" ≡
    // "global minimum among earlier docs" — the batch-equivalent oracle.
    q("q56_stream_neardup_pairs",
      "streaming SimHash-banded near-dup pair mining (keyed band-bucket state)")(
      s"""${graft.operators.DedupQueries.simhash32Cte},
         |bands AS (SELECT doc_id, b, (simhash >> (b * 8)) & 255 AS bv
         |          FROM sig CROSS JOIN range(4) AS r(b)),
         |pairs AS (SELECT b.b AS band, min(a.doc_id) AS keeper, b.doc_id AS dup
         |          FROM bands b JOIN bands a
         |            ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id
         |          GROUP BY b.b, b.doc_id)
         |SELECT CAST(band AS BIGINT) AS band, keeper, dup FROM pairs
         |ORDER BY dup, band""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      import graft.functions.PortableHash.md5Long
      // 32-bit SimHash as a stateless projection: distinct token hashes,
      // then per bit a ±1 fold (integer addition — order-free, so the HOF
      // fold matches the oracle's grouped sum exactly)
      val hvs = transform(array_distinct(split(col("text"), " ")), w => md5Long(w))
      val simhash = (0 until 32).map { i =>
        val sgn = aggregate(hvs, lit(0L),
          (acc, h) => acc + (shiftright(h, i).bitwiseAND(1L) * 2 - 1))
        when(sgn > 0, lit(1L << i)).otherwise(0L)
      }.reduce(_ + _)
      val bands = docsStream(s, dir)
        .select(col("doc_id"), simhash.as("simhash"))
        .select(col("doc_id"), explode(array((0 until 4).map(b =>
          struct(lit(b).as("b"),
            shiftright(col("simhash"), b * 8).bitwiseAND(255L).as("bv"))): _*)).as("bb"))
        .select(col("doc_id"), col("bb.b").as("b"), col("bb.bv").as("bv"))
        .as[(Long, Int, Long)]
      val pairs = bands.groupByKey(r => (r._2, r._3))
        .flatMapGroupsWithState[Long, (Long, Long, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (key: (Int, Long), rows: Iterator[(Long, Int, Long)], state: GroupState[Long]) =>
            val ds = rows.map(_._1).toArray.sorted
            var mn = state.getOption.getOrElse(Long.MaxValue)
            val out = Seq.newBuilder[(Long, Long, Long)]
            ds.foreach { d =>
              if (d < mn) mn = d
              else out += ((key._1.toLong, mn, d))
            }
            state.update(mn)
            out.result().iterator
        }
        .toDF("band", "keeper", "dup")
      runToMemory(s, pairs).orderBy("dup", "band")
    },

    // Streaming incremental corpus dedup — q57 run ON THE STREAM: arriving
    // docs dedup within the stream (keyed keep-first state: one 8-byte min
    // doc_id per content hash, emitted only on first sight so re-arrivals
    // in later batches are suppressed) and against the standing corpus via
    // a stream-static LEFT ANTI join on the hash index. At 100 TB the
    // static side is the bucketed hash index; state size is one entry per
    // distinct arriving hash — the append-time dedup shape. Single-batch
    // replay ⇒ the batch q57 SQL is the exact oracle.
    q("q62_stream_incremental_dedup",
      "streaming arrival dedup: keyed keep-first state + anti join vs the corpus index")(
      """WITH n AS (SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h
        |           FROM documents),
        |keep AS (SELECT doc_id, h FROM
        |           (SELECT doc_id, h, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
        |            FROM n WHERE doc_id >= 400)
        |         WHERE rn = 1)
        |SELECT k.doc_id, k.h FROM keep k
        |WHERE NOT EXISTS (SELECT 1 FROM n i WHERE i.doc_id < 400 AND i.h = k.h)
        |ORDER BY k.doc_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val norm = (c: org.apache.spark.sql.Column) =>
        md5(trim(regexp_replace(lower(c), "\\s+", " ")))
      val index = graft.Tables(s, dir, "documents")
        .filter(col("doc_id") < 400).select(norm(col("text")).as("h"))
      val kept = docsStream(s, dir)
        .filter(col("doc_id") >= 400)
        .select(col("doc_id"), norm(col("text")).as("h"))
        .as[(Long, String)]
        .groupByKey(_._2)
        .flatMapGroupsWithState[Long, (Long, String)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (h: String, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
            val mn = rows.map(_._1).min
            if (state.getOption.isEmpty) { state.update(mn); Iterator((mn, h)) }
            else Iterator.empty
        }
        .toDF("doc_id", "h")
      runToMemory(s, kept.join(index, Seq("h"), "left_anti"))
        .select("doc_id", "h").orderBy("doc_id")
    },

    // The q208 curation funnel ON THE STREAM — arriving docs run the same
    // gates incrementally: stateless langid (q36b marker rule) and quality
    // (q36c score ≥ 0.5) filters, row-local decontamination against the
    // BROADCAST holdout 8-shingle set, then keyed keep-first exact dedup
    // (q62's one-long-per-hash state). The holdout is a BUCKETED membership
    // map (h % 64Ki → sorted bucket array): each probe touches only its
    // bucket, so per-doc cost is shingles × (holdout/buckets), LINEAR in
    // corpus size with a tunable constant — the round-7 sf1 bench caught
    // the previous flat collected array curving quadratic (arrays_overlap
    // rescans the whole holdout per row: 3.8 s → 221 s at 10× data; now
    // ~linear). Bucket count is the q59-style sized-to-corpus knob; the
    // production alternative is that Bloom front (fp-free here because the
    // map IS exact membership). Stream stage order is decon→dedup (a
    // stream cannot re-admit a doc a later stage would have preferred),
    // and the oracle mirrors THAT order; the corpus has no exact dups so
    // the q208 report numbers still agree. Output: the per-source
    // survivor report maintained incrementally.
    q("q214_stream_curation",
      "streaming curation funnel: stateless gates + broadcast decon + keep-first dedup state")(
      s"""WITH base AS (SELECT doc_id, text, source, n_chars,
         |                     str_split(text, ' ') AS w,
         |                     ${graft.functions.PortableHash.md5LongSql("text")} % 100 AS b,
         |                     CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok,
         |                     length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS n_punct
         |              FROM documents),
         |s1 AS (SELECT * FROM (
         |         SELECT *,
         |${graft.operators.TextQueries.markers.map { case (l, ws) =>
             s"           len(list_filter(w, x -> x IN (${graft.operators.TextQueries.inListSql(ws)}))) AS n_$l"
           }.mkString(",\n")}
         |         FROM base)
         |       WHERE n_en >= n_fr AND n_en >= n_es AND n_en >= n_de AND n_en >= n_zh),
         |s2 AS (SELECT * FROM s1
         |       WHERE least(n_tok / 100.0, 1.0) * (1.0 - n_punct * 1.0 / n_chars) >= 0.5),
         |hold AS (SELECT DISTINCT unnest(list_transform(list_distinct(${graft.functions.PortableHash.shinglesSql("w", 8)}),
         |                                               g -> ${graft.functions.PortableHash.md5LongSql("g")})) AS h
         |         FROM base WHERE b >= 90 AND len(w) >= 8),
         |s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (
         |         SELECT doc_id FROM
         |           (SELECT doc_id, unnest(list_transform(list_distinct(${graft.functions.PortableHash.shinglesSql("w", 8)}),
         |                                                 g -> ${graft.functions.PortableHash.md5LongSql("g")})) AS h
         |            FROM s2 WHERE len(w) >= 8) sh
         |         JOIN hold USING (h))),
         |s4 AS (SELECT * FROM (
         |         SELECT *, row_number() OVER (
         |           PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
         |           ORDER BY doc_id) AS rn
         |         FROM s3)
         |       WHERE rn = 1)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_tok) AS BIGINT) AS n_tokens
         |FROM s4 GROUP BY source ORDER BY source""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      import graft.functions.PortableHash.{md5Long, shingles}
      val markers = graft.operators.TextQueries.markers
      // static holdout shingle set as ONE broadcastable DENSE bucket-array
      // row: position b (1-based) holds the sorted hashes with h % Buckets
      // = b-1, every bucket present (empty arrays fill the gaps), so a
      // probe is one O(1) GetArrayItem + an ~|hold|/Buckets containment
      // scan. Deliberately an ARRAY, not a MapType: Spark's map element_at
      // linear-scans the key array — O(Buckets) per probe, the exact
      // wrong-shape this replaces. Bucket order is made EXPLICIT by
      // sort_array over (bk, hs) structs — collect_list is documented
      // order-non-deterministic, so correctness must not rest on physical
      // iteration order (a silent-misplacement hazard: probe misses are
      // silent false negatives).
      val Buckets = 16384L
      val bucketed = graft.Tables(s, dir, "documents")
        .select(split(col("text"), " ").as("w"), (md5Long(col("text")) % 100).as("b"))
        .filter(col("b") >= 90 && size(col("w")) >= 8)
        .select(explode(transform(array_distinct(shingles(col("w"), 8)),
          g => md5Long(g))).as("h"))
        .distinct()
        .groupBy(pmod(col("h"), lit(Buckets)).as("bk"))
        .agg(sort_array(collect_list(col("h"))).as("hs"))
      val holdArr = s.range(Buckets).select(col("id").as("bk"))
        .join(bucketed, Seq("bk"), "left")
        .select(col("bk"), coalesce(col("hs"), array().cast("array<bigint>")).as("hs"))
        .agg(sort_array(collect_list(struct(col("bk"), col("hs")))).as("bkhs"))
        .select(transform(col("bkhs"), x => x.getField("hs")).as("hold"))
      val base = docsStream(s, dir)
        .select(col("doc_id"), col("text"), col("source"), col("n_chars"),
          split(col("text"), " ").as("w"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val withScores = markers.foldLeft(base) { case (df, (l, ws)) =>
        df.withColumn(s"n_$l",
          size(filter(col("w"), x => x.isin(ws.map(_.asInstanceOf[Any]): _*))))
      }
      val s1 = withScores.filter(col("n_en") >= col("n_fr") && col("n_en") >= col("n_es")
        && col("n_en") >= col("n_de") && col("n_en") >= col("n_zh"))
      val nPunct = length(col("text")) -
        length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""))
      val s2 = s1.withColumn("n_punct", nPunct)
        .filter(least(col("n_tok") / 100.0, lit(1.0))
          * (lit(1.0) - col("n_punct") * lit(1.0) / col("n_chars")) >= 0.5)
      val s3 = s2.crossJoin(holdArr) // stream × 1-row broadcast membership map
        .withColumn("sh", when(size(col("w")) >= 8,
          transform(array_distinct(shingles(col("w"), 8)), g => md5Long(g)))
          .otherwise(array().cast("array<bigint>")))
        .filter(!exists(col("sh"), x => array_contains(
          element_at(col("hold"), (pmod(x, lit(Buckets)) + 1).cast("int")), x)))
      val kept = s3
        .select(col("doc_id"), col("source"), col("n_tok"),
          md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("h"))
        .as[(Long, String, Long, String)]
        .groupByKey(_._4)
        .flatMapGroupsWithState[Long, (Long, String, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (h: String, rows: Iterator[(Long, String, Long, String)], state: GroupState[Long]) =>
            if (state.getOption.isEmpty) {
              val first = rows.minBy(_._1)
              state.update(first._1)
              Iterator((first._1, first._2, first._3))
            } else Iterator.empty
        }
        .toDF("doc_id", "source", "n_tok")
      runToMemory(s, kept)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .orderBy("source")
    },

    // q75's count-min sketch maintained ON THE STREAM: the 4×256 grid lives
    // as keyed state (key = (row, cell), value = running BIGINT counter —
    // ≤1024 entries total, a bounded-state structure by construction, which
    // is the whole point of a sketch at 100 TB). Each batch folds its token
    // occurrences into the counters and emits the post-batch value; the
    // final grid (max emission per cell) is then probed offline by the
    // exact candidate set, broadcast-joining the 1024-cell table. Counter
    // accumulation across batches is locked by StreamCountMinSpec;
    // single-batch replay ⇒ the batch q75 SQL is the exact oracle.
    q("q75b_stream_countmin",
      "stream-maintained count-min grid (keyed cell-counter state) probed for top-20")(
      graft.operators.TextQueries.countminSql
    ) { (s, dir) =>
      import s.implicits._
      import graft.functions.PortableHash.md5Long
      def cellHashes(tok: org.apache.spark.sql.Column) = array((0 until 4).map(i =>
        struct(lit(i).as("i"), (md5Long(concat(lit(s"$i:"), tok)) % 256).as("cell"))): _*)
      val occ = docsStream(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .select(explode(cellHashes(col("tok"))).as("h"))
        .select(col("h.i").as("i"), col("h.cell").as("cell"))
        .as[(Int, Long)]
      val cells = occ.groupByKey(identity)
        .flatMapGroupsWithState[Long, (Int, Long, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (key: (Int, Long), rows: Iterator[(Int, Long)], state: GroupState[Long]) =>
            val c = state.getOption.getOrElse(0L) + rows.size
            state.update(c)
            Iterator((key._1, key._2, c))
        }.toDF("i", "cell", "c")
      // one emission per cell per batch; the cumulative value is the max
      val grid = runToMemory(s, cells)
        .groupBy("i", "cell").agg(max(col("c")).as("c"))
      val cand = graft.Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("exact_n"))
      cand.select(col("tok"), col("exact_n"), explode(cellHashes(col("tok"))).as("h"))
        .select(col("tok"), col("exact_n"), col("h.i").as("i"), col("h.cell").as("cell"))
        .join(broadcast(grid), Seq("i", "cell"))
        .groupBy("tok", "exact_n").agg(min(col("c")).as("cm_est"))
        .select(col("tok"), col("exact_n"), col("cm_est"))
        .orderBy(col("cm_est").desc, col("tok")).limit(20)
    },

    // q71's MATCH_RECOGNIZE-lite ON THE STREAM: the funnel regex compiled
    // to an O(1)-state DFA (FunnelDfa) — per-user keyed state is the
    // (dfa state, events, funnels) triple, NOT an accumulated symbol
    // string that would grow with the stream. Each batch's rows are sorted
    // by (ts, event_id) before folding (group iterators are unordered —
    // NOTES.md); DFA ≡ leftmost non-overlapping regex matching is
    // property-tested on 5000 random strings. Emits the user's current
    // match stats when ≥1 funnel exists — a funnel whose views arrive in
    // one batch and purchase in the next IS found (StreamSeqPatternSpec
    // locks that cross-batch behavior). Single-batch replay ⇒ the batch
    // q71 SQL is the exact oracle.
    q("q71b_stream_seq_pattern",
      "streaming funnel matching: the v+c+p regex as O(1) per-user DFA state")(
      """WITH seqs AS (
        |  SELECT user_id,
        |         string_agg(CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        |                    WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's' ELSE 'e' END,
        |                    '' ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
        |       CAST(len(regexp_extract_all(seq, 'v+c+p')) AS BIGINT) AS n_funnels
        |FROM seqs WHERE len(regexp_extract_all(seq, 'v+c+p')) > 0
        |ORDER BY n_funnels DESC, user_id LIMIT 50""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val typed = eventsStream(s, dir)
        .select(col("user_id"), col("ts").cast("long").as("tsu"), col("event_id"),
          when(col("event_type") === "view", "v")
            .when(col("event_type") === "click", "c")
            .when(col("event_type") === "purchase", "p")
            .when(col("event_type") === "signup", "s")
            .otherwise("e").as("chr"))
        .as[(Long, Long, Long, String)]
      // state is the O(1) (dfa state, events, funnels) triple — the regex
      // compiled to FunnelDfa — NOT the accumulated symbol string (which
      // grew with the stream); DFA ≡ regex proven by property test
      val matches = typed.groupByKey(_._1)
        .flatMapGroupsWithState[(Int, Long, Long), (Long, Long, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (user: Long, rows: Iterator[(Long, Long, Long, String)],
           state: GroupState[(Int, Long, Long)]) =>
            var (st, len, n) = state.getOption.getOrElse((0, 0L, 0L))
            rows.toArray.sortBy(r => (r._2, r._3)).foreach { r =>
              len += 1
              val (st2, done) = FunnelDfa.step(st, r._4)
              st = st2
              if (done) n += 1
            }
            state.update((st, len, n))
            if (n > 0) Iterator((user, len, n)) else Iterator.empty
        }
        .toDF("user_id", "seq_len", "n_funnels")
      // one emission per matching user per batch; seq_len is monotone, so
      // the max-struct reduction keeps the LATEST stats under multi-batch
      // replay (q152/q149 sink discipline)
      runToMemory(s, matches)
        .groupBy("user_id")
        .agg(max(struct(col("seq_len"), col("n_funnels"))).as("last"))
        .select(col("user_id"), col("last.seq_len").as("seq_len"),
          col("last.n_funnels").as("n_funnels"))
        .orderBy(col("n_funnels").desc, col("user_id")).limit(50)
    },

    // CDC-style SCD2 maintenance ON THE STREAM: per-user keyed state holds
    // the OPEN version (state, valid_from, event_id); each arriving state
    // change CLOSES it (emits the finished version row with valid_to = the
    // change's timestamp) and opens the next — so the dimension table is
    // maintained append-only as changes arrive, the streaming twin of
    // batch q81. Emitted rows are exactly q81's closed intervals
    // (single-batch replay ⇒ that SQL, filtered to valid_to IS NOT NULL,
    // is the exact oracle); StreamScd2Spec locks the cross-batch close.
    q("q81c_stream_scd2",
      "streaming SCD2 maintenance: keyed open-version state, emit-on-close")(
      """WITH s AS (SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type,
        |            lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |           FROM events),
        |c AS (SELECT user_id, ts, event_id, event_type FROM s
        |      WHERE prev IS NULL OR prev <> event_type),
        |v AS (SELECT user_id, event_type AS state, ts AS valid_from, event_id,
        |             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |      FROM c)
        |SELECT user_id, state, valid_from, valid_to, event_id
        |FROM v WHERE valid_to IS NOT NULL
        |ORDER BY user_id, valid_from, event_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val typed = eventsStream(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("tsu"), col("event_id"),
          col("event_type"))
        .as[(Long, Long, Long, String)]
      val closed = typed.groupByKey(_._1)
        .flatMapGroupsWithState[(String, Long, Long), (Long, String, Long, Long, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (user: Long, rows: Iterator[(Long, Long, Long, String)],
           state: GroupState[(String, Long, Long)]) =>
            val sorted = rows.toArray.sortBy(r => (r._2, r._3))
            var cur = state.getOption.orNull
            val out = Seq.newBuilder[(Long, String, Long, Long, Long)]
            sorted.foreach { case (_, tsu, eid, et) =>
              if (cur == null) cur = (et, tsu, eid)
              else if (cur._1 != et) {
                out += ((user, cur._1, cur._2, tsu, cur._3))
                cur = (et, tsu, eid)
              }
            }
            if (cur != null) state.update(cur)
            out.result().iterator
        }
        .toDF("user_id", "state", "valid_from_us", "valid_to_us", "event_id")
        .select(col("user_id"), col("state"),
          timestamp_micros(col("valid_from_us")).as("valid_from"),
          timestamp_micros(col("valid_to_us")).as("valid_to"), col("event_id"))
      runToMemory(s, closed).orderBy("user_id", "valid_from", "event_id")
    },

    // COMPLETE output mode — the third streaming output mode next to the
    // registry's append (windowed aggs) and the update-mode state ops: an
    // unwindowed running aggregate whose full result table re-emits per
    // batch. State is one row per group key (bounded by |event_type|);
    // single-batch replay ⇒ the final complete table IS the batch group-by.
    q("q109_stream_complete_agg",
      "complete-mode streaming global aggregate per event_type")(
      """SELECT event_type, count(*) AS n,
        |       round(CAST(sum(CAST(round(value, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS v_sum
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      val agg = eventsStream(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(sum(round(col("value"), 4)
            .cast(org.apache.spark.sql.types.DecimalType(28, 4))).cast("double"), 4).as("v_sum"))
      runToMemory(s, agg, OutputMode.Complete).orderBy("event_type")
    },

    // Stream-maintained per-key top-k leaderboard — the streaming twin of
    // q148's native heap operator: each event_type's top-3 (value desc,
    // event_id) rows live as BOUNDED keyed state (k tuples per key, the
    // streaming analogue of the partial heap), merged with each batch's
    // arrivals and re-emitted WITH a monotone events-seen counter. The
    // Append-mode memory sink accumulates one board emission per batch, so
    // the final select reduces each (type, rank) slot to its max-counter
    // emission (q152's defense) — a multi-batch replay (multi-file
    // fixture, maxFilesPerTrigger) yields the LATEST board, never stale
    // duplicate rows. Group iterators are NOT ordered (NOTES.md) — the
    // merge sorts the combined list. Single-file replay ⇒ one data batch ⇒
    // the emission IS the batch top-3 (the oracle); cross-batch
    // displacement is locked by StreamTopKSpec.
    q("q149_stream_topk",
      "stream-maintained per-type top-3 leaderboard (bounded keyed state)")(
      """SELECT event_type, rnk, event_id, round(value, 4) AS value
        |FROM (SELECT event_type, event_id, value,
        |        row_number() OVER (PARTITION BY event_type
        |                           ORDER BY value DESC, event_id) AS rnk
        |      FROM events)
        |WHERE rnk <= 3 ORDER BY event_type, rnk""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val rows = eventsStream(s, dir)
        .select(col("event_type"), col("event_id"), col("value"))
        .as[(String, Long, Double)]
        .groupByKey(_._1)
        .flatMapGroupsWithState[(Seq[(Double, Long)], Long), (String, Long, Long, Long, Double)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (et: String, it: Iterator[(String, Long, Double)],
           state: GroupState[(Seq[(Double, Long)], Long)]) =>
            val (board, seen) = state.getOption.getOrElse((Seq.empty[(Double, Long)], 0L))
            val arrivals = it.map(r => (r._3, r._2)).toVector
            val merged = (board ++ arrivals)
              .sortBy { case (v, id) => (-v, id) }.take(3)
            val n = seen + arrivals.size
            state.update((merged, n))
            merged.zipWithIndex.iterator.map { case ((v, id), i) =>
              (et, n, (i + 1).toLong, id, v)
            }
        }
        .toDF("event_type", "n", "rnk", "event_id", "value")
      runToMemory(s, rows)
        .groupBy("event_type", "rnk")
        .agg(max(struct(col("n"), col("event_id"), col("value"))).as("last"))
        .select(col("event_type"), col("rnk"), col("last.event_id").as("event_id"),
          round(col("last.value"), 4).as("value"))
        .orderBy("event_type", "rnk")
    },

    // Stream-maintained EWMA — q127's smoother as keyed state that FOLDS
    // ACROSS batches: state is one double per event_type, each batch's
    // rows fold in (ts, event_id) order (group iterators are NOT ordered —
    // NOTES.md — so the batch materializes and sorts before folding). The
    // fold seeds from the stream's first value (state absent), exactly
    // like list_reduce — so the single-batch replay equals the oracle's
    // whole-stream sequential fold bit-for-bit. Cross-batch continuation
    // is locked by StreamEwmaSpec. State: ONE double per key.
    q("q152_stream_ewma",
      "stream-maintained whole-series EWMA (α=1/2) per event_type (one-double state)")(
      """WITH l AS (
        |  SELECT event_type, list(value ORDER BY ts, event_id) AS vs,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n, round(list_reduce(vs, (a, x) -> (a + x) / 2), 4) AS ewma
        |FROM l ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val folded = eventsStream(s, dir)
        .select(col("event_type"), unix_micros(col("ts")).as("t"),
          col("event_id"), col("value"))
        .as[(String, Long, Long, Double)]
        .groupByKey(_._1)
        .flatMapGroupsWithState[(Double, Long), (String, Long, Double)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (et: String, it: Iterator[(String, Long, Long, Double)],
           state: GroupState[(Double, Long)]) =>
            val batch = it.toVector.sortBy(r => (r._2, r._3)).map(_._4)
            val (seed, seen) = state.getOption match {
              case Some((e, n)) => (e, n)
              case None => (batch.head, 1L)
            }
            val rest = if (state.getOption.isEmpty) batch.tail else batch
            val ewma = rest.foldLeft(seed)((a, x) => (a + x) / 2)
            val n = seen + rest.size
            state.update((ewma, n))
            Iterator((et, n, ewma))
        }
        .toDF("event_type", "n", "ewma")
      runToMemory(s, folded)
        .groupBy("event_type")
        .agg(max(struct(col("n"), col("ewma"))).as("last"))
        .select(col("event_type"), col("last.n").as("n"),
          round(col("last.ewma"), 4).as("ewma"))
        .orderBy("event_type")
    },

    // Watermarked per-window top-k — the leaderboard (q149) and the
    // windowed aggregation discipline (q29/q63b) composed: per (1h window,
    // event_type), the top-3 events by value, emitted ONCE when the
    // watermark closes the window. The ranking runs through the typed
    // TopKAggregator — an ALGEBRAIC bounded top-k (merge = merge-and-trim)
    // — so streaming state per open window is k pairs, never the window's
    // event list, and partial aggregation trims map-side exactly like the
    // batch TopKPerKeyExec. Oracle = per-(type, hour) rank with the
    // watermark-close HAVING gate (q29's contract).
    q("q176_stream_windowed_topk",
      "watermarked per (event_type, 1h) top-3 by value via the algebraic top-k aggregator")(
      """WITH r AS (SELECT event_type,
        |            make_timestamp((CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 3600)
        |                           * 3600 * 1000000) AS ws,
        |            value, event_id,
        |            row_number() OVER (PARTITION BY event_type,
        |              (CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 3600)
        |              ORDER BY value DESC, event_id) AS rnk
        |           FROM events)
        |SELECT event_type, ws, CAST(rnk AS BIGINT) AS rnk, event_id,
        |       round(value, 4) AS value
        |FROM r
        |WHERE rnk <= 3
        |  AND ws + INTERVAL 1 HOUR <= (SELECT max(ts::TIMESTAMP) - INTERVAL 10 MINUTE FROM events)
        |ORDER BY event_type, ws, rnk""".stripMargin
    ) { (s, dir) =>
      val topk = udaf(new graft.functions.TopKAggregator(3))
      val agg = eventsStream(s, dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(topk(col("value"), col("event_id")).as("top"))
        .select(col("window.start").as("ws"), col("event_type"),
          posexplode(col("top")).as(Seq("pos", "r")))
        .select(col("event_type"), col("ws"), (col("pos") + 1).cast("long").as("rnk"),
          col("r._2").as("event_id"), round(col("r._1"), 4).as("value"))
      runToMemory(s, agg).orderBy("event_type", "ws", "rnk")
    },

    // Streaming windowed KMV distinct — the sketch×streaming cell of the
    // matrix: q190's mergeable bottom-64 aggregator runs INSIDE a
    // watermarked window aggregation, so per-open-window state is ≤64
    // hashes (serialized typed-aggregator buffer in the state store),
    // never the window's user list — the same bounded-state discipline as
    // q176's top-k. Because the sketch is order/merge-free set arithmetic,
    // the emitted estimates are deterministic and the batch SQL twin
    // hash-matches exactly (append mode ⇒ only watermark-closed windows
    // emit; q29's gate mirrored in the oracle). At 100 TB: distinct-user
    // dashboards over unbounded streams with O(k) state per window and
    // mergeable spill-over to the batch sketch table (q190) for backfill.
    q("q193_stream_windowed_kmv",
      "watermarked per (event_type, 1h) KMV distinct-user estimates, bounded sketch state")(
      s"""WITH h AS (SELECT DISTINCT event_type,
         |             make_timestamp((CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 3600)
         |                            * 3600 * 1000000) AS ws,
         |             ${graft.functions.PortableHash.md5LongSql("'u:' || user_id")} AS h
         |           FROM events),
         |r AS (SELECT event_type, ws, h,
         |             row_number() OVER (PARTITION BY event_type, ws ORDER BY h) AS rn,
         |             count(*) OVER (PARTITION BY event_type, ws) AS nd
         |      FROM h),
         |g AS (SELECT event_type, ws, max(nd) AS nd,
         |             max(CASE WHEN rn = 64 THEN h END) AS h64
         |      FROM r GROUP BY event_type, ws)
         |SELECT event_type, ws, CAST(least(nd, 64) AS BIGINT) AS n_sketch,
         |       ${graft.functions.PortableHash.kmvEstimateSql("nd", "h64", 64)} AS est_users
         |FROM g
         |WHERE ws + INTERVAL 1 HOUR <=
         |      (SELECT max(ts::TIMESTAMP) - INTERVAL 10 MINUTE FROM events)
         |ORDER BY event_type, ws""".stripMargin
    ) { (s, dir) =>
      import graft.functions.PortableHash.md5Long
      val kmv = udaf(new graft.functions.KmvAggregator(64))
      val agg = eventsStream(s, dir)
        .withWatermark("ts", "10 minutes")
        .select(col("ts"), col("event_type"),
          md5Long(concat(lit("u:"), col("user_id").cast("string"))).as("h"))
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(kmv(col("h")).as("mins"))
        .select(col("event_type"), col("window.start").as("ws"),
          size(col("mins")).cast("long").as("n_sketch"),
          expr(graft.functions.PortableHash.kmvEstimateSql(
            "size(mins)", "element_at(mins, 64)", 64)).as("est_users"))
      runToMemory(s, agg).orderBy("event_type", "ws")
    },

    // Streaming distribution-drift monitor — q229's PSI run as a REAL
    // watermarked streaming execution: the live stream's per-(12 h window,
    // series) value histogram is compared against a STATIC reference
    // distribution (the event_id-parity-0 snapshot, computed batch-side
    // and broadcast), and each closed window emits its PSI. The streaming
    // leg is a plain watermarked windowed count per (window, series, bin)
    // — algebraic state, bounded by windows × series × 10 bins — and the
    // PSI finalize (bin spine, +1 smoothing, ordered-fold sum) runs over
    // the finalized sink, exactly the shape a production monitor has:
    // heavy counting inside the engine, metadata-scale scoring after the
    // watermark seals each window. Append mode ⇒ only windows whose end
    // ≤ max(ts)−10 min surface (q29's finalization rule, the oracle's
    // HAVING twin).
    q("q236_stream_psi",
      "streaming PSI drift per (12h window, event_type) vs a broadcast reference histogram")(
      """WITH cur AS (SELECT make_timestamp((CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 43200)
        |                    * 43200 * 1000000) AS ws,
        |                    event_type, least(CAST(floor(value / 50) AS BIGINT), 9) AS bin,
        |                    count(*) AS k
        |             FROM events GROUP BY ws, event_type, bin),
        |live AS (SELECT DISTINCT ws, event_type FROM cur
        |         WHERE ws + INTERVAL 12 HOUR <=
        |               (SELECT max(ts::TIMESTAMP) - INTERVAL 10 MINUTE FROM events)),
        |refc AS (SELECT event_type, least(CAST(floor(value / 50) AS BIGINT), 9) AS bin,
        |                count(*) AS k
        |         FROM events WHERE event_id % 2 = 0 GROUP BY event_type, bin),
        |bins AS (SELECT unnest(generate_series(0, 9)) AS bin),
        |rf AS (SELECT t.event_type, b.bin, coalesce(refc.k, 0) + 1 AS kr
        |       FROM (SELECT DISTINCT event_type FROM refc) t
        |       CROSS JOIN bins b
        |       LEFT JOIN refc ON refc.event_type = t.event_type AND refc.bin = b.bin),
        |rt AS (SELECT event_type, CAST(sum(kr) AS BIGINT) AS nr FROM rf GROUP BY event_type),
        |cf AS (SELECT live.ws, live.event_type, b.bin, coalesce(cur.k, 0) + 1 AS kc
        |       FROM live CROSS JOIN bins b
        |       LEFT JOIN cur ON cur.ws = live.ws AND cur.event_type = live.event_type
        |                    AND cur.bin = b.bin),
        |ct AS (SELECT ws, event_type, CAST(sum(kc) AS BIGINT) AS nc
        |       FROM cf GROUP BY ws, event_type),
        |tm AS (SELECT cf.ws, cf.event_type, cf.bin, ct.nc, rt.nr,
        |              (CAST(kc AS DOUBLE) / ct.nc - CAST(kr AS DOUBLE) / rt.nr)
        |              * ln((CAST(kc AS DOUBLE) / ct.nc) / (CAST(kr AS DOUBLE) / rt.nr)) AS term
        |       FROM cf JOIN ct ON ct.ws = cf.ws AND ct.event_type = cf.event_type
        |            JOIN rf ON rf.event_type = cf.event_type AND rf.bin = cf.bin
        |            JOIN rt ON rt.event_type = cf.event_type)
        |SELECT ws, event_type, CAST(nc - 10 AS BIGINT) AS n_cur,
        |       round(list_reduce(list(term ORDER BY bin), (a, b) -> a + b), 6) AS psi
        |FROM tm GROUP BY ws, event_type, nc
        |ORDER BY ws, event_type""".stripMargin
    ) { (s, dir) =>
      val binOf = least(floor(col("value") / 50).cast("long"), lit(9L))
      // static reference histogram (+1-smoothed over the full 10-bin
      // spine), batch-side — broadcasts against the finalized windows
      val refc = graft.Tables(s, dir, "events")
        .filter(col("event_id") % 2 === 0)
        .groupBy(col("event_type"), binOf.as("bin")).agg(count(lit(1)).as("k"))
      val rf = refc.select("event_type").distinct()
        .select(col("event_type"), explode(sequence(lit(0L), lit(9L))).as("bin"))
        .join(refc, Seq("event_type", "bin"), "left")
        .select(col("event_type"), col("bin"), (coalesce(col("k"), lit(0L)) + 1).as("kr"))
      val rt = rf.groupBy("event_type").agg(sum(col("kr")).as("nr"))
      // REAL streaming leg: watermarked windowed histogram counts
      val agg = eventsStream(s, dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "12 hours"), col("event_type"), binOf.as("bin"))
        .agg(count(lit(1)).as("k"))
        .select(col("window.start").as("ws"), col("event_type"), col("bin"), col("k"))
      val sink = runToMemory(s, agg)
      // finalize over the sealed windows: spine, smoothing, ordered fold.
      // The spine side re-aliases its columns — both join inputs descend
      // from the same memory-sink view, whose attribute ids would
      // otherwise conflict in the self-join.
      val cf = sink.select(col("ws").as("sws"), col("event_type").as("sty")).distinct()
        .select(col("sws"), col("sty"), explode(sequence(lit(0L), lit(9L))).as("sbin"))
        .join(sink, col("sws") === col("ws") && col("sty") === col("event_type")
          && col("sbin") === col("bin"), "left")
        .select(col("sws").as("ws"), col("sty").as("event_type"), col("sbin").as("bin"),
          (coalesce(col("k"), lit(0L)) + 1).as("kc"))
      val ct = cf.groupBy("ws", "event_type").agg(sum(col("kc")).as("nc"))
      cf.join(ct, Seq("ws", "event_type"))
        .join(broadcast(rf), Seq("event_type", "bin"))
        .join(broadcast(rt), Seq("event_type"))
        .select(col("ws"), col("event_type"), col("bin"), col("nc"), col("nr"),
          ((col("kc").cast("double") / col("nc") - col("kr").cast("double") / col("nr"))
            * log((col("kc").cast("double") / col("nc"))
              / (col("kr").cast("double") / col("nr")))).as("term"))
        .groupBy("ws", "event_type", "nc")
        .agg(sort_array(collect_list(struct(col("bin"), col("term")))).as("tms"))
        .select(col("ws"), col("event_type"), (col("nc") - 10).as("n_cur"),
          round(aggregate(col("tms"), lit(0.0), (a, m) => a + m.getField("term")), 6).as("psi"))
        .orderBy("ws", "event_type")
    },

    // Streaming conversion-funnel state machine — q241's greedy
    // signup→click→purchase chain run per user ON THE STREAM: keyed state
    // is the 3-slot machine (first signup, first click ≥ it, first
    // purchase ≥ that click), advanced in three ordered passes per batch
    // (min-signup, then min-qualifying-click, then min-qualifying-
    // purchase — pass separation makes same-microsecond ties within a
    // batch order-independent, where a single greedy sweep would depend
    // on event_id interleave). Slots only ever FILL, so min-per-slot over
    // the per-batch emissions is replay-stable (q32's sink discipline),
    // and the funnel report is one batch aggregate over final states.
    // State: three longs per user, forever-bounded; the 24 h horizon is
    // applied at report time, exactly like the batch twin.
    q("q243_stream_funnel",
      "streaming per-user funnel state machine (greedy chain, 24h horizon report)")(
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
      import s.implicits._
      val NONE = Long.MinValue
      val ev = eventsStream(s, dir)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tu"),
          col("event_id"))
        .as[(Long, String, Long, Long)]
      val states = ev.groupByKey(_._1)
        .flatMapGroupsWithState[(Long, Long, Long),
          (Long, Option[Long], Option[Long], Option[Long])](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (uid: Long, rows: Iterator[(Long, String, Long, Long)],
           state: GroupState[(Long, Long, Long)]) =>
            var (st, ct, pt) = state.getOption.getOrElse((NONE, NONE, NONE))
            val evs = rows.toSeq.sortBy(r => (r._3, r._4))
            evs.foreach { case (_, et, tu, _) =>
              if (et == "signup" && st == NONE) st = tu
            }
            evs.foreach { case (_, et, tu, _) =>
              if (et == "click" && st != NONE && ct == NONE && tu >= st) ct = tu
            }
            evs.foreach { case (_, et, tu, _) =>
              if (et == "purchase" && ct != NONE && pt == NONE && tu >= ct) pt = tu
            }
            state.update((st, ct, pt))
            def opt(x: Long): Option[Long] = if (x == NONE) None else Some(x)
            Iterator((uid, opt(st), opt(ct), opt(pt)))
        }
        .toDF("user_id", "stu", "ctu", "ptu")
      val sink = runToMemory(s, states)
      val fin = sink.groupBy("user_id")
        .agg(min(col("stu")).as("stu"), min(col("ctu")).as("ctu"), min(col("ptu")).as("ptu"))
        .filter(col("stu").isNotNull)
      val horizon = col("stu") + 86400000000L
      fin.agg(count(lit(1)).as("n_signup"),
        sum(when(col("ctu").isNotNull, 1L).otherwise(0L)).as("n_chain_click"),
        sum(when(col("ptu").isNotNull, 1L).otherwise(0L)).as("n_chain_full"),
        sum(when(col("ctu").isNotNull && col("ctu") <= horizon, 1L).otherwise(0L)).as("n_click24"),
        sum(when(col("ptu").isNotNull && col("ptu") <= horizon, 1L).otherwise(0L)).as("n_purchase24"))
    },

    // Streaming IVF centroid assignment — the vector-index INGEST path run
    // on the stream (new embeddings routed to their coarse cell as they
    // arrive, the maintenance half of q35d/q35e's build-then-search). The
    // 8 seed centroids collapse batch-side into ONE packed array row that
    // broadcasts; each streaming vector computes its argmax-cosine cell as
    // a row-local HOF fold (same sequential zip_with/aggregate dot product
    // the batch path and the DuckDB oracle use — bit-identical doubles),
    // with the argmax as array_max over struct(cs, -cent) so ties break to
    // the smallest centroid exactly like the oracle's rank. STATELESS end
    // to end: no join state, no keyed state, no watermark — at 100 TB the
    // cost is one broadcast of K·dim doubles and a map stage, the same
    // contract as the batch assignment. Oracle = q35d's SQL verbatim.
    q("q169_stream_ivf_assign",
      "streaming IVF centroid assignment (stateless row-local argmax over packed centroids)")(
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
        |n AS (SELECT vec_id, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |s AS (SELECT x.vec_id, c.vec_id AS cent,
        |             list_dot_product(x.e, c.e) / (nx.nrm * nc.nrm) AS cs
        |      FROM v x JOIN n nx ON nx.vec_id = x.vec_id,
        |           v c JOIN n nc ON nc.vec_id = c.vec_id
        |      WHERE c.vec_id < 8)
        |SELECT vec_id, cent, round(cs, 4) + 0 AS cos
        |FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent) AS rn FROM s)
        |WHERE rn = 1 ORDER BY vec_id""".stripMargin
    ) { (s, dir) =>
      val packed = graft.Tables(s, dir, "embeddings")
        .filter(col("vec_id") < 8)
        .select(col("vec_id").as("cent"),
          transform(col("embedding"), _.cast("double")).as("ce"))
        .withColumn("cn",
          sqrt(aggregate(zip_with(col("ce"), col("ce"), _ * _), lit(0.0), _ + _)))
        .agg(sort_array(collect_list(struct(col("cent"), col("ce"), col("cn"))))
          .as("cents"))
      val stream = embeddingsStream(s, dir)
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
        .withColumn("nrm",
          sqrt(aggregate(zip_with(col("e"), col("e"), _ * _), lit(0.0), _ + _)))
      val assigned = stream.join(broadcast(packed))
        .withColumn("scored", expr(
          "transform(cents, c -> struct(" +
            "aggregate(zip_with(e, c.ce, (x, y) -> x * y), 0D, (a, x) -> a + x)" +
            " / (nrm * c.cn) AS cs, -c.cent AS nc))"))
        .withColumn("best", array_max(col("scored")))
        .select(col("vec_id"), (-col("best.nc")).as("cent"),
          round(col("best.cs"), 4).as("cos"))
      runToMemory(s, assigned).orderBy("vec_id")
    },

    // Streaming point-in-time join — q81b's temporal fact-to-dimension
    // lookup with the FACTS ARRIVING AS A STREAM: each purchase event joins
    // the static SCD2 state dimension (batch-derived from the same events
    // table) on the entity key plus validity-interval containment. Stream-
    // static inner joins are STATELESS (no watermark, no join state — the
    // static side is re-planned per micro-batch), so this scales with the
    // dimension build, not the stream: the non-equi validity predicate
    // rides as a residual on the user_id equi-join, and at 100 TB the
    // versions dimension broadcasts (entities × versions, ≪ facts) or
    // co-partitions on the key. Single-file replay ⇒ one batch ⇒ the
    // emission equals the batch PIT join row-for-row.
    q("q166_stream_pit_join",
      "streaming point-in-time join: purchase stream against the static SCD2 dimension")(
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
      val byKey = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val dim = graft.Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(byKey))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .select(col("user_id").as("d_user"), col("event_type").as("state"),
          col("ts").as("valid_from"), lead(col("ts"), 1).over(byKey).as("valid_to"))
      val purchases = eventsStream(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"), col("event_id"))
      val joined = purchases.join(dim,
        col("user_id") === col("d_user")
          && col("pts") >= col("valid_from")
          && (col("valid_to").isNull || col("pts") < col("valid_to")))
        .select(col("event_id"), col("user_id"), col("state"), col("valid_from"))
      runToMemory(s, joined).orderBy("event_id")
    },

    // Stream-maintained exact rolling median — q147's 11-row selection
    // frame as keyed streaming state (RollingMedianProcessor: ordered-tail
    // ListState on the arbitrary-state v2 API, bounded by the frame width).
    // Single-file replay ⇒ one data batch, sorted per key before folding ⇒
    // the emission equals the batch window oracle bit-for-bit (selection,
    // never averaging — no float arithmetic to diverge). Cross-batch
    // continuation (the tail carrying into the next batch's first frames)
    // is locked by StreamRollingMedianSpec. Requires the RocksDB state
    // store provider (restored after the run).
    q("q161_stream_rolling_median",
      "stream-maintained exact rolling median of the last 11 values per event_type")(
      """WITH l AS (
        |  SELECT event_type, ts, event_id, value,
        |         list_sort(list(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |                        ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)) AS vs
        |  FROM events)
        |SELECT event_type, event_id, round(vs[(len(vs) + 1) // 2], 4) AS roll_med
        |FROM l ORDER BY event_type, ts, event_id LIMIT 1000""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val med = eventsStream(s, dir)
          .select(col("event_type"), unix_micros(col("ts")).as("t"),
            col("event_id"), col("value"))
          .as[(String, Long, Long, Double)]
          .groupByKey(_._1)
          .transformWithState(new RollingMedianProcessor, TimeMode.None(), OutputMode.Append())
          .toDF("event_type", "t", "event_id", "med")
        runToMemory(s, med)
          .orderBy("event_type", "t", "event_id")
          .select(col("event_type"), col("event_id"),
            round(col("med"), 4).as("roll_med"))
          .limit(1000)
      } finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    },

    // Per-user event-type counters in MAP state — the MapState leg of the
    // v2 API (ValueState q32-successor, ListState q161, timers q180; this
    // completes the quartet). MapState reads/writes only the entries a
    // batch touches — O(types touched) not O(types held) state IO, the
    // reason it exists over a ValueState[Map]. Counts are monotone per
    // (user, type), so the q32/q149 max-reduction sink keeps the latest
    // emission under multi-batch replay. Eviction at scale: the processor
    // takes a TTLConfig (the production deployment sets ~24h, bounding the
    // map at |keys active in the window| instead of all-time
    // |users|·|types| — StateTtlSpec proves cross-batch expiry AND
    // pre-expiry equivalence). The REPLAY here must keep TimeMode.None/no
    // TTL: TTL requires ProcessingTime mode, whose shouldRunAnotherBatch
    // returns true unconditionally (TransformWithStateExecBase, Spark
    // 4.1), so a bounded drain — AvailableNow included — never terminates
    // (measured: 5000+ empty commits before kill).
    q("q181_stream_mapstate_counts",
      "per-user per-event-type running counts in MapState (v2 API, TTL-capable)")(
      """SELECT user_id, event_type, count(*) AS n
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val cnt = eventsStream(s, dir)
          .select(col("user_id"), col("event_type")).as[(Long, String)]
          .groupByKey(_._1)
          .transformWithState(new TypeCountProcessor(TTLConfig.NONE),
            TimeMode.None(), OutputMode.Append())
          .toDF("user_id", "event_type", "n_run")
        runToMemory(s, cnt)
          .groupBy("user_id", "event_type")
          .agg(max(col("n_run")).as("n"))
          .orderBy("user_id", "event_type")
      } finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    },

    // Timer-driven sessionization — the EVENT-TIME-TIMER leg of
    // transformWithState (q32/q161 cover ValueState/ListState; this
    // completes the v2 surface): per-user 30-minute-gap sessions held as
    // pending islands in ListState and emitted ONLY from
    // handleExpiredTimer once the watermark passes last-event + gap — no
    // inline emission, so the output is exactly the provably-closed
    // sessions (the built-in session_window q28b re-derived on raw
    // timers). Timer resolution is ms: a close at last+gap µs registers at
    // floor(·/1000)+1 ms, and the final watermark is floor(max_us/1000) −
    // 10min — the oracle gates on the identical integer arithmetic, so
    // the emitted set matches exactly. State per user = open islands only;
    // timers and state are both watermark-bounded.
    q("q180_stream_timer_sessions",
      "timer-closed 30m-gap sessions per user (event-time timers, v2 API)")(
      """WITH e AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS t FROM events),
        |m AS (SELECT user_id, t,
        |             CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800000000
        |                  THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        |s AS (SELECT user_id, t,
        |             sum(brk) OVER (PARTITION BY user_id ORDER BY t) AS sid
        |      FROM m),
        |g AS (SELECT user_id, min(t) AS start_us, max(t) AS end_us,
        |             count(*) AS n
        |      FROM s GROUP BY user_id, sid),
        |wm AS (SELECT (max(t) // 1000) - 600000 AS wm_ms FROM e)
        |SELECT user_id, start_us, end_us, n FROM g CROSS JOIN wm
        |WHERE (end_us + 1800000000) // 1000 + 1 <= wm_ms
        |ORDER BY user_id, start_us""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val sess = eventsStream(s, dir)
          .withWatermark("ts", "10 minutes")
          .select(col("user_id"), unix_micros(col("ts")).as("t"))
          .as[(Long, Long)]
          .groupByKey(_._1)
          .transformWithState(new SessionTimerProcessor(1800000000L),
            TimeMode.EventTime(), OutputMode.Append())
          .toDF("user_id", "start_us", "end_us", "n")
        runToMemory(s, sess).orderBy("user_id", "start_us")
      } finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    },

    // Gap + HARD-CAP sessionization — q180 with the second close condition
    // every production sessionizer needs (force-close sessions that
    // outlive the cap even while events keep arriving inside the gap).
    // Gap/cap are fixture-tuned (12h gap vs the ~7h median per-user
    // inter-event spacing, 36h cap) so BOTH close conditions shape the
    // output — q180's 30m gap closes almost every session singleton. The
    // cap makes the fold ORDER-SENSITIVE, so CappedSessionProcessor keeps
    // raw pending event times instead of mergeable islands and emits the
    // provably-stable closed prefix from timers: a session is final once
    // the watermark passes min(last+gap, start+cap) — the oracle's
    // recursive CTE replays the identical sequential fold over the full
    // data and gates on the identical integer close arithmetic. State per
    // user = open-tail events only (≤ one cap span + gap horizon).
    q("q225_stream_capped_sessions",
      "12h-gap sessions force-split at a 36h duration cap (timer-driven, v2 API)")(
      """WITH RECURSIVE e AS (
        |  SELECT user_id, epoch_us(ts::TIMESTAMP) AS t,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |f AS (
        |  SELECT user_id, rn, t, t AS sess_start FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.rn, e.t,
        |         CASE WHEN e.t - f.t <= 43200000000
        |                   AND e.t - f.sess_start <= 129600000000
        |              THEN f.sess_start ELSE e.t END
        |  FROM f JOIN e ON e.user_id = f.user_id AND e.rn = f.rn + 1),
        |g AS (SELECT user_id, sess_start AS start_us, max(t) AS end_us,
        |             count(*) AS n
        |      FROM f GROUP BY user_id, sess_start),
        |wm AS (SELECT (max(t) // 1000) - 600000 AS wm_ms FROM e)
        |SELECT user_id, start_us, end_us, n FROM g CROSS JOIN wm
        |WHERE least(end_us + 43200000000, start_us + 129600000000) // 1000 + 1 <= wm_ms
        |ORDER BY user_id, start_us""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val sess = eventsStream(s, dir)
          .withWatermark("ts", "10 minutes")
          .select(col("user_id"), unix_micros(col("ts")).as("t"))
          .as[(Long, Long)]
          .groupByKey(_._1)
          .transformWithState(new CappedSessionProcessor(43200000000L, 129600000000L),
            TimeMode.EventTime(), OutputMode.Append())
          .toDF("user_id", "start_us", "end_us", "n")
        runToMemory(s, sess).orderBy("user_id", "start_us")
      } finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    },

    // Streaming anomaly monitor — q250's trailing-24h 3σ detector with
    // the hourly counting done by a REAL watermarked streaming execution
    // (q236's monitor shape): the stream emits each (1 h window, series)
    // count once its window seals, and the sqrt-free integer z²>9 scoring
    // runs over the sealed sink — heavy counting in the engine, metadata-
    // scale scoring after the watermark. Only sealed hours are scored
    // (window end ≤ max event time − 10 min, the oracle's WHERE twin), so
    // the report is a prefix of the batch twin's and replay-stable: a
    // sealed hour's count can never change. Scoring is byte-identical to
    // q250 — both call the same finalize.
    q("q253_stream_anomaly",
      "streaming trailing-24h 3-sigma anomaly report over watermark-sealed hourly counts")(
      """WITH mx AS (SELECT max(ts::TIMESTAMP) AS mt FROM events),
        |b AS (
        |  SELECT event_type, (CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 3600) AS hb,
        |         count(*) AS y
        |  FROM events GROUP BY event_type, hb),
        |sb AS (SELECT b.event_type, b.hb, b.y FROM b CROSS JOIN mx
        |       WHERE make_timestamp(hb * 3600 * 1000000) + INTERVAL 1 HOUR
        |             <= mt - INTERVAL 10 MINUTE),
        |rr AS (SELECT CAST(min(hb) AS BIGINT) AS lo, CAST(max(hb) AS BIGINT) AS hi FROM sb),
        |spine AS (SELECT t.event_type, g.hb
        |          FROM (SELECT DISTINCT event_type FROM sb) t
        |          CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM rr), (SELECT hi FROM rr))) AS hb) g),
        |s AS (SELECT spine.event_type,
        |             spine.hb - (SELECT lo FROM rr) + 1 AS idx,
        |             coalesce(sb.y, 0) AS y
        |      FROM spine LEFT JOIN sb ON sb.event_type = spine.event_type AND sb.hb = spine.hb),
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
      val cnt = eventsStream(s, dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("y"))
        .select(col("event_type"),
          unix_micros(col("window.start")).as("wus"), col("y"))
      val sink = runToMemory(s, cnt)
      graft.operators.AnalyticsQueries.anomalyReport(
        sink.select(col("event_type"), expr("wus div 3600000000").as("hb"), col("y")))
    },

    // Streaming KS drift monitor — q257's EXACT two-sample test run per
    // sealed 12 h window against a broadcast reference distribution
    // (q236's monitor shape with q257's integer verdict): the stream
    // counts a deci-quantized value histogram per (window, bin) — state
    // bounded by open windows × value bins, never rows — and once the
    // watermark seals a window, its empirical CDF walks the union value
    // spine against the reference's: D_cross = max |c_ref·N_w − c_w·N_ref|
    // with the α=0.05 verdict cleared to DECIMAL. ~5% of stationary
    // windows SHOULD fire at α=0.05 — the flagged count is itself the
    // monitor's calibration check, and every per-window D is hash-exact
    // against the oracle. Cumulative windows partition by ws over BINS
    // (q194's discipline).
    q("q259_stream_ks_drift",
      "streaming per-window exact KS vs broadcast reference, integer verdicts")(
      """WITH ref AS (SELECT CAST(round(value * 10) AS BIGINT) AS v10,
        |                    CAST(count(*) AS BIGINT) AS kr
        |             FROM events WHERE event_id % 2 = 0 GROUP BY v10),
        |nr AS (SELECT CAST(sum(kr) AS BIGINT) AS n1 FROM ref),
        |cur AS (SELECT make_timestamp((CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 43200)
        |                 * 43200 * 1000000) AS ws,
        |               CAST(round(value * 10) AS BIGINT) AS v10, CAST(count(*) AS BIGINT) AS k
        |        FROM events GROUP BY ws, v10),
        |live AS (SELECT DISTINCT ws FROM cur
        |         WHERE ws + INTERVAL 12 HOUR <=
        |               (SELECT max(ts::TIMESTAMP) - INTERVAL 10 MINUTE FROM events)),
        |spine AS (SELECT live.ws, u.v10
        |          FROM live CROSS JOIN (SELECT v10 FROM ref UNION SELECT v10 FROM cur) u),
        |g AS (SELECT spine.ws, spine.v10, coalesce(ref.kr, 0) AS kr, coalesce(cur.k, 0) AS k
        |      FROM spine LEFT JOIN ref ON ref.v10 = spine.v10
        |           LEFT JOIN cur ON cur.ws = spine.ws AND cur.v10 = spine.v10),
        |cum AS (SELECT ws, v10,
        |               CAST(sum(kr) OVER win AS BIGINT) AS cr,
        |               CAST(sum(k) OVER win AS BIGINT) AS cw
        |        FROM g WINDOW win AS (PARTITION BY ws ORDER BY v10 ROWS UNBOUNDED PRECEDING)),
        |n2 AS (SELECT ws, max(cw) AS n2 FROM cum GROUP BY ws),
        |d AS (SELECT cum.ws, CAST(max(abs(cum.cr * n2.n2 - cum.cw * nr.n1)) AS BIGINT) AS d_cross
        |      FROM cum JOIN n2 ON n2.ws = cum.ws CROSS JOIN nr GROUP BY cum.ws)
        |SELECT d.ws, nr.n1, n2.n2, d.d_cross,
        |       CAST(d_cross * 1000 // (nr.n1 * n2.n2) AS BIGINT) AS d_milli,
        |       CAST(CASE WHEN 10000 * CAST(d_cross AS HUGEINT) * d_cross
        |                  > 18442 * CAST(nr.n1 AS HUGEINT) * n2.n2 * (nr.n1 + n2.n2)
        |            THEN 1 ELSE 0 END AS BIGINT) AS significant
        |FROM d JOIN n2 ON n2.ws = d.ws CROSS JOIN nr ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val v10 = round(col("value") * 10).cast("long")
      // static reference histogram, batch-side — broadcasts against the
      // sealed windows
      val ref = graft.Tables(s, dir, "events")
        .filter(col("event_id") % 2 === 0)
        .groupBy(v10.as("v10")).agg(count(lit(1)).as("kr"))
        .cache() // spine union + the cum join
      val nr = ref.agg(sum(col("kr")).as("n1"))
      // REAL streaming leg: watermarked per-(12h window, deci-bin) counts
      val agg = eventsStream(s, dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "12 hours"), v10.as("v10"))
        .agg(count(lit(1)).as("k"))
        .select(col("window.start").as("ws"), col("v10"), col("k"))
      val sink = runToMemory(s, agg)
      // finalize over the sealed sink: union value spine, one cum window
      // per (ws) over bins, cross-multiplied CDF deviation
      val spine = sink.select(col("ws").as("sws")).distinct()
        .crossJoin(ref.select(col("v10").as("sv"))
          .union(sink.select(col("v10").as("sv"))).distinct())
      val g = spine
        .join(ref, col("sv") === col("v10"), "left").drop("v10")
        .join(sink, col("sws") === col("ws") && col("sv") === sink("v10"), "left")
        .select(col("sws").as("ws"), col("sv").as("vb"),
          coalesce(col("kr"), lit(0L)).as("kr"), coalesce(col("k"), lit(0L)).as("k"))
      val win = org.apache.spark.sql.expressions.Window.partitionBy("ws").orderBy("vb")
        .rowsBetween(Long.MinValue, 0)
      val cum = g.select(col("ws"), col("vb"),
          sum(col("kr")).over(win).as("cr"), sum(col("k")).over(win).as("cw"))
        .cache() // per-window totals + the max-deviation scan
      val n2 = cum.groupBy("ws").agg(max(col("cw")).as("n2"))
      cum.join(n2, Seq("ws")).crossJoin(broadcast(nr))
        .groupBy("ws", "n1", "n2")
        .agg(max(abs(col("cr") * col("n2") - col("cw") * col("n1"))).as("d_cross"))
        .select(col("ws"), col("n1"), col("n2"), col("d_cross"),
          expr("CAST(d_cross * 1000 div (n1 * n2) AS BIGINT)").as("d_milli"),
          when(lit(10000).cast(d38) * col("d_cross").cast(d38) * col("d_cross").cast(d38)
            > lit(18442).cast(d38) * col("n1").cast(d38) * col("n2").cast(d38)
              * (col("n1") + col("n2")).cast(d38), 1L)
            .otherwise(0L).as("significant"))
        .orderBy("ws")
    },

    // Rotating-Bloom streaming dedup — the BOUNDED-STATE answer to the
    // "keyed dedup state grows with key cardinality forever" risk that
    // q181's TTL closed for counters: instead of one state entry per
    // seen key (q62), each shard keeps TWO fixed 4096-bit Bloom
    // generations; an arrival is admitted iff neither generation knows
    // its hash, and when the live generation reaches capacity C the old
    // one is dropped — O(shards · mBits) state TOTAL, forever, at the
    // documented price: no false re-admissions within the last ~C..2C
    // inserts per shard (the guaranteed dedup horizon), arbitrary
    // re-admissions beyond it, and a tiny fp chance of dropping a
    // unique. The stream replays every doc plus a LATE re-arrival of
    // every third doc; at sf0.01 the horizon covers the whole corpus
    // (exact behavior — zero re-admissions), at sf0.1 rotation kicks in
    // and only horizon-aged re-arrivals sneak back. Arrival order inside
    // a shard-batch is made deterministic by folding in arrival-key
    // order (the group iterator is sorted — bounded by shard size here;
    // a 100 TB deployment sizes shard count ∝ throughput and uses
    // ListState to avoid the sort buffer). ORACLE (round 7): the fold is
    // fully deterministic — single-file replay ⇒ one micro-batch ⇒ the
    // per-shard processing order is exactly arrival-key order — and the
    // bit positions are md5-portable, so DuckDB replays the identical
    // state machine with a recursive CTE: one iteration per per-shard
    // arrival rank, the two generations carried as bit-POSITION sets
    // (list_has_all ⇔ the word-array probe — same admissions, different
    // representation). Only the q40-style throughput row and the three
    // approx-by-nature sketches remain rows-only after this.
    q("q279_stream_bloom_dedup",
      "bounded-state streaming dedup: two rotating Bloom generations per shard")({
      val Shards = 8; val Cap = 256; val MBits = 4096
      import graft.functions.PortableHash.md5LongSql
      val psSql = (0 until 4).map(j =>
        s"${md5LongSql(s"'q279:$j:' || h")} % $MBits").mkString("[", ", ", "]")
      s"""WITH RECURSIVE
         |base AS (SELECT doc_id, ${md5LongSql("text")} AS h FROM documents),
         |arr AS MATERIALIZED (
         |  SELECT ak, is_re, shard, $psSql AS ps,
         |         row_number() OVER (PARTITION BY shard ORDER BY ak) AS rk
         |  FROM (SELECT doc_id AS ak, h, CAST(0 AS BIGINT) AS is_re,
         |               h % $Shards AS shard FROM base
         |        UNION ALL
         |        SELECT doc_id + 100000, h, CAST(1 AS BIGINT), h % $Shards
         |        FROM base WHERE doc_id % 3 = 0)),
         |sim AS (
         |  SELECT shard, CAST(0 AS BIGINT) AS rk, []::BIGINT[] AS g0,
         |         []::BIGINT[] AS g1, CAST(0 AS BIGINT) AS c0,
         |         NULL::BIGINT AS ak, NULL::BIGINT AS is_re, false AS admitted
         |  FROM (SELECT DISTINCT shard FROM arr)
         |  UNION ALL
         |  SELECT shard, rk,
         |         CASE WHEN NOT admitted THEN g0
         |              WHEN c0 + 1 >= $Cap THEN []::BIGINT[]
         |              ELSE list_distinct(g0 || ps) END,
         |         CASE WHEN admitted AND c0 + 1 >= $Cap
         |              THEN list_distinct(g0 || ps) ELSE g1 END,
         |         CASE WHEN NOT admitted THEN c0
         |              WHEN c0 + 1 >= $Cap THEN CAST(0 AS BIGINT)
         |              ELSE c0 + 1 END,
         |         ak, is_re, admitted
         |  FROM (SELECT a.shard, a.rk, s.g0, s.g1, s.c0, a.ak, a.is_re, a.ps,
         |               NOT (list_has_all(s.g0, a.ps) OR
         |                    list_has_all(s.g1, a.ps)) AS admitted
         |        FROM sim s JOIN arr a ON a.shard = s.shard AND a.rk = s.rk + 1))
         |SELECT shard, ak, is_re FROM sim WHERE admitted
         |ORDER BY shard, ak""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val Shards = 8; val Cap = 256; val MBits = 4096; val K = 4
      import graft.functions.PortableHash
      // md5-portable bit positions (round 7, replacing splitmix64): both
      // engines derive position j of hash h as md5Long("q279:j:" || h) mod
      // mBits — the same 60-bit/15-hex discipline every other hash site uses
      def posOf(h: Long): Array[Int] =
        Array.tabulate(K)(j => (PortableHash.md5LongScala(s"q279:$j:$h") % MBits).toInt)
      def has(g: Array[Long], ps: Array[Int]): Boolean = {
        var j = 0
        while (j < ps.length) {
          if ((g(ps(j) >>> 6) & (1L << (ps(j) & 63))) == 0L) return false
          j += 1
        }
        true
      }
      val base = docsStream(s, dir)
        .select(col("doc_id"), PortableHash.md5Long(col("text")).as("h"))
      val arrivals = base.select(col("doc_id").as("ak"), col("h"), lit(0L).as("is_re"))
        .unionByName(base.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 100000L).as("ak"), col("h"), lit(1L).as("is_re")))
        .withColumn("shard", pmod(col("h"), lit(Shards.toLong)))
      type St = (Array[Long], Array[Long], Long)
      implicit val stEnc: org.apache.spark.sql.Encoder[St] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Array[Long], Long)]()
      val accepted = arrivals.as[(Long, Long, Long, Long)]
        .groupByKey(_._4)
        .flatMapGroupsWithState[St, (Long, Long, Long, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (shard: Long, rows: Iterator[(Long, Long, Long, Long)], state: GroupState[St]) =>
            var (g0, g1, c0) = state.getOption
              .getOrElse((new Array[Long](MBits / 64), new Array[Long](MBits / 64), 0L))
            val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
            // deterministic fold: arrival-key order within the micro-batch
            rows.toSeq.sortBy(_._1).foreach { case (ak, h, isRe, sh) =>
              val ps = posOf(h)
              val seen = has(g0, ps) || has(g1, ps)
              if (!seen) {
                out += ((sh, ak, h, isRe))
                var j = 0
                while (j < K) {
                  val p = ps(j)
                  g0(p >>> 6) |= 1L << (p & 63); j += 1
                }
                c0 += 1
                if (c0 >= Cap) { g1 = g0; g0 = new Array[Long](MBits / 64); c0 = 0 }
              }
            }
            state.update((g0, g1, c0))
            out.iterator
        }
        .toDF("shard", "ak", "h", "is_re")
      runToMemory(s, accepted)
        .select(col("shard"), col("ak"), col("is_re"))
        .orderBy("shard", "ak")
    },

    // Multi-source watermark law: two watermarked branches UNIONed before
    // a windowed aggregation. Branch A is the live event stream; branch B
    // replays the error events DELAYED two hours (ts − 2h — a lagging
    // upstream). Each branch carries its own EventTimeWatermark node, and
    // Spark's global watermark is the MIN across them (default
    // multipleWatermarkPolicy) — so append mode flushes only windows
    // closed by the SLOWER branch: every emitted window end ≤
    // max(shifted B ts) − 10min, hours beyond that stay open even though
    // branch A has long passed them. That min() is THE correctness
    // property that keeps a 100 TB multi-source pipeline from emitting
    // windows a lagging source could still fill; the oracle's HAVING
    // gate is the same law in batch form (LEAST over both branch maxima).
    q("q331_stream_union_watermark",
      "union of two watermarked streams: the lagging branch gates the append flush")(
      """WITH a AS (SELECT ts::TIMESTAMP AS t, 'live' AS src FROM events
        |           WHERE event_type <> 'error'),
        |b AS (SELECT ts::TIMESTAMP - INTERVAL 2 HOUR AS t, 'delayed' AS src FROM events
        |      WHERE event_type = 'error'),
        |u AS (SELECT * FROM a UNION ALL SELECT * FROM b),
        |wm AS (SELECT LEAST((SELECT max(t) FROM a), (SELECT max(t) FROM b))
        |              - INTERVAL 10 MINUTE AS w)
        |SELECT make_timestamp((CAST(floor(epoch(t)) AS BIGINT) // 3600) * 3600 * 1000000) AS ws,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(*) FILTER (WHERE src = 'live') AS BIGINT) AS n_live,
        |       CAST(count(*) FILTER (WHERE src = 'delayed') AS BIGINT) AS n_delayed
        |FROM u CROSS JOIN wm
        |GROUP BY ws HAVING ws + INTERVAL 1 HOUR <= (SELECT w FROM wm)
        |ORDER BY ws""".stripMargin
    ) { (s, dir) =>
      withShufflePartitions(s, 8) {
        val a = eventsStream(s, dir).filter(col("event_type") =!= "error")
          .select(col("ts").as("t"), lit("live").as("src"))
          .withWatermark("t", "10 minutes")
        val b = eventsStream(s, dir).filter(col("event_type") === "error")
          .select((col("ts") - expr("INTERVAL 2 HOURS")).as("t"), lit("delayed").as("src"))
          .withWatermark("t", "10 minutes")
        val agg = a.unionByName(b)
          .groupBy(window(col("t"), "1 hour"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("src") === "live", 1L).otherwise(0L)).as("n_live"),
            sum(when(col("src") === "delayed", 1L).otherwise(0L)).as("n_delayed"))
          .select(col("window.start").as("ws"), col("n"), col("n_live"), col("n_delayed"))
        runToMemory(s, agg).orderBy("ws")
      }
    }
  )

  /** documents replayed as a stream (single-file fixture ⇒ one data batch,
    * deterministic). */
  private def docsStream(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    s.readStream.schema(schema).option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
  }
}
