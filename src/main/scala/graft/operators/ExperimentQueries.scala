package graft.operators

import graft.Registry.{Q, q}
import graft.Tables
import graft.functions.PortableHash.{md5Long, md5LongSql}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Causal readouts & in-engine learners, split out of [[StatsQueries]] at
  * the family boundary (round 7, registry navigability): the estimators a
  * product experiment SHIPS decisions on — diff-in-diff, NDCG, Markov and
  * time-decay attribution, off-policy evaluation, bootstrap A/B deltas,
  * CUPED, SRM gates, Qini, SPRT, the composed q300 experiment readout —
  * plus the anonymity-repair pass and the small exact learners (decision
  * stump, rank-1 ALS, gradient boosting, Mahalanobis outliers).
  *
  * Same determinism contract as every registry file (FIXTURES.md):
  * full-tuple ORDER BY, round(·,4) doubles, BIGINT casts at DuckDB
  * widening points, µs integer time arithmetic, DECIMAL(38) clearing for
  * significance gates so no float boundary can flip a verdict.
  */
object ExperimentQueries {

  private def us(c: Column): Column = unix_micros(c)

  val all: Seq[Q] = Seq(
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
      // round-11 (guide §2.4): all3 is ONE row, but each of the eight
      // report legs below references it — un-truncated, every leg re-ran
      // the srm/theta/adj aggregates over the cached user frame plus their
      // broadcast builds (93 Spark jobs, a ~30-concurrent-broadcast storm
      // measured in the profile). Eagerly materializing the 1-row hub makes
      // each leg a checkpoint read: 93 → ~15 jobs, 5.3 → ~1.5 s.
      val all3 = agg3.crossJoin(broadcast(srm)).crossJoin(broadcast(th))
        .localCheckpoint(true)
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
    },

    // Bradley–Terry preference-strength fitting (Bradley & Terry 1952
    // Biometrika; MM updates per Zermelo 1929 / Hunter 2004 — all public)
    // — the model behind pairwise-preference leaderboards (chatbot-arena
    // style) and reward-model eval. Comparisons: within each (user, hour)
    // cell, every cross-type event pair is a duel won by the higher value
    // (exact ties skipped) — bounded per cell, linear overall. The MM
    // fixpoint p_i ← W_i / Σ_j n_ij/(p_i+p_j), renormalized to Σp = 1,
    // runs 8 rounds INSIDE one fold over a single collected row (the
    // q367/q371 discipline): duels as a both-directions (a, b, n) array,
    // win totals as a map, state as a sorted array<struct<t, p>> — the
    // per-item denominator is a filtered inner fold over the ≤K² duel
    // array, so iteration is metadata after the grouped counts. The
    // oracle replays the identical updates as unrolled MATERIALIZED CTE
    // rounds over the K-row table. Item count K = |event_type| (5):
    // state is O(K²), never data-sized.
    q("q372_bradley_terry",
      "Bradley-Terry MM fit (8 rounds) over value-duels between event types")(
      {
        val rounds = (1 to 8).map { t =>
          s"""r$t AS MATERIALIZED (
             |  SELECT nd.a AS i, max(w.w) / sum(nd.n / (p.p + q.p)) AS praw
             |  FROM nd JOIN p${t - 1} p ON p.i = nd.a
             |          JOIN p${t - 1} q ON q.i = nd.b
             |          JOIN wins w ON w.i = nd.a
             |  GROUP BY nd.a),
             |p$t AS MATERIALIZED (
             |  SELECT i, praw / (SELECT sum(praw) FROM r$t) AS p FROM r$t)""".stripMargin
        }.mkString(",\n")
        s"""WITH e AS (SELECT user_id,
           |                  (CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 3600) AS hb,
           |                  event_type, value
           |           FROM events),
           |duel AS (SELECT CASE WHEN a.value > b.value THEN a.event_type
           |                     ELSE b.event_type END AS win,
           |                CASE WHEN a.value > b.value THEN b.event_type
           |                     ELSE a.event_type END AS lose
           |         FROM e a JOIN e b
           |           ON a.user_id = b.user_id AND a.hb = b.hb
           |          AND a.event_type < b.event_type
           |         WHERE a.value <> b.value),
           |wmat AS (SELECT win, lose, CAST(count(*) AS BIGINT) AS n
           |         FROM duel GROUP BY win, lose),
           |nd AS MATERIALIZED (
           |  SELECT a, b, CAST(sum(n) AS BIGINT) AS n FROM (
           |    SELECT win AS a, lose AS b, n FROM wmat
           |    UNION ALL SELECT lose AS a, win AS b, n FROM wmat)
           |  GROUP BY a, b),
           |wins AS MATERIALIZED (
           |  SELECT a AS i, CAST(coalesce(sum(w.n), 0) AS BIGINT) AS w
           |  FROM (SELECT DISTINCT a FROM nd) t
           |  LEFT JOIN wmat w ON w.win = t.a GROUP BY t.a),
           |p0 AS (SELECT i, 1.0 / (SELECT count(*) FROM wins) AS p FROM wins),
           |$rounds,
           |comps AS (SELECT a AS i, CAST(sum(n) AS BIGINT) AS n_comps
           |          FROM nd GROUP BY a)
           |SELECT wins.i AS event_type, wins.w AS n_wins, comps.n_comps,
           |       round(p8.p, 4) AS bt_p
           |FROM wins JOIN comps ON comps.i = wins.i JOIN p8 ON p8.i = wins.i
           |ORDER BY event_type""".stripMargin
      }
    ) { (s, dir) =>
      val e = Tables(s, dir, "events").selectExpr("user_id",
        "cast(ts as bigint) div 3600 AS hb", "event_type", "value")
      val duel = e.alias("a").join(e.alias("b"),
          col("a.user_id") === col("b.user_id") && col("a.hb") === col("b.hb") &&
            col("a.event_type") < col("b.event_type"))
        .filter(col("a.value") =!= col("b.value"))
        .select(
          when(col("a.value") > col("b.value"), col("a.event_type"))
            .otherwise(col("b.event_type")).as("win"),
          when(col("a.value") > col("b.value"), col("b.event_type"))
            .otherwise(col("a.event_type")).as("lose"))
      val wmat = duel.groupBy("win", "lose").agg(count(lit(1)).as("n")).cache()
      val nd = wmat.select(col("win").as("a"), col("lose").as("b"), col("n"))
        .unionByName(wmat.select(col("lose").as("a"), col("win").as("b"), col("n")))
        .groupBy("a", "b").agg(sum(col("n")).as("n"))
        .cache() // duels leg + wins/comps legs
      val wins = nd.select(col("a")).distinct().alias("t")
        .join(wmat.groupBy("win").agg(sum(col("n")).as("w")).alias("w"),
          col("w.win") === col("t.a"), "left")
        .select(col("t.a").as("i"), coalesce(col("w.w"), lit(0L)).as("w"))
      val comps = nd.groupBy(col("a").as("i")).agg(sum(col("n")).as("n_comps"))
      // one row: sorted duel array + win map + sorted item list
      val one = nd.agg(
        sort_array(collect_list(struct(col("a"), col("b"), col("n")))).as("duels"))
        .crossJoin(broadcast(wins.agg(
          map_from_entries(collect_list(struct(col("i"), col("w")))).as("wm"),
          sort_array(collect_list(col("i"))).as("items"))))
      val fold = """aggregate(sequence(1, 8),
        transform(items, t -> named_struct('t', t, 'p', 1.0d / size(items))),
        (st, it) -> transform(st, s ->
          named_struct('t', s.t, 'p',
            (cast(element_at(wm, s.t) as double) /
             aggregate(filter(duels, d -> d.a = s.t), 0.0d, (acc, d) -> acc +
               d.n / (s.p + element_at(filter(st, o -> o.t = d.b), 1).p))) /
            aggregate(st, 0.0d, (acc2, s2) -> acc2 +
              cast(element_at(wm, s2.t) as double) /
              aggregate(filter(duels, d2 -> d2.a = s2.t), 0.0d, (a3, d2) -> a3 +
                d2.n / (s2.p + element_at(filter(st, o2 -> o2.t = d2.b), 1).p))))))"""
      val fitted = one.withColumn("ps", expr(fold))
        .select(explode(col("ps")).as("x"))
        .select(col("x.t").as("i"), round(col("x.p"), 4).as("bt_p"))
      wins.alias("w").join(comps.alias("c"), col("c.i") === col("w.i"))
        .join(fitted.alias("f"), col("f.i") === col("w.i"))
        .select(col("w.i").as("event_type"), col("w.w").as("n_wins"),
          col("c.n_comps"), col("f.bt_p"))
        .orderBy("event_type")
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
