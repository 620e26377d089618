package graft.operators

import graft.Registry.{Q, q}
import graft.Tables
import graft.functions.PortableHash.{kmvEstimateSql, md5Long, md5LongSql}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experimentation & statistical-inference pack, split out of
  * [[AnalyticsQueries]] at the family boundary (round 7, registry
  * navigability): A/B harnesses and their guards (SRM, CUPED, sequential
  * SPRT, power/allocation), survival estimators, rank/association tests,
  * calibration, resampling (bootstrap/jackknife/permutation), causal
  * readouts (diff-in-diff, attribution, off-policy), anonymity audits,
  * and the small in-engine learners (stump, ALS rank-1, boosting).
  *
  * Same determinism contract as every registry file (FIXTURES.md):
  * full-tuple ORDER BY, round(·,4) doubles, BIGINT casts at DuckDB
  * widening points, µs integer time arithmetic, DECIMAL(38) clearing for
  * significance gates so no float boundary can flip a verdict.
  */
object StatsQueries {

  private def us(c: Column): Column = unix_micros(c)

  val all: Seq[Q] = Seq(
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

    // Banded matrix profile (Yeh et al. 2016, "Matrix Profile I", public
    // ICDM — the motif/discord primitive behind most modern time-series
    // mining). Series = the global hourly event-count vector; subsequence
    // length m=8, band |i−j| ∈ [8, 168] (trivial-match exclusion up to one
    // week — the banded variant is the honest 100 TB shape: the full
    // profile is quadratic in series length, the band is linear). Distance
    // is the UNNORMALIZED integer Euclidean d² = Σ(xᵢ₊ₖ−xⱼ₊ₖ)² — exact
    // BIGINT end-to-end where z-normalization would drag every comparison
    // through float means/stds (variant documented; on a count series the
    // unnormalized profile is the standard Poisson-burst view). Windows are
    // built WITHOUT any global sort or gap-fill: each hour fans to the ≤8
    // window-starts it participates in (explode), one groupBy assembles
    // 8-arrays (HAVING n=8 drops ragged tails at gaps), and the band join
    // is an explode-δ equi-join — the whole op is bounded by wall-clock
    // hours (87,600 in a decade), never by event volume; the only
    // data-sized pass is the first grouped count, which partial-aggregates.
    // Output: top-10 motif pairs (lowest profile) + top-3 discords
    // (highest nearest-neighbor distance), total-ordered by (dist, hour).
    q("q369_matrix_profile",
      "banded integer matrix profile over hourly counts: top motifs + discords")(
      """WITH c AS (SELECT (CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 3600) AS hb,
        |                  CAST(count(*) AS BIGINT) AS x
        |           FROM events GROUP BY hb),
        |e AS (SELECT c.hb - k.k AS i, k.k AS k, c.x
        |      FROM c CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS k) k),
        |w AS (SELECT i, list(x ORDER BY k) AS a
        |      FROM e GROUP BY i HAVING count(*) = 8),
        |p AS (SELECT w1.i AS i, w1.i + d.d AS j, w1.a AS a
        |      FROM w w1 CROSS JOIN (SELECT unnest(generate_series(8, 168)) AS d
        |                            UNION ALL
        |                            SELECT unnest(generate_series(-168, -8)) AS d) d),
        |dd AS (SELECT p.i, p.j,
        |              CAST(list_sum(list_transform(generate_series(1, 8),
        |                t -> (p.a[t] - w2.a[t]) * (p.a[t] - w2.a[t]))) AS BIGINT) AS dist
        |       FROM p JOIN w w2 ON w2.i = p.j),
        |prof AS (SELECT i, j, dist,
        |                row_number() OVER (PARTITION BY i ORDER BY dist, j) AS rn
        |         FROM dd)
        |SELECT arm, i AS i_hour, j AS nn_hour, dist FROM (
        |  SELECT 'motif' AS arm, i, j, dist FROM prof WHERE rn = 1
        |  ORDER BY dist, i LIMIT 10) m
        |UNION ALL
        |SELECT arm, i AS i_hour, j AS nn_hour, dist FROM (
        |  SELECT 'discord' AS arm, i, j, dist FROM prof WHERE rn = 1
        |  ORDER BY dist DESC, i LIMIT 3) x
        |ORDER BY arm, dist, i_hour""".stripMargin
    ) { (s, dir) =>
      val c = Tables(s, dir, "events")
        .selectExpr("cast(ts as bigint) div 3600 AS hb")
        .groupBy("hb").agg(count(lit(1)).as("x"))
      val e = c.select(explode(sequence(lit(0L), lit(7L))).as("k"), col("hb"), col("x"))
        .select((col("hb") - col("k")).as("i"), col("k"), col("x"))
      val w = e.groupBy("i")
        .agg(transform(sort_array(collect_list(struct(col("k"), col("x")))),
          m => m.getField("x")).as("a"), count(lit(1)).as("n"))
        .filter(col("n") === 8).drop("n")
      // both band directions (r8 advice): each window's nearest neighbor
      // sits on EITHER side — forward-only would inflate discords and
      // silently drop windows near the series end
      val p = w.select(col("i"), col("a"),
          explode(concat(sequence(lit(8L), lit(168L)),
            sequence(lit(-168L), lit(-8L)))).as("d"))
        .select(col("i"), (col("i") + col("d")).as("j"), col("a"))
      val dd = p.alias("p")
        .join(w.alias("w2"), col("w2.i") === col("p.j"))
        .select(col("p.i").as("i"), col("p.j").as("j"),
          expr("aggregate(zip_with(p.a, w2.a, (x, y) -> (x - y) * (x - y)), " +
            "0L, (acc, v) -> acc + v)").as("dist"))
      val prof = dd.groupBy("i").agg(min(struct(col("dist"), col("j"))).as("m"))
        .select(col("i"), col("m.j").as("j"), col("m.dist").as("dist"))
        .cache() // two top-k consumers
      val motifs = prof.orderBy(col("dist"), col("i")).limit(10)
        .select(lit("motif").as("arm"), col("i"), col("j"), col("dist"))
      val discords = prof.orderBy(col("dist").desc, col("i")).limit(3)
        .select(lit("discord").as("arm"), col("i"), col("j"), col("dist"))
      motifs.unionByName(discords)
        .select(col("arm"), col("i").as("i_hour"), col("j").as("nn_hour"), col("dist"))
        .orderBy("arm", "dist", "i_hour")
    },
  )
}
