package graft.operators

import graft.Registry.{Q, q}
import graft.Tables
import graft.functions.PortableHash._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data pipeline operators beyond dedup/ANN (north-star additions):
  * benchmark decontamination, Gopher-style repetition filtering, regex
  * entity/PII scrubbing, and sequence packing. All deterministic — every
  * query oracle-checked in DuckDB.
  *
  * Scale notes (100 TB): decontamination joins on a 60-bit shingle hash
  * (8-byte shuffle keys, benchmark side broadcast — the benchmark set is
  * small by construction); repetition metrics are per-doc explode +
  * partial-aggregated counts; packing is a per-shard (per-lang) running
  * sum — no global ordering anywhere.
  */
object PipelineQueries {

  /** Shared q165/q364 oracle CTE chain: dirty-copy synthesis, two blocking
    * passes, candidate union, integer agreement scoring — ends defining
    * `scored` with BOTH sides' fields carried so q364's survivorship can
    * merge per field. One definition keeps the resolution and the merge in
    * lockstep (the kmvEstimateSql lesson). */
  private val erScoredCteSql: String =
    """WITH dirty AS (
      |  SELECT c_custkey + 1000000 AS rid,
      |         CASE WHEN c_custkey % 7 = 0
      |              THEN substr(c_name, 1, 3) || substr(c_name, 5) ELSE c_name END AS name,
      |         CASE WHEN c_custkey % 31 = 0 THEN (c_nationkey + 1) % 25
      |              ELSE c_nationkey END AS nation,
      |         CAST(round(c_acctbal * 100) AS BIGINT) + (c_custkey % 5 - 2) AS cents,
      |         c_mktsegment AS seg
      |  FROM customer),
      |clean AS (SELECT c_custkey AS cid, c_name AS name, c_nationkey AS nation,
      |                 CAST(round(c_acctbal * 100) AS BIGINT) AS cents, c_mktsegment AS seg
      |          FROM customer),
      |ba AS (SELECT c.cid, d.rid FROM clean c JOIN dirty d
      |       ON c.nation = d.nation AND c.cents // 5000 = d.cents // 5000),
      |bb AS (SELECT c.cid, d.rid FROM clean c JOIN dirty d
      |       ON substr(c.name, greatest(1, length(c.name) - 5))
      |        = substr(d.name, greatest(1, length(d.name) - 5))),
      |cand AS (SELECT DISTINCT cid, rid FROM (SELECT * FROM ba UNION ALL SELECT * FROM bb)),
      |scored AS (
      |  SELECT c.cid, d.rid, c.name AS cn, d.name AS dn,
      |         c.nation AS cnat, d.nation AS dnat,
      |         c.cents AS cc, d.cents AS dc, c.seg AS cseg, d.seg AS dseg,
      |         (CASE WHEN c.name = d.name THEN 3 ELSE 0 END
      |          + CASE WHEN abs(c.cents - d.cents) <= 2 THEN 2 ELSE 0 END
      |          + CASE WHEN c.nation = d.nation THEN 1 ELSE 0 END
      |          + CASE WHEN c.seg = d.seg THEN 1 ELSE 0 END) AS score
      |  FROM cand JOIN clean c USING (cid) JOIN dirty d USING (rid))""".stripMargin

  /** Spark twin of [[erScoredCteSql]]: the scored candidate frame with both
    * sides' fields, shared by q165 (decisions) and q364 (survivorship). */
  private def erScored(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val cust = Tables(s, dir, "customer")
    val clean = cust.select(col("c_custkey").as("cid"), col("c_name").as("name"),
      col("c_nationkey").cast("long").as("nation"),
      expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"),
      col("c_mktsegment").as("seg")).cache() // two blocking passes + scoring
    val dirty = cust.select((col("c_custkey") + 1000000L).as("rid"),
      when(col("c_custkey") % 7 === 0,
        concat(expr("substr(c_name, 1, 3)"), expr("substr(c_name, 5)")))
        .otherwise(col("c_name")).as("name"),
      when(col("c_custkey") % 31 === 0, (col("c_nationkey") + 1) % 25)
        .otherwise(col("c_nationkey")).cast("long").as("nation"),
      (expr("CAST(round(c_acctbal * 100) AS BIGINT)") + col("c_custkey") % 5 - 2).as("cents"),
      col("c_mktsegment").as("seg")).cache()
    val ba = clean.select(col("cid"), col("nation"), expr("cents div 5000").as("bin"))
      .join(dirty.select(col("rid"), col("nation"), expr("cents div 5000").as("bin")),
        Seq("nation", "bin"))
      .select("cid", "rid")
    // suffix start is clamped to 1: Spark counts a NEGATIVE start from
    // the string END while DuckDB clamps to the front, so names shorter
    // than 6 chars would silently produce different candidate sets —
    // greatest(1, …) keeps the position positive, where the engines agree
    val bb = clean.select(col("cid"),
        expr("substr(name, greatest(1, length(name) - 5))").as("sfx"))
      .join(dirty.select(col("rid"),
        expr("substr(name, greatest(1, length(name) - 5))").as("sfx")), "sfx")
      .select("cid", "rid")
    ba.unionAll(bb).distinct()
      .join(clean.select(col("cid"), col("name").as("cn"), col("nation").as("cnat"),
        col("cents").as("cc"), col("seg").as("cseg")), "cid")
      .join(dirty.select(col("rid"), col("name").as("dn"), col("nation").as("dnat"),
        col("cents").as("dc"), col("seg").as("dseg")), "rid")
      .withColumn("score",
        when(col("cn") === col("dn"), 3).otherwise(0)
          + when(abs(col("cc") - col("dc")) <= 2, 2).otherwise(0)
          + when(col("cnat") === col("dnat"), 1).otherwise(0)
          + when(col("cseg") === col("dseg"), 1).otherwise(0))
  }

  /** Shared q364b/q382 capped-blocking CTE chain (the corpus-invariant ER
    * candidates): dirty-copy synthesis, TWO hash-rank-capped blocking
    * passes (K=3 per block side, salts rotate per pass), candidate union,
    * integer agreement scoring — ends defining `scored` with both sides'
    * fields. The q189b discipline applied to blocking: candidates ≤ 2·K·n. */
  private val erCappedScoredCteSql: String =
    s"""dirty AS (
       |  SELECT c_custkey + 1000000 AS rid,
       |         CASE WHEN c_custkey % 7 = 0
       |              THEN substr(c_name, 1, 3) || substr(c_name, 5) ELSE c_name END AS name,
       |         CASE WHEN c_custkey % 31 = 0 THEN (c_nationkey + 1) % 25
       |              ELSE c_nationkey END AS nation,
       |         CAST(round(c_acctbal * 100) AS BIGINT) + (c_custkey % 5 - 2) AS cents,
       |         c_mktsegment AS seg
       |  FROM customer),
       |clean AS (SELECT c_custkey AS cid, c_name AS name, c_nationkey AS nation,
       |                 CAST(round(c_acctbal * 100) AS BIGINT) AS cents, c_mktsegment AS seg
       |          FROM customer),
       |ra AS (SELECT cid, nation, cents // 5000 AS bin,
       |              ROW_NUMBER() OVER (PARTITION BY nation, cents // 5000
       |                ORDER BY ${md5LongSql("'ca:' || cid")}, cid) AS rk FROM clean),
       |dda AS (SELECT rid, nation, cents // 5000 AS bin,
       |               ROW_NUMBER() OVER (PARTITION BY nation, cents // 5000
       |                 ORDER BY ${md5LongSql("'da:' || rid")}, rid) AS rk FROM dirty),
       |ba AS (SELECT r.cid, d.rid FROM ra r JOIN dda d
       |       ON r.nation = d.nation AND r.bin = d.bin
       |       WHERE r.rk <= 3 AND d.rk <= 3),
       |rb AS (SELECT cid, sfx,
       |              ROW_NUMBER() OVER (PARTITION BY sfx
       |                ORDER BY ${md5LongSql("'cb:' || cid")}, cid) AS rk
       |       FROM (SELECT cid, substr(name, greatest(1, length(name) - 5)) AS sfx
       |             FROM clean)),
       |ddb AS (SELECT rid, sfx,
       |               ROW_NUMBER() OVER (PARTITION BY sfx
       |                 ORDER BY ${md5LongSql("'db:' || rid")}, rid) AS rk
       |        FROM (SELECT rid, substr(name, greatest(1, length(name) - 5)) AS sfx
       |              FROM dirty)),
       |bb AS (SELECT r.cid, d.rid FROM rb r JOIN ddb d ON r.sfx = d.sfx
       |       WHERE r.rk <= 3 AND d.rk <= 3),
       |cand AS (SELECT DISTINCT cid, rid FROM (SELECT * FROM ba UNION ALL SELECT * FROM bb)),
       |scored AS (
       |  SELECT c.cid, d.rid, c.name AS cn, d.name AS dn,
       |         c.nation AS cnat, c.cents AS cc, d.cents AS dc, c.seg AS cseg,
       |         d.nation AS dnat, d.seg AS dseg,
       |         (CASE WHEN c.name = d.name THEN 3 ELSE 0 END
       |          + CASE WHEN abs(c.cents - d.cents) <= 2 THEN 2 ELSE 0 END
       |          + CASE WHEN c.nation = d.nation THEN 1 ELSE 0 END
       |          + CASE WHEN c.seg = d.seg THEN 1 ELSE 0 END) AS score
       |  FROM cand JOIN clean c USING (cid) JOIN dirty d USING (rid))""".stripMargin

  /** Spark twin of [[erCappedScoredCteSql]]: the hash-rank-capped scored
    * candidate frame (both sides' fields carried), shared by q364b's
    * per-pair survivorship and q382's per-cluster golden entity. */
  private def erCappedScored(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val K = 3
    val cust = Tables(s, dir, "customer")
    val clean = cust.select(col("c_custkey").as("cid"), col("c_name").as("name"),
      col("c_nationkey").cast("long").as("nation"),
      expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"),
      col("c_mktsegment").as("seg")).cache() // both blocking passes + scoring
    val dirty = cust.select((col("c_custkey") + 1000000L).as("rid"),
      when(col("c_custkey") % 7 === 0,
        concat(expr("substr(c_name, 1, 3)"), expr("substr(c_name, 5)")))
        .otherwise(col("c_name")).as("name"),
      when(col("c_custkey") % 31 === 0, (col("c_nationkey") + 1) % 25)
        .otherwise(col("c_nationkey")).cast("long").as("nation"),
      (expr("CAST(round(c_acctbal * 100) AS BIGINT)") + col("c_custkey") % 5 - 2).as("cents"),
      col("c_mktsegment").as("seg")).cache()
    def cappedA(df: DataFrame, id: String, salt: String): DataFrame =
      df.select(col(id), col("nation"), expr("cents div 5000").as("bin"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("nation", "bin")
            .orderBy(md5Long(concat(lit(salt), col(id).cast("string"))), col(id))))
        .filter(col("rk") <= K).drop("rk")
    def cappedB(df: DataFrame, id: String, salt: String): DataFrame =
      df.select(col(id), expr("substr(name, greatest(1, length(name) - 5))").as("sfx"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("sfx")
            .orderBy(md5Long(concat(lit(salt), col(id).cast("string"))), col(id))))
        .filter(col("rk") <= K).drop("rk")
    val ba = cappedA(clean, "cid", "ca:").join(cappedA(dirty, "rid", "da:"),
      Seq("nation", "bin")).select("cid", "rid")
    val bb = cappedB(clean, "cid", "cb:").join(cappedB(dirty, "rid", "db:"), "sfx")
      .select("cid", "rid")
    ba.unionAll(bb).distinct()
      .join(clean.select(col("cid"), col("name").as("cn"), col("nation").as("cnat"),
        col("cents").as("cc"), col("seg").as("cseg")), "cid")
      .join(dirty.select(col("rid"), col("name").as("dn"),
        col("nation").as("dnat"), col("cents").as("dc"), col("seg").as("dseg")), "rid")
      .withColumn("score",
        when(col("cn") === col("dn"), 3).otherwise(0)
          + when(abs(col("cc") - col("dc")) <= 2, 2).otherwise(0)
          + when(col("cnat") === col("dnat"), 1).otherwise(0)
          + when(col("cseg") === col("dseg"), 1).otherwise(0))
  }

  /** Entity-mask regex: the corpus' "named entities". Word-boundary anchored
    * so substrings of other tokens survive. Same RE2/Java-compatible syntax
    * in both engines. */
  private val entPat = "\\b(customer|supplier|nation|region)\\b"
  /** PII patterns (emails, long digit runs). The synthetic corpus contains
    * neither — the oracle proves the zero-count on every row, which pins the
    * pattern semantics cross-engine without relying on fixture content. */
  private val emailPat = "[a-z0-9._]+@[a-z0-9.]+"

  /** Shared q197/q200/q201 oracle feature CTEs: µ-unit centered signals
    * (token count, punctuation density), the q36c gate label, and (when
    * `withSplit`) the 5-way md5 split key. Ends defining `d` — q201 redefines
    * its own train/holdout views on top of `f` instead. */
  private def logregFeatureCtesSql(withSplit: Boolean): String = {
    val base =
      s"""m AS (SELECT doc_id, len(str_split(text, ' ')) AS n_tok,
         |            length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS n_punct,
         |            n_chars FROM documents),
         |f AS (SELECT CAST(n_tok * 10000 - 500000 AS BIGINT) AS x1,
         |             CAST(n_punct * 1000000 // n_chars - 30000 AS BIGINT) AS x2,
         |             CAST(CASE WHEN least(n_tok / 100.0, 1.0) * (1.0 - n_punct * 1.0 / n_chars) >= 0.5
         |                       THEN 1000000 ELSE 0 END AS BIGINT) AS y,
         |             ${md5LongSql("'s:' || doc_id")} % 5 AS sp
         |      FROM m)""".stripMargin
    if (withSplit) base
    else base + ",\nd AS (SELECT x1, x2, y FROM f)"
  }

  /** Spark twin of [[logregFeatureCtesSql]]'s `f`. */
  private def logregFeatures(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.Tables.fanout(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tok"),
        (length(col("text"))
          - length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""))).as("n_punct"),
        col("n_chars"))
      .select(expr("CAST(n_tok * 10000 - 500000 AS BIGINT)").as("x1"),
        expr("CAST(n_punct * 1000000 div n_chars - 30000 AS BIGINT)").as("x2"),
        expr("CAST(CASE WHEN least(n_tok / 100.0, 1.0) * (1.0 - n_punct * 1.0 / n_chars) >= 0.5 " +
          "THEN 1000000 ELSE 0 END AS BIGINT)").as("y"),
        (md5Long(concat(lit("s:"), col("doc_id").cast("string"))) % 5).as("sp"))

  /** The hard-sigmoid score expression with the weights baked in as BIGINT
    * literals (shared by the gradient scans and the final evaluations). */
  private def sigSql(w0: Long, w1: Long, w2: Long): String =
    s"least(greatest(500000 + ((CAST($w0 AS BIGINT)*1000000 + CAST($w1 AS BIGINT)*x1 " +
      s"+ CAST($w2 AS BIGINT)*x2) div 1000000), 0), 1000000)"

  /** 4 full-batch GD epochs over `d` (must expose x1/x2/y; caller caches).
    * Driver-held O(d)=3 model state; one partial-aggregated scan per epoch.
    * Scala Long `/` truncates toward zero — identical to Spark `div` and
    * DuckDB `//`. */
  private def trainLogreg(d: DataFrame, lr: Long = 2L): (Long, Long, Long) = {
    var (w0, w1, w2) = (0L, 0L, 0L)
    for (_ <- 1 to 4) {
      val sig = sigSql(w0, w1, w2)
      val r = d.select(
        sum(expr(s"y - $sig")).as("e0"),
        sum(expr(s"(y - $sig) * x1")).as("e1"),
        sum(expr(s"(y - $sig) * x2")).as("e2"),
        count(lit(1)).as("n")).head() // 1-row gradient frame
      val n = r.getLong(3)
      w0 += lr * (r.getLong(0) / n)
      w1 += lr * (r.getLong(1) / n / 1000000L)
      w2 += lr * (r.getLong(2) / n / 1000000L)
    }
    (w0, w1, w2)
  }

  /** q197's oracle: one full-batch GD epoch as a CTE pair — gradient sums
    * over `d` with the previous weights (`prev`), then the weight update.
    * min() over the cross-joined scalars ≙ "the" constant; `//` truncates
    * toward zero exactly like Spark `div` and Scala Long division. */
  private def logregStepSql(prev: String, g: String, w: String,
      lr: Long = 2L, d: String = "d", nn: String = "nn"): String =
    s"""$g AS (SELECT min(w0) AS w0, min(w1) AS w1, min(w2) AS w2, min(n) AS n,
       |  sum(y - s) AS e0, sum((y - s) * x1) AS e1, sum((y - s) * x2) AS e2
       |  FROM (SELECT y, x1, x2, w0, w1, w2, n,
       |        least(greatest(500000 + ((w0*1000000 + w1*x1 + w2*x2) // 1000000), 0), 1000000) AS s
       |        FROM $d, $prev, $nn)),
       |$w AS (SELECT w0 + $lr*(e0 // n) AS w0,
       |               w1 + $lr*(e1 // n // 1000000) AS w1,
       |               w2 + $lr*(e2 // n // 1000000) AS w2 FROM $g)""".stripMargin
  private val numPat = "[0-9]{3,}"

  /** q74's 16-bit × 2 z-order interleave as DuckDB SQL (declared before
    * `all` — object vals initialize in order). Max shift is 31 < the 63-bit
    * checked-shift ceiling. */
  private val zorderTermsSql: String = (0 until 16).map { i =>
    s"(((l_partkey >> $i) & 1) << ${2 * i}) + (((l_suppkey >> $i) & 1) << ${2 * i + 1})"
  }.mkString(" + ")

  /** q160's oracle: the Hilbert xy2d walk unrolled as 16 chained CTE
    * stages (one per bit level, s = 32768 … 1), each carrying the rotated
    * frame forward as (x{i}, y{i}, d{i}) — index-suffixed names, never
    * reusing a column name inside a stage (lateral alias resolution is
    * engine-specific). An independent derivation of the index the codegen
    * [[graft.expressions.HilbertIndex]] expression computes in one loop. */
  private val hilbertStagesSql: String = {
    val n = 65536L
    val stages = (0 until 16).map { i =>
      val s = n >> (i + 1)
      s"""h${i + 1} AS (SELECT l_partkey, l_suppkey,
         |  d$i + CAST(${s * s} AS BIGINT)
         |        * xor(3 * (CASE WHEN (x$i & $s) > 0 THEN 1 ELSE 0 END),
         |              (CASE WHEN (y$i & $s) > 0 THEN 1 ELSE 0 END)) AS d${i + 1},
         |  CASE WHEN (y$i & $s) = 0
         |       THEN (CASE WHEN (x$i & $s) > 0 THEN ${n - 1} - y$i ELSE y$i END)
         |       ELSE x$i END AS x${i + 1},
         |  CASE WHEN (y$i & $s) = 0
         |       THEN (CASE WHEN (x$i & $s) > 0 THEN ${n - 1} - x$i ELSE x$i END)
         |       ELSE y$i END AS y${i + 1}
         |FROM h$i)""".stripMargin
    }
    s"""h0 AS (SELECT l_partkey, l_suppkey,
       |  CAST(l_partkey & 65535 AS BIGINT) AS x0,
       |  CAST(l_suppkey & 65535 AS BIGINT) AS y0,
       |  CAST(0 AS BIGINT) AS d0 FROM lineitem),
       |${stages.mkString(",\n")}""".stripMargin
  }

  /** q61c core over any (doc_id, text) frame: per shingle level L, the
    * maximal runs of L-gram positions whose shingle occurs in ≥2 docs
    * (q61b's islands machinery, once per level). Factored out so
    * DupSpanLadderSpec can drive it over seeded corpora with known
    * duplicate structure. */
  private[operators] def dupSpanLadder(
      docs: DataFrame, levels: Seq[Int]): DataFrame = {
    val t = docs.select(col("doc_id"), tokens(col("text")).as("w"))
    levels.map { l =>
      val ph = t.filter(size(col("w")) >= l)
        .select(col("doc_id"),
          posexplode(transform(shingles(col("w"), l), g => md5Long(g))))
        .select(col("doc_id"), col("pos").cast("long").as("p"), col("col").as("h"))
        .cache() // doc-frequency agg + join back (harness clears)
      val dfreq = ph.groupBy("h").agg(countDistinct(col("doc_id")).as("nd"))
      val w = Window.partitionBy("doc_id").orderBy("p")
      ph.join(dfreq.filter(col("nd") >= 2), "h")
        .select(col("doc_id"), col("p"))
        .withColumn("isl", col("p") - row_number().over(w))
        .groupBy("doc_id", "isl")
        .agg(min(col("p")).as("s"), max(col("p")).as("e"), count(lit(1)).as("ns"))
        .select(col("doc_id"), lit(l.toLong).as("lvl"),
          col("s").cast("long").as("span_start"),
          (col("e") + l - col("s")).cast("long").as("span_tokens"),
          col("ns").cast("long").as("n_shingles"))
    }.reduce(_.unionAll(_))
      .orderBy("doc_id", "lvl", "span_start")
  }

  /** q61c's oracle: the same per-level islands, one CTE chain per level,
    * UNION ALL'd. */
  private def dupSpanLadderSql(levels: Seq[Int]): String = {
    val ctes = levels.map { l =>
      s"""ph$l AS (SELECT doc_id, p, ${md5LongSql("g")} AS h FROM
         |          (SELECT doc_id, unnest(generate_series(0, len(w) - $l)) AS p,
         |                  unnest(${shinglesSql("w", l)}) AS g
         |           FROM t WHERE len(w) >= $l)),
         |df$l AS (SELECT h, count(DISTINCT doc_id) AS nd FROM ph$l GROUP BY h),
         |sp$l AS (SELECT doc_id, isl, min(p) AS s, max(p) AS e, count(*) AS ns
         |         FROM (SELECT doc_id, p,
         |                      p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS isl
         |               FROM ph$l JOIN df$l USING (h) WHERE nd >= 2)
         |         GROUP BY doc_id, isl)""".stripMargin
    }.mkString(",\n")
    val legs = levels.map { l =>
      s"""SELECT doc_id, CAST($l AS BIGINT) AS lvl, CAST(s AS BIGINT) AS span_start,
         |       CAST(e + $l - s AS BIGINT) AS span_tokens, CAST(ns AS BIGINT) AS n_shingles
         |FROM sp$l""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
       |$ctes
       |$legs
       |ORDER BY doc_id, lvl, span_start""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // Benchmark decontamination: score each training doc by the FRACTION
    // of its distinct 3-gram shingles that also appear in the held-out
    // test split (q50's content-hash split: b >= 90 is test, b < 80 is
    // train), and flag the top quintile for removal. A quantile gate is
    // the only scale-invariant choice on this corpus — its tiny shared
    // vocabulary makes absolute overlap grow with benchmark size (real
    // corpora gate on any 8-13-gram collision instead). Join key is the
    // 60-bit shingle hash, not the shingle text — 8-byte shuffle rows; the
    // test side is distinct-reduced and broadcast (benchmark sets are tiny
    // relative to the corpus at any scale). The exact discrete-quantile
    // cutoff is selected by a two-pass distributed rank (DistributedRank:
    // range partitions + broadcast offsets — no single-partition sort) and
    // broadcast back as one scalar; at 100 TB approx_percentile is the
    // one-pass alternative, same downstream gate.
    q("q52_decontaminate", "flag the top-quintile test-split 3-gram overlap fraction")(
      s"""WITH b AS (SELECT doc_id, ${md5LongSql("text")} % 100 AS b,
         |                  str_split(text, ' ') AS w FROM documents),
         |sh AS (SELECT doc_id, b, list_transform(list_distinct(${shinglesSql("w", 3)}),
         |                            g -> ${md5LongSql("g")}) AS s FROM b),
         |trd AS (SELECT doc_id, len(s) AS n_sh FROM sh WHERE b < 80),
         |tr AS (SELECT doc_id, unnest(s) AS h FROM sh WHERE b < 80),
         |te AS (SELECT DISTINCT unnest(s) AS h FROM sh WHERE b >= 90),
         |ov AS (SELECT tr.doc_id, count(*) AS n_shared
         |       FROM tr JOIN te USING (h) GROUP BY tr.doc_id),
         |j AS (SELECT d.doc_id, COALESCE(ov.n_shared, 0) AS n_shared,
         |             COALESCE(ov.n_shared, 0) * 1.0 / d.n_sh AS ratio
         |      FROM trd d LEFT JOIN ov USING (doc_id)),
         |rk AS (SELECT *, row_number() OVER (ORDER BY ratio, doc_id) AS rn,
         |              count(*) OVER () AS n FROM j),
         |fl AS (SELECT *, max(CASE WHEN rn = (4 * n + 4) // 5 THEN ratio END)
         |                   OVER () AS cutoff FROM rk)
         |SELECT doc_id, n_shared, round(ratio, 4) AS overlap_frac,
         |       ratio >= cutoff AS contaminated
         |FROM fl ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val b = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), (md5Long(col("text")) % 100).as("b"),
          tokens(col("text")).as("w"))
      // three consumers (trd, tr, te) — without the cache the fanout +
      // md5 + shingle chain is re-executed per consumer; hashing inside the
      // cached array means the cache holds 8-byte longs, not shingle text,
      // and tr/te don't re-run md5 per exploded row
      val sh = b.select(col("doc_id"), col("b"),
        transform(array_distinct(shingles(col("w"), 3)),
          g => md5Long(g)).as("s")).cache()
      val trd = sh.filter(col("b") < 80)
        .select(col("doc_id"), size(col("s")).as("n_sh"))
      val tr = sh.filter(col("b") < 80)
        .select(col("doc_id"), explode(col("s")).as("h"))
      val te = sh.filter(col("b") >= 90)
        .select(explode(col("s")).as("h")).distinct()
      // per-doc arrays are distinct and te is distinct, so each tr row
      // matches ≤1 te row — plain count(*) ≡ count(DISTINCT h), cheaper
      val ov = tr.join(broadcast(te), "h")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      // cached: three consumers (the count scalar, the rank pass for the
      // cutoff, and the final gate projection)
      val j = trd.join(ov, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          (coalesce(col("n_shared"), lit(0L)) * lit(1.0) / col("n_sh")).as("ratio"))
        .cache()
      // the exact quintile cutoff comes from a two-pass DISTRIBUTED rank
      // (range partitions + broadcast offsets — DistributedRank), never a
      // single-partition WindowExec sort, and flows back as ONE broadcast
      // scalar; the output path itself touches no window at all
      val tot = j.agg(count(lit(1)).as("n"))
      val rk = DistributedRank.withRowNumber(j, Seq(col("ratio"), col("doc_id")), "rn")
      val cut = rk.crossJoin(broadcast(tot))
        .filter(col("rn") === expr("(4 * n + 4) div 5"))
        .select(col("ratio").as("cutoff"))
      j.crossJoin(broadcast(cut))
        .select(col("doc_id"), col("n_shared"),
          round(col("ratio"), 4).as("overlap_frac"),
          (col("ratio") >= col("cutoff")).as("contaminated"))
        .orderBy("doc_id")
    },

    // Gopher-style repetition filtering: distinct-token ratio, fraction of
    // tokens covered by the single most frequent bigram, and the fraction of
    // 3-gram positions that are duplicates. Two explode→count aggregations
    // joined back per doc — partial aggregation map-side, 8-byte-hash group
    // keys nowhere (group key is (doc_id, gram) but counts reduce before the
    // join). `keep` applies fixed thresholds the way a real pipeline gates.
    q("q53_repetition", "Gopher repetition metrics per doc + keep gate")(
      s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
         |bi AS (SELECT doc_id, max(c) AS top_bi, sum(c) AS n_bi
         |       FROM (SELECT doc_id, s, count(*) AS c
         |             FROM (SELECT doc_id, unnest(${shinglesSql("w", 2)}) AS s FROM t)
         |             GROUP BY doc_id, s)
         |       GROUP BY doc_id),
         |tri AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_tri,
         |               sum(c) AS n_tri
         |        FROM (SELECT doc_id, s, count(*) AS c
         |              FROM (SELECT doc_id, unnest(${shinglesSql("w", 3)}) AS s FROM t)
         |              GROUP BY doc_id, s)
         |        GROUP BY doc_id)
         |SELECT t.doc_id,
         |       CAST(len(w) AS BIGINT) AS n_tok,
         |       round(len(list_distinct(w)) * 1.0 / len(w), 4) AS distinct_ratio,
         |       round(2.0 * top_bi / len(w), 4) AS top_bigram_frac,
         |       round(dup_tri * 1.0 / n_tri, 4) AS dup_trigram_frac,
         |       (len(list_distinct(w)) * 1.0 / len(w) >= 0.45
         |        AND 2.0 * top_bi / len(w) <= 0.12) AS keep
         |FROM t JOIN bi USING (doc_id) JOIN tri USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val t = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("w"))
      val bi = t.select(col("doc_id"), explode(shingles(col("w"), 2)).as("s"))
        .groupBy("doc_id", "s").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max(col("c")).as("top_bi"), sum(col("c")).as("n_bi"))
      val tri = t.select(col("doc_id"), explode(shingles(col("w"), 3)).as("s"))
        .groupBy("doc_id", "s").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_tri"),
          sum(col("c")).as("n_tri"))
      t.join(bi, "doc_id").join(tri, "doc_id")
        .select(col("doc_id"),
          size(col("w")).cast("long").as("n_tok"),
          round(size(array_distinct(col("w"))) * lit(1.0) / size(col("w")), 4)
            .as("distinct_ratio"),
          round(lit(2.0) * col("top_bi") / size(col("w")), 4).as("top_bigram_frac"),
          round(col("dup_tri") * lit(1.0) / col("n_tri"), 4).as("dup_trigram_frac"),
          (size(array_distinct(col("w"))) * lit(1.0) / size(col("w")) >= 0.45
            && lit(2.0) * col("top_bi") / size(col("w")) <= 0.12).as("keep"))
        .orderBy("doc_id")
    },

    // Regex entity/PII scrubbing: mask entity terms, emails, and digit runs;
    // emit per-pattern hit counts and the scrubbed text's fingerprint (the
    // scrubbed text itself round-trips but would bloat the diff). Pure
    // regexp_replace/extract_all — codegen'd, embarrassingly parallel.
    q("q54_text_scrub", "regex entity/PII masking: hit counts + scrubbed fingerprint")(
      s"""SELECT doc_id,
         |       CAST(len(regexp_extract_all(text, '$entPat')) AS BIGINT) AS n_ent,
         |       CAST(len(regexp_extract_all(text, '$emailPat')) AS BIGINT) AS n_email,
         |       CAST(len(regexp_extract_all(text, '$numPat')) AS BIGINT) AS n_num,
         |       md5(regexp_replace(regexp_replace(regexp_replace(text,
         |            '$entPat', '<ENT>', 'g'), '$emailPat', '<EMAIL>', 'g'),
         |            '$numPat', '<NUM>', 'g')) AS scrubbed_fp
         |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(entPat), lit(0))).cast("long").as("n_ent"),
        size(regexp_extract_all(col("text"), lit(emailPat), lit(0))).cast("long").as("n_email"),
        size(regexp_extract_all(col("text"), lit(numPat), lit(0))).cast("long").as("n_num"),
        md5(regexp_replace(regexp_replace(regexp_replace(col("text"),
          entPat, "<ENT>"), emailPat, "<EMAIL>"), numPat, "<NUM>")).as("scrubbed_fp"))
        .orderBy("doc_id")
    },

    // Incremental corpus dedup — the append-time operator: an arriving
    // batch (doc_id >= 400) dedupes against the standing corpus's content
    // -hash index (doc_id < 400) AND within itself (keep lowest doc_id per
    // hash). One left-anti join on the 128-bit hash + one keep-first
    // window: at 100 TB the index side is a bucketed hash table (16 B
    // rows), the batch side is small — the join broadcasts the batch's
    // hashes or probes the bucketed index shuffle-free; no text moves.
    q("q57_incremental_dedup", "dedup an arriving batch against the standing corpus hash index")(
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
      val n = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"),
          md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("h"))
      val w = Window.partitionBy(col("h")).orderBy(col("doc_id"))
      val batchKeep = n.filter(col("doc_id") >= 400)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("doc_id", "h")
      val index = n.filter(col("doc_id") < 400).select("h")
      batchKeep.join(index, Seq("h"), "left_anti")
        .select("doc_id", "h").orderBy("doc_id")
    },

    // Per-domain quantile gating — keep docs at or above their language's
    // median length. The threshold is the DISCRETE median (the value at
    // row ceil(n/2) in (n_chars, doc_id) order), so both engines pick the
    // same integer — no interpolation float to diverge on. Per-shard
    // window + broadcast threshold join: the per-domain thresholds frame
    // is |domains| rows at any scale.
    q("q58_quantile_gate", "keep docs >= their lang's discrete median n_chars")(
      """WITH r AS (SELECT doc_id, lang, n_chars,
        |                  row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
        |                  count(*) OVER (PARTITION BY lang) AS cnt
        |           FROM documents),
        |med AS (SELECT lang, n_chars AS med FROM r WHERE rn = (cnt + 1) // 2)
        |SELECT d.doc_id, d.lang, d.n_chars, m.med
        |FROM documents d JOIN med m USING (lang)
        |WHERE d.n_chars >= m.med
        |ORDER BY d.doc_id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
      val wc = Window.partitionBy(col("lang"))
      val med = docs
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(wc))
        .filter(col("rn") === expr("(cnt + 1) div 2"))
        .select(col("lang"), col("n_chars").as("med"))
      docs.join(broadcast(med), "lang")
        .filter(col("n_chars") >= col("med"))
        .select("doc_id", "lang", "n_chars", "med")
        .orderBy("doc_id")
    },

    // Sequence packing: assign docs to fixed-budget (512-token) training
    // sequences by running token count, packed per-lang shard in doc_id
    // order. A per-shard window cumsum — partitions sort locally; no global
    // ordering, which is what makes packing feasible at 100 TB (each shard
    // packs independently, exactly how real pipelines shard by
    // source/lang/date).
    q("q55_seq_packing", "pack docs into 512-token sequences per lang shard")(
      """SELECT doc_id, lang, n_tok,
        |       CAST((cum - n_tok) // 512 AS BIGINT) AS seq_no,
        |       CAST((cum - n_tok) % 512 AS BIGINT) AS seq_offset
        |FROM (SELECT doc_id, lang, n_tok,
        |             sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |                              ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM (SELECT doc_id, lang,
        |                   CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
        |            FROM documents))
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .select(col("doc_id"), col("lang"), col("n_tok"),
          expr("(cum - n_tok) div 512").as("seq_no"),
          ((col("cum") - col("n_tok")) % 512).as("seq_offset"))
        .orderBy("doc_id")
    },

    // Bloom-filter dedup pre-filter — the sketch that makes q57's
    // incremental dedup cheap at 100 TB: the standing corpus collapses to
    // an m=4096-bit filter (BIGINT lanes packed 63 bits/word — the sign
    // bit stays clear for DuckDB's checked shift — k=3 seeded hashes)
    // built by a bit_or AGGREGATE (algebraic: partial per partition, one
    // 64-row final), broadcast to the arriving batch; only bloom-hit docs
    // need the exact index probe. No false negatives by construction (the
    // spec asserts it); false positives are visible as bloom_hit &&
    // !exact_dup. Real deployments size m to the corpus (bits stay a
    // fixed broadcast table keyed by lane — same plan shape at any m).
    q("q59_bloom_prefilter",
      "Bloom pre-filter (m=4096, k=3) for batch-vs-corpus dedup + exact flag")(
      s"""WITH n AS (SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h
         |           FROM documents),
         |bits AS (SELECT doc_id, h, unnest([
         |             ${md5LongSql("'bf0:' || h")} % 4096,
         |             ${md5LongSql("'bf1:' || h")} % 4096,
         |             ${md5LongSql("'bf2:' || h")} % 4096]) AS b FROM n),
         |lanes AS (SELECT doc_id, h, b // 63 AS lane,
         |                 (1::BIGINT << CAST(b % 63 AS INT)) AS bit FROM bits),
         |bloom AS (SELECT lane, bit_or(bit) AS word FROM lanes
         |          WHERE doc_id < 400 GROUP BY lane),
         |probe AS (SELECT l.doc_id, l.h,
         |                 bool_and(coalesce((bl.word & l.bit) != 0, false)) AS bloom_hit
         |          FROM lanes l LEFT JOIN bloom bl USING (lane)
         |          WHERE l.doc_id >= 400 GROUP BY l.doc_id, l.h)
         |SELECT p.doc_id, p.bloom_hit, c.h IS NOT NULL AS exact_dup
         |FROM probe p LEFT JOIN (SELECT DISTINCT h FROM n WHERE doc_id < 400) c
         |  ON c.h = p.h
         |ORDER BY p.doc_id""".stripMargin
    ) { (s, dir) =>
      val n = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"),
          md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("h"))
        .cache() // three consumers: corpus bits, probe bits, exact index
      val bits = n
        .select(col("doc_id"), col("h"), explode(array((0 until 3).map(i =>
          md5Long(concat(lit(s"bf$i:"), col("h"))) % 4096): _*)).as("b"))
        .selectExpr("doc_id", "h", "b div 63 AS lane",
          "shiftleft(cast(1 AS bigint), cast(b % 63 AS int)) AS bit")
      val bloom = bits.filter(col("doc_id") < 400)
        .groupBy("lane").agg(expr("bit_or(bit)").as("word"))
      val probe = bits.filter(col("doc_id") >= 400)
        .join(broadcast(bloom), Seq("lane"), "left")
        .withColumn("hit",
          coalesce(col("word").bitwiseAND(col("bit")) =!= 0, lit(false)))
        .groupBy("doc_id", "h").agg(expr("bool_and(hit)").as("bloom_hit"))
      val index = n.filter(col("doc_id") < 400).select(col("h").as("hc")).distinct()
      probe.join(broadcast(index), col("h") === col("hc"), "left")
        .select(col("doc_id"), col("bloom_hit"),
          col("hc").isNotNull.as("exact_dup"))
        .orderBy("doc_id")
    },

    // Mixture weighting to a token budget — sample each language shard
    // down to a fixed token budget in content-hash order (deterministic
    // under reruns/repartitions, uniform over docs): the standard way a
    // training mix caps any one language's contribution. One per-shard
    // window cumsum. The window sum is cast back to BIGINT in the oracle
    // (DuckDB window sum(BIGINT) → HUGEINT). 100 TB note: lang cardinality
    // is small, so the per-lang window is a whole-language sort on one
    // partition — the exact form exists for oracle verification; at scale
    // the same selection is a hash-CUTOFF search (tokens are ~uniform in
    // md5, so binary-search the cutoff over per-hash-range token sums —
    // aggregates only, no sort), with the window pass run once per final
    // cutoff only if exact budget adherence is required.
    q("q60_token_budget", "keep each lang's docs up to a 2048-token budget, hash-ordered")(
      s"""SELECT doc_id, lang, n_tok, CAST(cum AS BIGINT) AS cum_tok
         |FROM (SELECT doc_id, lang, n_tok,
         |             sum(n_tok) OVER (PARTITION BY lang
         |                              ORDER BY ${md5LongSql("text")}, doc_id
         |                              ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM (SELECT doc_id, lang, text,
         |                   CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
         |            FROM documents))
         |WHERE cum <= 2048 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5Long(col("text")), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("cum_tok", sum(col("n_tok")).over(w))
        .filter(col("cum_tok") <= 2048)
        .select("doc_id", "lang", "n_tok", "cum_tok")
        .orderBy("doc_id")
    },

    // Cross-doc duplicated-span detection (the exact-substring dedup
    // signal of Lee et al. 2022): for every 8-token shingle POSITION in a
    // doc, is that shingle present in at least one OTHER doc? Reported as
    // the per-doc duplicated-position fraction + a 20% removal gate.
    // Distinct from q53 (within-doc repetition) and q52 (overlap vs a
    // held-out split): this is corpus-global. Scale shape: one row per
    // position keyed by the 60-bit shingle hash (8-byte shuffle keys, no
    // text moves), exact distinct-doc count per shingle (partial+final),
    // join back by hash. At 100 TB the distinct-doc count's first pass
    // collapses (h, doc_id) duplicates map-side; the hot keys are the
    // duplicated shingles themselves — bounded by corpus dup rate, and a
    // count ≥ 2 needs no exact tail (any-2 saturating count suffices).
    q("q61_dup_spans", "fraction of 8-token positions duplicated in another doc + gate")(
      s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
         |pos AS (SELECT doc_id, ${md5LongSql("g")} AS h
         |        FROM (SELECT doc_id, unnest(${shinglesSql("w", 8)}) AS g
         |              FROM t WHERE len(w) >= 8)),
         |df AS (SELECT h, count(DISTINCT doc_id) AS nd FROM pos GROUP BY h),
         |agg AS (SELECT p.doc_id, count(*) AS n_pos,
         |               CAST(sum(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
         |        FROM pos p JOIN df USING (h) GROUP BY p.doc_id)
         |SELECT doc_id, n_pos, n_dup,
         |       round(n_dup * 1.0 / n_pos, 4) AS dup_frac,
         |       n_dup * 1.0 / n_pos >= 0.2 AS flagged
         |FROM agg ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val t = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("w"))
        .filter(size(col("w")) >= 8)
      // one row per shingle POSITION (not distinct): the metric counts
      // positions; hashed before the explode so only 8-byte keys shuffle
      val pos = t.select(col("doc_id"),
        explode(transform(shingles(col("w"), 8), g => md5Long(g))).as("h"))
        .cache() // consumed by the doc-frequency agg AND the join back
      val df = pos.groupBy("h").agg(countDistinct(col("doc_id")).as("nd"))
      pos.join(df, "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_pos"),
          sum(when(col("nd") >= 2, 1).otherwise(0)).cast("long").as("n_dup"))
        .select(col("doc_id"), col("n_pos"), col("n_dup"),
          round(col("n_dup") * 1.0 / col("n_pos"), 4).as("dup_frac"),
          (col("n_dup") * 1.0 / col("n_pos") >= 0.2).as("flagged"))
        .orderBy("doc_id")
    },

    // Variable-length MAXIMAL duplicated spans (the substring extents a
    // Lee et al. 2022 exact-substring pass actually removes): q61 only
    // FLAGS fixed 8-token shingle positions; here adjacent duplicated
    // positions merge into maximal runs via gaps-and-islands (q124's
    // machinery — island id = position minus per-doc row_number), and a
    // run of consecutive shingle positions [s, e] is the token span
    // [s, e+7], i.e. e+8-s tokens. One row per (doc, maximal span) with
    // its start, token length, and shingle count. Scale shape: identical
    // to q61 up to the duplicated-position set (60-bit hash keys, exact
    // distinct-doc counts, equi-join back), then the islands window and
    // both groupBys are partitioned by doc_id — no all-pairs, no global
    // window, one extra doc_id-hash exchange over q61.
    q("q61b_max_dup_spans",
      "maximal duplicated token spans per doc (islands over duplicated 8-gram positions)")(
      s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
         |pos AS (SELECT doc_id,
         |               unnest(generate_series(0, len(w) - 8)) AS p,
         |               unnest(${shinglesSql("w", 8)}) AS g
         |        FROM t WHERE len(w) >= 8),
         |ph AS (SELECT doc_id, p, ${md5LongSql("g")} AS h FROM pos),
         |df AS (SELECT h, count(DISTINCT doc_id) AS nd FROM ph GROUP BY h),
         |hits AS (SELECT doc_id, p FROM ph JOIN df USING (h) WHERE nd >= 2),
         |lab AS (SELECT doc_id, p,
         |               p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS isl
         |        FROM hits),
         |spans AS (SELECT doc_id, isl, min(p) AS s, max(p) AS e, count(*) AS ns
         |          FROM lab GROUP BY doc_id, isl)
         |SELECT doc_id, CAST(s AS BIGINT) AS span_start,
         |       CAST(e + 8 - s AS BIGINT) AS span_tokens,
         |       CAST(ns AS BIGINT) AS n_shingles
         |FROM spans ORDER BY doc_id, span_start""".stripMargin
    ) { (s, dir) =>
      val t = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("w"))
        .filter(size(col("w")) >= 8)
      val ph = t.select(col("doc_id"),
          posexplode(transform(shingles(col("w"), 8), g => md5Long(g))))
        .select(col("doc_id"), col("pos").cast("long").as("p"), col("col").as("h"))
        .cache() // consumed by the doc-frequency agg AND the join back
      val dfreq = ph.groupBy("h").agg(countDistinct(col("doc_id")).as("nd"))
      val hits = ph.join(dfreq.filter(col("nd") >= 2), "h").select("doc_id", "p")
      val w = Window.partitionBy("doc_id").orderBy("p")
      hits
        .withColumn("isl", col("p") - row_number().over(w))
        .groupBy("doc_id", "isl")
        .agg(min(col("p")).as("s"), max(col("p")).as("e"), count(lit(1)).as("ns"))
        .select(col("doc_id"), col("s").cast("long").as("span_start"),
          (col("e") + 8 - col("s")).cast("long").as("span_tokens"),
          col("ns").cast("long").as("n_shingles"))
        .orderBy("doc_id", "span_start")
    },

    // Length-doubling duplicated-span LADDER — the resolution upgrade over
    // q61b that Lee et al. 2022's suffix-automaton pass gets for free and
    // a shingle pass must earn: q61b's islands merge adjacent duplicated
    // 8-gram positions, so two OVERLAPPING duplicates from DIFFERENT
    // partner docs fuse into one reported span that no single partner
    // actually shares. Matching 8→16→32-token shingles (islands per
    // level) localizes that: a span confirmed at level L proves L-token
    // contiguous agreement with a single partner per shingle, so the
    // coarse levels split chained-partner fusions and certify long
    // duplicates as units (DupSpanLadderSpec pins both laws on seeded
    // 40-token duplicates). Scale shape: 3 hashed positional passes (8-
    // byte keys, no text shuffles), per-doc windows — exactly q61b ×3
    // with geometrically fewer positions per level.
    q("q61c_dup_span_ladder",
      "maximal duplicated spans at 8/16/32-token shingle resolution (length-doubling)")(
      dupSpanLadderSql(Seq(8, 16, 32))
    ) { (s, dir) =>
      dupSpanLadder(Tables.fanout(s, dir, "documents"), Seq(8, 16, 32))
    },

    // Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    // priority u^(1/w) with u a content-hash uniform and w = n_chars, top-5
    // per lang — longer docs proportionally likelier, selection exactly
    // reproducible (no RNG state: the hash IS the randomness). Ranking
    // happens on the ROUNDED priority (pow is proven round-4-compatible by
    // q21) with doc_id tiebreaks, so both engines pick identical samples;
    // the window is per-shard, the same scale shape as q51/q60.
    q("q67_weighted_sample",
      "A-ES weighted sample: top-5 docs per lang by hash-priority u^(1/n_chars)")(
      s"""WITH b AS (SELECT doc_id, lang, n_chars,
         |                  (${md5LongSql("text")} + 1) / 1152921504606846976.0 AS u
         |           FROM documents),
         |p AS (SELECT doc_id, lang, n_chars, round(pow(u, 1.0 / n_chars), 4) AS pr FROM b)
         |SELECT doc_id, lang, n_chars, pr, CAST(rn AS BIGINT) AS rn
         |FROM (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY pr DESC, doc_id) AS rn FROM p)
         |WHERE rn <= 5 ORDER BY lang, doc_id""".stripMargin
    ) { (s, dir) =>
      val b = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          ((md5Long(col("text")) + 1) / lit(1152921504606846976.0)).as("u"))
      val p = b.withColumn("pr", round(pow(col("u"), lit(1.0) / col("n_chars")), 4))
      // native TopKPerKeyExec (≤ 5 rows/lang/task cross the exchange vs a
      // rank window full-shuffling the corpus); ranks via a per-lang sorted
      // array over the 5 survivors — pr ∈ (0,1], so -pr is a safe sort key
      graft.plans.TopKPerKey.topK(p, Seq(col("lang")),
          Seq(col("pr").desc, col("doc_id")), 5)
        .groupBy("lang")
        .agg(sort_array(collect_list(struct((-col("pr")).as("k1"), col("doc_id"),
          col("n_chars"), col("pr")))).as("arr"))
        .select(col("lang"), posexplode(col("arr")))
        .select(col("col.doc_id").as("doc_id"), col("lang"),
          col("col.n_chars").as("n_chars"), col("col.pr").as("pr"),
          (col("pos") + 1).cast("long").as("rn"))
        .orderBy("lang", "doc_id")
    },

    // Data profiling — the per-column quality sweep run before any
    // training job: row count, null count, exact distinct count, min/max
    // (stringified on the native-type result, so numeric min/max is still
    // numeric ordering). One aggregation pass per column unioned into a
    // tall frame; at 100 TB each leg is a partial+final aggregate over a
    // single column (column pruning keeps the scans narrow), and distinct
    // counts degrade to HLL the same way q11b does.
    q("q66_profile", "per-column profile of documents: nulls, distincts, min/max")(
      Seq("doc_id", "lang", "n_chars", "source", "text").map(c =>
        s"""SELECT '$c' AS col, count(*) AS n,
           |       count(*) - count($c) AS n_null,
           |       count(DISTINCT $c) AS n_distinct,
           |       CAST(min($c) AS VARCHAR) AS mn, CAST(max($c) AS VARCHAR) AS mx
           |FROM documents""".stripMargin).mkString("", "\nUNION ALL\n", "\nORDER BY col")
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents").cache() // five single-column legs
      Seq("doc_id", "lang", "n_chars", "source", "text").map { c =>
        docs.agg(count(lit(1)).as("n"),
          (count(lit(1)) - count(col(c))).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("mn"),
          max(col(c)).cast("string").as("mx"))
          .select(lit(c).as("col"), col("n"), col("n_null"), col("n_distinct"),
            col("mn"), col("mx"))
      }.reduce(_ union _).orderBy("col")
    },

    // Z-order data layout — multi-dimensional clustering for file skipping:
    // interleave 16 bits of two scan-predicate columns into one sort key, so
    // a range sort on zkey makes EVERY file's (partkey, suppkey) min/max
    // envelope tight and a predicate on EITHER column prunes files. The
    // output is the per-bucket min/max envelope (bucket ≙ output file under
    // a range-partitioned write): bounded ranges ARE the skipping evidence.
    // Buckets are FIXED-WIDTH RANGE BINS of zkey over [0, zmax] — the
    // reproducible stand-in for a range-partitioned writer's file
    // boundaries (a real writer samples boundaries for equal file sizes;
    // that sampling is engine-private and un-oracle-able). Assignment is
    // row-local arithmetic off ONE broadcast scalar (zmax) — no global
    // sort anywhere, unlike the ntile formulation this replaces, which
    // funneled the whole fact table through a single-partition WindowExec.
    // At 100 TB zmax comes from column stats or the same one-row aggregate.
    q("q74_zorder_layout", "z-order interleaved sort key → per-bucket min/max pruning envelopes")(
      s"""WITH z AS (
         |  SELECT l_partkey, l_suppkey,
         |         CAST(${zorderTermsSql} AS BIGINT) AS zkey
         |  FROM lineitem),
         |zm AS (SELECT max(zkey) AS zmax FROM z),
         |b AS (SELECT z.*, (zkey * 16) // (zmax + 1) AS bucket FROM z CROSS JOIN zm)
         |SELECT bucket, count(*) AS n,
         |       min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
         |       min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk,
         |       min(zkey) AS zmin, max(zkey) AS zmax
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
    ) { (s, dir) =>
      val zkey = (0 until 16).map { i =>
        shiftleft(shiftright(col("l_partkey"), i).bitwiseAND(1), 2 * i) +
          shiftleft(shiftright(col("l_suppkey"), i).bitwiseAND(1), 2 * i + 1)
      }.reduce(_ + _)
      val z = Tables(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
        .withColumn("zkey", zkey.cast("long"))
      val zm = z.agg(max(col("zkey")).as("zmax"))
      z.crossJoin(broadcast(zm))
        .withColumn("bucket", expr("(zkey * 16) div (zmax + 1)"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min(col("l_partkey")).as("min_pk"), max(col("l_partkey")).as("max_pk"),
          min(col("l_suppkey")).as("min_sk"), max(col("l_suppkey")).as("max_sk"),
          min(col("zkey")).as("zmin"), max(col("zkey")).as("zmax"))
        .orderBy("bucket")
    },

    // Hilbert-curve layout — q74's sibling with the stronger locality key:
    // consecutive Hilbert indices are GRID NEIGHBORS (proven exhaustively
    // in HilbertIndexSpec), so range-partitioned files get envelopes with
    // no z-shape diagonal jumps — measurably tighter file skipping on the
    // secondary column. The index is the codegen HilbertIndex expression
    // (the xy2d bit-rotation walk is per-row mutable state — SQL-hostile,
    // which is exactly why the oracle derives it independently as 16
    // unrolled CTE stages). Same scale shape as q74: row-local key, one
    // broadcast max, 16-group aggregate; no sort, no window.
    q("q160_hilbert_layout", "Hilbert-curve sort key → per-bucket min/max pruning envelopes")(
      s"""WITH $hilbertStagesSql,
         |z AS (SELECT l_partkey, l_suppkey, d16 AS hkey FROM h16),
         |zm AS (SELECT max(hkey) AS hmax FROM z),
         |b AS (SELECT z.*, (hkey * 16) // (hmax + 1) AS bucket FROM z CROSS JOIN zm)
         |SELECT bucket, count(*) AS n,
         |       min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
         |       min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk,
         |       min(hkey) AS hmin, max(hkey) AS hmax
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
    ) { (s, dir) =>
      val z = Tables(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
        .withColumn("hkey", graft.expressions.HilbertFunctions
          .hilbertIndex(col("l_partkey"), col("l_suppkey"), 16))
      val zm = z.agg(max(col("hkey")).as("hmax"))
      z.crossJoin(broadcast(zm))
        .withColumn("bucket", expr("(hkey * 16) div (hmax + 1)"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min(col("l_partkey")).as("min_pk"), max(col("l_partkey")).as("max_pk"),
          min(col("l_suppkey")).as("min_sk"), max(col("l_suppkey")).as("max_sk"),
          min(col("hkey")).as("hmin"), max(col("hkey")).as("hmax"))
        .orderBy("bucket")
    },

    // The layout loop CLOSED — q160 computes Hilbert pruning envelopes;
    // this query actually WRITES lineitem as Hilbert-bucketed partitioned
    // parquet (one curve-sorted file per bucket + the envelope sidecar, via
    // LayoutWriter) and READS it back through envelope pruning with a
    // (l_partkey, l_suppkey) box predicate: dead buckets are eliminated as
    // static PartitionFilters (their files never open) and the box pushes
    // down into the survivors' row groups. The aggregate result is
    // layout-invariant, so the oracle is the plain box filter over
    // lineitem; LayoutPruningSpec asserts the files-scanned shrinkage that
    // the oracle cannot see. The only driver-side step is the ≤16-row
    // bucket-id collect (metadata scale — a planner reading file stats).
    q("q160b_hilbert_readback",
      "write Hilbert-bucketed layout, read back box-pruned, aggregate")(
      """SELECT l_returnflag, count(*) AS n,
        |       round(CAST(sum(CAST(round(l_quantity, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS qty
        |FROM lineitem
        |WHERE l_partkey BETWEEN 1 AND 100 AND l_suppkey BETWEEN 1 AND 3
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      val outDir = s"/tmp/graft_layout/${new java.io.File(dir).getName}/hilbert"
      LayoutWriter.write(
        Tables(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
            col("l_returnflag")),
        "l_partkey", "l_suppkey",
        graft.expressions.HilbertFunctions
          .hilbertIndex(col("l_partkey"), col("l_suppkey"), 16),
        outDir)
      LayoutWriter.readBox(s, outDir, "l_partkey", 1, 100, "l_suppkey", 1, 3)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(sum(round(col("l_quantity"), 4)
            .cast(org.apache.spark.sql.types.DecimalType(28, 4))).cast("double"), 4).as("qty"))
        .orderBy("l_returnflag")
    },

    // Layout-effectiveness comparison — the MEASURED version of the
    // q74/q160 story: for the same 16-bucket range-partitioned write under
    // three sort keys (linear l_partkey, z-order, Hilbert), count how many
    // bucket ENVELOPES each probe in a 3-family workload (pk-band,
    // sk-band, 2D box — 8 probes each, derived from the column maxima so
    // the workload scales with the data) would have to open. This is the
    // number a table-format planner actually optimizes: linear wins its
    // own column and degrades to full-scan on the other; the
    // space-filling curves stay balanced on BOTH — and the oracle makes
    // that a checked, engine-agreed quantity rather than prose. Envelope
    // building is the q74/q160 shape (row-local keys, one broadcast
    // maxima row, 16-group aggregates); the probe×envelope product is
    // 24×48 metadata rows.
    q("q224_layout_probe_compare",
      "buckets touched per probe family under linear / z-order / Hilbert layouts")(
      s"""WITH $hilbertStagesSql,
         |base AS (SELECT l_partkey AS pk, l_suppkey AS sk,
         |                CAST($zorderTermsSql AS BIGINT) AS zkey, d16 AS hkey
         |         FROM h16),
         |mx AS (SELECT max(pk) AS pmax, max(sk) AS smax,
         |              max(zkey) AS zmx, max(hkey) AS hmx FROM base),
         |asg AS (SELECT base.*, (pk * 16) // (pmax + 1) AS lb,
         |               (zkey * 16) // (zmx + 1) AS zb,
         |               (hkey * 16) // (hmx + 1) AS hb
         |        FROM base CROSS JOIN mx),
         |env AS (
         |  SELECT 'linear' AS layout, lb AS bucket, min(pk) AS mnp, max(pk) AS mxp,
         |         min(sk) AS mns, max(sk) AS mxs FROM asg GROUP BY lb
         |  UNION ALL
         |  SELECT 'zorder', zb, min(pk), max(pk), min(sk), max(sk) FROM asg GROUP BY zb
         |  UNION ALL
         |  SELECT 'hilbert', hb, min(pk), max(pk), min(sk), max(sk) FROM asg GROUP BY hb),
         |pr AS (
         |  SELECT i, 'pk_band' AS family,
         |         i * pmax // 10 AS p1, i * pmax // 10 + pmax // 12 AS p2,
         |         CAST(NULL AS BIGINT) AS s1, CAST(NULL AS BIGINT) AS s2
         |  FROM mx CROSS JOIN range(8) AS r(i)
         |  UNION ALL
         |  SELECT i, 'sk_band', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         |         i * smax // 10, i * smax // 10 + smax // 12
         |  FROM mx CROSS JOIN range(8) AS r(i)
         |  UNION ALL
         |  SELECT i, 'box', i * pmax // 10, i * pmax // 10 + pmax // 12,
         |         ((3 * i) % 8) * smax // 10, ((3 * i) % 8) * smax // 10 + smax // 12
         |  FROM mx CROSS JOIN range(8) AS r(i)),
         |tc AS (SELECT pr.family, pr.i, env.layout,
         |              sum(CASE WHEN (p1 IS NULL OR p1 <= mxp) AND (p2 IS NULL OR p2 >= mnp)
         |                        AND (s1 IS NULL OR s1 <= mxs) AND (s2 IS NULL OR s2 >= mns)
         |                   THEN 1 ELSE 0 END) AS touched
         |       FROM pr CROSS JOIN env GROUP BY pr.family, pr.i, env.layout)
         |SELECT layout, family,
         |       CAST(sum(touched) * 1000 // 8 AS BIGINT) AS avg_touched_milli,
         |       CAST(max(touched) AS BIGINT) AS max_touched
         |FROM tc GROUP BY layout, family ORDER BY layout, family""".stripMargin
    ) { (s, dir) =>
      val zkeyExpr = (0 until 16).map { i =>
        shiftleft(shiftright(col("pk"), i).bitwiseAND(1), 2 * i) +
          shiftleft(shiftright(col("sk"), i).bitwiseAND(1), 2 * i + 1)
      }.reduce(_ + _)
      val base = Tables(s, dir, "lineitem")
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .withColumn("zkey", zkeyExpr.cast("long"))
        .withColumn("hkey", graft.expressions.HilbertFunctions
          .hilbertIndex(col("pk"), col("sk"), 16))
        .cache() // maxima + three envelope groupBys
      val mx = base.agg(max(col("pk")).as("pmax"), max(col("sk")).as("smax"),
        max(col("zkey")).as("zmx"), max(col("hkey")).as("hmx"))
      val asg = base.crossJoin(broadcast(mx))
        .withColumn("lb", expr("(pk * 16) div (pmax + 1)"))
        .withColumn("zb", expr("(zkey * 16) div (zmx + 1)"))
        .withColumn("hb", expr("(hkey * 16) div (hmx + 1)"))
        .cache() // three envelope aggregations
      def envOf(layout: String, b: String) = asg.groupBy(col(b).as("bucket"))
        .agg(min(col("pk")).as("mnp"), max(col("pk")).as("mxp"),
          min(col("sk")).as("mns"), max(col("sk")).as("mxs"))
        .select(lit(layout).as("layout"), col("bucket"),
          col("mnp"), col("mxp"), col("mns"), col("mxs"))
      val env = envOf("linear", "lb")
        .unionByName(envOf("zorder", "zb"))
        .unionByName(envOf("hilbert", "hb"))
      val is = mx.select(col("pmax"), col("smax"),
        explode(sequence(lit(0L), lit(7L))).as("i"))
      val nl = lit(null).cast("long")
      val pr = is.select(col("i"), lit("pk_band").as("family"),
          expr("i * pmax div 10").as("p1"), expr("i * pmax div 10 + pmax div 12").as("p2"),
          nl.as("s1"), nl.as("s2"))
        .unionByName(is.select(col("i"), lit("sk_band").as("family"),
          nl.as("p1"), nl.as("p2"),
          expr("i * smax div 10").as("s1"), expr("i * smax div 10 + smax div 12").as("s2")))
        .unionByName(is.select(col("i"), lit("box").as("family"),
          expr("i * pmax div 10").as("p1"), expr("i * pmax div 10 + pmax div 12").as("p2"),
          expr("((3 * i) % 8) * smax div 10").as("s1"),
          expr("((3 * i) % 8) * smax div 10 + smax div 12").as("s2")))
      val touchedFlag = (col("p1").isNull || col("p1") <= col("mxp")) &&
        (col("p2").isNull || col("p2") >= col("mnp")) &&
        (col("s1").isNull || col("s1") <= col("mxs")) &&
        (col("s2").isNull || col("s2") >= col("mns"))
      pr.crossJoin(env)
        .groupBy("family", "i", "layout")
        .agg(sum(when(touchedFlag, 1L).otherwise(0L)).as("touched"))
        .groupBy("layout", "family")
        .agg(expr("sum(touched) * 1000 div 8").cast("long").as("avg_touched_milli"),
          max(col("touched")).cast("long").as("max_touched"))
        .orderBy("layout", "family")
    },

    // Stratified sampling — per-stratum rates keyed on a content hash, so
    // the sample is stable under reruns, repartitions, AND incremental
    // appends (the q50/q51 selection contract, now with a rate per class —
    // how a pipeline rebalances language mix without a global shuffle:
    // filter is row-local, no sort, no sampleBy RNG state).
    q("q83_stratified_sample", "per-lang hash-rate stratified sample of documents")(
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang, ${md5LongSql("text")} % 100 AS h,
         |         CASE lang WHEN 'en' THEN 10 WHEN 'fr' THEN 25 WHEN 'es' THEN 40
         |                   WHEN 'de' THEN 60 ELSE 80 END AS rate
         |  FROM documents)
         |WHERE h < rate ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          (md5Long(col("text")) % 100).as("h"),
          when(col("lang") === "en", 10).when(col("lang") === "fr", 25)
            .when(col("lang") === "es", 40).when(col("lang") === "de", 60)
            .otherwise(80).as("rate"))
        .filter(col("h") < col("rate"))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    },

    // Dataset reconciliation (diff) — classify every key across two dataset
    // versions as added/removed/changed/same via ONE full-outer join on the
    // key. v2 is derived deterministically (delete every 97th key, bump
    // acctbal on every 10th, insert new keys), so both engines agree on the
    // ground truth. Values are compared column-wise (no double→string
    // formatting dependency); at scale wide rows would compare a canonical
    // byte-encoding hash instead, shuffling 8-byte digests not rows.
    q("q85_table_diff", "added/removed/changed/same counts between two dataset versions")(
      """WITH v2 AS (
        |  SELECT c_custkey, c_name,
        |         CASE WHEN c_custkey % 10 = 0 THEN round(c_acctbal + 100.0, 2)
        |              ELSE c_acctbal END AS c_acctbal
        |  FROM customer WHERE c_custkey % 97 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'NewCustomer#' || CAST(c_custkey AS VARCHAR), 0.0
        |  FROM customer WHERE c_custkey % 113 = 0),
        |j AS (
        |  SELECT CASE WHEN a.c_custkey IS NULL THEN 'added'
        |              WHEN b.c_custkey IS NULL THEN 'removed'
        |              WHEN a.c_name <> b.c_name OR a.c_acctbal <> b.c_acctbal THEN 'changed'
        |              ELSE 'same' END AS status
        |  FROM customer a FULL OUTER JOIN v2 b ON a.c_custkey = b.c_custkey)
        |SELECT status, count(*) AS n FROM j GROUP BY status ORDER BY status""".stripMargin
    ) { (s, dir) =>
      val v1 = Tables(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal")
      val v2 = v1.filter(col("c_custkey") % 97 =!= 0)
        .select(col("c_custkey"), col("c_name"),
          when(col("c_custkey") % 10 === 0, round(col("c_acctbal") + 100.0, 2))
            .otherwise(col("c_acctbal")).as("c_acctbal"))
        .union(v1.filter(col("c_custkey") % 113 === 0)
          .select((col("c_custkey") + 1000000L).as("c_custkey"),
            concat(lit("NewCustomer#"), col("c_custkey").cast("string")).as("c_name"),
            lit(0.0).as("c_acctbal")))
      val a = v1.as("a")
      val b = v2.as("b")
      a.join(b, col("a.c_custkey") === col("b.c_custkey"), "full_outer")
        .select(
          when(col("a.c_custkey").isNull, "added")
            .when(col("b.c_custkey").isNull, "removed")
            .when(col("a.c_name") =!= col("b.c_name")
              || col("a.c_acctbal") =!= col("b.c_acctbal"), "changed")
            .otherwise("same").as("status"))
        .groupBy("status").agg(count(lit(1)).as("n"))
        .orderBy("status")
    },

    // Winsorization — clip a numeric feature at the per-group discrete
    // p05/p95 (rank-based, not interpolated — the q58 trick that keeps the
    // cutoff float-free cross-engine). One (group, value) window sort; the
    // tiny per-group bounds table broadcasts back onto the rows. The
    // outlier treatment step before any scale-sensitive model fit.
    q("q89_winsorize", "clip n_chars at per-lang discrete p05/p95 bounds")(
      """WITH r AS (SELECT doc_id, lang, n_chars,
        |            row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
        |            count(*) OVER (PARTITION BY lang) AS n
        |           FROM documents),
        |b AS (SELECT lang,
        |        max(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT) THEN n_chars END) AS lo,
        |        max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN n_chars END) AS hi
        |      FROM r GROUP BY lang)
        |SELECT doc_id, r.lang, n_chars, least(greatest(n_chars, b.lo), b.hi) AS clipped
        |FROM r JOIN b ON r.lang = b.lang ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val byLang = Window.partitionBy("lang")
      val r = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("rn", row_number().over(byLang.orderBy("n_chars", "doc_id")))
        .withColumn("n", count(lit(1)).over(byLang))
        .withColumn("isLo", col("rn") === ceil(lit(0.05) * col("n")).cast("long"))
        .withColumn("isHi", col("rn") === ceil(lit(0.95) * col("n")).cast("long"))
        .cache() // bounds + clip legs
      val b = r.groupBy("lang").agg(
        max(when(col("isLo"), col("n_chars"))).as("lo"),
        max(when(col("isHi"), col("n_chars"))).as("hi"))
      r.join(broadcast(b), "lang")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          least(greatest(col("n_chars"), col("lo")), col("hi")).as("clipped"))
        .orderBy("doc_id")
    },

    // Skew diagnosis — the observability op behind SkewTools: per-key share
    // vs the uniform expectation (skew_factor = n·|keys|/total), reporting
    // keys above 2× uniform. Two aggregates, one broadcast scalar — runs
    // BEFORE a big join to decide salting/AQE strategy.
    q("q90_skew_report", "per-key skew factors >2x uniform for orders.o_custkey")(
      """WITH k AS (SELECT o_custkey AS key, count(*) AS n FROM orders GROUP BY o_custkey),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS nkeys, CAST(sum(n) AS BIGINT) AS total FROM k)
        |SELECT k.key, k.n, round(k.n * CAST(s.nkeys AS DOUBLE) / s.total, 4) AS skew_factor
        |FROM k CROSS JOIN s
        |WHERE k.n * s.nkeys > 2 * s.total
        |ORDER BY k.n DESC, k.key LIMIT 20""".stripMargin
    ) { (s, dir) =>
      val k = Tables(s, dir, "orders")
        .groupBy(col("o_custkey").as("key")).agg(count(lit(1)).as("n"))
        .cache() // totals + report legs
      val tot = k.agg(count(lit(1)).as("nkeys"), sum(col("n")).as("total"))
      k.crossJoin(broadcast(tot))
        .filter(col("n") * col("nkeys") > lit(2) * col("total"))
        .select(col("key"), col("n"),
          round(col("n") * col("nkeys").cast("double") / col("total"), 4).as("skew_factor"))
        .orderBy(col("n").desc, col("key")).limit(20)
    },

    // Order-independent table checksum — the dataset-versioning primitive:
    // per-row md5 of a canonical '|'-joined key projection (integer/string
    // columns only — no float formatting), summed mod P. Addition commutes,
    // so the checksum is invariant under partitioning/row order and
    // mergeable across shards; two dataset versions compare by one number
    // (q85 then localizes any difference).
    q("q91_table_checksum", "order-independent md5-sum checksums of three tables")(
      s"""WITH rows_h AS (
         |  SELECT 'customer' AS tbl,
         |         ${md5LongSql("CAST(c_custkey AS VARCHAR) || '|' || c_name || '|' || c_mktsegment")} % 1000000007 AS h
         |  FROM customer
         |  UNION ALL
         |  SELECT 'orders',
         |         ${md5LongSql("CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus")} % 1000000007
         |  FROM orders
         |  UNION ALL
         |  SELECT 'lineitem',
         |         ${md5LongSql("CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR) || '|' || CAST(l_partkey AS VARCHAR) || '|' || l_returnflag")} % 1000000007
         |  FROM lineitem)
         |SELECT tbl, count(*) AS n, CAST(sum(h) % 1000000007 AS BIGINT) AS checksum
         |FROM rows_h GROUP BY tbl ORDER BY tbl""".stripMargin
    ) { (s, dir) =>
      def leg(tbl: String, canonical: org.apache.spark.sql.Column) =
        Tables(s, dir, tbl).select(lit(tbl).as("tbl"), (md5Long(canonical) % 1000000007L).as("h"))
      leg("customer", concat_ws("|", col("c_custkey"), col("c_name"), col("c_mktsegment")))
        .union(leg("orders", concat_ws("|", col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))))
        .union(leg("lineitem", concat_ws("|",
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_returnflag"))))
        .groupBy("tbl")
        .agg(count(lit(1)).as("n"), (sum(col("h")) % 1000000007L).cast("long").as("checksum"))
        .orderBy("tbl")
    },

    // Z-score standardization — per-group (x−μ)/σ where μ and σ derive from
    // EXACT integer sums (Σx and Σx² of a bigint column stay under 2^53, so
    // the aggregates are order-free and the float arithmetic happens once,
    // in a fixed expression order — no Welford/merge-order divergence). The
    // tiny per-group stats table broadcasts back onto the rows: the
    // feature-scaling step before any distance-based model.
    q("q97_zscore", "per-lang z-score of n_chars from exact integer sums")(
      """WITH s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |                  CAST(sum(n_chars) AS BIGINT) AS sm,
        |                  CAST(sum(n_chars * n_chars) AS BIGINT) AS sq
        |           FROM documents GROUP BY lang)
        |SELECT doc_id, d.lang, n_chars,
        |       round((n_chars - CAST(sm AS DOUBLE) / n)
        |             / sqrt((sq - CAST(sm AS DOUBLE) * sm / n) / (n - 1)), 4) AS z
        |FROM documents d JOIN s ON d.lang = s.lang
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val stats = Tables(s, dir, "documents").groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sm"),
          sum(col("n_chars") * col("n_chars")).as("sq"))
      Tables(s, dir, "documents")
        .join(broadcast(stats), "lang")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          round((col("n_chars") - col("sm").cast("double") / col("n"))
            / sqrt((col("sq") - col("sm").cast("double") * col("sm") / col("n"))
              / (col("n") - 1)), 4).as("z"))
        .orderBy("doc_id")
    },

    // Quantile normalization — the RANK-based sibling of q97's z-score:
    // each value maps through its within-group percentile onto the global
    // discrete distribution (floor-interpolated target rank), removing
    // per-group distribution shift entirely (the microarray-era normalizer,
    // used on per-source quality scores). BOTH ranks (per-lang and global)
    // come from the two-pass distributed rank (DistributedRank: range
    // partitions + broadcast offsets) — no single-partition WindowExec and
    // no per-lang window skew (lang has ~5 values; PARTITION BY lang would
    // funnel the corpus through 5 tasks at 100 TB). Group sizes join in as
    // a broadcast aggregate; the rank interpolation float is exact-integer
    // arithmetic divided once.
    q("q102_quantile_norm", "map per-lang ranks onto the global n_chars distribution")(
      """WITH r AS (SELECT doc_id, lang, n_chars,
        |            row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
        |            count(*) OVER (PARTITION BY lang) AS cnt
        |           FROM documents),
        |g AS (SELECT n_chars AS gv, row_number() OVER (ORDER BY n_chars, doc_id) AS grn
        |      FROM documents),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents),
        |m AS (SELECT r.doc_id, r.lang, r.n_chars,
        |             CAST(floor((r.rn - 1.0) * (n.total - 1) / (r.cnt - 1.0)) AS BIGINT) + 1 AS target
        |      FROM r CROSS JOIN n WHERE r.cnt > 1)
        |SELECT m.doc_id, m.lang, m.n_chars, g.gv AS qnorm
        |FROM m JOIN g ON g.grn = m.target
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val base = docs.select(col("doc_id"), col("lang"), col("n_chars"))
      val cnts = base.groupBy("lang").agg(count(lit(1)).as("cnt"))
      val r = DistributedRank.withRowNumber(
          base, Seq(col("n_chars"), col("doc_id")), "rn", group = Seq("lang"))
        .join(broadcast(cnts), "lang")
      val g = DistributedRank.withRowNumber(
        docs.select(col("n_chars").as("gv")), Seq(col("gv")), "grn")
      val total = docs.agg(count(lit(1)).as("total"))
      r.crossJoin(broadcast(total))
        .filter(col("cnt") > 1)
        .withColumn("grn", (floor((col("rn") - 1.0) * (col("total") - 1)
          / (col("cnt") - 1.0))).cast("long") + 1)
        .join(g, "grn")
        .select(col("doc_id"), col("lang"), col("n_chars"), col("gv").as("qnorm"))
        .orderBy("doc_id")
    },

    // End-to-end curation funnel — the composed pipeline a corpus actually
    // runs (CCNet/RefinedWeb shape): language gate → length gate →
    // lexical-diversity gate → exact prefix dedup (keep-first), with every
    // document labeled by the FIRST stage that rejected it (the funnel
    // report that decides which gate to retune). Each stage is row-local
    // until the final dedup, which shuffles only (prefix, doc_id) pairs of
    // gate survivors; at 100 TB the funnel is one pass + one narrow
    // shuffle. The diversity ratio is one integer division — bit-identical
    // across engines, so the 0.35 cut needs no rounding guard.
    q("q115_curation_funnel",
      "lang → length → diversity → prefix-dedup funnel with per-doc rejection stage")(
      """WITH t AS (SELECT doc_id, lang, n_chars, str_split(text, ' ') AS w FROM documents),
        |st AS (SELECT doc_id, lang, n_chars,
        |              len(list_distinct(w))::DOUBLE / len(w) AS dtr,
        |              list_aggregate(w[1:8], 'string_agg', ' ') AS pre
        |       FROM t),
        |dec AS (SELECT doc_id, pre,
        |               CASE WHEN lang <> 'en' THEN 'lang'
        |                    WHEN n_chars < 100 OR n_chars > 500 THEN 'length'
        |                    WHEN dtr < 0.35 THEN 'quality'
        |                    ELSE 'pass' END AS gate
        |        FROM st),
        |f AS (SELECT pre, min(doc_id) AS keeper FROM dec WHERE gate = 'pass' GROUP BY pre)
        |SELECT d.doc_id,
        |       CASE WHEN d.gate <> 'pass' THEN d.gate
        |            WHEN d.doc_id <> f.keeper THEN 'duplicate'
        |            ELSE 'kept' END AS stage
        |FROM dec d LEFT JOIN f ON f.pre = d.pre
        |ORDER BY d.doc_id""".stripMargin
    ) { (s, dir) =>
      val dec = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          split(col("text"), " ").as("w"))
        .withColumn("dtr",
          size(array_distinct(col("w"))).cast("double") / size(col("w")))
        .withColumn("pre", concat_ws(" ", slice(col("w"), 1, 8)))
        .withColumn("gate",
          when(col("lang") =!= "en", "lang")
            .when(col("n_chars") < 100 || col("n_chars") > 500, "length")
            .when(col("dtr") < 0.35, "quality")
            .otherwise("pass"))
      val keepers = dec.filter(col("gate") === "pass")
        .groupBy("pre").agg(min("doc_id").as("keeper"))
      dec.join(keepers, Seq("pre"), "left")
        .select(col("doc_id"),
          when(col("gate") =!= "pass", col("gate"))
            .when(col("doc_id") =!= col("keeper"), "duplicate")
            .otherwise("kept").as("stage"))
        .orderBy("doc_id")
    },

    // RAG chunking: overlapping token windows (size 32, stride 24) per
    // document, each chunk fingerprinted for downstream embedding dedup.
    // Row-local explode — no shuffle at all; chunk counts follow from
    // token counts, so the plan is a map stage at any scale. DuckDB's
    // 1-based INCLUSIVE list slice ≙ Spark's slice(w, start, len) with
    // Spark-side end-truncation (NOTES.md).
    q("q116_rag_chunks",
      "overlapping 32-token/stride-24 chunks per doc with md5 fingerprints")(
      s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
         |e AS (SELECT doc_id, w,
         |             unnest(generate_series(0, CAST(floor((len(w) - 1) / 24.0) AS BIGINT))) AS i
         |      FROM t),
         |c AS (SELECT doc_id, i, w[(i * 24 + 1):least(i * 24 + 32, len(w))] AS chunk FROM e)
         |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, CAST(len(chunk) AS BIGINT) AS n_toks,
         |       ${md5LongSql("list_aggregate(chunk, 'string_agg', ' ')")} AS fp
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
    ) { (s, dir) =>
      Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), col("w"),
          explode(sequence(lit(0L),
            floor((size(col("w")) - 1) / lit(24.0)).cast("long"))).as("chunk_idx"))
        .withColumn("chunk",
          slice(col("w"), (col("chunk_idx") * 24 + 1).cast("int"), lit(32)))
        .select(col("doc_id"), col("chunk_idx"),
          size(col("chunk")).cast("long").as("n_toks"),
          md5Long(concat_ws(" ", col("chunk"))).as("fp"))
        .orderBy("doc_id", "chunk_idx")
    },

    // Temperature-flattened mixture sampling (T = 2): per-source selection
    // quotas ∝ √(char mass), the standard down-weighting of oversized
    // sources when composing a training mix. All quota arithmetic is exact
    // (integer micro-unit weights; the only division is one double op on
    // exactly-representable integers), and the per-source pick is the
    // md5-ranked prefix — deterministic, engine-identical, and at scale a
    // rank-within-partition window over each source shard.
    q("q117_temperature_mix",
      "per-source quotas ∝ sqrt(char mass), md5-rank-prefix picks (100-doc target)")(
      """WITH srcw AS (SELECT source, CAST(floor(sqrt(CAST(sum(n_chars) AS DOUBLE)) * 10000) AS BIGINT) AS w
        |              FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM srcw),
        |quota AS (SELECT source, CAST(floor(100.0 * w / tw) AS BIGINT) AS n_take
        |          FROM srcw CROSS JOIN tot),
        |rnk AS (SELECT doc_id, source,
        |               row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rn
        |        FROM documents)
        |SELECT r.doc_id, r.source, CAST(r.rn AS BIGINT) AS rnk
        |FROM rnk r JOIN quota q ON q.source = r.source
        |WHERE r.rn <= q.n_take
        |ORDER BY r.source, r.rn""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val srcw = docs.groupBy("source")
        .agg(floor(sqrt(sum(col("n_chars")).cast("double")) * 10000)
          .cast("long").as("w"))
      val tot = srcw.agg(sum(col("w")).as("tw"))
      val quota = srcw.crossJoin(broadcast(tot))
        .select(col("source"), floor(lit(100.0) * col("w") / col("tw")).cast("long").as("n_take"))
      val rnk = docs.select(col("doc_id"), col("source"),
        row_number().over(Window.partitionBy("source").orderBy(md5(col("text")), col("doc_id")))
          .cast("long").as("rnk"))
      rnk.join(broadcast(quota), Seq("source"))
        .filter(col("rnk") <= col("n_take"))
        .select(col("doc_id"), col("source"), col("rnk"))
        .orderBy("source", "rnk")
    },

    // q117's production scale arm (SCALE.md round-10 window audit named
    // this lever; here it is, oracle-proven identical): the per-key k is
    // data-dependent (the quota), which a fixed-k TopK can't express —
    // but a TWO-PASS cap can: pass 1 reduces the quota frame to ONE
    // scalar k = max(n_take) (a |sources|-row metadata aggregate, q216's
    // bounded-collect discipline); pass 2 runs the native TopKPerKeyExec
    // at that cap, so ≤ k rows/source/task cross the exchange instead of
    // the rank window full-shuffling the corpus, then ranks the ≤ k
    // survivors in a sorted array and applies each source's exact quota.
    // Same rows, same ranks as q117 — the oracle is q117's SQL verbatim.
    q("q117b_temperature_mix_capped",
      "q117's quota sample via a capped TopKPerKey two-pass (identical output)")(
      """WITH srcw AS (SELECT source, CAST(floor(sqrt(CAST(sum(n_chars) AS DOUBLE)) * 10000) AS BIGINT) AS w
        |              FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM srcw),
        |quota AS (SELECT source, CAST(floor(100.0 * w / tw) AS BIGINT) AS n_take
        |          FROM srcw CROSS JOIN tot),
        |rnk AS (SELECT doc_id, source,
        |               row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rn
        |        FROM documents)
        |SELECT r.doc_id, r.source, CAST(r.rn AS BIGINT) AS rnk
        |FROM rnk r JOIN quota q ON q.source = r.source
        |WHERE r.rn <= q.n_take
        |ORDER BY r.source, r.rn""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val srcw = docs.groupBy("source")
        .agg(floor(sqrt(sum(col("n_chars")).cast("double")) * 10000)
          .cast("long").as("w"))
      val tot = srcw.agg(sum(col("w")).as("tw"))
      val quota = srcw.crossJoin(broadcast(tot))
        .select(col("source"),
          floor(lit(100.0) * col("w") / col("tw")).cast("long").as("n_take"))
      // pass 1: ONE scalar off the |sources|-row quota frame
      val k = math.max(1L,
        quota.agg(max(col("n_take"))).collect()(0).getLong(0)).toInt
      val hashed = docs.select(col("doc_id"), col("source"), md5(col("text")).as("hk"))
      graft.plans.TopKPerKey.topK(hashed, Seq(col("source")),
          Seq(col("hk"), col("doc_id")), k)
        .groupBy("source")
        .agg(sort_array(collect_list(struct(col("hk"), col("doc_id")))).as("arr"))
        .select(col("source"), posexplode(col("arr")))
        .select(col("col.doc_id").as("doc_id"), col("source"),
          (col("pos") + 1).cast("long").as("rnk"))
        .join(broadcast(quota), Seq("source"))
        .filter(col("rnk") <= col("n_take"))
        .select(col("doc_id"), col("source"), col("rnk"))
        .orderBy("source", "rnk")
    },

    // Exact stratified K-fold assignment — q50's hash split gives
    // PROPORTIONAL folds; cross-validation wants EXACT ones (per-stratum
    // fold sizes differing by at most 1). Rank each stratum by a content
    // hash (deterministic, rerun- and append-stable ordering) with the
    // two-pass DistributedRank — never a per-lang window funnel — and deal
    // ranks round-robin into 5 folds. PipelineQueriesSpec asserts the
    // ±1-exactness per (lang, fold).
    q("q167_stratified_kfold",
      "exact per-lang 5-fold assignment via distributed rank (fold sizes ±1)")(
      """WITH r AS (SELECT doc_id, lang,
        |            row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rn
        |           FROM documents)
        |SELECT doc_id, lang, CAST((rn - 1) % 5 AS BIGINT) AS fold
        |FROM r ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val base = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), md5(col("text")).as("mh"))
      DistributedRank.withRowNumber(
          base, Seq(col("mh"), col("doc_id")), "rn", group = Seq("lang"))
        .select(col("doc_id"), col("lang"), ((col("rn") - 1) % 5).as("fold"))
        .orderBy("doc_id")
    },

    // Deterministic negative sampling — the contrastive-pair miner: each
    // anchor doc draws 3 pseudo-random negatives by hashing (anchor, k)
    // into the dense doc-id space, keeping only cross-lang draws (the
    // cheap hard-negative heuristic; same-lang collisions just drop).
    // Fully deterministic ⇒ reproducible + incremental-append-stable (the
    // q83 selection contract extended from rows to PAIRS); the lookup is
    // one equi-join on doc_id, constant fan-out per anchor — at 100 TB
    // this is a hash-join against the (id, lang) projection, never a
    // random shuffle or RNG state.
    q("q168_negative_sampling",
      "3 deterministic cross-lang negatives per anchor via hash-into-id-space")(
      s"""WITH n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents),
         |a AS (SELECT doc_id, lang, unnest(generate_series(0, 2)) AS k FROM documents),
         |t AS (SELECT a.doc_id AS anchor, a.lang AS alang, a.k,
         |             ${md5LongSql("CAST(a.doc_id AS VARCHAR) || '#' || CAST(a.k AS VARCHAR)")} % n.total AS neg
         |      FROM a CROSS JOIN n)
         |SELECT t.anchor, CAST(t.k AS BIGINT) AS k, b.doc_id AS neg_id, b.lang AS neg_lang
         |FROM t JOIN documents b ON b.doc_id = t.neg
         |WHERE b.lang <> t.alang
         |ORDER BY t.anchor, t.k""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val total = docs.agg(count(lit(1)).as("total"))
      val draws = docs.select(col("doc_id"), col("lang"),
          explode(sequence(lit(0), lit(2))).as("k"))
        .crossJoin(broadcast(total))
        .select(col("doc_id").as("anchor"), col("lang").as("alang"),
          col("k").cast("long").as("k"),
          (md5Long(concat(col("doc_id").cast("string"), lit("#"),
            col("k").cast("string"))) % col("total")).as("neg"))
      draws.join(docs.select(col("doc_id").as("neg"), col("doc_id").as("neg_id"),
          col("lang").as("neg_lang")), "neg")
        .filter(col("neg_lang") =!= col("alang"))
        .select(col("anchor"), col("k"), col("neg_id"), col("neg_lang"))
        .orderBy("anchor", "k")
    },

    // Exact grouped percentiles — the DISTRIBUTED-RANK sibling of the
    // approximate sketches (q41b GK) and the single-partition LATERAL
    // median (q78): p50/p90/p99 per group by explicit rank SELECTION
    // (k = ⌈p·n⌉ computed in pure integers — (9n+9) div 10, never a
    // float quantile function whose index convention differs per engine).
    // The rank comes from DistributedRank's grouped two-pass, the group
    // sizes from one broadcast aggregate, and the three selections
    // collapse in a single conditional aggregation — no window, no sort
    // funnel, exact at any scale.
    q("q170_grouped_percentiles",
      "exact per-type p50/p90/p99 by integer rank selection over the distributed rank")(
      """WITH r AS (SELECT event_type, value, event_id,
        |            row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |            count(*) OVER (PARTITION BY event_type) AS n
        |           FROM events)
        |SELECT event_type,
        |       round(max(CASE WHEN rn = (n + 1) // 2 THEN value END), 4) AS p50,
        |       round(max(CASE WHEN rn = (9 * n + 9) // 10 THEN value END), 4) AS p90,
        |       round(max(CASE WHEN rn = (99 * n + 99) // 100 THEN value END), 4) AS p99
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      val base = Tables(s, dir, "events")
        .select(col("event_type"), col("value"), col("event_id"))
      val cnts = base.groupBy("event_type").agg(count(lit(1)).as("n"))
      DistributedRank.withRowNumber(
          base, Seq(col("value"), col("event_id")), "rn", group = Seq("event_type"))
        .join(broadcast(cnts), "event_type")
        .groupBy("event_type")
        .agg(
          round(max(when(col("rn") === expr("(n + 1) div 2"), col("value"))), 4).as("p50"),
          round(max(when(col("rn") === expr("(9 * n + 9) div 10"), col("value"))), 4).as("p90"),
          round(max(when(col("rn") === expr("(99 * n + 99) div 100"), col("value"))), 4).as("p99"))
        .orderBy("event_type")
    },

    // Entity resolution — multi-pass BLOCKING + agreement scoring (the
    // Fellegi–Sunter shape a dedup pipeline runs on records rather than
    // text). A dirty copy of customer is derived deterministically (typo'd
    // name every 7th key, ±2-cent balance drift, wrong nation every 31st),
    // then candidates come from the UNION of two blocking passes — block A
    // on (nation, 50-unit balance bin), block B on the name's digit
    // suffix — so a pair survives any SINGLE corrupted field, and neither
    // pass is ever an all-pairs product. The blocking keys here are
    // FIXED-cardinality, so block sizes — and the Σ block-size² candidate
    // volume — grow linearly with the corpus (measured ~100× output at the
    // sf1 10× step): this exact arm is the documented baseline, and the
    // scale path is q364b's deterministic per-block-side hash-rank cap
    // (candidates ≤ 2·K²·n_blocks and ≤ 2·K·n by construction — the q189b
    // discipline applied to blocking). Agreement scores are pure integers
    // (balances compared in CENTS — no float tolerance), thresholded into
    // match / possible. At 100 TB: run the capped variant.
    q("q165_entity_resolution",
      "blocked candidate pairs + integer agreement scores over a derived dirty copy")(
      s"""$erScoredCteSql
         |SELECT cid, rid, CAST(score AS BIGINT) AS score,
         |       CASE WHEN score >= 6 THEN 'match' ELSE 'possible' END AS decision,
         |       rid - 1000000 = cid AS is_true
         |FROM scored WHERE score >= 3 ORDER BY cid, rid""".stripMargin
    ) { (s, dir) =>
      erScored(s, dir)
        .filter(col("score") >= 3)
        .select(col("cid"), col("rid"), col("score").cast("long").as("score"),
          when(col("score") >= 6, "match").otherwise("possible").as("decision"),
          (col("rid") - 1000000L === col("cid")).as("is_true"))
        .orderBy("cid", "rid")
    },

    // Golden-record survivorship — the MERGE step after q165's resolution
    // (MDM's missing half: q34h picks a whole canonical DOC; record merge
    // picks the best value PER FIELD): for every agreeing pair (score ≥ 4,
    // so the typo'd true pairs participate and the name rule genuinely
    // fires), survive the LONGEST name (typos here delete chars — longest
    // recovers the clean form), the MAX balance (deterministic freshness
    // proxy), and source-precedence nation/segment (the clean system is
    // authoritative for reference fields). Every choice carries a
    // provenance column, and |Δcents| is the per-pair quality measure a
    // stewardship queue sorts by. Row-local on top of the shared blocked
    // candidates — no new shuffle beyond q165's.
    q("q364_golden_record",
      "per-field survivorship merge over resolved pairs: golden values + provenance")(
      s"""$erScoredCteSql
         |SELECT cid, rid,
         |       CASE WHEN length(cn) >= length(dn) THEN cn ELSE dn END AS g_name,
         |       CASE WHEN length(cn) > length(dn) THEN 'clean'
         |            WHEN length(cn) < length(dn) THEN 'dirty' ELSE 'tie' END AS name_src,
         |       greatest(cc, dc) AS g_cents,
         |       CASE WHEN cc > dc THEN 'clean' WHEN dc > cc THEN 'dirty'
         |            ELSE 'tie' END AS cents_src,
         |       CAST(cnat AS BIGINT) AS g_nation, cseg AS g_segment,
         |       abs(cc - dc) AS cents_drift
         |FROM scored WHERE score >= 4 ORDER BY cid, rid""".stripMargin
    ) { (s, dir) =>
      erScored(s, dir).filter(col("score") >= 4)
        .select(col("cid"), col("rid"),
          when(length(col("cn")) >= length(col("dn")), col("cn"))
            .otherwise(col("dn")).as("g_name"),
          when(length(col("cn")) > length(col("dn")), "clean")
            .when(length(col("cn")) < length(col("dn")), "dirty")
            .otherwise("tie").as("name_src"),
          greatest(col("cc"), col("dc")).as("g_cents"),
          when(col("cc") > col("dc"), "clean")
            .when(col("dc") > col("cc"), "dirty")
            .otherwise("tie").as("cents_src"),
          col("cnat").as("g_nation"), col("cseg").as("g_segment"),
          abs(col("cc") - col("dc")).as("cents_drift"))
        .orderBy("cid", "rid")
    },

    // Capped-blocking survivorship — q364 with CORPUS-INVARIANT block
    // sizes (the round-8 verdict's one `weak`, fixed with the q189b
    // discipline): each blocking pass keeps at most K=3 records per block
    // SIDE, chosen by a deterministic hash rank (md5 of a salted record
    // id — salts differ per pass, so a record unlucky in block A can
    // still survive in block B), and only capped survivors join. Candidate
    // volume is ≤ K² per block per pass AND ≤ 2·K·n overall (each record
    // occupies one block per pass), so cost is LINEAR in the corpus by
    // construction — no Σ block² term survives, at any duplicate
    // multiplicity. The approximation semantics: pairs whose both members
    // rank ≤ K in a shared block are resolved in this pass; production
    // reruns with rotated salts (or hands oversized blocks to the
    // cluster-merge path) to recover the tail — documented, and replayed
    // IDENTICALLY by the oracle (same md5 rank, same caps). Measured at
    // the sf1 10× step: output grows ~9× (vs q364's ~100×) because each
    // replicated suffix block emits ≤ K² = 9 pairs instead of m².
    q("q364b_golden_record_capped",
      "q364 survivorship under hash-rank-capped blocking: ≤3 rows/block side, linear candidates")(
      s"""WITH $erCappedScoredCteSql
         |SELECT cid, rid,
         |       CASE WHEN length(cn) >= length(dn) THEN cn ELSE dn END AS g_name,
         |       CASE WHEN length(cn) > length(dn) THEN 'clean'
         |            WHEN length(cn) < length(dn) THEN 'dirty' ELSE 'tie' END AS name_src,
         |       greatest(cc, dc) AS g_cents,
         |       CASE WHEN cc > dc THEN 'clean' WHEN dc > cc THEN 'dirty'
         |            ELSE 'tie' END AS cents_src,
         |       CAST(cnat AS BIGINT) AS g_nation, cseg AS g_segment,
         |       abs(cc - dc) AS cents_drift
         |FROM scored WHERE score >= 4 ORDER BY cid, rid""".stripMargin
    ) { (s, dir) =>
      erCappedScored(s, dir)
        .filter(col("score") >= 4)
        .select(col("cid"), col("rid"),
          when(length(col("cn")) >= length(col("dn")), col("cn"))
            .otherwise(col("dn")).as("g_name"),
          when(length(col("cn")) > length(col("dn")), "clean")
            .when(length(col("cn")) < length(col("dn")), "dirty")
            .otherwise("tie").as("name_src"),
          greatest(col("cc"), col("dc")).as("g_cents"),
          when(col("cc") > col("dc"), "clean")
            .when(col("dc") > col("cc"), "dirty")
            .otherwise("tie").as("cents_src"),
          col("cnat").as("g_nation"), col("cseg").as("g_segment"),
          abs(col("cc") - col("dc")).as("cents_drift"))
        .orderBy("cid", "rid")
    },

    // Golden ENTITY per cluster — the ER family's final stage and the true
    // 100 TB output shape (q165 resolves pairs, q364/q364b merge per PAIR;
    // a master-data system publishes ONE row per real-world entity):
    // capped candidate pairs (score ≥ 4) become edges, StarContraction's
    // O(log²n) connected components group records into entities, and the
    // survivorship rules aggregate PER CLUSTER — longest name (4-digit
    // length-prefixed max, the portable argmax encoding), max balance,
    // clean-system precedence for nation/segment (every cluster has a
    // clean member: pairs are clean×dirty bipartite). Output cardinality
    // is O(entities), NOT O(pairs) — at sf1's 10-copy duplicate pressure
    // this emits one row per suffix-group cluster where q364b emits ≤9
    // pairs, which is exactly why the cluster-merge path is where
    // oversized blocks get handed at scale. Entity id = min member id
    // (always a clean cid: rids are offset by 10⁶). The oracle replays
    // the components as a recursive min-label closure (cluster sizes are
    // CAP-BOUNDED by construction, so the quadratic closure stays
    // fixture-cheap — the q189c lesson built in).
    q("q382_golden_entity",
      "one golden record per resolved entity cluster: CC over capped pairs + per-cluster survivorship")(
      s"""WITH RECURSIVE $erCappedScoredCteSql,
         |m AS (SELECT cid, rid FROM scored WHERE score >= 4),
         |nodes AS (
         |  SELECT DISTINCT c.cid AS id, c.name, c.nation, c.cents, c.seg, 'clean' AS src
         |  FROM clean c WHERE c.cid IN (SELECT cid FROM m)
         |  UNION ALL
         |  SELECT DISTINCT d.rid AS id, d.name, d.nation, d.cents, d.seg, 'dirty' AS src
         |  FROM dirty d WHERE d.rid IN (SELECT rid FROM m)),
         |e AS (SELECT cid AS a, rid AS b FROM m UNION SELECT rid AS a, cid AS b FROM m),
         |reach AS (SELECT id, id AS r FROM nodes
         |          UNION
         |          SELECT e.b AS id, reach.r FROM reach JOIN e ON e.a = reach.id),
         |lbl AS (SELECT id, min(r) AS entity FROM reach GROUP BY id)
         |SELECT l.entity,
         |       CAST(count(*) AS BIGINT) AS n_members,
         |       CAST(sum(CASE WHEN n.src = 'clean' THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
         |       substr(max(lpad(CAST(length(n.name) AS VARCHAR), 4, '0') || n.name), 5) AS g_name,
         |       max(n.cents) AS g_cents,
         |       CAST(min(CASE WHEN n.src = 'clean' THEN n.nation END) AS BIGINT) AS g_nation,
         |       min(CASE WHEN n.src = 'clean' THEN n.seg END) AS g_segment
         |FROM nodes n JOIN lbl l ON l.id = n.id
         |GROUP BY l.entity ORDER BY l.entity""".stripMargin
    ) { (s, dir) =>
      val sc0 = erCappedScored(s, dir).filter(col("score") >= 4)
        .select("cid", "rid", "cn", "cnat", "cc", "cseg", "dn", "dnat", "dc", "dseg")
        .cache() // edges + both node legs
      val edges = sc0.select(col("cid").as("d1"), col("rid").as("d2"))
      val lab = graft.operators.StarContraction.components(edges)
      val nodes = sc0.select(col("cid").as("id"), col("cn").as("name"),
          col("cnat").as("nation"), col("cc").as("cents"), col("cseg").as("seg"),
          lit("clean").as("src")).distinct()
        .unionByName(sc0.select(col("rid").as("id"), col("dn").as("name"),
          col("dnat").as("nation"), col("dc").as("cents"), col("dseg").as("seg"),
          lit("dirty").as("src")).distinct())
      nodes.join(lab, nodes("id") === lab("doc_id"), "left")
        .groupBy(coalesce(col("component"), col("id")).as("entity"))
        .agg(count(lit(1)).as("n_members"),
          sum(when(col("src") === "clean", 1L).otherwise(0L)).as("n_clean"),
          expr("substr(max(concat(lpad(cast(length(name) as string), 4, '0'), name)), 5)")
            .as("g_name"),
          max(col("cents")).as("g_cents"),
          min(when(col("src") === "clean", col("nation"))).as("g_nation"),
          min(when(col("src") === "clean", col("seg"))).as("g_segment"))
        .select(col("entity"), col("n_members"), col("n_clean"), col("g_name"),
          col("g_cents"), col("g_nation"), col("g_segment"))
        .orderBy("entity")
    },

    // DSIR-style data selection (Xie et al. 2023, "Data Selection for
    // Language Models via Importance Resampling" — public arXiv:2302.03169):
    // score each candidate document by how target-like its hashed n-gram
    // feature distribution is. Features are hashed unigrams (md5Long % 256
    // — the engine-portable hash, so the whole feature space is 256
    // buckets); the target corpus is the English slice, the raw corpus is
    // everything; per-bucket log importance ratios use add-one smoothing.
    // Float determinism follows q72's proven contract: each per-bucket
    // ratio is ONE fixed-shape ln expression (bit-compatible across
    // engines), rounded to 6 places BEFORE the per-doc sum, and the sum
    // runs in DECIMAL(28,6) — order-free and exact. Scale shape: two
    // partial-aggregated feature histograms + one 256-row broadcast weight
    // table + one per-doc groupBy; the corpus shuffles only (doc_id,
    // bucket) pairs, never text. Output: the 50 most-English-like
    // non-English docs — the resampling pool head.
    q("q184_dsir_selection",
      "DSIR importance weights: hashed-unigram log ratios rank non-target docs by target-likeness")(
      s"""WITH tok AS (
         |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents),
         |feat AS MATERIALIZED (
         |  SELECT doc_id, lang, ${md5LongSql("tok")} % 256 AS f FROM tok),
         |tgt AS (SELECT f, count(*) AS ct FROM feat WHERE lang = 'en' GROUP BY f),
         |rawf AS (SELECT f, count(*) AS cr FROM feat GROUP BY f),
         |tot AS (SELECT (SELECT count(*) FROM feat WHERE lang = 'en') AS nt,
         |               (SELECT count(*) FROM feat) AS nr),
         |w AS (
         |  SELECT r.f,
         |         CAST(round(ln((COALESCE(t.ct, 0) + 1.0) / (tot.nt + 256))
         |                  - ln((r.cr + 1.0) / (tot.nr + 256)), 6) AS DECIMAL(28,6)) AS lw
         |  FROM rawf r LEFT JOIN tgt t USING (f) CROSS JOIN tot),
         |scored AS (
         |  SELECT fe.doc_id, count(*) AS n_toks, sum(w.lw) AS s
         |  FROM feat fe JOIN w USING (f)
         |  WHERE fe.lang <> 'en'
         |  GROUP BY fe.doc_id)
         |SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
         |       round(CAST(s AS DOUBLE) / n_toks, 4) AS dsir_weight
         |FROM scored ORDER BY dsir_weight DESC, doc_id LIMIT 50""".stripMargin
    ) { (s, dir) =>
      val feat = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("tok"))
        .select(col("doc_id"), col("lang"), (md5Long(col("tok")) % 256).as("f"))
        .cache() // both histograms + the totals + the scoring leg
      val tgt = feat.filter(col("lang") === "en").groupBy("f").agg(count(lit(1)).as("ct"))
      val rawf = feat.groupBy("f").agg(count(lit(1)).as("cr"))
      val tot = feat.agg(
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("nt"),
        count(lit(1)).as("nr"))
      // the weight table is feature-space-bounded (256 rows) — broadcast
      val w = rawf.join(tgt, Seq("f"), "left").crossJoin(broadcast(tot))
        .select(col("f"),
          round(log((coalesce(col("ct"), lit(0L)) + lit(1.0)) / (col("nt") + 256))
              - log((col("cr") + lit(1.0)) / (col("nr") + 256)), 6)
            .cast(org.apache.spark.sql.types.DecimalType(28, 6)).as("lw"))
      feat.filter(col("lang") =!= "en")
        .join(broadcast(w), Seq("f"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"), sum(col("lw")).as("s"))
        .select(col("doc_id"), col("n_toks").cast("long").as("n_toks"),
          round(col("s").cast("double") / col("n_toks"), 4).as("dsir_weight"))
        .orderBy(col("dsir_weight").desc, col("doc_id"))
        .limit(50)
    },

    // Incremental view maintenance: keep a per-customer order summary
    // current by merging a standing aggregate STATE with the aggregate of a
    // delta batch — the historical rows are never re-read. Works because
    // every kept statistic is algebraic: count and sum merge by sum, max by
    // max, and avg is DERIVED from (sum, count) at read time rather than
    // stored — exactly the partial/final decomposition Spark's own
    // hash-aggregate uses map-side, lifted to the pipeline level. The
    // oracle is the FULL recompute over all rows; matching it proves the
    // maintenance algebra. Money runs in integer 10⁻⁴-units (BIGINT sums,
    // floor-div average) — order-free and tie-free in both engines, and the
    // final /10000 double scaling is exact (sums ≪ 2⁵³). Scale shape at
    // 100 TB: the delta leg scans only the new partition (partition-pruned
    // by the date predicate), the merge shuffles |keys| state rows — never
    // the raw history; refresh cost is O(delta + keys), independent of the
    // view's age.
    q("q185_incremental_agg",
      "incremental MV maintenance: base-state + delta-batch merge equals the full recompute")(
      """SELECT o_custkey,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS total,
        |       max(o_orderdate) AS last_order,
        |       CAST(sum(CAST(round(o_totalprice * 10000) AS BIGINT)) // count(*) AS DOUBLE)
        |         / 10000 AS avg_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin
    ) { (s, dir) =>
      val orders = Tables(s, dir, "orders")
        .withColumn("c4", round(col("o_totalprice") * 10000).cast("long"))
      val split = expr("timestamp'2000-01-01 00:00:00'")
      // the mergeable state vector: (count, integer-unit sum, max) per key
      def state(df: org.apache.spark.sql.DataFrame) = df.groupBy("o_custkey").agg(
        count(lit(1)).as("n_orders"),
        sum(col("c4")).as("sum_c4"),
        max(col("o_orderdate")).as("last_order"))
      val base = state(orders.filter(col("o_orderdate") < split)) // standing MV state
      val delta = state(orders.filter(col("o_orderdate") >= split)) // new batch only
      base.unionByName(delta)
        .groupBy("o_custkey")
        .agg(sum(col("n_orders")).as("n_orders"),
          sum(col("sum_c4")).as("sum_c4"),
          max(col("last_order")).as("last_order"))
        .select(col("o_custkey"),
          col("n_orders").cast("long").as("n_orders"),
          (col("sum_c4").cast("double") / 10000).as("total"),
          col("last_order"),
          (expr("sum_c4 div n_orders").cast("double") / 10000).as("avg_price"))
        .orderBy("o_custkey")
    },

    // The composed curation pipeline — q33 (exact dedup) → q53's gate
    // (length + distinct-token repetition, as INTEGER cross-multiplication
    // so the ratio compare is tie-free cross-engine) → q55 (per-lang
    // 512-token sequence packing), chained as ONE DataFrame lineage and
    // verified end-to-end. Each stage individually is proven elsewhere;
    // this query proves they COMPOSE — the property a user running a real
    // training-data pass actually needs, and one no per-stage oracle
    // implies (a schema/semantic mismatch at a stage boundary would pass
    // every per-stage check and still corrupt the pipeline). Scale shape:
    // dedup shuffles 16-byte hashes, the gate is row-local, packing is
    // per-lang-shard windows — the chain introduces exactly two wide ops
    // (hash groupBy + per-shard window), both key-partitioned.
    q("q191_curation_pipeline",
      "dedup → repetition gate → sequence packing, one lineage, end-to-end oracle")(
      """WITH norm AS (SELECT doc_id, lang, text,
        |                     trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        |              FROM documents),
        |keep AS (SELECT min(doc_id) AS doc_id FROM norm GROUP BY md5(norm)),
        |gate AS (SELECT n.doc_id, n.lang,
        |                CAST(len(str_split(n.text, ' ')) AS BIGINT) AS n_tok
        |         FROM norm n JOIN keep k ON n.doc_id = k.doc_id
        |         WHERE len(str_split(n.text, ' ')) >= 30
        |           AND len(list_distinct(str_split(n.text, ' '))) * 100
        |               >= len(str_split(n.text, ' ')) * 45),
        |packed AS (SELECT doc_id, lang, n_tok,
        |                  sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |                                   ROWS UNBOUNDED PRECEDING) AS cum
        |           FROM gate)
        |SELECT lang, CAST((cum - n_tok) // 512 AS BIGINT) AS seq_no,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS tok_sum,
        |       CAST(min(doc_id) AS BIGINT) AS first_doc,
        |       CAST(max(doc_id) AS BIGINT) AS last_doc
        |FROM packed GROUP BY lang, seq_no
        |ORDER BY lang, seq_no""".stripMargin
    ) { (s, dir) =>
      val norm = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"),
          trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("norm"))
      val keep = norm.groupBy(md5(col("norm")).as("h"))
        .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      val gate = norm.join(keep, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("lang"), tokens(col("text")).as("w"))
        .filter(size(col("w")) >= 30 &&
          size(array_distinct(col("w"))) * 100 >= size(col("w")) * 45)
        .select(col("doc_id"), col("lang"), size(col("w")).cast("long").as("n_tok"))
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      gate.withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("seq_no", expr("(cum - n_tok) div 512"))
        .groupBy("lang", "seq_no")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_sum"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("lang", "seq_no")
    },

    // Distributed classifier TRAINING — full-batch gradient descent on a
    // logistic gate with the piecewise-linear (hard-sigmoid) link,
    // predicting the q36c quality gate (score ≥ 0.5) from its raw signals
    // (token count, punctuation density). The 100 TB shape is MLlib's own:
    // each iteration is ONE partial-aggregated scan (map-side combine, 3
    // gradient sums + a count — a 4-long frame per partition), the model
    // (3 weights) lives on the driver and enters the next scan as literals.
    // Nothing else moves: no per-row state, no shuffle beyond the 1-row agg.
    // All arithmetic is integer fixed-point µ-units (q195's discipline) —
    // products ≤ 5e15 < 2^63, truncating `div` ≙ DuckDB `//` (both
    // round toward zero, verified for negatives) — so the trained weights
    // hash-match the oracle's 4 unrolled-CTE iterations bit for bit.
    // Training accuracy rises 55.4% (majority) → 95.6% @ sf0.01 / 94.8% @
    // sf0.1 — the gate genuinely learns, it doesn't memorize the majority.
    q("q197_logreg_gd",
      "full-batch GD logistic quality gate (hard-sigmoid, integer-exact): weights + train accuracy after 4 epochs")(
      s"""WITH m AS (SELECT len(str_split(text, ' ')) AS n_tok,
         |                  length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS n_punct,
         |                  n_chars FROM documents),
         |d AS (SELECT CAST(n_tok * 10000 - 500000 AS BIGINT) AS x1,
         |             CAST(n_punct * 1000000 // n_chars - 30000 AS BIGINT) AS x2,
         |             CAST(CASE WHEN least(n_tok / 100.0, 1.0) * (1.0 - n_punct * 1.0 / n_chars) >= 0.5
         |                       THEN 1000000 ELSE 0 END AS BIGINT) AS y
         |      FROM m),
         |nn AS (SELECT count(*) AS n FROM d),
         |w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2),
         |${(0 until 4).map(i => logregStepSql(s"w$i", s"g${i + 1}", s"w${i + 1}")).mkString(",\n")},
         |fin AS (SELECT min(w0) AS w0, min(w1) AS w1, min(w2) AS w2, min(n) AS n,
         |        sum(CASE WHEN (((w0*1000000 + w1*x1 + w2*x2) // 1000000) >= 0) = (y > 0)
         |                 THEN 1 ELSE 0 END) AS n_correct
         |        FROM d, w4, nn)
         |SELECT CAST(w0 AS BIGINT) AS w0, CAST(w1 AS BIGINT) AS w1, CAST(w2 AS BIGINT) AS w2,
         |       CAST(n_correct AS BIGINT) AS n_correct, CAST(n AS BIGINT) AS n,
         |       CAST(n_correct * 1000 // n AS BIGINT) AS acc_milli
         |FROM fin""".stripMargin
    ) { (s, dir) =>
      // Driver-held model state (3 longs) — the distributed-GD contract:
      // the SCAN is distributed, the O(d) model is not (trainLogreg).
      val d = logregFeatures(s, dir)
        .cache() // 4 gradient scans + the final accuracy scan
      val (w0, w1, w2) = trainLogreg(d)
      d.select(expr(s"CASE WHEN (((CAST($w0 AS BIGINT)*1000000 + CAST($w1 AS BIGINT)*x1 " +
          s"+ CAST($w2 AS BIGINT)*x2) div 1000000) >= 0) = (y > 0) THEN 1 ELSE 0 END").as("c"))
        .agg(sum(col("c")).as("n_correct"), count(lit(1)).as("n"))
        .select(lit(w0).as("w0"), lit(w1).as("w1"), lit(w2).as("w2"),
          col("n_correct").cast("long").as("n_correct"), col("n"),
          expr("CAST(n_correct * 1000 div n AS BIGINT)").as("acc_milli"))
    },

    // Exact AUC (Mann–Whitney U) — the standard evaluation of a filtering
    // classifier's ranking power, here scoring n_chars as a per-source
    // detector of lang='en'. Tie-correct via average ranks WITHOUT ranking
    // rows: group to the per-(source, score) HISTOGRAM first (bounded by
    // |sources|·|distinct scores| — metadata scale, like q194's bins), then
    // one partitioned cumulative window over the histogram yields
    // 2·Σranks(pos) as pure integers: AUC = (2S − np(np+1)) / (2·np·nn).
    // At 100 TB the only row-scale op is the histogram partial agg; the
    // window runs over thousands of rows, not billions — and the integer U
    // statistic hash-matches the oracle with no floating-point rank sums.
    q("q198_auc_eval",
      "exact tie-corrected AUC per source: n_chars as an en-detector (integer U statistic)")(
      """WITH d AS (SELECT source, n_chars AS score,
        |                  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
        |g AS (SELECT source, score, count(*) AS c, sum(y) AS p FROM d GROUP BY source, score),
        |cum AS (SELECT source, c, p,
        |        coalesce(sum(c) OVER (PARTITION BY source ORDER BY score
        |                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |        FROM g),
        |t AS (SELECT source, sum(p * (2*cb + c + 1)) AS s2, sum(p) AS np, sum(c) - sum(p) AS nn
        |      FROM cum GROUP BY source)
        |SELECT source, CAST(np AS BIGINT) AS np, CAST(nn AS BIGINT) AS nn,
        |       CAST(s2 - np*(np+1) AS BIGINT) AS u2,
        |       round((s2 - np*(np+1)) / (2.0 * greatest(np * nn, 1)), 4) AS auc
        |FROM t ORDER BY source""".stripMargin
    ) { (s, dir) =>
      val g = Tables.fanout(s, dir, "documents")
        .select(col("source"), col("n_chars").as("score"),
          when(col("lang") === "en", 1).otherwise(0).as("y"))
        .groupBy("source", "score")
        .agg(count(lit(1)).as("c"), sum(col("y")).as("p"))
      val w = Window.partitionBy("source").orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
      g.withColumn("cb", coalesce(sum(col("c")).over(w), lit(0L)))
        .groupBy("source")
        .agg(sum(col("p") * (col("cb") * 2 + col("c") + 1)).as("s2"),
          sum(col("p")).as("np"), (sum(col("c")) - sum(col("p"))).as("nn"))
        .select(col("source"), col("np").cast("long").as("np"),
          col("nn").cast("long").as("nn"),
          expr("CAST(s2 - np*(np+1) AS BIGINT)").as("u2"),
          // column-level double division — Spark would parse a SQL-text
          // `2.0` as DECIMAL(2,1) and produce a DECIMAL(26,4) auc
          round((col("s2") - col("np") * (col("np") + lit(1))).cast("double")
            / (greatest(col("np") * col("nn"), lit(1L)).cast("double") * 2.0), 4)
            .as("auc"))
        .orderBy("source")
    },

    // Calibration (reliability) bins of the q197 gate — the eval that AUC
    // cannot give: does the predicted probability MEAN what it says? Train
    // identically (bit-identical weights), then bucket every doc's
    // hard-sigmoid score into deciles and compare mean predicted
    // probability vs observed positive rate per bin — all integer
    // milli-units off the same fixed-point score, so every bin row
    // hash-matches. One training pass + ONE grouped scan; the bin frame is
    // ≤10 rows at any corpus size.
    q("q200_calibration",
      "reliability bins of the trained quality gate: mean predicted vs observed rate per score decile")(
      s"""WITH ${logregFeatureCtesSql(withSplit = false)},
         |nn AS (SELECT count(*) AS n FROM d),
         |w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2),
         |${(0 until 4).map(i => logregStepSql(s"w$i", s"g${i + 1}", s"w${i + 1}")).mkString(",\n")},
         |sc AS (SELECT y, least(greatest(500000 + ((w0*1000000 + w1*x1 + w2*x2) // 1000000), 0), 1000000) AS s
         |       FROM d, w4),
         |b AS (SELECT least(s // 100000, 9) AS bin, count(*) AS n,
         |             sum(CASE WHEN y > 0 THEN 1 ELSE 0 END) AS n_pos, sum(s) AS ss
         |      FROM sc GROUP BY bin)
         |SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
         |       CAST(ss // (n * 1000) AS BIGINT) AS pred_milli,
         |       CAST(n_pos * 1000 // n AS BIGINT) AS obs_milli
         |FROM b ORDER BY bin""".stripMargin
    ) { (s, dir) =>
      val d = logregFeatures(s, dir).cache() // 4 gradient scans + binning
      val (w0, w1, w2) = trainLogreg(d)
      d.select(expr(sigSql(w0, w1, w2)).as("s"), col("y"))
        .select(expr("least(s div 100000, 9)").as("bin"), col("s"), col("y"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          sum(when(col("y") > 0, 1).otherwise(0)).as("n_pos"),
          sum(col("s")).as("ss"))
        .select(col("bin").cast("long").as("bin"), col("n"),
          col("n_pos").cast("long").as("n_pos"),
          expr("CAST(ss div (n * 1000) AS BIGINT)").as("pred_milli"),
          expr("CAST(n_pos * 1000 div n AS BIGINT)").as("obs_milli"))
        .orderBy("bin")
    },

    // Holdout evaluation — the train/test discipline every real pipeline
    // needs before trusting a filter: deterministic 5-way md5 split
    // (q167's discipline), train the q197 gate on the 4/5 shard, report the
    // confusion matrix + accuracy on the UNSEEN 1/5. Generalization is
    // real: 93.3% holdout accuracy @ sf0.01 vs the 50.5% holdout majority.
    // Same two-scan shape as q197 — the split adds one pruned filter on
    // the cached feature frame, nothing else.
    q("q201_holdout_eval",
      "train on the 80% md5 shard, confusion matrix + accuracy on the held-out 20%")(
      s"""WITH ${logregFeatureCtesSql(withSplit = true)},
         |d AS (SELECT x1, x2, y FROM f WHERE sp <> 0),
         |nn AS (SELECT count(*) AS n FROM d),
         |w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2),
         |${(0 until 4).map(i => logregStepSql(s"w$i", s"g${i + 1}", s"w${i + 1}")).mkString(",\n")},
         |ho AS (SELECT x1, x2, y FROM f WHERE sp = 0),
         |pr AS (SELECT y, ((w0*1000000 + w1*x1 + w2*x2) // 1000000) >= 0 AS pred FROM ho, w4),
         |cf AS (SELECT sum(CASE WHEN pred AND y > 0 THEN 1 ELSE 0 END) AS tp,
         |              sum(CASE WHEN pred AND y = 0 THEN 1 ELSE 0 END) AS fp,
         |              sum(CASE WHEN NOT pred AND y = 0 THEN 1 ELSE 0 END) AS tn,
         |              sum(CASE WHEN NOT pred AND y > 0 THEN 1 ELSE 0 END) AS fneg,
         |              count(*) AS n_test FROM pr)
         |SELECT CAST(w.w0 AS BIGINT) AS w0, CAST(w.w1 AS BIGINT) AS w1, CAST(w.w2 AS BIGINT) AS w2,
         |       CAST(nn.n AS BIGINT) AS n_train, CAST(n_test AS BIGINT) AS n_test,
         |       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
         |       CAST(tn AS BIGINT) AS tn, CAST(fneg AS BIGINT) AS fneg,
         |       CAST((tp + tn) * 1000 // n_test AS BIGINT) AS acc_milli
         |FROM cf, w4 w, nn""".stripMargin
    ) { (s, dir) =>
      val f = logregFeatures(s, dir).cache() // both shards below
      val train = f.filter(col("sp") =!= 0).select("x1", "x2", "y")
      val (w0, w1, w2) = trainLogreg(train)
      val nTrain = train.count()
      f.filter(col("sp") === 0)
        .select(expr(s"((CAST($w0 AS BIGINT)*1000000 + CAST($w1 AS BIGINT)*x1 " +
          s"+ CAST($w2 AS BIGINT)*x2) div 1000000) >= 0").as("pred"), col("y"))
        .agg(sum(when(col("pred") && col("y") > 0, 1).otherwise(0)).as("tp"),
          sum(when(col("pred") && col("y") === 0, 1).otherwise(0)).as("fp"),
          sum(when(!col("pred") && col("y") === 0, 1).otherwise(0)).as("tn"),
          sum(when(!col("pred") && col("y") > 0, 1).otherwise(0)).as("fneg"),
          count(lit(1)).as("n_test"))
        .select(lit(w0).as("w0"), lit(w1).as("w1"), lit(w2).as("w2"),
          lit(nTrain).as("n_train"), col("n_test"),
          col("tp").cast("long").as("tp"), col("fp").cast("long").as("fp"),
          col("tn").cast("long").as("tn"), col("fneg").cast("long").as("fneg"),
          expr("CAST((tp + tn) * 1000 div n_test AS BIGINT)").as("acc_milli"))
    },

    // Hyperparameter grid search — the model-selection step the trainer
    // family (q197 train, q198 ranking, q200 calibration, q201 holdout)
    // still lacked: a THREE-way split (train sp≥2 / val sp=1 / test sp=0),
    // one 4-epoch integer-GD model per learning rate in {1,2,4}, selection
    // by VALIDATION accuracy (tiebreak: smaller lr), test reported per arm
    // for transparency but the winner flag is val-only — the hygiene that
    // keeps the test shard out of every selection decision. 100 TB shape:
    // the grid shares ONE cached feature scan; each arm is 4 partial-
    // aggregated gradient scans + two 1-row eval frames; the model state
    // is 3 driver-held longs per arm (the q197 contract), and the winner
    // pick is a 3-row metadata fold. The oracle unrolls all three CTE
    // chains with the SAME step text, so every weight hash-matches.
    q("q313_lr_grid_search",
      "learning-rate grid over the integer GD trainer: val-selected winner, per-arm test report")(
      {
        val arms = Seq(("a", 1L), ("b", 2L), ("c", 4L))
        val chains = arms.map { case (p, lr) =>
          s"""${p}_w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2),
             |${(0 until 4).map(i => logregStepSql(s"${p}_w$i", s"${p}_g${i + 1}", s"${p}_w${i + 1}",
                lr, "dtr", "nn")).mkString(",\n")},
             |${p}_val AS (SELECT CAST($lr AS BIGINT) AS lr, min(w0) AS w0, min(w1) AS w1, min(w2) AS w2,
             |  sum(CASE WHEN (((w0*1000000 + w1*x1 + w2*x2) // 1000000) >= 0) = (y > 0)
             |           THEN 1 ELSE 0 END) AS val_correct, count(*) AS val_n
             |  FROM dval, ${p}_w4),
             |${p}_test AS (SELECT sum(CASE WHEN (((w0*1000000 + w1*x1 + w2*x2) // 1000000) >= 0) = (y > 0)
             |                    THEN 1 ELSE 0 END) AS test_correct, count(*) AS test_n
             |  FROM dtest, ${p}_w4),
             |arm_$p AS (SELECT lr, w0, w1, w2, val_correct, val_n, test_correct, test_n
             |           FROM ${p}_val, ${p}_test)""".stripMargin
        }.mkString(",\n")
        s"""WITH ${logregFeatureCtesSql(withSplit = true)},
           |dtr AS (SELECT x1, x2, y FROM f WHERE sp >= 2),
           |nn AS (SELECT count(*) AS n FROM dtr),
           |dval AS (SELECT x1, x2, y FROM f WHERE sp = 1),
           |dtest AS (SELECT x1, x2, y FROM f WHERE sp = 0),
           |$chains,
           |arms AS (SELECT * FROM arm_a UNION ALL SELECT * FROM arm_b UNION ALL SELECT * FROM arm_c),
           |best AS (SELECT max(1000000 * val_correct - lr) AS bk FROM arms)
           |SELECT arms.lr, CAST(w0 AS BIGINT) AS w0, CAST(w1 AS BIGINT) AS w1,
           |       CAST(w2 AS BIGINT) AS w2,
           |       CAST(val_correct AS BIGINT) AS val_correct, CAST(val_n AS BIGINT) AS val_n,
           |       CAST(test_correct AS BIGINT) AS test_correct, CAST(test_n AS BIGINT) AS test_n,
           |       CAST(CASE WHEN 1000000 * val_correct - lr = bk THEN 1 ELSE 0 END AS BIGINT) AS is_winner
           |FROM arms, best ORDER BY arms.lr""".stripMargin
      }
    ) { (s, dir) =>
      val f = logregFeatures(s, dir).cache() // 3 arms × (12 gradient + 2 eval) scans
      val tr = f.filter(col("sp") >= 2).select("x1", "x2", "y")
      val arms = Seq(1L, 2L, 4L).map { lr =>
        val (w0, w1, w2) = trainLogreg(tr, lr)
        val score = s"CASE WHEN (((CAST($w0 AS BIGINT)*1000000 + CAST($w1 AS BIGINT)*x1 " +
          s"+ CAST($w2 AS BIGINT)*x2) div 1000000) >= 0) = (y > 0) THEN 1 ELSE 0 END"
        val v = f.filter(col("sp") === 1).select(expr(score).as("c"))
          .agg(sum(col("c")).as("val_correct"), count(lit(1)).as("val_n"))
        val t = f.filter(col("sp") === 0).select(expr(score).as("c"))
          .agg(sum(col("c")).as("test_correct"), count(lit(1)).as("test_n"))
        v.crossJoin(t).select(lit(lr).as("lr"), lit(w0).as("w0"), lit(w1).as("w1"),
          lit(w2).as("w2"), col("val_correct").cast("long").as("val_correct"),
          col("val_n"), col("test_correct").cast("long").as("test_correct"), col("test_n"))
      }.reduce(_ unionByName _)
      val best = arms.agg(max(expr("1000000 * val_correct - lr")).as("bk"))
      arms.crossJoin(broadcast(best))
        .select(col("lr"), col("w0"), col("w1"), col("w2"), col("val_correct"),
          col("val_n"), col("test_correct"), col("test_n"),
          when(expr("1000000 * val_correct - lr = bk"), 1L).otherwise(0L).as("is_winner"))
        .orderBy("lr")
    },

    // The full curation funnel as ONE lineage — the flagship composition
    // of the pipeline's standalone stages, each reusing its twin's EXACT
    // predicate so the funnel is consistent with q36b/q36c/q33/q52-q61/q60:
    //   0 all → 1 langid (q36b marker rule, keep pred='en')
    //         → 2 quality (q36c score ≥ 0.5, unrounded — identical IEEE
    //           expression shape both engines)
    //         → 3 exact dedup (q33 normalize→md5, keep min doc_id per hash)
    //         → 4 decontaminate (drop any doc sharing an 8-token shingle
    //           hash with the md5%100 ≥ 90 holdout split — Lee-style
    //           substring decontamination; holdout docs self-match and
    //           fall out, exactly "test data leaves the training set")
    //         → 5 token budget (per-source hash-ordered cumulative
    //           whitespace-token cap at 512 — q60's shape keyed by source; 512 binds at every fixture scale, 20 sources)
    // Output = the per-stage funnel report (docs, tokens) a data engineer
    // actually ships. 100 TB shape: every stage is one scan/one grouped
    // pass over the shrinking survivor frame; the only corpus-width joins
    // key on 8-byte hashes (dedup group, holdout shingles — holdout side
    // broadcast, bounded by the split fraction); the budget window
    // partitions by source. The report rows are six 1-row aggregates.
    q("q208_curation_funnel",
      "end-to-end curation funnel: langid→quality→dedup→decontaminate→budget, per-stage report")(
      s"""WITH base AS (SELECT doc_id, text, lang, source, n_chars,
         |                     str_split(text, ' ') AS w,
         |                     ${md5LongSql("text")} % 100 AS b,
         |                     CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
         |              FROM documents),
         |s1 AS (SELECT * FROM (
         |         SELECT *,
         |${TextQueries.markers.map { case (l, ws) =>
             s"           len(list_filter(w, x -> x IN (${TextQueries.inListSql(ws)}))) AS n_$l"
           }.mkString(",\n")}
         |         FROM base)
         |       WHERE n_en >= n_fr AND n_en >= n_es AND n_en >= n_de AND n_en >= n_zh),
         |s2 AS (SELECT * FROM (
         |         SELECT *, length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS n_punct
         |         FROM s1)
         |       WHERE least(n_tok / 100.0, 1.0) * (1.0 - n_punct * 1.0 / n_chars) >= 0.5),
         |hgrp AS (SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h, min(doc_id) AS keeper
         |         FROM s2 GROUP BY 1),
         |s3 AS (SELECT s2.* FROM s2
         |       JOIN hgrp ON md5(trim(regexp_replace(lower(s2.text), '\\s+', ' ', 'g'))) = hgrp.h
         |                AND s2.doc_id = hgrp.keeper),
         |hold AS (SELECT DISTINCT unnest(list_transform(list_distinct(${shinglesSql("w", 8)}),
         |                                               g -> ${md5LongSql("g")})) AS h
         |         FROM base WHERE b >= 90 AND len(w) >= 8),
         |contam AS (SELECT DISTINCT doc_id FROM
         |             (SELECT doc_id, unnest(list_transform(list_distinct(${shinglesSql("w", 8)}),
         |                                                   g -> ${md5LongSql("g")})) AS h
         |              FROM s3 WHERE len(w) >= 8) sh
         |           JOIN hold USING (h)),
         |s4 AS (SELECT * FROM s3 WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
         |s5 AS (SELECT * FROM (
         |         SELECT *, sum(n_tok) OVER (PARTITION BY source
         |                                    ORDER BY ${md5LongSql("text")}, doc_id
         |                                    ROWS UNBOUNDED PRECEDING) AS cum
         |         FROM s4)
         |       WHERE cum <= 512)
         |SELECT stage, CAST(n_docs AS BIGINT) AS n_docs, CAST(n_tokens AS BIGINT) AS n_tokens
         |FROM (
         |  SELECT '0_all' AS stage, count(*) AS n_docs, sum(n_tok) AS n_tokens FROM base
         |  UNION ALL SELECT '1_langid', count(*), sum(n_tok) FROM s1
         |  UNION ALL SELECT '2_quality', count(*), sum(n_tok) FROM s2
         |  UNION ALL SELECT '3_exact_dedup', count(*), sum(n_tok) FROM s3
         |  UNION ALL SELECT '4_decontaminated', count(*), sum(n_tok) FROM s4
         |  UNION ALL SELECT '5_token_budget', count(*), sum(n_tok) FROM s5)
         |ORDER BY stage""".stripMargin
    ) { (s, dir) =>
      // Survival-flag formulation (round-7 reshape): rather than
      // materializing five shrinking frames and rescanning each for its
      // report row (six aggregate branches over four caches), tag every
      // document with per-stage survival flags f1..f5 in ONE lineage and
      // derive all six report rows from a SINGLE grouped aggregation.
      // Stage predicates are pure per-row once three keyed columns are
      // joined in: the dedup keeper (min doc_id per normalized-text hash
      // among quality survivors — a hash-partitioned window), the
      // contamination membership (shingle-hash semi-join vs the broadcast
      // holdout set, computed from ONE cached shingle frame), and the
      // per-source budget cumsum (source-partitioned window masked to f4
      // rows). 100 TB shape unchanged: two hash-keyed windows + one
      // broadcast join, but the corpus is scanned once, not six times,
      // and the 8-shingle explode+md5 runs once, not twice.
      val base = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"),
          tokens(col("text")).as("w"), (md5Long(col("text")) % 100).as("b"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .cache() // flag lineage + shingle frame both read it
      // shingle-hash frame: computed ONCE over all docs (holdout split and
      // contamination probe are both row-subsets of it)
      val sh = base.filter(size(col("w")) >= 8)
        .select(col("doc_id"), col("b"),
          explode(transform(array_distinct(shingles(col("w"), 8)), g => md5Long(g))).as("h"))
        .cache()
      val hold = sh.filter(col("b") >= 90).select("h").distinct()
      val contamIds = sh.join(broadcast(hold), "h")
        .select("doc_id").distinct()
        .withColumn("contam", lit(true))
      // f1: q36b's marker rule (predicted-en). f2: q36c's quality ≥ 0.5.
      val withScores = TextQueries.markers.foldLeft(base) { case (df, (l, ws)) =>
        df.withColumn(s"n_$l",
          size(filter(col("w"), x => x.isin(ws.map(_.asInstanceOf[Any]): _*))))
      }
      val nPunct = length(col("text")) -
        length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""))
      val flagged = withScores
        .withColumn("f1", col("n_en") >= col("n_fr") && col("n_en") >= col("n_es")
          && col("n_en") >= col("n_de") && col("n_en") >= col("n_zh"))
        .withColumn("f2", col("f1") &&
          least(col("n_tok") / 100.0, lit(1.0))
            * (lit(1.0) - nPunct * lit(1.0) / col("n_chars")) >= 0.5)
      // f3: q33's keeper rule — min doc_id among f2 survivors sharing the
      // normalized-text hash (window partitioned by the hash: keyed, never
      // global; null keeper only when the group has no f2 row, masked by f2)
      val norm = md5(trim(regexp_replace(lower(col("text")), "\\s+", " ")))
      val hWin = Window.partitionBy(col("nh"))
      val withKeeper = flagged.withColumn("nh", norm)
        .withColumn("keeper", min(when(col("f2"), col("doc_id"))).over(hWin))
        .withColumn("f3", col("f2") && col("doc_id") === col("keeper"))
      // f4: contamination is doc-intrinsic vs the fixed holdout shingle set,
      // so the flag restricted to f3 rows equals the original s3-only probe
      val withContam = withKeeper.join(contamIds, Seq("doc_id"), "left")
        .withColumn("f4", col("f3") && !coalesce(col("contam"), lit(false)))
      // f5: q60's hash-ordered running budget keyed by source — non-f4 rows
      // contribute 0 to the cumsum so f4 rows see exactly the s4-only total
      val wWin = Window.partitionBy(col("source"))
        .orderBy(md5Long(col("text")), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val flags = withContam
        .withColumn("cum", sum(when(col("f4"), col("n_tok")).otherwise(lit(0L))).over(wWin))
        .withColumn("f5", col("f4") && col("cum") <= 512)
      // ONE grouped aggregation → all six report rows (reshaped via a
      // 6-element array explode of the 1-row aggregate — no rescans)
      def d(f: org.apache.spark.sql.Column) =
        coalesce(sum(when(f, lit(1L)).otherwise(lit(0L))), lit(0L))
      def t(f: org.apache.spark.sql.Column) =
        coalesce(sum(when(f, col("n_tok")).otherwise(lit(0L))), lit(0L))
      val rep = flags.agg(
        count(lit(1)).as("d0"), coalesce(sum(col("n_tok")), lit(0L)).as("t0"),
        d(col("f1")).as("d1"), t(col("f1")).as("t1"),
        d(col("f2")).as("d2"), t(col("f2")).as("t2"),
        d(col("f3")).as("d3"), t(col("f3")).as("t3"),
        d(col("f4")).as("d4"), t(col("f4")).as("t4"),
        d(col("f5")).as("d5"), t(col("f5")).as("t5"))
      def row(stage: String, i: Int) = struct(lit(stage).as("stage"),
        col(s"d$i").as("n_docs"), col(s"t$i").as("n_tokens"))
      rep.select(explode(array(
          row("0_all", 0), row("1_langid", 1), row("2_quality", 2),
          row("3_exact_dedup", 3), row("4_decontaminated", 4),
          row("5_token_budget", 5))).as("r"))
        .select(col("r.stage").as("stage"), col("r.n_docs").as("n_docs"),
          col("r.n_tokens").as("n_tokens"))
        .orderBy("stage")
    },

    // RAG document chunking — fixed 64-token windows at stride 48 (16-token
    // overlap), the retrieval-side sibling of q54's training-side packing:
    // every embedding/index pipeline runs this pass first. Pure row-local
    // fan-out (sequence → explode → slice), no shuffle until the final
    // order — at 100 TB this is a map-only stage that pipelines into the
    // embedder. Chunk content crosses the oracle as its 60-bit hash (the
    // usual 8-byte discipline — proves token-exact chunk equality without
    // shipping text); starts stop BEFORE len so every chunk is non-empty
    // and the tail chunk is the only short one (standard sliding-window
    // chunker semantics).
    q("q210_chunk_overlap",
      "RAG chunker: 64-token windows, stride 48 — per-chunk token count + content hash")(
      s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS w,
         |                  len(str_split(text, ' ')) AS n FROM documents),
         |ch AS (SELECT doc_id, n, unnest(range(0, n, 48)) AS s FROM t WHERE n >= 1)
         |SELECT ch.doc_id, CAST(ch.s // 48 AS BIGINT) AS chunk_idx,
         |       CAST(least(64, ch.n - ch.s) AS BIGINT) AS n_tok,
         |       ${md5LongSql("array_to_string(t.w[ch.s + 1 : ch.s + 64], ' ')")} AS chunk_hash
         |FROM ch JOIN t USING (doc_id)
         |ORDER BY doc_id, chunk_idx""".stripMargin
    ) { (s, dir) =>
      Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("w"))
        .withColumn("n", size(col("w")))
        .filter(col("n") >= 1)
        .select(col("doc_id"), col("w"), col("n"),
          explode(sequence(lit(0), col("n") - 1, lit(48))).as("s"))
        .select(col("doc_id"), (col("s") / 48).cast("long").as("chunk_idx"),
          least(lit(64), col("n") - col("s")).cast("long").as("n_tok"),
          md5Long(array_join(slice(col("w"), col("s") + 1, lit(64)), " ")).as("chunk_hash"))
        .orderBy("doc_id", "chunk_idx")
    },

    // The dataset card — the corpus-level report every published training
    // set ships: per source and for the whole corpus, document and token
    // counts, exact vocabulary size, type-token ratio, and length
    // percentiles. Percentiles come from the (source, len) HISTOGRAM, not
    // a row sort: cumulative counts over ≤|len-domain| metadata rows give
    // the exact discrete p50/p90 (min len with 2·cum ≥ n / 10·cum ≥ 9·n) —
    // integer arithmetic only, q194's bins-not-rows discipline, no
    // interpolated-quantile float contract anywhere. Scale shape: one
    // token explode feeding two partial-aggregated counts (the vocab
    // distinct collapses (source, tok) map-side), one doc-level scan for
    // the histogram; every downstream frame is metadata-sized.
    q("q212_dataset_card",
      "dataset card: per-source + global docs/tokens/vocab/TTR and histogram-exact p50/p90 lengths")(
      """WITH d AS (SELECT source, len(str_split(text, ' ')) AS n_tok FROM documents),
        |tk AS (SELECT source, unnest(str_split(text, ' ')) AS tok FROM documents),
        |a1 AS (SELECT source AS src, CAST(count(*) AS BIGINT) AS n_docs,
        |              CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM d GROUP BY source
        |       UNION ALL
        |       SELECT '_all', CAST(count(*) AS BIGINT), CAST(sum(n_tok) AS BIGINT) FROM d),
        |a2 AS (SELECT source AS src, CAST(count(DISTINCT tok) AS BIGINT) AS vocab
        |       FROM tk GROUP BY source
        |       UNION ALL SELECT '_all', CAST(count(DISTINCT tok) AS BIGINT) FROM tk),
        |hist AS (SELECT source AS src, n_tok AS len, CAST(count(*) AS BIGINT) AS c
        |         FROM d GROUP BY source, n_tok
        |         UNION ALL
        |         SELECT '_all', n_tok, CAST(count(*) AS BIGINT) FROM d GROUP BY n_tok),
        |cum AS (SELECT src, len,
        |               CAST(sum(c) OVER (PARTITION BY src ORDER BY len
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |               CAST(sum(c) OVER (PARTITION BY src) AS BIGINT) AS n
        |        FROM hist),
        |pct AS (SELECT src, CAST(min(CASE WHEN 2 * cum >= n THEN len END) AS BIGINT) AS p50_len,
        |               CAST(min(CASE WHEN 10 * cum >= 9 * n THEN len END) AS BIGINT) AS p90_len
        |        FROM cum GROUP BY src)
        |SELECT a1.src AS source, n_docs, n_tokens, vocab,
        |       CAST(1000 * vocab // n_tokens AS BIGINT) AS ttr_milli, p50_len, p90_len
        |FROM a1 JOIN a2 USING (src) JOIN pct USING (src)
        |ORDER BY source""".stripMargin
    ) { (s, dir) =>
      val docs = Tables.fanout(s, dir, "documents")
        .select(col("source"), col("text"))
      val d = docs.select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
        .cache() // a1 both arms + histogram both arms
      val tk = docs.select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .cache() // vocab both arms
      val a1 = d.groupBy("source").agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"))
        .select(col("source").as("src"), col("n_docs"), col("n_tokens"))
        .unionAll(d.agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
          .select(lit("_all").as("src"), col("n_docs"), col("n_tokens")))
      val a2 = tk.groupBy("source").agg(countDistinct(col("tok")).as("vocab"))
        .select(col("source").as("src"), col("vocab"))
        .unionAll(tk.agg(countDistinct(col("tok")).as("vocab"))
          .select(lit("_all").as("src"), col("vocab")))
      val hist = d.groupBy("source", "n_tok").agg(count(lit(1)).as("c"))
        .select(col("source").as("src"), col("n_tok").as("len"), col("c"))
        .unionAll(d.groupBy("n_tok").agg(count(lit(1)).as("c"))
          .select(lit("_all").as("src"), col("n_tok").as("len"), col("c")))
      val wCum = Window.partitionBy(col("src")).orderBy(col("len"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("src"))
      val pct = hist
        .select(col("src"), col("len"), sum(col("c")).over(wCum).as("cum"),
          sum(col("c")).over(wAll).as("n"))
        .groupBy("src")
        .agg(min(when(lit(2) * col("cum") >= col("n"), col("len"))).as("p50_len"),
          min(when(lit(10) * col("cum") >= lit(9) * col("n"), col("len"))).as("p90_len"))
      a1.join(a2, "src").join(pct, "src")
        .select(col("src").as("source"), col("n_docs"), col("n_tokens"), col("vocab"),
          expr("CAST(1000 * vocab div n_tokens AS BIGINT)").as("ttr_milli"),
          col("p50_len"), col("p90_len"))
        .orderBy("source")
    },

    // Preference-pair mining — the DPO/RLHF-style construction: within
    // each (source, length-bucket) stratum, pair the highest-quality doc
    // (chosen) with the lowest (rejected), so a reward/preference model
    // trains on quality contrast while length and domain are CONTROLLED
    // (the classic confound in preference data). Quality = q36c's score
    // floored to exact milli; argmax/argmin fold into ONE BIGINT encoding
    // smilli·100000 + (99999 − doc_id) so plain max()/min() — identical
    // both engines — carry the winner and its id with a deterministic
    // tie-break (q183's mode-encoding discipline; margin 0 pairs are the
    // all-tied strata, kept to show the rule). Scale shape: one scan
    // computing the score, one partial-aggregated (source, bucket) pass —
    // never a per-stratum sort; output is |strata|-bounded.
    q("q215_preference_pairs",
      "DPO-style pairs: per (source, length-bucket) chosen=max vs rejected=min quality")(
      """WITH m AS (SELECT doc_id, source,
        |                  CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok,
        |                  length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS n_punct,
        |                  n_chars
        |           FROM documents),
        |sc AS (SELECT doc_id, source, n_tok // 20 AS bucket,
        |              CAST(floor(1000 * least(n_tok / 100.0, 1.0) *
        |                         (1.0 - n_punct * 1.0 / n_chars)) AS BIGINT) AS smilli
        |       FROM m),
        |enc AS (SELECT source, bucket,
        |               CAST(count(*) AS BIGINT) AS n,
        |               max(smilli * 100000 + (99999 - doc_id)) AS mx,
        |               min(smilli * 100000 + (99999 - doc_id)) AS mn
        |        FROM sc GROUP BY source, bucket HAVING count(*) >= 2)
        |SELECT source, CAST(bucket AS BIGINT) AS bucket, n,
        |       CAST(99999 - (mx % 100000) AS BIGINT) AS chosen,
        |       CAST(99999 - (mn % 100000) AS BIGINT) AS rejected,
        |       CAST(mx // 100000 - mn // 100000 AS BIGINT) AS margin_milli
        |FROM enc ORDER BY source, bucket""".stripMargin
    ) { (s, dir) =>
      val nPunct = length(col("text")) -
        length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""))
      val sc = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          nPunct.as("n_punct"), col("n_chars"))
        .select(col("doc_id"), col("source"), expr("n_tok div 20").as("bucket"),
          floor(lit(1000) * least(col("n_tok") / 100.0, lit(1.0))
            * (lit(1.0) - col("n_punct") * lit(1.0) / col("n_chars")))
            .cast("long").as("smilli"))
      val e = col("smilli") * 100000L + (lit(99999L) - col("doc_id"))
      sc.groupBy("source", "bucket")
        .agg(count(lit(1)).as("n"), max(e).as("mx"), min(e).as("mn"))
        .filter(col("n") >= 2)
        .select(col("source"), col("bucket").cast("long").as("bucket"), col("n"),
          (lit(99999L) - (col("mx") % 100000L)).cast("long").as("chosen"),
          (lit(99999L) - (col("mn") % 100000L)).cast("long").as("rejected"),
          expr("CAST(mx div 100000 - mn div 100000 AS BIGINT)").as("margin_milli"))
        .orderBy("source", "bucket")
    },

    // Balanced output sharding — the "write N equal training files"
    // operator every 100 TB corpus job ends with: docs ranked by token
    // count (largest first, two-pass DistributedRank — no global window),
    // then dealt serpentine across 8 shards (rank r → s = r mod 16, shard
    // = s if s < 8 else 15-s), so each shard receives one doc from every
    // size stratum alternating from both ends — the deterministic,
    // shuffle-free approximation of LPT bin packing (greedy LPT is
    // inherently sequential; serpentine gets within ~1 stratum of it and
    // assigns each row independently from its rank). The shards are
    // actually WRITTEN (partitionBy(shard)) and the report reads them
    // BACK (q160b's layout-loop discipline), so the balance numbers come
    // from the files a downstream trainer would read. skew_milli =
    // shard_tokens × 8000 / corpus_tokens (1000 = perfectly balanced)
    // makes imbalance a checked quantity: the spread at both fixture
    // scales stays within a few per mil.
    q("q220_balanced_shards",
      "serpentine LPT sharding into 8 written files with read-back balance report")(
      """WITH d AS (SELECT doc_id, len(str_split(text, ' '))::BIGINT AS n_tok FROM documents),
        |r AS (SELECT doc_id, n_tok,
        |             row_number() OVER (ORDER BY n_tok DESC, doc_id) - 1 AS r0
        |      FROM d),
        |sh AS (SELECT doc_id, n_tok,
        |              CASE WHEN r0 % 16 < 8 THEN r0 % 16 ELSE 15 - r0 % 16 END AS shard
        |       FROM r),
        |agg AS (SELECT shard, count(*) AS n_docs,
        |               CAST(sum(n_tok) AS BIGINT) AS tok_sum FROM sh GROUP BY shard),
        |tot AS (SELECT sum(tok_sum) AS t FROM agg)
        |SELECT shard, n_docs, tok_sum,
        |       CAST(tok_sum * 8000 // tot.t AS BIGINT) AS skew_milli
        |FROM agg, tot ORDER BY shard""".stripMargin
    ) { (s, dir) =>
      val d = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      val ranked = DistributedRank.withRowNumber(
        d, Seq(col("n_tok").desc, col("doc_id")), "rn")
      val assigned = ranked
        .withColumn("s0", (col("rn") - 1) % 16)
        .withColumn("shard",
          when(col("s0") < 8, col("s0")).otherwise(lit(15) - col("s0")))
        .select("doc_id", "n_tok", "shard")
      val outDir = s"/tmp/graft_shards/${new java.io.File(dir).getName}/balanced"
      assigned.write.mode("overwrite").partitionBy("shard").parquet(outDir)
      // read BACK from the written layout; the partition column arrives
      // via directory inference — pin its type with an explicit cast
      // (q192's lesson)
      val back = s.read.parquet(outDir)
        .select(col("doc_id"), col("n_tok"), col("shard").cast("long").as("shard"))
      val agg = back.groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_sum"))
      val tot = agg.agg(sum(col("tok_sum")).as("t"))
      agg.crossJoin(broadcast(tot))
        .select(col("shard"), col("n_docs"), col("tok_sum"),
          expr("tok_sum * 8000 div t").cast("long").as("skew_milli"))
        .orderBy("shard")
    },

    // Token-budget mixture solver — exact water-filling: given per-source
    // token capacities c_s (one corpus pass), integer target weights w_s
    // (policy: 1–4 by source index here), and a budget B = 60% of the
    // corpus, find the unique λ with Σ min(λ·w_s, c_s) = B and allocate
    // min(λ·w_s, c_s) tokens to each source — sources whose capacity
    // can't honor their target weight saturate, the slack redistributes
    // to the rest in proportion. λ is RATIONAL; the whole computation
    // stays in BIGINTs: sources sort by the exact ratio key c·(12/w)
    // (w ∈ 1..4 divides 12), prefix sums come from a |sources|²
    // triangular comparison (q246's discipline — never a global window),
    // and the prefix-saturation test is the cross-multiplied
    // (B − C_{i−1})·w_i ≥ c_i·W_rem — no float boundary anywhere, proven
    // against an exact-rational reference. At 100 TB the corpus pass is
    // the only data-scale work; the solve runs on the |sources|-row
    // frame (cross-mult products ≤ c_total·w_max ≈ 4·10¹⁷ at 10¹⁴
    // tokens — inside Long). This is the planner that turns "sample
    // sources at 30/30/20/20" into exact per-source token quotas
    // BEFORE the mixing job runs (q50/q51 then execute the mix).
    q("q252_mixture_waterfill",
      "exact water-filling token allocator: budgeted mixture quotas per source")(
      """WITH c AS (SELECT source, CAST(substr(source, 4) AS BIGINT) % 4 + 1 AS w,
        |                  CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS cap
        |           FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(cap) AS BIGINT) AS tc, CAST(sum(w) AS BIGINT) AS tw FROM c),
        |k AS (SELECT c.*, cap * (12 // w) AS rkey FROM c),
        |o AS (SELECT a.source, a.w, a.cap,
        |             CAST(sum(CASE WHEN b.rkey < a.rkey OR (b.rkey = a.rkey AND b.source <= a.source)
        |                      THEN b.cap ELSE 0 END) AS BIGINT) AS ck,
        |             CAST(sum(CASE WHEN b.rkey < a.rkey OR (b.rkey = a.rkey AND b.source <= a.source)
        |                      THEN b.w ELSE 0 END) AS BIGINT) AS cw
        |      FROM k a CROSS JOIN k b GROUP BY a.source, a.w, a.cap),
        |bud AS (SELECT tc * 6 // 10 AS b, tw FROM tot),
        |f AS (SELECT o.*, bud.b, bud.tw,
        |             CASE WHEN (bud.b - (ck - cap)) * w >= cap * (bud.tw - cw + w)
        |                  THEN 1 ELSE 0 END AS sat
        |      FROM o CROSS JOIN bud),
        |sagg AS (SELECT CAST(coalesce(sum(CASE WHEN sat = 1 THEN cap END), 0) AS BIGINT) AS csat,
        |                CAST(coalesce(sum(CASE WHEN sat = 1 THEN w END), 0) AS BIGINT) AS wsat
        |         FROM f)
        |SELECT f.source, CAST(f.w AS BIGINT) AS w, f.cap AS cap_tokens,
        |       CAST(CASE WHEN sat = 1 THEN cap
        |                 ELSE (b - csat) * w // greatest(tw - wsat, 1) END AS BIGINT) AS alloc_tokens,
        |       CAST(sat AS BIGINT) AS saturated
        |FROM f CROSS JOIN sagg ORDER BY source""".stripMargin
    ) { (s, dir) =>
      val c = Tables.fanout(s, dir, "documents")
        .groupBy("source")
        .agg(sum(size(tokens(col("text")))).cast("long").as("cap"))
        .select(col("source"),
          (substring(col("source"), 4, 8).cast("long") % 4 + 1).as("w"), col("cap"))
      val k = c.select(col("source"), col("w"), col("cap"),
        (col("cap") * (lit(12L) / col("w")).cast("long")).as("rkey"))
        .cache() // both arms of the |sources|² triangular comparison
      val o = k.select(col("source"), col("w"), col("cap"), col("rkey"))
        .crossJoin(broadcast(k.select(col("rkey").as("brk"), col("source").as("bsrc"),
          col("cap").as("bcap"), col("w").as("bw"))))
        .groupBy("source", "w", "cap")
        .agg(sum(when(col("brk") < col("rkey") ||
            (col("brk") === col("rkey") && col("bsrc") <= col("source")),
            col("bcap")).otherwise(0L)).as("ck"),
          sum(when(col("brk") < col("rkey") ||
            (col("brk") === col("rkey") && col("bsrc") <= col("source")),
            col("bw")).otherwise(0L)).as("cw"))
      val bud = k.agg((sum(col("cap")) * 6 / 10).cast("long").as("b"),
        sum(col("w")).as("tw"))
      val f = o.crossJoin(broadcast(bud))
        .select(col("source"), col("w"), col("cap"), col("b"), col("tw"),
          when((col("b") - (col("ck") - col("cap"))) * col("w") >=
            col("cap") * (col("tw") - col("cw") + col("w")), 1L).otherwise(0L).as("sat"))
        .cache() // saturated-prefix totals + the final projection
      val sagg = f.agg(
        coalesce(sum(when(col("sat") === 1L, col("cap"))), lit(0L)).as("csat"),
        coalesce(sum(when(col("sat") === 1L, col("w"))), lit(0L)).as("wsat"))
      f.crossJoin(broadcast(sagg))
        .select(col("source"), col("w"), col("cap").as("cap_tokens"),
          when(col("sat") === 1L, col("cap"))
            .otherwise(expr("(b - csat) * w div greatest(tw - wsat, 1)"))
            .cast("long").as("alloc_tokens"),
          col("sat").as("saturated"))
        .orderBy("source")
    },

    // Exact Shapley data valuation of source groups for vocabulary
    // coverage — "what is each source really worth to the corpus" with
    // the one attribution rule that is efficient, symmetric, and
    // additive-null. The trick that makes EXACT Shapley feasible at
    // 100 TB: the coalition value v(S) = |distinct shingles covered by
    // ∪S| is fully determined by the WHICH-GROUPS-HAVE-IT bitmask
    // histogram — one corpus scan reduces the data to ≤ 2^k counts, and
    // every one of the 2^k coalitions (k = 5 groups → 32) evaluates from
    // that histogram: v(S) = T − Σ_{mask ∩ S = ∅} h(mask). Shapley then
    // folds over the 32×5 (coalition, group) metadata grid with the
    // closed-form weights |S|!(k−1−|S|)!, kept integer by publishing
    // 120·φ (5! = 120): 120·φ_i = Σ_{S∌i} w(|S|)·(v(S∪i) − v(S)),
    // w = [24, 6, 4, 6, 24]. Efficiency (Σφ = v(full)) is asserted in
    // StatsHarnessSpec — the axioms are the test. Everything after the
    // scan is ≤ 32-row frames; the scan shuffles (shingle-hash, group)
    // pairs, never text.
    q("q273_shapley_sources",
      "exact Shapley value of 5 source groups for 3-shingle vocabulary coverage")(
      s"""WITH d AS (SELECT doc_id, text,
         |                  CAST(substr(source, 4) AS BIGINT) % 5 AS grp FROM documents),
         |toks AS (SELECT grp, str_split(text, ' ') AS t FROM d),
         |sh AS (SELECT DISTINCT grp, ${md5LongSql("g")} AS h
         |       FROM (SELECT grp, unnest(${shinglesSql("t", 3)}) AS g FROM toks)),
         |msk AS (SELECT h, CAST(sum(DISTINCT (1 << grp)) AS BIGINT) AS m FROM sh GROUP BY h),
         |hist AS (SELECT m, CAST(count(*) AS BIGINT) AS cnt FROM msk GROUP BY m),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM hist),
         |coal AS (SELECT unnest(generate_series(0, 31)) AS s),
         |cv AS (SELECT coal.s, tot.t - CAST(coalesce(sum(CASE WHEN (hist.m & coal.s) = 0
         |                                                THEN hist.cnt END), 0) AS BIGINT) AS v
         |       FROM coal CROSS JOIN tot LEFT JOIN hist ON true
         |       GROUP BY coal.s, tot.t),
         |grps AS (SELECT unnest(generate_series(0, 4)) AS i),
         |shap AS (SELECT g.i,
         |                CAST(sum((CASE bit_count(a.s) WHEN 0 THEN 24 WHEN 1 THEN 6
         |                          WHEN 2 THEN 4 WHEN 3 THEN 6 ELSE 24 END)
         |                         * (b.v - a.v)) AS BIGINT) AS phi_x120
         |         FROM grps g JOIN cv a ON (a.s & (1 << g.i)) = 0
         |              JOIN cv b ON b.s = (a.s | (1 << g.i))
         |         GROUP BY g.i),
         |nd AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_docs FROM d GROUP BY grp),
         |own AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_shingles FROM sh GROUP BY grp)
         |SELECT CAST(nd.grp AS BIGINT) AS grp, nd.n_docs, own.n_shingles,
         |       shap.phi_x120,
         |       CAST((SELECT v FROM cv WHERE s = 31) AS BIGINT) AS v_full
         |FROM nd JOIN own ON own.grp = nd.grp JOIN shap ON shap.i = nd.grp
         |ORDER BY 1""".stripMargin
    ) { (sp, dir) =>
      import graft.functions.PortableHash.{md5Long, shingles}
      // fanout (guide §2.5): the fixture is ONE parquet row group, so the
      // shingle explode + md5 below otherwise runs as a single 4.7 s task
      // (measured in the round-11 profile) — spread the derivation first
      val d = Tables.fanout(sp, dir, "documents")
        .select(col("doc_id"), col("text"),
          (substring(col("source"), 4, 10).cast("long") % 5).as("grp"))
      val sh = d.select(col("grp"),
          explode(shingles(split(col("text"), " "), 3)).as("g"))
        .select(col("grp"), md5Long(col("g")).as("h")).distinct()
        .cache() // mask rollup + per-group shingle counts
      val msk = sh.groupBy("h")
        .agg(sum_distinct(expr("shiftleft(cast(1 as bigint), cast(grp as int))")).as("m"))
      val hist = msk.groupBy("m").agg(count(lit(1)).as("cnt"))
      val tot = hist.agg(sum(col("cnt")).as("t"))
      val coal = sp.range(1).select(explode(sequence(lit(0L), lit(31L))).as("s"))
      val cv = coal.crossJoin(broadcast(tot)).crossJoin(broadcast(hist))
        .groupBy("s", "t")
        .agg(coalesce(sum(when(expr("(m & s) = 0"), col("cnt"))), lit(0L)).as("miss"))
        .select(col("s"), (col("t") - col("miss")).as("v"))
        .cache() // a-leg, b-leg, v_full
      val grps = sp.range(1).select(explode(sequence(lit(0L), lit(4L))).as("i"))
      val shap = grps.crossJoin(broadcast(cv.select(col("s").as("sa"), col("v").as("va"))))
        .filter(expr("(sa & shiftleft(cast(1 as bigint), cast(i as int))) = 0"))
        .withColumn("sb", expr("sa | shiftleft(cast(1 as bigint), cast(i as int))"))
        .join(broadcast(cv.select(col("s").as("sb"), col("v").as("vb"))), Seq("sb"))
        .groupBy("i")
        .agg(sum((when(expr("bit_count(sa)") === 0, 24L)
          .when(expr("bit_count(sa)") === 1, 6L)
          .when(expr("bit_count(sa)") === 2, 4L)
          .when(expr("bit_count(sa)") === 3, 6L).otherwise(24L))
          * (col("vb") - col("va"))).as("phi_x120"))
      val nd = d.groupBy("grp").agg(count(lit(1)).as("n_docs"))
      val own = sh.groupBy("grp").agg(count(lit(1)).as("n_shingles"))
      val vFull = cv.filter(col("s") === 31L).select(col("v").as("v_full"))
      nd.join(own, Seq("grp")).join(shap, col("grp") === col("i"))
        .crossJoin(broadcast(vFull))
        .select(col("grp").cast("long").as("grp"), col("n_docs"), col("n_shingles"),
          col("phi_x120"), col("v_full"))
        .orderBy("grp")
    },

    // Bloom-sidecar point lookup — file skipping on a column the LAYOUT
    // cannot help with. q160b's envelopes prune range predicates on the
    // sort columns; a point lookup on a different high-cardinality column
    // (here l_orderkey, with the table bucketed by l_partkey) sees every
    // envelope span the whole domain. The lakehouse answer is a per-file
    // Bloom filter sidecar (Parquet bloom metadata / Iceberg-Delta column
    // stats — public formats, rebuilt here as a typed Aggregator since
    // Spark's BloomFilterAggregate is optimizer-reserved): fixed 32 KiB
    // bit array per bucket, OR-merged map-side, probed at plan time to
    // turn dead buckets into a static partition filter — their files
    // never open, and BloomSidecarSpec pins both the no-false-negative
    // law and the measured skip rate. The query result is
    // layout-invariant (the probe order's lineitems), so the oracle is
    // the plain filter; the only driver-side steps are the ≤16-row
    // sidecar probe and the 1-row probe-key scalar — manifest-file scale.
    q("q276_bloom_sidecar_lookup",
      "write bloom-sidecar'd layout, point-read a non-layout key through file skipping")(
      """SELECT l_linenumber, l_partkey, l_suppkey,
        |       round(l_quantity, 4) + 0 AS qty, l_returnflag
        |FROM lineitem
        |WHERE l_orderkey = (SELECT max(l_orderkey) FROM lineitem)
        |ORDER BY l_linenumber""".stripMargin
    ) { (s, dir) =>
      val outDir = s"/tmp/graft_layout/${new java.io.File(dir).getName}/bloomsidecar"
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
      BloomSidecar.write(li, pmod(col("l_partkey"), lit(16)), "l_orderkey", outDir)
      // 1-row scalar: the probe key (bounded driver step, stated above)
      val probe = li.agg(max(col("l_orderkey"))).collect()(0).getLong(0)
      BloomSidecar.readPoint(s, outDir, "l_orderkey", probe)
        .select(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          round(col("l_quantity"), 4).as("qty"), col("l_returnflag"))
        .orderBy("l_linenumber")
    },

    // Greedy set-cover source SELECTION — q273's twin question: Shapley
    // says what each source group is worth; "which 3 groups should I
    // license for maximum vocabulary coverage" is maximum-coverage, and
    // the greedy algorithm carries the classic (1 − 1/e) guarantee
    // against the best size-3 coalition. Same scale trick as q273: the
    // ONE corpus scan collapses to the ≤2⁵-row which-groups-have-it
    // bitmask histogram, each greedy round's gains fold over that
    // histogram, and OPT₃ is computed EXACTLY from the same coalition
    // table (all C(5,3) values) — so the approximation-ratio law
    // 100·greedy₃ ≥ 63·OPT₃ is a CHECKED output column, not prose
    // (StatsHarnessSpec re-asserts it). Three unrolled rounds; argmax
    // tiebreaks to the smallest group id in both engines.
    q("q280_greedy_set_cover",
      "greedy 3-source max-coverage from the bitmask histogram, ratio vs exact OPT3")(
      s"""WITH d AS (SELECT doc_id, text,
         |                  CAST(substr(source, 4) AS BIGINT) % 5 AS grp FROM documents),
         |toks AS (SELECT grp, str_split(text, ' ') AS t FROM d),
         |sh AS (SELECT DISTINCT grp, ${md5LongSql("g")} AS h
         |       FROM (SELECT grp, unnest(${shinglesSql("t", 3)}) AS g FROM toks)),
         |msk AS (SELECT h, CAST(sum(DISTINCT (1 << grp)) AS BIGINT) AS m FROM sh GROUP BY h),
         |hist AS (SELECT m, CAST(count(*) AS BIGINT) AS cnt FROM msk GROUP BY m),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM hist),
         |gr AS (SELECT unnest(generate_series(0, 4)) AS gi),
         |r1 AS (SELECT gr.gi, CAST(coalesce(sum(CASE WHEN (hist.m & (1 << gr.gi)) <> 0
         |                                        THEN hist.cnt END), 0) AS BIGINT) AS gain
         |       FROM gr LEFT JOIN hist ON true GROUP BY gr.gi),
         |p1 AS (SELECT gi AS g1, gain AS gain1 FROM r1 ORDER BY gain DESC, gi LIMIT 1),
         |r2 AS (SELECT gr.gi, CAST(coalesce(sum(CASE WHEN (hist.m & (1 << gr.gi)) <> 0
         |                                         AND (hist.m & (1 << p1.g1)) = 0
         |                                        THEN hist.cnt END), 0) AS BIGINT) AS gain
         |       FROM gr CROSS JOIN p1 LEFT JOIN hist ON true
         |       WHERE gr.gi <> p1.g1 GROUP BY gr.gi),
         |p2 AS (SELECT gi AS g2, gain AS gain2 FROM r2 ORDER BY gain DESC, gi LIMIT 1),
         |r3 AS (SELECT gr.gi, CAST(coalesce(sum(CASE WHEN (hist.m & (1 << gr.gi)) <> 0
         |                                         AND (hist.m & ((1 << p1.g1) | (1 << p2.g2))) = 0
         |                                        THEN hist.cnt END), 0) AS BIGINT) AS gain
         |       FROM gr CROSS JOIN p1 CROSS JOIN p2 LEFT JOIN hist ON true
         |       WHERE gr.gi <> p1.g1 AND gr.gi <> p2.g2 GROUP BY gr.gi),
         |p3 AS (SELECT gi AS g3, gain AS gain3 FROM r3 ORDER BY gain DESC, gi LIMIT 1),
         |coal AS (SELECT unnest(generate_series(0, 31)) AS s),
         |cv AS (SELECT coal.s, tot.t - CAST(coalesce(sum(CASE WHEN (hist.m & coal.s) = 0
         |                                                THEN hist.cnt END), 0) AS BIGINT) AS v
         |       FROM coal CROSS JOIN tot LEFT JOIN hist ON true
         |       GROUP BY coal.s, tot.t),
         |o3 AS (SELECT CAST(max(v) AS BIGINT) AS opt3 FROM cv WHERE bit_count(s) = 3),
         |steps AS (SELECT 1 AS step, p1.g1 AS grp, p1.gain1 AS gain, p1.gain1 AS cum
         |          FROM p1
         |          UNION ALL
         |          SELECT 2, p2.g2, p2.gain2, p1.gain1 + p2.gain2 FROM p1 CROSS JOIN p2
         |          UNION ALL
         |          SELECT 3, p3.g3, p3.gain3, p1.gain1 + p2.gain2 + p3.gain3
         |          FROM p1 CROSS JOIN p2 CROSS JOIN p3)
         |SELECT CAST(step AS BIGINT) AS step, CAST(grp AS BIGINT) AS grp, gain,
         |       CAST(cum AS BIGINT) AS cum_cover, o3.opt3,
         |       CAST((1000 * cum) // o3.opt3 AS BIGINT) AS ratio_permille
         |FROM steps CROSS JOIN o3 ORDER BY step""".stripMargin
    ) { (sp, dir) =>
      import graft.functions.PortableHash.{md5Long, shingles}
      // fanout (guide §2.5): the fixture is ONE parquet row group, so the
      // shingle explode + md5 below otherwise runs as a single 4.7 s task
      // (measured in the round-11 profile) — spread the derivation first
      val d = Tables.fanout(sp, dir, "documents")
        .select(col("doc_id"), col("text"),
          (substring(col("source"), 4, 10).cast("long") % 5).as("grp"))
      val sh = d.select(col("grp"),
          explode(shingles(split(col("text"), " "), 3)).as("g"))
        .select(col("grp"), md5Long(col("g")).as("h")).distinct()
      val msk = sh.groupBy("h")
        .agg(sum_distinct(expr("shiftleft(cast(1 as bigint), cast(grp as int))")).as("m"))
      val hist = msk.groupBy("m").agg(count(lit(1)).as("cnt")).cache() // rounds + cv
      val tot = hist.agg(sum(col("cnt")).as("t"))
      val gr = sp.range(1).select(explode(sequence(lit(0L), lit(4L))).as("gi"))
      val r1 = gr.crossJoin(broadcast(hist))
        .groupBy("gi")
        .agg(coalesce(sum(when(
          expr("(m & shiftleft(cast(1 as bigint), cast(gi as int))) <> 0"), col("cnt"))),
          lit(0L)).as("gain"))
      val p1 = r1.orderBy(col("gain").desc, col("gi")).limit(1)
        .select(col("gi").as("g1"), col("gain").as("gain1"))
      // rounds 2/3 thread the earlier picks as 1-row broadcasts
      val r2 = gr.crossJoin(broadcast(p1)).filter(col("gi") =!= col("g1"))
        .crossJoin(broadcast(hist))
        .groupBy("gi", "g1", "gain1")
        .agg(coalesce(sum(when(
          expr("(m & shiftleft(cast(1 as bigint), cast(gi as int))) <> 0") &&
            expr("(m & shiftleft(cast(1 as bigint), cast(g1 as int))) = 0"), col("cnt"))),
          lit(0L)).as("gain"))
      val p2b = r2.orderBy(col("gain").desc, col("gi")).limit(1)
        .select(col("g1"), col("gain1"), col("gi").as("g2"), col("gain").as("gain2"))
      val r3 = gr.crossJoin(broadcast(p2b))
        .filter(col("gi") =!= col("g1") && col("gi") =!= col("g2"))
        .crossJoin(broadcast(hist))
        .groupBy("gi", "g1", "gain1", "g2", "gain2")
        .agg(coalesce(sum(when(
          expr("(m & shiftleft(cast(1 as bigint), cast(gi as int))) <> 0") &&
            expr("(m & (shiftleft(cast(1 as bigint), cast(g1 as int)) | shiftleft(cast(1 as bigint), cast(g2 as int)))) = 0"),
          col("cnt"))), lit(0L)).as("gain"))
      val p3 = r3.orderBy(col("gain").desc, col("gi")).limit(1)
        .select(col("g1"), col("gain1"), col("g2"), col("gain2"),
          col("gi").as("g3"), col("gain").as("gain3"))
      val coal = sp.range(1).select(explode(sequence(lit(0L), lit(31L))).as("s"))
      val cv = coal.crossJoin(broadcast(tot)).crossJoin(broadcast(hist))
        .groupBy("s", "t")
        .agg(coalesce(sum(when(expr("(m & s) = 0"), col("cnt"))), lit(0L)).as("miss"))
        .select(col("s"), (col("t") - col("miss")).as("v"))
      val o3 = cv.filter(expr("bit_count(s) = 3")).agg(max(col("v")).as("opt3"))
      val steps = p3.select(lit(1L).as("step"), col("g1").cast("long").as("grp"),
          col("gain1").as("gain"), col("gain1").as("cum_cover"))
        .unionAll(p3.select(lit(2L), col("g2").cast("long"), col("gain2"),
          (col("gain1") + col("gain2")).as("cum")))
        .unionAll(p3.select(lit(3L), col("g3").cast("long"), col("gain3"),
          (col("gain1") + col("gain2") + col("gain3")).as("cum")))
      steps.crossJoin(broadcast(o3))
        .select(col("step"), col("grp"), col("gain"), col("cum_cover"), col("opt3"),
          expr("cast((1000 * cum_cover) div opt3 as bigint)").as("ratio_permille"))
        .orderBy("step")
    },

    // Missing-data repair — the feature-cleaning twin of winsorization
    // (q89): a deterministic 10% of lineitem prices go missing (hash of
    // the row key, so the oracle knows the ground truth), and each group's
    // hole is filled with the (l_returnflag, l_linestatus) LOWER MEDIAN,
    // computed from the dollar-value HISTOGRAM (q263's rank-space
    // discipline — the cumulative window walks value bins, never rows).
    // Because the truth is known, the report carries the quantity real
    // imputation audits can't have: bias_dollars = Σ(imputed − true) per
    // group — median imputation's systematic error, measured. 100 TB
    // shape: one grouped histogram + a value-cardinality-bounded window
    // + one grouped audit pass; nothing row-ordered.
    q("q312_median_impute",
      "group-median imputation of a 10% planted-missing price column with exact bias audit")(
      s"""WITH l AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
         |                  CAST(floor(l_extendedprice) AS BIGINT) AS yd,
         |                  ${md5LongSql(
              "'na:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)")} % 10 = 0 AS miss
         |           FROM lineitem),
         |h AS (SELECT rf, ls, yd, CAST(count(*) AS BIGINT) AS c
         |      FROM l WHERE NOT miss GROUP BY rf, ls, yd),
         |cum AS (SELECT rf, ls, yd,
         |               sum(c) OVER (PARTITION BY rf, ls ORDER BY yd) AS cm,
         |               sum(c) OVER (PARTITION BY rf, ls) AS tot FROM h),
         |med AS (SELECT rf, ls, min(yd) AS med FROM cum WHERE cm >= (tot + 1) // 2
         |        GROUP BY rf, ls),
         |g AS (SELECT rf, ls, CAST(count(*) AS BIGINT) AS n_rows,
         |             CAST(sum(CASE WHEN miss THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
         |             CAST(sum(CASE WHEN miss THEN yd ELSE 0 END) AS BIGINT) AS mts
         |      FROM l GROUP BY rf, ls)
         |SELECT g.rf AS l_returnflag, g.ls AS l_linestatus, g.n_rows, g.n_missing,
         |       CAST(med.med AS BIGINT) AS median_dollars,
         |       CAST(g.n_missing * med.med - g.mts AS BIGINT) AS bias_dollars
         |FROM g JOIN med ON med.rf = g.rf AND med.ls = g.ls
         |ORDER BY 1, 2""".stripMargin
    ) { (s, dir) =>
      val l = graft.Tables(s, dir, "lineitem").select(
        col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
        expr("cast(floor(l_extendedprice) as bigint)").as("yd"),
        (md5Long(concat(lit("na:"), col("l_orderkey").cast("string"), lit(":"),
          col("l_linenumber").cast("string"))) % 10 === 0).as("miss"))
      val h = l.filter(!col("miss")).groupBy("rf", "ls", "yd")
        .agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy("rf", "ls").orderBy("yd")
      val wAll = Window.partitionBy("rf", "ls")
      val med = h.select(col("rf"), col("ls"), col("yd"),
          sum(col("c")).over(wCum).as("cm"), sum(col("c")).over(wAll).as("tot"))
        .filter(expr("cm >= (tot + 1) div 2"))
        .groupBy("rf", "ls").agg(min(col("yd")).as("med"))
      val g = l.groupBy("rf", "ls").agg(count(lit(1)).as("n_rows"),
        sum(when(col("miss"), 1L).otherwise(0L)).as("n_missing"),
        sum(when(col("miss"), col("yd")).otherwise(0L)).as("mts"))
      g.join(med, Seq("rf", "ls"))
        .select(col("rf").as("l_returnflag"), col("ls").as("l_linestatus"),
          col("n_rows"), col("n_missing"), col("med").as("median_dollars"),
          (col("n_missing") * col("med") - col("mts")).as("bias_dollars"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Resharding cost — what each partitioning scheme pays when the shard
    // count grows 8 → 9, measured on the customer key universe: naive
    // mod reassigns ~8/9 of all keys (every co-located dataset re-shuffles
    // nearly in full), RENDEZVOUS (highest-random-weight: shard =
    // argmax_s h(key,s)) and a 16-vnode CONSISTENT-HASH RING both move
    // only the ~1/9 the new shard must own — the minimal-movement
    // property that makes stateful services and bucketed layouts
    // re-scalable. Everything is md5 arithmetic so both engines draw
    // identical assignments; the ring's wrap-around is branch-free
    // (min_by over vpos + 2⁶⁰·[vpos < keypos]). The report also carries
    // the balance price: max shard share, where the 144-vnode ring is
    // visibly lumpier than rendezvous' near-uniform split. Plan shape:
    // the key scan crossJoins only broadcast 9-row / 144-row grids.
    q("q322_resharding",
      "8→9 shard growth: moved keys and balance under mod / rendezvous / vnode-ring schemes")(
      {
        val big = "1152921504606846976" // 2^60 — past every 60-bit md5 position
        s"""WITH k AS (SELECT c_custkey AS id,
           |                  ${md5LongSql("'k:' || CAST(c_custkey AS VARCHAR)")} AS kh
           |           FROM customer),
           |s9 AS (SELECT unnest(generate_series(0, 8)) AS s),
           |vn AS (SELECT s9.s, v.v,
           |              ${md5LongSql(
                "'vn:' || CAST(s9.s AS VARCHAR) || ':' || CAST(v.v AS VARCHAR)")} AS vpos
           |       FROM s9 CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS v) v),
           |rh AS (SELECT k.id, s9.s,
           |              ${md5LongSql(
                "'rz:' || CAST(k.id AS VARCHAR) || ':' || CAST(s9.s AS VARCHAR)")} AS h
           |       FROM k CROSS JOIN s9),
           |r8 AS (SELECT id, max_by(s, h) AS sh FROM rh WHERE s < 8 GROUP BY id),
           |r9 AS (SELECT id, max_by(s, h) AS sh FROM rh GROUP BY id),
           |g8 AS (SELECT k.id, min_by(vn.s,
           |              vn.vpos + CASE WHEN vn.vpos < k.kh THEN $big ELSE 0 END) AS sh
           |       FROM k CROSS JOIN vn WHERE vn.s < 8 GROUP BY k.id),
           |g9 AS (SELECT k.id, min_by(vn.s,
           |              vn.vpos + CASE WHEN vn.vpos < k.kh THEN $big ELSE 0 END) AS sh
           |       FROM k CROSS JOIN vn GROUP BY k.id),
           |m AS (SELECT id, kh % 8 AS s8, kh % 9 AS s9 FROM k),
           |mv AS (SELECT 'a_mod' AS scheme, CAST(count(*) AS BIGINT) AS n,
           |              CAST(sum(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END) AS BIGINT) AS moved
           |       FROM m
           |       UNION ALL SELECT 'b_rendezvous', CAST(count(*) AS BIGINT),
           |              CAST(sum(CASE WHEN r8.sh <> r9.sh THEN 1 ELSE 0 END) AS BIGINT)
           |       FROM r8 JOIN r9 USING (id)
           |       UNION ALL SELECT 'c_ring', CAST(count(*) AS BIGINT),
           |              CAST(sum(CASE WHEN g8.sh <> g9.sh THEN 1 ELSE 0 END) AS BIGINT)
           |       FROM g8 JOIN g9 USING (id)),
           |asg AS (SELECT 'a_mod' AS scheme, s9 AS sh FROM m
           |        UNION ALL SELECT 'b_rendezvous', sh FROM r9
           |        UNION ALL SELECT 'c_ring', sh FROM g9),
           |sc AS (SELECT scheme, sh, CAST(count(*) AS BIGINT) AS c FROM asg GROUP BY scheme, sh),
           |mx AS (SELECT scheme, CAST(max(c) AS BIGINT) AS mc FROM sc GROUP BY scheme)
           |SELECT mv.scheme, mv.n AS n_keys,
           |       CAST((1000 * mv.moved) // mv.n AS BIGINT) AS moved_permille,
           |       CAST((1000 * mx.mc) // mv.n AS BIGINT) AS max_share_permille
           |FROM mv JOIN mx USING (scheme) ORDER BY mv.scheme""".stripMargin
      }
    ) { (s, dir) =>
      val big = 1152921504606846976L
      val k = graft.Tables(s, dir, "customer")
        .select(col("c_custkey").as("id"),
          md5Long(concat(lit("k:"), col("c_custkey").cast("string"))).as("kh"))
        .cache() // four assignment passes + the mod frame
      val s9 = s.range(1).select(explode(sequence(lit(0L), lit(8L))).as("s"))
      val vn = s9.crossJoin(s.range(1).select(explode(sequence(lit(0L), lit(15L))).as("v")))
        .select(col("s"), md5Long(concat(lit("vn:"), col("s").cast("string"), lit(":"),
          col("v").cast("string"))).as("vpos"))
        .localCheckpoint(true) // 144-row grid, broadcast below
      val rh = k.crossJoin(broadcast(s9))
        .select(col("id"), col("s"), md5Long(concat(lit("rz:"), col("id").cast("string"),
          lit(":"), col("s").cast("string"))).as("h"))
      val r8 = rh.filter(col("s") < 8).groupBy("id").agg(expr("max_by(s, h)").as("sh"))
      val r9 = rh.groupBy("id").agg(expr("max_by(s, h)").as("sh"))
      def ring(grid: DataFrame) = k.crossJoin(broadcast(grid))
        .groupBy("id")
        .agg(expr(s"min_by(s, vpos + CASE WHEN vpos < kh THEN ${big}L ELSE 0L END)").as("sh"))
      val g8 = ring(vn.filter(col("s") < 8))
      val g9 = ring(vn)
      val m = k.select(col("id"), (col("kh") % 8).as("s8"), (col("kh") % 9).as("s9c"))
      val mv = m.agg(count(lit(1)).as("n"),
          sum(when(col("s8") =!= col("s9c"), 1L).otherwise(0L)).as("moved"))
          .select(lit("a_mod").as("scheme"), col("n"), col("moved"))
        .unionByName(r8.join(r9.withColumnRenamed("sh", "sh9"), Seq("id"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("sh") =!= col("sh9"), 1L).otherwise(0L)).as("moved"))
          .select(lit("b_rendezvous").as("scheme"), col("n"), col("moved")))
        .unionByName(g8.join(g9.withColumnRenamed("sh", "sh9"), Seq("id"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("sh") =!= col("sh9"), 1L).otherwise(0L)).as("moved"))
          .select(lit("c_ring").as("scheme"), col("n"), col("moved")))
      val asg = m.select(lit("a_mod").as("scheme"), col("s9c").as("sh"))
        .unionByName(r9.select(lit("b_rendezvous").as("scheme"), col("sh")))
        .unionByName(g9.select(lit("c_ring").as("scheme"), col("sh")))
      val mx = asg.groupBy("scheme", "sh").agg(count(lit(1)).as("c"))
        .groupBy("scheme").agg(max(col("c")).as("mc"))
      mv.join(mx, Seq("scheme"))
        .select(col("scheme"), col("n").as("n_keys"),
          expr("(1000 * moved) div n").as("moved_permille"),
          expr("(1000 * mc) div n").as("max_share_permille"))
        .orderBy("scheme")
    },

    // Quantile REGRESSION — the pinball-loss trainer that completes the
    // q197/q313 integer-GD suite with an asymmetric objective: fit
    // y ≈ w0 + w1·x (extendedprice centi vs quantity) at τ = 0.5 and 0.9
    // by full-batch subgradient descent, 16 epochs, lr (10⁶, 2¹⁴) per
    // parameter. Everything is the q197 contract: the SCAN is
    // distributed (one partial-aggregated pass per epoch over the cached
    // features), the O(2) model is driver-held, and every update is
    // exact integer arithmetic — subgradient τd−10·I(y<ŷ), truncating
    // division identical in Scala `/`, Spark `div`, DuckDB `//`. The
    // oracle unrolls all 32 epoch CTEs. Output = the full per-epoch
    // PINBALL LOSS trajectory (loss_deci is 10× the loss, evaluated at
    // the pre-update state; w0/w1 are post-update) — monotone decrease
    // and the τ-ordering of the two fitted lines are spec-pinned. The
    // median arm is robust regression; the 0.9 arm is the SLA-style
    // upper-band fit a cost/latency pipeline actually ships.
    q("q333_quantile_regression",
      "pinball-GD quantile regression at tau 0.5/0.9: 16-epoch loss trajectories, integer-exact")({
      def arm(td: Int): String = {
        val steps = (1 to 16).map { i =>
          s"""a${td}_g$i AS (SELECT min(w0) AS w0, min(w1) AS w1, min(n) AS n,
             |  sum($td - 10 * (CASE WHEN y < w0 + w1 * x THEN 1 ELSE 0 END)) AS e0,
             |  sum(x * ($td - 10 * (CASE WHEN y < w0 + w1 * x THEN 1 ELSE 0 END))) AS e1,
             |  sum((y - w0 - w1 * x) * ($td - 10 * (CASE WHEN y - w0 - w1 * x < 0 THEN 1 ELSE 0 END))) AS loss
             |  FROM d, a${td}_w${i - 1}, nn),
             |a${td}_w$i AS (SELECT w0 + (1000000 * e0) // (10 * n) AS w0,
             |               w1 + (16384 * e1) // (10 * n) AS w1, loss FROM a${td}_g$i)""".stripMargin
        }
        s"a${td}_w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS loss),\n" +
          steps.mkString(",\n")
      }
      val rows = for (td <- Seq(5, 9); i <- 1 to 16)
        yield s"SELECT CAST($td AS BIGINT) AS tau_deci, CAST($i AS BIGINT) AS epoch, " +
          s"CAST(loss AS BIGINT) AS loss_deci, CAST(w0 AS BIGINT) AS w0, " +
          s"CAST(w1 AS BIGINT) AS w1 FROM a${td}_w$i"
      s"""WITH d AS (SELECT CAST(l_quantity AS BIGINT) AS x,
         |                  CAST(round(l_extendedprice * 100) AS BIGINT) AS y
         |           FROM lineitem),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
         |${arm(5)},
         |${arm(9)}
         |${rows.mkString("", " UNION ALL ", "")}
         |ORDER BY tau_deci, epoch""".stripMargin
    }) { (sp, dir) =>
      import sp.implicits._
      val d = Tables(sp, dir, "lineitem")
        .select(expr("cast(l_quantity as bigint)").as("x"),
          expr("cast(round(l_extendedprice * 100) as bigint)").as("y"))
        .cache() // 32 gradient scans (16 per arm)
      val out = for (td <- Seq(5, 9)) yield {
        var (w0, w1) = (0L, 0L)
        (1 to 16).map { i =>
          val r = d.select(
            sum(expr(s"$td - 10 * (CASE WHEN y < $w0 + $w1 * x THEN 1 ELSE 0 END)")).as("e0"),
            sum(expr(s"x * ($td - 10 * (CASE WHEN y < $w0 + $w1 * x THEN 1 ELSE 0 END))")).as("e1"),
            sum(expr(s"(y - $w0 - $w1 * x) * ($td - 10 * " +
              s"(CASE WHEN y - $w0 - $w1 * x < 0 THEN 1 ELSE 0 END))")).as("loss"),
            count(lit(1)).as("n")).head()
          val n = r.getLong(3)
          w0 += (1000000L * r.getLong(0)) / (10L * n)
          w1 += (16384L * r.getLong(1)) / (10L * n)
          (td.toLong, i.toLong, r.getLong(2), w0, w1)
        }
      }
      out.flatten.toDF("tau_deci", "epoch", "loss_deci", "w0", "w1")
        .orderBy("tau_deci", "epoch")
    },

    // SFT conversation prep — the rendering step between raw interaction
    // logs and a chat-format training set: sessionize each user's events
    // (12 h gap, q225's spacing analysis — a 1 h gap leaves this fixture
    // 91% singleton sessions), alternate user/assistant roles by turn
    // parity, render the canonical "role: type value" transcript with
    // newline joins, and gate on BOTH structure (≥2 turns — a conversation
    // needs an exchange) and budget (≤128 chars ≈ p90, so the gate
    // genuinely bites). The transcript content is pinned by an md5
    // fingerprint, not just counts — the render IS the operator. Shape:
    // everything keys on user_id (the session-label window rides the
    // user_id exchange; the turn window and the render groupBy share the
    // (user_id, isl) refinement — 2 data exchanges + the output sort,
    // PLANMAP-pinned); the render is a per-session sort_array fold,
    // bounded by session length, never corpus-sized.
    q("q363_chat_sft_render",
      "sessionized chat-format SFT rendering: role turns, transcript fingerprint, 2-gate keep")(
      s"""WITH o AS (
         |  SELECT user_id, event_id, event_type, value, epoch_us(ts::TIMESTAMP) AS t,
         |         CASE WHEN lag(epoch_us(ts::TIMESTAMP)) OVER w IS NULL
         |                OR epoch_us(ts::TIMESTAMP) - lag(epoch_us(ts::TIMESTAMP)) OVER w
         |                   > 43200000000
         |              THEN 1 ELSE 0 END AS brk
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |lab AS (
         |  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
         |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS isl
         |  FROM o),
         |turn AS (
         |  SELECT user_id, isl, t, event_id, event_type, value,
         |         row_number() OVER (PARTITION BY user_id, isl
         |                            ORDER BY t, event_id) AS idx
         |  FROM lab),
         |line AS (
         |  SELECT user_id, isl, t, event_id,
         |         (CASE WHEN idx % 2 = 1 THEN 'user' ELSE 'assistant' END)
         |           || ': ' || event_type || ' '
         |           || CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR) AS ln
         |  FROM turn),
         |sess AS (
         |  SELECT user_id, isl, CAST(min(t) AS BIGINT) AS sess_start,
         |         CAST(count(*) AS BIGINT) AS n_turns,
         |         string_agg(ln, chr(10) ORDER BY t, event_id) AS rendered
         |  FROM line GROUP BY user_id, isl)
         |SELECT user_id, sess_start, n_turns,
         |       CAST(length(rendered) AS BIGINT) AS n_chars,
         |       ${md5LongSql("rendered")} AS fp,
         |       CAST(CASE WHEN n_turns >= 2 AND length(rendered) <= 128
         |                 THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM sess ORDER BY user_id, sess_start""".stripMargin
    ) { (s, dir) =>
      val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val t = unix_micros(col("ts"))
      val brk = when(lag(t, 1).over(wOrd).isNull ||
        t - lag(t, 1).over(wOrd) > 43200L * 1000000L, 1L).otherwise(0L)
      val lab = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
          t.as("t"), brk.as("brk"))
        .withColumn("isl", sum(col("brk")).over(
          Window.partitionBy("user_id").orderBy("t", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val line = lab
        .withColumn("idx", row_number().over(
          Window.partitionBy("user_id", "isl").orderBy("t", "event_id")))
        .select(col("user_id"), col("isl"), col("t"), col("event_id"),
          concat(
            when(col("idx") % 2 === 1, lit("user")).otherwise(lit("assistant")),
            lit(": "), col("event_type"), lit(" "),
            floor(col("value") * 100).cast("long").cast("string")).as("ln"))
      line.groupBy("user_id", "isl")
        .agg(min(col("t")).as("sess_start"), count(lit(1)).as("n_turns"),
          array_join(transform(
            sort_array(collect_list(struct(col("t"), col("event_id"), col("ln")))),
            m => m.getField("ln")), "\n").as("rendered"))
        .select(col("user_id"), col("sess_start"), col("n_turns"),
          length(col("rendered")).cast("long").as("n_chars"),
          md5Long(col("rendered")).as("fp"),
          when(col("n_turns") >= 2 && length(col("rendered")) <= 128, 1L)
            .otherwise(0L).as("kept"))
        .orderBy("user_id", "sess_start")
    },

    // T5-style span corruption accounting (Raffel et al. 2020, public
    // arXiv:1910.10683 §3.1.4) — the pretraining data-prep step that turns
    // clean text into (corrupted-input, target) pairs by masking contiguous
    // token spans. The classic sampler draws span starts sequentially
    // (each draw depends on what's already masked), which is a per-doc
    // sequential scan — fine on one machine, a shuffle-resistant chain at
    // 100 TB. This uses the BLOCK variant: tokens partition into fixed
    // 20-token blocks and each block masks ONE hash-chosen span (start
    // h%18, length 1+(h/18)%3, clipped to the block) — non-overlap is
    // structural, every (doc, block) row is independent, and the whole op
    // is one explode + one groupBy (partial-aggregated at 100 TB). Expected
    // corruption ≈ 2/20 = 10% (vs T5's 15%), mean span 2 — the report
    // proves the realized ratios. The hash IS the randomness (md5Long on
    // doc_id:block — reproducible across engines and re-runs, the q67
    // discipline); all outputs integer-exact.
    q("q370_span_corruption",
      "T5-style block span corruption: per-lang mask/span/token accounting")(
      s"""WITH d AS (SELECT doc_id, lang,
         |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n
         |           FROM documents WHERE length(text) > 0),
         |b AS (SELECT doc_id, lang, n,
         |             unnest(generate_series(0, (n + 19) // 20 - 1)) AS blk
         |      FROM d),
         |m AS (SELECT lang, doc_id, blk,
         |             least(20, n - 20 * blk) AS bl,
         |             ${md5LongSql("doc_id || ':' || blk")} % 18 AS s,
         |             1 + (${md5LongSql("doc_id || ':' || blk")} // 18) % 3 AS sl
         |      FROM b),
         |k AS (SELECT lang, doc_id, bl,
         |             CASE WHEN bl > s THEN least(s + sl, bl) - s ELSE 0 END AS msk
         |      FROM m)
         |SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |       CAST(count(*) AS BIGINT) AS n_blocks,
         |       CAST(sum(CASE WHEN msk > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
         |       CAST(sum(bl) AS BIGINT) AS n_tokens,
         |       CAST(sum(msk) AS BIGINT) AS n_masked,
         |       CAST(sum(msk) * 1000 // sum(bl) AS BIGINT) AS mask_milli
         |FROM k GROUP BY lang ORDER BY lang""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").filter(length(col("text")) > 0)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n"))
      val b = d.select(col("doc_id"), col("lang"), col("n"),
        explode(sequence(lit(0L), expr("(n + 19) div 20 - 1"))).as("blk"))
      // Column./ is DOUBLE division and a 60-bit hash overflows a double's
      // mantissa — materialize h, then integer `div` (the q365 lesson).
      val mm = b
        .withColumn("h", md5Long(concat(col("doc_id").cast("string"), lit(":"),
          col("blk").cast("string"))))
        .select(col("lang"), col("doc_id"),
          least(lit(20L), col("n") - lit(20L) * col("blk")).as("bl"),
          (col("h") % 18).as("s"), expr("1 + (h div 18) % 3").as("sl"))
      mm.select(col("lang"), col("doc_id"), col("bl"),
          when(col("bl") > col("s"),
            least(col("s") + col("sl"), col("bl")) - col("s"))
            .otherwise(lit(0L)).as("msk"))
        .groupBy("lang")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_blocks"),
          sum(when(col("msk") > 0, 1L).otherwise(0L)).as("n_spans"),
          sum(col("bl")).as("n_tokens"),
          sum(col("msk")).as("n_masked"))
        .withColumn("mask_milli", expr("n_masked * 1000 div n_tokens"))
        .orderBy("lang")
    },

    // Fellegi–Sunter EM weight estimation (Fellegi & Sunter 1969 JASA;
    // EM fitting per Winkler 1988, both public) — the UNSUPERVISED side of
    // record linkage that q165's rule-scored resolution skips: estimate
    // per-field match/unmatch agreement rates (m, u) and the match
    // prevalence p from the agreement-pattern HISTOGRAM alone, no labels.
    // Pairs come from classic blocking (same nation × same acctbal/100
    // bucket, custkey< dedup); binary agreement fields γ = (segment,
    // |Δbal|<20, name-hash parity — the third is a per-RECORD coin flip,
    // yet its pair-level agreement is NOT iid: pairs share block members,
    // so a block that happens to skew parity-1 inflates agreements
    // quadratically, and the EM fit honestly soaks that clustering up as
    // weight (measured: ~57% agreement at sf0.01, not 50% — the classic
    // U-statistic variance trap in linkage evaluation; DepthWave9Spec
    // asserts the partial-order monotonicity law instead). The pivotal
    // scale fact: EM never
    // touches pairs — it runs on the ≤8-row (γ₁γ₂γ₃, n) histogram, so the
    // data-sized work is one blocked join + one grouped count
    // (partial-aggregated), and the 8 EM iterations live INSIDE one
    // fixed-order fold expression over a single collected-pattern row (the
    // q367 discipline — no per-round frames, checkpoints, or scalar
    // products). The oracle replays the identical updates as unrolled
    // MATERIALIZED CTE rounds. Output: per pattern, the posterior match
    // probability w and the Fellegi–Sunter match weight
    // log₂(P(γ|M)/P(γ|U)).
    q("q371_fs_em_weights",
      "Fellegi-Sunter EM (8 iters) on blocked customer pairs: pattern posteriors + weights")(
      {
        def pmSql(p: String) =
          s"(CASE WHEN h.g1 = 1 THEN $p.m1 ELSE 1 - $p.m1 END * " +
            s"CASE WHEN h.g2 = 1 THEN $p.m2 ELSE 1 - $p.m2 END * " +
            s"CASE WHEN h.g3 = 1 THEN $p.m3 ELSE 1 - $p.m3 END)"
        def puSql(p: String) =
          s"(CASE WHEN h.g1 = 1 THEN $p.u1 ELSE 1 - $p.u1 END * " +
            s"CASE WHEN h.g2 = 1 THEN $p.u2 ELSE 1 - $p.u2 END * " +
            s"CASE WHEN h.g3 = 1 THEN $p.u3 ELSE 1 - $p.u3 END)"
        val rounds = (1 to 8).map { t =>
          s"""w$t AS MATERIALIZED (
             |  SELECT h.g1, h.g2, h.g3, h.n,
             |         p.p * ${pmSql("p")} /
             |           (p.p * ${pmSql("p")} + (1 - p.p) * ${puSql("p")}) AS w
             |  FROM hist h CROSS JOIN p${t - 1} p),
             |p$t AS MATERIALIZED (
             |  SELECT sum(n * w) / sum(n) AS p,
             |         sum(n * w * g1) / sum(n * w) AS m1,
             |         sum(n * w * g2) / sum(n * w) AS m2,
             |         sum(n * w * g3) / sum(n * w) AS m3,
             |         sum(n * (1 - w) * g1) / sum(n * (1 - w)) AS u1,
             |         sum(n * (1 - w) * g2) / sum(n * (1 - w)) AS u2,
             |         sum(n * (1 - w) * g3) / sum(n * (1 - w)) AS u3
             |  FROM w$t)""".stripMargin
        }.mkString(",\n")
        s"""WITH pr AS (SELECT c_custkey AS k, c_nationkey AS nk,
           |                   CAST(floor(c_acctbal / 100) AS BIGINT) AS bb,
           |                   c_mktsegment AS seg, c_acctbal AS bal,
           |                   ${md5LongSql("c_name")} % 2 AS cb
           |            FROM customer),
           |pat AS (SELECT CAST(CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS BIGINT) AS g1,
           |               CAST(CASE WHEN abs(a.bal - b.bal) < 20 THEN 1 ELSE 0 END AS BIGINT) AS g2,
           |               CAST(CASE WHEN a.cb = b.cb THEN 1 ELSE 0 END AS BIGINT) AS g3
           |        FROM pr a JOIN pr b
           |          ON a.nk = b.nk AND a.bb = b.bb AND a.k < b.k),
           |hist AS MATERIALIZED (SELECT g1, g2, g3, CAST(count(*) AS BIGINT) AS n
           |                      FROM pat GROUP BY g1, g2, g3),
           |p0 AS (SELECT 0.1 AS p, 0.8 AS m1, 0.8 AS m2, 0.8 AS m3,
           |              0.2 AS u1, 0.2 AS u2, 0.2 AS u3),
           |$rounds
           |SELECT h.g1, h.g2, h.g3, h.n,
           |       round(p.p * ${pmSql("p")} /
           |             (p.p * ${pmSql("p")} + (1 - p.p) * ${puSql("p")}), 4) AS w,
           |       round((ln(${pmSql("p")}) - ln(${puSql("p")})) / ln(2), 4) AS match_weight
           |FROM hist h CROSS JOIN p8 p ORDER BY g1, g2, g3""".stripMargin
      }
    ) { (s, dir) =>
      val pr = Tables(s, dir, "customer").select(
        col("c_custkey").as("k"), col("c_nationkey").as("nk"),
        expr("cast(floor(c_acctbal / 100) as bigint)").as("bb"),
        col("c_mktsegment").as("seg"), col("c_acctbal").as("bal"),
        (md5Long(col("c_name")) % 2).as("cb"))
      val pat = pr.alias("a").join(pr.alias("b"),
          col("a.nk") === col("b.nk") && col("a.bb") === col("b.bb") &&
            col("a.k") < col("b.k"))
        .select(when(col("a.seg") === col("b.seg"), 1L).otherwise(0L).as("g1"),
          when(abs(col("a.bal") - col("b.bal")) < 20, 1L).otherwise(0L).as("g2"),
          when(col("a.cb") === col("b.cb"), 1L).otherwise(0L).as("g3"))
      val hist = pat.groupBy("g1", "g2", "g3").agg(count(lit(1)).as("n"))
        .agg(sort_array(collect_list(struct(col("g1"), col("g2"), col("g3"),
          col("n")))).as("pat"))
      // per-pattern mixture densities under the running state `st`
      val PM = "(if(x.g1 = 1, st.m1, 1.0d - st.m1) * if(x.g2 = 1, st.m2, 1.0d - st.m2)" +
        " * if(x.g3 = 1, st.m3, 1.0d - st.m3))"
      val PU = "(if(x.g1 = 1, st.u1, 1.0d - st.u1) * if(x.g2 = 1, st.u2, 1.0d - st.u2)" +
        " * if(x.g3 = 1, st.u3, 1.0d - st.u3))"
      val W = s"(st.p * $PM / (st.p * $PM + (1.0d - st.p) * $PU))"
      val sums = s"""aggregate(pat,
        named_struct('sw', 0.0d, 'sg1', 0.0d, 'sg2', 0.0d, 'sg3', 0.0d,
                     'su1', 0.0d, 'su2', 0.0d, 'su3', 0.0d, 'sn', 0.0d),
        (acc, x) -> named_struct(
          'sw',  acc.sw  + x.n * $W,
          'sg1', acc.sg1 + x.n * $W * x.g1,
          'sg2', acc.sg2 + x.n * $W * x.g2,
          'sg3', acc.sg3 + x.n * $W * x.g3,
          'su1', acc.su1 + x.n * (1.0d - $W) * x.g1,
          'su2', acc.su2 + x.n * (1.0d - $W) * x.g2,
          'su3', acc.su3 + x.n * (1.0d - $W) * x.g3,
          'sn',  acc.sn  + x.n))"""
      val fold = s"""aggregate(sequence(1, 8),
        named_struct('p', 0.1d, 'm1', 0.8d, 'm2', 0.8d, 'm3', 0.8d,
                     'u1', 0.2d, 'u2', 0.2d, 'u3', 0.2d),
        (st, t) -> named_struct(
          'p',  ($sums).sw / ($sums).sn,
          'm1', ($sums).sg1 / ($sums).sw,
          'm2', ($sums).sg2 / ($sums).sw,
          'm3', ($sums).sg3 / ($sums).sw,
          'u1', ($sums).su1 / (($sums).sn - ($sums).sw),
          'u2', ($sums).su2 / (($sums).sn - ($sums).sw),
          'u3', ($sums).su3 / (($sums).sn - ($sums).sw)))"""
      val fitted = hist.withColumn("st", expr(fold))
      val PMf = "(if(x.g1 = 1, st.m1, 1.0d - st.m1) * if(x.g2 = 1, st.m2, 1.0d - st.m2)" +
        " * if(x.g3 = 1, st.m3, 1.0d - st.m3))"
      val PUf = "(if(x.g1 = 1, st.u1, 1.0d - st.u1) * if(x.g2 = 1, st.u2, 1.0d - st.u2)" +
        " * if(x.g3 = 1, st.u3, 1.0d - st.u3))"
      fitted.select(explode(col("pat")).as("x"), col("st"))
        .select(col("x.g1").as("g1"), col("x.g2").as("g2"), col("x.g3").as("g3"),
          col("x.n").as("n"),
          round(expr(s"st.p * $PMf / (st.p * $PMf + (1.0d - st.p) * $PUf)"), 4).as("w"),
          round(expr(s"(ln($PMf) - ln($PUf)) / ln(2)"), 4).as("match_weight"))
        .orderBy("g1", "g2", "g3")
    },

    // Dataset cartography (Swayamdipta et al. 2020, public arXiv:
    // 2009.10795) — map each example by training-dynamics (confidence,
    // variability) and bucket the corpus into easy-to-learn / hard-to-learn
    // / ambiguous regions; the ambiguous band is where that paper finds the
    // data worth keeping. The "epochs" here are the 8 models of a NESTED
    // LEARNING CURVE: q368's Naive Bayes trained on hash-slices 1/8, 2/8,
    // …, 8/8 of the train half — real shrinking-estimator dynamics, not
    // jittered scores, and all 8 models come from ONE pass (cumulative
    // slice counts over the (lang, bucket, slice) cube — 5×64×8 rows,
    // metadata). Confidence = mean over epochs of the model's probability
    // on the TRUE lang, computed stably as 1/Σ_l exp(s_l − s_true) (the
    // log-sum-exp shift; the softmax is shift-invariant, so priors enter
    // as ln(nd+1) with the −ln(N) normalizer dropped, q368's discipline).
    // Variability = population std over the 8 epochs. Scale shape: one
    // tokenize+hash pass, cumulative sums over a constant cube, one
    // broadcast model join (≤2,560 rows) against test features.
    q("q373_data_cartography",
      "cartography zones per lang: confidence/variability over an 8-model NB learning curve")(
      s"""WITH tok AS (SELECT doc_id, lang, doc_id % 2 AS role,
         |                    ${md5LongSql("'ep:' || doc_id")} % 8 AS sl,
         |                    unnest(string_split(text, ' ')) AS w
         |             FROM documents WHERE length(text) > 0),
         |feat AS (SELECT doc_id, lang, role, sl, ${md5LongSql("w")} % 64 AS b,
         |                CAST(count(*) AS BIGINT) AS n
         |         FROM tok GROUP BY doc_id, lang, role, sl, b),
         |tc AS (SELECT lang, b, sl, CAST(sum(n) AS BIGINT) AS c
         |       FROM feat WHERE role = 0 GROUP BY lang, b, sl),
         |langs AS (SELECT DISTINCT lang FROM tc),
         |cube0 AS (SELECT l.lang, gb.b, gs.sl
         |          FROM langs l
         |          CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) gb
         |          CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS sl) gs),
         |cum AS (SELECT c0.lang, c0.b, c0.sl + 1 AS e,
         |               CAST(sum(coalesce(tc.c, 0)) OVER
         |                 (PARTITION BY c0.lang, c0.b ORDER BY c0.sl
         |                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cb
         |        FROM cube0 c0 LEFT JOIN tc
         |          ON tc.lang = c0.lang AND tc.b = c0.b AND tc.sl = c0.sl),
         |tote AS (SELECT lang, e, CAST(sum(cb) AS BIGINT) AS tot
         |         FROM cum GROUP BY lang, e),
         |ndc AS (SELECT d.lang, gs.sl + 1 AS e,
         |               CAST(sum(CASE WHEN d.sl <= gs.sl THEN 1 ELSE 0 END) AS BIGINT) AS nd
         |        FROM (SELECT DISTINCT doc_id, lang, sl FROM feat WHERE role = 0) d
         |        CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS sl) gs
         |        GROUP BY d.lang, gs.sl),
         |model AS (SELECT cum.lang, cum.b, cum.e,
         |                 ln((cum.cb + 1) / CAST(tote.tot + 64 AS DOUBLE)) AS lp
         |          FROM cum JOIN tote ON tote.lang = cum.lang AND tote.e = cum.e),
         |sc AS (SELECT f.doc_id, f.lang AS lang_true, m.e, m.lang AS lm,
         |              sum(f.n * m.lp) + ln(max(nd.nd) + 1) AS s
         |       FROM (SELECT * FROM feat WHERE role = 1) f
         |       JOIN model m ON m.b = f.b
         |       JOIN ndc nd ON nd.lang = m.lang AND nd.e = m.e
         |       GROUP BY f.doc_id, f.lang, m.e, m.lang),
         |st AS (SELECT doc_id, e, s AS s_true FROM sc WHERE lm = lang_true),
         |pe AS (SELECT sc.doc_id, max(sc.lang_true) AS lang_true, sc.e,
         |              round(1.0 / sum(exp(sc.s - st.s_true)), 6) AS p
         |       FROM sc JOIN st ON st.doc_id = sc.doc_id AND st.e = sc.e
         |       GROUP BY sc.doc_id, sc.e),
         |cart AS (SELECT doc_id, max(lang_true) AS lang, round(avg(p), 6) AS conf,
         |                round(sqrt(greatest(avg(p * p) - avg(p) * avg(p), 0)), 6) AS vr
         |         FROM pe GROUP BY doc_id),
         |z AS (SELECT lang,
         |             CASE WHEN conf >= 0.667 AND vr <= 0.2 THEN 'easy'
         |                  WHEN conf < 0.333 THEN 'hard'
         |                  WHEN vr > 0.2 THEN 'ambiguous'
         |                  ELSE 'mid' END AS zone, conf, vr
         |      FROM cart)
         |SELECT lang, zone, CAST(count(*) AS BIGINT) AS n_docs,
         |       round(avg(conf), 4) AS mean_conf, round(avg(vr), 4) AS mean_var
         |FROM z GROUP BY lang, zone ORDER BY lang, zone""".stripMargin
    ) { (s, dir) =>
      val tok = Tables.fanout(s, dir, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("lang"), (col("doc_id") % 2).as("role"),
          (md5Long(concat(lit("ep:"), col("doc_id").cast("string"))) % 8).as("sl"),
          explode(tokens(col("text"))).as("w"))
      val feat = tok
        .select(col("doc_id"), col("lang"), col("role"), col("sl"),
          (md5Long(col("w")) % 64).as("b"))
        .groupBy("doc_id", "lang", "role", "sl", "b").agg(count(lit(1)).as("n"))
        .cache() // train counts + doc slices + test scoring
      val tc = feat.filter(col("role") === 0)
        .groupBy("lang", "b", "sl").agg(sum(col("n")).as("c"))
      val cube0 = tc.select("lang").distinct()
        .select(col("lang"), explode(sequence(lit(0L), lit(63L))).as("b"))
        .select(col("lang"), col("b"), explode(sequence(lit(0L), lit(7L))).as("sl"))
      val wcum = Window.partitionBy("lang", "b").orderBy("sl")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = cube0.alias("c0")
        .join(tc.alias("t"), col("t.lang") === col("c0.lang") &&
          col("t.b") === col("c0.b") && col("t.sl") === col("c0.sl"), "left")
        .select(col("c0.lang").as("lang"), col("c0.b").as("b"), col("c0.sl").as("sl"),
          coalesce(col("t.c"), lit(0L)).as("c"))
        .select(col("lang"), col("b"), (col("sl") + 1).as("e"),
          sum(col("c")).over(wcum).as("cb"))
      val tote = cum.groupBy("lang", "e").agg(sum(col("cb")).as("tot"))
      val ndc = feat.filter(col("role") === 0)
        .select("doc_id", "lang", "sl").distinct()
        .select(col("lang"), col("sl"), explode(sequence(lit(0L), lit(7L))).as("gs"))
        .groupBy(col("lang"), (col("gs") + 1).as("e"))
        .agg(sum(when(col("sl") <= col("gs"), 1L).otherwise(0L)).as("nd"))
      val model = cum.alias("c")
        .join(tote.alias("tt"), col("tt.lang") === col("c.lang") &&
          col("tt.e") === col("c.e"))
        .select(col("c.lang").as("lang"), col("c.b").as("b"), col("c.e").as("e"),
          log((col("c.cb") + 1) / (col("tt.tot") + 64).cast("double")).as("lp"))
      // Scoring joins the PIVOTED model — (lang, b) → 8-epoch lp array —
      // so the fan-out is ×|langs| (5), not ×|langs×epochs| (40): the
      // partial aggregate then ships (doc, lm) rows carrying 8 parallel
      // sums instead of 8× the rows (measured 5.7 → ~3 s at sf0.1; same
      // term multisets per (doc, lm, e), so round-4 outputs are unmoved).
      val modelW = model.groupBy("lang", "b")
        .agg(sort_array(collect_list(struct(col("e"), col("lp")))).as("x"))
        .select(col("lang"), col("b"), expr("transform(x, v -> v.lp)").as("lps"))
      val ndW = ndc.groupBy("lang")
        .agg(sort_array(collect_list(struct(col("e"), col("nd")))).as("x"))
        .select(col("lang").as("lm"), expr("transform(x, v -> v.nd)").as("nds"))
      val sumExprs = (1 to 8).map(e =>
        sum(col("f.n") * element_at(col("m.lps"), e)).as(s"f$e"))
      val scW = feat.filter(col("role") === 1).alias("f")
        .join(broadcast(modelW).alias("m"), col("m.b") === col("f.b"))
        .groupBy(col("f.doc_id").as("doc_id"), col("f.lang").as("lang_true"),
          col("m.lang").as("lm"))
        .agg(sumExprs.head, sumExprs.tail: _*)
      val sc = scW.join(broadcast(ndW), Seq("lm"))
        .withColumn("fs", array((1 to 8).map(e => col(s"f$e")): _*))
        .select(col("doc_id"), col("lang_true"), col("lm"), col("fs"), col("nds"))
        .select(col("doc_id"), col("lang_true"), col("lm"), col("fs"), col("nds"),
          explode(sequence(lit(1), lit(8))).as("e"))
        .select(col("doc_id"), col("lang_true"), col("e").cast("long").as("e"),
          col("lm"),
          (element_at(col("fs"), col("e")) +
            log(element_at(col("nds"), col("e")) + 1)).as("s"))
        .cache() // full score frame + the s_true slice
      val st = sc.filter(col("lm") === col("lang_true"))
        .select(col("doc_id"), col("e"), col("s").as("s_true"))
      val pe = sc.alias("sc")
        .join(st.alias("st"), col("st.doc_id") === col("sc.doc_id") &&
          col("st.e") === col("sc.e"))
        .groupBy(col("sc.doc_id").as("doc_id"), col("sc.e").as("e"))
        .agg(max(col("sc.lang_true")).as("lang_true"),
          // round-before-compare (the q67/q377 discipline, r8 advice):
          // p, then conf/vr, land on 6-place grids in BOTH engines before
          // the knife-edge zone thresholds read them
          round(lit(1.0) / sum(exp(col("sc.s") - col("st.s_true"))), 6).as("p"))
      val cart = pe.groupBy("doc_id")
        .agg(max(col("lang_true")).as("lang"), round(avg(col("p")), 6).as("conf"),
          round(sqrt(greatest(avg(col("p") * col("p")) - avg(col("p")) * avg(col("p")),
            lit(0.0))), 6).as("vr"))
      cart.select(col("lang"),
          when(col("conf") >= 0.667 && col("vr") <= 0.2, "easy")
            .when(col("conf") < 0.333, "hard")
            .when(col("vr") > 0.2, "ambiguous")
            .otherwise("mid").as("zone"), col("conf"), col("vr"))
        .groupBy("lang", "zone")
        .agg(count(lit(1)).as("n_docs"), round(avg(col("conf")), 4).as("mean_conf"),
          round(avg(col("vr")), 4).as("mean_var"))
        .orderBy("lang", "zone")
    }
  )
}
