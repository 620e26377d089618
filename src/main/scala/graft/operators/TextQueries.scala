package graft.operators

import graft.Registry.{Q, q}
import graft.Tables
import graft.functions.PortableHash._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators for LLM training-data pipelines (SURVEY.md §2B
  * B36 + the north-star additions): token analytics, heuristic language ID,
  * quality scoring, token counting, and rolling-hash fingerprinting. All
  * deterministic arithmetic/regex — every query oracle-checked in DuckDB.
  */
object TextQueries {

  /** Marker stopwords per language for the heuristic language scorer. The
    * rule (max marker-hit count, priority order en>fr>es>de>zh on ties) is
    * the deterministic n-gram-style heuristic; quality is not the point —
    * identical classification in both engines is. */
  private[graft] val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  private[graft] def inListSql(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")

  /** q76's oracle: the same 3 BPE iterations unrolled as chained CTEs
    * (declared before `all` — object vals initialize in order). */
  private val bpeSql: String = {
    def pairsCte(seqTbl: String, pName: String) =
      s"""$pName AS (
         |  SELECT s AS pair, CAST(sum(n) AS BIGINT) AS c
         |  FROM (SELECT unnest(${shinglesSql(s"string_split(trim(seq), ' ')", 2)}) AS s, n
         |        FROM $seqTbl)
         |  GROUP BY s ORDER BY c DESC, pair LIMIT 1)""".stripMargin
    def mergeCte(prevSeq: String, pName: String, newName: String) =
      s"""$newName AS (
         |  SELECT replace(seq, ' ' || p.pair || ' ', ' ' || replace(p.pair, ' ', '') || ' ') AS seq, n
         |  FROM $prevSeq CROSS JOIN $pName p)""".stripMargin
    s"""WITH w AS (
       |  SELECT tok, count(*) AS n
       |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY tok),
       |seq0 AS (SELECT ' ' || array_to_string(string_split(tok, ''), ' ') || ' ' AS seq, n FROM w),
       |${pairsCte("seq0", "p1")},
       |${mergeCte("seq0", "p1", "seq1")},
       |${pairsCte("seq1", "p2")},
       |${mergeCte("seq1", "p2", "seq2")},
       |${pairsCte("seq2", "p3")}
       |SELECT CAST(1 AS BIGINT) AS it, pair, c FROM p1
       |UNION ALL SELECT 2, pair, c FROM p2
       |UNION ALL SELECT 3, pair, c FROM p3
       |ORDER BY it""".stripMargin
  }

  /** q76c's oracle: the q76 chain generalized to `rounds` iterations. The
    * CTEs MUST be MATERIALIZED: DuckDB inlines plain CTEs, and each stage
    * references its predecessor twice (pair count + merge application), so
    * a 32-round chain would otherwise expand 2^32 ways. Same per-round
    * algebra as [[bpeSql]], byte-for-byte. */
  private def bpeDeepSql(rounds: Int): String = {
    def pairsCte(seqTbl: String, pName: String) =
      s"""$pName AS MATERIALIZED (
         |  SELECT s AS pair, CAST(sum(n) AS BIGINT) AS c
         |  FROM (SELECT unnest(${shinglesSql(s"string_split(trim(seq), ' ')", 2)}) AS s, n
         |        FROM $seqTbl)
         |  GROUP BY s ORDER BY c DESC, pair LIMIT 1)""".stripMargin
    def mergeCte(prevSeq: String, pName: String, newName: String) =
      s"""$newName AS MATERIALIZED (
         |  SELECT replace(seq, ' ' || p.pair || ' ', ' ' || replace(p.pair, ' ', '') || ' ') AS seq, n
         |  FROM $prevSeq CROSS JOIN $pName p)""".stripMargin
    val ctes = (1 to rounds).flatMap { i =>
      pairsCte(s"seq${i - 1}", s"p$i") ::
        (if (i < rounds) mergeCte(s"seq${i - 1}", s"p$i", s"seq$i") :: Nil else Nil)
    }
    s"""WITH w AS (
       |  SELECT tok, count(*) AS n
       |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY tok),
       |seq0 AS MATERIALIZED (SELECT ' ' || array_to_string(string_split(tok, ''), ' ') || ' ' AS seq, n FROM w),
       |${ctes.mkString(",\n")}
       |${(1 to rounds).map(i => s"SELECT CAST($i AS BIGINT) AS it, pair, c FROM p$i")
           .mkString("\nUNION ALL ")}
       |ORDER BY it""".stripMargin
  }

  /** q76b's oracle: the q76 training chain with the token identity carried
    * through each merge, so the final sequence IS the token's encoding. */
  private val bpeEncodeSql: String = {
    def pairsCte(seqTbl: String, pName: String) =
      s"""$pName AS (
         |  SELECT s AS pair, CAST(sum(n) AS BIGINT) AS c
         |  FROM (SELECT unnest(${shinglesSql(s"string_split(trim(seq), ' ')", 2)}) AS s, n
         |        FROM $seqTbl)
         |  GROUP BY s ORDER BY c DESC, pair LIMIT 1)""".stripMargin
    def mergeCte(prevSeq: String, pName: String, newName: String) =
      s"""$newName AS (
         |  SELECT tok, replace(seq, ' ' || p.pair || ' ', ' ' || replace(p.pair, ' ', '') || ' ') AS seq, n
         |  FROM $prevSeq CROSS JOIN $pName p)""".stripMargin
    s"""WITH w AS (
       |  SELECT tok, count(*) AS n
       |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY tok),
       |seq0 AS (SELECT tok, ' ' || array_to_string(string_split(tok, ''), ' ') || ' ' AS seq, n FROM w),
       |${pairsCte("seq0", "p1")},
       |${mergeCte("seq0", "p1", "seq1")},
       |${pairsCte("seq1", "p2")},
       |${mergeCte("seq1", "p2", "seq2")},
       |${pairsCte("seq2", "p3")},
       |${mergeCte("seq2", "p3", "seq3")}
       |SELECT tok, n, trim(seq) AS encoded FROM seq3
       |ORDER BY n DESC, tok LIMIT 50""".stripMargin
  }

  /** q110's oracle. BM25 determinism contract: every per-term score is one
    * fixed-shape double expression (ln is bit-compatible across engines),
    * and the per-doc total is a SEQUENTIAL fold over term-sorted scores
    * (list_reduce ≙ Spark aggregate) — no order-free float sum anywhere. */
  private val bm25Sql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |dl AS (SELECT doc_id, count(*) AS dlen FROM tok GROUP BY doc_id),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |                 CAST(sum(dlen) AS BIGINT) / (1.0 * count(*)) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok
      |       WHERE term IN ('spark', 'merge', 'stream') GROUP BY doc_id, term),
      |df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok
      |       WHERE term IN ('spark', 'merge', 'stream') GROUP BY term),
      |sc AS (SELECT t.doc_id, t.term,
      |              ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) *
      |              (t.tf * 2.2) / (t.tf + 1.2 * (0.25 + 0.75 * l.dlen / s.avgdl)) AS score
      |       FROM tf t JOIN df d USING (term) JOIN dl l USING (doc_id) CROSS JOIN stats s)
      |SELECT doc_id,
      |       round(list_reduce(list_prepend(0.0, list(score ORDER BY term)), (a, x) -> a + x), 4) AS bm25
      |FROM sc GROUP BY doc_id
      |ORDER BY bm25 DESC, doc_id LIMIT 50""".stripMargin

  /** q75's oracle — also the exact oracle of the streaming twin q75b
    * (single-batch replay ⇒ the stream-maintained grid equals the batch
    * grid cell-for-cell). */
  private[graft] val countminSql: String =
    s"""WITH occ AS (SELECT unnest(str_split(text, ' ')) AS tok FROM documents),
       |cand AS (SELECT tok, count(*) AS exact_n FROM occ GROUP BY tok),
       |ic AS (SELECT tok, exact_n, i,
       |              ${md5LongSql("CAST(i AS VARCHAR) || ':' || tok")} % 256 AS cell
       |       FROM cand, (SELECT unnest([0, 1, 2, 3]) AS i)),
       |cells AS (SELECT i, cell, CAST(sum(exact_n) AS BIGINT) AS c FROM ic GROUP BY i, cell),
       |est AS (SELECT t.tok, t.exact_n, min(c.c) AS cm_est
       |        FROM ic t JOIN cells c ON t.i = c.i AND t.cell = c.cell
       |        GROUP BY t.tok, t.exact_n)
       |SELECT tok, exact_n, cm_est FROM est
       |ORDER BY cm_est DESC, tok LIMIT 20""".stripMargin

  /** Shared q327/q365 oracle CTE chain: the Kneser–Ney trigram estimator
    * (fixed 200-doc train slice, discount d=¾, integer micro-units) ending
    * in `p` with per-eval-trigram (doc_id, p_mle, p_kn). One definition
    * keeps the LM and every downstream score consumer in lockstep (the
    * kmvEstimateSql lesson). */
  private val knCteSql: String =
    s"""WITH tok AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
       |tri AS (SELECT doc_id, unnest(${shinglesSql("toks", 3)}) AS tg
       |        FROM tok WHERE len(toks) >= 3),
       |tw AS (SELECT doc_id, tg,
       |              split_part(tg, ' ', 1) || ' ' || split_part(tg, ' ', 2) AS ctx,
       |              split_part(tg, ' ', 3) AS w3 FROM tri),
       |c3 AS (SELECT tg, CAST(count(*) AS BIGINT) AS c3 FROM tw WHERE doc_id < 200 GROUP BY tg),
       |cx AS (SELECT ctx, CAST(count(*) AS BIGINT) AS cc,
       |              CAST(count(DISTINCT w3) AS BIGINT) AS n1f
       |       FROM tw WHERE doc_id < 200 GROUP BY ctx),
       |cont AS (SELECT w3, CAST(count(DISTINCT ctx) AS BIGINT) AS n1b
       |         FROM tw WHERE doc_id < 200 GROUP BY w3),
       |tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM c3),
       |ev AS (SELECT doc_id, tg, ctx, w3 FROM tw WHERE doc_id >= 200),
       |p AS (SELECT ev.doc_id,
       |             CASE WHEN COALESCE(c3.c3, 0) > 0
       |                  THEN (c3.c3 * 1000000) // cx.cc ELSE 0 END AS p_mle,
       |             CASE WHEN COALESCE(cx.cc, 0) > 0
       |                  THEN (greatest(4 * COALESCE(c3.c3, 0) - 3, 0) * 1000000) // (4 * cx.cc)
       |                     + (3 * cx.n1f * (COALESCE(cont.n1b, 0) * 1000000 // tt.t)) // (4 * cx.cc)
       |                  ELSE COALESCE(cont.n1b, 0) * 1000000 // tt.t END AS p_kn
       |      FROM ev LEFT JOIN c3 USING (tg) LEFT JOIN cx USING (ctx)
       |      LEFT JOIN cont USING (w3) CROSS JOIN tt)""".stripMargin

  /** Spark twin of [[knCteSql]]: per-eval-trigram (doc_id, p_mle, p_kn). */
  private def knScored(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val tw = Tables.fanout(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(shingles(col("toks"), 3)).as("tg"))
      .select(col("doc_id"), col("tg"),
        concat(split_part(col("tg"), lit(" "), lit(1)), lit(" "),
          split_part(col("tg"), lit(" "), lit(2))).as("ctx"),
        split_part(col("tg"), lit(" "), lit(3)).as("w3"))
      .cache() // train counts (3 tables) + the eval scan
    val train = tw.filter(col("doc_id") < 200)
    val c3 = train.groupBy("tg").agg(count(lit(1)).as("c3"))
      .cache() // type count + eval join
    val cx = train.groupBy("ctx")
      .agg(count(lit(1)).as("cc"), countDistinct("w3").cast("long").as("n1f"))
    val cont = train.groupBy("w3")
      .agg(countDistinct("ctx").cast("long").as("n1b"))
    val tt = c3.agg(count(lit(1)).as("t"))
    tw.filter(col("doc_id") >= 200)
      .join(broadcast(c3), Seq("tg"), "left")
      .join(broadcast(cx), Seq("ctx"), "left")
      .join(broadcast(cont), Seq("w3"), "left")
      .crossJoin(broadcast(tt))
      .select(col("doc_id"),
        expr("case when coalesce(c3, 0) > 0 then (c3 * 1000000) div cc else 0 end")
          .as("p_mle"),
        expr("case when coalesce(cc, 0) > 0" +
          " then (greatest(4 * coalesce(c3, 0) - 3, 0) * 1000000) div (4 * cc)" +
          " + (3 * n1f * (coalesce(n1b, 0) * 1000000 div t)) div (4 * cc)" +
          " else coalesce(n1b, 0) * 1000000 div t end").as("p_kn"))
  }

  /** Shared q36b/q375 marker-rule decision — max hit count with the fixed
    * en>fr>es>de>zh priority — as one SQL CASE over n_<lang> columns and
    * its Spark when-chain twin, so the heuristic and its agreement eval
    * (kappa) can never drift. */
  private val markerCaseSql: String =
    """CASE WHEN n_en >= n_fr AND n_en >= n_es AND n_en >= n_de AND n_en >= n_zh THEN 'en'
      |            WHEN n_fr >= n_es AND n_fr >= n_de AND n_fr >= n_zh THEN 'fr'
      |            WHEN n_es >= n_de AND n_es >= n_zh THEN 'es'
      |            WHEN n_de >= n_zh THEN 'de' ELSE 'zh' END""".stripMargin

  /** Shared q36b/q375 marker hit-count frame: (doc_id, lang, n_<lang>…). */
  private def markerScored(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val t = Tables.fanout(s, dir, "documents")
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("w"))
    markers.foldLeft(t) { case (df, (l, ws)) =>
      df.withColumn(s"n_$l",
        size(filter(col("w"), x => x.isin(ws.map(_.asInstanceOf[Any]): _*))))
    }
  }

  private def markerPredCol: org.apache.spark.sql.Column =
    when(col("n_en") >= col("n_fr") && col("n_en") >= col("n_es")
      && col("n_en") >= col("n_de") && col("n_en") >= col("n_zh"), "en")
      .when(col("n_fr") >= col("n_es") && col("n_fr") >= col("n_de")
        && col("n_fr") >= col("n_zh"), "fr")
      .when(col("n_es") >= col("n_de") && col("n_es") >= col("n_zh"), "es")
      .when(col("n_de") >= col("n_zh"), "de").otherwise("zh")

  /** Shared q368/q375/q376 oracle CTE chain: the parity-split multinomial
    * Naive Bayes over 64 hashed-unigram buckets — Laplace-smoothed model on
    * the full (lang × bucket) spine, test-half scoring with the ln(ndocs)
    * prior (the −ln(N) normalizer cancels in both argmax and softmax) —
    * ends defining `nbscored(doc_id, lang_true, lang_pred, score)` with the
    * score ROUNDED to 4 (rank/softmax determinism across engines, the q67
    * discipline). One definition keeps the classifier, its eval (kappa),
    * and its calibration (Brier) in lockstep — the erScoredCteSql lesson. */
  private val nbScoredCteSql: String =
    s"""tok AS (SELECT doc_id, lang, doc_id % 2 AS role,
       |                    unnest(string_split(text, ' ')) AS w
       |             FROM documents WHERE length(text) > 0),
       |feat AS (SELECT doc_id, lang, role, ${md5LongSql("w")} % 64 AS b,
       |                CAST(count(*) AS BIGINT) AS n
       |         FROM tok GROUP BY doc_id, lang, role, b),
       |cb AS (SELECT lang, b, CAST(sum(n) AS BIGINT) AS cb
       |       FROM feat WHERE role = 0 GROUP BY lang, b),
       |ct AS (SELECT lang, CAST(sum(cb) AS BIGINT) AS tot FROM cb GROUP BY lang),
       |nd AS (SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS ndocs
       |       FROM feat WHERE role = 0 GROUP BY lang),
       |spine AS (SELECT lang, tot, unnest(generate_series(0, 63)) AS b FROM ct),
       |model AS (SELECT s.lang, s.b,
       |                 ln((coalesce(cb.cb, 0) + 1) / CAST(s.tot + 64 AS DOUBLE)) AS lp
       |          FROM spine s LEFT JOIN cb ON cb.lang = s.lang AND cb.b = s.b),
       |nbsc AS (SELECT f.doc_id, f.lang AS lang_true, m.lang AS lang_pred,
       |              sum(f.n * m.lp) AS fs
       |       FROM (SELECT * FROM feat WHERE role = 1) f
       |       JOIN model m ON m.b = f.b
       |       GROUP BY f.doc_id, f.lang, m.lang),
       |nbscored AS (SELECT doc_id, lang_true, nbsc.lang_pred,
       |                  round(fs + ln(nd.ndocs), 4) AS score
       |           FROM nbsc JOIN nd ON nd.lang = nbsc.lang_pred)""".stripMargin

  /** Spark twin of [[nbScoredCteSql]]: (doc_id, lang_true, lang_pred,
    * score) for every test doc × class. */
  private def nbScored(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val tok = Tables.fanout(s, dir, "documents")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("lang"), (col("doc_id") % 2).as("role"),
        explode(tokens(col("text"))).as("w"))
    val feat = tok
      .select(col("doc_id"), col("lang"), col("role"),
        (md5Long(col("w")) % 64).as("b"))
      .groupBy("doc_id", "lang", "role", "b").agg(count(lit(1)).as("n"))
      .cache() // feeds train counts AND test scoring
    val cb = feat.filter(col("role") === 0)
      .groupBy("lang", "b").agg(sum(col("n")).as("cb"))
    val ct = cb.groupBy("lang").agg(sum(col("cb")).as("tot"))
    val nd = feat.filter(col("role") === 0)
      .groupBy("lang").agg(countDistinct(col("doc_id")).as("ndocs"))
    val spine = ct.select(col("lang"), col("tot"),
      explode(sequence(lit(0L), lit(63L))).as("b"))
    val model = spine.alias("s")
      .join(cb.alias("c"),
        col("c.lang") === col("s.lang") && col("c.b") === col("s.b"), "left")
      .select(col("s.lang").as("lang"), col("s.b").as("b"),
        log((coalesce(col("c.cb"), lit(0L)) + 1) /
          (col("s.tot") + 64).cast("double")).as("lp"))
    val sc = feat.filter(col("role") === 1).alias("f")
      .join(broadcast(model).alias("m"), col("m.b") === col("f.b"))
      .groupBy(col("f.doc_id").as("doc_id"), col("f.lang").as("lang_true"),
        col("m.lang").as("lang_pred"))
      .agg(sum(col("f.n") * col("m.lp")).as("fs"))
    sc.join(broadcast(nd.withColumnRenamed("lang", "lang_pred")), Seq("lang_pred"))
      .select(col("doc_id"), col("lang_true"), col("lang_pred"),
        round(col("fs") + log(col("ndocs")), 4).as("score"))
  }

  val all: Seq[Q] = Seq(

    // B36: token frequency analytics — top-20 tokens per language.
    q("q36_top_tokens", "B36 top-20 tokens per language (count desc, token asc)")(
      """SELECT lang, w, n, CAST(rn AS BIGINT) AS rn
        |FROM (SELECT lang, w, count(*) AS n,
        |             row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, w) AS rn
        |      FROM (SELECT lang, unnest(str_split(text, ' ')) AS w FROM documents)
        |      GROUP BY lang, w)
        |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin
    ) { (s, dir) =>
      val tok = Tables.fanout(s, dir, "documents")
        .select(col("lang"), explode(tokens(col("text"))).as("w"))
      val counted = tok.groupBy("lang", "w").agg(count(lit(1)).as("n"))
      // native TopKPerKeyExec over the vocab×lang count frame (≤ 20 rows/
      // lang/task cross the exchange; the rank window full-shuffled the
      // whole vocabulary); ranks come from a per-lang sorted array over
      // the 20 survivors — n is a positive count, so -n is a safe sort key
      graft.plans.TopKPerKey.topK(counted, Seq(col("lang")),
          Seq(col("n").desc, col("w")), 20)
        .groupBy("lang")
        .agg(sort_array(collect_list(struct((-col("n")).as("k1"), col("w"),
          col("n")))).as("arr"))
        .select(col("lang"), posexplode(col("arr")))
        .select(col("lang"), col("col.w").as("w"), col("col.n").as("n"),
          (col("pos") + 1).cast("long").as("rn"))
        .orderBy("lang", "rn")
    },

    // Heuristic language ID: count marker-stopword hits per language, pick
    // the max with a fixed priority order. Deterministic rule, not ML.
    q("q36b_language_id", "heuristic marker-stopword language ID per doc")(
      s"""WITH t AS (SELECT doc_id, lang, str_split(text, ' ') AS w FROM documents),
         |sc AS (SELECT doc_id, lang,
         |${markers.map { case (l, ws) =>
             s"  len(list_filter(w, x -> x IN (${inListSql(ws)}))) AS n_$l"
           }.mkString(",\n")}
         |FROM t)
         |SELECT doc_id, lang AS labeled,
         |       $markerCaseSql AS pred,
         |       CAST(n_en AS BIGINT) AS n_en, CAST(n_fr AS BIGINT) AS n_fr
         |FROM sc ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val withScores = markerScored(s, dir)
      withScores.select(col("doc_id"), col("lang").as("labeled"),
        markerPredCol.as("pred"),
        col("n_en").cast("long").as("n_en"), col("n_fr").cast("long").as("n_fr"))
        .orderBy("doc_id")
    },

    // Quality scoring: length/punctuation/stopword-ratio heuristics.
    q("q36c_quality_score", "doc quality metrics: tokens, punct ratio, stopword ratio, score")(
      s"""WITH t AS (SELECT doc_id, text, n_chars, str_split(text, ' ') AS w FROM documents),
         |m AS (SELECT doc_id, n_chars,
         |             len(w) AS n_tok,
         |             length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS n_punct,
         |             len(list_filter(w, x -> x IN (${inListSql(markers.flatMap(_._2))}))) AS n_stop
         |      FROM t)
         |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
         |       round(n_punct * 1.0 / n_chars, 4) AS punct_ratio,
         |       round(n_stop * 1.0 / n_tok, 4) AS stop_ratio,
         |       round(least(n_tok / 100.0, 1.0) * (1.0 - n_punct * 1.0 / n_chars), 4) AS score
         |FROM m ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val allMarkers = markers.flatMap(_._2)
      Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("n_chars"), tokens(col("text")).as("w"))
        .select(col("doc_id"),
          size(col("w")).cast("long").as("n_tok"),
          (length(col("text")) - length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", "")))
            .as("n_punct"),
          size(filter(col("w"), x => x.isin(allMarkers.map(_.asInstanceOf[Any]): _*)))
            .as("n_stop"),
          col("n_chars"))
        .select(col("doc_id"), col("n_tok"),
          round(col("n_punct") * lit(1.0) / col("n_chars"), 4).as("punct_ratio"),
          round(col("n_stop") * lit(1.0) / col("n_tok"), 4).as("stop_ratio"),
          round(least(col("n_tok") / 100.0, lit(1.0))
            * (lit(1.0) - col("n_punct") * lit(1.0) / col("n_chars")), 4).as("score"))
        .orderBy("doc_id")
    },

    // Token counting: whitespace tokens + a BPE-ish regex segmentation
    // (letter runs / digit runs / single other chars).
    q("q36d_token_count", "whitespace + BPE-ish regex token counts per doc")(
      """SELECT doc_id,
        |       CAST(len(str_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))).cast("long").as("bpe_tokens"))
        .orderBy("doc_id")
    },

    // Document fingerprinting: polynomial rolling hash over token hashes
    // (Karp–Rabin style), identical left-fold in both engines.
    q("q36e_fingerprint", "rolling-hash document fingerprint")(
      s"""SELECT doc_id,
         |       list_reduce(list_transform(str_split(text, ' '), t -> ${h1Sql("t")}),
         |                   (a, b) -> (a * 31 + b) % $P) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Tables.fanout(s, dir, "documents").select(
        col("doc_id"),
        aggregate(transform(tokens(col("text")), t => h1(t)),
          lit(0L), (acc, h) => (acc * 31 + h) % P).as("fp"))
        .orderBy("doc_id")
    },

    // TF-IDF: top-3 distinctive terms per doc. Ranking happens on the
    // ALREADY-ROUNDED score (round first, then row_number ordered by it),
    // so a sub-round-4 ulp divergence in ln() can never flip a rank; ties
    // break on the term. ln() itself is bit-compatible across the engines
    // (q21 proves it over 60k values).
    q("q36f_tfidf", "top-3 TF-IDF terms per doc (tf · ln(N/df), rank on rounded score)")(
      """WITH tok AS (SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
        |df AS (SELECT w, count(DISTINCT doc_id) AS df FROM tok GROUP BY w),
        |nd AS (SELECT count(*) AS n FROM documents),
        |sc AS (SELECT tf.doc_id, tf.w, tf.tf, df.df,
        |              round(tf.tf * ln(nd.n * 1.0 / df.df), 4) AS tfidf
        |       FROM tf JOIN df USING (w) CROSS JOIN nd)
        |SELECT doc_id, w, tf, df, tfidf, CAST(rn AS BIGINT) AS rn
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, w) AS rn FROM sc)
        |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin
    ) { (s, dir) =>
      val tok = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val df = tok.select("w", "doc_id").distinct()
        .groupBy("w").agg(count(lit(1)).as("df"))
      val nd = Tables(s, dir, "documents").agg(count(lit(1)).as("n"))
      val scored = tf.join(df, "w").crossJoin(broadcast(nd))
        .withColumn("tfidf", round(col("tf") * log(col("n") * lit(1.0) / col("df")), 4))
      // native TopKPerKeyExec over the (doc, term) frame — corpus-scale, so
      // the rank window's full shuffle was the plan's dominant exchange;
      // ranks come from a per-doc sorted array over the ≤ 3 survivors
      // (tfidf ≥ 0 because df ≤ N, so -tfidf is a safe sort key)
      graft.plans.TopKPerKey.topK(scored, Seq(col("doc_id")),
          Seq(col("tfidf").desc, col("w")), 3)
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct((-col("tfidf")).as("k1"), col("w"),
          col("tf"), col("df"), col("tfidf")))).as("arr"))
        .select(col("doc_id"), posexplode(col("arr")))
        .select(col("doc_id"), col("col.w").as("w"), col("col.tf").as("tf"),
          col("col.df").as("df"), col("col.tfidf").as("tfidf"),
          (col("pos") + 1).cast("long").as("rn"))
        .orderBy("doc_id", "rn")
    },

    // PMI collocations — the corpus-statistics miner (phrase detection à la
    // word2vec preprocessing): score every bigram with ≥5 occurrences by
    // pointwise mutual information ln(p(xy) / (p(x)·p(y))) and keep the top
    // 50. The PMI argument is evaluated in ONE fixed multiply/divide order
    // in both engines (double ops are deterministic; ln is bit-compatible —
    // q21), and ranking happens on the already-rounded score with (w1, w2)
    // tiebreaks. Scale shape: two count aggregations (partial+final),
    // scalar totals broadcast, unigram joins keyed by token, top-k via
    // per-partition heaps (TakeOrderedAndProject), never a global sort.
    q("q36g_pmi_collocations", "top-50 bigram collocations by PMI (support >= 5)")(
      s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
         |uni AS (SELECT u, count(*) AS c FROM (SELECT unnest(w) AS u FROM t) GROUP BY u),
         |nu AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM uni),
         |bi AS (SELECT s, count(*) AS c FROM (SELECT unnest(${shinglesSql("w", 2)}) AS s FROM t) GROUP BY s),
         |nb AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM bi),
         |sc AS (SELECT split_part(b.s, ' ', 1) AS w1, split_part(b.s, ' ', 2) AS w2, b.c,
         |              round(ln(((b.c * 1.0) * nu.n / nb.n) * nu.n / ((ua.c * 1.0) * ub.c)), 4) AS pmi
         |       FROM bi b
         |       JOIN uni ua ON ua.u = split_part(b.s, ' ', 1)
         |       JOIN uni ub ON ub.u = split_part(b.s, ' ', 2)
         |       CROSS JOIN nu CROSS JOIN nb
         |       WHERE b.c >= 5)
         |SELECT w1, w2, c, pmi, CAST(rn AS BIGINT) AS rn
         |FROM (SELECT *, row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rn FROM sc)
         |WHERE rn <= 50 ORDER BY rn""".stripMargin
    ) { (s, dir) =>
      val t = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("w"))
      val uni = t.select(explode(col("w")).as("u"))
        .groupBy("u").agg(count(lit(1)).as("c")).cache() // joined twice
      val nu = uni.agg(sum(col("c")).cast("double").as("nu"))
      val bi = t.select(explode(shingles(col("w"), 2)).as("s"))
        .groupBy("s").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 5)
        .select(split_part(col("s"), lit(" "), lit(1)).as("w1"),
          split_part(col("s"), lit(" "), lit(2)).as("w2"), col("c"))
      val nb = t.select(explode(shingles(col("w"), 2)).as("s"))
        .agg(count(lit(1)).cast("double").as("nb"))
      val sc = bi
        .join(uni.select(col("u").as("w1"), col("c").as("ca")), "w1")
        .join(uni.select(col("u").as("w2"), col("c").as("cb")), "w2")
        .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
        .withColumn("pmi", round(log(
          (col("c") * lit(1.0)) * col("nu") / col("nb") * col("nu")
            / ((col("ca") * lit(1.0)) * col("cb"))), 4))
      // top-50 via orderBy().limit() — TakeOrderedAndProject keeps a 50-row
      // heap PER PARTITION (no global sort, unlike the row_number-then-
      // filter formulation this replaces, which funneled every scored
      // bigram through one unpartitioned WindowExec). rn is then derived
      // WINDOW-FREE over the already-LIMIT-bounded frame: one global
      // aggregate collects the 50 rows into a struct array sorted by the
      // same key (negated pmi makes struct-sort's ascending order = pmi
      // DESC; the original pmi rides along so no double round-trips
      // through negation), and posexplode's position is the rank.
      sc.orderBy(col("pmi").desc, col("w1"), col("w2")).limit(50)
        .agg(sort_array(collect_list(struct(
          (-col("pmi")).as("sk"), col("w1"), col("w2"), col("c"), col("pmi")))).as("a"))
        .select(posexplode(col("a")).as(Seq("pos", "r")))
        .select(col("r.w1").as("w1"), col("r.w2").as("w2"), col("r.c").as("c"),
          col("r.pmi").as("pmi"), (col("pos") + 1).cast("long").as("rn"))
        .orderBy("rn")
    },

    // Bigram language-model scoring — the perplexity-style quality filter a
    // training pipeline runs after heuristics (q36c): train add-one-smoothed
    // bigram counts on the 4/5 content-hash folds, score the held-out fold by
    // average log P(w2|w1) = ln((c(w1 w2)+1)/(c(w1)+V)). The LM tables are
    // vocabulary-bounded (≪ corpus) → BROADCAST joins against the corpus-
    // sized bigram stream; counts shuffle once each. Cross-engine float
    // contract: the probability is one double division, ln is bit-compatible,
    // each term is rounded to 6 dp, and the per-doc sum runs in exact
    // DECIMAL(28,6) so grouping order can't move the result (NOTES.md).
    q("q72_bigram_lm", "add-one bigram LM trained on 4/5 hash folds scores the held-out fold")(
      s"""WITH tok AS (
         |  SELECT doc_id, str_split(text, ' ') AS toks, ${md5LongSql("text")} % 5 AS fold
         |  FROM documents),
         |big AS (
         |  SELECT doc_id, fold, unnest(${shinglesSql("toks", 2)}) AS bg
         |  FROM tok WHERE len(toks) >= 2),
         |bigw AS (SELECT doc_id, fold, bg, split_part(bg, ' ', 1) AS w1 FROM big),
         |lm_big AS (SELECT bg, count(*) AS c2 FROM big WHERE fold <> 0 GROUP BY bg),
         |lm_uni AS (SELECT u AS w1, count(*) AS c1
         |           FROM (SELECT unnest(toks) AS u FROM tok WHERE fold <> 0) GROUP BY u),
         |vocab AS (SELECT count(*) AS v FROM lm_uni),
         |scored AS (
         |  SELECT b.doc_id, count(*) AS nb,
         |         sum(CAST(round(ln((COALESCE(lb.c2, 0) + 1.0) / (COALESCE(lu.c1, 0) + vo.v)), 6) AS DECIMAL(28,6))) AS ll
         |  FROM bigw b
         |  LEFT JOIN lm_big lb USING (bg)
         |  LEFT JOIN lm_uni lu USING (w1)
         |  CROSS JOIN vocab vo
         |  WHERE b.fold = 0
         |  GROUP BY b.doc_id)
         |SELECT doc_id, CAST(nb AS BIGINT) AS n_bigrams,
         |       round(CAST(ll AS DOUBLE) / nb, 4) AS avg_logprob
         |FROM scored ORDER BY avg_logprob DESC, doc_id LIMIT 50""".stripMargin
    ) { (s, dir) =>
      val tok = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("toks"),
          (md5Long(col("text")) % 5).as("fold"))
        .cache() // feeds the unigram LM, the bigram LM, and the scoring leg
      val big = tok.filter(size(col("toks")) >= 2)
        .select(col("doc_id"), col("fold"), explode(shingles(col("toks"), 2)).as("bg"))
      val lmBig = big.filter(col("fold") =!= 0)
        .groupBy("bg").agg(count(lit(1)).as("c2"))
      val lmUni = tok.filter(col("fold") =!= 0)
        .select(explode(col("toks")).as("w1"))
        .groupBy("w1").agg(count(lit(1)).as("c1"))
        .cache() // vocab count + the scoring join
      val vocab = lmUni.agg(count(lit(1)).as("v"))
      big.filter(col("fold") === 0)
        .withColumn("w1", split_part(col("bg"), lit(" "), lit(1)))
        .join(broadcast(lmBig), Seq("bg"), "left")
        .join(broadcast(lmUni), Seq("w1"), "left")
        .crossJoin(broadcast(vocab))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("nb"),
          sum(round(log((coalesce(col("c2"), lit(0L)) + lit(1.0))
              / (coalesce(col("c1"), lit(0L)) + col("v"))), 6)
            .cast(org.apache.spark.sql.types.DecimalType(28, 6))).as("ll"))
        .select(col("doc_id"), col("nb").cast("long").as("n_bigrams"),
          round(col("ll").cast("double") / col("nb"), 4).as("avg_logprob"))
        .orderBy(col("avg_logprob").desc, col("doc_id"))
        .limit(50)
    },

    // Count-min sketch heavy hitters — the streaming-friendly sibling of
    // q36's exact top-k: a fixed d=4 × w=256 cell grid, row hashes defined
    // as portable md5 arithmetic so the WHOLE sketch is reproduced cell-for-
    // cell by the oracle (an exact hash-match of an approximate structure).
    // Estimates are min over the 4 rows (over-count only, ≤ 2N/w expected).
    // The sketch is built from the per-token count pre-aggregate — the
    // map-side-combine shape; the full-stream form is the same cell grid as
    // a d·w-wide algebraic aggregate, mergeable across partitions, and the
    // probe side broadcasts the 1024-cell table. CountMinSpec pins the
    // over-count invariant and the error bound on fixture data.
    q("q75_countmin_heavy_hitters", "count-min sketch (4×256, md5 rows) top-20 estimates vs exact")(
      countminSql
    ) { (s, dir) =>
      val cand = Tables.fanout(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("exact_n"))
      val ic = cand.select(col("tok"), col("exact_n"),
        explode(array((0 until 4).map(i => struct(lit(i).as("i"),
          (md5Long(concat(lit(s"$i:"), col("tok"))) % 256).as("cell"))): _*)).as("h"))
        .select(col("tok"), col("exact_n"), col("h.i").as("i"), col("h.cell").as("cell"))
        .cache() // builds the cells AND probes them
      val cells = ic.groupBy("i", "cell").agg(sum(col("exact_n")).as("c"))
      ic.join(broadcast(cells), Seq("i", "cell"))
        .groupBy("tok", "exact_n").agg(min(col("c")).as("cm_est"))
        .select(col("tok"), col("exact_n"), col("cm_est"))
        .orderBy(col("cm_est").desc, col("tok")).limit(20)
    },

    // BPE merge training — the first 3 merge rules a byte-pair-encoding
    // tokenizer learns from this corpus. The distributed shape is the real
    // one: train on the WORD-FREQUENCY table (|vocab| rows, not |corpus| —
    // the standard Sennrich reduction), count adjacent symbol pairs weighted
    // by word count (one shuffle per iteration), pick the global argmax
    // (count desc, pair asc — a 1-row TakeOrdered), broadcast it, and apply
    // the merge with a boundary-anchored NON-regex replace (space-padded
    // symbols; leftmost non-overlapping continue-after-replacement semantics
    // are identical in Java and DuckDB, incl. the ' a a a ' case). Each
    // iteration's pair count is exact integer arithmetic → the oracle
    // replays the identical 3 unrolled iterations.
    q("q76_bpe_train", "first 3 BPE merges learned from word frequencies (argmax pair per round)")(
      TextQueries.bpeSql
    ) { (s, dir) =>
      val w = Tables.fanout(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
      var seq = w.select(
        concat(lit(" "), array_join(split(col("tok"), ""), " "), lit(" ")).as("seq"),
        col("n")).cache() // pair count + merge application both read it
      val tops = (1 to 3).map { it =>
        val top = seq
          .select(explode(shingles(split(trim(col("seq")), " "), 2)).as("pair"), col("n"))
          .groupBy("pair").agg(sum(col("n")).as("c"))
          .orderBy(col("c").desc, col("pair")).limit(1)
          .cache() // output row + broadcast into the merge
        seq = seq.crossJoin(broadcast(top.select(col("pair"))))
          .select(expr("replace(seq, ' ' || pair || ' ', ' ' || replace(pair, ' ', '') || ' ')").as("seq"),
            col("n")).cache()
        top.select(lit(it.toLong).as("it"), col("pair"), col("c"))
      }
      tops.reduce(_ union _).orderBy("it")
    },

    // BPE training at REAL depth — 32 merge rounds as a DRIVER LOOP with
    // per-round eager localCheckpoint (the StarContraction lineage lesson:
    // each round references its predecessor twice, so without truncation
    // the logical plan doubles per round — 2^32 by round 32; checkpointing
    // resets it to a scan of the materialized vocab frame). The per-round
    // algebra is byte-identical to q76; the oracle replays the same 32
    // rounds as MATERIALIZED CTEs (plain CTEs inline and hit the identical
    // exponential blowup in DuckDB). Scale shape per round: one pair-count
    // shuffle over the |vocab| frame + a 1-row TakeOrdered argmax broadcast
    // — the corpus is touched ONCE (the word-frequency reduction); 32
    // rounds cost 32 tiny shuffles, not 32 corpus passes.
    q("q76c_bpe_train_deep", "32 BPE merges via a checkpointed driver loop (argmax pair per round)")(
      TextQueries.bpeDeepSql(32)
    ) { (s, dir) =>
      val w = Tables.fanout(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
      var seq = w.select(
        concat(lit(" "), array_join(split(col("tok"), ""), " "), lit(" ")).as("seq"),
        col("n")).localCheckpoint()
      val tops = (1 to 32).map { it =>
        val top = seq
          .select(explode(shingles(split(trim(col("seq")), " "), 2)).as("pair"), col("n"))
          .groupBy("pair").agg(sum(col("n")).as("c"))
          .orderBy(col("c").desc, col("pair")).limit(1)
          .localCheckpoint() // 1-row frame: output leg + merge broadcast
        seq = seq.crossJoin(broadcast(top.select(col("pair"))))
          .select(expr("replace(seq, ' ' || pair || ' ', ' ' || replace(pair, ' ', '') || ' ')").as("seq"),
            col("n")).localCheckpoint()
        top.select(lit(it.toLong).as("it"), col("pair"), col("c"))
      }
      tops.reduce(_ unionAll _).orderBy("it")
    },

    // BPE ENCODING — q76's merges APPLIED: the other half of a tokenizer
    // (train once, encode the corpus). Same Sennrich reduction: encoding
    // runs per DISTINCT token (|vocab| rows), never per corpus occurrence;
    // the trained merge table is tiny and broadcasts, and each merge round
    // is one non-regex replace over the vocab frame. At 100 TB the vocab
    // frame is millions of rows against billions of corpus tokens — the
    // final encode is a broadcast-join of corpus tokens to their cached
    // encodings, exactly the map-side shape this query pins.
    q("q76b_bpe_encode", "apply the 3 trained BPE merges: per-token segmentation")(
      bpeEncodeSql
    ) { (s, dir) =>
      val w = Tables.fanout(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
      var seq = w.select(col("tok"),
        concat(lit(" "), array_join(split(col("tok"), ""), " "), lit(" ")).as("seq"),
        col("n")).cache() // pair count + merge application both read it
      (1 to 3).foreach { _ =>
        val top = seq
          .select(explode(shingles(split(trim(col("seq")), " "), 2)).as("pair"), col("n"))
          .groupBy("pair").agg(sum(col("n")).as("c"))
          .orderBy(col("c").desc, col("pair")).limit(1)
        seq = seq.crossJoin(broadcast(top.select(col("pair"))))
          .select(col("tok"),
            expr("replace(seq, ' ' || pair || ' ', ' ' || replace(pair, ' ', '') || ' ')").as("seq"),
            col("n")).cache()
      }
      seq.select(col("tok"), col("n"), trim(col("seq")).as("encoded"))
        .orderBy(col("n").desc, col("tok")).limit(50)
    },

    // BM25 ranking (k1=1.2, b=0.75) for a fixed 3-term query — the lexical
    // retrieval scorer on top of q88's inverted-index statistics. All
    // inputs (tf, df, dlen, N) are exact integers; avgdl is one division;
    // each per-term score is a single fixed-shape double expression and the
    // per-doc total folds term-sorted scores SEQUENTIALLY (aggregate ≙
    // list_reduce), so scores are bit-identical cross-engine before the
    // display round. Scale shape: tf/df/dl are one explode + three partial
    // aggregates; df and corpus stats broadcast; nothing touches the
    // posting lists twice.
    q("q110_bm25", "BM25 (k1=1.2, b=0.75) top-50 docs for query {spark, merge, stream}")(
      bm25Sql
    ) { (s, dir) =>
      val qterms = Seq("spark", "merge", "stream")
      val tok = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .cache() // dl, tf, and df all read it
      val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dlen")).cache()
      val stats = dl.agg(count(lit(1)).cast("long").as("n_docs"),
        (sum(col("dlen")).cast("long") / (lit(1.0) * count(lit(1)))).as("avgdl"))
      val tf = tok.filter(col("term").isin(qterms: _*))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tok.filter(col("term").isin(qterms: _*))
        .groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      val score = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
        (col("tf") * 2.2) / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dlen") / col("avgdl")))
      tf.join(broadcast(df), "term").join(dl, "doc_id").crossJoin(broadcast(stats))
        .select(col("doc_id"), col("term"), score.as("score"))
        .groupBy("doc_id")
        .agg(round(aggregate(array_sort(collect_list(struct(col("term"), col("score")))),
          lit(0.0), (a, x) => a + x.getField("score")), 4).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(50)
    },

    // Retrieval evaluation — MRR and recall@10 for the q110 BM25 ranker,
    // the third leg of the eval suite next to AUC (q172) and calibration
    // (q173). Each query term ranks its matching docs by the ROUNDED
    // score (the NOTES rank-on-rounded contract) through the NATIVE
    // TopKPerKey operator (q148's heap exec composed inside another
    // query — per-term top-10 with k-bounded shuffle, no per-term window
    // sort); relevance is the stricter tf ≥ 2 so the metrics are
    // non-vacuous (every BM25 match contains the term once). Rank numbers
    // are derived AFTER the top-k on the 10-row-per-term frame via the
    // sorted-array trick (q36g). Reciprocal ranks are exact binary/decimal
    // doubles rounded at 4 dp.
    q("q175_retrieval_eval",
      "MRR + recall@10 of BM25 per query term (native top-k, tf >= 2 relevance)")(
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dlen FROM tok GROUP BY doc_id),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |                 CAST(sum(dlen) AS BIGINT) / (1.0 * count(*)) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok
        |       WHERE term IN ('spark', 'merge', 'stream') GROUP BY doc_id, term),
        |df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok
        |       WHERE term IN ('spark', 'merge', 'stream') GROUP BY term),
        |sc AS (SELECT t.term, t.doc_id, t.tf,
        |              round(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) *
        |              (t.tf * 2.2) / (t.tf + 1.2 * (0.25 + 0.75 * l.dlen / s.avgdl)), 4) AS s4
        |       FROM tf t JOIN df d USING (term) JOIN dl l USING (doc_id) CROSS JOIN stats s),
        |rk AS (SELECT term, doc_id, tf,
        |              row_number() OVER (PARTITION BY term ORDER BY s4 DESC, doc_id) AS rn
        |       FROM sc),
        |nrel AS (SELECT term, CAST(sum(CASE WHEN tf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel
        |         FROM sc GROUP BY term),
        |top AS (SELECT term,
        |               CAST(sum(CASE WHEN tf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS hits,
        |               min(CASE WHEN tf >= 2 THEN rn END) AS fr
        |        FROM rk WHERE rn <= 10 GROUP BY term)
        |SELECT n.term, n.n_rel, t.hits,
        |       round(CASE WHEN t.fr IS NULL THEN 0.0 ELSE 1.0 / t.fr END, 4) AS mrr
        |FROM nrel n JOIN top t USING (term) ORDER BY term""".stripMargin
    ) { (s, dir) =>
      val qterms = Seq("spark", "merge", "stream")
      val tok = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .cache()
      val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dlen")).cache()
      val stats = dl.agg(count(lit(1)).cast("long").as("n_docs"),
        (sum(col("dlen")).cast("long") / (lit(1.0) * count(lit(1)))).as("avgdl"))
      val tf = tok.filter(col("term").isin(qterms: _*))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfq = tok.filter(col("term").isin(qterms: _*))
        .groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      val score = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
        (col("tf") * 2.2) / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dlen") / col("avgdl")))
      val scored = tf.join(broadcast(dfq), "term").join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("term"), col("doc_id"), col("tf"), round(score, 4).as("s4"))
        .cache() // top-k leg + n_rel leg
      val nrel = scored.groupBy("term")
        .agg(sum(when(col("tf") >= 2, 1L).otherwise(0L)).as("n_rel"))
      val ranked = graft.plans.TopKPerKey
        .topK(scored, Seq(col("term")), Seq(col("s4").desc, col("doc_id")), 10)
        .groupBy("term")
        .agg(sort_array(collect_list(struct((-col("s4")).as("ns"),
          col("doc_id"), col("tf")))).as("a"))
        .select(col("term"), posexplode(col("a")).as(Seq("pos", "r")))
        .select(col("term"), (col("pos") + 1).as("rn"), col("r.tf").as("tf"))
      val top = ranked.groupBy("term")
        .agg(sum(when(col("tf") >= 2, 1L).otherwise(0L)).as("hits"),
          min(when(col("tf") >= 2, col("rn"))).as("fr"))
      nrel.join(top, "term")
        .select(col("term"), col("n_rel"), col("hits"),
          round(when(col("fr").isNull, 0.0).otherwise(lit(1.0) / col("fr")), 4).as("mrr"))
        .orderBy("term")
    },

    // Inverted-index build — the search-engine/RAG building block: term →
    // (document frequency, total frequency, head of the sorted posting
    // list). One explode + one groupBy on the term; df's distinct pass
    // collapses (term, doc) duplicates map-side. At 100 TB the index
    // partitions by term and postings are delta-encoded per shard; hot
    // terms (stopwords) get the q51-style cap or a stopword gate — the
    // output here carries df/tf so that cut is one filter away.
    q("q88_inverted_index", "inverted index: per-term df, tf, and head-of-postings")(
      // postings head is serialized to a CSV string: the driver's comparator
      // sorts pandas frames, and list-typed cells are unhashable there
      """WITH p AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df, count(*) AS tf,
        |       coalesce(array_to_string(list_sort(list(DISTINCT doc_id))[1:3], ','), '') AS top_docs
        |FROM p GROUP BY term
        |ORDER BY df DESC, term LIMIT 100""".stripMargin
    ) { (s, dir) =>
      Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .groupBy("term")
        .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"),
          array_join(transform(slice(sort_array(collect_set(col("doc_id"))), 1, 3),
            _.cast("string")), ",").as("top_docs"))
        .orderBy(col("df").desc, col("term")).limit(100)
    },

    // Character-level n-gram Jaccard near-dup — the tokenization-robust
    // sibling of q34a's word shingles (catches near-dups that differ only
    // in whitespace/punctuation, where word shingles shift). GRAM LENGTH IS
    // THE SCALE LEVER: the gram self-join costs Σ df², and short grams are
    // stopword-like (5-grams here: 2k distinct, df≈4k, a 1.5-BILLION-row
    // join, 14 s); 16-grams are selective (600k distinct, Σ df² ≈ 12M —
    // 120× cheaper) while the J ≥ 0.5 pair set is IDENTICAL (measured at
    // both sfs). Same lesson as MinHash shingling: near-dup signal lives in
    // long spans, so never join on sub-word grams. At 100 TB, hash the
    // 16-byte gram to 8 bytes (md5Long) to halve the shuffle width and cap
    // residual hot grams q51-style.
    q("q131_char_ngram_jaccard", "char 16-gram Jaccard near-dup pairs (J ≥ 0.5)")(
      """WITH g AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(generate_series(1, length(text) - 15), i -> substr(text, i, 16)))) AS gr
        |  FROM documents WHERE length(text) >= 16),
        |sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
        |  FROM g a JOIN g b ON a.gr = b.gr AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT d1, d2, round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
        |FROM inter JOIN sz sa ON sa.doc_id = d1 JOIN sz sb ON sb.doc_id = d2
        |WHERE i * 2.0 >= (sa.n + sb.n - i)
        |ORDER BY d1, d2""".stripMargin
    ) { (s, dir) =>
      // the length gate is semantic, not cosmetic: for length(text) < 16,
      // Spark's sequence(1, n-15) auto-steps DOWNWARD (1, 0, -1, …) and
      // would fabricate grams from zero/negative substr positions, while
      // DuckDB's generate_series returns empty — a silent cross-engine
      // divergence the moment a short doc enters the corpus
      val g = Tables.fanout(s, dir, "documents")
        .filter(length(col("text")) >= 16)
        .select(col("doc_id"), explode(array_distinct(
          transform(sequence(lit(1), length(col("text")) - 15),
            i => col("text").substr(i, lit(16))))).as("gr"))
        .cache() // sizes + both sides of the intersection join
      val sz = g.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = g.select(col("doc_id").as("d1"), col("gr"))
        .join(g.select(col("doc_id").as("d2"), col("gr")), Seq("gr"))
        .filter(col("d1") < col("d2"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("i"))
      inter
        .join(sz.select(col("doc_id").as("d1"), col("n").as("na")), Seq("d1"))
        .join(sz.select(col("doc_id").as("d2"), col("n").as("nb")), Seq("d2"))
        .filter(col("i") * 2.0 >= col("na") + col("nb") - col("i"))
        .select(col("d1"), col("d2"),
          round(col("i") * lit(1.0) / (col("na") + col("nb") - col("i")), 4).as("jaccard"))
        .orderBy("d1", "d2")
    },

    // Shannon character entropy per doc — the compression-proxy quality
    // gate (gibberish and boilerplate both sit at entropy extremes). The
    // -Σ p·ln p sum is float-order-sensitive, so both engines fold the
    // char-sorted count list SEQUENTIALLY (aggregate ≙ list_reduce with a
    // 0.0+x1 ≡ x1 seed — bit-identical, NOTES.md) with ln on doubles.
    // Shape: one explode + two partial-aggregated groupBys on doc_id.
    q("q143_char_entropy", "per-doc Shannon char entropy via sequential sorted fold")(
      """WITH ch AS (SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS c0 FROM documents),
        |cnt AS (SELECT doc_id, c0, count(*) AS k FROM ch GROUP BY doc_id, c0),
        |e AS (SELECT doc_id, list(k ORDER BY c0) AS ks,
        |             CAST(sum(k) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_distinct
        |      FROM cnt GROUP BY doc_id)
        |SELECT doc_id, n AS n_chars, n_distinct,
        |       round(-list_reduce(list_transform(ks,
        |             k -> (CAST(k AS DOUBLE) / n) * ln(CAST(k AS DOUBLE) / n)),
        |             (a, b) -> a + b), 4) AS entropy
        |FROM e ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), "")).as("c0"))
        .groupBy("doc_id", "c0").agg(count(lit(1)).as("k"))
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("c0"), col("k")))).as("ks"),
          sum(col("k")).as("n_chars"), count(lit(1)).as("n_distinct"))
        .select(col("doc_id"), col("n_chars"), col("n_distinct"),
          round(-aggregate(col("ks"), lit(0.0), (a, m) => {
            val p = m.getField("k").cast("double") / col("n_chars")
            a + p * log(p)
          }), 4).as("entropy"))
        .orderBy("doc_id")
    },

    // Train/test n-gram contamination coverage — q52's decontamination gate
    // measured instead of enforced: for every held-out (fold 0, q72's md5
    // split) doc, the fraction of its bigrams (with multiplicity) that
    // exist anywhere in the training folds, in exact integer micro-units.
    // Shape: the test-side explode equi-joins the DISTINCT train-bigram
    // table — at 100 TB the train side is the large one, so it stays
    // hash-partitioned by bigram while test probes it; never a product.
    q("q144_ngram_coverage", "held-out doc bigram coverage vs training folds (micro-units)")(
      s"""WITH tok AS (
         |  SELECT doc_id, str_split(text, ' ') AS toks, ${md5LongSql("text")} % 5 AS fold
         |  FROM documents),
         |big AS (
         |  SELECT doc_id, fold, unnest(${shinglesSql("toks", 2)}) AS bg
         |  FROM tok WHERE len(toks) >= 2),
         |train AS (SELECT DISTINCT bg FROM big WHERE fold <> 0),
         |test AS (SELECT b.doc_id, count(*) AS nb,
         |                CAST(count(t.bg) AS BIGINT) AS hits
         |         FROM big b LEFT JOIN train t USING (bg)
         |         WHERE b.fold = 0 GROUP BY b.doc_id)
         |SELECT doc_id, CAST(nb AS BIGINT) AS nb, hits,
         |       CAST(hits * 1000000 // nb AS BIGINT) AS cov_micro
         |FROM test ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val tok = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("toks"),
          (md5Long(col("text")) % 5).as("fold"))
      val big = tok.filter(size(col("toks")) >= 2)
        .select(col("doc_id"), col("fold"), explode(shingles(col("toks"), 2)).as("bg"))
        .cache() // train legs + test leg
      val train = big.filter(col("fold") =!= 0).select(col("bg")).distinct()
        .withColumn("hit", lit(1L))
      big.filter(col("fold") === 0)
        .join(train, Seq("bg"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("nb"), sum(coalesce(col("hit"), lit(0L))).as("hits"))
        .select(col("doc_id"), col("nb"), col("hits"),
          expr("(hits * 1000000L) div nb").as("cov_micro"))
        .orderBy("doc_id")
    },

    // Feature hashing (the hashing trick): tokens project into a fixed
    // 32-bucket signed feature space — the unbounded-vocabulary featurizer
    // for linear models at corpus scale (no dictionary to build, ship, or
    // grow; collisions are absorbed by the sign hash keeping E[collision
    // bias] = 0). Output is the SPARSE long form (doc, bucket, weight) —
    // integer-exact signed counts, one explode + one partial-aggregated
    // groupBy; entirely row-local before the doc-keyed aggregation.
    q("q150_feature_hash", "signed 32-bucket feature hashing per doc (sparse long form)")(
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |h AS (SELECT doc_id, ${md5LongSql("'fh:' || tok")} % 32 AS bucket,
         |             CASE WHEN ${md5LongSql("'fs:' || tok")} % 2 = 0 THEN 1 ELSE -1 END AS sgn
         |      FROM t)
         |SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS w
         |FROM h GROUP BY doc_id, bucket
         |ORDER BY doc_id, bucket LIMIT 5000""".stripMargin
    ) { (s, dir) =>
      Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .select(col("doc_id"),
          (md5Long(concat(lit("fh:"), col("tok"))) % 32).as("bucket"),
          when(md5Long(concat(lit("fs:"), col("tok"))) % 2 === 0, 1L).otherwise(-1L).as("sgn"))
        .groupBy("doc_id", "bucket").agg(sum(col("sgn")).as("w"))
        .orderBy("doc_id", "bucket")
        .limit(5000)
    },

    // Heavy hitters without aggregating the domain: a Misra–Gries sketch
    // pass (capacity 63 ⇒ any token with freq > n/64 is guaranteed in the
    // summary) produces ≤63 candidates; an exact count of ONLY those
    // candidates then applies the real threshold (freq·32 > n, i.e.
    // freq > n/32 > n/64 — safely inside the sketch's no-false-negative
    // zone). False positives die in the verify step, so the result equals
    // the plain GROUP BY … HAVING oracle EXACTLY, even though the sketch
    // content is order-dependent. Scale shape at 100 TB: each map task
    // carries 63 counters; the merged summary is one ≤63-row broadcast;
    // the exact pass aggregates only candidate-matching rows — the full
    // token domain (trillions of distinct keys) is never grouped anywhere.
    q("q188_heavy_hitters",
      "Misra-Gries candidates + exact verify: tokens with freq > n/32, no domain-wide groupBy")(
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |tot AS (SELECT count(*) AS n FROM tok)
        |SELECT tok, CAST(count(*) AS BIGINT) AS cnt
        |FROM tok CROSS JOIN tot
        |GROUP BY tok, n HAVING count(*) * 32 > n
        |ORDER BY cnt DESC, tok""".stripMargin
    ) { (s, dir) =>
      val mg = udaf(new graft.functions.MisraGriesAggregator(63))
      val tok = Tables.fanout(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("tok"))
        .cache() // sketch pass + total + exact verify pass
      val cand = tok.agg(mg(col("tok")).as("summary"))
        .select(explode(map_keys(col("summary"))).as("tok"))
      val tot = tok.agg(count(lit(1)).as("n"))
      tok.join(broadcast(cand), Seq("tok")) // ≤63 candidate keys
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(tot))
        .filter(col("cnt") * 32 > col("n"))
        .select(col("tok"), col("cnt"))
        .orderBy(col("cnt").desc, col("tok"))
    },

    // Hybrid retrieval via Reciprocal Rank Fusion — the modern RAG-stack
    // composition of the repo's two rankers: the q110 BM25 lexical leg over
    // `documents` and a semantic leg ranking `embeddings` by cosine to a
    // query vector (vec_id 0; the fixtures align doc_id ≙ vec_id). Each leg
    // independently takes its top-50 (global top-k ⇒ TakeOrderedAndProject —
    // a k-bounded partial top-k per partition, never a global sort), ranks
    // INSIDE the ≤50-row shortlist with the q36g sorted-array trick (no
    // unpartitioned WindowExec — GlobalPlanGuardSpec's invariant), and the
    // fusion is a ≤100-row union + groupBy: rrf = Σ 1000000 // (60 + rank)
    // in exact BIGINT floor division (RRF's 1/(k+r) scaled to integers so
    // no float sum crosses engines; k=60 per Cormack et al.). Determinism:
    // both legs rank on the ROUNDED score (4 dp) with id tie-break — scores
    // are bit-identical cross-engine before the round (BM25: fixed-shape ln
    // + sequential term-sorted fold; cosine: the codegen fold ≙
    // list_dot_product). 100 TB shape: the corpus-sized work is two
    // independent scans feeding bounded top-ks; fusion cost is O(k).
    q("q203_rrf_hybrid",
      "hybrid retrieval: BM25 + cosine legs fused by integer reciprocal-rank fusion")(
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dlen FROM tok GROUP BY doc_id),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |                 CAST(sum(dlen) AS BIGINT) / (1.0 * count(*)) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok
        |       WHERE term IN ('spark', 'merge', 'stream') GROUP BY doc_id, term),
        |df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok
        |       WHERE term IN ('spark', 'merge', 'stream') GROUP BY term),
        |sc AS (SELECT t.doc_id, t.term,
        |              ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) *
        |              (t.tf * 2.2) / (t.tf + 1.2 * (0.25 + 0.75 * l.dlen / s.avgdl)) AS score
        |       FROM tf t JOIN df d USING (term) JOIN dl l USING (doc_id) CROSS JOIN stats s),
        |bm AS (SELECT doc_id,
        |              round(list_reduce(list_prepend(0.0, list(score ORDER BY term)), (a, x) -> a + x), 4) AS b4
        |       FROM sc GROUP BY doc_id),
        |lex AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY b4 DESC, doc_id) AS BIGINT) AS r
        |        FROM bm ORDER BY b4 DESC, doc_id LIMIT 50),
        |v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
        |n AS (SELECT vec_id, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |cs AS (SELECT c.vec_id AS doc_id,
        |              round(list_dot_product(q.e, c.e) / (nq.nrm * nc.nrm), 4) AS c4
        |       FROM v q JOIN n nq ON nq.vec_id = q.vec_id,
        |            v c JOIN n nc ON nc.vec_id = c.vec_id
        |       WHERE q.vec_id = 0 AND c.vec_id <> 0),
        |sem AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY c4 DESC, doc_id) AS BIGINT) AS r
        |        FROM cs ORDER BY c4 DESC, doc_id LIMIT 50),
        |u AS (SELECT doc_id, r, 'lex' AS leg FROM lex
        |      UNION ALL SELECT doc_id, r, 'sem' FROM sem)
        |SELECT doc_id,
        |       max(CASE WHEN leg = 'lex' THEN r END) AS lex_rank,
        |       max(CASE WHEN leg = 'sem' THEN r END) AS sem_rank,
        |       CAST(sum(1000000 // (60 + r)) AS BIGINT) AS rrf
        |FROM u GROUP BY doc_id
        |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin
    ) { (s, dir) =>
      val qterms = Seq("spark", "merge", "stream")
      // ---- lexical leg: the q110 BM25 chain, ranked on the rounded score
      val tok = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .cache() // dl, tf, df all read it
      val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dlen")).cache()
      val stats = dl.agg(count(lit(1)).cast("long").as("n_docs"),
        (sum(col("dlen")).cast("long") / (lit(1.0) * count(lit(1)))).as("avgdl"))
      val tf = tok.filter(col("term").isin(qterms: _*))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfq = tok.filter(col("term").isin(qterms: _*))
        .groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      val score = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
        (col("tf") * 2.2) / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dlen") / col("avgdl")))
      val bm = tf.join(broadcast(dfq), "term").join(dl, "doc_id").crossJoin(broadcast(stats))
        .select(col("doc_id"), col("term"), score.as("score"))
        .groupBy("doc_id")
        .agg(round(aggregate(array_sort(collect_list(struct(col("term"), col("score")))),
          lit(0.0), (a, x) => a + x.getField("score")), 4).as("b4"))
      // rank inside the shortlist: sort_array over (-score, id) structs,
      // posexplode position + 1 = rank — no unpartitioned window
      def shortlistRanks(leg: String, scored: org.apache.spark.sql.DataFrame,
                         scoreCol: String): org.apache.spark.sql.DataFrame =
        scored.orderBy(col(scoreCol).desc, col("doc_id")).limit(50)
          .groupBy() // ≤50 rows post-top-k — single tiny group by design
          .agg(sort_array(collect_list(struct((-col(scoreCol)).as("ns"), col("doc_id")))).as("a"))
          .select(posexplode(col("a")).as(Seq("pos", "x")))
          .select(col("x.doc_id").as("doc_id"), (col("pos") + 1).cast("long").as("r"),
            lit(leg).as("leg"))
      val lex = shortlistRanks("lex", bm, "b4")
      // ---- semantic leg: cosine of every vector to the query (vec_id 0)
      val emb = Tables.fanout(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      val semScored = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
        .select(col("vec_id").as("doc_id"),
          round(graft.expressions.VectorFunctions.cosine(col("qe"), col("embedding")), 4).as("c4"))
      val sem = shortlistRanks("sem", semScored, "c4")
      // ---- fusion: ≤100 rows, exact integer RRF contributions
      lex.unionAll(sem)
        .groupBy("doc_id")
        .agg(max(when(col("leg") === "lex", col("r"))).as("lex_rank"),
          max(when(col("leg") === "sem", col("r"))).as("sem_rank"),
          sum(expr("1000000L div (60 + r)")).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(20)
    },

    // TextRank keyword extraction (Mihalcea & Tarau '04) — the text pipe
    // composed with the graph machinery: adjacent non-stopword tokens form
    // an undirected co-occurrence graph (window 2), and 3 integer PageRank
    // rounds (q80's exact µ-unit arithmetic — floor-divided contributions,
    // BIGINT sums, no float anywhere) rank the corpus' keywords. Scale
    // shape = q80's: the pair explode is row-local; the distinct edge set
    // shuffles 2-token keys once; each round is one equi-join of the
    // cached doubled edge list against the |V|-bounded size-switched score
    // frame + a partial-aggregated sum. The oracle unrolls the same 3
    // rounds as chained CTEs.
    q("q211_textrank_keywords",
      "TextRank: 3 integer PageRank rounds over the window-2 co-occurrence graph, top 20")(
      {
        def iter(prev: String, next: String) =
          s"""$next AS (
             |  SELECT n.tok, CAST(150000 + (850000 * COALESCE(s.m, 0)) // 1000000 AS BIGINT) AS rank
             |  FROM nodes n LEFT JOIN (
             |    SELECT e.v AS tok, CAST(sum(r.rank // d.deg) AS BIGINT) AS m
             |    FROM e JOIN $prev r ON e.u = r.tok JOIN deg d ON e.u = d.tok
             |    GROUP BY e.v) s ON n.tok = s.tok)""".stripMargin
        s"""WITH t AS (SELECT list_filter(str_split(text, ' '),
           |                  x -> x NOT IN (${inListSql(markers.flatMap(_._2))})) AS w
           |           FROM documents),
           |pr AS (SELECT w[i] AS a, w[i + 1] AS b
           |       FROM t, unnest(range(1, len(w))) AS r(i)),
           |e0 AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
           |       FROM pr WHERE a <> b),
           |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           |nodes AS (SELECT DISTINCT u AS tok FROM e),
           |deg AS (SELECT u AS tok, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY u),
           |r0 AS (SELECT tok, CAST(1000000 AS BIGINT) AS rank FROM nodes),
           |${(0 until 3).map(i => iter(s"r$i", s"r${i + 1}")).mkString(",\n")}
           |SELECT tok, rank FROM r3 ORDER BY rank DESC, tok LIMIT 20""".stripMargin
      }
    ) { (s, dir) =>
      val stop = markers.flatMap(_._2)
      val t = Tables.fanout(s, dir, "documents")
        .select(filter(tokens(col("text")),
          x => !x.isin(stop.map(_.asInstanceOf[Any]): _*)).as("w"))
        .filter(size(col("w")) >= 2)
      val pr = t.select(explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> struct(element_at(w, i) AS a, element_at(w, i + 1) AS b))")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
      val e0 = pr.filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct()
      val e = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
        .localCheckpoint(true) // re-joined every round (deg + 3 iterations)
      val nodes = e.select(col("u").as("tok")).distinct().cache()
      val nV = nodes.count() // score frames are |V|-bounded — one size switch
      val deg = e.groupBy(col("u").as("tok")).agg(count(lit(1)).as("deg"))
      val contribBase = e.join(
          GraphQueries.maybeBroadcast(deg.select(col("tok").as("u"), col("deg")), nV), "u")
        .localCheckpoint(true) // (u, v, deg) re-joined per round
      var rank = nodes.select(col("tok").as("rtok"), lit(1000000L).as("pr"))
      for (_ <- 1 to 3) {
        val m = contribBase.join(
            GraphQueries.maybeBroadcast(rank, nV), col("u") === col("rtok"))
          .select(col("v").as("tok"), expr("pr div deg").as("contrib"))
          .groupBy("tok").agg(sum(col("contrib")).as("m"))
        rank = nodes.join(GraphQueries.maybeBroadcast(m, nV), Seq("tok"), "left")
          .select(col("tok").as("rtok"),
            expr("150000L + (850000L * coalesce(m, 0L)) div 1000000L").as("pr"))
          .localCheckpoint(true) // truncate per-round lineage (NOTES.md)
      }
      rank.select(col("rtok").as("tok"), col("pr").as("rank"))
        .orderBy(col("rank").desc, col("tok")).limit(20)
    },

    // Distributed SUFFIX ARRAY + LCP by prefix doubling — the principled
    // engine under exact-substring dedup (Lee et al. 2022 build suffix
    // arrays to remove maximal duplicated substrings; q61/q61b/q61c
    // approximate the extents with fixed shingle ladders). Ranks are
    // k-truncated at 32 tokens: rank_1 = dense rank of the token, and
    // five doubling rounds build rank_{2d} as the dense rank of the pair
    // (rank_d[p], rank_d[p+d]) — each round is one equi-self-join plus
    // one two-pass DistributedRank over the DISTINCT pairs, so the whole
    // construction is O(log k) sort/join rounds with no global window and
    // no text in any shuffle (ranks are 8-byte longs after round 0).
    // LCP to the suffix-order neighbor then descends the SAME rank ladder
    // (32,16,8,4,2,1 — greedy binary counting), capped by both suffixes'
    // remaining lengths because sentinel-padded short windows compare
    // equal beyond doc end. rep_extent = max LCP with either neighbor is
    // the per-position maximal-duplicated-extent signal, exact at shingle
    // resolution 1 up to the 32-token cap. The oracle rebuilds the object
    // definitionally: DuckDB orders the literal 32-token window LISTS and
    // counts prefix equality — so the hash match proves five rounds of
    // doubling reproduce direct lexicographic suffix order exactly.
    q("q221_suffix_array_lcp",
      "suffix array + neighbor LCP via 5 prefix-doubling rounds (32-token truncation)")(
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
        |pos AS (SELECT doc_id, len(w)::BIGINT AS n, w,
        |               unnest(generate_series(1, len(w))) AS p FROM t),
        |sfx AS (SELECT doc_id, n, p, list_slice(w, p, least(p + 31, n)) AS win FROM pos),
        |sa AS (SELECT doc_id, p, win,
        |              row_number() OVER (ORDER BY win, doc_id, p) AS sa_rank FROM sfx),
        |adj AS (SELECT a.doc_id, a.p, a.sa_rank,
        |               CASE WHEN b.win IS NULL THEN 0
        |                    ELSE len(list_filter(generate_series(1, least(len(a.win), len(b.win))),
        |                             i -> a.win[1:i] = b.win[1:i])) END AS lcp_prev
        |        FROM sa a LEFT JOIN sa b ON b.sa_rank = a.sa_rank - 1),
        |fin AS (SELECT l.doc_id, l.p, l.sa_rank, l.lcp_prev,
        |               greatest(l.lcp_prev, coalesce(nx.lcp_prev, 0)) AS rep_extent
        |        FROM adj l LEFT JOIN adj nx ON nx.sa_rank = l.sa_rank + 1)
        |SELECT doc_id, p, CAST(sa_rank AS BIGINT) AS sa_rank,
        |       CAST(lcp_prev AS BIGINT) AS lcp_prev,
        |       CAST(rep_extent AS BIGINT) AS rep_extent
        |FROM fin WHERE doc_id < 30 ORDER BY doc_id, p""".stripMargin
    ) { (s, dir) =>
      val toks = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("w"))
        .select(col("doc_id"), size(col("w")).cast("long").as("n"), posexplode(col("w")))
        .select(col("doc_id"), col("n"), (col("pos") + 1).cast("long").as("p"),
          col("col").as("tok"))
      // rank_1: global dense rank of the token string (two-pass — the
      // only round that touches text; every later shuffle moves longs).
      // round-11 (guide §2.3/§2.4): DENSE rank computed directly on the
      // position frame (DistributedRank.withDenseRank) — the old
      // distinct() → row_number → join-back detour cost three extra
      // full-data exchanges here and in EVERY doubling round below. The
      // `lad` array accumulates [r_1, r_2, r_4, r_8, r_16, r_32] per
      // position so the LCP descent below can run ROW-LOCALLY off a
      // per-doc rank matrix instead of 12 corpus-size rank-lookup joins.
      var r = DistributedRank.withDenseRank(toks, Seq(col("tok")), "r")
        .select(col("doc_id"), col("n"), col("p"), col("r"))
        .withColumn("lad", array(col("r")))
        .localCheckpoint(true)
      for (d <- Seq(1, 2, 4, 8, 16)) {
        // pair (rank_d[p], rank_d[p+d]); 0 = past-end sentinel, below
        // every real rank — exactly DuckDB's shorter-list-sorts-first
        val shifted = r.select(col("doc_id"), (col("p") - d).as("p"), col("r").as("r2"))
        val paired = r.join(shifted, Seq("doc_id", "p"), "left")
          .select(col("doc_id"), col("n"), col("p"), col("lad"), col("r").as("k1"),
            coalesce(col("r2"), lit(0L)).as("k2"))
        // eager checkpoint stays MANDATORY here: the shifted self-join
        // references r twice, so without truncation the logical plan doubles
        // per round (2^5 copies — measured as a >25-min analysis/recompute
        // hang when tried without it this round)
        r = DistributedRank.withDenseRank(paired, Seq(col("k1"), col("k2")), "nr")
          .select(col("doc_id"), col("n"), col("p"),
            concat(col("lad"), array(col("nr"))).as("lad"), col("nr").as("r"))
          .localCheckpoint(true)
      }
      // per-doc rank matrix mat[p][level], level 1..6 ≙ d = 1,2,4,8,16,32 —
      // doc-length-bounded rows (the same per-doc collect bound the
      // oracle's window-list build uses), built ONCE instead of keeping six
      // corpus-size rank frames alive for twelve descent lookup joins
      val ldm = r.groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("p"), col("lad")))).as("pl"))
        .select(col("doc_id"), expr("transform(pl, x -> x.lad)").as("mat"))
        .localCheckpoint(true)
      val sa = DistributedRank.withRowNumber(
        r.select(col("doc_id"), col("n"), col("p"), col("r")),
        Seq(col("r"), col("doc_id"), col("p")), "sa_rank")
        .localCheckpoint(true)
      // neighbor in suffix order (equi-join on rank — never a global lag)
      val prevSfx = sa.select((col("sa_rank") + 1).as("sa_rank"),
        col("doc_id").as("doc_b"), col("p").as("pb"), col("n").as("nb"))
      // greedy binary-counting LCP descent down the rank ladder: equal
      // rank_d at offset l ⟹ next d tokens (sentinel-padded) match.
      // Row-local fold over (32,6),(16,5),...,(1,1): element_at(mat, p+l)
      // exists iff p+l ≤ n (the ladder frames had a row per position), so
      // the size guards reproduce the old left-join NULL semantics exactly,
      // and a NULL doc_b (the first suffix) keeps l = 0 via the matb guard.
      val adj = sa.select(col("doc_id"), col("p"), col("n"), col("sa_rank"))
        .join(prevSfx, Seq("sa_rank"), "left")
        .join(ldm.select(col("doc_id"), col("mat").as("mata")), Seq("doc_id"))
        .join(ldm.select(col("doc_id").as("doc_b"), col("mat").as("matb")),
          Seq("doc_b"), "left")
        .withColumn("l", expr(
          """aggregate(
            |  array(named_struct('d', 32L, 'li', 6), named_struct('d', 16L, 'li', 5),
            |        named_struct('d', 8L, 'li', 4), named_struct('d', 4L, 'li', 3),
            |        named_struct('d', 2L, 'li', 2), named_struct('d', 1L, 'li', 1)),
            |  0L,
            |  (acc, s) -> acc + CASE WHEN matb IS NOT NULL
            |      AND p + acc <= size(mata) AND pb + acc <= size(matb)
            |      AND element_at(element_at(mata, cast(p + acc AS INT)), s.li)
            |        = element_at(element_at(matb, cast(pb + acc AS INT)), s.li)
            |    THEN s.d ELSE 0L END)""".stripMargin))
        .drop("mata", "matb")
      // cap by both remaining lengths: sentinel-padded equality can step
      // past a doc end when both suffixes end at the same relative offset
      // cap at 32 too: when neighbors share MORE than the truncation the
      // descent keeps matching at offsets ≥ 32 (l up to 63) but the
      // k-truncated object reports exactly the window cap
      val res = adj.select(col("doc_id"), col("p"), col("sa_rank"),
        least(col("l"), lit(32L), col("n") - col("p") + 1, col("nb") - col("pb") + 1).as("lcp_prev"))
        .withColumn("lcp_prev", coalesce(col("lcp_prev"), lit(0L)))
        .localCheckpoint(true)
      val nxt = res.select((col("sa_rank") - 1).as("sa_rank"),
        col("lcp_prev").as("lcp_next"))
      res.join(nxt, Seq("sa_rank"), "left")
        .withColumn("rep_extent", greatest(col("lcp_prev"), coalesce(col("lcp_next"), lit(0L))))
        .filter(col("doc_id") < 30)
        .select(col("doc_id"), col("p"), col("sa_rank"), col("lcp_prev"), col("rep_extent"))
        .orderBy("doc_id", "p")
    },

    // Unigram-style SUBWORD SEGMENTATION by lattice Viterbi — the other
    // major tokenizer family next to q76's BPE (SentencePiece's unigram
    // model segments each word by max-sum dynamic programming over a
    // piece lattice). Pieces are every 1–4-char substring of the vocab,
    // weighted by CORPUS frequency (the distributed half: one corpus-wide
    // token count feeds piece weights; the DP itself runs on the DISTINCT
    // vocab — exactly how production tokenizers split work: corpus-scale
    // aggregation, vocab-scale lattice, broadcast-scale application).
    // The DP objective packs two criteria into one integer — weight
    // min(freq,1e5) − 1e8 per piece: the −1e8 term makes FEWEST pieces
    // dominate (as the multiplicative log-probs of a real unigram LM do)
    // and total piece frequency breaks ties among minimal segmentations,
    // so frequent multi-char chunks win over char spam; n_pieces is
    // recovered from the score's 1e8 quotient (piece-frequency mass
    // < 8·1e5 per word, so no interference).
    // Max-sum over the DAG runs as 8 Bellman relaxation rounds (q204's
    // machinery on the position lattice); the oracle's recursive CTE
    // enumerates every segmentation path (≤2^7 per word) and takes the
    // max, so the hash match proves the relaxation finds the true optimum.
    q("q222_viterbi_segmentation",
      "unigram-tokenizer Viterbi: max-frequency subword segmentation over a piece lattice")(
      """WITH RECURSIVE w0 AS (
        |  SELECT t AS word, CAST(count(*) AS BIGINT) AS wfreq
        |  FROM (SELECT unnest(str_split(text, ' ')) AS t FROM documents) GROUP BY t),
        |si AS (SELECT word, unnest(generate_series(0, length(word)-1)) AS i FROM w0),
        |subs AS (SELECT word, i, k, substr(word, CAST(i+1 AS INT), CAST(k AS INT)) AS piece
        |         FROM si CROSS JOIN range(1, 5) AS r(k)
        |         WHERE i + k <= length(word)),
        |pf AS (SELECT piece, CAST(sum(wfreq) AS BIGINT) AS f
        |       FROM subs JOIN w0 USING (word) GROUP BY piece),
        |edges AS (SELECT s.word, s.i, s.k, least(pf.f, 100000) - 100000000 AS wgt
        |          FROM subs s JOIN pf USING (piece)),
        |dp AS (SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS sc FROM w0
        |       UNION ALL
        |       SELECT e.word, CAST(dp.pos + e.k AS INT), dp.sc + e.wgt
        |       FROM dp JOIN edges e ON e.word = dp.word AND e.i = dp.pos),
        |best AS (SELECT word, max(sc) AS score FROM dp
        |         WHERE pos = length(word) GROUP BY word)
        |SELECT w0.word, w0.wfreq, CAST(length(w0.word) AS BIGINT) AS wlen,
        |       CAST((-b.score + 99999999) // 100000000 AS BIGINT) AS n_pieces,
        |       b.score
        |FROM w0 JOIN best b USING (word) ORDER BY word""".stripMargin
    ) { (s, dir) =>
      val w0 = Tables.fanout(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("wfreq"))
        .cache() // vocab: piece extraction, weights, and the final join
      val subs = w0.select(col("word"),
          explode(expr("""flatten(transform(sequence(0, length(word)-1), i ->
            filter(transform(sequence(1, 4), k ->
              struct(i AS i, k AS k, substr(word, i+1, k) AS piece)),
              x -> x.i + x.k <= length(word))))""")).as("e"))
        .select(col("word"), col("e.i").cast("long").as("i"),
          col("e.k").cast("long").as("k"), col("e.piece").as("piece"))
      val pf = subs.join(w0, "word")
        .groupBy("piece").agg(sum(col("wfreq")).as("f"))
      val edges = subs.join(pf, "piece")
        .select(col("word").as("eword"), col("i"), col("k"),
          (least(col("f"), lit(100000L)) - 100000000L).as("wgt"))
        .localCheckpoint(true)
      var dp = w0.select(col("word"), lit(0L).as("pos"), lit(0L).as("sc"))
      for (_ <- 1 to 8) { // max word length 8 ⇒ ≤8 lattice edges per path
        val stepped = dp.join(broadcast(edges),
            dp("word") === edges("eword") && dp("pos") === edges("i"))
          .select(dp("word"), (dp("pos") + edges("k")).as("pos"),
            (dp("sc") + edges("wgt")).as("sc"))
        dp = dp.unionByName(stepped)
          .groupBy("word", "pos").agg(max(col("sc")).as("sc"))
          .localCheckpoint(true) // vocab-scale; truncates the 8-round plan
      }
      dp.join(w0, "word")
        .filter(col("pos") === length(col("word")).cast("long"))
        .select(col("word"), col("wfreq"),
          length(col("word")).cast("long").as("wlen"),
          expr("(-sc + 99999999) div 100000000").cast("long").as("n_pieces"),
          col("sc").as("score"))
        .orderBy("word")
    },

    // WordPiece greedy encoding — the BERT-family tokenizer, completing
    // the trio with BPE (q76, merge-rule replay) and unigram Viterbi
    // (q222, optimal lattice path): vocab = the 32 highest-frequency
    // pieces per position class (word-initial vs '##' continuation, the
    // WordPiece split — a budget tight enough that the cut BITES: most
    // 4-grams miss it and match lengths genuinely vary) plus every
    // single char as the fallback floor; encoding walks each word
    // LONGEST-MATCH-FIRST — at position p take the longest vocab piece,
    // advance, mark continuations '##'. The walk is a bounded fold: the
    // per-position longest-match table collapses to one array per word
    // (length ≤ 8), and an 8-step codegen'd aggregate follows the jumps —
    // no 8-round join chain, no recursion in the engine. The oracle
    // replays the same walk as a recursive CTE; the hash match proves the
    // greedy path, piece marks, and vocab cut agree exactly. Everything
    // is vocab-scale after the one corpus token count — at 100 TB the
    // corpus shuffles (word, freq) pairs once and never again.
    q("q235_wordpiece_encode",
      "WordPiece greedy longest-match encoding with a 32-piece-per-class vocab")(
      """WITH RECURSIVE w0 AS (
        |  SELECT t AS word, CAST(count(*) AS BIGINT) AS wfreq
        |  FROM (SELECT unnest(str_split(text, ' ')) AS t FROM documents) GROUP BY t),
        |si AS (SELECT word, unnest(generate_series(0, length(word)-1)) AS i FROM w0),
        |subs AS (SELECT word, i, k, substr(word, CAST(i+1 AS INT), CAST(k AS INT)) AS piece
        |         FROM si CROSS JOIN range(1, 5) AS r(k)
        |         WHERE i + k <= length(word)),
        |occ AS (SELECT piece, i > 0 AS cont, CAST(sum(wfreq) AS BIGINT) AS f
        |        FROM subs JOIN w0 USING (word) GROUP BY piece, cont),
        |vset AS (SELECT piece, cont FROM (
        |           SELECT piece, cont, length(piece) AS pl,
        |                  row_number() OVER (PARTITION BY cont ORDER BY f DESC, piece) AS rn
        |           FROM occ)
        |         WHERE rn <= 32 OR pl = 1),
        |lm AS (SELECT s.word, s.i, CAST(max(s.k) AS BIGINT) AS l
        |       FROM subs s JOIN vset v ON v.piece = s.piece AND v.cont = (s.i > 0)
        |       GROUP BY s.word, s.i),
        |walk AS (
        |  SELECT word, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS np,
        |         CAST('' AS VARCHAR) AS enc
        |  FROM w0
        |  UNION ALL
        |  SELECT k.word, k.pos + lm.l, k.np + 1,
        |         k.enc || CASE WHEN k.pos = 0 THEN '' ELSE ' ##' END
        |               || substr(k.word, CAST(k.pos + 1 AS INT), CAST(lm.l AS INT))
        |  FROM walk k JOIN lm ON lm.word = k.word AND lm.i = k.pos
        |  WHERE k.pos < length(k.word)),
        |done AS (SELECT word, np AS n_pieces, enc FROM walk WHERE pos = length(word)),
        |top AS (SELECT word, wfreq FROM w0 ORDER BY wfreq DESC, word LIMIT 50)
        |SELECT t.word, t.wfreq, d.n_pieces, d.enc AS encoded
        |FROM top t JOIN done d USING (word)
        |ORDER BY t.wfreq DESC, t.word""".stripMargin
    ) { (s, dir) =>
      val w0 = Tables.fanout(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("wfreq"))
        .cache() // piece stats + top-50 + the walk join
      val subs = w0.select(col("word"),
          explode(expr("""flatten(transform(sequence(0, length(word)-1), i ->
            filter(transform(sequence(1, 4), k ->
              struct(i AS i, k AS k, substr(word, i+1, k) AS piece)),
              x -> x.i + x.k <= length(word))))""")).as("e"))
        .select(col("word"), col("e.i").cast("long").as("i"),
          col("e.k").cast("long").as("k"), col("e.piece").as("piece"))
      val occ = subs.join(w0, "word")
        .groupBy(col("piece"), (col("i") > 0).as("cont"))
        .agg(sum(col("wfreq")).as("f"))
      // vocab budget: 64 pieces per position class + all single chars —
      // the piece table is vocab-scale, so the 2-partition rank window is
      // metadata work, never corpus work
      // fresh aliases (vp, vc): vset descends from subs, so joining on
      // vset("piece") would resolve BOTH sides to the same attribute — a
      // trivially-true predicate, silently turning the vocab lookup into
      // a class-only match (Spark warns but proceeds)
      val vset = occ.withColumn("rn", row_number().over(
          Window.partitionBy("cont").orderBy(col("f").desc, col("piece"))))
        .filter(col("rn") <= 32 || length(col("piece")) === 1)
        .select(col("piece").as("vp"), col("cont").as("vc"))
      val lm = subs.join(vset,
          subs("piece") === col("vp") && col("vc") === (subs("i") > 0))
        .groupBy("word", "i").agg(max(col("k")).as("l"))
      val arr = lm.groupBy("word")
        .agg(sort_array(collect_list(struct(col("i"), col("l")))).as("ls"))
      val top = w0.orderBy(col("wfreq").desc, col("word")).limit(50)
      top.join(arr, "word")
        .select(col("word"), col("wfreq"),
          aggregate(sequence(lit(1), lit(8)),
            named_struct(lit("pos"), lit(0L), lit("np"), lit(0L), lit("enc"), lit("")),
            (acc, _) => {
              val pos = acc.getField("pos")
              val l = element_at(col("ls"), (pos + 1).cast("int")).getField("l")
              val piece = col("word").substr((pos + 1).cast("int"), l.cast("int"))
              when(pos < length(col("word")).cast("long"),
                named_struct(lit("pos"), pos + l,
                  lit("np"), acc.getField("np") + 1,
                  lit("enc"), when(pos === 0, piece)
                    .otherwise(concat(acc.getField("enc"), lit(" ##"), piece))))
                .otherwise(acc)
            }).as("st"))
        .select(col("word"), col("wfreq"), col("st.np").as("n_pieces"),
          col("st.enc").as("encoded"))
        .orderBy(col("wfreq").desc, col("word"))
    },

    // Heaps-law vocabulary growth — the coverage diagnostic a corpus
    // curator reads before deciding whether MORE data still buys new
    // vocabulary: per corpus decile (doc_id order), token volume, NEW
    // types (tokens whose FIRST occurrence lands in that decile), the
    // cumulative vocabulary, and the running type-token ratio. The whole
    // curve costs one scan: first occurrence is min(doc_id) per token
    // hash — an algebraic aggregate — so "new types per decile" is a
    // 10-row histogram of that min, and the cumulative folds over a
    // 10×10 triangular metadata join (deliberately NOT a window — the
    // global-cum window would be a single-task funnel; the triangular
    // join keeps GlobalPlanGuard's empty gwin allowlist intact). TTR
    // publishes micro-exact via truncating division.
    q("q274_heaps_curve",
      "3-shingle vocabulary growth by corpus decile: new types, cumulative vocab, running TTR")(
      s"""WITH d AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
         |mx AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS n FROM d),
         |tok AS (SELECT doc_id, unnest(${shinglesSql("t", 3)}) AS w FROM d),
         |f AS (SELECT ${md5LongSql("w")} AS h, CAST(min(doc_id) AS BIGINT) AS fd
         |      FROM tok GROUP BY h),
         |nt AS (SELECT (f.fd * 10) // mx.n AS dec, CAST(count(*) AS BIGINT) AS new_types
         |       FROM f CROSS JOIN mx GROUP BY 1),
         |tv AS (SELECT (tok.doc_id * 10) // mx.n AS dec, CAST(count(*) AS BIGINT) AS units
         |       FROM tok CROSS JOIN mx GROUP BY 1),
         |spine AS (SELECT unnest(generate_series(0, 9)) AS dec),
         |base AS (SELECT CAST(spine.dec AS BIGINT) AS dec,
         |                coalesce(tv.units, 0) AS units, coalesce(nt.new_types, 0) AS new_types
         |         FROM spine LEFT JOIN tv ON tv.dec = spine.dec
         |                    LEFT JOIN nt ON nt.dec = spine.dec),
         |cum AS (SELECT a.dec, a.units, a.new_types,
         |               CAST(sum(b.new_types) AS BIGINT) AS cum_types,
         |               CAST(sum(b.units) AS BIGINT) AS cum_units
         |        FROM base a JOIN base b ON b.dec <= a.dec
         |        GROUP BY a.dec, a.units, a.new_types)
         |SELECT dec, units, new_types, cum_types, cum_units,
         |       CAST((1000000 * cum_types) // cum_units AS BIGINT) AS ttr_micro
         |FROM cum ORDER BY dec""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), split(col("text"), " ").as("t"))
      val mx = d.agg((max(col("doc_id")) + 1).as("n"))
      val tok = d.select(col("doc_id"), explode(shingles(col("t"), 3)).as("w"))
        .cache() // min-doc + volume
      val f = tok.groupBy(md5Long(col("w")).as("h")).agg(min(col("doc_id")).as("fd"))
      val nt = f.crossJoin(broadcast(mx))
        .groupBy(expr("(fd * 10) div n").as("dec")).agg(count(lit(1)).as("new_types"))
      val tv = tok.crossJoin(broadcast(mx))
        .groupBy(expr("(doc_id * 10) div n").as("dec")).agg(count(lit(1)).as("units"))
      val spine = s.range(1).select(explode(sequence(lit(0L), lit(9L))).as("dec"))
      val base = spine.join(tv, Seq("dec"), "left").join(nt, Seq("dec"), "left")
        .select(col("dec"), coalesce(col("units"), lit(0L)).as("units"),
          coalesce(col("new_types"), lit(0L)).as("new_types"))
      val a = base.select(col("dec"), col("units"), col("new_types"))
      val b = base.select(col("dec").as("bdec"), col("units").as("bunits"),
        col("new_types").as("bnew"))
      a.join(b, col("bdec") <= col("dec"))
        .groupBy("dec", "units", "new_types")
        .agg(sum(col("bnew")).as("cum_types"), sum(col("bunits")).as("cum_units"))
        .select(col("dec"), col("units"), col("new_types"), col("cum_types"), col("cum_units"),
          expr("cast((1000000 * cum_types) div cum_units as bigint)").as("ttr_micro"))
        .orderBy("dec")
    },

    // Good–Turing unseen-mass estimate, VALIDATED against reality — the
    // estimator under every smoothed language model (Good 1953, public
    // literature): the probability that the NEXT observation is a
    // never-seen type is ≈ N₁/N (singleton count over total
    // occurrences). q274's curve gives the held-out truth for free:
    // train on the first 8 corpus deciles, then measure what fraction
    // of decile-8/9 shingle occurrences are genuinely novel. The output
    // carries both numbers plus the N_r frequency-of-frequencies spine
    // the estimator reads — all integer micro-units (counts and
    // truncating divisions only), and the spec asserts the estimate
    // lands within a factor-band of the measured rate (an estimator
    // audit, not a tautology: N₁/N is computed from TRAIN alone).
    // Scale shape: two grouped passes over (shingle-hash) keys + an
    // anti-join of test types vs the train vocabulary — 8-byte keys,
    // never text; the N_r table is ≤ max-frequency rows.
    q("q286_good_turing",
      "Good-Turing N1/N unseen-mass estimate vs the measured novel-occurrence rate")(
      s"""WITH d AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
         |mx AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS n FROM d),
         |tok AS (SELECT doc_id, ${md5LongSql("w")} AS h FROM
         |          (SELECT doc_id, unnest(${shinglesSql("t", 3)}) AS w FROM d)),
         |tr AS (SELECT h, CAST(count(*) AS BIGINT) AS c
         |       FROM tok CROSS JOIN mx WHERE (doc_id * 10) // mx.n < 8 GROUP BY h),
         |nr AS (SELECT c AS r, CAST(count(*) AS BIGINT) AS n_r FROM tr WHERE c <= 3 GROUP BY c),
         |ntr AS (SELECT CAST(sum(c) AS BIGINT) AS n_occ,
         |               CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
         |        FROM tr),
         |te AS (SELECT tok.h FROM tok CROSS JOIN mx WHERE (doc_id * 10) // mx.n >= 8),
         |tt AS (SELECT CAST(count(*) AS BIGINT) AS test_occ,
         |              CAST(sum(CASE WHEN tr.h IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS novel_occ
         |       FROM te LEFT JOIN tr ON tr.h = te.h)
         |SELECT * FROM (
         |  SELECT 'a_gt_unseen_micro' AS metric,
         |         CAST((1000000 * n1) // n_occ AS BIGINT) AS value FROM ntr
         |  UNION ALL
         |  SELECT 'b_actual_unseen_micro', CAST((1000000 * novel_occ) // test_occ AS BIGINT) FROM tt
         |  UNION ALL
         |  SELECT 'c_train_occ', n_occ FROM ntr
         |  UNION ALL
         |  SELECT 'd_test_occ', test_occ FROM tt
         |  UNION ALL
         |  SELECT 'n_r=' || CAST(r AS VARCHAR), n_r FROM nr)
         |ORDER BY metric""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), split(col("text"), " ").as("t"))
      val mx = d.agg((max(col("doc_id")) + 1).as("n"))
      val tok = d.select(col("doc_id"), explode(shingles(col("t"), 3)).as("w"))
        .select(col("doc_id"), md5Long(col("w")).as("h"))
        .crossJoin(broadcast(mx))
        .select(expr("(doc_id * 10) div n").as("dec"), col("h"))
        .cache() // train histogram + test leg
      val tr = tok.filter(col("dec") < 8).groupBy("h").agg(count(lit(1)).as("c"))
        .cache() // N_r spine + totals + the anti-join side
      val nr = tr.filter(col("c") <= 3).groupBy(col("c").as("r")).agg(count(lit(1)).as("n_r"))
      val ntr = tr.agg(sum(col("c")).as("n_occ"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"))
      val tt = tok.filter(col("dec") >= 8).select(col("h"))
        .join(tr.select(col("h"), lit(1L).as("seen")), Seq("h"), "left")
        .agg(count(lit(1)).as("test_occ"),
          sum(when(col("seen").isNull, 1L).otherwise(0L)).as("novel_occ"))
      ntr.select(lit("a_gt_unseen_micro").as("metric"),
          expr("cast((1000000 * n1) div n_occ as bigint)").as("value"))
        .unionAll(tt.select(lit("b_actual_unseen_micro").as("metric"),
          expr("cast((1000000 * novel_occ) div test_occ as bigint)").as("value")))
        .unionAll(ntr.select(lit("c_train_occ").as("metric"), col("n_occ").as("value")))
        .unionAll(tt.select(lit("d_test_occ").as("metric"), col("test_occ").as("value")))
        .unionAll(nr.select(concat(lit("n_r="), col("r").cast("string")).as("metric"),
          col("n_r").as("value")))
        .orderBy("metric")
    },

    // Chao1 richness — q286's sibling question: not "how much of the
    // NEXT sample is new" but "how many types exist that we have not
    // seen at all": Ŝ = S_obs + n₁²/(2n₂) (Chao 1984, public
    // literature). Audited against ground truth the corpus itself
    // provides: train on the first TWO deciles only, compare the
    // estimate to the realized full-corpus richness — the estimate must
    // land strictly closer to the truth than the naive S_obs
    // (improvement law, spec-pinned at both scales). All integer: three
    // counts and one truncating division. Scale shape: one train
    // histogram over 8-byte shingle hashes + one full-corpus distinct.
    q("q289_chao1_richness",
      "Chao1 unseen-species estimate from a 20% prefix vs realized corpus richness")(
      s"""WITH d AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
         |mx AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS n FROM d),
         |tok AS (SELECT doc_id, ${md5LongSql("w")} AS h FROM
         |          (SELECT doc_id, unnest(${shinglesSql("t", 3)}) AS w FROM d)),
         |tr AS (SELECT h, CAST(count(*) AS BIGINT) AS c
         |       FROM tok CROSS JOIN mx WHERE (doc_id * 10) // mx.n < 2 GROUP BY h),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS s_obs,
         |              CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |              CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
         |       FROM tr),
         |fu AS (SELECT CAST(count(DISTINCT h) AS BIGINT) AS true_richness FROM tok)
         |SELECT st.s_obs, st.n1, st.n2,
         |       CAST(st.s_obs + (st.n1 * st.n1) // (2 * st.n2) AS BIGINT) AS chao1,
         |       fu.true_richness
         |FROM st CROSS JOIN fu""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), split(col("text"), " ").as("t"))
      val mx = d.agg((max(col("doc_id")) + 1).as("n"))
      val tok = d.select(col("doc_id"), explode(shingles(col("t"), 3)).as("w"))
        .select(col("doc_id"), md5Long(col("w")).as("h"))
        .crossJoin(broadcast(mx))
        .select(expr("(doc_id * 10) div n").as("dec"), col("h"))
        .cache() // train histogram + full distinct
      val st = tok.filter(col("dec") < 2).groupBy("h").agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("s_obs"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"))
      val fu = tok.agg(countDistinct(col("h")).as("true_richness"))
      st.crossJoin(broadcast(fu))
        .select(col("s_obs"), col("n1"), col("n2"),
          expr("cast(s_obs + (n1 * n1) div (2 * n2) as bigint)").as("chao1"),
          col("true_richness"))
    },

    // Content drift — the drift monitors (PSI q229, KS q257/q259) watch
    // statistics; this watches WHAT IS WRITTEN: exact shingle-set Jaccard
    // between consecutive corpus deciles. A pipeline ingesting shifting
    // sources sees this curve sag long before summary stats move. Exact
    // and cheap: distinct (shingle-hash, decile) pairs from one scan,
    // consecutive-decile intersections from a self-equi-join on the
    // 8-byte hash, per-decile vocabulary from a grouped count — Jaccard
    // folds to one truncating milli division per pair. On this corpus
    // the curve is FLAT (uniform synthesis — the measured null); the
    // spec pins flatness, so a regenerated drifting fixture would show
    // up as a failing pin, not silent prose.
    q("q306_content_drift",
      "exact shingle Jaccard between consecutive corpus deciles: the content-drift curve")(
      s"""WITH d AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
         |mx AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS n FROM d),
         |sh AS (SELECT DISTINCT (doc_id * 10) // mx.n AS dec, ${md5LongSql("w")} AS h
         |       FROM (SELECT doc_id, unnest(${shinglesSql("t", 3)}) AS w FROM d)
         |       CROSS JOIN mx),
         |vc AS (SELECT dec, CAST(count(*) AS BIGINT) AS nv FROM sh GROUP BY dec),
         |ix AS (SELECT a.dec, CAST(count(*) AS BIGINT) AS inter
         |       FROM sh a JOIN sh b ON b.h = a.h AND b.dec = a.dec + 1
         |       GROUP BY a.dec)
         |SELECT ix.dec, va.nv AS n_a, vb.nv AS n_b, ix.inter,
         |       CAST((1000 * ix.inter) // (va.nv + vb.nv - ix.inter) AS BIGINT) AS jaccard_milli
         |FROM ix JOIN vc va ON va.dec = ix.dec JOIN vc vb ON vb.dec = ix.dec + 1
         |ORDER BY ix.dec""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), split(col("text"), " ").as("t"))
      val mx = d.agg((max(col("doc_id")) + 1).as("n"))
      val sh = d.select(col("doc_id"), explode(shingles(col("t"), 3)).as("w"))
        .crossJoin(broadcast(mx))
        .select(expr("(doc_id * 10) div n").as("dec"), md5Long(col("w")).as("h"))
        .distinct()
        .cache() // vocabulary counts + the consecutive-pair join (both legs)
      val vc = sh.groupBy("dec").agg(count(lit(1)).as("nv"))
      val ix = sh.select(col("dec"), col("h"))
        .join(sh.select((col("dec") - 1).as("dec"), col("h")), Seq("dec", "h"))
        .groupBy("dec").agg(count(lit(1)).as("inter"))
      ix.join(vc.select(col("dec"), col("nv").as("n_a")), Seq("dec"))
        .join(vc.select((col("dec") - 1).as("dec"), col("nv").as("n_b")), Seq("dec"))
        .select(col("dec"), col("n_a"), col("n_b"), col("inter"),
          expr("cast((1000 * inter) div (n_a + n_b - inter) as bigint)").as("jaccard_milli"))
        .orderBy("dec")
    },

    // Kneser–Ney smoothed trigram LM — the smoothing that separates a
    // usable LM from q72's add-one baseline on SPARSE n-gram counts.
    // Train is a FIXED 200-doc slice (absolute, not a fold fraction — so
    // the unseen-trigram rate stays ~⅔ at every sf instead of saturating
    // as the corpus grows); eval is everything after it. Discount d=¾
    // keeps the whole estimator integer: p_KN(w3|w1w2) in micro units =
    // (max(4c₃−3,0)·10⁶)//(4c₁₂) + (3·N1+(ctx·)·p_cont)//(4c₁₂), with
    // p_cont(w3) = N1+(·w3)·10⁶//T over distinct trigram types — the
    // absolute-discount mass routed through the CONTINUATION distribution
    // (how many contexts a word completes, not how often it occurs),
    // which is what lets KN cover 1000‰ of held-out trigram tokens where
    // raw MLE covers ~330‰ (spec-pinned at both scales). Unseen context
    // backs off to p_cont alone. At 100 TB: count tables shuffle (hash,
    // count) pairs; the eval scan is three equi-joins against them plus
    // one 1-row type-count scalar — q72's exact layout, smarter math.
    q("q327_kneser_ney",
      "KN-smoothed trigram LM: 1000 permille held-out coverage vs ~330 for raw MLE")(
      s"""$knCteSql
         |SELECT CAST(count(*) AS BIGINT) AS n_eval,
         |       CAST(sum(CASE WHEN p_mle > 0 THEN 1 ELSE 0 END) AS BIGINT) AS mle_covered,
         |       CAST(sum(CASE WHEN p_kn > 0 THEN 1 ELSE 0 END) AS BIGINT) AS kn_covered,
         |       CAST(sum(CASE WHEN p_mle > 0 THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT)
         |         AS mle_cov_permille,
         |       CAST(sum(CASE WHEN p_kn > 0 THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT)
         |         AS kn_cov_permille,
         |       CAST(sum(p_mle) // count(*) AS BIGINT) AS mle_avg_micro,
         |       CAST(sum(p_kn) // count(*) AS BIGINT) AS kn_avg_micro
         |FROM p""".stripMargin
    ) { (s, dir) =>
      knScored(s, dir)
        .agg(count(lit(1)).as("n_eval"),
          sum(when(col("p_mle") > 0, 1L).otherwise(0L)).as("mle_covered"),
          sum(when(col("p_kn") > 0, 1L).otherwise(0L)).as("kn_covered"),
          sum(col("p_mle")).as("sm"), sum(col("p_kn")).as("sk"))
        .select(col("n_eval"), col("mle_covered"), col("kn_covered"),
          expr("mle_covered * 1000 div n_eval").as("mle_cov_permille"),
          expr("kn_covered * 1000 div n_eval").as("kn_cov_permille"),
          expr("sm div n_eval").as("mle_avg_micro"),
          expr("sk div n_eval").as("kn_avg_micro"))
    },

    // CCNet-style LM-score tertiles (Wenzek et al. 2020, public
    // arXiv:1911.00359 §4.3 — "head/middle/tail" perplexity buckets are
    // THE standard corpus-quality split): score every held-out doc by its
    // mean per-trigram Kneser–Ney probability (micro-units — exact
    // integers, the monotone stand-in for perplexity that stays
    // hash-verifiable), rank docs exactly, and cut the ranking into
    // thirds. Per-bucket output pins MEMBERSHIP (doc-id sums), not just
    // counts. The ranking runs on DistributedRank's two-pass global rank —
    // never an unpartitioned window — and the tertile cuts come from one
    // 1-row doc-count broadcast; the LM legs are q327's broadcast count
    // tables, shared definition and all.
    q("q365_lm_score_tertiles",
      "CCNet head/middle/tail buckets by exact per-doc mean KN trigram score")(
      s"""$knCteSql,
         |pd AS (SELECT doc_id, CAST(sum(p_kn) // count(*) AS BIGINT) AS s
         |       FROM p GROUP BY doc_id),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pd),
         |rk AS (SELECT doc_id, s,
         |              row_number() OVER (ORDER BY s DESC, doc_id) AS rn FROM pd),
         |b AS (SELECT CASE WHEN rn <= nn.n // 3 THEN 'head'
         |                  WHEN rn <= (2 * nn.n) // 3 THEN 'middle'
         |                  ELSE 'tail' END AS bucket, doc_id, s
         |      FROM rk CROSS JOIN nn)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |       CAST(sum(s) // count(*) AS BIGINT) AS avg_kn_micro
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
    ) { (s, dir) =>
      // Eager checkpoint (round-11, the ccComponents lesson applied to a
      // rank input): pd is ONE ROW PER DOC but its lineage is the full
      // eval-trigram broadcast-join subtree — without the checkpoint that
      // subtree executes up to three times (RangePartitioner boundary
      // sampling, the partition+persist pass, and the separate nn count).
      // Materializing the tiny per-doc frame once collapses all three to
      // checkpoint reads; q327 (one aggregate pass over the same subtree)
      // is the cost floor this brings q365 back to.
      val pd = knScored(s, dir).groupBy("doc_id")
        .agg(count(lit(1)).as("n_tg"), sum(col("p_kn")).as("sk"))
        .select(col("doc_id"), expr("sk div n_tg").as("s"))
        .localCheckpoint(true)
      val nn = pd.agg(count(lit(1)).as("n"))
      graft.operators.DistributedRank
        .withRowNumber(pd, Seq(col("s").desc, col("doc_id")), "rn")
        .crossJoin(broadcast(nn))
        .select(col("doc_id"), col("s"),
          when(col("rn") <= expr("n div 3"), "head")
            .when(col("rn") <= expr("(2 * n) div 3"), "middle")
            .otherwise("tail").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"),
          sum(col("s")).as("sum_s"))
        // integer div, not Column./ (double division + cast can land one
        // off the exact quotient at representability boundaries)
        .select(col("bucket"), col("n_docs"), col("id_sum"),
          expr("sum_s div n_docs").as("avg_kn_micro"))
        .orderBy("bucket")
    },

    // Positional PHRASE search — the proximity operator q88's inverted
    // index (term presence) and q110's BM25 (bag of words) can't answer:
    // "these three tokens, adjacent, in order". Postings carry POSITIONS
    // (term, doc, pos — the real search-engine posting shape), and a
    // phrase match is the classic positional join: postings(t1) ⋈
    // postings(t2) on (doc, pos+1) ⋈ postings(t3) on (doc, pos+2).
    // Probes are the corpus's own top-3 trigrams (counted off the
    // shingle stream — no join needed for counting; the positional join
    // is reserved for MATCHING, which is where it earns its keep). At
    // 100 TB postings shuffle by term, so each probe touches only its
    // three term slices — the inverted-index probe path, not a scan.
    // Output: per phrase the doc-frequency, total hits, and top-3 docs.
    q("q335_phrase_search",
      "positional trigram phrase match via (doc, pos+k) postings joins; top-3 corpus phrases")(
      s"""WITH tok AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
         |post AS (SELECT doc_id,
         |                unnest(list_transform(generate_series(1, len(toks)),
         |                       i -> struct_pack(pos := i, w := toks[i])), recursive := true)
         |         FROM tok),
         |tri AS (SELECT g AS ph, CAST(count(*) AS BIGINT) AS n
         |        FROM (SELECT unnest(${shinglesSql("toks", 3)}) AS g
         |              FROM tok WHERE len(toks) >= 3)
         |        GROUP BY g),
         |top3 AS (SELECT ph FROM tri ORDER BY n DESC, ph LIMIT 3),
         |hits AS (SELECT t.ph, a.doc_id, CAST(count(*) AS BIGINT) AS hits
         |         FROM top3 t
         |         JOIN post a ON a.w = split_part(t.ph, ' ', 1)
         |         JOIN post b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
         |                    AND b.w = split_part(t.ph, ' ', 2)
         |         JOIN post c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
         |                    AND c.w = split_part(t.ph, ' ', 3)
         |         GROUP BY t.ph, a.doc_id),
         |rk AS (SELECT ph, doc_id, hits,
         |              row_number() OVER (PARTITION BY ph ORDER BY hits DESC, doc_id) AS rn,
         |              CAST(count(*) OVER (PARTITION BY ph) AS BIGINT) AS n_docs,
         |              CAST(sum(hits) OVER (PARTITION BY ph) AS BIGINT) AS n_hits
         |       FROM hits)
         |SELECT ph AS phrase, n_docs, n_hits, CAST(rn AS BIGINT) AS rank, doc_id, hits
         |FROM rk WHERE rn <= 3 ORDER BY phrase, rank""".stripMargin
    ) { (s, dir) =>
      val tok = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .cache() // shingle counting + postings
      val post = tok.select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "w")))
        .cache() // three probe legs
      val top3 = tok.filter(size(col("toks")) >= 3)
        .select(explode(shingles(col("toks"), 3)).as("ph"))
        .groupBy("ph").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ph")).limit(3)
        .select(col("ph"),
          split_part(col("ph"), lit(" "), lit(1)).as("w1"),
          split_part(col("ph"), lit(" "), lit(2)).as("w2"),
          split_part(col("ph"), lit(" "), lit(3)).as("w3"))
      val hits = broadcast(top3)
        .join(post.select(col("doc_id"), col("pos"), col("w").as("w1")), Seq("w1"))
        .join(post.select(col("doc_id"), (col("pos") - 1).as("pos"), col("w").as("w2")),
          Seq("doc_id", "pos", "w2"))
        .join(post.select(col("doc_id"), (col("pos") - 2).as("pos"), col("w").as("w3")),
          Seq("doc_id", "pos", "w3"))
        .groupBy("ph", "doc_id").agg(count(lit(1)).as("hits"))
      val wp = Window.partitionBy("ph")
      hits.select(col("ph"), col("doc_id"), col("hits"),
          row_number().over(wp.orderBy(col("hits").desc, col("doc_id"))).as("rn"),
          count(lit(1)).over(wp).as("n_docs"),
          sum(col("hits")).over(wp).as("n_hits"))
        .filter(col("rn") <= 3)
        .select(col("ph").as("phrase"), col("n_docs"), col("n_hits"),
          col("rn").cast("long").as("rank"), col("doc_id"), col("hits"))
        .orderBy("phrase", "rank")
    },

    // q351: exact LCS alignment — the edit-family member the similarity
    // suite lacked: shingle/minhash/SimHash (q34*) score SET overlap,
    // Jaro-Winkler (q332) scores short strings; LCS measures the longest
    // ORDER-PRESERVING common token subsequence, the quantity behind
    // diff-based dedup forensics (Myers diff / "how much of A survives in
    // B, in order"). The O(n·m) DP runs INSIDE the engines: Spark folds
    // the DP rows with aggregate() using the prefix-max row form
    // (L(i,j) = max(L(i−1,j), max_{k≤j}(L(i−1,k−1) + eq_k)) — legal
    // because DP rows are non-decreasing), and DuckDB runs the identical
    // row recurrence as a recursive CTE over i — no driver compute, no
    // UDF. Three arms over 8 sampled ≥48-token docs (fixed LIMIT 8 keeps
    // cost flat across scales): 'self' (a vs a — ratio must be 1000),
    // 'mut' (every hash-chosen ~third token replaced by an out-of-vocab
    // marker — LCS is then PROVABLY 48 − n_mutated, carried as a
    // constant-0 law column: mutated positions can match nothing, and
    // every match consumes an unmutated position), and 'cross' (vs the
    // anchor doc — unrelated text, low ratio). At 100 TB the shape is
    // map-side per CANDIDATE PAIR (each row's DP is 48³ integer lambda
    // ops) — LCS is the post-blocking verifier, never the blocker; pair
    // generation stays with q34c/q164's bucketed joins.
    q("q351_lcs_alignment",
      "exact token-LCS via in-engine DP: self/mutated/cross arms, provable mutation law")(
      s"""WITH RECURSIVE eligible AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks
         |  FROM documents WHERE len(string_split(text, ' ')) >= 48),
         |samp AS MATERIALIZED (
         |  SELECT doc_id, list_slice(toks, 1, 48) AS t48 FROM eligible
         |  WHERE ${md5LongSql("'lcs:' || CAST(doc_id AS VARCHAR)")} % 40 = 0
         |  ORDER BY doc_id LIMIT 8),
         |anchor AS (SELECT doc_id AS aid, t48 AS at48 FROM samp
         |           ORDER BY doc_id LIMIT 1),
         |pairs AS MATERIALIZED (
         |  SELECT 'self' AS arm, doc_id, t48 AS ta, t48 AS tb,
         |         CAST(0 AS BIGINT) AS n_mutated
         |  FROM samp
         |  UNION ALL
         |  SELECT 'mut', doc_id, t48,
         |         list_transform(generate_series(1, 48), k ->
         |           CASE WHEN ${md5LongSql("'lcsmut:' || CAST(doc_id AS VARCHAR) || ':' || CAST(k AS VARCHAR)")} % 3 = 0
         |                THEN 'zzmutq9' || k ELSE t48[k] END),
         |         CAST(len(list_filter(generate_series(1, 48), k ->
         |           ${md5LongSql("'lcsmut:' || CAST(doc_id AS VARCHAR) || ':' || CAST(k AS VARCHAR)")} % 3 = 0)) AS BIGINT)
         |  FROM samp
         |  UNION ALL
         |  SELECT 'cross', s.doc_id, s.t48, a.at48, CAST(0 AS BIGINT)
         |  FROM samp s CROSS JOIN anchor a WHERE s.doc_id <> a.aid),
         |dp AS (
         |  SELECT arm, doc_id, ta, tb, n_mutated, 0 AS i,
         |         list_transform(generate_series(1, 49), x -> CAST(0 AS BIGINT)) AS row
         |  FROM pairs
         |  UNION ALL
         |  SELECT arm, doc_id, ta, tb, n_mutated, i + 1,
         |         list_prepend(CAST(0 AS BIGINT),
         |           list_transform(generate_series(1, 48), t ->
         |             greatest(row[t + 1],
         |               list_max(list_slice(
         |                 list_transform(generate_series(1, 48), k ->
         |                   row[k] + CASE WHEN ta[i + 1] = tb[k] THEN 1 ELSE 0 END),
         |                 1, t)))))
         |  FROM dp WHERE i < 48)
         |SELECT arm, doc_id, CAST(row[49] AS BIGINT) AS lcs_len,
         |       CAST(row[49] * 1000 // 48 AS BIGINT) AS ratio_milli, n_mutated,
         |       CAST(CASE WHEN arm = 'mut' THEN row[49] + n_mutated - 48
         |                 ELSE 0 END AS BIGINT) AS mut_law
         |FROM dp WHERE i = 48
         |ORDER BY arm, doc_id""".stripMargin
    ) { (s, dir) =>
      val eligible = Tables(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 48)
      val samp = eligible
        .filter(md5Long(concat(lit("lcs:"), col("doc_id").cast("string"))) % 40 === 0)
        .select(col("doc_id"), slice(col("toks"), 1, 48).as("t48"))
        .orderBy("doc_id").limit(8)
        .localCheckpoint(true) // three arms + the anchor leg
      val anchor = samp.orderBy("doc_id").limit(1)
        .select(col("doc_id").as("aid"), col("t48").as("at48"))
      // cast(... as bigint) BEFORE the % 3: conv() returns STRING, and the
      // mod must be 64-bit integer math (not string-coercion-dependent) to
      // stay bit-exact with the oracle's BIGINT arithmetic (ADVICE r6)
      val mutHash = "cast(conv(substring(md5(cast(concat('lcsmut:', cast(doc_id as string), " +
        "':', cast(k as string)) as binary)), 1, 15), 16, 10) as bigint) % 3 = 0"
      val pSelf = samp.select(lit("self").as("arm"), col("doc_id"),
        col("t48").as("ta"), col("t48").as("tb"), lit(0L).as("n_mutated"))
      val pMut = samp.select(lit("mut").as("arm"), col("doc_id"),
        col("t48").as("ta"),
        expr(s"transform(sequence(1, 48), k -> " +
          s"if($mutHash, concat('zzmutq9', cast(k as string)), element_at(t48, k)))").as("tb"),
        expr(s"cast(size(filter(sequence(1, 48), k -> $mutHash)) as bigint)")
          .as("n_mutated"))
      val pCross = samp.crossJoin(broadcast(anchor))
        .filter(col("doc_id") =!= col("aid"))
        .select(lit("cross").as("arm"), col("doc_id"),
          col("t48").as("ta"), col("at48").as("tb"), lit(0L).as("n_mutated"))
      val pairs = pSelf.unionByName(pMut).unionByName(pCross)
      // the DP fold: prev row (49 bigints) → next row via the prefix-max
      // candidate form; element_at is 1-based like DuckDB list indexing
      val lcsExpr =
        """aggregate(
          |  ta,
          |  array_repeat(cast(0 as bigint), 49),
          |  (prev, x) -> concat(array(cast(0 as bigint)),
          |    transform(sequence(1, 48), t ->
          |      greatest(element_at(prev, t + 1),
          |        array_max(slice(
          |          transform(sequence(1, 48), k ->
          |            element_at(prev, k) + if(x = element_at(tb, k), 1L, 0L)),
          |          1, t))))),
          |  fin -> element_at(fin, 49))""".stripMargin
      pairs.withColumn("lcs_len", expr(lcsExpr))
        .select(col("arm"), col("doc_id"), col("lcs_len"),
          expr("lcs_len * 1000 div 48").as("ratio_milli"), col("n_mutated"),
          when(col("arm") === "mut", col("lcs_len") + col("n_mutated") - 48)
            .otherwise(0L).cast("long").as("mut_law"))
        .orderBy("arm", "doc_id")
    },

    // Corpus BLEU-4 (Papineni et al. 2002, public ACL anthology P02-1040) —
    // the n-gram-precision eval every generation pipeline runs on its SFT /
    // distillation outputs. Hypothesis/reference pairs come from doc_id
    // parity (hyp = even, ref = odd sibling — no window, no per-lang rank:
    // the pairing is row-local arithmetic, the q370 discipline), so the
    // metric exercises the full machinery on organically-similar pairs
    // (same corpus, mostly disjoint text → small but nonzero higher-order
    // matches). Semantics are the textbook corpus BLEU: per-pair CLIPPED
    // n-gram matches (min of hyp/ref occurrence counts — a left join of
    // count frames, not a gram set intersection), corpus-pooled
    // p_n = Σclip/Σtotal, brevity penalty exp(min(0, 1−r/c)), geometric
    // mean over n=1..4, hard zero when any p_n = 0. Everything up to the
    // final ln/exp is BIGINT-exact; the float tail is a fixed-order
    // 4-term sum of logs of identical rationals — bit-stable across
    // engines. Scale shape: one tokenize pass, 4 gram-count legs
    // (partial-aggregated; 8-byte-ish keys after the groupBy), one
    // pair-keyed left join — no global ordering anywhere.
    q("q366_bleu",
      "corpus BLEU-4 of even-doc hypotheses vs odd-doc references, per lang")(
      s"""WITH tok AS (SELECT doc_id // 2 AS pid, doc_id % 2 AS role, lang,
         |                    string_split(text, ' ') AS t
         |             FROM documents),
         |lens AS (SELECT pid, role, lang, CAST(len(t) AS BIGINT) AS ln FROM tok),
         |pairs AS (SELECT h.pid, h.lang, h.ln AS c_len, r.ln AS r_len
         |          FROM lens h JOIN lens r ON h.pid = r.pid AND r.role = 1
         |          WHERE h.role = 0),
         |g AS (${(1 to 4).map(n =>
               s"SELECT pid, role, $n AS n, unnest(${shinglesSql("t", n)}) AS gr FROM tok")
               .mkString("\n      UNION ALL ")}),
         |cnt AS (SELECT pid, role, n, gr, CAST(count(*) AS BIGINT) AS c
         |        FROM g GROUP BY pid, role, n, gr),
         |clip AS (SELECT p.lang, h.n, least(h.c, coalesce(r.c, 0)) AS cl
         |         FROM (SELECT * FROM cnt WHERE role = 0) h
         |         LEFT JOIN (SELECT * FROM cnt WHERE role = 1) r
         |           ON r.pid = h.pid AND r.n = h.n AND r.gr = h.gr
         |         JOIN pairs p ON p.pid = h.pid),
         |m AS (SELECT lang, n, CAST(sum(cl) AS BIGINT) AS m FROM clip GROUP BY lang, n),
         |t AS (SELECT lang, ns.n AS n,
         |             CAST(sum(greatest(c_len - ns.n + 1, 0)) AS BIGINT) AS t
         |      FROM pairs CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS n) ns
         |      GROUP BY lang, ns.n),
         |wide AS (SELECT t.lang, t.n, coalesce(m.m, 0) AS m, t.t
         |         FROM t LEFT JOIN m ON m.lang = t.lang AND m.n = t.n),
         |piv AS (SELECT lang,
         |               CAST(max(CASE WHEN n = 1 THEN m END) AS BIGINT) AS m1,
         |               CAST(max(CASE WHEN n = 1 THEN t END) AS BIGINT) AS t1,
         |               CAST(max(CASE WHEN n = 2 THEN m END) AS BIGINT) AS m2,
         |               CAST(max(CASE WHEN n = 2 THEN t END) AS BIGINT) AS t2,
         |               CAST(max(CASE WHEN n = 3 THEN m END) AS BIGINT) AS m3,
         |               CAST(max(CASE WHEN n = 3 THEN t END) AS BIGINT) AS t3,
         |               CAST(max(CASE WHEN n = 4 THEN m END) AS BIGINT) AS m4,
         |               CAST(max(CASE WHEN n = 4 THEN t END) AS BIGINT) AS t4
         |        FROM wide GROUP BY lang),
         |base AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_pairs,
         |                CAST(sum(c_len) AS BIGINT) AS c_len,
         |                CAST(sum(r_len) AS BIGINT) AS r_len
         |         FROM pairs GROUP BY lang)
         |SELECT base.lang, n_pairs, c_len, r_len, m1, t1, m2, t2, m3, t3, m4, t4,
         |       round(CASE WHEN m1 > 0 AND m2 > 0 AND m3 > 0 AND m4 > 0
         |             THEN exp(least(0.0, 1.0 - CAST(r_len AS DOUBLE) / c_len)) *
         |                  exp((ln(m1 / CAST(t1 AS DOUBLE)) + ln(m2 / CAST(t2 AS DOUBLE)) +
         |                       ln(m3 / CAST(t3 AS DOUBLE)) + ln(m4 / CAST(t4 AS DOUBLE))) / 4)
         |             ELSE 0.0 END, 4) AS bleu
         |FROM piv JOIN base USING (lang) ORDER BY lang""".stripMargin
    ) { (s, dir) =>
      val tok = Tables.fanout(s, dir, "documents")
        .select(expr("doc_id div 2").as("pid"), (col("doc_id") % 2).as("role"),
          col("lang"), tokens(col("text")).as("t"))
        .cache() // one tokenize pass feeds lens + all 4 gram legs
      val lens = tok.select(col("pid"), col("role"), col("lang"),
        size(col("t")).cast("long").as("ln"))
      val pairs = lens.filter(col("role") === 0).alias("h")
        .join(lens.filter(col("role") === 1).alias("r"), Seq("pid"))
        .select(col("pid"), col("h.lang").as("lang"),
          col("h.ln").as("c_len"), col("r.ln").as("r_len"))
        .cache()
      val g = (1 to 4).map { n =>
        tok.select(col("pid"), col("role"), lit(n).as("n"),
          explode(shingles(col("t"), n)).as("gr"))
      }.reduce(_ unionByName _)
      val cnt = g.groupBy("pid", "role", "n", "gr").agg(count(lit(1)).as("c"))
      val clip = cnt.filter(col("role") === 0).alias("h")
        .join(cnt.filter(col("role") === 1).alias("r"),
          col("r.pid") === col("h.pid") && col("r.n") === col("h.n") &&
            col("r.gr") === col("h.gr"), "left")
        .select(col("h.pid").as("pid"), col("h.n").as("n"),
          least(col("h.c"), coalesce(col("r.c"), lit(0L))).as("cl"))
        .join(pairs.select("pid", "lang"), Seq("pid"))
      val mAgg = clip.groupBy("lang", "n").agg(sum(col("cl")).as("m"))
      val tAgg = pairs
        .select(col("lang"), col("c_len"), explode(sequence(lit(1), lit(4))).as("n"))
        .groupBy("lang", "n")
        .agg(sum(greatest(col("c_len") - col("n") + 1, lit(0L))).as("t"))
      val wide = tAgg.alias("t")
        .join(mAgg.alias("m"),
          col("m.lang") === col("t.lang") && col("m.n") === col("t.n"), "left")
        .select(col("t.lang").as("lang"), col("t.n").as("n"),
          coalesce(col("m.m"), lit(0L)).as("m"), col("t.t").as("t"))
      val piv = wide.groupBy("lang").agg(
        max(when(col("n") === 1, col("m"))).cast("long").as("m1"),
        max(when(col("n") === 1, col("t"))).cast("long").as("t1"),
        max(when(col("n") === 2, col("m"))).cast("long").as("m2"),
        max(when(col("n") === 2, col("t"))).cast("long").as("t2"),
        max(when(col("n") === 3, col("m"))).cast("long").as("m3"),
        max(when(col("n") === 3, col("t"))).cast("long").as("t3"),
        max(when(col("n") === 4, col("m"))).cast("long").as("m4"),
        max(when(col("n") === 4, col("t"))).cast("long").as("t4"))
      val base = pairs.groupBy("lang").agg(count(lit(1)).as("n_pairs"),
        sum(col("c_len")).as("c_len"), sum(col("r_len")).as("r_len"))
      piv.join(base, Seq("lang"))
        .select(col("lang"), col("n_pairs"), col("c_len"), col("r_len"),
          col("m1"), col("t1"), col("m2"), col("t2"), col("m3"), col("t3"),
          col("m4"), col("t4"),
          expr("""round(CASE WHEN m1 > 0 AND m2 > 0 AND m3 > 0 AND m4 > 0
                 THEN exp(least(0.0, 1.0 - CAST(r_len AS DOUBLE) / c_len)) *
                      exp((ln(m1 / CAST(t1 AS DOUBLE)) + ln(m2 / CAST(t2 AS DOUBLE)) +
                           ln(m3 / CAST(t3 AS DOUBLE)) + ln(m4 / CAST(t4 AS DOUBLE))) / 4)
                 ELSE 0.0 END, 4)""").as("bleu"))
        .orderBy("lang")
    },

    // Multinomial Naive Bayes language classifier — the trained counterpart
    // of q36d's marker heuristic and the fastText-style quality/lang gate
    // every curation stack runs (CCNet uses exactly this family). Features
    // are hashed unigrams (md5Long % 64 — the engine-portable hash, q184's
    // discipline), classes are langs, train/test split by doc_id parity.
    // Laplace-smoothed log-likelihoods ln((c+1)/(tot+64)) over the FULL
    // 5×64 (lang, bucket) spine (unseen buckets must score, so the spine is
    // an explode over the 5-row class-totals frame — no product joins
    // anywhere); the prior enters as ln(ndocs_lang) — the shared −ln(N)
    // normalizer is constant across classes, so it cancels in the argmax
    // and no 1-row scalar frame is needed. Scoring is one broadcast
    // equi-join of test (doc, bucket, n) rows against the 320-row model on
    // bucket (each row fans to the 5 classes), one grouped sum, argmax on
    // the ROUNDED score with lang-asc tiebreak (the q67 rounded-rank
    // discipline — the float tail is a ≤64-term sum of identical doubles).
    // Output is the integer confusion matrix. Scale: two grouped counts +
    // one broadcast join; the model is O(classes × buckets) — metadata.
    q("q368_nb_langid",
      "Naive Bayes lang classifier: parity-split train/score, confusion matrix")(
      s"""WITH $nbScoredCteSql,
         |pick AS (SELECT doc_id, lang_true, lang_pred,
         |                row_number() OVER (PARTITION BY doc_id
         |                                   ORDER BY score DESC, lang_pred) AS rn
         |         FROM nbscored)
         |SELECT lang_true, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
         |FROM pick WHERE rn = 1
         |GROUP BY lang_true, lang_pred ORDER BY lang_true, lang_pred""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("lang_pred"))
      nbScored(s, dir).withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy("lang_true", "lang_pred").agg(count(lit(1)).as("n_docs"))
        .orderBy("lang_true", "lang_pred")
    },

    // Zipf tail-exponent via the Hill estimator (Hill 1975, Annals of
    // Statistics — the standard MLE for a power-law tail index):
    // α̂ = k / Σ_{i≤k} ln(f_i / f_{k+1}) over each language's top-k token
    // frequencies (k = 16; the fixture wordlist is 31 tokens/lang, so the tail cut sits mid-distribution — the estimator form, not the asymptotics, is what is exercised). Complements q274's Heaps curve (vocabulary
    // GROWTH) with the frequency-decay law — together they are the two
    // classic sanity invariants a token distribution must satisfy before a
    // corpus is trusted for LM training. The per-lang top-(k+1) cut is
    // q36_top_tokens' ranked shape (vocabulary-sized partitions, not
    // corpus-sized); tie tokens at the boundary carry equal f, so the
    // estimate is tie-robust even though the cut itself tie-breaks on the
    // token. Integer frequencies end-to-end; the float tail is a fixed
    // 16-term log sum, round-4.
    q("q374_hill_zipf",
      "Hill tail-exponent of the per-lang token frequency distribution (k=16)")(
      """WITH fr AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS f
        |            FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
        |                  FROM documents)
        |            GROUP BY lang, w),
        |rk AS (SELECT lang, f,
        |              row_number() OVER (PARTITION BY lang ORDER BY f DESC, w) AS rn
        |       FROM fr),
        |kf AS (SELECT lang, f AS fk1 FROM rk WHERE rn = 17),
        |hill AS (SELECT rk.lang, max(kf.fk1) AS fk1,
        |                sum(ln(rk.f / CAST(kf.fk1 AS DOUBLE))) AS sl
        |         FROM rk JOIN kf ON kf.lang = rk.lang
        |         WHERE rk.rn <= 16 GROUP BY rk.lang),
        |vb AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_vocab,
        |              CAST(max(f) AS BIGINT) AS f_top
        |       FROM fr GROUP BY lang)
        |SELECT vb.lang, vb.n_vocab, vb.f_top, CAST(hill.fk1 AS BIGINT) AS f_k1,
        |       round(CASE WHEN hill.sl > 0 THEN 16.0 / hill.sl END, 4) AS hill_alpha
        |FROM vb JOIN hill ON hill.lang = vb.lang ORDER BY vb.lang""".stripMargin
    ) { (s, dir) =>
      val fr = Tables.fanout(s, dir, "documents")
        .select(col("lang"), explode(tokens(col("text"))).as("w"))
        .groupBy("lang", "w").agg(count(lit(1)).as("f"))
        .cache() // ranked-cut leg + vocab-stats leg
      val rw = Window.partitionBy(col("lang")).orderBy(col("f").desc, col("w"))
      val rk = fr.withColumn("rn", row_number().over(rw))
        .select("lang", "f", "rn").cache()
      val kf = rk.filter(col("rn") === 17).select(col("lang"), col("f").as("fk1"))
      val hill = rk.filter(col("rn") <= 16)
        .join(broadcast(kf), Seq("lang"))
        .groupBy("lang")
        .agg(max(col("fk1")).as("fk1"),
          sum(log(col("f") / col("fk1").cast("double"))).as("sl"))
      val vb = fr.groupBy("lang")
        .agg(count(lit(1)).as("n_vocab"), max(col("f")).as("f_top"))
      vb.join(hill, Seq("lang"))
        .select(col("lang"), col("n_vocab"), col("f_top"),
          col("fk1").cast("long").as("f_k1"),
          // degenerate flat tail (top-16 all tie rank 17): sl = 0 exactly —
          // emit NULL, not Inf, in BOTH engines (r8 advice)
          round(when(col("sl") > 0, lit(16.0) / col("sl")), 4).as("hill_alpha"))
        .orderBy("lang")
    },

    // Cohen's kappa (Cohen 1960, Educational & Psychological Measurement —
    // the chance-corrected agreement coefficient) between the engine's TWO
    // independent language classifiers on the test half: q368's trained
    // Naive Bayes vs q36b's marker-stopword heuristic, both reused by
    // SHARED DEFINITION (nbScoredCteSql / markerCaseSql — neither rule can
    // drift from its primary query). This is the inter-annotator-agreement
    // shape every labeling pipeline runs before trusting silver labels.
    // κ = (pₒ − pₑ)/(1 − pₑ) reduces to the all-integer form
    // (agree·N − Σₐ rowₐ·colₐ) / (N² − Σₐ rowₐ·colₐ) — exact until the
    // final division (pe_num is emitted so the spec recomposes κ from
    // integers). The Spark side computes all the census arithmetic with
    // fold HOFs over the collected ≤25-row agreement matrix (no 1-row
    // scalar products); the oracle uses plain marginal CTEs. On THIS
    // fixture the result is the textbook KAPPA PARADOX, measured before
    // shipping: every lang draws from one shared 31-token wordlist, so
    // both classifiers collapse to the majority class — raw agreement
    // 99.96%, κ = 0. That is kappa WORKING (chance-corrected agreement of
    // two constant annotators is zero), and exactly why the coefficient —
    // not raw agreement — is the silver-label gate.
    q("q375_cohens_kappa",
      "Cohen's kappa between the NB classifier and the marker heuristic on test docs")(
      s"""WITH $nbScoredCteSql,
         |pick AS (SELECT doc_id, lang_pred,
         |                row_number() OVER (PARTITION BY doc_id
         |                                   ORDER BY score DESC, lang_pred) AS rn
         |         FROM nbscored),
         |nbp AS (SELECT doc_id, lang_pred AS nb FROM pick WHERE rn = 1),
         |mt AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
         |msc AS (SELECT doc_id,
         |${markers.map { case (l, ws) =>
             s"  len(list_filter(w, x -> x IN (${inListSql(ws)}))) AS n_$l"
           }.mkString(",\n")}
         |FROM mt),
         |mp AS (SELECT doc_id, $markerCaseSql AS mk FROM msc),
         |ag AS (SELECT nb, mk, CAST(count(*) AS BIGINT) AS n
         |       FROM nbp JOIN mp USING (doc_id) GROUP BY nb, mk),
         |ra AS (SELECT nb, CAST(sum(n) AS BIGINT) AS rs FROM ag GROUP BY nb),
         |ca AS (SELECT mk, CAST(sum(n) AS BIGINT) AS cs FROM ag GROUP BY mk),
         |pe AS (SELECT CAST(sum(ra.rs * ca.cs) AS BIGINT) AS pen
         |       FROM ra JOIN ca ON ra.nb = ca.mk),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
         |               CAST(sum(CASE WHEN nb = mk THEN n ELSE 0 END) AS BIGINT) AS agree
         |        FROM ag)
         |SELECT tot.nn AS n_docs, tot.agree AS n_agree, pe.pen AS pe_num,
         |       round(tot.agree / CAST(tot.nn AS DOUBLE), 4) AS po,
         |       round(pe.pen / (CAST(tot.nn AS DOUBLE) * tot.nn), 4) AS pe,
         |       round((tot.agree * tot.nn - pe.pen) /
         |             CAST(tot.nn * tot.nn - pe.pen AS DOUBLE), 4) AS kappa
         |FROM tot CROSS JOIN pe""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("lang_pred"))
      val nbp = nbScored(s, dir)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("doc_id"), col("lang_pred").as("nb"))
      val mp = markerScored(s, dir).select(col("doc_id"), markerPredCol.as("mk"))
      val ag = nbp.join(mp, Seq("doc_id")).groupBy("nb", "mk")
        .agg(count(lit(1)).as("n"))
      // all census arithmetic over ONE collected row of the ≤K² matrix
      ag.agg(sort_array(collect_list(struct(col("nb"), col("mk"), col("n"))))
          .as("m"))
        .select(
          expr("aggregate(m, 0L, (a, x) -> a + x.n)").as("n_docs"),
          expr("aggregate(m, 0L, (a, x) -> a + if(x.nb = x.mk, x.n, 0L))").as("n_agree"),
          expr("""aggregate(array_distinct(transform(m, x -> x.nb)), 0L, (a, c) -> a +
                 aggregate(filter(m, x -> x.nb = c), 0L, (r, x) -> r + x.n) *
                 aggregate(filter(m, x -> x.mk = c), 0L, (r, x) -> r + x.n))""").as("pen"))
        .select(col("n_docs"), col("n_agree"), col("pen").as("pe_num"),
          round(col("n_agree") / col("n_docs").cast("double"), 4).as("po"),
          round(col("pen") / (col("n_docs").cast("double") * col("n_docs")), 4).as("pe"),
          round((col("n_agree") * col("n_docs") - col("pen")) /
            (col("n_docs") * col("n_docs") - col("pen")).cast("double"), 4).as("kappa"))
    },

    // Brier score with the Murphy decomposition (Brier 1950; Murphy 1973,
    // J. Applied Meteorology — both public): the calibration audit of
    // q368's Naive Bayes. Forecast = the model's top-class softmax
    // probability (computed stably as 1/Σ exp(s−s_max) from the SHARED
    // nbscored scores — rounded once there, so both engines bin the exact
    // same doubles), outcome = whether the top class is the true lang.
    // Forecasts bin into 10 deciles; the decomposition uses the BINNED
    // forecast (each p replaced by its bin mean), for which Murphy's
    // identity is EXACT: brier_binned = reliability − resolution +
    // uncertainty — emitted both directly-computed and recomposed, so the
    // spec can assert the algebraic law. Scale: everything after the
    // shared scoring is a 10-row census (collected fold, no scalar joins).
    q("q376_brier_decomposition",
      "Murphy decomposition of the NB top-class Brier score (10 forecast bins)")(
      s"""WITH $nbScoredCteSql,
         |pick AS (SELECT doc_id, lang_true, lang_pred, score,
         |                row_number() OVER (PARTITION BY doc_id
         |                                   ORDER BY score DESC, lang_pred) AS rn
         |         FROM nbscored),
         |top AS (SELECT doc_id, lang_true, lang_pred AS pred, score AS s_max
         |        FROM pick WHERE rn = 1),
         |prb AS (SELECT t.doc_id,
         |               1.0 / sum(exp(n.score - t.s_max)) AS p,
         |               CASE WHEN max(t.pred) = max(t.lang_true) THEN 1 ELSE 0 END AS o
         |        FROM top t JOIN nbscored n ON n.doc_id = t.doc_id
         |        GROUP BY t.doc_id),
         |bx AS (SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS k, p, o FROM prb),
         |g AS (SELECT k, CAST(count(*) AS BIGINT) AS n, sum(p) AS sp,
         |             CAST(sum(o) AS BIGINT) AS so,
         |             sum((p - o) * (p - o)) AS sq
         |      FROM bx GROUP BY k),
         |t2 AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(so) AS BIGINT) AS sso,
         |              sum(sq) AS braw
         |       FROM g),
         |parts AS (SELECT t2.nn, t2.sso, t2.braw,
         |                 sum(g.n * (g.sp / g.n - CAST(g.so AS DOUBLE) / g.n)
         |                         * (g.sp / g.n - CAST(g.so AS DOUBLE) / g.n)) AS reln,
         |                 sum(g.n * (CAST(g.so AS DOUBLE) / g.n - CAST(t2.sso AS DOUBLE) / t2.nn)
         |                         * (CAST(g.so AS DOUBLE) / g.n - CAST(t2.sso AS DOUBLE) / t2.nn)) AS resn,
         |                 sum(g.n * (g.sp / g.n) * (g.sp / g.n)
         |                     - 2 * (g.sp / g.n) * g.so + g.so) AS bdirn
         |          FROM g CROSS JOIN t2 GROUP BY t2.nn, t2.sso, t2.braw)
         |SELECT nn AS n_docs, round(braw / nn, 4) AS brier_raw,
         |       round(reln / nn, 4) AS reliability,
         |       round(resn / nn, 4) AS resolution,
         |       round((CAST(sso AS DOUBLE) / nn) * (1 - CAST(sso AS DOUBLE) / nn), 4) AS uncertainty,
         |       round(bdirn / nn, 4) AS brier_binned,
         |       round(reln / nn - resn / nn
         |             + (CAST(sso AS DOUBLE) / nn) * (1 - CAST(sso AS DOUBLE) / nn), 4) AS brier_murphy
         |FROM parts""".stripMargin
    ) { (s, dir) =>
      val scored = nbScored(s, dir).cache() // top pick + softmax denominator
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("lang_pred"))
      val top = scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lang_true"), col("lang_pred").as("pred"),
          col("score").as("s_max"))
      val prb = top.alias("t")
        .join(scored.alias("n"), col("n.doc_id") === col("t.doc_id"))
        .groupBy(col("t.doc_id").as("doc_id"))
        .agg((lit(1.0) / sum(exp(col("n.score") - col("t.s_max")))).as("p"),
          when(max(col("t.pred")) === max(col("t.lang_true")), 1L)
            .otherwise(0L).as("o"))
      val g = prb
        .select(least(floor(col("p") * 10).cast("long"), lit(9L)).as("k"),
          col("p"), col("o"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"), sum(col("p")).as("sp"), sum(col("o")).as("so"),
          sum((col("p") - col("o")) * (col("p") - col("o"))).as("sq"))
      // the 10-bin census folds inside one collected row — no scalar joins
      g.agg(sort_array(collect_list(struct(col("k"), col("n"), col("sp"),
          col("so"), col("sq")))).as("m"))
        .select(col("m"),
          expr("aggregate(m, 0L, (a, x) -> a + x.n)").as("nn"),
          expr("aggregate(m, 0L, (a, x) -> a + x.so)").as("sso"),
          expr("aggregate(m, 0.0d, (a, x) -> a + x.sq)").as("braw"))
        .select(col("nn").as("n_docs"),
          round(col("braw") / col("nn"), 4).as("brier_raw"),
          round(expr("""aggregate(m, 0.0d, (a, x) -> a +
              x.n * (x.sp / x.n - cast(x.so as double) / x.n)
                  * (x.sp / x.n - cast(x.so as double) / x.n))""") / col("nn"), 4)
            .as("reliability"),
          round(expr("""aggregate(m, 0.0d, (a, x) -> a +
              x.n * (cast(x.so as double) / x.n - cast(sso as double) / nn)
                  * (cast(x.so as double) / x.n - cast(sso as double) / nn))""") / col("nn"), 4)
            .as("resolution"),
          round((col("sso").cast("double") / col("nn")) *
            (lit(1.0) - col("sso").cast("double") / col("nn")), 4).as("uncertainty"),
          round(expr("""aggregate(m, 0.0d, (a, x) -> a +
              x.n * (x.sp / x.n) * (x.sp / x.n)
              - 2 * (x.sp / x.n) * x.so + x.so)""") / col("nn"), 4).as("brier_binned"),
          round(expr("""aggregate(m, 0.0d, (a, x) -> a +
              x.n * (x.sp / x.n - cast(x.so as double) / x.n)
                  * (x.sp / x.n - cast(x.so as double) / x.n))""") / col("nn")
            - expr("""aggregate(m, 0.0d, (a, x) -> a +
              x.n * (cast(x.so as double) / x.n - cast(sso as double) / nn)
                  * (cast(x.so as double) / x.n - cast(sso as double) / nn))""") / col("nn")
            + (col("sso").cast("double") / col("nn")) *
              (lit(1.0) - col("sso").cast("double") / col("nn")), 4).as("brier_murphy"))
    },

    // Confident-joint label-noise estimation (Northcutt et al. 2021 JAIR,
    // "Confident Learning", public arXiv:1911.00068 — the cleanlab
    // algorithm every labeled-data pipeline runs to find mislabeled
    // examples). From the SHARED nbscored scores: per-doc class
    // probabilities p_j (softmax of the round-4 scores), per-class
    // self-confidence thresholds t_j = mean p_j over docs LABELED j, and
    // the confident joint C[i][j] = #{label=i, argmax over {k: p_k ≥ t_k}
    // = j} (docs confident for no class drop out — the paper's rule).
    // Both p and t round to 6 before the ≥ comparison and the argmax, so
    // both engines threshold identical doubles (the q67 discipline).
    // Off-diagonal mass IS the estimated label-error census. Scale: one
    // grouped softmax, one 5-row broadcast threshold join, one grouped
    // count — everything after scoring is label-space metadata.
    q("q377_confident_joint",
      "cleanlab confident joint over NB class probabilities: label-noise census")(
      s"""WITH $nbScoredCteSql,
         |mx AS (SELECT doc_id, max(score) AS s_max FROM nbscored GROUP BY doc_id),
         |den AS (SELECT n.doc_id, sum(exp(n.score - mx.s_max)) AS z
         |        FROM nbscored n JOIN mx ON mx.doc_id = n.doc_id GROUP BY n.doc_id),
         |pp AS (SELECT n.doc_id, n.lang_true, n.lang_pred AS lng,
         |              round(exp(n.score - mx.s_max) / den.z, 6) AS p
         |       FROM nbscored n JOIN mx ON mx.doc_id = n.doc_id
         |                       JOIN den ON den.doc_id = n.doc_id),
         |th AS (SELECT lng, round(avg(p), 6) AS t
         |       FROM pp WHERE lang_true = lng GROUP BY lng),
         |cf AS (SELECT pp.doc_id, pp.lang_true, pp.lng, pp.p,
         |              row_number() OVER (PARTITION BY pp.doc_id
         |                                 ORDER BY pp.p DESC, pp.lng) AS rn
         |       FROM pp JOIN th ON th.lng = pp.lng WHERE pp.p >= th.t)
         |SELECT lang_true AS lang_label, lng AS lang_conf,
         |       CAST(count(*) AS BIGINT) AS n,
         |       CAST(CASE WHEN lang_true = lng THEN 0 ELSE 1 END AS BIGINT) AS flagged
         |FROM cf WHERE rn = 1
         |GROUP BY lang_true, lng ORDER BY lang_label, lang_conf""".stripMargin
    ) { (s, dir) =>
      val scored = nbScored(s, dir).cache() // max + denominator + probs
      val mx = scored.groupBy("doc_id").agg(max(col("score")).as("s_max"))
      val den = scored.alias("n")
        .join(mx.alias("m"), col("m.doc_id") === col("n.doc_id"))
        .groupBy(col("n.doc_id").as("doc_id"))
        .agg(sum(exp(col("n.score") - col("m.s_max"))).as("z"))
      val pp = scored.alias("n")
        .join(mx.alias("m"), col("m.doc_id") === col("n.doc_id"))
        .join(den.alias("d"), col("d.doc_id") === col("n.doc_id"))
        .select(col("n.doc_id").as("doc_id"), col("n.lang_true").as("lang_true"),
          col("n.lang_pred").as("lng"),
          round(exp(col("n.score") - col("m.s_max")) / col("z"), 6).as("p"))
        .cache() // thresholds + the confident filter
      val th = pp.filter(col("lang_true") === col("lng"))
        .groupBy("lng").agg(round(avg(col("p")), 6).as("t"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("p").desc, col("lng"))
      pp.join(broadcast(th), Seq("lng")).filter(col("p") >= col("t"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy(col("lang_true").as("lang_label"), col("lng").as("lang_conf"))
        .agg(count(lit(1)).as("n"))
        .withColumn("flagged",
          when(col("lang_label") === col("lang_conf"), 0L).otherwise(1L))
        .orderBy("lang_label", "lang_conf")
    },

    // Group-fairness audit (demographic parity and accuracy parity — the
    // standard disaggregated-evaluation pass, e.g. Barocas/Hardt/
    // Narayanan's fairmlbook, public) of the NB classifier across SOURCE
    // groups: per source, accuracy and majority-class prediction rate in
    // exact integer milli, from which the parity gaps read directly
    // (DepthWave9Spec recomputes max−min). Groups come from the join back
    // to documents (the scored frame deliberately does not carry source —
    // the audit is a CONSUMER of the classifier, not part of it). Scale:
    // one window pick + one broadcast-scale equi-join + one grouped count.
    q("q378_fairness_audit",
      "per-source fairness audit of the NB classifier: accuracy + majority-rate milli")(
      s"""WITH $nbScoredCteSql,
         |pick AS (SELECT doc_id, lang_true, lang_pred,
         |                row_number() OVER (PARTITION BY doc_id
         |                                   ORDER BY score DESC, lang_pred) AS rn
         |         FROM nbscored),
         |pr AS (SELECT p.doc_id, p.lang_true, p.lang_pred, d.source
         |       FROM pick p JOIN documents d ON d.doc_id = p.doc_id
         |       WHERE p.rn = 1),
         |mj AS (SELECT lang_pred AS m FROM pr GROUP BY lang_pred
         |       ORDER BY count(*) DESC, lang_pred LIMIT 1)
         |SELECT pr.source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN lang_pred = lang_true THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
         |       CAST(sum(CASE WHEN lang_pred = lang_true THEN 1 ELSE 0 END) * 1000
         |            // count(*) AS BIGINT) AS acc_milli,
         |       CAST(sum(CASE WHEN lang_pred = mj.m THEN 1 ELSE 0 END) AS BIGINT) AS n_majority,
         |       CAST(sum(CASE WHEN lang_pred = mj.m THEN 1 ELSE 0 END) * 1000
         |            // count(*) AS BIGINT) AS majority_milli
         |FROM pr CROSS JOIN mj
         |GROUP BY pr.source ORDER BY pr.source""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("lang_pred"))
      val pick = nbScored(s, dir)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("doc_id", "lang_true", "lang_pred")
      val pr = pick.join(
        Tables(s, dir, "documents").select("doc_id", "source"), Seq("doc_id"))
        .cache() // majority vote + the per-source census
      val mj = pr.groupBy("lang_pred").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("lang_pred")).limit(1)
        .select(col("lang_pred").as("m"))
      pr.crossJoin(broadcast(mj)) // 1-row majority-class frame (allowlisted)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("lang_pred") === col("lang_true"), 1L).otherwise(0L))
            .as("n_correct"),
          sum(when(col("lang_pred") === col("m"), 1L).otherwise(0L))
            .as("n_majority"))
        .select(col("source"), col("n_docs"), col("n_correct"),
          expr("n_correct * 1000 div n_docs").as("acc_milli"),
          col("n_majority"),
          expr("n_majority * 1000 div n_docs").as("majority_milli"))
        .orderBy("source")
    }
  )
}
