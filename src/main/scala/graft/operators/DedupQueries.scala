package graft.operators

import graft.Registry.{Q, q}
import graft.Tables
import graft.functions.MinHashAggregator
import graft.functions.PortableHash._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for LLM training-data pipelines (SURVEY.md §2B
  * B30/B33/B34 + the SimHash / embedding-cosine near-dup ops the north star
  * adds). All hashing is the portable md5-arithmetic of [[PortableHash]] so
  * MinHash/SimHash signatures are verified value-for-value by the DuckDB
  * oracle — not just "some pairs came out".
  *
  * Scale notes (100 TB): every op here is a shuffle-planned groupBy/join on
  * a derived key (hash, shingle, band signature) — no driver-side state. The
  * LSH band join is the scale path for pair generation: candidates per band
  * bucket instead of the all-pairs O(n²) join.
  */
object DedupQueries {

  /** Shared SQL prelude: distinct 3-token shingles per document. */
  private val shingleCte =
    s"""WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
       |sh AS (SELECT DISTINCT doc_id, unnest(${shinglesSql("t", 3)}) AS s FROM toks)""".stripMargin

  /** Spark-side MinHash signatures (doc_id, j, mh) via the one-pass typed
    * aggregator: state = 16 longs per doc, merge = element-wise min → Spark
    * plans partial+final HashAggregate with map-side combine, shuffling one
    * row per doc instead of 16 rows per shingle (the 100 TB shape; proven
    * bit-identical to the SQL formulation in MinHashAggregatorSpec). */
  private def sigDf(sh: DataFrame): DataFrame = {
    val agg = udaf(new MinHashAggregator)
    sh.withColumn("h1", h1(col("s")))
      .groupBy("doc_id").agg(agg(col("h1")).as("sig"))
      .select(col("doc_id"), posexplode(col("sig")))
      .select(col("doc_id"), col("pos").cast("long").as("j"), col("col").as("mh"))
  }

  /** Shared SQL: 16-bit SimHash per doc (bit i set iff the signed sum of
    * distinct-token-hash bit i is positive) — ends with `sig(doc_id, simhash)`. */
  private val simhashCte =
    s"""WITH tok AS (SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS w FROM documents),
       |h AS (SELECT doc_id, ${md5LongSql("w")} AS hv FROM tok),
       |bits AS (SELECT doc_id, i, sum(((hv >> i) & 1) * 2 - 1) AS sgn
       |         FROM h CROSS JOIN range(16) AS r(i) GROUP BY doc_id, i),
       |sig AS (SELECT doc_id,
       |        CAST(sum(CASE WHEN sgn > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash
       |        FROM bits GROUP BY doc_id)""".stripMargin

  /** Shared SQL: same construction widened to the low 32 bits (for the
    * near-dup pair mining, where 16 bits is far too coarse). */
  private[graft] val simhash32Cte = simhashCte
    .replace("range(16)", "range(32)")

  /** Spark twin of [[simhashCte]]: one-pass 64-bit aggregator; the oracle
    * states the low-bits slice, proven identical in SimHashAggregatorSpec. */
  private def simhashSliced(s: org.apache.spark.sql.SparkSession, dir: String,
      mask: Long): DataFrame = {
    val simAgg = udaf(new graft.functions.SimHashAggregator)
    Tables.fanout(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("w")).distinct()
      .withColumn("hv", md5Long(col("w")))
      .groupBy("doc_id").agg(simAgg(col("hv")).as("sh64"))
      .select(col("doc_id"), col("sh64").bitwiseAND(mask).as("simhash"))
  }

  private def simhashDf(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    simhashSliced(s, dir, 0xffffL)

  private def simhashDf32(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    simhashSliced(s, dir, 0xffffffffL)

  /** Shared SQL: MinHash signatures (doc_id, j, mh) from the shingle CTE. */
  private val sigCte =
    s"""$shingleCte,
       |hs AS (SELECT doc_id, ${h1Sql("s")} AS h1 FROM sh),
       |sig AS (SELECT doc_id, j, min((a * h1 + b) % $P) AS mh
       |        FROM hs CROSS JOIN (VALUES ${minhashPermsSql}) AS perm(j, a, b)
       |        GROUP BY doc_id, j)""".stripMargin

  /** DuckDB twin of [[halfJaccardPairs]] (round-11, verdict r10 task 3):
    * the prefix-bounded exact J ≥ ½ pair set over an in-scope
    * `sh(doc_id, key)` DISTINCT element CTE, ending in `truth(d1, d2)`.
    * The raw shared-element self-join oracle is exact but quadratic in a
    * hot element's document frequency — at sf1 it blew the 45-minute
    * replay budget (q189b's closure lost its sf1 row to the same class).
    * The prefix ordering here (df, key) need NOT match Spark's: the
    * prefix-filtering theorem only needs ONE consistent total order per
    * engine, and the verification step makes each engine's final pair set
    * exactly the J ≥ ½ set — so the hash compare still proves exactness,
    * while the replay stays inside budget at every scale. The raw-join
    * formulation remains stated by the smaller consumers (q245/q251/q254
    * at sf0.01/sf0.1), which keeps an algorithm-independent oracle proof
    * of the prefix trick on the books. */
  private def halfJaccardPairsSql(key: String, src: String = "sh"): String =
    s"""dfq AS (SELECT $key, count(*) AS df FROM $src GROUP BY $key),
       |darr AS (SELECT $src.doc_id, list($src.$key ORDER BY dfq.df, $src.$key) AS elems
       |         FROM $src JOIN dfq USING ($key) GROUP BY $src.doc_id),
       |pref AS (SELECT doc_id, unnest(elems[1:(len(elems) // 2 + 1)]) AS $key FROM darr),
       |candp AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |          FROM pref a JOIN pref b ON b.$key = a.$key AND a.doc_id < b.doc_id),
       |truth AS (SELECT d1, d2 FROM candp
       |          JOIN darr ea ON ea.doc_id = candp.d1
       |          JOIN darr eb ON eb.doc_id = candp.d2
       |          WHERE 3 * len(list_intersect(ea.elems, eb.elems))
       |                >= len(ea.elems) + len(eb.elems))""".stripMargin

  /** Shared oracle CTE: connected components over the exact-Jaccard ≥ 0.5
    * edge set (transitive closure via a recursive CTE), ending in
    * `comp(doc_id, component)`. Shingles are 60-bit hashed before the
    * self-join — 8-byte keys, same contract as q34a. */
  private val ccComponentsCte: String =
    s"""WITH RECURSIVE toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
       |sh AS (SELECT doc_id, unnest(list_transform(list_distinct(${shinglesSql("t", 3)}),
       |                               g -> ${md5LongSql("g")})) AS h FROM toks),
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
       |          FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |edges AS (SELECT d1, d2 FROM pairs
       |          JOIN cnt ca ON ca.doc_id = d1 JOIN cnt cb ON cb.doc_id = d2
       |          WHERE c * 1.0 / (ca.n + cb.n - c) >= 0.5),
       |bidir AS (SELECT d1 AS u, d2 AS v FROM edges UNION SELECT d2, d1 FROM edges),
       |verts AS (SELECT DISTINCT u FROM bidir),
       |reach AS (SELECT u, u AS r FROM verts
       |          UNION
       |          SELECT reach.u, bidir.v AS r FROM reach JOIN bidir ON bidir.u = reach.r),
       |comp AS (SELECT u AS doc_id, min(r) AS component FROM reach GROUP BY u)""".stripMargin

  /** Spark twin of [[ccComponentsCte]]: iterative min-label propagation
    * (one shuffle join + aggregate per iteration, iterations ≈ cluster
    * diameter; the GraphFrames approach — at extreme diameters the upgrade
    * is alternating large-star/small-star, same join shape). Returns
    * (doc_id, component). */
  /** The EXACT Jaccard ≥ ½ pair set (d1 < d2, no similarity column) from a
    * DISTINCT (doc_id, `key`) element frame — the shared "truth leg" of the
    * scorecard/contamination/contrastive family, built on q164's AllPairs
    * rarest-half prefix discipline instead of the raw shared-element
    * self-join. The raw join is exact but UNBOUNDED in a hot element's
    * document frequency (one corpus-hot boilerplate shingle makes it
    * quadratic in df); the prefix filter computes the SAME pair set —
    * J ≥ ½ forces |A∩B| ≥ (|A|+|B|)/3, so a qualifying pair must collide
    * inside each side's rarest ⌊n/2⌋+1 elements (Chaudhuri/Ganti/Kaushik
    * SSJoin; Bayardo AllPairs) — while per-key fan-out is bounded by the
    * PREFIX document frequency (measured ≤ 11 at sf1 AND sf10 for q164).
    * Candidates are then verified by array_intersect over the per-doc
    * element arrays (already built for the prefix) under the integer
    * threshold 3·c ≥ n_a + n_b (no float boundary).
    * Exactness is oracle-proven: every consumer's DuckDB oracle states the
    * FULL shared-element join, so a missed pair would hash-mismatch. */
  private[operators] def halfJaccardPairs(sh: DataFrame, key: String): DataFrame = {
    // ONE wide aggregation carries everything: the rarity-ordered element
    // array is both the prefix source (first ⌊n/2⌋+1) and the verification
    // payload (q34c's trick — exact common counts become array_intersect
    // over the few candidates instead of fresh (doc, key) self-joins)
    val dfreq = sh.groupBy(key).agg(count(lit(1)).as("df"))
    val docsArr = sh.join(dfreq, Seq(key))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col(key)))).as("arr"))
      .select(col("doc_id"),
        expr(s"transform(arr, e -> e.$key)").as("elems"))
      .cache() // prefix explode + both candidate-verification joins
    val pref = docsArr
      .select(col("doc_id"),
        explode(expr("slice(elems, 1, size(elems) div 2 + 1)")).as(key))
    val cand = pref.as("a")
      .join(pref.as("b"),
        col(s"a.$key") === col(s"b.$key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).distinct()
    cand
      .join(docsArr.select(col("doc_id").as("d1"), col("elems").as("e1")), "d1")
      .join(docsArr.select(col("doc_id").as("d2"), col("elems").as("e2")), "d2")
      .filter(size(array_intersect(col("e1"), col("e2"))) * 3 >=
        size(col("e1")) + size(col("e2")))
      .select("d1", "d2")
  }

  /** The exact-Jaccard ≥ 0.5 edge set (d1 < d2) — shared by q34g/q34h and
    * by StarContractionSpec's equivalence test. Prefix-bounded via
    * [[halfJaccardPairs]] (3·c ≥ n_a + n_b is the integer form of
    * c/(n_a+n_b−c) ≥ ½ — identical pair set). */
  private[operators] def jaccardEdges(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val toks = Tables.fanout(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("t"))
    // 60-bit-hashed shingle keys, same contract as q34a (8-byte shuffle)
    val sh = toks.select(col("doc_id"),
      explode(transform(array_distinct(shingles(col("t"), 3)),
        g => md5Long(g))).as("h"))
      .cache() // df pass + prefix build + both verification legs
    halfJaccardPairs(sh, "h")
  }

  private def ccComponents(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    // eager checkpoint (q307's shape): the edge plan below the loop is
    // AQE-optimized once and truncated — bidir.cache() alone would compile
    // the whole prefix-join subtree WITHOUT AQE (NOTES.md round-5 lesson)
    val edges = jaccardEdges(s, dir).localCheckpoint(true)
    val bidir = edges
      .union(edges.select(col("d2").as("d1"), col("d1").as("d2"))).cache()
    var labels = bidir.select(col("d1").as("u")).distinct()
      .withColumn("comp", col("u")).cache()
    var converged = false
    while (!converged) {
      // each vertex takes the min of its own and its neighbors' labels;
      // the vertex's own row carries the previous label through the
      // aggregate (max over one non-null) so convergence is read off the
      // SAME aggregation — no separate probe join per iteration
      val prop = bidir.as("e").join(labels.as("l"), col("e.d2") === col("l.u"))
        .select(col("e.d1").as("u"), col("l.comp").as("comp2"),
          lit(null).cast("long").as("old"))
        .union(labels.select(col("u"), col("comp").as("comp2"),
          col("comp").as("old")))
        .groupBy("u").agg(min(col("comp2")).as("comp2"), max(col("old")).as("old"))
        .cache()
      converged = prop.filter(col("comp2") < col("old")).isEmpty
      val old = labels
      labels = prop.select(col("u"), col("comp2").as("comp")).cache()
      old.unpersist()
    }
    labels.select(col("u").as("doc_id"), col("comp").as("component"))
  }

  val all: Seq[Q] = Seq(

    // B30: deterministic exact dedup — keep lowest doc_id per (lang, source)
    // group (the batch twin of streaming dropDuplicates; the streaming variant
    // with watermark state lives in graft.streaming tests).
    q("q30_dedup_first", "B30 keep-first row per (lang, source) group")(
      """SELECT doc_id, lang, source, n_chars FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) = 1
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      // argmin-by-struct instead of a rank window: ONE partial-aggregated
      // hash agg (1 row/group/task crosses the exchange) vs full-shuffling
      // every doc into a per-group sort — doc_id leads the struct, so min
      // picks the keeper row and carries its payload
      Tables(s, dir, "documents")
        .groupBy("lang", "source")
        .agg(min(struct(col("doc_id"), col("n_chars"))).as("sel"))
        .select(col("sel.doc_id").as("doc_id"), col("lang"), col("source"),
          col("sel.n_chars").as("n_chars"))
        .orderBy("doc_id")
    },

    // B33: exact near-dup dedup via normalization + content hash. Keeper is
    // min(doc_id) per normalized-text hash; group size counts duplicates.
    q("q33_dedup_exact_hash", "B33 normalize→md5 content-hash dedup groups")(
      """SELECT md5(norm) AS h, min(doc_id) AS keeper, count(*) AS n
        |FROM (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        |      FROM documents)
        |GROUP BY h ORDER BY keeper""".stripMargin
    ) { (s, dir) =>
      Tables.fanout(s, dir, "documents")
        .select(col("doc_id"),
          trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("norm"))
        .groupBy(md5(col("norm")).as("h"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
        .orderBy("keeper")
    },

    // B34: exact n-gram Jaccard near-dup pairs (the ground truth MinHash
    // approximates). Shingles are 60-bit-hashed BEFORE the self-join so the
    // shuffle carries 8-byte keys, never shingle text (both engines hash
    // with the same md5 arithmetic, so any collision is shared and the
    // counts stay identical).
    q("q34a_jaccard_pairs", "B34 exact 3-shingle Jaccard near-dup pairs (≥0.5)")(
      s"""WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
         |sh AS (SELECT doc_id, unnest(list_transform(list_distinct(${shinglesSql("t", 3)}),
         |                               g -> ${md5LongSql("g")})) AS h FROM toks),
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
         |          FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT d1, d2, round(c * 1.0 / (ca.n + cb.n - c), 4) AS jac
         |FROM pairs JOIN cnt ca ON ca.doc_id = d1 JOIN cnt cb ON cb.doc_id = d2
         |WHERE c * 1.0 / (ca.n + cb.n - c) >= 0.5
         |ORDER BY d1, d2""".stripMargin
    ) { (s, dir) =>
      val toks = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("t"))
      val sh = toks.select(col("doc_id"),
        explode(transform(array_distinct(shingles(col("t"), 3)),
          g => md5Long(g))).as("h"))
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val pairs = sh.as("a")
        .join(sh.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("c"))
      pairs
        .join(cnt.select(col("doc_id").as("d1"), col("n").as("na")), "d1")
        .join(cnt.select(col("doc_id").as("d2"), col("n").as("nb")), "d2")
        .withColumn("jac_raw", col("c") * lit(1.0) / (col("na") + col("nb") - col("c")))
        .filter(col("jac_raw") >= 0.5)
        .select(col("d1"), col("d2"), round(col("jac_raw"), 4).as("jac"))
        .orderBy("d1", "d2")
    },

    // Prefix-filtered set-similarity join — the AllPairs/PPJoin candidate
    // rule next to q34a's full-inverted-index join and q34c's MinHash-LSH:
    // order each doc's shingle set by GLOBAL rarity (df, then hash — a
    // total order), and join only on each doc's first n - ⌈t·n⌉ + 1
    // elements (t = 0.5 ⇒ n div 2 + 1). The prefix-filtering theorem
    // (Chaudhuri/Ganti/Kaushik SSJoin; Bayardo AllPairs) guarantees any
    // pair with J ≥ t shares a PREFIX element, so recall is exactly 1 —
    // and the oracle is the FULL join, which would hash-mismatch on any
    // missed pair. Scale lever: candidate volume is Σ df² over PREFIX
    // occurrences only, and prefixes hold each doc's RAREST shingles — the
    // hot stopword-like keys that dominate the full join's Σ df² never
    // enter the candidate join (DedupPlanSpec measures the pruning).
    // Exact Jaccard then verifies candidates via (doc, hash)-keyed joins.
    q("q164_prefix_filter_join",
      "AllPairs prefix-filtered exact Jaccard join (≥ 0.5): rarest-shingle candidates")(
      s"""WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
         |sh AS (SELECT doc_id, unnest(list_transform(list_distinct(${shinglesSql("t", 3)}),
         |                               g -> ${md5LongSql("g")})) AS h FROM toks),
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
         |          FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT d1, d2, round(c * 1.0 / (ca.n + cb.n - c), 4) AS jac
         |FROM pairs JOIN cnt ca ON ca.doc_id = d1 JOIN cnt cb ON cb.doc_id = d2
         |WHERE c * 1.0 / (ca.n + cb.n - c) >= 0.5
         |ORDER BY d1, d2""".stripMargin
    ) { (s, dir) =>
      val toks = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("t"))
      val shBase = toks.select(col("doc_id"),
        explode(transform(array_distinct(shingles(col("t"), 3)),
          g => md5Long(g))).as("h"))
      // Working-set lever (SCALE.md round-9 sf10 forensics): the 5-consumer
      // cached shingle frame is the right default on a CLUSTER (per-executor
      // working set stays constant as executors scale with data), but on a
      // single box at sf10 the ~26M-row cache blows the memory hierarchy —
      // setting SPARK_GRAFT_SHINGLE_RECOMPUTE=1 drops the cache and re-runs
      // the map-only shingle pass per consumer (trades CPU for working set)
      val sh =
        if (sys.env.get("SPARK_GRAFT_SHINGLE_RECOMPUTE").contains("1")) shBase
        else shBase.cache() // df pass + prefix build + both verification legs
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
      val pref = sh.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("arr"))
        .select(col("doc_id"),
          explode(expr("slice(arr, 1, size(arr) div 2 + 1)")).as("e"))
        .select(col("doc_id"), col("e.h").as("h"))
      val cand = pref.as("a")
        .join(pref.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).distinct()
      val c = cand
        .join(sh.select(col("doc_id").as("d1"), col("h")), "d1")
        .join(sh.select(col("doc_id").as("d2"), col("h")), Seq("d2", "h"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("c"))
      c.join(cnt.select(col("doc_id").as("d1"), col("n").as("na")), "d1")
        .join(cnt.select(col("doc_id").as("d2"), col("n").as("nb")), "d2")
        .withColumn("jac_raw", col("c") * lit(1.0) / (col("na") + col("nb") - col("c")))
        .filter(col("jac_raw") >= 0.5)
        .select(col("d1"), col("d2"), round(col("jac_raw"), 4).as("jac"))
        .orderBy("d1", "d2")
    },

    // B34: MinHash signatures — 16 portable arithmetic permutations over
    // shingle hashes, value-checked against the oracle (not just candidates).
    q("q34b_minhash_signatures", "B34 16-permutation MinHash signatures per doc")(
      s"""$sigCte
         |SELECT doc_id, CAST(j AS BIGINT) AS j, mh FROM sig ORDER BY doc_id, j""".stripMargin
    ) { (s, dir) =>
      val toks = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("t"))
      val sh = toks.select(col("doc_id"), explode(shingles(col("t"), 3)).as("s")).distinct()
      sigDf(sh).orderBy("doc_id", "j")
    },

    // B34: MinHash-LSH banding — 4 bands × 4 rows; candidate pairs share a
    // band signature; each candidate carries estimated (signature-agreement)
    // and exact Jaccard. This is the O(n·b) scale path for near-dup mining.
    q("q34c_minhash_lsh_pairs", "B34 LSH band candidates w/ estimated + exact Jaccard")(
      s"""$sigCte,
         |bands AS (SELECT doc_id, j // 4 AS band,
         |                 string_agg(mh, ',' ORDER BY j) AS bsig
         |          FROM sig GROUP BY doc_id, j // 4),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
         |est AS (SELECT cand.d1, cand.d2,
         |               sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) * 1.0 / 16 AS est
         |        FROM cand JOIN sig sa ON sa.doc_id = cand.d1
         |                  JOIN sig sb ON sb.doc_id = cand.d2 AND sb.j = sa.j
         |        GROUP BY cand.d1, cand.d2),
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |common AS (SELECT e.d1, e.d2, count(*) AS c
         |           FROM est e JOIN sh a ON a.doc_id = e.d1
         |                      JOIN sh b ON b.doc_id = e.d2 AND b.s = a.s
         |           GROUP BY e.d1, e.d2)
         |SELECT est.d1 AS d1, est.d2 AS d2, round(est.est, 4) AS est,
         |       round(common.c * 1.0 / (ca.n + cb.n - common.c), 4) AS jac
         |FROM est JOIN common ON common.d1 = est.d1 AND common.d2 = est.d2
         |         JOIN cnt ca ON ca.doc_id = est.d1
         |         JOIN cnt cb ON cb.doc_id = est.d2
         |ORDER BY est.d1, est.d2""".stripMargin
    ) { (s, dir) =>
      // One aggregation per doc carries everything verification needs — the
      // 16-minima signature, the distinct-shingle set, and its size — so the
      // estimated- and exact-Jaccard stages become array ops (zip_with /
      // array_intersect) over the few band-join candidates instead of fresh
      // shingle self-joins: 1 wide shuffle + 1 band join + 2 candidate
      // equi-joins total (was 6 joins + 3 aggs).
      val agg = udaf(new MinHashAggregator)
      val toks = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("t"))
      val sh = toks.select(col("doc_id"), explode(shingles(col("t"), 3)).as("s")).distinct()
      val docs = sh.withColumn("h1v", h1(col("s")))
        .groupBy("doc_id")
        .agg(agg(col("h1v")).as("sig"), collect_set(col("s")).as("shs"),
          count(lit(1)).as("n"))
        .cache() // reused by banding and both candidate-side lookups
      val bands = docs.select(col("doc_id"), explode(array((0 until 4).map(b =>
        struct(lit(b.toLong).as("band"),
          concat_ws(",", (0 until 4).map(k =>
            element_at(col("sig"), b * 4 + k + 1).cast("string")): _*).as("bsig"))): _*)).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bsig").as("bsig"))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).distinct()
      cand
        .join(docs.select(col("doc_id").as("d1"), col("sig").as("siga"),
          col("shs").as("sha"), col("n").as("na")), "d1")
        .join(docs.select(col("doc_id").as("d2"), col("sig").as("sigb"),
          col("shs").as("shb"), col("n").as("nb")), "d2")
        .withColumn("agree", aggregate(
          zip_with(col("siga"), col("sigb"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), _ + _))
        .withColumn("c", size(array_intersect(col("sha"), col("shb"))).cast("long"))
        .select(col("d1"), col("d2"),
          round(col("agree") * lit(1.0) / 16, 4).as("est"),
          round(col("c") * lit(1.0) / (col("na") + col("nb") - col("c")), 4).as("jac"))
        .orderBy("d1", "d2")
    },

    // SimHash (north-star dedup family): 16-bit portable simhash over distinct
    // tokens — bit i set iff the signed sum of token-hash bit i is positive.
    q("q34d_simhash", "SimHash-16 document signatures (portable arithmetic)")(
      s"""$simhashCte
         |SELECT doc_id, simhash FROM sig ORDER BY doc_id""".stripMargin
    )((s, dir) => simhashDf(s, dir).orderBy("doc_id")),

    // SimHash near-dup mining (the operator the signatures exist for),
    // group-level: docs are first collapsed to exact-signature GROUPS
    // (linear in corpus size — the duplicate-heavy fixture collapses 500
    // docs to 347 groups), then groups within Hamming ≤ 1 pair up via a
    // 4×8-bit band equi-join (pigeonhole: distance ≤ 3 guarantees a shared
    // band, so radius 1 is fully covered). Doc-level pairs would be
    // quadratic in duplicate-group size — THE output-volume trap of
    // simhash dedup at 100 TB; group-level keeps both candidates and
    // output linear. 32-bit slice of the 64-bit aggregator (16 bits is too
    // coarse on a shared-vocabulary corpus: 37% of random pairs collide).
    q("q34f_simhash_pairs",
      "SimHash near-dup signature-group pairs (banded, Hamming ≤ 1, 32-bit)")(
      s"""$simhash32Cte,
         |grp AS (SELECT simhash, min(doc_id) AS keeper, count(*) AS n
         |        FROM sig GROUP BY simhash),
         |bands AS (SELECT simhash, b, (simhash >> (b * 8)) & 255 AS bv
         |          FROM grp CROSS JOIN range(4) AS r(b)),
         |cand AS (SELECT DISTINCT a.simhash AS sa, b.simhash AS sb
         |         FROM bands a JOIN bands b
         |           ON a.b = b.b AND a.bv = b.bv AND a.simhash < b.simhash)
         |SELECT ga.keeper AS d1, gb.keeper AS d2, ga.n AS n1, gb.n AS n2,
         |       CAST(bit_count(xor(sa, sb)) AS BIGINT) AS dist
         |FROM cand JOIN grp ga ON ga.simhash = sa
         |          JOIN grp gb ON gb.simhash = sb
         |WHERE bit_count(xor(sa, sb)) <= 1
         |ORDER BY d1, d2""".stripMargin
    ) { (s, dir) =>
      val grp = simhashDf32(s, dir)
        .groupBy("simhash").agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
        .cache() // one signature row per group; consumed by bands + both lookups
      val bands = grp.select(col("simhash"), explode(array((0 until 4).map(b =>
        struct(lit(b.toLong).as("b"),
          shiftright(col("simhash"), b * 8).bitwiseAND(255L).as("bv"))): _*)).as("bb"))
        .select(col("simhash"), col("bb.b").as("b"), col("bb.bv").as("bv"))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.b") === col("b.b") && col("a.bv") === col("b.bv")
            && col("a.simhash") < col("b.simhash"))
        .select(col("a.simhash").as("sa"), col("b.simhash").as("sb")).distinct()
      cand
        .join(grp.select(col("simhash").as("sa"), col("keeper").as("d1"), col("n").as("n1")), "sa")
        .join(grp.select(col("simhash").as("sb"), col("keeper").as("d2"), col("n").as("n2")), "sb")
        .withColumn("dist", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
        .filter(col("dist") <= 1)
        .select(col("d1"), col("d2"), col("n1"), col("n2"), col("dist"))
        .orderBy("d1", "d2")
    },

    // Dedup CLUSTERING — the step every near-dup pipeline ends with: fold
    // pairwise matches into connected components so each cluster keeps one
    // canonical doc. Spark side is iterative min-label propagation (the
    // canonical distributed CC pattern: each iteration is ONE shuffle join
    // + aggregate, iterations ≈ cluster diameter, convergence checked with
    // an isEmpty probe — the GraphFrames approach; at extreme diameters the
    // upgrade is the alternating large-star/small-star algorithm, same join
    // shape). Oracle is the transitive closure via a recursive CTE. Edges =
    // the exact-Jaccard ≥ 0.5 pairs of q34a.
    q("q34g_dedup_components", "near-dup clusters: connected components over Jaccard ≥ 0.5 edges")(
      s"""$ccComponentsCte
         |SELECT doc_id, component FROM comp ORDER BY doc_id""".stripMargin
    )((s, dir) => ccComponents(s, dir).orderBy("doc_id")),

    // Canonical-doc selection — the decision a dedup pipeline actually
    // ships: per near-dup cluster, KEEP the longest doc (n_chars, tie →
    // lowest doc_id) and count the copies dropped. One window over the
    // component key on top of q34g's clusters; the documents join brings
    // only (doc_id, n_chars) — 16-byte rows at any scale.
    q("q34h_canonical_keep",
      "per near-dup cluster: keep the longest doc, count dropped copies")(
      s"""$ccComponentsCte,
         |m AS (SELECT c.component, c.doc_id, d.n_chars,
         |             row_number() OVER (PARTITION BY c.component
         |                                ORDER BY d.n_chars DESC, c.doc_id) AS rn,
         |             count(*) OVER (PARTITION BY c.component) AS n_docs
         |      FROM comp c JOIN documents d USING (doc_id))
         |SELECT component, doc_id AS keeper, n_chars AS keeper_chars,
         |       CAST(n_docs - 1 AS BIGINT) AS n_dropped
         |FROM m WHERE rn = 1 ORDER BY component""".stripMargin
    ) { (s, dir) =>
      val comp = ccComponents(s, dir)
      val chars = Tables(s, dir, "documents").select("doc_id", "n_chars")
      // one partial-aggregated hash agg carries BOTH the per-cluster count
      // and the keeper (argmin over (-n_chars, doc_id) = longest, tie →
      // lowest id) — replaces two window passes over the clustered frame
      comp.join(chars, "doc_id")
        .groupBy("component")
        .agg(count(lit(1)).as("n_docs"),
          min(struct((-col("n_chars")).as("nc"), col("doc_id").as("k"))).as("sel"))
        .select(col("component"), col("sel.k").as("keeper"),
          (-col("sel.nc")).as("keeper_chars"),
          (col("n_docs") - 1).cast("long").as("n_dropped"))
        .orderBy("component")
    },

    // Deterministic train/val/test split — the assignment every training
    // pipeline needs: bucket = portable content hash mod 100, split on
    // fixed thresholds (80/10/10). Hash-based (not random) so membership
    // is stable under reruns, repartitions, and incremental appends.
    q("q50_train_split", "deterministic 80/10/10 train/val/test split by content hash")(
      s"""SELECT doc_id,
         |       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
         |FROM (SELECT doc_id, ${md5LongSql("text")} % 100 AS b FROM documents)
         |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), (md5Long(col("text")) % 100).as("b"))
        .select(col("doc_id"),
          when(col("b") < 80, "train").when(col("b") < 90, "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    },

    // Domain mixing / balancing — cap documents per (lang, source) domain,
    // selecting by deterministic hash order (not arrival order): the
    // standard way a training pipeline bounds any one domain's share while
    // keeping the selection stable under reruns and repartitions. One
    // window over the domain key — partial sort within partitions, no
    // driver state.
    q("q51_domain_cap", "cap 3 docs per (lang, source) domain by content-hash order")(
      s"""SELECT doc_id, lang, source FROM (
         |  SELECT doc_id, lang, source,
         |         row_number() OVER (PARTITION BY lang, source
         |                            ORDER BY ${md5LongSql("text")}, doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= 3 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      // native TopKPerKeyExec: ≤ 3 rows/domain/task cross the exchange vs
      // a rank window full-shuffling every doc into a per-domain sort
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          md5Long(col("text")).as("hk"))
      graft.plans.TopKPerKey.topK(d, Seq(col("lang"), col("source")),
          Seq(col("hk"), col("doc_id")), 3)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // Embedding-cosine near-dup pairs (north-star dedup family). Double-cast
    // dot products are bit-identical across engines (verified empirically),
    // so the 0.9 threshold is stable.
    //
    // Scale shape: candidates come from the same random-hyperplane LSH
    // buckets q35b assigns, probed to Hamming ≤ 2 (multi-probe), then exact
    // cosine only on bucket-colliding pairs — an equi-join on bucket id, not
    // the all-pairs product. The oracle mirrors the candidate filter
    // (bit_count(xor(bucket,bucket)) ≤ 2 ≡ the Hamming-2 probe ball), so the
    // verification contract is exact at ANY fixture/sf and does not lean on
    // probe-ball recall being 1.0 here; recall vs the exact all-pairs ground
    // truth is pinned separately in ApproxAndRecallSpec and SCALE.md.
    q("q34e_embedding_neardup", "embedding-cosine near-dup pairs (cos ≥ 0.9) via LSH candidates")(
      s"""${VectorQueries.bucketCte},
        |n AS (SELECT vec_id, sqrt(list_dot_product(e, e)) AS nrm FROM v)
        |SELECT a.vec_id AS v1, b.vec_id AS v2,
        |       round(list_dot_product(a.e, b.e) / (na.nrm * nb.nrm), 4) AS cos
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |         JOIN n na ON na.vec_id = a.vec_id
        |         JOIN n nb ON nb.vec_id = b.vec_id
        |         JOIN bk ba ON ba.vec_id = a.vec_id
        |         JOIN bk bb ON bb.vec_id = b.vec_id
        |WHERE list_dot_product(a.e, b.e) / (na.nrm * nb.nrm) >= 0.9
        |  AND bit_count(xor(ba.bucket, bb.bucket)) <= 2
        |ORDER BY v1, v2""".stripMargin
    ) { (s, dir) =>
      val masks = VectorQueries.probeMasks(2)
      val v = VectorQueries.withBucket(
        VectorQueries.withNorm(Tables.fanout(s, dir, "embeddings")))
      // each probe bucket is distinct per v1 and each v2 has one bucket, so a
      // pair matches at most once — no dedup step needed
      val a = v.select(col("vec_id").as("v1"), col("e").as("ea"),
          col("nrm").as("nrma"), col("bucket"))
        .withColumn("pb", explode(array(
          masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)))
      val b = v.select(col("vec_id").as("v2"), col("e").as("eb"),
        col("nrm").as("nrmb"), col("bucket").as("cb"))
      a.join(b, col("pb") === col("cb") && col("v1") < col("v2"))
        .withColumn("cos_raw",
          VectorQueries.dot(col("ea"), col("eb")) / (col("nrma") * col("nrmb")))
        .filter(col("cos_raw") >= 0.9)
        .select(col("v1"), col("v2"), round(col("cos_raw"), 4).as("cos"))
        .orderBy("v1", "v2")
    },

    // Fuzzy join by deletion neighborhood — edit-distance-1 candidate pairs
    // WITHOUT an all-pairs product: each string expands to its |s|+1
    // single-deletion variants (plus itself), candidates are an EQUI-join on
    // the variant, and exact levenshtein filters survivors (FastSS family).
    // The variant join runs over DISTINCT names, never raw rows — duplicate
    // name multiplicity m would otherwise inflate every variant bucket m×
    // and the join m² (measured: the raw-row formulation's oracle needed a
    // 900 s retry at sf1, where the fixture carries m=10 verbatim copies;
    // the distinct-name form is duplicate-invariant — the same Σ block²
    // lesson as q364b). Matched NAME pairs then map back to custkey pairs
    // through two equi-joins, exactly reproducing the per-row output.
    q("q92_fuzzy_join", "edit-distance-1 name pairs via deletion-variant equi-join")(
      """WITH names AS (SELECT DISTINCT c_name AS n FROM customer),
        |var AS (
        |  SELECT n, unnest(
        |    list_append(list_transform(generate_series(1, length(n)),
        |      i -> substr(n, 1, i-1) || substr(n, i+1)), n)) AS v
        |  FROM names),
        |np AS (
        |  SELECT na, nb FROM (
        |    SELECT DISTINCT a.n AS na, b.n AS nb
        |    FROM var a JOIN var b ON a.v = b.v AND a.n < b.n)
        |  WHERE levenshtein(na, nb) = 1),
        |pairs AS (
        |  SELECT least(x.c_custkey, y.c_custkey) AS k1,
        |         greatest(x.c_custkey, y.c_custkey) AS k2,
        |         CASE WHEN x.c_custkey < y.c_custkey THEN x.c_name ELSE y.c_name END AS n1,
        |         CASE WHEN x.c_custkey < y.c_custkey THEN y.c_name ELSE x.c_name END AS n2
        |  FROM np JOIN customer x ON x.c_name = np.na
        |          JOIN customer y ON y.c_name = np.nb)
        |SELECT k1, k2, n1, n2 FROM pairs
        |ORDER BY k1, k2 LIMIT 100""".stripMargin
    ) { (s, dir) =>
      val cust = Tables(s, dir, "customer")
      val vr = Tables.fanout(s, dir, "customer")
        .select(col("c_name").as("n")).distinct()
        .select(col("n"),
          explode(array_append(
            transform(sequence(lit(1), length(col("n"))),
              i => concat(col("n").substr(lit(1), i - 1),
                col("n").substr(i + 1, length(col("n"))))),
            col("n"))).as("v"))
        .cache() // both sides of the self-join
      val np = vr.select(col("n").as("na"), col("v"))
        .join(vr.select(col("n").as("nb"), col("v")), Seq("v"))
        .filter(col("na") < col("nb"))
        .select("na", "nb").distinct()
        .filter(levenshtein(col("na"), col("nb")) === 1)
      np.join(cust.select(col("c_custkey").as("ka"), col("c_name").as("na")), "na")
        .join(cust.select(col("c_custkey").as("kb"), col("c_name").as("nb")), "nb")
        .select(least(col("ka"), col("kb")).as("k1"),
          greatest(col("ka"), col("kb")).as("k2"),
          when(col("ka") < col("kb"), col("na")).otherwise(col("nb")).as("n1"),
          when(col("ka") < col("kb"), col("nb")).otherwise(col("na")).as("n2"))
        .orderBy("k1", "k2").limit(100)
    },

    // Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the
    // MOSS algorithm): hash every positional 3-token gram, slide a window
    // of w=4 consecutive gram hashes per document, and keep each window's
    // MINIMUM hash — the selected set is a ~2/(w+1)-density fingerprint
    // with the winnowing guarantee that any shared run of ≥ w+k-1 = 6
    // tokens yields at least one shared fingerprint. Distinct from MinHash
    // (q34b: global per-doc sketch, no positional guarantee) and from q61
    // (every position, no compression): winnowing is the standard
    // plagiarism / near-dup signal that scales the q61 idea down to ~25%
    // of the positions. Pair mining joins on the fingerprint VALUE with a
    // doc-frequency cap (≤20 docs) so ubiquitous fingerprints — stopword
    // runs — never enter the join: the bucket fanout is ≤ C(20,2) per
    // fingerprint, the winnowing twin of q34c's band-bucket bound. Scale
    // shape: per-doc windows (partitioned by doc_id — never global), all
    // shuffles carry 8-byte hashes, never text.
    q("q219_winnow_fingerprints",
      "winnowing (MOSS) fingerprint pairs: per-window min gram-hash, df-capped join")(
      s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
         |pos AS (SELECT doc_id,
         |               unnest(generate_series(0, len(w) - 3)) AS p,
         |               unnest(${shinglesSql("w", 3)}) AS g
         |        FROM t WHERE len(w) >= 3),
         |gh AS (SELECT doc_id, p, ${md5LongSql("g")} AS hv FROM pos),
         |win AS (SELECT doc_id, p,
         |               min(hv) OVER (PARTITION BY doc_id ORDER BY p
         |                             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
         |        FROM gh),
         |fps AS (SELECT DISTINCT doc_id, fp FROM win WHERE p >= 3),
         |df AS (SELECT fp, count(*) AS nd FROM fps GROUP BY fp),
         |rare AS (SELECT f.doc_id, f.fp FROM fps f JOIN df USING (fp) WHERE nd <= 20),
         |cnt AS (SELECT doc_id, count(*) AS nf FROM rare GROUP BY doc_id),
         |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
         |          FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id)
         |SELECT p.da, p.db, CAST(p.shared AS BIGINT) AS shared,
         |       CAST(p.shared * 1000 // least(ca.nf, cb.nf) AS BIGINT) AS overlap_milli
         |FROM pairs p JOIN cnt ca ON ca.doc_id = p.da
         |             JOIN cnt cb ON cb.doc_id = p.db
         |WHERE p.shared >= 5
         |ORDER BY da, db""".stripMargin
    ) { (s, dir) =>
      val t = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("w"))
        .filter(size(col("w")) >= 3)
      // positional gram hashes: hashed BEFORE the explode so only 8-byte
      // values ever shuffle (q61's discipline)
      val gh = t.select(col("doc_id"),
        posexplode(transform(shingles(col("w"), 3), g => md5Long(g))))
        .withColumnRenamed("pos", "p").withColumnRenamed("col", "hv")
      val wWin = Window.partitionBy(col("doc_id")).orderBy(col("p"))
        .rowsBetween(-3, 0)
      val fps = gh
        .withColumn("fp", min(col("hv")).over(wWin))
        .filter(col("p") >= 3)
        .select(col("doc_id"), col("fp")).distinct()
        .cache() // df cap + both join sides + per-doc counts
      val dfreq = fps.groupBy("fp").agg(count(lit(1)).as("nd"))
      val rare = fps.join(dfreq.filter(col("nd") <= 20), Seq("fp"))
        .select("doc_id", "fp")
      val cnt = rare.groupBy("doc_id").agg(count(lit(1)).as("nf"))
      val pairs = rare.select(col("doc_id").as("da"), col("fp"))
        .join(rare.select(col("doc_id").as("db"), col("fp")), Seq("fp"))
        .filter(col("da") < col("db"))
        .groupBy("da", "db").agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 5)
      pairs
        .join(cnt.select(col("doc_id").as("da"), col("nf").as("na")), Seq("da"))
        .join(cnt.select(col("doc_id").as("db"), col("nf").as("nb")), Seq("db"))
        .select(col("da"), col("db"), col("shared").cast("long").as("shared"),
          expr("shared * 1000 div least(na, nb)").cast("long").as("overlap_milli"))
        .orderBy("da", "db")
    },

    // LSH dedup quality scorecard — q227's ANN-recall discipline applied
    // to the MinHash family: precision AND recall of the q34c band-join
    // candidates against the EXACT Jaccard ≥ 0.5 pair set, as one
    // oracle-checked query. The truth leg is the AllPairs rarest-half
    // prefix join ([[halfJaccardPairs]], q164's discipline — bounded by
    // PREFIX document frequency, so one corpus-hot boilerplate shingle
    // can't go quadratic) with the threshold kept in integers (J ≥ ½ ⇔
    // 3·common ≥ n_a + n_b — no float boundary flips); the candidate leg
    // is q34c's 4×4 banding verbatim. These two numbers ARE the (bands × rows) tuning loop a
    // 100 TB dedup runs: recall tells you what the bands miss, precision
    // what the verifier must re-check — computed by the engine itself,
    // hash-verified against the oracle.
    q("q245_lsh_scorecard",
      "precision/recall of MinHash LSH band candidates vs exact Jaccard≥0.5 truth")(
      s"""$sigCte,
         |bands AS (SELECT doc_id, j // 4 AS band,
         |                 string_agg(mh, ',' ORDER BY j) AS bsig
         |          FROM sig GROUP BY doc_id, j // 4),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
         |           FROM sh a JOIN sh b ON b.s = a.s AND a.doc_id < b.doc_id
         |           GROUP BY a.doc_id, b.doc_id),
         |truth AS (SELECT d1, d2 FROM common
         |          JOIN cnt ca ON ca.doc_id = d1 JOIN cnt cb ON cb.doc_id = d2
         |          WHERE 3 * c >= ca.n + cb.n),
         |m AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
         |             (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_cand,
         |             (SELECT CAST(count(*) AS BIGINT)
         |              FROM cand JOIN truth USING (d1, d2)) AS n_hit)
         |SELECT n_truth, n_cand, n_hit,
         |       CAST(n_hit * 1000 // greatest(n_truth, 1) AS BIGINT) AS recall_milli,
         |       CAST(n_hit * 1000 // greatest(n_cand, 1) AS BIGINT) AS precision_milli
         |FROM m""".stripMargin
    ) { (s, dir) =>
      val agg = udaf(new MinHashAggregator)
      val toks = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("t"))
      val sh = toks.select(col("doc_id"), explode(shingles(col("t"), 3)).as("s")).distinct()
        .cache() // signature agg + prefix truth leg (df pass, prefix, verify joins)
      val docs = sh.withColumn("h1v", h1(col("s")))
        .groupBy("doc_id").agg(agg(col("h1v")).as("sig"))
      val bands = docs.select(col("doc_id"), explode(array((0 until 4).map(b =>
        struct(lit(b.toLong).as("band"),
          concat_ws(",", (0 until 4).map(k =>
            element_at(col("sig"), b * 4 + k + 1).cast("string")): _*).as("bsig"))): _*)).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bsig").as("bsig"))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).distinct()
      // exact truth leg, prefix-bounded (halfJaccardPairs): same pair set
      // as the oracle's full shared-shingle join, hot-shingle-safe
      val truth = halfJaccardPairs(sh, "s")
      val nTruth = truth.agg(count(lit(1)).as("n_truth"))
      val nCand = cand.agg(count(lit(1)).as("n_cand"))
      val nHit = cand.join(truth, Seq("d1", "d2")).agg(count(lit(1)).as("n_hit"))
      nTruth.crossJoin(broadcast(nCand)).crossJoin(broadcast(nHit))
        .select(col("n_truth"), col("n_cand"), col("n_hit"),
          expr("CAST(n_hit * 1000 div greatest(n_truth, 1) AS BIGINT)").as("recall_milli"),
          expr("CAST(n_hit * 1000 div greatest(n_cand, 1) AS BIGINT)").as("precision_milli"))
    },

    // LSH tuning curve — the (bands × rows) S-curve a 100 TB dedup is
    // actually tuned with, computed by the engine itself: for EVERY
    // 16-permutation banding (2×8, 4×4, 8×2, 16×1), candidate recall AND
    // precision against the SAME exact J ≥ ½ truth (the prefix-bounded
    // [[halfJaccardPairs]]). One signature aggregation and ONE band
    // self-join cover all four bandings — the config id rides the join
    // key, so adding a banding adds rows to a bounded-bucket equi-join,
    // never a new pass over the corpus. Reading the curve: more, shorter
    // bands → recall rises toward 1 and precision falls — q245 gives one
    // operating point, this query gives the dial. All counts exact,
    // hash-verified.
    q("q383_lsh_tuning_curve",
      "recall/precision of every 16-perm LSH banding (2x8,4x4,8x2,16x1) vs exact J>=0.5 truth")(
      s"""$sigCte,
         |cfg AS (SELECT * FROM (VALUES (2, 8), (4, 4), (8, 2), (16, 1)) AS c(b, r)),
         |bands AS (SELECT c.b AS cfg, s.doc_id, s.j // c.r AS band,
         |                 string_agg(s.mh, ',' ORDER BY s.j) AS bsig
         |          FROM sig s CROSS JOIN cfg c GROUP BY c.b, s.doc_id, s.j // c.r),
         |cand AS (SELECT DISTINCT a.cfg, a.doc_id AS d1, b.doc_id AS d2
         |         FROM bands a JOIN bands b ON a.cfg = b.cfg AND a.band = b.band
         |           AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
         |shh AS (SELECT doc_id, ${md5LongSql("s")} AS h FROM sh),
         |${halfJaccardPairsSql("h", "shh")},
         |tn AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
         |cn AS (SELECT cfg, CAST(count(*) AS BIGINT) AS n_cand FROM cand GROUP BY cfg),
         |hn AS (SELECT cfg, CAST(count(*) AS BIGINT) AS n_hit
         |       FROM cand JOIN truth USING (d1, d2) GROUP BY cfg)
         |SELECT CAST(c.b AS BIGINT) AS n_bands, CAST(c.r AS BIGINT) AS rows_per_band,
         |       tn.n_truth, coalesce(cn.n_cand, 0) AS n_cand,
         |       coalesce(hn.n_hit, 0) AS n_hit,
         |       CAST(coalesce(hn.n_hit, 0) * 1000 // greatest(tn.n_truth, 1) AS BIGINT)
         |         AS recall_milli,
         |       CAST(coalesce(hn.n_hit, 0) * 1000 // greatest(coalesce(cn.n_cand, 0), 1)
         |            AS BIGINT) AS precision_milli
         |FROM cfg c CROSS JOIN tn
         |LEFT JOIN cn ON cn.cfg = c.b LEFT JOIN hn ON hn.cfg = c.b
         |ORDER BY n_bands""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val agg = udaf(new MinHashAggregator)
      val toks = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("t"))
      val sh = toks.select(col("doc_id"), explode(shingles(col("t"), 3)).as("s")).distinct()
        .cache() // signature agg + prefix truth leg
      val docs = sh.withColumn("h1v", h1(col("s")))
        .groupBy("doc_id").agg(agg(col("h1v")).as("sig"))
      val cfgs = Seq((2, 8), (4, 4), (8, 2), (16, 1))
      val bandCols = cfgs.flatMap { case (b, r) =>
        (0 until b).map(band => struct(lit(b.toLong).as("cfg"),
          lit(band.toLong).as("band"),
          concat_ws(",", (0 until r).map(k =>
            element_at(col("sig"), band * r + k + 1).cast("string")): _*).as("bsig")))
      }
      val bands = docs.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
        .select(col("doc_id"), col("bb.cfg").as("cfg"), col("bb.band").as("band"),
          col("bb.bsig").as("bsig"))
      val cand = bands.as("a")
        .join(bands.as("b"), col("a.cfg") === col("b.cfg")
          && col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig")
          && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.cfg").as("cfg"), col("a.doc_id").as("d1"),
          col("b.doc_id").as("d2"))
        .distinct()
        .cache() // per-config candidate counts + truth-hit counts
      // round-11: truth Jaccard runs over 60-bit-hashed shingle keys on
      // BOTH sides (q34a's contract, already the jaccardEdges discipline)
      // — 8-byte keys instead of ~30-byte strings through the df pass,
      // the rarity-sorted array build, and the intersect verification;
      // the sf1 oracle truth leg alone read 394 s on strings
      val truth = halfJaccardPairs(
        sh.select(col("doc_id"), md5Long(col("s")).as("h")), "h")
      val tn = truth.agg(count(lit(1)).as("n_truth"))
      val cn = cand.groupBy("cfg").agg(count(lit(1)).as("n_cand"))
      val hn = cand.join(truth, Seq("d1", "d2"))
        .groupBy("cfg").agg(count(lit(1)).as("n_hit"))
      val spine = cfgs.map { case (b, r) => (b.toLong, r.toLong) }
        .toDF("cfg", "rows_per_band")
      spine.join(broadcast(cn), Seq("cfg"), "left")
        .join(broadcast(hn), Seq("cfg"), "left")
        .crossJoin(broadcast(tn))
        .select(col("cfg").as("n_bands"), col("rows_per_band"), col("n_truth"),
          coalesce(col("n_cand"), lit(0L)).as("n_cand"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"))
        .select(col("n_bands"), col("rows_per_band"), col("n_truth"), col("n_cand"),
          col("n_hit"),
          expr("CAST(n_hit * 1000 div greatest(n_truth, 1) AS BIGINT)").as("recall_milli"),
          expr("CAST(n_hit * 1000 div greatest(n_cand, 1) AS BIGINT)").as("precision_milli"))
        .orderBy("n_bands")
    },

    // Cross-source contamination matrix — WHERE the duplicates flow from:
    // the exact Jaccard ≥ ½ near-dup pairs (q245's truth leg: the
    // prefix-bounded [[halfJaccardPairs]], integer threshold 3c ≥ na+nb)
    // labeled with each side's source and rolled up to an UNORDERED
    // source-pair census — n_pairs, distinct docs involved, and the
    // involved-docs share of the two sources' doc pool in permille. The
    // report a curation team reads before choosing which feed to gate:
    // a hot off-diagonal cell means one source is re-hosting another's
    // content and its dedup must run CROSS-source, not per-source. At
    // 100 TB the pair volume is bounded by the shingle join (8-byte
    // keys) and the matrix itself is |sources|² metadata.
    q("q251_contamination_matrix",
      "source×source near-dup census: pairs, docs involved, contaminated permille")(
      s"""$shingleCte,
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
         |           FROM sh a JOIN sh b ON b.s = a.s AND a.doc_id < b.doc_id
         |           GROUP BY a.doc_id, b.doc_id),
         |truth AS (SELECT d1, d2 FROM common
         |          JOIN cnt ca ON ca.doc_id = d1 JOIN cnt cb ON cb.doc_id = d2
         |          WHERE 3 * c >= ca.n + cb.n),
         |lab AS (SELECT least(da.source, db.source) AS sa,
         |               greatest(da.source, db.source) AS sb, t.d1, t.d2
         |        FROM truth t JOIN documents da ON da.doc_id = t.d1
         |                     JOIN documents db ON db.doc_id = t.d2),
         |cell AS (SELECT sa, sb, CAST(count(*) AS BIGINT) AS n_pairs FROM lab GROUP BY sa, sb),
         |docs AS (SELECT sa, sb, d1 AS d FROM lab UNION SELECT sa, sb, d2 FROM lab),
         |dd AS (SELECT sa, sb, CAST(count(*) AS BIGINT) AS n_docs FROM docs GROUP BY sa, sb),
         |srcn AS (SELECT source, CAST(count(*) AS BIGINT) AS nd FROM documents GROUP BY source)
         |SELECT cell.sa, cell.sb, cell.n_pairs, dd.n_docs,
         |       CAST(dd.n_docs * 1000 //
         |            (CASE WHEN cell.sa = cell.sb THEN na.nd ELSE na.nd + nb.nd END) AS BIGINT)
         |         AS contaminated_milli
         |FROM cell JOIN dd ON dd.sa = cell.sa AND dd.sb = cell.sb
         |JOIN srcn na ON na.source = cell.sa
         |JOIN srcn nb ON nb.source = cell.sb
         |ORDER BY 1, 2""".stripMargin
    ) { (s, dir) =>
      val docsT = Tables.fanout(s, dir, "documents")
      val sh = docsT.select(col("doc_id"), tokens(col("text")).as("t"))
        .select(col("doc_id"), explode(shingles(col("t"), 3)).as("s")).distinct()
        .cache() // prefix truth leg (df pass, prefix build, verify joins)
      val truth = halfJaccardPairs(sh, "s")
      val lbl = docsT.select(col("doc_id"), col("source"))
      val lab = truth
        .join(broadcast(lbl.select(col("doc_id").as("d1"), col("source").as("s1"))), Seq("d1"))
        .join(broadcast(lbl.select(col("doc_id").as("d2"), col("source").as("s2"))), Seq("d2"))
        .select(least(col("s1"), col("s2")).as("sa"),
          greatest(col("s1"), col("s2")).as("sb"), col("d1"), col("d2"))
        .cache() // pair census + distinct-doc census
      val cell = lab.groupBy("sa", "sb").agg(count(lit(1)).as("n_pairs"))
      val dd = lab.select(col("sa"), col("sb"), col("d1").as("d"))
        .union(lab.select(col("sa"), col("sb"), col("d2").as("d"))).distinct()
        .groupBy("sa", "sb").agg(count(lit(1)).as("n_docs"))
      val srcn = docsT.groupBy("source").agg(count(lit(1)).as("nd"))
      cell.join(dd, Seq("sa", "sb"))
        .join(broadcast(srcn.select(col("source").as("sa"), col("nd").as("nda"))), Seq("sa"))
        .join(broadcast(srcn.select(col("source").as("sb"), col("nd").as("ndb"))), Seq("sb"))
        .select(col("sa"), col("sb"), col("n_pairs"), col("n_docs"),
          expr("CAST(n_docs * 1000 div (CASE WHEN sa = sb THEN nda ELSE nda + ndb END) AS BIGINT)")
            .as("contaminated_milli"))
        .orderBy("sa", "sb")
    },

    // Contrastive-pair mining — the training-pair generator a retrieval/
    // embedding model needs from a raw corpus: each anchor that HAS a
    // near-duplicate (exact J ≥ ½, q245's truth leg) pairs with its
    // smallest-id duplicate as the POSITIVE, and with its two nearest
    // same-source length-neighbors that are NOT duplicates of it as HARD
    // NEGATIVES (same domain, similar length — the confusable docs a
    // random negative would never surface). Fully deterministic: distance
    // = |Δ n_chars|, doc_id tiebreak. At 100 TB the negative candidates
    // come from an equi-join on (source) — production would add a length
    // bucket to the join key to cap the per-anchor fan-in; the window
    // ranks per anchor over that bounded candidate set, and the dup
    // exclusion is an 8-byte-pair anti-join.
    q("q254_contrastive_pairs",
      "anchor/positive/hard-negative triples: near-dup positives, length-neighbor negatives")(
      s"""$shingleCte,
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
         |           FROM sh a JOIN sh b ON b.s = a.s AND a.doc_id < b.doc_id
         |           GROUP BY a.doc_id, b.doc_id),
         |truth AS (SELECT d1, d2 FROM common
         |          JOIN cnt ca ON ca.doc_id = d1 JOIN cnt cb ON cb.doc_id = d2
         |          WHERE 3 * c >= ca.n + cb.n),
         |anch AS (SELECT d1 AS a, min(d2) AS pos FROM truth GROUP BY d1),
         |dup AS (SELECT d1 AS a, d2 AS b FROM truth
         |        UNION ALL SELECT d2, d1 FROM truth),
         |meta AS (SELECT doc_id, source, n_chars FROM documents),
         |candp AS (SELECT anch.a, anch.pos, m2.doc_id AS neg,
         |                 abs(m2.n_chars - m1.n_chars) AS dist
         |          FROM anch JOIN meta m1 ON m1.doc_id = anch.a
         |               JOIN meta m2 ON m2.source = m1.source AND m2.doc_id <> anch.a
         |          WHERE NOT EXISTS (SELECT 1 FROM dup
         |                            WHERE dup.a = anch.a AND dup.b = m2.doc_id)),
         |rk AS (SELECT a, pos, neg,
         |              row_number() OVER (PARTITION BY a ORDER BY dist, neg) AS r
         |       FROM candp)
         |SELECT a AS anchor_id, pos AS pos_id,
         |       max(CASE WHEN r = 1 THEN neg END) AS neg1_id,
         |       max(CASE WHEN r = 2 THEN neg END) AS neg2_id
         |FROM rk WHERE r <= 2 GROUP BY a, pos ORDER BY anchor_id""".stripMargin
    ) { (s, dir) =>
      val docsT = Tables.fanout(s, dir, "documents")
      val sh = docsT.select(col("doc_id"), tokens(col("text")).as("t"))
        .select(col("doc_id"), explode(shingles(col("t"), 3)).as("s")).distinct()
        .cache() // prefix truth leg (df pass, prefix build, verify joins)
      val truth = halfJaccardPairs(sh, "s")
        .cache() // anchors + both directions of the dup exclusion
      val anch = truth.groupBy(col("d1").as("a")).agg(min(col("d2")).as("pos"))
      val dup = truth.select(col("d1").as("a"), col("d2").as("b"))
        .unionAll(truth.select(col("d2").as("a"), col("d1").as("b")))
      val meta = docsT.select(col("doc_id"), col("source"), col("n_chars"))
      val candp = anch
        .join(broadcast(meta.select(col("doc_id").as("a"), col("source"),
          col("n_chars").as("ac"))), Seq("a"))
        .join(broadcast(meta.select(col("doc_id").as("neg"), col("source"),
          col("n_chars").as("nc"))), Seq("source"))
        .filter(col("neg") =!= col("a"))
        .join(dup.select(col("a"), col("b").as("neg")), Seq("a", "neg"), "left_anti")
        .select(col("a"), col("pos"), col("neg"), abs(col("nc") - col("ac")).as("dist"))
      // nearest-2 negatives via the native TopKPerKeyExec — the same-source
      // candidate fan-in is unbounded (the full source pool per anchor), so
      // the old rank window full-shuffled it; TopK bounds the exchange at
      // 2 rows/anchor/task, and the 2 survivors rank inside a sorted array
      graft.plans.TopKPerKey.topK(candp, Seq(col("a")),
          Seq(col("dist"), col("neg")), 2)
        .groupBy(col("a").as("anchor_id"), col("pos").as("pos_id"))
        .agg(sort_array(collect_list(struct(col("dist"), col("neg")))).as("arr"))
        .select(col("anchor_id"), col("pos_id"),
          col("arr")(0).getField("neg").as("neg1_id"),
          expr("CASE WHEN size(arr) > 1 THEN arr[1].neg END").as("neg2_id"))
        .orderBy("anchor_id")
    },

    // Leakage-free train/test split — the decontamination family's
    // capstone: a doc-hash split puts the two halves of a near-dup pair
    // on OPPOSITE sides (the eval sees paraphrases of training data —
    // silent leakage), so the unit of randomization must be the NEAR-DUP
    // CLUSTER, not the document. Both splits run side by side and the
    // audit column IS the leak: the naive arm's cross-split near-dup
    // pairs (measured > 0 on this corpus), the cluster arm's EXACTLY 0 —
    // structural, because both endpoints share a component and therefore
    // a side (spec re-asserts, and the oracle re-derives components with
    // its own recursive-CTE closure, so the zero is cross-checked, not
    // assumed). Scale shape: q34g's machinery — exact-Jaccard edges,
    // O(log² n) star contraction, then ONE hash of the component id;
    // split sizes stay balanced because clusters are small.
    q("q307_leakage_free_split",
      "near-dup-cluster randomization: naive split leaks pairs across sides, cluster split leaks zero")(
      s"""$ccComponentsCte,
         |assign AS (SELECT d.doc_id, coalesce(comp.component, d.doc_id) AS comp
         |           FROM (SELECT doc_id FROM documents) d
         |           LEFT JOIN comp ON comp.doc_id = d.doc_id),
         |sides AS (SELECT doc_id,
         |                 ${md5LongSql("'sp:' || CAST(doc_id AS VARCHAR)")} % 2 AS naive_side,
         |                 ${md5LongSql("'sp:' || CAST(comp AS VARCHAR)")} % 2 AS cluster_side
         |          FROM assign),
         |arms AS (SELECT 'a_naive' AS arm, doc_id, naive_side AS side FROM sides
         |         UNION ALL SELECT 'b_cluster', doc_id, cluster_side FROM sides),
         |xp AS (SELECT a.arm, CAST(count(*) AS BIGINT) AS cross_pairs
         |       FROM edges e JOIN arms a ON a.doc_id = e.d1
         |                    JOIN arms b ON b.arm = a.arm AND b.doc_id = e.d2
         |       WHERE a.side <> b.side GROUP BY a.arm),
         |sz AS (SELECT arm, CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         |              CAST(sum(side) AS BIGINT) AS n_test
         |       FROM arms GROUP BY arm)
         |SELECT sz.arm, sz.n_train, sz.n_test, coalesce(xp.cross_pairs, 0) AS cross_pairs
         |FROM sz LEFT JOIN xp ON xp.arm = sz.arm ORDER BY sz.arm""".stripMargin
    ) { (s, dir) =>
      import graft.functions.PortableHash.md5Long
      val edges = jaccardEdges(s, dir).localCheckpoint(true) // CC + both audits
      val comp = graft.operators.StarContraction.components(edges)
      val assign = Tables(s, dir, "documents").select(col("doc_id"))
        .join(comp, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("comp"))
      val sides = assign.select(col("doc_id"),
          (md5Long(concat(lit("sp:"), col("doc_id").cast("string"))) % 2).as("naive_side"),
          (md5Long(concat(lit("sp:"), col("comp").cast("string"))) % 2).as("cluster_side"))
      val arms = sides.select(lit("a_naive").as("arm"), col("doc_id"),
          col("naive_side").as("side"))
        .unionAll(sides.select(lit("b_cluster").as("arm"), col("doc_id"),
          col("cluster_side").as("side")))
        .cache() // sizes + both edge-endpoint joins
      val xp = edges
        .join(arms.select(col("arm"), col("doc_id").as("d1"), col("side").as("s1")), Seq("d1"))
        .join(arms.select(col("arm"), col("doc_id").as("d2"), col("side").as("s2")),
          Seq("arm", "d2"))
        .filter(col("s1") =!= col("s2"))
        .groupBy("arm").agg(count(lit(1)).as("cross_pairs"))
      arms.groupBy("arm")
        .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("n_train"),
          sum(col("side")).as("n_test"))
        .join(xp, Seq("arm"), "left")
        .select(col("arm"), col("n_train"), col("n_test"),
          coalesce(col("cross_pairs"), lit(0L)).as("cross_pairs"))
        .orderBy("arm")
    }
  )
}
