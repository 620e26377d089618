package graft.operators

import graft.Registry.{Q, q}
import graft.Tables
import graft.functions.PortableHash.{md5Long, md5LongSql}
import org.apache.spark.sql.functions._

/** Round-7 curation depth wave: the sub-document-granularity cleaning
  * passes web-scale LLM corpora run AFTER document-level dedup — C4/
  * RefinedWeb remove repeated LINES across the corpus and repeated spans
  * within a page, memorization audits score how much of a doc was seen
  * before it, and the training mix allocates the token budget across
  * sources by tempered weights. The fixture text is single-space token
  * soup (no newline/sentence structure), so the deterministic
  * sub-document unit here is the fixed-width token BLOCK; the operators'
  * shapes are unit-agnostic.
  *
  * Scale notes inline; nothing here is all-pairs — cross-doc passes key
  * every shuffle on an 8-byte block/shingle hash, within-doc passes are
  * row-local with work bounded by document length.
  */
object CurationQueries {

  val all: Seq[Q] = Seq(

    // C4-style cross-corpus boilerplate removal at block granularity:
    // any 4-token block occurring in MORE THAN ONE distinct document is
    // boilerplate (C4 §2.1 removes any three-sentence span occurring
    // more than once in the corpus); every occurrence is dropped from
    // every doc, and the per-doc report carries kept-token accounting
    // (the len%4 tail never enters a block and is always kept). The q61
    // family MEASURES cross-doc duplication; this is the REMOVAL decision
    // + retention ledger built on the same hash discipline. 100 TB
    // shape: one explode keyed by the 8-byte block hash, a distinct-doc
    // count per hash (partial-aggregated), and a hash-keyed join back —
    // no broadcast of the (unbounded) boilerplate set required; AQE may
    // still choose one when it fits.
    q("q352_block_boilerplate",
      "C4-style boilerplate: drop 4-token blocks occurring in >1 distinct doc, per-doc report")(
      s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
         |blk AS (SELECT doc_id, ${md5LongSql("array_to_string(w[i*4+1:i*4+4], ' ')")} AS h
         |        FROM (SELECT doc_id, w, unnest(range(0, len(w) // 4)) AS i FROM t)),
         |bp AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS df FROM blk GROUP BY h)
         |       WHERE df >= 2),
         |per AS (SELECT blk.doc_id, count(*) AS nb,
         |               coalesce(sum(CASE WHEN bp.h IS NOT NULL THEN 1 END), 0) AS nd
         |        FROM blk LEFT JOIN bp ON blk.h = bp.h GROUP BY blk.doc_id)
         |SELECT t.doc_id, CAST(coalesce(per.nb, 0) AS BIGINT) AS n_blocks,
         |       CAST(coalesce(per.nd, 0) AS BIGINT) AS n_dropped,
         |       CAST((coalesce(per.nb, 0) - coalesce(per.nd, 0)) * 4
         |            + len(w) % 4 AS BIGINT) AS kept_tokens
         |FROM t LEFT JOIN per ON per.doc_id = t.doc_id
         |ORDER BY t.doc_id""".stripMargin
    ) { (s, dir) =>
      val t = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      // guard: Spark's sequence(0, -1) DESCENDS instead of being empty, so
      // a sub-4-token doc must short-circuit to an empty block array
      val blk = t
        .select(col("doc_id"),
          explode(when(size(col("w")) >= 4,
            transform(sequence(lit(0), (size(col("w")) / 4).cast("int") - 1),
              i => md5Long(array_join(slice(col("w"), i * 4 + 1, lit(4)), " "))))
            .otherwise(array().cast("array<bigint>"))).as("h"))
      val bp = blk.groupBy("h").agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= 2).select(col("h"), lit(true).as("is_bp"))
      val per = blk.join(bp, Seq("h"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("nb"),
          coalesce(sum(when(col("is_bp"), 1L)), lit(0L)).as("nd"))
      t.join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("nb"), lit(0L)).as("n_blocks"),
          coalesce(col("nd"), lit(0L)).as("n_dropped"),
          ((coalesce(col("nb"), lit(0L)) - coalesce(col("nd"), lit(0L))) * 4
            + size(col("w")) % 4).cast("long").as("kept_tokens"))
        .orderBy("doc_id")
    },

    // Within-document span dedup (RefinedWeb's intra-page repetition
    // removal, fixed 2-token spans): keep each block's FIRST occurrence
    // inside its own document, drop later repeats, and prove the kept
    // CONTENT (not just counts) equal across engines by hashing the
    // re-joined deduped text. Entirely ROW-LOCAL — per-doc work is
    // O(blocks²) with blocks bounded by document length, so this is a
    // map-only stage at any corpus size (the index set is filtered, then
    // mapped back to blocks, because the first-occurrence test is
    // list_position == own index in both engines).
    q("q353_intra_doc_dedup",
      "within-doc 2-token-span keep-first dedup: counts + kept-content hash, row-local")(
      s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
         |b AS (SELECT doc_id,
         |             list_transform(range(0, len(w) // 2),
         |                            i -> array_to_string(w[i*2+1:i*2+2], ' ')) AS blocks
         |      FROM t WHERE len(w) >= 2),
         |k AS (SELECT doc_id, blocks,
         |             list_transform(
         |               list_filter(range(0, len(blocks)),
         |                           i -> list_position(blocks, blocks[i+1]) = i+1),
         |               i -> blocks[i+1]) AS kept
         |      FROM b)
         |SELECT doc_id, CAST(len(blocks) AS BIGINT) AS n_blocks,
         |       CAST(len(kept) AS BIGINT) AS n_unique,
         |       CAST((len(blocks) - len(kept)) * 1000 // len(blocks) AS BIGINT)
         |         AS dup_ratio_milli,
         |       ${md5LongSql("array_to_string(kept, ' ')")} AS kept_hash
         |FROM k ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val b = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 2)
        .select(col("doc_id"),
          transform(sequence(lit(0), (size(col("w")) / 2).cast("int") - 1),
            i => array_join(slice(col("w"), i * 2 + 1, lit(2)), " ")).as("blocks"))
      b.select(col("doc_id"), col("blocks"),
          transform(
            filter(sequence(lit(0), size(col("blocks")) - 1),
              i => array_position(col("blocks"), element_at(col("blocks"), i + 1)) === (i + 1).cast("long")),
            i => element_at(col("blocks"), i + 1)).as("kept"))
        .select(col("doc_id"),
          size(col("blocks")).cast("long").as("n_blocks"),
          size(col("kept")).cast("long").as("n_unique"),
          expr("(size(blocks) - size(kept)) * 1000 div size(blocks)").as("dup_ratio_milli"),
          md5Long(array_join(col("kept"), " ")).as("kept_hash"))
        .orderBy("doc_id")
    },

    // Memorization / novelty audit: for every document, the fraction of
    // its distinct 4-gram shingles FIRST seen in an earlier document
    // (doc_id order = arrival order) — the score data engineers read to
    // find near-copies of earlier data before training. Unlike q61's
    // SYMMETRIC duplicated-position fraction, this is ARRIVAL-ORDERED:
    // the earliest doc holding a shingle owns it, later holders don't —
    // the asymmetry that makes it an audit of what training would
    // memorize from history. first-seen is min(doc_id) per shingle hash
    // (one partial-aggregated pass), joined back on the hash; a doc is
    // flagged memorized when ≤ 10% of its shingles are novel. 100 TB:
    // both passes key on the 8-byte hash — the join carries
    // (hash, first_seen), never text.
    q("q354_novelty_audit",
      "per-doc novelty: share of distinct 4-gram shingles first seen in this doc; memorized flag")(
      s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ${md5LongSql("array_to_string(w[i+1:i+4], ' ')")} AS h
         |       FROM (SELECT doc_id, w, unnest(range(0, len(w) - 3)) AS i FROM t
         |             WHERE len(w) >= 4)),
         |fs AS (SELECT h, min(doc_id) AS first_seen FROM sh GROUP BY h)
         |SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |       CAST(sum(CASE WHEN fs.first_seen = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_novel,
         |       CAST(sum(CASE WHEN fs.first_seen = sh.doc_id THEN 1 ELSE 0 END) * 1000
         |            // count(*) AS BIGINT) AS novelty_permille,
         |       sum(CASE WHEN fs.first_seen = sh.doc_id THEN 1 ELSE 0 END) * 10 < count(*)
         |         AS memorized
         |FROM sh JOIN fs ON fs.h = sh.h
         |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin
    ) { (s, dir) =>
      val sh = Tables.fanout(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 4)
        .select(col("doc_id"),
          explode(transform(sequence(lit(0), size(col("w")) - 4),
            i => md5Long(array_join(slice(col("w"), i + 1, lit(4)), " ")))).as("h"))
        .distinct()
      val fs = sh.groupBy("h").agg(min(col("doc_id")).as("first_seen"))
      sh.join(fs, Seq("h"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("first_seen") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
        .select(col("doc_id"), col("n_shingles"), col("n_novel"),
          expr("n_novel * 1000 div n_shingles").as("novelty_permille"),
          (col("n_novel") * 10 < col("n_shingles")).as("memorized"))
        .orderBy("doc_id")
    },

    // Training-mix temperature reweighting: allocate a fixed token
    // budget across sources by TEMPERED weights w_i = isqrt(tokens_i)
    // (α = 0.5 — the standard multilingual/source rebalancing that
    // up-samples small sources), with exact largest-remainder rounding
    // so the allocations sum to the budget precisely. q117 PICKS the
    // documents for a quota; this is the apportionment step before it —
    // the exact-integer answer to "quotas must sum to B". All integer: the
    // floor shares are B·w div W, the remainder goes to the largest
    // fractional parts (B·w mod W, ties to the smaller source id), and
    // the remainder RANK is a triangular self-join over the
    // |sources|-bounded weight frame — no global window (the registry's
    // unpartitioned-window ban), no float share can desync the engines.
    q("q355_mix_temperature",
      "α=0.5 tempered source mix: isqrt-weighted 100k-token allocation, largest-remainder exact")(
      """WITH c AS (SELECT source, CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS tok
        |           FROM documents GROUP BY source),
        |w AS (SELECT source, tok, CAST(floor(sqrt(CAST(tok AS DOUBLE))) AS BIGINT) AS wt FROM c),
        |tw AS (SELECT CAST(sum(wt) AS BIGINT) AS W FROM w),
        |sh AS (SELECT source, tok, wt,
        |              CAST(100000 * wt // W AS BIGINT) AS fl,
        |              CAST(100000 * wt % W AS BIGINT) AS fr
        |       FROM w CROSS JOIN tw),
        |rem AS (SELECT CAST(100000 - sum(fl) AS BIGINT) AS r FROM sh),
        |rk AS (SELECT a.source, CAST(count(*) AS BIGINT) AS rnk
        |       FROM sh a JOIN sh b
        |         ON b.fr > a.fr OR (b.fr = a.fr AND b.source <= a.source)
        |       GROUP BY a.source)
        |SELECT sh.source, sh.tok, sh.wt,
        |       CAST(sh.fl + CASE WHEN rk.rnk <= rem.r THEN 1 ELSE 0 END AS BIGINT)
        |         AS alloc_tokens
        |FROM sh JOIN rk ON rk.source = sh.source CROSS JOIN rem
        |ORDER BY sh.source""".stripMargin
    ) { (s, dir) =>
      val c = Tables.fanout(s, dir, "documents")
        .groupBy("source")
        .agg(sum(size(split(col("text"), " "))).cast("long").as("tok"))
      val w = c.select(col("source"), col("tok"),
        floor(sqrt(col("tok").cast("double"))).cast("long").as("wt"))
      val tw = w.agg(sum(col("wt")).as("W"))
      val sh = w.crossJoin(broadcast(tw))
        .select(col("source"), col("tok"), col("wt"),
          expr("100000 * wt div W").as("fl"),
          (lit(100000) * col("wt") % col("W")).as("fr"))
        .cache() // rank self-join + remainder total + final projection
      val rem = sh.agg((lit(100000L) - sum(col("fl"))).as("r"))
      val rk = sh.select(col("source").as("sa"), col("fr").as("fra"))
        .join(broadcast(sh.select(col("source").as("sb"), col("fr").as("frb"))),
          col("frb") > col("fra") || (col("frb") === col("fra") && col("sb") <= col("sa")))
        .groupBy(col("sa")).agg(count(lit(1)).as("rnk"))
      sh.join(rk, col("source") === col("sa"))
        .crossJoin(broadcast(rem))
        .select(col("source"), col("tok"), col("wt"),
          (col("fl") + when(col("rnk") <= col("r"), 1L).otherwise(0L)).as("alloc_tokens"))
        .orderBy("source")
    }
  )
}
