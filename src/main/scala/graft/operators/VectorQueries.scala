package graft.operators

import graft.Registry.{Q, q, rowsOnly}
import graft.Tables
import graft.functions.PortableHash.{md5LongScala, md5LongSql}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector similarity search over the embedding column (SURVEY.md §2B B35 +
  * north-star ANN variants). Cosine is computed as a sequential double fold
  * (`aggregate(zip_with(...))`), which is bit-identical to DuckDB's
  * `list_dot_product` over double-cast lists (verified empirically) — so
  * thresholds and rank orders are stable across engines.
  *
  * Scale path: brute-force top-k is the correctness baseline; the LSH
  * bucketing (random-hyperplane signs) and IVF (centroid partitions) queries
  * are the 100 TB designs — candidate generation becomes an equi-join on
  * bucket/centroid id instead of an all-pairs product.
  */
object VectorQueries {

  /** Double-cast embedding + its L2 norm (sequential fold). */
  private[operators] def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
      .withColumn("nrm", sqrt(aggregate(zip_with(col("e"), col("e"), _ * _), lit(0.0), _ + _)))

  private[operators] def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  /** XOR masks of the Hamming ball of the given radius over the plane bits —
    * the multi-probe set: probing `bucket ^ mask` for every mask reaches all
    * buckets within `radius` sign-bit flips. */
  private[operators] def probeMasks(radius: Int): Seq[Long] =
    (0 until (1 << NumPlanes))
      .filter(m => java.lang.Integer.bitCount(m) <= radius).map(_.toLong)

  /** Random-hyperplane LSH: nPlanes deterministic pseudo-random planes with
    * component w(i,d) = ((md5("p{i}:{d}") % 2001) - 1000) / 1000 — the same
    * arithmetic the oracle SQL evaluates via DuckDB's md5. */
  val NumPlanes = 8
  val Dim = 64
  def planeWeight(i: Int, d: Int): Double =
    ((md5LongScala(s"p$i:$d") % 2001) - 1000) / 1000.0

  /** Unrolled hook+jump (Shiloach–Vishkin-style) min-label closure for the
    * DBSCAN oracles (round-11, verdict r10 tasks 3/7): emits `rounds`
    * hook+jump stages over in-scope CTEs `cores(id)` and symmetric edges
    * `ce(i, j)`, ending in `clab(id, lbl)` = min core id per connected
    * component — the SAME labels the old `WITH RECURSIVE reach` closure
    * produced, WITHOUT its quadratic row set (reach materializes every
    * (vertex, root) pair — Σ component² rows, which blew the sf1 45-min
    * replay budget; q189b lost its sf1 oracle row to exactly this).
    * Each round: hook = per-vertex min over own + neighbors' labels (one
    * O(|E|) join-aggregate), jump = label-of-label composition (one
    * O(|V|) self-join) — label reach at least doubles per round, so
    * `rounds` ≥ log₂(max component diameter) guarantees exact
    * convergence; an unconverged replay CANNOT pass silently (labels
    * would differ from the engine's StarContraction output and the hash
    * compare fails loudly). Cost: rounds·O(|E|) — linear in candidates at
    * every scale, the engine-side star-contraction discipline ported to
    * the oracle. */
  private def svClosureSql(rounds: Int): String = {
    // cem: the edge set is referenced by EVERY round, and DuckDB 1.0
    // inlines plain CTEs per reference — without this materialization each
    // round silently recomputes the whole upstream candidate join (the
    // repo's unrolled-CTE gotcha; measured 38 s per round at sf1 for
    // q189's grid join alone, which is what actually blew the 900 s
    // budget, not the label propagation itself)
    val init =
      "cem AS MATERIALIZED (SELECT i, j FROM ce),\n" +
        "l0 AS MATERIALIZED (SELECT id, id AS lbl FROM cores)"
    val rs = (1 to rounds).map { k =>
      s"""m$k AS MATERIALIZED (
         |  SELECT v.id, least(v.lbl, coalesce(min(lu.lbl), v.lbl)) AS lbl
         |  FROM l${k - 1} v LEFT JOIN cem e ON e.j = v.id
         |                  LEFT JOIN l${k - 1} lu ON lu.id = e.i
         |  GROUP BY v.id, v.lbl),
         |l$k AS MATERIALIZED (SELECT a.id, b.lbl FROM m$k a JOIN m$k b ON b.id = a.lbl)""".stripMargin
    }
    (init +: rs).mkString(",\n") + s",\nclab AS (SELECT id, lbl FROM l$rounds)"
  }

  private def planeLit(i: Int): Column =
    array((0 until Dim).map(d => lit(planeWeight(i, d))): _*)

  private val planeWeightSql =
    "(((('0x' || substr(md5('p' || i || ':' || d), 1, 15))::BIGINT % 2001) - 1000) / 1000.0)"

  /** q86's projection planes — same construction, distinct seed namespace
    * so the projection is independent of the LSH planes. */
  private def rpWeight(j: Int, d: Int): Double =
    ((md5LongScala(s"rp$j:$d") % 2001) - 1000) / 1000.0
  private def rpPlaneLit(j: Int): Column =
    array((0 until Dim).map(d => lit(rpWeight(j, d))): _*)
  private val rpWeightSql =
    "(((('0x' || substr(md5('rp' || j || ':' || d), 1, 15))::BIGINT % 2001) - 1000) / 1000.0)"

  /** q96's classifier weight vector — one md5-seeded plane. */
  private val scorerWeightSql =
    "(((('0x' || substr(md5('w' || d), 1, 15))::BIGINT % 2001) - 1000) / 1000.0)"

  /** Oracle CTE computing the LSH bucket per vector with a sequential
    * per-plane list dot product (lambda captures outer i). */
  private[operators] val bucketCte =
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
       |pd AS (SELECT vec_id, i,
       |              list_dot_product(e, list_transform(generate_series(0, ${Dim - 1}),
       |                                                 d -> $planeWeightSql)) AS s
       |       FROM v CROSS JOIN range(${NumPlanes}) AS r(i)),
       |bk AS (SELECT vec_id, CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS bucket
       |       FROM pd GROUP BY vec_id)""".stripMargin

  /** Spark twin: add a `bucket` column to a [[withNorm]]-shaped frame. */
  private[operators] def withBucket(df: DataFrame): DataFrame = {
    val dots = (0 until NumPlanes).foldLeft(df) { (d, i) =>
      d.withColumn(s"s_$i", dot(col("e"), planeLit(i)))
    }
    val bucket = (0 until NumPlanes)
      .map(i => when(col(s"s_$i") > 0, lit(1L << i)).otherwise(0L))
      .reduce(_ + _)
    dots.withColumn("bucket", bucket).drop((0 until NumPlanes).map(i => s"s_$i"): _*)
  }

  // ---- deterministic k-means (ANN path 3) machinery ----

  /** Lloyd iteration count (unrolled identically in the oracle SQL). */
  val KmeansIters = 2
  val K = 8

  /** Oracle CTE chain: c0 = seed centroids (vec_id < K), then per iteration
    * sN (all vector×centroid cosines), aN (argmax assignment, tie → lowest
    * cent), and cN+1 (per-cluster elementwise mean as a vec_id-ordered
    * `list_reduce` — a sequential fold, bit-identical to the Spark side's
    * `aggregate`; an emptied cluster keeps its previous centroid). */
  private def kmAssignSql(cents: String, label: Int): String =
    s"""s$label AS (SELECT x.vec_id, c.cent,
       |             list_dot_product(x.e, c.ce) / (nx.nrm * sqrt(list_dot_product(c.ce, c.ce))) AS cs
       |      FROM v x JOIN n nx ON nx.vec_id = x.vec_id CROSS JOIN $cents c),
       |a$label AS (SELECT vec_id, cent, cs FROM
       |        (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent) AS rn FROM s$label)
       |        WHERE rn = 1)""".stripMargin

  private def kmUpdateSql(prevAssign: String, prevCents: String, label: String): String =
    // empty-cluster fallback must branch on the JOIN miss (m.n IS NULL), not
    // coalesce over the transformed list — list_transform over a NULL inner
    // list yields [NULL, ...], which is non-NULL and defeats coalesce
    s"""m$label AS (SELECT cent, list(e ORDER BY vec_id) AS ms, count(*) AS n
       |      FROM $prevAssign JOIN v USING (vec_id) GROUP BY cent),
       |$label AS (SELECT p.cent,
       |            CASE WHEN m.n IS NULL THEN p.ce
       |                 ELSE list_transform(generate_series(1, $Dim),
       |                   d -> list_reduce(list_transform(m.ms, e -> e[d]), (acc, x) -> acc + x) / m.n)
       |            END AS ce
       |     FROM $prevCents p LEFT JOIN m$label m ON m.cent = p.cent)""".stripMargin

  private val kmeansCte: String = {
    val steps = (0 until KmeansIters).flatMap(i => Seq(
      kmAssignSql(s"c$i", i), kmUpdateSql(s"a$i", s"c$i", s"c${i + 1}"))) :+
      kmAssignSql(s"c$KmeansIters", KmeansIters)
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
       |n AS (SELECT vec_id, sqrt(list_dot_product(e, e)) AS nrm FROM v),
       |c0 AS (SELECT vec_id AS cent, e AS ce FROM v WHERE vec_id < $K),
       |${steps.mkString(",\n")}""".stripMargin
  }

  /** One Lloyd scoring pass: every (vector, centroid) cosine. */
  private def kmScores(v: DataFrame, cents: DataFrame): DataFrame =
    v.join(broadcast(cents))
      .withColumn("cs", dot(col("e"), col("ce")) /
        (col("nrm") * sqrt(dot(col("ce"), col("ce")))))

  /** Argmax assignment from a scoring pass (tie → lowest centroid id). */
  private def kmArgmax(scores: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cs").desc, col("cent"))
    scores.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("e"), col("nrm"), col("cent"), col("cs"))
  }

  /** Lloyd centroid update: elementwise mean over members in vec_id order as
    * a sequential fold (bit-identical to the oracle's list_reduce); a
    * cluster with no members keeps its previous centroid.
    *
    * 100 TB note: the vec_id-ordered `collect_list` exists ONLY for
    * bit-exact oracle determinism at verification scale. At production
    * scale the update is `posexplode(e)` → `avg` grouped by (cent, dim) —
    * partial+final aggregation, no per-cluster materialization — which is
    * statistically identical (float addition reorders) but not
    * bit-reproducible; assignment (the scale-heavy half: n·K cosines) is
    * already a broadcast join + window, which survives any scale. */
  private def kmUpdate(assign: DataFrame, prevCents: DataFrame): DataFrame = {
    val means = assign
      .groupBy("cent")
      .agg(sort_array(collect_list(struct(col("vec_id"), col("e")))).as("ms"),
        count(lit(1)).as("n"))
      .select(col("cent"),
        transform(sequence(lit(1), lit(Dim)), d =>
          aggregate(col("ms"), lit(0.0),
            (acc, m) => acc + get(m.getField("e"), d - 1)) / col("n")).as("mce"))
    prevCents.join(means, Seq("cent"), "left")
      .select(col("cent"), coalesce(col("mce"), col("ce")).as("ce"))
  }

  /** Final-iteration (scores, assignment) after KmeansIters Lloyd rounds.
    * Each iteration's centroid frame (K rows) is cached: it feeds both the
    * next assignment and the empty-cluster fallback, and without the cache
    * every reference re-executes the whole preceding Lloyd chain. */
  private def kmeansScoresAndAssign(v: DataFrame): (DataFrame, DataFrame) = {
    val c0 = v.filter(col("vec_id") < K).select(col("vec_id").as("cent"), col("e").as("ce"))
    val cFinal = (0 until KmeansIters).foldLeft(c0) { (c, _) =>
      kmUpdate(kmArgmax(kmScores(v, c)), c).cache()
    }
    val scores = kmScores(v, cFinal).cache() // consumed by probes AND assignment
    (scores, kmArgmax(scores))
  }

  private def kmeansFinalAssign(emb: DataFrame): DataFrame =
    kmeansScoresAndAssign(withNorm(emb))._2

  // ---- product quantization (ANN path 4) machinery ----

  /** PQ geometry: M subspaces of SubDim dims; Kpq codewords per subspace
    * seeded from the first Kpq vectors (same seeding trick as IVF — fully
    * deterministic and oracle-expressible). */
  val PqM = 16
  val PqSubDim = Dim / PqM
  val PqK = 16

  /** One oracle assignment pass: per-subspace squared-L2 to every codeword
    * of `cwName` (sequential fold — bit-identical to the Spark `aggregate`),
    * argmin code with tie → lowest code id. */
  private def pqAssignSql(cwName: String, pdName: String, codesName: String): String =
    s"""$pdName AS (SELECT s.vec_id, s.m, c.code,
       |              list_reduce(list_transform(generate_series(1, $PqSubDim),
       |                i -> (s.se[i] - c.ce[i]) * (s.se[i] - c.ce[i])), (a, b) -> a + b) AS d2
       |       FROM sub s JOIN $cwName c USING (m)),
       |$codesName AS (SELECT vec_id, m, code, d2 FROM
       |            (SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, code) AS rn
       |             FROM $pdName)
       |          WHERE rn = 1)""".stripMargin

  /** One oracle Lloyd codebook update: per-(m,code) elementwise mean of
    * member subvectors as a vec_id-ordered sequential fold; an emptied
    * codeword keeps its previous value (same contract as the k-means CTE). */
  private def pqUpdateSql(codesName: String, prevCw: String, newCw: String): String =
    // same JOIN-miss branching as kmUpdateSql: coalesce over the transformed
    // list would see [NULL, ...] (non-NULL) and never fall back
    s"""mu_$newCw AS (SELECT c.m, c.code, list(s.se ORDER BY s.vec_id) AS ms, count(*) AS n
       |       FROM $codesName c JOIN sub s ON s.vec_id = c.vec_id AND s.m = c.m
       |       GROUP BY c.m, c.code),
       |$newCw AS (SELECT c.m, c.code,
       |            CASE WHEN mu.n IS NULL THEN c.ce
       |                 ELSE list_transform(generate_series(1, $PqSubDim),
       |                   d -> list_reduce(list_transform(mu.ms, e -> e[d]),
       |                                    (acc, x) -> acc + x) / mu.n)
       |            END AS ce
       |     FROM $prevCw c LEFT JOIN mu_$newCw mu ON mu.m = c.m AND mu.code = c.code)""".stripMargin

  /** Lloyd training iterations over the codebook (unrolled identically in
    * the oracle SQL). */
  val PqIters = 1

  /** Oracle CTE chain: `subDef` (a CTE body producing (vec_id, m, se)
    * subvectors, referenced as `sub`) → seed codebook (first PqK vectors) →
    * PqIters × (assign → Lloyd update) → final `cw`/`codes`. */
  private def pqCodesCteFrom(subDef: String): String = {
    val steps = (0 until PqIters).flatMap { i =>
      val nextCw = if (i == PqIters - 1) "cw" else s"cw${i + 1}"
      Seq(pqAssignSql(s"cw$i", s"pd$i", s"codes$i"),
        pqUpdateSql(s"codes$i", s"cw$i", nextCw))
    } :+ pqAssignSql("cw", s"pd$PqIters", "codes")
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
       |$subDef,
       |cw0 AS (SELECT m, vec_id AS code, se AS ce FROM sub WHERE vec_id < $PqK),
       |${steps.mkString(",\n")}""".stripMargin
  }

  private val pqCodesCte = pqCodesCteFrom(
    s"""sub AS (SELECT vec_id, m, e[m*$PqSubDim+1 : m*$PqSubDim+$PqSubDim] AS se
       |        FROM v CROSS JOIN range($PqM) AS r(m))""".stripMargin)

  /** Spark argmin-assignment twin (codebook is broadcast — PqM·PqK rows). */
  private def pqAssign(sub: DataFrame, cw: DataFrame): DataFrame = {
    val wMin = Window.partitionBy(col("vec_id"), col("m"))
      .orderBy(col("d2"), col("code"))
    sub.join(broadcast(cw), "m")
      .withColumn("d2", aggregate(zip_with(col("se"), col("ce"),
        (a, b) => (a - b) * (a - b)), lit(0.0), _ + _))
      .withColumn("rn", row_number().over(wMin)).filter(col("rn") === 1)
      .select(col("vec_id"), col("m"), col("code"), col("d2"))
  }

  /** Spark Lloyd-update twin. The vec_id-ordered `collect_list` fold exists
    * only for bit-exact oracle determinism (same 100 TB note as kmUpdate:
    * production uses posexplode→avg partial aggregation). */
  private def pqUpdate(codes: DataFrame, sub: DataFrame, prevCw: DataFrame): DataFrame = {
    val means = codes.join(sub, Seq("vec_id", "m"))
      .groupBy("m", "code")
      .agg(sort_array(collect_list(struct(col("vec_id"), col("se")))).as("ms"),
        count(lit(1)).as("n"))
      .select(col("m"), col("code"),
        transform(sequence(lit(1), lit(PqSubDim)), d =>
          aggregate(col("ms"), lit(0.0),
            (acc, mm) => acc + get(mm.getField("se"), d - 1)) / col("n")).as("mce"))
    prevCw.join(means, Seq("m", "code"), "left")
      .select(col("m"), col("code"), coalesce(col("mce"), col("ce")).as("ce"))
  }

  /** Spark twins of the oracle CTEs from any (vec_id, m, se) subvector
    * frame: (subvectors, trained codebook, codes). The trained codebook
    * (PqM·PqK rows) is cached — it feeds both the final assignment and the
    * ADC table. */
  private def pqFramesFromSub(sub: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val cw0 = sub.filter(col("vec_id") < PqK)
      .select(col("m"), col("vec_id").as("code"), col("se").as("ce"))
    val cw = (0 until PqIters).foldLeft(cw0) { (c, _) =>
      pqUpdate(pqAssign(sub, c), sub, c).cache()
    }
    (sub, cw, pqAssign(sub, cw))
  }

  /** Slice a (vec_id, e) frame into PqM contiguous subvectors. */
  private def pqSub(v: DataFrame): DataFrame =
    v.select(col("vec_id"),
      posexplode(array((0 until PqM).map(m =>
        slice(col("e"), m * PqSubDim + 1, PqSubDim)): _*)).as(Seq("m", "se")))

  private def pqFrames(s: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) =
    pqFramesFromSub(pqSub(Tables.fanout(s, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))))

  /** Oracle tail shared by the flat-PQ ADC searches (q35i, q35l): queries'
    * exact subvectors vs codebook → per-candidate fixed-order d0+…+d15 sum
    * → top-3. Appends to a `pqCodesCteFrom` chain (needs `sub`, `cw`,
    * `codes`). */
  private val pqAdcSearchSql: String =
    s""",
       |adc AS (SELECT q.vec_id AS qid, c.m, c.code,
       |               list_reduce(list_transform(generate_series(1, $PqSubDim),
       |                 i -> (q.se[i] - c.ce[i]) * (q.se[i] - c.ce[i])), (a, b) -> a + b) AS dd
       |        FROM sub q JOIN cw c USING (m) WHERE q.vec_id < 10),
       |j AS (SELECT adc.qid, codes.vec_id AS cid,
       |${(0 until PqM).map(i => s"             max(CASE WHEN adc.m = $i THEN dd END) AS d$i").mkString(",\n")}
       |      FROM codes JOIN adc ON adc.m = codes.m AND adc.code = codes.code
       |      GROUP BY adc.qid, codes.vec_id),
       |sc AS (SELECT qid, cid, ${(0 until PqM).map(i => s"d$i").mkString(" + ")} AS dist FROM j WHERE cid <> qid)
       |SELECT qid, cid, round(dist, 4) + 0 AS adist, CAST(rn AS BIGINT) AS rn
       |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY dist, cid) AS rn FROM sc)
       |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin

  /** Spark twin of [[pqAdcSearchSql]] over any PQ frame triple. */
  private def pqAdcTop3(sub: DataFrame, cw: DataFrame, codes: DataFrame): DataFrame = {
    val adc = sub.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("m"), col("se"))
      .join(cw, "m")
      .withColumn("dd", aggregate(zip_with(col("se"), col("ce"),
        (a, b) => (a - b) * (a - b)), lit(0.0), _ + _))
      .select(col("qid"), col("m"), col("code"), col("dd"))
    val byQ = codes.join(broadcast(adc), Seq("m", "code"))
      .groupBy(col("qid"), col("vec_id").as("cid"))
      .agg(max(when(col("m") === 0, col("dd"))).as("d0"),
        (1 until PqM).map(i => max(when(col("m") === i, col("dd"))).as(s"d$i")): _*)
      .filter(col("cid") =!= col("qid"))
      .withColumn("dist",
        (0 until PqM).map(i => col(s"d$i")).reduceLeft(_ + _))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("dist"), col("cid"))
    byQ.withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 3)
      .select(col("qid"), col("cid"), round(col("dist"), 4).as("adist"),
        col("rn").cast("long").as("rn"))
      .orderBy("qid", "rn")
  }

  // ---- OPQ-lite (ANN path 7) rotation machinery ----

  /** Deterministic signed permutation — the cheapest member of the OPQ
    * rotation family (cf. OPQ, ITQ: an orthogonal transform applied before
    * PQ so subspaces share variance more evenly). Dims are reordered by
    * md5("rot:d") rank and sign-flipped by md5("sgn:d") parity — orthogonal
    * by construction, exactly representable in both engines, and free at
    * search time (queries rotate once, in registers). Entry j of the
    * returned seq is (source dim, sign) for destination j. */
  private val rotPerm: Seq[(Int, Double)] = {
    val order = (0 until Dim).sortBy(d => (md5LongScala(s"rot:$d"), d))
    order.map(src => (src, if (md5LongScala(s"sgn:$src") % 2 == 0) 1.0 else -1.0))
  }

  /** Oracle twin of [[rotPerm]] + the rotated subvector CTE (dst-ordered
    * list agg grouped into PqM subspaces). */
  private val opqSubSql: String = {
    val md5l = "(('0x' || substr(md5(%s), 1, 15))::BIGINT)"
    s"""rot AS (SELECT d AS src,
       |               row_number() OVER (ORDER BY ${md5l.format("'rot:' || d")}, d) - 1 AS dst,
       |               CASE WHEN ${md5l.format("'sgn:' || d")} % 2 = 0 THEN 1.0 ELSE -1.0 END AS sg
       |        FROM generate_series(0, ${Dim - 1}) AS g(d)),
       |sub AS (SELECT v.vec_id, r.dst // $PqSubDim AS m,
       |               list(v.e[r.src + 1] * r.sg ORDER BY r.dst) AS se
       |        FROM v CROSS JOIN rot r GROUP BY v.vec_id, r.dst // $PqSubDim)""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // B35: brute-force cosine top-5 neighbors for the first 10 query vectors.
    q("q35_cosine_topk", "B35 brute-force cosine top-5 neighbors (queries vec_id<10)")(
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
        |n AS (SELECT vec_id, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |s AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
        |             list_dot_product(q.e, c.e) / (nq.nrm * nc.nrm) AS cs
        |      FROM v q JOIN n nq ON nq.vec_id = q.vec_id,
        |           v c JOIN n nc ON nc.vec_id = c.vec_id
        |      WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id)
        |SELECT qid, cid, round(cs, 4) + 0 AS cos, CAST(rn AS BIGINT) AS rn
        |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cs DESC, cid) AS rn FROM s)
        |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin
    ) { (s, dir) =>
      // the hot path runs the codegen'd CosineSimilarity expression over the
      // raw float arrays — bit-identical to the HOF double fold (and the
      // oracle), but inside whole-stage codegen
      val emb = Tables.fanout(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val cs = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cs").desc, col("cid"))
      cs.join(broadcast(qs), col("cid") =!= col("qid"))
        .withColumn("cs", graft.expressions.VectorFunctions.cosine(col("qe"), col("ce")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select(col("qid"), col("cid"), round(col("cs"), 4).as("cos"),
          col("rn").cast("long").as("rn"))
        .orderBy("qid", "rn")
    },

    // ANN path 1: random-hyperplane LSH bucket assignment (oracle-checked
    // value-for-value; the join key that replaces all-pairs at scale).
    q("q35b_lsh_buckets", "ANN: 8-plane random-hyperplane LSH bucket per vector")(
      s"""$bucketCte
         |SELECT vec_id, bucket FROM bk ORDER BY vec_id""".stripMargin
    ) { (s, dir) =>
      withBucket(withNorm(Tables.fanout(s, dir, "embeddings")))
        .select(col("vec_id"), col("bucket")).orderBy("vec_id")
    },

    // ANN path 1 search: multi-probe LSH — probe every bucket within
    // Hamming distance ≤ 2 of the query's bucket (37 of 256 buckets), then
    // exact top-3 cosine among the candidates. Still an equi-join on bucket
    // id (the scale shape); the probe ball is the standard recall fix for
    // sign-LSH's coarse buckets.
    q("q35c_lsh_search", "ANN: multi-probe LSH (Hamming≤2) top-3 neighbors (queries vec_id<10)")(
      s"""$bucketCte,
         |n AS (SELECT vec_id, sqrt(list_dot_product(e, e)) AS nrm FROM v),
         |probe AS (SELECT q.vec_id AS qid, xor(q.bucket, r.m) AS pb
         |          FROM bk q CROSS JOIN range(${1 << NumPlanes}) AS r(m)
         |          WHERE q.vec_id < 10 AND bit_count(r.m) <= 2),
         |s AS (SELECT DISTINCT probe.qid, c.vec_id AS cid,
         |             list_dot_product(qv.e, cv.e) / (nq.nrm * nc.nrm) AS cs
         |      FROM probe JOIN bk c ON c.bucket = probe.pb AND c.vec_id <> probe.qid
         |           JOIN v qv ON qv.vec_id = probe.qid
         |           JOIN v cv ON cv.vec_id = c.vec_id
         |           JOIN n nq ON nq.vec_id = probe.qid
         |           JOIN n nc ON nc.vec_id = c.vec_id)
         |SELECT qid, cid, round(cs, 4) + 0 AS cos, CAST(rn AS BIGINT) AS rn
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cs DESC, cid) AS rn FROM s)
         |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
    ) { (s, dir) =>
      val masks = probeMasks(2)
      val v = withBucket(withNorm(Tables.fanout(s, dir, "embeddings")))
      val qs = v.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"),
          col("bucket"), explode(array(masks.map(lit): _*)).as("m"))
        .withColumn("pb", col("m").bitwiseXOR(col("bucket")))
      val cands = v.select(col("vec_id").as("cid"), col("e").as("ce"),
        col("nrm").as("cn"), col("bucket").as("cb"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cs").desc, col("cid"))
      cands.join(broadcast(qs), col("cb") === col("pb") && col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"), col("qe"), col("ce"), col("qn"), col("cn"))
        .dropDuplicates(Seq("qid", "cid"))
        .withColumn("cs", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("qid"), col("cid"), round(col("cs"), 4).as("cos"),
          col("rn").cast("long").as("rn"))
        .orderBy("qid", "rn")
    },

    // ANN path 2: IVF — partition vectors by nearest of 8 fixed seed
    // centroids (vec_id < 8), deterministic tiebreak on centroid id.
    q("q35d_ivf_assign", "ANN: IVF centroid assignment (8 seed centroids)")(
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
      val v = withNorm(Tables.fanout(s, dir, "embeddings"))
      val cents = v.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cent"), col("e").as("ce"), col("nrm").as("cn"))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("cs").desc, col("cent"))
      v.join(broadcast(cents))
        .withColumn("cs", dot(col("e"), col("ce")) / (col("nrm") * col("cn")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vec_id"), col("cent"), round(col("cs"), 4).as("cos"))
        .orderBy("vec_id")
    },

    // ANN path 2 search: probe the 2 nearest centroids, search only vectors
    // assigned to them. Oracle-checked end-to-end (upgraded from the
    // round-1 rows-only entry); recall bound in ApproxAndRecallSpec.
    q("q35e_ivf_search", "ANN: IVF 2-probe top-3 neighbors (queries vec_id<10)")(
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
        |n AS (SELECT vec_id, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |s AS (SELECT x.vec_id, c.vec_id AS cent,
        |             list_dot_product(x.e, c.e) / (nx.nrm * nc.nrm) AS cs,
        |             row_number() OVER (PARTITION BY x.vec_id
        |               ORDER BY list_dot_product(x.e, c.e) / (nx.nrm * nc.nrm) DESC, c.vec_id) AS rn
        |      FROM v x JOIN n nx ON nx.vec_id = x.vec_id,
        |           v c JOIN n nc ON nc.vec_id = c.vec_id
        |      WHERE c.vec_id < 8),
        |members AS (SELECT vec_id AS cid, cent FROM s WHERE rn = 1),
        |probes AS (SELECT vec_id AS qid, cent FROM s WHERE rn <= 2 AND vec_id < 10),
        |cand AS (SELECT DISTINCT p.qid, m.cid
        |         FROM probes p JOIN members m ON m.cent = p.cent AND m.cid <> p.qid),
        |sc AS (SELECT cand.qid, cand.cid,
        |              list_dot_product(q.e, c.e) / (nq.nrm * nc.nrm) AS cs
        |       FROM cand JOIN v q ON q.vec_id = cand.qid
        |            JOIN v c ON c.vec_id = cand.cid
        |            JOIN n nq ON nq.vec_id = cand.qid
        |            JOIN n nc ON nc.vec_id = cand.cid)
        |SELECT qid, cid, round(cs, 4) + 0 AS cos, CAST(rn AS BIGINT) AS rn
        |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cs DESC, cid) AS rn FROM sc)
        |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
    ) { (s, dir) =>
      val v = withNorm(Tables.fanout(s, dir, "embeddings"))
      val cents = v.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cent"), col("e").as("ce"), col("nrm").as("cn"))
      val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("cs").desc, col("cent"))
      val assign = v.join(broadcast(cents))
        .withColumn("cs", dot(col("e"), col("ce")) / (col("nrm") * col("cn")))
        .withColumn("rn", row_number().over(wAssign))
      val members = assign.filter(col("rn") === 1)
        .select(col("vec_id").as("cid"), col("cent"), col("e").as("ce2"), col("nrm").as("cn2"))
      val probes = assign.filter(col("rn") <= 2 && col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"), col("cent"))
      val wTop = Window.partitionBy(col("qid")).orderBy(col("qcs").desc, col("cid"))
      members.join(broadcast(probes), Seq("cent"))
        .filter(col("cid") =!= col("qid"))
        .withColumn("qcs", dot(col("qe"), col("ce2")) / (col("qn") * col("cn2")))
        .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 3)
        .select(col("qid"), col("cid"), round(col("qcs"), 4).as("cos"),
          col("rn").cast("long").as("rn"))
        .orderBy("qid", "rn")
    },

    // ANN path 3: k-means IVF — the seed centroids refined by KmeansIters
    // deterministic Lloyd iterations (assignment tie-break on centroid id;
    // per-cluster mean as a sequential vec_id-ordered fold so both engines
    // produce bit-identical centroids; empty cluster keeps its previous
    // centroid). Tighter centroids → higher probe recall than q35d/e's
    // fixed seeds, still fully oracle-checked.
    q("q35f_kmeans_ivf_assign",
      s"ANN: k-means IVF final assignment ($KmeansIters seeded Lloyd iterations)")(
      s"""$kmeansCte
         |SELECT vec_id, cent, round(cs, 4) + 0 AS cos FROM a$KmeansIters
         |ORDER BY vec_id""".stripMargin
    ) { (s, dir) =>
      kmeansFinalAssign(Tables.fanout(s, dir, "embeddings"))
        .select(col("vec_id"), col("cent"), round(col("cs"), 4).as("cos"))
        .orderBy("vec_id")
    },

    // ANN path 3 search: probe the 2 nearest refined centroids per query,
    // exact top-3 among their members — oracle-checked end-to-end (unlike
    // q35e, whose probe path is rows-only); recall bound in
    // ApproxAndRecallSpec.
    q("q35g_kmeans_ivf_search",
      "ANN: k-means IVF 2-probe top-3 neighbors (queries vec_id<10)")(
      s"""$kmeansCte,
         |p AS (SELECT vec_id AS qid, cent FROM
         |        (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent) AS rn
         |         FROM s$KmeansIters)
         |      WHERE rn <= 2 AND vec_id < 10),
         |cand AS (SELECT DISTINCT p.qid, m.vec_id AS cid
         |         FROM p JOIN a$KmeansIters m ON m.cent = p.cent AND m.vec_id <> p.qid),
         |sc AS (SELECT cand.qid, cand.cid,
         |              list_dot_product(q.e, c.e) / (nq.nrm * nc.nrm) AS cs
         |       FROM cand JOIN v q ON q.vec_id = cand.qid
         |            JOIN v c ON c.vec_id = cand.cid
         |            JOIN n nq ON nq.vec_id = cand.qid
         |            JOIN n nc ON nc.vec_id = cand.cid)
         |SELECT qid, cid, round(cs, 4) + 0 AS cos, CAST(rn AS BIGINT) AS rn
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cs DESC, cid) AS rn FROM sc)
         |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
    ) { (s, dir) =>
      val v = withNorm(Tables.fanout(s, dir, "embeddings"))
      val (scores, assign) = kmeansScoresAndAssign(v)
      val wProbe = Window.partitionBy(col("vec_id")).orderBy(col("cs").desc, col("cent"))
      val probes = scores
        .withColumn("rn", row_number().over(wProbe))
        .filter(col("rn") <= 2 && col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("cent"))
      val members = assign
        .select(col("vec_id").as("cid"), col("cent"), col("e").as("me"), col("nrm").as("mn"))
      val queries = v.select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"))
      val wTop = Window.partitionBy(col("qid")).orderBy(col("qcs").desc, col("cid"))
      probes.join(members, Seq("cent"))
        .filter(col("cid") =!= col("qid"))
        .select("qid", "cid", "me", "mn").dropDuplicates(Seq("qid", "cid"))
        .join(broadcast(queries), Seq("qid"))
        .withColumn("qcs", dot(col("qe"), col("me")) / (col("qn") * col("mn")))
        .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 3)
        .select(col("qid"), col("cid"), round(col("qcs"), 4).as("cos"),
          col("rn").cast("long").as("rn"))
        .orderBy("qid", "rn")
    },

    // ANN path 4: product quantization — each vector compressed to PqM
    // 4-bit codes (argmin squared-L2 to the per-subspace codebook). The
    // codes table IS the compressed index: at 100 TB the 64-dim float
    // corpus becomes n·4 small ints, and search never touches the raw
    // vectors. Codebook is broadcast (PqM·PqK rows at any scale).
    q("q35h_pq_codes", s"ANN: product-quantization code assignment ($PqM×$PqK codebook, $PqIters Lloyd pass)")(
      s"""$pqCodesCte
         |SELECT vec_id, CAST(m AS BIGINT) AS m, code, round(d2, 4) + 0 AS dist
         |FROM codes ORDER BY vec_id, m""".stripMargin
    ) { (s, dir) =>
      val (_, _, codes) = pqFrames(s, dir)
      codes.select(col("vec_id"), col("m").cast("long").as("m"), col("code"),
        round(col("d2"), 4).as("dist"))
        .orderBy("vec_id", "m")
    },

    // ANN path 4 search: asymmetric distance computation (ADC) — per query,
    // precompute the distance from each query subvector to every codeword
    // (PqM·PqK entries/query, broadcast), then one pass over the compressed
    // codes reconstructs each candidate's approximate distance as the fixed
    // -order sum d0+…+d{M-1} of table lookups (fixed order keeps the float
    // sum bit-identical to the oracle). Queries never touch raw candidate
    // vectors — the PQ scale contract.
    q("q35i_pq_adc_search", "ANN: PQ ADC top-3 by approximate L2 (queries vec_id<10)")(
      s"$pqCodesCte$pqAdcSearchSql"
    ) { (s, dir) =>
      val (sub, cw, codes) = pqFrames(s, dir)
      pqAdcTop3(sub, cw, codes)
    },

    // ANN path 7: OPQ-lite — the same flat-PQ ADC search as q35i, but the
    // space is first rotated by a deterministic signed permutation (the
    // zero-cost end of the OPQ/ITQ rotation family: orthogonal, so L2
    // distances are EXACTLY preserved; what changes is how variance lands
    // across the 16 subspaces, which is the quantity PQ quantization error
    // depends on). The rotation is metadata (64 (src, sign) pairs), applied
    // in registers during encode/query — zero extra shuffle, zero storage.
    // A learned OPQ rotation would slot into the same seam (rotate → slice
    // → quantize) with the matrix swapped in for the permutation.
    q("q35l_opq_adc_search",
      "ANN: OPQ-lite signed-permutation rotation + PQ ADC top-3 (queries vec_id<10)")(
      s"${pqCodesCteFrom(opqSubSql)}$pqAdcSearchSql"
    ) { (s, dir) =>
      val v = Tables.fanout(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
      val rotated = v.select(col("vec_id"), array(rotPerm.map { case (src, sg) =>
        col("e")(src) * lit(sg) }: _*).as("e"))
      val (sub, cw, codes) = pqFramesFromSub(pqSub(rotated))
      pqAdcTop3(sub, cw, codes)
    },

    // ANN path 8: FILTERED vector search — top-k restricted to candidates
    // passing a metadata predicate (here vec_id % 7 = 0 as the stand-in for
    // a tag/date/tenant filter), the feature real vector stores ship as
    // "pre-filtering". The predicate lands on the MEMBER side before any
    // distance math (at 100 TB it pushes into the index scan / partition
    // pruning), and the probe width widens 2 → 3 to compensate for the
    // thinner lists (the standard over-fetch rule when selectivity drops).
    q("q35m_filtered_ivf_search",
      "ANN: metadata-filtered IVF 3-probe top-3 (filter vec_id % 7 = 0, queries vec_id<10)")(
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
        |n AS (SELECT vec_id, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |s AS (SELECT x.vec_id, c.vec_id AS cent,
        |             list_dot_product(x.e, c.e) / (nx.nrm * nc.nrm) AS cs,
        |             row_number() OVER (PARTITION BY x.vec_id
        |               ORDER BY list_dot_product(x.e, c.e) / (nx.nrm * nc.nrm) DESC, c.vec_id) AS rn
        |      FROM v x JOIN n nx ON nx.vec_id = x.vec_id,
        |           v c JOIN n nc ON nc.vec_id = c.vec_id
        |      WHERE c.vec_id < 8),
        |members AS (SELECT vec_id AS cid, cent FROM s WHERE rn = 1 AND vec_id % 7 = 0),
        |probes AS (SELECT vec_id AS qid, cent FROM s WHERE rn <= 3 AND vec_id < 10),
        |cand AS (SELECT DISTINCT p.qid, m.cid
        |         FROM probes p JOIN members m ON m.cent = p.cent AND m.cid <> p.qid),
        |sc AS (SELECT cand.qid, cand.cid,
        |              list_dot_product(q.e, c.e) / (nq.nrm * nc.nrm) AS cs
        |       FROM cand JOIN v q ON q.vec_id = cand.qid
        |            JOIN v c ON c.vec_id = cand.cid
        |            JOIN n nq ON nq.vec_id = cand.qid
        |            JOIN n nc ON nc.vec_id = cand.cid)
        |SELECT qid, cid, round(cs, 4) + 0 AS cos, CAST(rn AS BIGINT) AS rn
        |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cs DESC, cid) AS rn FROM sc)
        |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
    ) { (s, dir) =>
      val v = withNorm(Tables.fanout(s, dir, "embeddings"))
      val cents = v.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cent"), col("e").as("ce"), col("nrm").as("cn"))
      val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("cs").desc, col("cent"))
      val assign = v.join(broadcast(cents))
        .withColumn("cs", dot(col("e"), col("ce")) / (col("nrm") * col("cn")))
        .withColumn("rn", row_number().over(wAssign))
      // predicate applied BEFORE any per-candidate distance work
      val members = assign.filter(col("rn") === 1 && col("vec_id") % 7 === 0)
        .select(col("vec_id").as("cid"), col("cent"), col("e").as("ce2"), col("nrm").as("cn2"))
      val probes = assign.filter(col("rn") <= 3 && col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"), col("cent"))
      val wTop = Window.partitionBy(col("qid")).orderBy(col("qcs").desc, col("cid"))
      members.join(broadcast(probes), Seq("cent"))
        .filter(col("cid") =!= col("qid"))
        .withColumn("qcs", dot(col("qe"), col("ce2")) / (col("qn") * col("cn2")))
        .select(col("qid"), col("cid"), col("qcs")).distinct()
        .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 3)
        .select(col("qid"), col("cid"), round(col("qcs"), 4).as("cos"),
          col("rn").cast("long").as("rn"))
        .orderBy("qid", "rn")
    },

    // ANN path 5: IVF-PQ with exact re-rank — the composed index every
    // large-scale vector store runs (FAISS IVFPQ+refine shape): a coarse
    // quantizer partitions the corpus into centroid lists (the IVF routing
    // key); each vector stores only PQ codes of its RESIDUAL from its
    // centroid; search 2-probes the coarse lists, builds a per-(query,
    // probed centroid) ADC table from the query's residual, shortlists the
    // ADC top-max(100, 8√n), and exact-re-ranks ONLY the shortlist against
    // raw vectors (fixture: rescues recall@3 from 0.03 raw-ADC to ≥0.8 at
    // both fixture scales — ApproxAndRecallSpec pins the budget). At
    // 100 TB: lists are the partition key, codes are the storage, raw
    // vectors are fetched for the √n-bounded shortlist only. Seed codebook
    // (first PqK residual subvectors), untrained — the Lloyd chain from
    // q35h applies identically if trained residual codebooks are wanted
    // (measured: training does not move recall here; the shortlist depth
    // does — hence the adaptive depth).
    q("q35j_ivfpq_search",
      "ANN: IVF-PQ 2-probe ADC adaptive-√n shortlist + exact re-rank top-3 (queries vec_id<10)")(
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |cents AS (SELECT vec_id AS cent, e AS ce FROM v WHERE vec_id < $K),
         |cd AS (SELECT x.vec_id, c.cent,
         |              list_reduce(list_transform(generate_series(1, $Dim),
         |                i -> (x.e[i] - c.ce[i]) * (x.e[i] - c.ce[i])), (a, b) -> a + b) AS d2
         |       FROM v x CROSS JOIN cents c),
         |asg AS (SELECT vec_id, cent FROM
         |          (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cent) AS rn FROM cd)
         |        WHERE rn = 1),
         |resid AS (SELECT a.vec_id, a.cent,
         |                 list_transform(generate_series(1, $Dim), i -> x.e[i] - c.ce[i]) AS r
         |          FROM asg a JOIN v x USING (vec_id) JOIN cents c USING (cent)),
         |rsub AS (SELECT vec_id, cent, m, r[m*$PqSubDim+1 : m*$PqSubDim+$PqSubDim] AS se
         |         FROM resid CROSS JOIN range($PqM) AS rr(m)),
         |rcw AS (SELECT m, vec_id AS code, se AS ce FROM rsub WHERE vec_id < $PqK),
         |rpd AS (SELECT s.vec_id, s.cent, s.m, c.code,
         |               list_reduce(list_transform(generate_series(1, $PqSubDim),
         |                 i -> (s.se[i] - c.ce[i]) * (s.se[i] - c.ce[i])), (a, b) -> a + b) AS d2
         |        FROM rsub s JOIN rcw c USING (m)),
         |codes AS (SELECT vec_id, cent, m, code FROM
         |            (SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, code) AS rn
         |             FROM rpd)
         |          WHERE rn = 1),
         |qp AS (SELECT vec_id AS qid, cent FROM
         |         (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cent) AS rn
         |          FROM cd WHERE vec_id < 10)
         |       WHERE rn <= 2),
         |qresid AS (SELECT qp.qid, qp.cent,
         |                  list_transform(generate_series(1, $Dim), i -> x.e[i] - c.ce[i]) AS r
         |           FROM qp JOIN v x ON x.vec_id = qp.qid JOIN cents c USING (cent)),
         |qrsub AS (SELECT qid, cent, m, r[m*$PqSubDim+1 : m*$PqSubDim+$PqSubDim] AS se
         |          FROM qresid CROSS JOIN range($PqM) AS rr(m)),
         |adc AS (SELECT q.qid, q.cent, c.m, c.code,
         |               list_reduce(list_transform(generate_series(1, $PqSubDim),
         |                 i -> (q.se[i] - c.ce[i]) * (q.se[i] - c.ce[i])), (a, b) -> a + b) AS dd
         |        FROM qrsub q JOIN rcw c USING (m)),
         |j AS (SELECT adc.qid, codes.vec_id AS cid,
         |${(0 until PqM).map(i => s"             max(CASE WHEN adc.m = $i THEN dd END) AS d$i").mkString(",\n")}
         |      FROM codes JOIN adc ON adc.cent = codes.cent AND adc.m = codes.m
         |                         AND adc.code = codes.code
         |      GROUP BY adc.qid, codes.vec_id),
         |sc AS (SELECT qid, cid, ${(0 until PqM).map(i => s"d$i").mkString(" + ")} AS dist FROM j WHERE cid <> qid),
         |short AS (SELECT qid, cid FROM
         |            (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY dist, cid) AS rn2 FROM sc)
         |          WHERE rn2 <= (SELECT greatest(100, 8 * CAST(ceil(sqrt(count(*))) AS BIGINT)) FROM v)),
         |rr AS (SELECT short.qid, short.cid,
         |              list_reduce(list_transform(generate_series(1, $Dim),
         |                i -> (q.e[i] - c.e[i]) * (q.e[i] - c.e[i])), (a, b) -> a + b) AS d
         |       FROM short JOIN v q ON q.vec_id = short.qid JOIN v c ON c.vec_id = short.cid)
         |SELECT qid, cid, round(d, 4) + 0 AS dist, CAST(rn AS BIGINT) AS rn
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY d, cid) AS rn FROM rr)
         |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
    ) { (s, dir) =>
      val v = Tables.fanout(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
      val cents = v.filter(col("vec_id") < K)
        .select(col("vec_id").as("cent"), col("e").as("ce"))
      // coarse scoring feeds both corpus assignment and query probing
      val cd = v.join(broadcast(cents))
        .withColumn("d2", aggregate(zip_with(col("e"), col("ce"),
          (a, b) => (a - b) * (a - b)), lit(0.0), _ + _))
        .select(col("vec_id"), col("cent"), col("d2")).cache()
      val wA = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cent"))
      val asg = cd.withColumn("rn", row_number().over(wA)).filter(col("rn") === 1)
        .select(col("vec_id"), col("cent"))
      val resid = asg.join(v, "vec_id").join(broadcast(cents), "cent")
        .select(col("vec_id"), col("cent"),
          zip_with(col("e"), col("ce"), _ - _).as("r"))
      val rsub = resid.select(col("vec_id"), col("cent"),
        posexplode(array((0 until PqM).map(m =>
          slice(col("r"), m * PqSubDim + 1, PqSubDim)): _*)).as(Seq("m", "se")))
      val rcw = rsub.filter(col("vec_id") < PqK)
        .select(col("m"), col("vec_id").as("code"), col("se").as("cw_ce"))
      val wMin = Window.partitionBy(col("vec_id"), col("m"))
        .orderBy(col("d2"), col("code"))
      val codes = rsub.join(broadcast(rcw), "m")
        .withColumn("d2", aggregate(zip_with(col("se"), col("cw_ce"),
          (a, b) => (a - b) * (a - b)), lit(0.0), _ + _))
        .withColumn("rn", row_number().over(wMin)).filter(col("rn") === 1)
        .select(col("vec_id"), col("cent"), col("m"), col("code"))
      val qp = cd.filter(col("vec_id") < 10)
        .withColumn("rn", row_number().over(wA)).filter(col("rn") <= 2)
        .select(col("vec_id").as("qid"), col("cent"))
      val qresid = qp.join(v, col("qid") === col("vec_id"))
        .join(broadcast(cents), "cent")
        .select(col("qid"), col("cent"),
          zip_with(col("e"), col("ce"), _ - _).as("r"))
      val qrsub = qresid.select(col("qid"), col("cent"),
        posexplode(array((0 until PqM).map(m =>
          slice(col("r"), m * PqSubDim + 1, PqSubDim)): _*)).as(Seq("m", "se")))
      val adc = qrsub.join(rcw, "m")
        .withColumn("dd", aggregate(zip_with(col("se"), col("cw_ce"),
          (a, b) => (a - b) * (a - b)), lit(0.0), _ + _))
        .select(col("qid"), col("cent"), col("m"), col("code"), col("dd"))
      val byQ = codes.join(broadcast(adc), Seq("cent", "m", "code"))
        .groupBy(col("qid"), col("vec_id").as("cid"))
        .agg(max(when(col("m") === 0, col("dd"))).as("d0"),
          (1 until PqM).map(i => max(when(col("m") === i, col("dd"))).as(s"d$i")): _*)
        .filter(col("cid") =!= col("qid"))
        .withColumn("dist",
          (0 until PqM).map(i => col(s"d$i")).reduceLeft(_ + _))
      val wShort = Window.partitionBy(col("qid")).orderBy(col("dist"), col("cid"))
      // ADAPTIVE shortlist: max(100, 8·⌈√n⌉). A fixed 100 was 20% of the
      // corpus at sf0.01 but 5% at sf0.1, and recall@3 sagged 0.83 → 0.73
      // (VERDICT r5): ADC-rank quality is roughly scale-free, so the
      // shortlist must grow with the corpus to keep the same capture
      // probability — √n keeps the re-rank cost sublinear (still a
      // per-query bounded fetch of raw vectors at 100 TB). The corpus
      // count is one metadata-cheap job; the oracle embeds the same
      // formula as a scalar subquery.
      val shortDepth = {
        val n = v.count()
        math.max(100L, 8L * math.ceil(math.sqrt(n.toDouble)).toLong)
      }
      val short = byQ.withColumn("rn2", row_number().over(wShort))
        .filter(col("rn2") <= shortDepth).select("qid", "cid")
      // exact re-rank: raw vectors touched ONLY for the shortlist rows
      val rr = short
        .join(v.select(col("vec_id").as("qid"), col("e").as("qe")), "qid")
        .join(v.select(col("vec_id").as("cid"), col("e").as("che")), "cid")
        .withColumn("d", aggregate(zip_with(col("qe"), col("che"),
          (a, b) => (a - b) * (a - b)), lit(0.0), _ + _))
      val wTop = Window.partitionBy(col("qid")).orderBy(col("d"), col("cid"))
      rr.withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 3)
        .select(col("qid"), col("cid"), round(col("d"), 4).as("dist"),
          col("rn").cast("long").as("rn"))
        .orderBy("qid", "rn")
    },

    // ANN path 6: scalar quantization (SQ8) — each dimension maps to one
    // uint8 via per-dim [min, max] uniform levels (4:1 over float32, 8:1
    // over the double pipeline), searched against the DEQUANTIZED
    // reconstruction (mid-rise: mn + (c+0.5)·(mx-mn)/255). Per-dim bounds
    // are a posexplode → min/max partial aggregation (64 rows, broadcast);
    // at 100 TB the codes table is the stored corpus and bounds are index
    // metadata. The reconstruction is reassembled in dim order (ordered
    // fold — bit-identical across engines) so the distance rank is exact.
    q("q35k_sq8_search", "ANN: SQ8 per-dim uniform quantization, dequantized top-3 (queries vec_id<10)")(
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |px AS (SELECT vec_id, d, e[d+1] AS x FROM v CROSS JOIN range($Dim) AS r(d)),
         |dim AS (SELECT d, min(x) AS mn, max(x) AS mx FROM px GROUP BY d),
         |codes AS (SELECT vec_id, d,
         |                 CASE WHEN mx = mn THEN 0
         |                      ELSE least(CAST(floor((x - mn) / (mx - mn) * 255) AS BIGINT), 255)
         |                 END AS c
         |          FROM px JOIN dim USING (d)),
         |deq AS (SELECT vec_id, d, mn + (c + 0.5) * (mx - mn) / 255 AS xq
         |        FROM codes JOIN dim USING (d)),
         |deqv AS (SELECT vec_id, list(xq ORDER BY d) AS eq FROM deq GROUP BY vec_id),
         |s AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |             list_reduce(list_transform(generate_series(1, $Dim),
         |               i -> (q.e[i] - c.eq[i]) * (q.e[i] - c.eq[i])), (a, b) -> a + b) AS d2
         |      FROM v q CROSS JOIN deqv c
         |      WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id)
         |SELECT qid, cid, round(d2, 4) + 0 AS dist, CAST(rn AS BIGINT) AS rn
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY d2, cid) AS rn FROM s)
         |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
    ) { (s, dir) =>
      val v = Tables.fanout(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
      val px = v.select(col("vec_id"), posexplode(col("e")).as(Seq("d", "x")))
      val dim = px.groupBy("d").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      val codes = px.join(broadcast(dim), "d")
        .withColumn("c", when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(floor((col("x") - col("mn"))
            / (col("mx") - col("mn")) * 255).cast("long"), lit(255L))))
      val deqv = codes
        .withColumn("xq", col("mn") + (col("c") + 0.5) * (col("mx") - col("mn")) / 255)
        .groupBy("vec_id")
        .agg(sort_array(collect_list(struct(col("d"), col("xq")))).as("ms"))
        .select(col("vec_id").as("cid"),
          transform(col("ms"), m => m.getField("xq")).as("eq"))
      val qs = v.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("e").as("qe"))
      val wTop = Window.partitionBy(col("qid")).orderBy(col("d2"), col("cid"))
      deqv.join(broadcast(qs), col("cid") =!= col("qid"))
        .withColumn("d2", aggregate(zip_with(col("qe"), col("eq"),
          (a, b) => (a - b) * (a - b)), lit(0.0), _ + _))
        .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 3)
        .select(col("qid"), col("cid"), round(col("d2"), 4).as("dist"),
          col("rn").cast("long").as("rn"))
        .orderBy("qid", "rn")
    },

    // Random projection 64→8 — Johnson-Lindenstrauss-style dimensionality
    // reduction: 8 md5-seeded dense planes (same deterministic-plane
    // machinery as the q35b LSH, different seed namespace), each output
    // coordinate one sequential-fold dot product (`aggregate` ≙
    // `list_dot_product`, bit-identical cross-engine — NOTES.md). Entirely
    // row-local: no shuffle, pipelines into any downstream clustering/ANN
    // stage; at 100 TB this is the cheap front of an embedding-compression
    // path (project → quantize q35k → index q35j).
    q("q86_random_projection", "64→8 dense md5-seeded random projection per embedding")(
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |pj AS (SELECT vec_id, j,
         |              round(list_dot_product(e, list_transform(generate_series(0, ${Dim - 1}),
         |                                                       d -> $rpWeightSql)), 4) AS p
         |       FROM v CROSS JOIN range(8) AS r(j))
         |SELECT vec_id,
         |${(0 until 8).map(j => s"       max(CASE WHEN j = $j THEN p END) AS p$j").mkString(",\n")}
         |FROM pj GROUP BY vec_id ORDER BY vec_id""".stripMargin
    ) { (s, dir) =>
      val base = withNorm(Tables(s, dir, "embeddings"))
      (0 until 8).foldLeft(base) { (d, j) =>
        d.withColumn(s"p$j", round(dot(col("e"), rpPlaneLit(j)), 4))
      }
        .select(col("vec_id") +: (0 until 8).map(j => col(s"p$j")): _*)
        .orderBy("vec_id")
    },

    // Linear scorer — the inference-adjacent op a pipeline runs with a
    // trained classifier's weights: sigmoid(w·v) per embedding, md5-seeded
    // weight vector, then a per-(label, prediction) confusion summary.
    // Row-local: the weight literal compiles into the plan, the dot product
    // is the same sequential fold as q86, and exp/division are bit-portable
    // (the per-cell score_sum runs in rounded DECIMAL regardless). At
    // 100 TB this is a broadcast-weights map stage feeding one partial-
    // aggregated groupBy.
    q("q96_linear_scorer", "sigmoid(w·v) scoring + per-(label, pred) confusion summary")(
      s"""WITH v AS (SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |sc AS (SELECT vec_id, label,
         |        1.0 / (1.0 + exp(-(list_dot_product(e, list_transform(generate_series(0, ${Dim - 1}),
         |                                                              d -> $scorerWeightSql))))) AS score
         |       FROM v)
         |SELECT CAST(label AS BIGINT) AS label,
         |       CAST(CASE WHEN score > 0.5 THEN 1 ELSE 0 END AS BIGINT) AS pred,
         |       count(*) AS n,
         |       round(CAST(sum(CAST(round(score, 6) AS DECIMAL(28,6))) AS DOUBLE), 4) AS score_sum
         |FROM sc GROUP BY label, pred ORDER BY label, pred""".stripMargin
    ) { (s, dir) =>
      val w = array((0 until Dim).map(d =>
        lit(((md5LongScala(s"w$d") % 2001) - 1000) / 1000.0)): _*)
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), _.cast("double")).as("e"))
        .withColumn("score", lit(1.0) / (lit(1.0) + exp(-dot(col("e"), w))))
        .groupBy(col("label").cast("long").as("label"),
          when(col("score") > 0.5, 1L).otherwise(0L).as("pred"))
        .agg(count(lit(1)).as("n"),
          round(sum(round(col("score"), 6)
            .cast(org.apache.spark.sql.types.DecimalType(28, 6))).cast("double"), 4).as("score_sum"))
        .orderBy("label", "pred")
    },

    // Exact distributed AUC — the ranking metric behind every quality-
    // classifier gate (q96's scorer, labels binarized at <5), computed by
    // the Mann-Whitney rank-sum identity: AUC = (Σ ranks(pos) −
    // nPos(nPos+1)/2) / (nPos·nNeg). Ranks come from the two-pass
    // DistributedRank (never a global-window sort), so everything up to
    // the final division is EXACT integer arithmetic; score ties resolve
    // deterministically by vec_id (documented variant — q96's score_sum
    // hash match already proves the scores themselves are bit-identical
    // cross-engine, so the orderings agree). At 100 TB this is the one
    // metric people approximate with sampling; the two-pass rank makes
    // the exact form affordable.
    q("q172_exact_auc",
      "exact AUC of the sigmoid scorer (label < 5 positive) via distributed rank-sum")(
      s"""WITH v AS (SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |sc AS (SELECT vec_id, label < 5 AS pos,
         |        1.0 / (1.0 + exp(-(list_dot_product(e, list_transform(generate_series(0, ${Dim - 1}),
         |                                                              d -> $scorerWeightSql))))) AS score
         |       FROM v),
         |r AS (SELECT pos, row_number() OVER (ORDER BY score, vec_id) AS rn FROM sc),
         |s AS (SELECT CAST(sum(CASE WHEN pos THEN rn ELSE 0 END) AS BIGINT) AS rsum,
         |             CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |             CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
         |      FROM r)
         |SELECT n_pos, n_neg,
         |       round((rsum - n_pos * (n_pos + 1) / 2) * 1.0 / (n_pos * n_neg), 6) AS auc
         |FROM s""".stripMargin
    ) { (s, dir) =>
      val w = array((0 until Dim).map(d =>
        lit(((md5LongScala(s"w$d") % 2001) - 1000) / 1000.0)): _*)
      val scored = Tables(s, dir, "embeddings")
        .select(col("vec_id"), (col("label") < 5).as("pos"),
          transform(col("embedding"), _.cast("double")).as("e"))
        .withColumn("score", lit(1.0) / (lit(1.0) + exp(-dot(col("e"), w))))
        .select(col("vec_id"), col("pos"), col("score"))
      DistributedRank.withRowNumber(scored, Seq(col("score"), col("vec_id")), "rn")
        .agg(sum(when(col("pos"), col("rn")).otherwise(0L)).as("rsum"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
          sum(when(col("pos"), 0L).otherwise(1L)).as("n_neg"))
        .select(col("n_pos"), col("n_neg"),
          round((col("rsum") - col("n_pos") * (col("n_pos") + 1) / 2) * lit(1.0)
            / (col("n_pos") * col("n_neg")), 6).as("auc"))
    },

    // Exact average precision — the PR-side companion to q172's AUC (class
    // imbalance makes AP the metric retrieval/filter gates actually
    // report). Rank by score DESC (distributed rank), cumulative positives
    // at each rank by the two-pass distributed PREFIX SUM (never a global
    // window), and AP = mean over positives of precision-at-their-rank.
    // The one float fold — summing the per-positive precision terms — is
    // made order-free by rounding each term to 6 dp into DECIMAL before
    // the grouped sum (the q09/q15b contract); everything before it is
    // exact integers on bit-identical score orderings.
    q("q174_exact_average_precision",
      "exact average precision of the sigmoid scorer via distributed rank + prefix sum")(
      s"""WITH v AS (SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |sc AS (SELECT vec_id, label < 5 AS pos,
         |        1.0 / (1.0 + exp(-(list_dot_product(e, list_transform(generate_series(0, ${Dim - 1}),
         |                                                              d -> $scorerWeightSql))))) AS score
         |       FROM v),
         |r AS (SELECT pos, row_number() OVER (ORDER BY score DESC, vec_id) AS rn FROM sc),
         |c AS (SELECT pos, rn,
         |             sum(CASE WHEN pos THEN 1 ELSE 0 END)
         |               OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING) AS cum_pos
         |      FROM r)
         |SELECT CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |       round(CAST(sum(CASE WHEN pos
         |                     THEN CAST(round(cum_pos * 1.0 / rn, 6) AS DECIMAL(28,6))
         |                     ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
         |             / sum(CASE WHEN pos THEN 1 ELSE 0 END), 6) AS ap
         |FROM c""".stripMargin
    ) { (s, dir) =>
      val w = array((0 until Dim).map(d =>
        lit(((md5LongScala(s"w$d") % 2001) - 1000) / 1000.0)): _*)
      val scored = Tables(s, dir, "embeddings")
        .select(col("vec_id"), (col("label") < 5).as("pos"),
          transform(col("embedding"), _.cast("double")).as("e"))
        .withColumn("score", lit(1.0) / (lit(1.0) + exp(-dot(col("e"), w))))
        .select(col("vec_id"), col("pos"), col("score"))
      val ranked = DistributedRank.withRowNumber(
        scored, Seq(col("score").desc, col("vec_id")), "rn")
      DistributedRank.withPrefixSum(ranked, Seq(col("rn")),
          when(col("pos"), 1L).otherwise(0L), "cum_pos")
        .agg(
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
          (sum(when(col("pos"),
              round(col("cum_pos") * lit(1.0) / col("rn"), 6)
                .cast(org.apache.spark.sql.types.DecimalType(28, 6)))
            .otherwise(lit(0).cast(org.apache.spark.sql.types.DecimalType(28, 6))))
            .cast("double")).as("ap_raw"))
        .select(col("n_pos"),
          round(col("ap_raw") / col("n_pos"), 6).as("ap"))
    },

    // Calibration / reliability table for the same scorer — the companion
    // diagnostic to q172's AUC (a well-ranked scorer can still be
    // miscalibrated): scores bucket into 10 equal-width confidence bins
    // (floor(score·10) on bit-identical doubles ⇒ identical bins), and
    // each bin reports count, mean confidence (DECIMAL-exact sum, one
    // double division) and empirical positive rate — the inputs to ECE /
    // a reliability diagram. One partial-aggregated groupBy on ≤10 keys.
    q("q173_reliability_bins",
      "10-bin reliability table (confidence vs positive rate) for the sigmoid scorer")(
      s"""WITH v AS (SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         |sc AS (SELECT vec_id, label < 5 AS pos,
         |        1.0 / (1.0 + exp(-(list_dot_product(e, list_transform(generate_series(0, ${Dim - 1}),
         |                                                              d -> $scorerWeightSql))))) AS score
         |       FROM v)
         |SELECT CAST(least(9, CAST(floor(score * 10) AS BIGINT)) AS BIGINT) AS bin,
         |       count(*) AS n,
         |       round(CAST(sum(CAST(round(score, 6) AS DECIMAL(28,6))) AS DOUBLE)
         |             / count(*), 4) AS conf,
         |       round(sum(CASE WHEN pos THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS frac_pos
         |FROM sc GROUP BY 1 ORDER BY bin""".stripMargin
    ) { (s, dir) =>
      val w = array((0 until Dim).map(d =>
        lit(((md5LongScala(s"w$d") % 2001) - 1000) / 1000.0)): _*)
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), (col("label") < 5).as("pos"),
          transform(col("embedding"), _.cast("double")).as("e"))
        .withColumn("score", lit(1.0) / (lit(1.0) + exp(-dot(col("e"), w))))
        .groupBy(least(lit(9), floor(col("score") * 10).cast("long")).as("bin"))
        .agg(count(lit(1)).as("n"),
          round(sum(round(col("score"), 6)
              .cast(org.apache.spark.sql.types.DecimalType(28, 6))).cast("double")
            / count(lit(1)), 4).as("conf"),
          round(sum(when(col("pos"), 1L).otherwise(0L)) * lit(1.0) / count(lit(1)), 4)
            .as("frac_pos"))
        .orderBy("bin")
    },

    // SemDeDup (semantic dedup over embeddings, Abbas et al. 2023 shape):
    // cluster the corpus with the deterministic k-means, then mark any
    // vector that has a LOWER-id cluster-mate above the cosine threshold as
    // a semantic duplicate (keep-lowest-id, the same canonical rule as
    // q34h). This is THE 100 TB answer to q34e's all-pairs trap: pair
    // generation is an equi-join on cluster id, so total pair work is
    // Σ|cluster|² — bounded by clustering granularity (at production scale
    // K grows with n to hold clusters at ~√n, and oversized clusters split
    // recursively). Threshold 0.35 ≈ the within-cluster 99th percentile of
    // this synthetic corpus (max pairwise cosine ~0.49 — the fixture has no
    // true near-dups, so the τ=0.9-style production cut would be vacuous).
    // Cosines are sequential folds — bit-identical across engines — so the
    // threshold compare needs no rounding guard.
    q("q113_semdedup",
      "SemDeDup: k-means clusters + within-cluster cosine >= 0.35 keep-lowest-id")(
      s"""$kmeansCte,
         |pr AS (SELECT y.vec_id AS dropped
         |       FROM a$KmeansIters x JOIN a$KmeansIters y ON x.cent = y.cent AND x.vec_id < y.vec_id
         |            JOIN v vx ON vx.vec_id = x.vec_id JOIN v vy ON vy.vec_id = y.vec_id
         |            JOIN n nx ON nx.vec_id = x.vec_id JOIN n ny ON ny.vec_id = y.vec_id
         |       WHERE list_dot_product(vx.e, vy.e) / (nx.nrm * ny.nrm) >= 0.35),
         |d AS (SELECT DISTINCT dropped FROM pr)
         |SELECT a.vec_id, a.cent,
         |       CAST(CASE WHEN d.dropped IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM a$KmeansIters a LEFT JOIN d ON d.dropped = a.vec_id
         |ORDER BY a.vec_id""".stripMargin
    ) { (s, dir) =>
      val v = withNorm(Tables.fanout(s, dir, "embeddings"))
      val assign = kmeansScoresAndAssign(v)._2
        .select(col("vec_id"), col("cent"), col("e"), col("nrm")).cache()
      val lo = assign.select(col("cent"), col("vec_id").as("v1"),
        col("e").as("e1"), col("nrm").as("n1"))
      val hi = assign.select(col("cent"), col("vec_id").as("v2"),
        col("e").as("e2"), col("nrm").as("n2"))
      val dropped = lo.join(hi, Seq("cent"))
        .filter(col("v1") < col("v2"))
        .filter(dot(col("e1"), col("e2")) / (col("n1") * col("n2")) >= 0.35)
        .select(col("v2").as("vec_id")).distinct()
        .withColumn("hit", lit(0L))
      assign.join(dropped, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cent"), coalesce(col("hit"), lit(1L)).as("kept"))
        .orderBy("vec_id")
    },

    // Approximate kNN self-join — every vector's top-3 neighbors in one
    // distributed pass, the workhorse behind SemDeDup-style curation and
    // diversity sampling. Candidates come from the radius-2 LSH probe ball
    // (q35c's multi-probe over q35b's sign buckets: 37 probes across 8
    // planes), ranked by the ALREADY-ROUNDED cosine with nn_id tiebreak.
    // The oracle mirrors the candidate generation (hamming ≤ 2 on buckets),
    // pinning exactness; probe-ball recall vs brute force is bounds-tested
    // separately (ApproxAndRecallSpec). Scale shape: probe-bucket equi-join
    // (each pair surfaces at most once — probes are distinct per left row,
    // each right row has one bucket), per-vector top-k window — never an
    // all-pairs product.
    q("q137_knn_join", "approximate kNN self-join: top-3 neighbors per vector via LSH probe ball")(
      s"""$bucketCte,
         |n AS (SELECT vec_id, sqrt(list_dot_product(e, e)) AS nrm FROM v),
         |pair AS MATERIALIZED (
         |  -- round-11 (verdict r10 task 7): the q137b staging WITHOUT the
         |  -- query sample — materialize the integer bucket-distance filter
         |  -- over the 2-column bk frame FIRST, so the 64-dim dot products
         |  -- only run on the ~14% of pairs inside the probe ball. Same
         |  -- result set as the old single-stage form (WHERE before
         |  -- projection), but DuckDB no longer drags the wide vector
         |  -- columns through the quadratic join — the restructure that
         |  -- brings the sf1 replay inside the 900s retry budget.
         |  SELECT ba.vec_id AS vec_id, bb.vec_id AS nn_id
         |  FROM bk ba JOIN bk bb
         |    ON bit_count(xor(ba.bucket, bb.bucket)) <= 2
         |   AND ba.vec_id <> bb.vec_id),
         |cand AS (
         |  SELECT p.vec_id, p.nn_id,
         |         round(list_dot_product(va.e, vb.e) / (na.nrm * nb.nrm), 4) AS cos
         |  FROM pair p JOIN v va ON va.vec_id = p.vec_id
         |       JOIN v vb ON vb.vec_id = p.nn_id
         |       JOIN n na ON na.vec_id = p.vec_id
         |       JOIN n nb ON nb.vec_id = p.nn_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                    ORDER BY cos DESC, nn_id) AS rnk FROM cand)
         |SELECT vec_id, CAST(rnk AS BIGINT) AS rnk, nn_id, cos
         |FROM rk WHERE rnk <= 3 ORDER BY vec_id, rnk""".stripMargin
    ) { (s, dir) =>
      val masks = probeMasks(2)
      val v = withBucket(withNorm(Tables.fanout(s, dir, "embeddings")))
      val a = v.select(col("vec_id"), col("e").as("ea"),
          col("nrm").as("nrma"), col("bucket"))
        .withColumn("pb", explode(array(
          masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)))
      val b = v.select(col("vec_id").as("nn_id"), col("e").as("eb"),
        col("nrm").as("nrmb"), col("bucket").as("cb"))
      a.join(b, col("pb") === col("cb") && col("vec_id") =!= col("nn_id"))
        .withColumn("cos", round(dot(col("ea"), col("eb")) / (col("nrma") * col("nrmb")), 4))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("cos").desc, col("nn_id"))).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("vec_id"), col("rnk"), col("nn_id"), col("cos"))
        .orderBy("vec_id", "rnk")
    },

    // q137's bounded oracle mirror (round-8 verdict task 4): the exact
    // oracle replay is an all-pairs bit_count probe — fine at sf0.1,
    // over any DuckDB budget at sf1 (the ENGINE side is probe-bucket
    // equi-joined and completes; the skip was oracle-side). This variant
    // restricts the QUERY side to a deterministic 4% hash sample
    // (md5('kq:'||vec_id) % 25 = 0 — rerun/engine-stable, the q209
    // sampling discipline), leaving the candidate side full, so the
    // identical probe-ball semantics stay hash-verifiable at every scale
    // including sf1. The full arm keeps running at sf1 with its row count
    // recorded; THIS row is the oracle evidence.
    q("q137b_knn_join_sampled",
      "q137's probe-ball kNN on a deterministic 4% query sample — sf1-budget oracle mirror")(
      s"""$bucketCte,
         |n AS (SELECT vec_id, sqrt(list_dot_product(e, e)) AS nrm FROM v),
         |pair AS MATERIALIZED (
         |  -- integer bucket-distance filter FIRST (16M cheap bit_counts at
         |  -- sf1), so the 64-dim dot products only run on the ~1% of pairs
         |  -- inside the probe ball — the ordering that keeps this replay
         |  -- in-budget where q137's form computes the float for every pair
         |  SELECT ba.vec_id AS vec_id, bb.vec_id AS nn_id
         |  FROM bk ba JOIN bk bb
         |    ON bit_count(xor(ba.bucket, bb.bucket)) <= 2
         |   AND ba.vec_id <> bb.vec_id
         |  WHERE ${md5LongSql("'kq:' || ba.vec_id")} % 25 = 0),
         |cand AS (
         |  SELECT p.vec_id, p.nn_id,
         |         round(list_dot_product(va.e, vb.e) / (na.nrm * nb.nrm), 4) AS cos
         |  FROM pair p JOIN v va ON va.vec_id = p.vec_id
         |       JOIN v vb ON vb.vec_id = p.nn_id
         |       JOIN n na ON na.vec_id = p.vec_id
         |       JOIN n nb ON nb.vec_id = p.nn_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                    ORDER BY cos DESC, nn_id) AS rnk FROM cand)
         |SELECT vec_id, CAST(rnk AS BIGINT) AS rnk, nn_id, cos
         |FROM rk WHERE rnk <= 3 ORDER BY vec_id, rnk""".stripMargin
    ) { (s, dir) =>
      import graft.functions.PortableHash.md5Long
      val masks = probeMasks(2)
      val v = withBucket(withNorm(Tables.fanout(s, dir, "embeddings")))
      val a = v.filter(
          md5Long(concat(lit("kq:"), col("vec_id").cast("string"))) % 25 === 0)
        .select(col("vec_id"), col("e").as("ea"),
          col("nrm").as("nrma"), col("bucket"))
        .withColumn("pb", explode(array(
          masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)))
      val b = v.select(col("vec_id").as("nn_id"), col("e").as("eb"),
        col("nrm").as("nrmb"), col("bucket").as("cb"))
      a.join(b, col("pb") === col("cb") && col("vec_id") =!= col("nn_id"))
        .withColumn("cos", round(dot(col("ea"), col("eb")) / (col("nrma") * col("nrmb")), 4))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("cos").desc, col("nn_id"))).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("vec_id"), col("rnk"), col("nn_id"), col("cos"))
        .orderBy("vec_id", "rnk")
    },

    // Grid-accelerated DBSCAN — density clustering without the all-pairs
    // distance matrix: with cell size = ε (=300), every ε-neighbor of a point
    // lies in its 3×3 cell neighborhood, so candidate pairs come from a
    // 9-way cell equi-join (each pair matches on exactly ONE cell — the
    // build side keeps its home cell). Core points (≥ minPts neighbors,
    // self included) cluster via connected components over core-core
    // edges (StarContraction, O(log²n) rounds); border points take the
    // min core-neighbor's label; noise drops. Everything is integer
    // arithmetic — points are synthesized per-nation (centers 5000 apart,
    // 1200-unit hashed spread), distances compared squared in BIGINT —
    // so both engines agree bit-for-bit. Scale shape at 100 TB: candidate
    // volume is Σ per-cell-pair products bounded by density ε² — never
    // n²; the grid join, core filter, and CC are all key-partitioned.
    q("q189_grid_dbscan",
      "DBSCAN(eps=300, minPts=5) via eps-grid candidate join + CC cores + min-label borders")(
      s"""WITH RECURSIVE pts AS (
         |  SELECT c_custkey AS id,
         |         c_nationkey * 5000 + ${md5LongSql("'px:' || c_custkey")} % 1200 AS x,
         |         ${md5LongSql("'py:' || c_custkey")} % 1200 AS y
         |  FROM customer),
         |b AS (SELECT id AS j, x AS xb, y AS yb, x // 300 AS cx, y // 300 AS cy FROM pts),
         |p AS (SELECT id AS i, x AS xa, y AS ya,
         |             x // 300 + dxs.dx AS cx, y // 300 + dys.dy AS cy
         |      FROM pts, (SELECT unnest([-1, 0, 1]) AS dx) dxs,
         |                (SELECT unnest([-1, 0, 1]) AS dy) dys),
         |cand AS (
         |  SELECT i, j FROM p JOIN b USING (cx, cy)
         |  WHERE (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= 90000),
         |cores AS (SELECT i AS id FROM cand GROUP BY i HAVING count(*) >= 5),
         |ce AS (SELECT i, j FROM cand
         |       WHERE i <> j AND i IN (SELECT id FROM cores)
         |         AND j IN (SELECT id FROM cores)),
         |${svClosureSql(8)},
         |border AS (SELECT c.i AS id, min(l.lbl) AS lbl
         |           FROM cand c JOIN clab l ON c.j = l.id
         |           WHERE c.i NOT IN (SELECT id FROM cores)
         |           GROUP BY c.i)
         |SELECT lbl AS cluster, CAST(count(*) AS BIGINT) AS n_pts,
         |       CAST(sum(is_core) AS BIGINT) AS n_core
         |FROM (SELECT lbl, 1 AS is_core FROM clab
         |      UNION ALL SELECT lbl, 0 AS is_core FROM border)
         |GROUP BY lbl ORDER BY cluster""".stripMargin
    ) { (s, dir) =>
      import graft.functions.PortableHash.md5Long
      val eps = 300L; val eps2 = 90000L; val minPts = 5L
      val pts = Tables(s, dir, "customer")
        .select(col("c_custkey").as("id"),
          (col("c_nationkey") * 5000 +
            md5Long(concat(lit("px:"), col("c_custkey").cast("string"))) % 1200).as("x"),
          (md5Long(concat(lit("py:"), col("c_custkey").cast("string"))) % 1200).as("y"))
        .cache() // probe + build legs
      val build = pts.select(col("id").as("j"), col("x").as("xb"), col("y").as("yb"),
        expr(s"x div $eps").as("cx"), expr(s"y div $eps").as("cy"))
      val probe = pts
        .select(col("id").as("i"), col("x").as("xa"), col("y").as("ya"),
          explode(array(lit(-1L), lit(0L), lit(1L))).as("dx"))
        .select(col("i"), col("xa"), col("ya"), col("dx"),
          explode(array(lit(-1L), lit(0L), lit(1L))).as("dy"))
        .select(col("i"), col("xa"), col("ya"),
          (expr(s"xa div $eps") + col("dx")).as("cx"),
          (expr(s"ya div $eps") + col("dy")).as("cy"))
      val cand = probe.join(build, Seq("cx", "cy"))
        .filter((col("xa") - col("xb")) * (col("xa") - col("xb"))
          + (col("ya") - col("yb")) * (col("ya") - col("yb")) <= eps2)
        .select(col("i"), col("j"))
        .cache() // neighbor counts + core edges + border assignment
      val cores = cand.groupBy("i").agg(count(lit(1)).as("n"))
        .filter(col("n") >= minPts).select(col("i").as("id")).cache()
      val coreEdges = cand
        .join(cores.select(col("id").as("i")), Seq("i"), "left_semi")
        .join(cores.select(col("id").as("j")), Seq("j"), "left_semi")
        .filter(col("i") =!= col("j"))
        .select(col("i").as("d1"), col("j").as("d2"))
      // components labels non-isolated cores; a core whose ε-ball holds
      // only border points forms its own singleton cluster (label = id)
      val lab = StarContraction.components(coreEdges)
      val coreLab = cores.join(lab, cores("id") === lab("doc_id"), "left")
        .select(col("id"), coalesce(col("component"), col("id")).as("lbl"))
        .cache()
      val border = cand
        .join(cores.select(col("id").as("i")), Seq("i"), "left_anti")
        .join(coreLab.select(col("id").as("j"), col("lbl")), Seq("j"))
        .groupBy("i").agg(min(col("lbl")).as("lbl"))
      coreLab.select(col("lbl"), lit(1L).as("is_core"))
        .unionByName(border.select(col("lbl"), lit(0L).as("is_core")))
        .groupBy("lbl")
        .agg(count(lit(1)).as("n_pts"), sum(col("is_core")).as("n_core"))
        .select(col("lbl").as("cluster"), col("n_pts"), col("n_core"))
        .orderBy("cluster")
    },

    // q189's 100 TB arm (round-8 verdict task): exact grid DBSCAN's candidate
    // volume is density-quadratic BY DEFINITION — fixed ε over a fixed-area
    // fixture means 10× points ⇒ ~100× pairs (measured 30.4× cost at the sf1
    // 10× step), and any exact execution must enumerate them. This variant
    // bounds density at the source: each ε-cell contributes at most K=32
    // NEIGHBOR candidates, selected in portable hash order (md5('cap:'||id),
    // deterministic and engine-agnostic, the q151b pigeonhole discipline) —
    // candidate volume is ≤ 9·K·n, LINEAR in n at any density. Every point
    // is still classified (the probe side is uncapped); approximation
    // semantics: neighbor counts are lower bounds over the per-cell sample,
    // so very dense cells may under-detect cores/merge-paths — the standard
    // sampled-DBSCAN trade, stated here and replayed IDENTICALLY by the
    // oracle (same hash order ⇒ same sample ⇒ bit-equal output).
    q("q189b_grid_dbscan_capped",
      "grid DBSCAN with a deterministic per-cell candidate cap (K=32, portable hash order) — density-bounded linear candidate volume")(
      s"""WITH RECURSIVE pts AS (
         |  SELECT c_custkey AS id,
         |         c_nationkey * 5000 + ${md5LongSql("'px:' || c_custkey")} % 1200 AS x,
         |         ${md5LongSql("'py:' || c_custkey")} % 1200 AS y
         |  FROM customer),
         |ball AS (SELECT id AS j, x AS xb, y AS yb, x // 300 AS cx, y // 300 AS cy FROM pts),
         |b AS (SELECT j, xb, yb, cx, cy FROM (
         |        SELECT *, row_number() OVER (PARTITION BY cx, cy
         |          ORDER BY ${md5LongSql("'cap:' || j")}, j) AS rnk FROM ball)
         |      WHERE rnk <= 32),
         |p AS (SELECT id AS i, x AS xa, y AS ya,
         |             x // 300 + dxs.dx AS cx, y // 300 + dys.dy AS cy
         |      FROM pts, (SELECT unnest([-1, 0, 1]) AS dx) dxs,
         |                (SELECT unnest([-1, 0, 1]) AS dy) dys),
         |cand AS (
         |  SELECT i, j FROM p JOIN b USING (cx, cy)
         |  WHERE (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= 90000),
         |cores AS (SELECT i AS id FROM cand GROUP BY i HAVING count(*) >= 5),
         |cc0 AS (SELECT i, j FROM cand
         |        WHERE i <> j AND i IN (SELECT id FROM cores)
         |          AND j IN (SELECT id FROM cores)),
         |-- the cap makes cand ASYMMETRIC (probe side uncapped, build side
         |-- capped); core reachability is undirected, so symmetrize before
         |-- propagating — otherwise every uncapped core self-labels
         |ce AS (SELECT i, j FROM cc0 UNION SELECT j AS i, i AS j FROM cc0),
         |${svClosureSql(20)},
         |border AS (SELECT c.i AS id, min(l.lbl) AS lbl
         |           FROM cand c JOIN clab l ON c.j = l.id
         |           WHERE c.i NOT IN (SELECT id FROM cores)
         |           GROUP BY c.i)
         |SELECT lbl AS cluster, CAST(count(*) AS BIGINT) AS n_pts,
         |       CAST(sum(is_core) AS BIGINT) AS n_core
         |FROM (SELECT lbl, 1 AS is_core FROM clab
         |      UNION ALL SELECT lbl, 0 AS is_core FROM border)
         |GROUP BY lbl ORDER BY cluster""".stripMargin
    ) { (s, dir) =>
      import graft.functions.PortableHash.md5Long
      val eps = 300L; val eps2 = 90000L; val minPts = 5L; val cap = 32L
      val pts = Tables(s, dir, "customer")
        .select(col("c_custkey").as("id"),
          (col("c_nationkey") * 5000 +
            md5Long(concat(lit("px:"), col("c_custkey").cast("string"))) % 1200).as("x"),
          (md5Long(concat(lit("py:"), col("c_custkey").cast("string"))) % 1200).as("y"))
        .cache()
      // per-cell NEIGHBOR sample: ≤ cap build rows per ε-cell, hash-ordered
      val build = graft.plans.TopKPerKey.topK(
        pts.select(col("id").as("j"), col("x").as("xb"), col("y").as("yb"),
          expr(s"x div $eps").as("cx"), expr(s"y div $eps").as("cy"),
          md5Long(concat(lit("cap:"), col("id").cast("string"))).as("capk")),
        Seq(col("cx"), col("cy")), Seq(col("capk"), col("j")), cap.toInt)
        .drop("capk")
      val probeExp = pts
        .select(col("id").as("i"), col("x").as("xa"), col("y").as("ya"),
          explode(array(lit(-1L), lit(0L), lit(1L))).as("dx"))
        .select(col("i"), col("xa"), col("ya"), col("dx"),
          explode(array(lit(-1L), lit(0L), lit(1L))).as("dy"))
        .select(col("i"), col("xa"), col("ya"),
          (expr(s"xa div $eps") + col("dx")).as("cx"),
          (expr(s"ya div $eps") + col("dy")).as("cy"))
      val cand = probeExp.join(build, Seq("cx", "cy"))
        .filter((col("xa") - col("xb")) * (col("xa") - col("xb"))
          + (col("ya") - col("yb")) * (col("ya") - col("yb")) <= eps2)
        .select(col("i"), col("j"))
        .cache()
      val cores = cand.groupBy("i").agg(count(lit(1)).as("n"))
        .filter(col("n") >= minPts).select(col("i").as("id")).cache()
      val coreEdges = cand
        .join(cores.select(col("id").as("i")), Seq("i"), "left_semi")
        .join(cores.select(col("id").as("j")), Seq("j"), "left_semi")
        .filter(col("i") =!= col("j"))
        .select(col("i").as("d1"), col("j").as("d2"))
      val lab = StarContraction.components(coreEdges)
      val coreLab = cores.join(lab, cores("id") === lab("doc_id"), "left")
        .select(col("id"), coalesce(col("component"), col("id")).as("lbl"))
        .cache()
      val border = cand
        .join(cores.select(col("id").as("i")), Seq("i"), "left_anti")
        .join(coreLab.select(col("id").as("j"), col("lbl")), Seq("j"))
        .groupBy("i").agg(min(col("lbl")).as("lbl"))
      coreLab.select(col("lbl"), lit(1L).as("is_core"))
        .unionByName(border.select(col("lbl"), lit(0L).as("is_core")))
        .groupBy("lbl")
        .agg(count(lit(1)).as("n_pts"), sum(col("is_core")).as("n_core"))
        .select(col("lbl").as("cluster"), col("n_pts"), col("n_core"))
        .orderBy("cluster")
    },

    // q189's bounded oracle mirror (round-8 verdict task 4, the q137b
    // twin): the exact arm's DuckDB replay dies at sf1 in the RECURSIVE
    // core-reachability closure (every core row-reaches its whole
    // component — quadratic in component size), while the engine's
    // StarContraction completes in seconds. This mirror runs the exact
    // algorithm — uncapped neighbors, exact reachability — on a FIXED
    // deterministic sub-instance: nations 0-2, every 4th key, which keeps
    // the component sizes (and so the closure) inside any DuckDB budget at
    // sf1 while exercising the identical pipeline. The full exact arm
    // keeps running at sf1 with its row count recorded; this row is the
    // at-scale oracle evidence for the exact semantics.
    q("q189c_grid_dbscan_region",
      "q189's exact DBSCAN on a fixed sub-region (nations 0-2, every 4th key) — sf1-budget oracle mirror")(
      s"""WITH RECURSIVE pts AS (
         |  SELECT c_custkey AS id,
         |         c_nationkey * 5000 + ${md5LongSql("'px:' || c_custkey")} % 1200 AS x,
         |         ${md5LongSql("'py:' || c_custkey")} % 1200 AS y
         |  FROM customer WHERE c_nationkey < 3 AND c_custkey % 4 = 0),
         |b AS (SELECT id AS j, x AS xb, y AS yb, x // 300 AS cx, y // 300 AS cy FROM pts),
         |p AS (SELECT id AS i, x AS xa, y AS ya,
         |             x // 300 + dxs.dx AS cx, y // 300 + dys.dy AS cy
         |      FROM pts, (SELECT unnest([-1, 0, 1]) AS dx) dxs,
         |                (SELECT unnest([-1, 0, 1]) AS dy) dys),
         |cand AS (
         |  SELECT i, j FROM p JOIN b USING (cx, cy)
         |  WHERE (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= 90000),
         |cores AS (SELECT i AS id FROM cand GROUP BY i HAVING count(*) >= 5),
         |ce AS (SELECT i, j FROM cand
         |       WHERE i <> j AND i IN (SELECT id FROM cores)
         |         AND j IN (SELECT id FROM cores)),
         |${svClosureSql(20)},
         |border AS (SELECT c.i AS id, min(l.lbl) AS lbl
         |           FROM cand c JOIN clab l ON c.j = l.id
         |           WHERE c.i NOT IN (SELECT id FROM cores)
         |           GROUP BY c.i)
         |SELECT lbl AS cluster, CAST(count(*) AS BIGINT) AS n_pts,
         |       CAST(sum(is_core) AS BIGINT) AS n_core
         |FROM (SELECT lbl, 1 AS is_core FROM clab
         |      UNION ALL SELECT lbl, 0 AS is_core FROM border)
         |GROUP BY lbl ORDER BY cluster""".stripMargin
    ) { (s, dir) =>
      import graft.functions.PortableHash.md5Long
      val eps = 300L; val eps2 = 90000L; val minPts = 5L
      val pts = Tables(s, dir, "customer")
        .filter(col("c_nationkey") < 3 && col("c_custkey") % 4 === 0)
        .select(col("c_custkey").as("id"),
          (col("c_nationkey") * 5000 +
            md5Long(concat(lit("px:"), col("c_custkey").cast("string"))) % 1200).as("x"),
          (md5Long(concat(lit("py:"), col("c_custkey").cast("string"))) % 1200).as("y"))
        .cache() // probe + build legs
      val build = pts.select(col("id").as("j"), col("x").as("xb"), col("y").as("yb"),
        expr(s"x div $eps").as("cx"), expr(s"y div $eps").as("cy"))
      val probeFull = pts
        .select(col("id").as("i"), col("x").as("xa"), col("y").as("ya"),
          explode(array(lit(-1L), lit(0L), lit(1L))).as("dx"))
        .select(col("i"), col("xa"), col("ya"), col("dx"),
          explode(array(lit(-1L), lit(0L), lit(1L))).as("dy"))
        .select(col("i"), col("xa"), col("ya"),
          (expr(s"xa div $eps") + col("dx")).as("cx"),
          (expr(s"ya div $eps") + col("dy")).as("cy"))
      val cand = probeFull.join(build, Seq("cx", "cy"))
        .filter((col("xa") - col("xb")) * (col("xa") - col("xb"))
          + (col("ya") - col("yb")) * (col("ya") - col("yb")) <= eps2)
        .select(col("i"), col("j"))
        .cache() // neighbor counts + core edges + border assignment
      val cores = cand.groupBy("i").agg(count(lit(1)).as("n"))
        .filter(col("n") >= minPts).select(col("i").as("id")).cache()
      val coreEdges = cand
        .join(cores.select(col("id").as("i")), Seq("i"), "left_semi")
        .join(cores.select(col("id").as("j")), Seq("j"), "left_semi")
        .filter(col("i") =!= col("j"))
        .select(col("i").as("d1"), col("j").as("d2"))
      val lab = StarContraction.components(coreEdges)
      val coreLab = cores.join(lab, cores("id") === lab("doc_id"), "left")
        .select(col("id"), coalesce(col("component"), col("id")).as("lbl"))
        .cache()
      val border = cand
        .join(cores.select(col("id").as("i")), Seq("i"), "left_anti")
        .join(coreLab.select(col("id").as("j"), col("lbl")), Seq("j"))
        .groupBy("i").agg(min(col("lbl")).as("lbl"))
      coreLab.select(col("lbl"), lit(1L).as("is_core"))
        .unionByName(border.select(col("lbl"), lit(0L).as("is_core")))
        .groupBy("lbl")
        .agg(count(lit(1)).as("n_pts"), sum(col("is_core")).as("n_core"))
        .select(col("lbl").as("cluster"), col("n_pts"), col("n_core"))
        .orderBy("cluster")
    },

    // Distributed PCA, top component by power iteration — the
    // linear-algebra member of the scale library. Two regimes, cleanly
    // split: the DATA-SIZED part (the 64×64 gram matrix) is ONE
    // partial-aggregated groupBy over exploded (i, j) coordinate products
    // in order-free DECIMAL (Catalyst's map-side combine gives exactly the
    // per-partition-outer-products-then-merge treeAggregate shape — the
    // shuffle carries parts·d² cells, never rows·d²); the FIXED-SIZE part
    // (8 power rounds over d² + d doubles) packs into ONE row and runs as
    // row-local sequential folds — zero per-round jobs, shuffles, or
    // driver round-trips, because constant-size math deserves no
    // distributed machinery. Float determinism: gram cells are decimal
    // sums; each round's matvec/norm is a SEQUENTIAL left fold over
    // round(·,12)-ed products (aggregate ≙ list_reduce — the proven
    // bit-identical q127 pattern) and the vector re-rounds to 6 dp after
    // the IEEE-identical normalize; v0 = 1/√64 = 0.125 exactly. The
    // oracle replays the identical 8 rounds as materialized CTEs.
    q("q195_pca_power",
      "top principal component of the embeddings via 8 row-local-exact power iterations")({
      val d = 64
      def roundCte(r: Int): String = {
        val wExpr =
          s"""list_transform(generate_series(0, ${d - 1}), i ->
             |        list_reduce(list_prepend(CAST(0 AS DOUBLE),
             |          list_transform(generate_series(0, ${d - 1}), j ->
             |            round(gm[i + 1][j + 1] * v[j + 1], 12))), (a, x) -> a + x))""".stripMargin
        s"""r$r AS MATERIALIZED (
           |  SELECT gm, list_transform(w, x -> round(x / nrm, 6)) AS v, nrm
           |  FROM (SELECT gm, w,
           |               sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |                 list_transform(w, x -> round(x * x, 12))), (a, x) -> a + x)) AS nrm
           |        FROM (SELECT gm, v, $wExpr AS w FROM r${r - 1})))""".stripMargin
      }
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
         |           FROM embeddings),
         |px AS (SELECT vec_id, i, e[i + 1] AS xi
         |       FROM e CROSS JOIN (SELECT unnest(generate_series(0, ${d - 1})) AS i) ii),
         |g AS MATERIALIZED (
         |  SELECT a.i AS i, b.i AS j,
         |         CAST(sum(CAST(round(a.xi * b.xi * 1000000000000) AS BIGINT)) AS DOUBLE)
         |           / 1000000000000 AS g
         |  FROM px a JOIN px b USING (vec_id) GROUP BY a.i, b.i),
         |garr AS (SELECT i, list(g ORDER BY j) AS row FROM g GROUP BY i),
         |r0 AS (SELECT list(row ORDER BY i) AS gm,
         |              list_transform(generate_series(0, ${d - 1}), x -> CAST(0.125 AS DOUBLE)) AS v,
         |              CAST(0 AS DOUBLE) AS nrm
         |       FROM garr),
         |${(1 to 8).map(roundCte).mkString(",\n")}
         |SELECT CAST(i AS BIGINT) AS i, v[i + 1] AS loading, round(nrm, 4) AS lam
         |FROM r8 CROSS JOIN (SELECT unnest(generate_series(0, ${d - 1})) AS i) ii
         |ORDER BY i""".stripMargin
    }) { (s, dir) =>
      val px = Tables(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(transform(col("embedding"), _.cast("double"))))
        .select(col("vec_id"), col("pos").as("i"), col("col").as("xi"))
      // gram cells in integer 10^-12 units: products scale to ~1e10, cell
      // sums stay < ~1e15 — inside both the BIGINT range and the 2^53
      // double-exact window (audited for this corpus; re-scale for a
      // bigger one). A DECIMAL(28,12) sum is equally exact but runs the
      // interpreted decimal path — 14s vs ~2s here, measured.
      val gram = px.select(col("vec_id"), col("i"), col("xi"))
        .join(px.select(col("vec_id"), col("i").as("j"), col("xi").as("xj")), Seq("vec_id"))
        .groupBy("i", "j")
        .agg((sum(round(col("xi") * col("xj") * 1000000000000L).cast("long"))
          .cast("double") / 1000000000000L).as("g"))
      // pack the fixed-size d² state into one row: per-i j-ordered rows,
      // then an i-ordered row-of-rows (array_sort on (key, value) structs
      // orders by the leading key)
      var one = gram
        .groupBy("i").agg(array_sort(collect_list(struct(col("j"), col("g")))).as("row"))
        .select(col("i"), expr("transform(row, s -> s.g)").as("row"))
        .groupBy().agg(array_sort(collect_list(struct(col("i"), col("row")))).as("rows"))
        .select(expr("transform(rows, s -> s.row)").as("gm"))
        .withColumn("v", expr("transform(sequence(0, 63), x -> 0.125D)"))
        .withColumn("nrm", lit(0.0))
      for (_ <- 1 to 8) {
        one = one
          .withColumn("w", expr(
            "transform(sequence(0, 63), i -> aggregate(" +
              "transform(sequence(0, 63), j -> round(gm[i][j] * v[j], 12)), " +
              "0.0D, (a, x) -> a + x))"))
          .withColumn("nrm", expr(
            "sqrt(aggregate(transform(w, x -> round(x * x, 12)), 0.0D, (a, x) -> a + x))"))
          .withColumn("v", expr("transform(w, x -> round(x / nrm, 6))"))
          .drop("w")
          // lazy checkpoint + a 1-row count per round. The checkpoint is a
          // HARD barrier: without one CollapseProject inlines w into nrm
          // and v (and keeps inlining straight through repartitions), and
          // the expression tree doubles per round — 2^8 duplicated
          // interpreted HOF evals hang the query. The count materializes
          // the checkpointed RDD (full rows — no aggregate pruning), so
          // each round is one 1-row job (~0.1s, measured).
          .localCheckpoint(false)
        one.count()
      }
      one.select(col("nrm"), posexplode(col("v")).as(Seq("i", "loading")))
        .select(col("i").cast("long").as("i"), col("loading"),
          round(col("nrm"), 4).as("lam"))
        .orderBy("i")
    },

    // MMR diversified re-rank — the standard post-retrieval stage (Carbonell
    // & Goldstein '98): from the ANN head's top-20 relevance candidates,
    // greedily pick 5 maximizing λ·rel(c) − (1−λ)·max_{s∈S} sim(c,s), λ=0.7.
    // The DISTRIBUTED work is the retrieval scan (one pass, TakeOrdered 20)
    // and the k×(k−1) candidate-pair cosines; the greedy argmax chain then
    // runs on the DRIVER over the collected ≤k+k(k−1)=400-row head — bounded
    // by the candidate count by construction, never the corpus (the
    // LayoutWriter discipline; 4 chained limit(1) Spark jobs for 5-of-20
    // measured 4.3 s of pure scheduling overhead). Cosines go through the
    // codegen'd CosineSimilarity fold — bit-identical to the oracle's
    // list_dot_product — and the driver greedy applies the same IEEE
    // 0.7·rel − 0.3·maxsim doubles with the same cid tiebreak, so the chain
    // matches the recursive-CTE oracle at both scales.
    q("q199_mmr_rerank",
      "MMR diversified top-5 from cosine top-20 (λ=0.7), greedy argmax chain")(
      """WITH RECURSIVE
        |v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
        |n AS (SELECT vec_id, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |qv AS (SELECT e, nrm FROM v JOIN n USING (vec_id) WHERE vec_id = 0),
        |cand AS (SELECT c.vec_id AS cid, c.e, nc.nrm,
        |                list_dot_product(q.e, c.e) / (q.nrm * nc.nrm) AS rel
        |         FROM v c JOIN n nc ON nc.vec_id = c.vec_id, qv q
        |         WHERE c.vec_id <> 0
        |         ORDER BY rel DESC, cid LIMIT 20),
        |sim AS (SELECT a.cid AS a, b.cid AS b,
        |               list_dot_product(a.e, b.e) / (a.nrm * b.nrm) AS cs
        |        FROM cand a, cand b WHERE a.cid <> b.cid),
        |sel AS (
        |  (SELECT 1 AS step, cid, 0.7 * rel AS score, [cid] AS picked
        |   FROM cand ORDER BY rel DESC, cid LIMIT 1)
        |  UNION ALL
        |  SELECT sel.step + 1, nxt.cid, nxt.score, list_append(sel.picked, nxt.cid)
        |  FROM sel, LATERAL (
        |    SELECT c.cid,
        |           0.7 * c.rel - 0.3 * (SELECT max(s.cs) FROM sim s
        |                                WHERE s.a = c.cid AND list_contains(sel.picked, s.b)) AS score
        |    FROM cand c WHERE NOT list_contains(sel.picked, c.cid)
        |    ORDER BY score DESC, c.cid LIMIT 1) nxt
        |  WHERE sel.step < 5)
        |SELECT CAST(step AS BIGINT) AS rnk, CAST(cid AS BIGINT) AS cid,
        |       round(score, 4) + 0 AS mmr
        |FROM sel ORDER BY rnk""".stripMargin
    ) { (s, dir) =>
      import graft.expressions.VectorFunctions.cosine
      val emb = Tables.fanout(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      val cand = emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv)) // 1-row query-vector frame × the scan
        .select(col("vec_id").as("cid"), col("embedding").as("e"),
          cosine(col("qe"), col("embedding")).as("rel"))
        .orderBy(col("rel").desc, col("cid")).limit(20)
        .cache() // ≤20 rows — candidate head, bounded by k not data
      val rels = cand.select(col("cid"), col("rel")).collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      val sims = cand.select(col("cid").as("a"), col("e").as("ea"))
        .join(cand.select(col("cid").as("b"), col("e").as("eb")), col("a") =!= col("b"))
        .select(col("a"), col("b"), cosine(col("ea"), col("eb")).as("cs"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      // driver-side greedy over the ≤400-row head (bounded by k²)
      val first = rels.minBy { case (cid, rel) => (-rel, cid) }
      val picked = scala.collection.mutable.ArrayBuffer(
        (1L, first._1, 0.7 * first._2))
      for (k <- 2 to 5) {
        val chosen = picked.map(_._2).toSet
        val (cid, score) = rels.filterNot(c => chosen(c._1))
          .map { case (cid, rel) =>
            val ms = chosen.iterator.map(p => sims((cid, p))).max
            (cid, 0.7 * rel - 0.3 * ms)
          }
          .minBy { case (cid, sc) => (-sc, cid) }
        picked += ((k.toLong, cid, score))
      }
      import s.implicits._
      picked.toSeq.toDF("rnk", "cid", "mmr")
        .select(col("rnk"), col("cid"), round(col("mmr"), 4).as("mmr"))
        .orderBy("rnk")
    },

    // kNN classification — the non-parametric member of the eval suite
    // (next to the trained gate q197/q200/q201): predict each held-out
    // vector's label as the majority vote of its 5 exact-cosine nearest
    // TRAIN neighbors, and report the label confusion matrix. Held-out
    // slice = vec_id < 100 (a BOUNDED broadcast frame — the scan stays
    // linear in the corpus, never n²); per-query top-5 runs through the
    // NATIVE TopKPerKeyExec (O(n log k) heaps + k-bounded exchange — no
    // per-query partition sort anywhere); the majority vote folds
    // (count, label) into one BIGINT max with smallest-label tie-break
    // (q183's mode encoding — no argmax tie-order contract). At real scale
    // the exact-scan leg swaps for IVF candidate generation (q35g) with
    // the identical vote/confusion tail. Cosines are the codegen fold ≙
    // list_dot_product, ranks tie-break on cid — fully deterministic.
    q("q206_knn_classifier",
      "5-NN majority-vote label prediction for 100 held-out vectors: confusion matrix")(
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
        |n AS (SELECT vec_id, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |q AS (SELECT v.vec_id AS qid, v.e, n.nrm FROM v JOIN n USING (vec_id) WHERE vec_id < 100),
        |t AS (SELECT v.vec_id AS cid, v.e, n.nrm, em.label
        |      FROM v JOIN n USING (vec_id) JOIN embeddings em ON em.vec_id = v.vec_id
        |      WHERE v.vec_id >= 100),
        |sc AS (SELECT q.qid, t.cid, t.label,
        |              list_dot_product(q.e, t.e) / (q.nrm * t.nrm) AS cs
        |       FROM q, t),
        |top AS (SELECT qid, label FROM
        |          (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cs DESC, cid) AS rn
        |           FROM sc)
        |        WHERE rn <= 5),
        |vote AS (SELECT qid, label AS lab, CAST(count(*) AS BIGINT) AS cnt
        |         FROM top GROUP BY qid, label),
        |pred AS (SELECT qid, 999 - (m % 1000) AS plab
        |         FROM (SELECT qid, max(cnt * 1000 + (999 - lab)) AS m FROM vote GROUP BY qid)),
        |tru AS (SELECT vec_id AS qid, label FROM embeddings WHERE vec_id < 100)
        |SELECT CAST(t.label AS BIGINT) AS true_label, CAST(p.plab AS BIGINT) AS pred_label,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM tru t JOIN pred p USING (qid)
        |GROUP BY 1, 2 ORDER BY true_label, pred_label""".stripMargin
    ) { (s, dir) =>
      import graft.expressions.VectorFunctions.cosine
      val emb = Tables.fanout(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val tr = emb.filter(col("vec_id") >= 100)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("label"))
      val sc = tr.crossJoin(broadcast(qs)) // 100-row held-out frame × train scan
        .select(col("qid"), col("cid"), col("label"),
          cosine(col("qe"), col("ce")).as("cs"))
      val top = graft.plans.TopKPerKey
        .topK(sc, Seq(col("qid")), Seq(col("cs").desc, col("cid")), 5)
        .select("qid", "label")
      val vote = top.groupBy("qid", "label").agg(count(lit(1)).as("cnt"))
      val pred = vote.groupBy("qid")
        .agg(max(col("cnt") * 1000 + (lit(999) - col("label"))).as("m"))
        .select(col("qid"), (lit(999) - (col("m") % 1000)).as("plab"))
      val tru = emb.filter(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), col("label").as("true_label"))
      tru.join(pred, "qid")
        .groupBy(col("true_label").cast("long").as("true_label"),
          col("plab").cast("long").as("pred_label"))
        .agg(count(lit(1)).as("n"))
        .orderBy("true_label", "pred_label")
    },

    // Cluster-quality evaluation: PURITY of the q35f k-means clustering
    // against the ground-truth labels — per cluster, the majority label's
    // share in exact integer milli-units (purity = Σ majority / n is the
    // standard external clustering metric; computing it per cluster keeps
    // every output row integer-exact and the global number one trivial
    // roll-up away). Reuses the full deterministic Lloyd chain, then ONE
    // (cent, label) grouped count — |K·labels| rows, metadata-scale at any
    // corpus size — and the q183 mode encoding picks each cluster's
    // majority with smallest-label tie-break. 100 TB shape: the only
    // row-scale work is the assignment scan the clustering already does;
    // the purity tail never touches raw vectors.
    q("q207_cluster_purity",
      "per-cluster purity of the 2-iter k-means clustering vs true labels (milli)")(
      s"""$kmeansCte,
         |mem AS (SELECT a.vec_id, a.cent, em.label
         |        FROM a$KmeansIters a JOIN embeddings em USING (vec_id)),
         |cl AS (SELECT cent, label, CAST(count(*) AS BIGINT) AS cnt FROM mem GROUP BY cent, label),
         |maj AS (SELECT cent, max(cnt * 1000 + (999 - label)) AS m,
         |               CAST(sum(cnt) AS BIGINT) AS sz FROM cl GROUP BY cent)
         |SELECT CAST(cent AS BIGINT) AS cent, sz AS csize,
         |       CAST(999 - (m % 1000) AS BIGINT) AS major_label,
         |       CAST(m // 1000 AS BIGINT) AS major_cnt,
         |       CAST((1000 * (m // 1000)) // sz AS BIGINT) AS purity_milli
         |FROM maj ORDER BY cent""".stripMargin
    ) { (s, dir) =>
      val emb = Tables.fanout(s, dir, "embeddings")
      val assign = kmeansFinalAssign(emb).select("vec_id", "cent")
      val cl = assign.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("cent", "label").agg(count(lit(1)).as("cnt"))
      cl.groupBy("cent")
        .agg(max(col("cnt") * 1000 + (lit(999) - col("label"))).as("m"),
          sum(col("cnt")).as("sz"))
        .select(col("cent").cast("long").as("cent"), col("sz").as("csize"),
          (lit(999) - (col("m") % 1000)).cast("long").as("major_label"),
          expr("m div 1000").cast("long").as("major_cnt"),
          expr("(1000 * (m div 1000)) div sz").cast("long").as("purity_milli"))
        .orderBy("cent")
    },

    // PERSISTED ANN index + partition-pruned search — the storage half of
    // the IVF story (q160b's layout-loop discipline applied to vectors):
    // the k-means assignment is WRITTEN as a parquet index partitioned by
    // centroid id, and the search reads it back with `cent IN (probes)` —
    // a PARTITION filter, so only the probed centroids' files are opened
    // (VectorIndexPruningSpec pins PartitionFilters on the scan). Results
    // are q35g's exact 2-probe top-3 — the oracle re-derives them from the
    // Lloyd chain alone, which also proves the index round-trips the
    // assignment losslessly. At fixture scale K=8 so pruning is mild; at
    // production K (thousands of lists), 2·|queries| probed partitions vs
    // K is the entire IVF query-time win, and this layout is how the index
    // survives across jobs instead of being recomputed per query.
    q("q216_vector_index_readback",
      "write the IVF index partitioned by centroid, search via partition-pruned read-back")(
      s"""$kmeansCte,
         |p AS (SELECT vec_id AS qid, cent FROM
         |        (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent) AS rn
         |         FROM s$KmeansIters)
         |      WHERE rn <= 2 AND vec_id < 10),
         |cand AS (SELECT DISTINCT p.qid, m.vec_id AS cid
         |         FROM p JOIN a$KmeansIters m ON m.cent = p.cent AND m.vec_id <> p.qid),
         |sc AS (SELECT cand.qid, cand.cid,
         |              list_dot_product(q.e, c.e) / (nq.nrm * nc.nrm) AS cs
         |       FROM cand JOIN v q ON q.vec_id = cand.qid
         |            JOIN v c ON c.vec_id = cand.cid
         |            JOIN n nq ON nq.vec_id = cand.qid
         |            JOIN n nc ON nc.vec_id = cand.cid)
         |SELECT qid, cid, round(cs, 4) + 0 AS cos, CAST(rn AS BIGINT) AS rn
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cs DESC, cid) AS rn FROM sc)
         |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
    ) { (s, dir) =>
      indexReadbackSearch(s, dir)
    },

    // ANN quality SCORECARD — recall@3 of three index families against the
    // exact top-3, as an oracle-checked QUERY rather than a spec
    // assertion: the number a 100 TB retrieval deployment actually tunes
    // (probes, planes, lists) against, computed by the engine itself so
    // the quality audit ships with the pipeline. Each method's candidate
    // generation is the same construction its dedicated query uses (q35c
    // multi-probe LSH, q35e seed-IVF 2-probe, q35g Lloyd-IVF 2-probe);
    // hits are the (qid, cid) intersection with the brute-force top-3 and
    // recall_milli = hits·1000/30 over the 10 query vectors. Both engines
    // derive every leg independently — the hash match proves the recall
    // numbers, not just the plumbing.
    q("q227_ann_scorecard",
      "recall@3 of LSH / seed-IVF / k-means-IVF vs exact top-3, as one audited query")(
      s"""$kmeansCte,
         |${bucketCte.split("\n", 2)(1)},
         |xs AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |              list_dot_product(q.e, c.e) / (nq.nrm * nc.nrm) AS cs
         |       FROM v q JOIN n nq ON nq.vec_id = q.vec_id,
         |            v c JOIN n nc ON nc.vec_id = c.vec_id
         |       WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
         |ex AS (SELECT qid, cid FROM (SELECT *, row_number() OVER
         |         (PARTITION BY qid ORDER BY cs DESC, cid) AS rn FROM xs) WHERE rn <= 3),
         |lp AS (SELECT q.vec_id AS qid, xor(q.bucket, r.m) AS pb
         |       FROM bk q CROSS JOIN range(${1 << NumPlanes}) AS r(m)
         |       WHERE q.vec_id < 10 AND bit_count(r.m) <= 2),
         |lsc AS (SELECT DISTINCT lp.qid, c.vec_id AS cid,
         |              list_dot_product(qv.e, cv.e) / (nq.nrm * nc.nrm) AS cs
         |        FROM lp JOIN bk c ON c.bucket = lp.pb AND c.vec_id <> lp.qid
         |             JOIN v qv ON qv.vec_id = lp.qid JOIN v cv ON cv.vec_id = c.vec_id
         |             JOIN n nq ON nq.vec_id = lp.qid JOIN n nc ON nc.vec_id = c.vec_id),
         |lt AS (SELECT qid, cid FROM (SELECT *, row_number() OVER
         |         (PARTITION BY qid ORDER BY cs DESC, cid) AS rn FROM lsc) WHERE rn <= 3),
         |ivs AS (SELECT x.vec_id, c.vec_id AS cent,
         |              row_number() OVER (PARTITION BY x.vec_id
         |                ORDER BY list_dot_product(x.e, c.e) / (nx.nrm * nc.nrm) DESC,
         |                         c.vec_id) AS rn
         |        FROM v x JOIN n nx ON nx.vec_id = x.vec_id,
         |             v c JOIN n nc ON nc.vec_id = c.vec_id WHERE c.vec_id < $K),
         |ivm AS (SELECT vec_id AS cid, cent FROM ivs WHERE rn = 1),
         |ivp AS (SELECT vec_id AS qid, cent FROM ivs WHERE rn <= 2 AND vec_id < 10),
         |ivc AS (SELECT DISTINCT p.qid, m.cid
         |        FROM ivp p JOIN ivm m ON m.cent = p.cent AND m.cid <> p.qid),
         |ivsc AS (SELECT ivc.qid, ivc.cid,
         |               list_dot_product(q.e, c.e) / (nq.nrm * nc.nrm) AS cs
         |         FROM ivc JOIN v q ON q.vec_id = ivc.qid JOIN v c ON c.vec_id = ivc.cid
         |              JOIN n nq ON nq.vec_id = ivc.qid JOIN n nc ON nc.vec_id = ivc.cid),
         |ivt AS (SELECT qid, cid FROM (SELECT *, row_number() OVER
         |         (PARTITION BY qid ORDER BY cs DESC, cid) AS rn FROM ivsc) WHERE rn <= 3),
         |kp AS (SELECT vec_id AS qid, cent FROM
         |         (SELECT *, row_number() OVER (PARTITION BY vec_id
         |            ORDER BY cs DESC, cent) AS rn FROM s$KmeansIters)
         |       WHERE rn <= 2 AND vec_id < 10),
         |kc AS (SELECT DISTINCT kp.qid, m.vec_id AS cid
         |       FROM kp JOIN a$KmeansIters m ON m.cent = kp.cent AND m.vec_id <> kp.qid),
         |ksc AS (SELECT kc.qid, kc.cid,
         |              list_dot_product(q.e, c.e) / (nq.nrm * nc.nrm) AS cs
         |        FROM kc JOIN v q ON q.vec_id = kc.qid JOIN v c ON c.vec_id = kc.cid
         |             JOIN n nq ON nq.vec_id = kc.qid JOIN n nc ON nc.vec_id = kc.cid),
         |kt AS (SELECT qid, cid FROM (SELECT *, row_number() OVER
         |         (PARTITION BY qid ORDER BY cs DESC, cid) AS rn FROM ksc) WHERE rn <= 3),
         |h AS (SELECT 'ivf_seed' AS method, count(*) AS h3 FROM ivt JOIN ex USING (qid, cid)
         |      UNION ALL SELECT 'kmeans_ivf', count(*) FROM kt JOIN ex USING (qid, cid)
         |      UNION ALL SELECT 'lsh', count(*) FROM lt JOIN ex USING (qid, cid))
         |SELECT method, CAST(h3 AS BIGINT) AS hits3,
         |       CAST(h3 * 1000 // 30 AS BIGINT) AS recall_milli
         |FROM h ORDER BY method""".stripMargin
    ) { (s, dir) =>
      val v = withNorm(Tables.fanout(s, dir, "embeddings")).cache()
      val wq = Window.partitionBy(col("qid")).orderBy(col("cs").desc, col("cid"))
      def top3(scored: DataFrame): DataFrame = scored
        .withColumn("rn", row_number().over(wq)).filter(col("rn") <= 3)
        .select("qid", "cid")
      val qs = v.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"))
      val ex = top3(v
        .select(col("vec_id").as("cid"), col("e").as("ce"), col("nrm").as("cn"))
        .join(broadcast(qs), col("cid") =!= col("qid"))
        .withColumn("cs", dot(col("qe"), col("ce")) / (col("qn") * col("cn"))))
        .cache() // one exact leg, three intersections
      // LSH (q35c's construction)
      val vb = withBucket(v)
      val lq = vb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"),
          col("bucket"), explode(array(probeMasks(2).map(lit): _*)).as("m"))
        .withColumn("pb", col("m").bitwiseXOR(col("bucket")))
      val lsh = top3(vb
        .select(col("vec_id").as("cid"), col("e").as("ce"), col("nrm").as("cn"),
          col("bucket").as("cb"))
        .join(broadcast(lq), col("cb") === col("pb") && col("cid") =!= col("qid"))
        .select("qid", "cid", "qe", "ce", "qn", "cn").dropDuplicates(Seq("qid", "cid"))
        .withColumn("cs", dot(col("qe"), col("ce")) / (col("qn") * col("cn"))))
      // seed-IVF 2-probe (q35e's construction)
      val cents = v.filter(col("vec_id") < K)
        .select(col("vec_id").as("cent"), col("e").as("ce"), col("nrm").as("cn"))
      val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("cs").desc, col("cent"))
      val assign = v.join(broadcast(cents))
        .withColumn("cs", dot(col("e"), col("ce")) / (col("nrm") * col("cn")))
        .withColumn("rn", row_number().over(wAssign))
      val ivMembers = assign.filter(col("rn") === 1)
        .select(col("vec_id").as("cid"), col("cent"), col("e").as("ce2"), col("nrm").as("cn2"))
      val ivProbes = assign.filter(col("rn") <= 2 && col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"), col("cent"))
      val ivf = top3(ivMembers.join(broadcast(ivProbes), Seq("cent"))
        .filter(col("cid") =!= col("qid"))
        .withColumn("cs", dot(col("qe"), col("ce2")) / (col("qn") * col("cn2"))))
      // Lloyd-IVF 2-probe (q35g's construction)
      val (scores, assignKm) = kmeansScoresAndAssign(v)
      val kmProbes = scores
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("vec_id")).orderBy(col("cs").desc, col("cent"))))
        .filter(col("rn") <= 2 && col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("cent"))
      val kmMembers = assignKm
        .select(col("vec_id").as("cid"), col("cent"), col("e").as("ce2"), col("nrm").as("cn2"))
      val km = top3(kmProbes.join(kmMembers, Seq("cent"))
        .filter(col("cid") =!= col("qid"))
        .join(broadcast(qs), Seq("qid"))
        .withColumn("cs", dot(col("qe"), col("ce2")) / (col("qn") * col("cn2"))))
      def hits(m: String, f: DataFrame): DataFrame = f
        .join(ex, Seq("qid", "cid"))
        .agg(count(lit(1)).as("hits3"))
        .select(lit(m).as("method"), col("hits3"))
      hits("ivf_seed", ivf).unionByName(hits("kmeans_ivf", km))
        .unionByName(hits("lsh", lsh))
        .select(col("method"), col("hits3").cast("long").as("hits3"),
          expr("hits3 * 1000 div 30").cast("long").as("recall_milli"))
        .orderBy("method")
    },

    // Embedding-dimension ablation — the Matryoshka question: how much
    // recall does truncating the vector to its first d dimensions cost?
    // Exact brute-force top-10 under each truncation (64 = the ground
    // truth; 32/16/8 the candidates), recall@10 against the full-dim
    // ranking as ONE oracle-checked scorecard. This is the measurement a
    // 100 TB deployment runs before shipping truncated embeddings to cut
    // index storage 2–8×: the cost curve, engine-agreed, not prose. The
    // cosine runs the codegen CosineSimilarity expression over SLICED
    // float arrays (slice-then-cast ≡ cast-then-slice, so DuckDB's double
    // fold stays bit-identical — q35's parity argument verbatim). Scale
    // shape: deliberate 10-query × 4-dim broadcast against the corpus
    // (q35's brute-force-by-design allowance); candidate volume is
    // 40 × n, never n².
    q("q271_dim_ablation",
      "Matryoshka recall: exact top-10 at 64/32/16/8 dims vs the full-dim truth")(
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
        |dims AS (SELECT unnest([64, 32, 16, 8]) AS d),
        |sl AS (SELECT dims.d, v.vec_id, v.e[1:dims.d] AS ed FROM v CROSS JOIN dims),
        |n AS (SELECT d, vec_id, sqrt(list_dot_product(ed, ed)) AS nrm FROM sl),
        |s AS (SELECT q.d, q.vec_id AS qid, c.vec_id AS cid,
        |             list_dot_product(q.ed, c.ed) / (nq.nrm * nc.nrm) AS cs
        |      FROM sl q JOIN n nq ON nq.d = q.d AND nq.vec_id = q.vec_id,
        |           sl c JOIN n nc ON nc.d = c.d AND nc.vec_id = c.vec_id
        |      WHERE c.d = q.d AND q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |r AS (SELECT d, qid, cid,
        |             row_number() OVER (PARTITION BY d, qid ORDER BY cs DESC, cid) AS rn
        |      FROM s),
        |top AS (SELECT d, qid, cid FROM r WHERE rn <= 10),
        |truth AS (SELECT qid, cid FROM top WHERE d = 64),
        |hits AS (SELECT top.d,
        |                CAST(sum(CASE WHEN truth.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits10
        |         FROM top LEFT JOIN truth ON truth.qid = top.qid AND truth.cid = top.cid
        |         GROUP BY top.d)
        |SELECT CAST(d AS BIGINT) AS dims, hits10,
        |       CAST((1000 * hits10) // 100 AS BIGINT) AS recall_milli
        |FROM hits ORDER BY dims DESC""".stripMargin
    ) { (s, dir) =>
      val emb = Tables.fanout(s, dir, "embeddings")
      val dims = s.range(1).select(explode(array(lit(64), lit(32), lit(16), lit(8))).as("d"))
      val sl = emb.crossJoin(broadcast(dims))
        .select(col("d"), col("vec_id"), slice(col("embedding"), lit(1), col("d")).as("ed"))
      val qs = sl.filter(col("vec_id") < 10)
        .select(col("d"), col("vec_id").as("qid"), col("ed").as("qe"))
      val top = sl.select(col("d"), col("vec_id").as("cid"), col("ed").as("ce"))
        .join(broadcast(qs), Seq("d"))
        .filter(col("cid") =!= col("qid"))
        .withColumn("cs", graft.expressions.VectorFunctions.cosine(col("qe"), col("ce")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("d", "qid").orderBy(col("cs").desc, col("cid"))))
        .filter(col("rn") <= 10)
        .select(col("d"), col("qid"), col("cid"))
        .cache() // ground-truth leg + per-dim legs
      val truth = top.filter(col("d") === 64)
        .select(col("qid"), col("cid"), lit(1L).as("hit"))
      top.join(truth, Seq("qid", "cid"), "left")
        .groupBy("d").agg(sum(coalesce(col("hit"), lit(0L))).as("hits10"))
        .select(col("d").cast("long").as("dims"), col("hits10"),
          expr("cast((1000 * hits10) div 100 as bigint)").as("recall_milli"))
        .orderBy(col("dims").desc)
    },

    // Greedy k-center coreset (Gonzalez '85) — the selection member of the
    // data-pruning family (q113 SemDeDup removes redundancy; this PICKS the
    // maximally-spread subset, the 2-approximation every coreset/active-
    // learning pipeline starts from). 8 centers from the seed vec_id 0:
    // each round the next center is the point FARTHEST from the chosen set
    // (max-min exact squared L2), and the picked point's distance IS the
    // covering radius after the previous pick — the output is the (center,
    // radius) curve, engine-agreed. Distributed shape per round: one scan
    // updating the running min-distance column against the 1-row new-center
    // broadcast + one TakeOrdered(1) argmax — never a pairwise matrix; the
    // driver holds only the ≤k picked rows (q199's bounded-head rule;
    // products live inside the materialized rounds, like q76c). The fold
    // is the q35i fixed-order discipline, so radii match the oracle's
    // recursive-CTE replay bit-for-bit.
    q("q358_kcenter_coreset",
      "greedy k-center (Gonzalez) 8-point coreset: max-min L2 centers + covering radii")(
      """WITH RECURSIVE
        |v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
        |sel AS (
        |  SELECT 1 AS step, CAST(0 AS BIGINT) AS cid, CAST(0 AS DOUBLE) AS md,
        |         [CAST(0 AS BIGINT)] AS picked
        |  UNION ALL
        |  SELECT sel.step + 1, nxt.cid, nxt.md, list_append(sel.picked, nxt.cid)
        |  FROM sel, LATERAL (
        |    SELECT cid, md FROM (
        |      SELECT x.vec_id AS cid,
        |             min(list_reduce(list_transform(generate_series(1, 64),
        |                   i -> (x.e[i] - p.e[i]) * (x.e[i] - p.e[i])),
        |                 (a, b) -> a + b)) AS md
        |      FROM v x JOIN v p ON list_contains(sel.picked, p.vec_id)
        |      WHERE NOT list_contains(sel.picked, x.vec_id)
        |      GROUP BY x.vec_id)
        |    ORDER BY md DESC, cid LIMIT 1) nxt
        |  WHERE sel.step < 8)
        |SELECT CAST(step AS BIGINT) AS rnk, cid, round(md, 4) AS radius
        |FROM sel ORDER BY rnk""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val v = Tables.fanout(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
      def d2(a: Column, b: Column): Column =
        aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)
      val seed = v.filter(col("vec_id") === 0).select(col("e").as("ce"))
      // running min-distance column; eager localCheckpoint per round keeps
      // the lineage flat (the StarContraction iterative-loop rule)
      var pts = v.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(seed))
        .select(col("vec_id"), col("e"), d2(col("e"), col("ce")).as("md"))
        .localCheckpoint()
      val picked = scala.collection.mutable.ArrayBuffer((1L, 0L, 0.0))
      for (k <- 2 to 8) {
        val r = pts.orderBy(col("md").desc, col("vec_id")).limit(1).collect()(0)
        val cid = r.getLong(0)
        val ce = r.getSeq[Double](1)
        picked += ((k.toLong, cid, r.getDouble(2)))
        val cf = broadcast(Seq(Tuple1(ce)).toDF("ce"))
        pts = pts.filter(col("vec_id") =!= cid)
          .crossJoin(cf)
          .select(col("vec_id"), col("e"),
            least(col("md"), d2(col("e"), col("ce"))).as("md"))
          .localCheckpoint()
      }
      picked.toSeq.toDF("rnk", "cid", "radius")
        .select(col("rnk"), col("cid"), round(col("radius"), 4).as("radius"))
        .orderBy("rnk")
    },

    // Prototypicality pruning (the SSL-prototypes / D4 decision): after the
    // q35f Lloyd assignment, the MOST prototypical tenth of each cluster —
    // highest cosine to its own centroid — is dropped; near-centroid points
    // are the ones semantic dedup shows carry the least marginal training
    // signal, and the cluster scope keeps the rule distribution-aware
    // (a global cosine cut would empty small clusters first). Per-cluster
    // ranking runs on DistributedRank's grouped two-pass rank — never a
    // data-sized window partition (K=8 means cluster partitions ARE
    // corpus-scale); the n div 10 cut comes from an 8-row size frame
    // broadcast. Output pins the exact pruned SET per cluster (id-sum
    // checksums), not just counts.
    q("q359_prototype_prune",
      "per-cluster prototypicality prune: drop the top tenth by cosine-to-centroid")(
      s"""$kmeansCte,
         |sz AS (SELECT cent, CAST(count(*) AS BIGINT) AS n
         |       FROM a$KmeansIters GROUP BY cent),
         |r AS (SELECT a.vec_id, a.cent,
         |             row_number() OVER (PARTITION BY a.cent
         |                                ORDER BY a.cs DESC, a.vec_id) AS rn
         |      FROM a$KmeansIters a)
         |SELECT r.cent, sz.n,
         |       CAST(coalesce(sum(CASE WHEN r.rn <= sz.n // 10 THEN 1 END), 0) AS BIGINT) AS n_pruned,
         |       CAST(coalesce(sum(CASE WHEN r.rn <= sz.n // 10 THEN r.vec_id END), 0) AS BIGINT) AS pruned_id_sum,
         |       CAST(coalesce(sum(CASE WHEN r.rn > sz.n // 10 THEN r.vec_id END), 0) AS BIGINT) AS kept_id_sum
         |FROM r JOIN sz USING (cent)
         |GROUP BY r.cent, sz.n ORDER BY r.cent""".stripMargin
    ) { (s, dir) =>
      val assign = kmeansFinalAssign(Tables.fanout(s, dir, "embeddings"))
        .select("vec_id", "cent", "cs")
        .cache() // feeds the size frame AND the ranked frame
      val sz = assign.groupBy("cent").agg(count(lit(1)).as("n"))
      val ranked = graft.operators.DistributedRank.withRowNumber(
        assign, Seq(col("cs").desc, col("vec_id")), "rn", group = Seq("cent"))
      ranked.join(broadcast(sz), Seq("cent"))
        .withColumn("pruned", col("rn") <= expr("n div 10"))
        .groupBy("cent", "n")
        .agg(coalesce(sum(when(col("pruned"), lit(1L))), lit(0L)).as("n_pruned"),
          coalesce(sum(when(col("pruned"), col("vec_id"))), lit(0L)).as("pruned_id_sum"),
          coalesce(sum(when(!col("pruned"), col("vec_id"))), lit(0L)).as("kept_id_sum"))
        .orderBy("cent")
    },

    // MMR re-ranking (Carbonell & Goldstein 1998, SIGIR — maximal marginal
    // relevance, THE diversity re-ranker in front of every RAG context
    // builder): from each query's top-20 cosine pool, greedily pick 8 docs
    // maximizing λ·sim(q,d) − (1−λ)·max_{p∈picked} sim(d,p), λ = 0.7.
    // The pool cut is the scale boundary: after it everything is a
    // per-query 20-row array — pool + the 20×19 pairwise-sim map collect
    // into ONE row per query and the whole greedy loop runs as a fold
    // (the q367/q372 discipline; argmax keys round to 6 in BOTH the fold
    // and the oracle's per-round ORDER BY, including round 1, so the two
    // greedy chains bit-agree). The oracle replays the pick chain as 8
    // unrolled MATERIALIZED rounds with NOT EXISTS de-picking. The
    // pairwise map keys as 'min:max' strings — collision-free at ANY
    // vec_id magnitude (an arithmetic min·10⁶+max pack would collide
    // within a pool once ids reach 10⁶, and Spark's duplicate-map-key
    // policy is EXCEPTION — a silent 100 TB landmine the r8 advice
    // flagged; the oracle keys on raw (a,b) columns and never packs).
    q("q379_mmr_rerank",
      "MMR diversity re-rank: greedy 8-of-20 per query (lambda=0.7), fold-run greedy")(
      {
        val rounds = (2 to 8).map { t =>
          s"""sc$t AS MATERIALIZED (
             |  SELECT c.qid, c.cid, c.qs,
             |         round(0.7 * c.qs - 0.3 * max(pr.sim), 6) AS sc
             |  FROM pool c
             |  JOIN picks${t - 1} pk ON pk.qid = c.qid
             |  JOIN pr ON pr.qid = c.qid AND pr.a = c.cid AND pr.b = pk.cid
             |  WHERE NOT EXISTS (SELECT 1 FROM picks${t - 1} p2
             |                    WHERE p2.qid = c.qid AND p2.cid = c.cid)
             |  GROUP BY c.qid, c.cid, c.qs),
             |p$t AS MATERIALIZED (
             |  SELECT qid, cid, $t AS rnk FROM (
             |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
             |                       ORDER BY sc DESC, cid) AS r FROM sc$t)
             |  WHERE r = 1),
             |picks$t AS MATERIALIZED (
             |  SELECT * FROM picks${t - 1} UNION ALL SELECT * FROM p$t)""".stripMargin
        }.mkString(",\n")
        s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
           |           FROM embeddings),
           |n AS (SELECT vec_id, sqrt(list_dot_product(e, e)) AS nrm FROM v),
           |cs AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
           |              round(list_dot_product(q.e, c.e) / (nq.nrm * nc.nrm), 6) AS qs
           |       FROM v q JOIN n nq ON nq.vec_id = q.vec_id,
           |            v c JOIN n nc ON nc.vec_id = c.vec_id
           |       WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id),
           |pool AS MATERIALIZED (
           |  SELECT qid, cid, qs FROM (
           |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY qs DESC, cid) AS rn
           |    FROM cs) WHERE rn <= 20),
           |pr AS MATERIALIZED (
           |  SELECT a.qid, a.cid AS a, b.cid AS b,
           |         round(list_dot_product(va.e, vb.e) / (na.nrm * nb.nrm), 6) AS sim
           |  FROM pool a JOIN pool b ON b.qid = a.qid AND b.cid <> a.cid
           |       JOIN v va ON va.vec_id = a.cid JOIN v vb ON vb.vec_id = b.cid
           |       JOIN n na ON na.vec_id = a.cid JOIN n nb ON nb.vec_id = b.cid),
           |picks1 AS MATERIALIZED (
           |  SELECT qid, cid, 1 AS rnk FROM (
           |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
           |                       ORDER BY round(0.7 * qs, 6) DESC, cid) AS r FROM pool)
           |  WHERE r = 1),
           |$rounds
           |SELECT pk.qid, CAST(pk.rnk AS BIGINT) AS rnk, pk.cid, pool.qs
           |FROM picks8 pk JOIN pool ON pool.qid = pk.qid AND pool.cid = pk.cid
           |ORDER BY pk.qid, rnk""".stripMargin
      }
    ) { (s, dir) =>
      import graft.expressions.VectorFunctions.cosine
      val emb = Tables.fanout(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val cands = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      val wPool = Window.partitionBy(col("qid")).orderBy(col("qs").desc, col("cid"))
      val pool = cands.join(broadcast(qs), col("cid") =!= col("qid"))
        .withColumn("qs", round(cosine(col("qe"), col("ce")), 6))
        .withColumn("rn", row_number().over(wPool)).filter(col("rn") <= 20)
        .select(col("qid"), col("cid"), col("qs"), col("ce"))
        .cache() // pool feeds the pair sims AND the collected greedy row
      val pr = pool.alias("a")
        .join(pool.alias("b"),
          col("b.qid") === col("a.qid") && col("b.cid") =!= col("a.cid"))
        .select(col("a.qid").as("qid"),
          concat(least(col("a.cid"), col("b.cid")).cast("string"), lit(":"),
            greatest(col("a.cid"), col("b.cid")).cast("string")).as("k"),
          round(cosine(col("a.ce"), col("b.ce")), 6).as("sim"))
        .distinct() // symmetric pairs collapse onto one key
      val one = pool.groupBy("qid")
        .agg(sort_array(collect_list(struct(col("cid"), col("qs")))).as("ps"))
        .join(pr.groupBy("qid")
          .agg(map_from_entries(collect_list(struct(col("k"), col("sim")))).as("sm")),
          Seq("qid"))
      // the greedy chain: score = round(0.7·qs − 0.3·maxsim(picked), 6),
      // argmax with cid tiebreak; first pick's penalty term is zero
      val pen = """if(size(picked) = 0, 0.0d,
        aggregate(picked, cast(-1.0d as double), (m, p) -> greatest(m,
          element_at(sm, concat(cast(least(x.cid, p) as string), ':',
                                cast(greatest(x.cid, p) as string))))))"""
      val sCand = s"round(0.7d * x.qs - 0.3d * ($pen), 6)"
      val fold = s"""aggregate(sequence(1, 8), cast(array() as array<bigint>),
        (picked, t) -> picked || array(
          aggregate(filter(ps, x -> NOT array_contains(picked, x.cid)),
            cast(null as struct<sc: double, id: bigint>),
            (b, x) -> CASE WHEN b IS NULL OR $sCand > b.sc
                            OR ($sCand = b.sc AND x.cid < b.id)
                           THEN named_struct('sc', $sCand, 'id', x.cid)
                           ELSE b END).id))"""
      one.withColumn("picks", expr(fold))
        .select(col("qid"), col("ps"),
          posexplode(col("picks")).as(Seq("pos", "cid")))
        .select(col("qid"), (col("pos") + 1).cast("long").as("rnk"), col("cid"),
          expr("element_at(filter(ps, x -> x.cid = cid), 1).qs").as("qs"))
        .orderBy("qid", "rnk")
    },

    // Cluster-validity scorecard over q35f's SHARED Lloyd clustering:
    // simplified silhouette (Hruschka et al. 2004 — centroid distances in
    // place of mean pairwise, the LINEAR variant of Rousseeuw 1987's
    // silhouette; the exact form is O(n²) and dies at corpus scale) and
    // the Davies–Bouldin index (Davies & Bouldin 1979, IEEE TPAMI) —
    // the two standard "is this clustering any good" numbers a semantic
    // dedup/IVF pipeline checks before trusting its partitions. Cosine
    // geometry throughout: d = 1 − cos, so a = 1−cos(x, own centroid),
    // b = 1−max cos(x, other centroids), s = (b−a)/max(a,b); cluster
    // scatter S_k = mean d to own centroid; DB_k = max_j (S_k+S_j)/d(c_k,
    // c_j). Everything after the (already q35f-shared) n×K scoring pass
    // is per-cluster metadata: one grouped mean + a K² centroid grid.
    q("q380_cluster_validity",
      "simplified silhouette + Davies-Bouldin per Lloyd cluster (shared q35f model)")(
      s"""$kmeansCte,
         |own AS (SELECT vec_id, cent, cs FROM a$KmeansIters),
         |alt AS (SELECT s.vec_id, max(s.cs) AS bcs
         |        FROM s$KmeansIters s JOIN own o
         |          ON o.vec_id = s.vec_id AND s.cent <> o.cent
         |        GROUP BY s.vec_id),
         |sil AS (SELECT o.cent,
         |               (o.cs - alt.bcs) / greatest(1 - o.cs, 1 - alt.bcs) AS sp,
         |               1 - o.cs AS d
         |        FROM own o JOIN alt ON alt.vec_id = o.vec_id),
         |grp AS (SELECT cent, CAST(count(*) AS BIGINT) AS n,
         |               avg(sp) AS msil, avg(d) AS scat
         |        FROM sil GROUP BY cent),
         |cc AS (SELECT a.cent AS i, b.cent AS j,
         |              1 - list_dot_product(a.ce, b.ce) /
         |                  (sqrt(list_dot_product(a.ce, a.ce)) *
         |                   sqrt(list_dot_product(b.ce, b.ce))) AS cd
         |       FROM c$KmeansIters a JOIN c$KmeansIters b ON a.cent <> b.cent),
         |db AS (SELECT cc.i AS cent, max((gi.scat + gj.scat) / cc.cd) AS dbk
         |       FROM cc JOIN grp gi ON gi.cent = cc.i
         |               JOIN grp gj ON gj.cent = cc.j
         |       GROUP BY cc.i)
         |SELECT grp.cent, grp.n, round(grp.msil, 4) AS mean_silhouette,
         |       round(grp.scat, 4) AS scatter, round(db.dbk, 4) AS davies_bouldin
         |FROM grp JOIN db ON db.cent = grp.cent ORDER BY grp.cent""".stripMargin
    ) { (s, dir) =>
      val v = withNorm(Tables.fanout(s, dir, "embeddings"))
      val (scores, assign) = kmeansScoresAndAssign(v)
      val own = assign.select(col("vec_id"), col("cent"), col("cs"))
      val alt = scores.alias("s")
        .join(own.alias("o"),
          col("o.vec_id") === col("s.vec_id") && col("s.cent") =!= col("o.cent"))
        .groupBy(col("s.vec_id").as("vec_id")).agg(max(col("s.cs")).as("bcs"))
      val sil = own.join(alt, Seq("vec_id"))
        .select(col("cent"),
          ((col("cs") - col("bcs")) /
            greatest(lit(1.0) - col("cs"), lit(1.0) - col("bcs"))).as("sp"),
          (lit(1.0) - col("cs")).as("d"))
      val grp = sil.groupBy("cent")
        .agg(count(lit(1)).as("n"), avg(col("sp")).as("msil"), avg(col("d")).as("scat"))
        .cache() // silhouette leg + both sides of the DB grid
      val cents = scores.select(col("cent"), col("ce")).distinct()
      val cc = cents.alias("a")
        .join(cents.alias("b"), col("a.cent") =!= col("b.cent"))
        .select(col("a.cent").as("i"), col("b.cent").as("j"),
          (lit(1.0) - dot(col("a.ce"), col("b.ce")) /
            (sqrt(dot(col("a.ce"), col("a.ce"))) *
              sqrt(dot(col("b.ce"), col("b.ce"))))).as("cd"))
      val db = cc
        .join(grp.select(col("cent").as("i"), col("scat").as("si")), Seq("i"))
        .join(grp.select(col("cent").as("j"), col("scat").as("sj")), Seq("j"))
        .groupBy(col("i").as("cent"))
        .agg(max((col("si") + col("sj")) / col("cd")).as("dbk"))
      grp.join(db, Seq("cent"))
        .select(col("cent"), col("n"), round(col("msil"), 4).as("mean_silhouette"),
          round(col("scat"), 4).as("scatter"), round(col("dbk"), 4).as("davies_bouldin"))
        .orderBy("cent")
    },

    // Rank-biased overlap (Webber, Moffat & Zobel 2010, ACM TOIS) between
    // the EXACT cosine top-5 and the IVF 2-probe top-5 per query — the
    // rank-WEIGHTED fidelity complement to q227's set-recall scorecard
    // (recall@k treats rank 1 and rank 5 alike; RBO's geometric weights
    // don't, which is what an ANN regression gate actually wants).
    // Truncated RBO@5 with p=0.9 computes as a per-member LOOKUP, no
    // per-depth pass: each common member contributes
    // w(m) = Σ_{d=m..5} (1−p)·p^{d−1}/d at m = max of its two ranks —
    // the weights are inlined as IDENTICAL literals in both engines
    // (Scala Double.toString round-trips, so both parse the same bits).
    // rbo_norm divides by the truncated maximum 1−p⁵. Scale: both
    // rankings already exist in the engine (q35 brute-force allowance +
    // q35f's shared Lloyd model); the RBO itself is a 5-row-per-query
    // join + grouped sum — metadata.
    q("q381_rbo_ann_fidelity",
      "rank-biased overlap @5 (p=0.9) of IVF 2-probe vs exact cosine ranking")(
      {
        val p = 0.9
        val wts = (1 to 5).map(m => (m to 5).map(d => (1 - p) * math.pow(p, d - 1) / d).sum)
        val caseSql = s"CASE greatest(ex.re, iv.ra) " +
          (1 to 5).map(m => s"WHEN $m THEN ${wts(m - 1)}::DOUBLE").mkString(" ") + " END"
        s"""$kmeansCte,
           |ex AS (SELECT qid, cid, rn AS re FROM (
           |  SELECT q.vec_id AS qid, c.vec_id AS cid,
           |         row_number() OVER (PARTITION BY q.vec_id
           |           ORDER BY list_dot_product(q.e, c.e) / (nq.nrm * nc.nrm) DESC,
           |                    c.vec_id) AS rn
           |  FROM v q JOIN n nq ON nq.vec_id = q.vec_id,
           |       v c JOIN n nc ON nc.vec_id = c.vec_id
           |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id)
           | WHERE rn <= 5),
           |pb AS (SELECT vec_id AS qid, cent FROM
           |        (SELECT *, row_number() OVER (PARTITION BY vec_id
           |                     ORDER BY cs DESC, cent) AS rn
           |         FROM s$KmeansIters)
           |      WHERE rn <= 2 AND vec_id < 10),
           |cand AS (SELECT DISTINCT pb.qid, m.vec_id AS cid
           |         FROM pb JOIN a$KmeansIters m ON m.cent = pb.cent
           |                                     AND m.vec_id <> pb.qid),
           |ivs AS (SELECT cand.qid, cand.cid,
           |              list_dot_product(q.e, c.e) / (nq.nrm * nc.nrm) AS cs
           |       FROM cand JOIN v q ON q.vec_id = cand.qid
           |            JOIN v c ON c.vec_id = cand.cid
           |            JOIN n nq ON nq.vec_id = cand.qid
           |            JOIN n nc ON nc.vec_id = cand.cid),
           |iv AS (SELECT qid, cid, rn AS ra FROM (
           |  SELECT *, row_number() OVER (PARTITION BY qid
           |              ORDER BY cs DESC, cid) AS rn FROM ivs)
           | WHERE rn <= 5),
           |ag AS (SELECT ex.qid, $caseSql AS w
           |       FROM ex JOIN iv ON iv.qid = ex.qid AND iv.cid = ex.cid),
           |qs AS (SELECT DISTINCT vec_id AS qid FROM v WHERE vec_id < 10)
           |SELECT qs.qid, CAST(count(ag.w) AS BIGINT) AS n_common,
           |       round(coalesce(sum(ag.w), 0), 4) AS rbo,
           |       round(coalesce(sum(ag.w), 0) / ${1 - math.pow(p, 5)}, 4) AS rbo_norm
           |FROM qs LEFT JOIN ag ON ag.qid = qs.qid
           |GROUP BY qs.qid ORDER BY qs.qid""".stripMargin
      }
    ) { (s, dir) =>
      val p = 0.9
      val wts = (1 to 5).map(m => (m to 5).map(d => (1 - p) * math.pow(p, d - 1) / d).sum)
      val v = withNorm(Tables.fanout(s, dir, "embeddings"))
      val (scores, assign) = kmeansScoresAndAssign(v)
      val queries = v.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"))
      // exact leg: q35's brute-force ranking, cut at 5
      val wTop = Window.partitionBy(col("qid")).orderBy(col("qcs").desc, col("cid"))
      val ex = v.select(col("vec_id").as("cid"), col("e").as("ce"), col("nrm").as("cn"))
        .join(broadcast(queries), col("cid") =!= col("qid"))
        .withColumn("qcs", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
        .withColumn("re", row_number().over(wTop)).filter(col("re") <= 5)
        .select("qid", "cid", "re")
      // ANN leg: q35g's 2-probe ranking, cut at 5
      val wProbe = Window.partitionBy(col("vec_id")).orderBy(col("cs").desc, col("cent"))
      val probes = scores.withColumn("rn", row_number().over(wProbe))
        .filter(col("rn") <= 2 && col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("cent"))
      val members = assign.select(col("vec_id").as("cid"), col("cent"),
        col("e").as("me"), col("nrm").as("mn"))
      val iv = probes.join(members, Seq("cent"))
        .filter(col("cid") =!= col("qid"))
        .select("qid", "cid", "me", "mn").dropDuplicates(Seq("qid", "cid"))
        .join(broadcast(queries), Seq("qid"))
        .withColumn("qcs", dot(col("qe"), col("me")) / (col("qn") * col("mn")))
        .withColumn("ra", row_number().over(wTop)).filter(col("ra") <= 5)
        .select("qid", "cid", "ra")
      val wCase = (1 to 5).map(m => s"WHEN $m THEN ${wts(m - 1)}").mkString(" ")
      val ag = ex.join(iv, Seq("qid", "cid"))
        .select(col("qid"), expr(s"CASE greatest(re, ra) $wCase END").as("w"))
      queries.select("qid")
        .join(ag, Seq("qid"), "left")
        .groupBy("qid")
        .agg(count(col("w")).as("n_common"),
          round(coalesce(sum(col("w")), lit(0.0)), 4).as("rbo"),
          round(coalesce(sum(col("w")), lit(0.0)) / lit(1 - math.pow(p, 5)), 4)
            .as("rbo_norm"))
        .orderBy("qid")
    }
  )

  /** q216's body, callable from VectorIndexPruningSpec so the spec pins the
    * SAME plan the registry runs. Writes the index (idempotent overwrite,
    * path keyed by the fixture leaf — q160b's rerun contract), reads it
    * back partition-pruned, and returns the 2-probe top-3. */
  def indexReadbackSearch(s: SparkSession, dir: String): DataFrame = {
    val v = withNorm(Tables.fanout(s, dir, "embeddings"))
    val (scores, assign) = kmeansScoresAndAssign(v)
    val outDir = s"/tmp/graft_layout/${new java.io.File(dir).getName}/ivf_index"
    // the index rows: (cid, cent, raw float embedding) — norms are
    // recomputed on read (cheaper than persisting; keeps the index pure
    // data), partitioned by the coarse quantizer cell
    assign.select(col("vec_id").as("cid"), col("cent"),
        col("e").as("me"), col("nrm").as("mn"))
      .write.mode("overwrite").partitionBy("cent").parquet(outDir)
    val wProbe = Window.partitionBy(col("vec_id")).orderBy(col("cs").desc, col("cent"))
    val probes = scores
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= 2 && col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("cent"))
      .cache() // probe list + the IN-list collect below
    // the probed cells as a LITERAL partition filter — this is what makes
    // the scan open only those directories (bounded by 2·|queries| ≤ 20)
    val probedCells = probes.select(col("cent")).distinct()
      .collect().map(_.getLong(0)).sorted
    val members = s.read.parquet(outDir)
      .filter(col("cent").isin(probedCells: _*))
    val queries = v.select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("qcs").desc, col("cid"))
    probes.join(members, Seq("cent"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), col("me"), col("mn")).distinct()
      .join(broadcast(queries), Seq("qid"))
      .withColumn("qcs", dot(col("qe"), col("me")) / (col("qn") * col("mn")))
      .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 3)
      .select(col("qid"), col("cid"), round(col("qcs"), 4).as("cos"),
        col("rn").cast("long").as("rn"))
      .orderBy("qid", "rn")
  }
}
