package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing primitives.
  *
  * The LLM-pipeline operators (MinHash, SimHash, LSH, fingerprinting) must be
  * verifiable against the DuckDB oracle, so every hash is defined as pure
  * arithmetic over an md5 prefix — identical semantics in Spark SQL, DuckDB
  * SQL, and plain Scala (used to precompute LSH plane constants). No
  * engine-specific hash (xxhash64/Murmur) appears in any checked operator.
  */
object PortableHash {

  /** Modulus for permutation hashing: fits products in 63 bits
    * (h1 < P ≈ 2^30, a < 2^31 → a*h1+b < 2^62). */
  val P = 1000000007L

  /** 60-bit positive hash: first 15 hex chars of md5. */
  def md5Long(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")
  def md5LongSql(e: String): String = s"(('0x' || substr(md5($e), 1, 15))::BIGINT)"

  /** md5Long reduced mod P — the base hash for permutations. */
  def h1(c: Column): Column = md5Long(c) % P
  def h1Sql(e: String): String = s"(${md5LongSql(e)} % $P)"

  /** Plain-Scala twin of md5Long (for precomputing constants like LSH planes
    * so Spark literals and generated oracle SQL agree bit-for-bit). */
  def md5LongScala(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** MinHash permutation constants (a_j, b_j), j < 16: fixed arbitrary odd
    * multipliers/offsets below 2^31, shared verbatim with the oracle SQL. */
  val minhashPerms: Seq[(Long, Long)] =
    (1 to 16).map(j => (2654435761L % P * j % P | 1L, 40503L * j * j % P))

  /** SQL VALUES list "(j, a, b), ..." for the permutation table. */
  def minhashPermsSql: String =
    minhashPerms.zipWithIndex
      .map { case ((a, b), j) => s"($j, ${a}, ${b})" }.mkString(", ")

  /** KMV distinct estimator over a bottom-`k` sketch of [[md5Long]] hashes
    * (domain 2⁶⁰): (k−1)·2⁶⁰/h_k, or the exact sketch size under k
    * values. ONE text, evaluated by Spark (via `expr`) and DuckDB alike —
    * `n` is the sketch-size expression, `hk` the k-th-minimum expression
    * (unevaluated in the exact branch, so an out-of-bounds element_at is
    * safe). Keeping the constant pair (2⁶⁰, k−1) in one place is what
    * guarantees the bit-for-bit cross-engine agreement q190/q190b/q193
    * exist to prove. */
  def kmvEstimateSql(n: String, hk: String, k: Int): String =
    s"CAST(CASE WHEN $n < $k THEN $n WHEN $hk <= 0 THEN $n ELSE floor(${k - 1} * " +
      s"CAST(1152921504606846976 AS DOUBLE) / CAST($hk AS DOUBLE)) END AS BIGINT)"

  /** Tokenize on single spaces (documents.text is single-space separated). */
  def tokens(c: Column): Column = split(c, " ")

  /** Distinct n-token shingles of a token array (empty if fewer than n). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k + 1))): _*)))
      .otherwise(array().cast("array<string>"))

  /** DuckDB twin of `shingles` over a list expression `t` (1-based indexing). */
  def shinglesSql(t: String, n: Int): String = {
    val parts = (1 to n).map(k => s"$t[i+$k]").mkString(" || ' ' || ")
    s"list_transform(generate_series(0, len($t) - $n), i -> $parts)"
  }
}
