package graft.expressions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The native Jaro–Winkler expression: known reference values (the
  * classic record-linkage pairs, cross-checked against DuckDB's
  * jaro_winkler_similarity during design), codegen engagement, and
  * eval/codegen agreement. The cross-ENGINE proof is q332's oracle. */
class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic record-linkage reference values") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-9)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("a", "b") == 0.0)
    // boost applies only above the 0.7 jaro threshold
    assert(jw("abcdxx", "abyyyy") < 0.7) // jaro ≤ 0.7 → no prefix boost
  }

  test("symmetry and bounds on fixture name pairs") {
    val names = graft.Tables(spark, "/root/testdata/sf0.001", "part")
      .select(col("p_name")).distinct().collect().map(_.getString(0))
    for (a <- names.take(12); b <- names.take(12)) {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s == jw(b, a), s"asymmetric on ($a, $b)")
      if (a == b) assert(s == 1.0)
    }
  }

  test("codegen path engages and agrees with interpreted eval") {
    val base = spark.range(1).selectExpr(
      "concat('MARTH', chr(CAST(65 + id AS INT))) AS a", "'MARHTA' AS b")
    val df = base.select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    val codegen = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(codegen.contains("JaroWinkler.similarity"), codegen.take(800))
    assert(df.collect().head.getDouble(0) == jw("MARTHA", "MARHTA"))
    val e = JaroWinkler(
      org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString("MARTHA"),
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString("MARHTA"),
        org.apache.spark.sql.types.StringType))
    assert(e.eval(null).asInstanceOf[Double] == jw("MARTHA", "MARHTA"))
  }

  test("q332 recovers every transposed probe with a strict runner-up margin") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val rows = graft.SparkEntry.queries("q332_jaro_winkler")(spark, d).collect()
      assert(rows.length == 64)
      rows.foreach { r =>
        assert(r.getDouble(3) >= r.getDouble(4),
          s"$d: rank order broken for ${r.getString(0)}")
        assert(r.getDouble(3) > 0.85, s"$d: transposed best-similarity ${r.getDouble(3)}")
      }
      // the corpus holds genuinely confusable names ('cold bolt' mangled to
      // 'ocld bolt' IS closer to 'old bolt' — the matcher is right to say
      // so), so the self-recovery law is corpus-level, not universal
      val selfMatches = rows.count(_.getLong(5) == 1L)
      assert(selfMatches >= 60, s"$d: only $selfMatches/64 probes self-matched")
      rows.filter(_.getLong(5) == 1L).foreach { r =>
        assert(r.getDouble(3) > r.getDouble(4),
          s"$d: no margin for ${r.getString(0)} (${r.getDouble(3)} vs ${r.getDouble(4)})")
      }
      spark.catalog.clearCache()
    }
  }
}
