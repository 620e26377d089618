package graft.expressions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd CosineSimilarity must be bit-identical to the declarative
  * higher-order-function fold it replaces (and therefore to the DuckDB
  * oracle formulation). */
class VectorExpressionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hofCosine = {
    val e = (c: String) => transform(col(c), _.cast("double"))
    val d = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)
    d(e("a"), e("b")) / (sqrt(d(e("a"), e("a"))) * sqrt(d(e("b"), e("b"))))
  }

  test("codegen cosine ≡ HOF double-fold cosine, bit-exact, on real embeddings") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val pairs = emb.select(col("vec_id").as("i"), col("embedding").as("a"))
      .join(emb.select(col("vec_id").as("j"), col("embedding").as("b")),
        col("i") < col("j")).limit(2000)
    val diff = pairs
      .select(VectorFunctions.cosine(col("a"), col("b")).as("fast"), hofCosine.as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0)
  }

  test("codegen path actually engages (no CodegenFallback in plan) and eval path agrees") {
    // non-literal source: literals would constant-fold into a LocalTableScan
    // and no codegen stage would exist at all
    // plain expressions only: a higher-order fn here would itself be
    // CodegenFallback and break WSCG for the whole projection
    val base = spark.range(1).selectExpr(
      "array(CAST(id+1 AS FLOAT), CAST(id+2 AS FLOAT), CAST(id+3 AS FLOAT)) AS a",
      "array(CAST(id+3 AS FLOAT), CAST(id+2 AS FLOAT), CAST(id+1 AS FLOAT)) AS b")
    val df = base.select(VectorFunctions.cosine(col("a"), col("b")).as("c"))
    // the projection containing the expression must sit inside WSCG — a
    // doGenCode regression falling back to interpreted eval would erase the
    // performance property the expression exists for
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), plan)
    val codegen = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(codegen.contains("numElements"), codegen.take(800))
    val got = df.collect().head.getDouble(0)
    val want = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(got == want)
    // interpreted eval agrees with codegen result
    val expr = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(1.0f, 2.0f, 3.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(3.0f, 2.0f, 1.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(expr.eval(null).asInstanceOf[Double] == want)
  }

  test("dimension mismatch → null (zip_with parity)") {
    val r = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b"))).collect().head
    assert(r.isNullAt(0))
  }

  test("type check rejects non-float arrays") {
    val df = Seq((Seq(1.0, 2.0), Seq(2.0, 1.0))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(VectorFunctions.cosine(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("array<float>")
      || ex.getMessage.toLowerCase.contains("cosine"))
  }
}
