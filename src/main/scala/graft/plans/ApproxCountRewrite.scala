package graft.plans

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.aggregate.ScalaAggregator
import org.apache.spark.sql.types.{BinaryType, DoubleType, LongType, StringType}

/** Flag-guarded query-acceleration rewrite: `count(DISTINCT c)` → the
  * engine's portable KMV bottom-64 estimate, with NO query change. The
  * lakehouse "approximate acceleration" pattern (a session flag trades
  * exactness for a shuffle whose state is O(k) per group instead of
  * O(distinct values) per group): at 100 TB a count-distinct over a
  * high-cardinality key shuffles every distinct value to its group's
  * reducer, while the KMV sketch partial-aggregates to ≤64 longs per
  * (partition, group) before the exchange — the same state bound the
  * sketch library (q187/q190) proves, now applied transparently by the
  * OPTIMIZER rather than by rewriting the query by hand.
  *
  * Because the sketch is md5-arithmetic (PortableHash), the rewritten
  * result is bit-for-bit reproducible by the DuckDB oracle — the rewrite
  * is hash-verifiable end-to-end (q345), not just "approximately right".
  * Estimator error is the KMV bound: rel. σ ≈ 1/√(k−2) ≈ 12.7 % at k=64
  * (exact below 64 distinct values — the sketch IS the set there).
  *
  * Scope (deliberately conservative — acceleration rules must never turn
  * a valid plan invalid): the rule fires only on `Aggregate` nodes whose
  * output list is exactly grouping attributes plus aliased aggregate
  * expressions, and only rewrites single-argument, unfiltered
  * `Count(c) DISTINCT` expressions; everything else passes through
  * untouched. Guarded by `spark.graft.approxCountDistinct` (default off —
  * zero behavior change for the rest of the registry).
  */
object ApproxCountRewrite extends Rule[LogicalPlan] {

  val FLAG = "spark.graft.approxCountDistinct"
  private val K = 64

  private def enabled: Boolean =
    conf.getConfString(FLAG, "false").toBoolean

  private def isRewritableCountDistinct(e: Expression): Boolean = e match {
    case ae: AggregateExpression =>
      ae.isDistinct && ae.filter.isEmpty &&
        (ae.aggregateFunction match {
          case Count(children) => children.length == 1
          case _ => false
        })
    case _ => false
  }

  /** PortableHash.md5Long as raw catalyst nodes (the rule runs on an
    * already-analyzed plan, so every node must be born resolved):
    * conv(substr(md5(cast(cast(c AS STRING) AS BINARY)), 1, 15), 16, 10)
    * cast to LONG — null in, null out (the aggregator skips nulls, the
    * COUNT(DISTINCT) null contract). */
  private def md5LongExpr(c: Expression): Expression =
    Cast(
      Conv(
        Substring(
          Md5(Cast(Cast(c, StringType), BinaryType)),
          Literal(1), Literal(15)),
        Literal(16), Literal(10)),
      LongType)

  // encoders resolved HERE: the analyzer's ResolveEncodersInScalaAgg rule
  // runs before optimization and will never see a node this rule creates,
  // so the node must be born the way that rule would leave it
  private def sketchAgg(c: Expression): AggregateExpression =
    AggregateExpression(
      new ScalaAggregator(
        children = Seq(md5LongExpr(c)),
        agg = new graft.functions.KmvNullSkipAggregator(K),
        inputEncoder = ExpressionEncoder[Option[Long]]().resolveAndBind(),
        bufferEncoder = ExpressionEncoder[Seq[Long]]().resolveAndBind()),
      Complete, isDistinct = false)

  /** The shared KMV estimate over the sketch attribute — the catalyst twin
    * of PortableHash.kmvEstimateSql(n, hk, 64), kept arithmetically
    * identical (63 · 2⁶⁰ exact in a double; one rounding at the division;
    * floor; BIGINT) so DuckDB reproduces the value bit-for-bit. */
  private def estimate(sketch: Attribute): Expression = {
    val n = Cast(Size(sketch), LongType)
    val hk = ElementAt(sketch, Literal(K))
    val est = Cast(
      Floor(Divide(
        Multiply(
          Cast(Literal(63L), DoubleType),
          Cast(Literal(1152921504606846976L), DoubleType)),
        Cast(hk, DoubleType))),
      LongType)
    // hk <= 0 guard (md5 prefix of all zeros, p ≈ 2⁻⁶⁰): fall back to the
    // sketch size rather than divide to Infinity — same branch as
    // kmvEstimateSql so both engines stay bit-identical. The trailing
    // Coalesce(_, 0) restores Count's non-nullable contract: the original
    // attribute this alias replaces (same exprId) was nullable=false, and
    // downstream operators resolved against it may elide null checks.
    Coalesce(Seq(
      CaseWhen(Seq(
        (LessThan(n, Literal(K.toLong)), n),
        (LessThanOrEqual(hk, Literal(0L)), n)), Some(est)),
      Literal(0L)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case a @ Aggregate(g, aggs, child, _)
          if aggs.exists {
            case Alias(e, _) => isRewritableCountDistinct(e)
            case _ => false
          } && aggs.forall {
            case _: AttributeReference => true
            case Alias(_: AggregateExpression, _) => true
            case _ => false
          } =>
        val rewritten = aggs.map {
          case al @ Alias(e, name) if isRewritableCountDistinct(e) =>
            val c = e.asInstanceOf[AggregateExpression]
              .aggregateFunction.children.head
            val sk = Alias(sketchAgg(c), s"${name}_kmv_sketch")()
            (sk, Some(al))
          case other => (other, None)
        }
        val newAgg = a.copy(aggregateExpressions = rewritten.map(_._1))
        val projectList = rewritten.map {
          case (sk, Some(orig)) =>
            // preserve the original name AND exprId so every downstream
            // reference to the count keeps resolving
            Alias(estimate(sk.toAttribute), orig.name)(exprId = orig.exprId)
          case (passthrough, None) => passthrough.toAttribute
        }
        org.apache.spark.sql.catalyst.plans.logical.Project(projectList, newAgg)
    }
}
