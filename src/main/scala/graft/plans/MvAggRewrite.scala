package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.DecimalType

/** Materialized-view AGGREGATE REWRITE — the optimizer half of the MV
  * story (q249 maintains one; this rule makes the engine USE one): an
  * aggregate over the base lineitem scan whose grouping is a subset of
  * the view's dimensions and whose measures the view carries is rewritten
  * to a ROLLUP FROM THE VIEW — count(*) becomes sum(cnt), the quantity
  * sum becomes sum(qty4_sum) — so the query reads |dims| pre-aggregated
  * rows instead of the fact table. This is the rewrite every warehouse
  * optimizer ships (Calcite's MV substitution, public literature); at
  * 100 TB it converts a full fact scan into a metadata read whenever the
  * question is coarser than the view.
  *
  * Correct-by-algebra: the subset-groupby rollup is exact because both
  * measures are ALGEBRAIC (sums of DECIMAL(28,4) partials and longs —
  * no float reassociation; the view stores sum as DECIMAL(38,4), whose
  * re-sum keeps the same type, so the rewritten plan's output schema is
  * bit-identical to the base plan's).
  *
  * The rule is deliberately narrow and conf-gated (a production rule
  * normalizes expressions and consults a view catalog; this one
  * demonstrates the plan surgery):
  *   - `spark.graft.mv.enabled` = "true" and `spark.graft.mv.path` set;
  *   - the child is the base `lineitem.parquet` relation (optionally
  *     under a pure-attribute Project);
  *   - every grouping expression is an attribute of
  *     {l_returnflag, l_linestatus};
  *   - every aggregate is count(literal) or sum(<expr of l_quantity with
  *     DECIMAL(28,4) type>) — the round(·,4)-cast convention every
  *     oracle-checked quantity sum in this repo uses.
  *
  * Plan surgery: the view relation is projected with aliases REUSING the
  * original dimension attributes' exprIds, so the Aggregate's grouping
  * and pass-through references resolve unchanged; each aggregate alias
  * keeps its exprId and name with the function swapped underneath.
  * Idempotent under the optimizer's fixed point: the rewritten child no
  * longer matches the base-path guard. MvRewriteSpec pins that the
  * executed plan scans the view (and not lineitem) with the flag on,
  * scans lineitem with it off, and that both plans return identical rows.
  */
object MvAggRewrite extends Rule[LogicalPlan] {

  private val Dims = Set("l_returnflag", "l_linestatus")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val conf = SQLConf.get
    if (conf.getConfString("spark.graft.mv.enabled", "false") != "true") return plan
    val mvPath = conf.getConfString("spark.graft.mv.path", "")
    if (mvPath.isEmpty) return plan
    plan.transformDown {
      case agg @ Aggregate(groups, results, child, _) if rewritable(groups, results, child) =>
        rewrite(agg, mvPath).getOrElse(agg)
    }
  }

  private def isBaseLineitem(p: LogicalPlan): Boolean = p match {
    case Project(pl, rel: LogicalRelation) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      isBaseLineitem(rel)
    case rel: LogicalRelation => rel.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.exists(_.toString.endsWith("lineitem.parquet"))
      case _ => false
    }
    case _ => false
  }

  private def isQtyDecimal(e: Expression): Boolean =
    e.dataType == DecimalType(28, 4) &&
      e.references.size == 1 && e.references.head.name == "l_quantity"

  /** A result column is rewritable when it is a dimension pass-through or
    * an expression whose EVERY aggregate call the view can answer (post-
    * aggregate arithmetic like round(cast(sum(...))) is carried over
    * unchanged — only the aggregate calls underneath are swapped). */
  private def matchedAgg(e: NamedExpression): Boolean = e match {
    case a: AttributeReference => Dims.contains(a.name)
    case al: Alias =>
      val aggs = al.collect { case ae: AggregateExpression => ae }
      aggs.nonEmpty &&
        aggs.forall(ae => !ae.isDistinct && (ae.aggregateFunction match {
          case Count(children) => children.forall(_.foldable)
          case Sum(c, _) => isQtyDecimal(c)
          case _ => false
        })) &&
        al.references.forall(r => Dims.contains(r.name) || r.name == "l_quantity")
    case _ => false
  }

  private def rewritable(groups: Seq[Expression], results: Seq[NamedExpression],
      child: LogicalPlan): Boolean =
    isBaseLineitem(child) &&
      groups.forall { case a: AttributeReference => Dims.contains(a.name); case _ => false } &&
      results.forall(matchedAgg) &&
      results.exists { case al: Alias =>
        al.collectFirst { case _: AggregateExpression => () }.isDefined; case _ => false }

  private def rewrite(agg: Aggregate, mvPath: String): Option[LogicalPlan] = {
    val mvRel = SparkSession.active.read.parquet(mvPath).queryExecution.analyzed
    val mvOut = mvRel.output
    def mv(name: String): Option[Attribute] = mvOut.find(_.name == name)
    val (qtySum, cnt) = (mv("qty4_sum"), mv("cnt")) match {
      case (Some(q), Some(c)) => (q, c)
      case _ => return None // view lacks the contract columns — leave the plan alone
    }
    // original dimension attributes, keyed by name (from the base child)
    val origDims = agg.child.output.filter(a => Dims.contains(a.name))
    val projList: Seq[NamedExpression] = mvOut.map { a =>
      origDims.find(_.name == a.name) match {
        case Some(orig) => Alias(a, a.name)(exprId = orig.exprId)
        case None => a
      }
    }
    val proj = Project(projList, mvRel)
    val newResults = agg.aggregateExpressions.map {
      case ar: AttributeReference => ar
      case al: Alias =>
        val swapped = al.child.transform {
          case ae: AggregateExpression => ae.aggregateFunction match {
            case _: Count => Sum(cnt).toAggregateExpression()
            case _: Sum => Sum(qtySum).toAggregateExpression()
            case _ => ae
          }
        }
        Alias(swapped, al.name)(exprId = al.exprId)
      case other => other
    }
    Some(Aggregate(agg.groupingExpressions, newResults, proj))
  }
}
