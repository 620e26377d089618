package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Catalyst optimizer rule: plan bounded time-range self/theta joins as
  * equi-joins on (key, time-bin) instead of the BroadcastNestedLoopJoin the
  * default planner produces for non-equi conditions (SURVEY.md §4.2#4 — the
  * one custom planner rewrite the engine ships).
  *
  * Pattern:
  * {{{
  *   a JOIN b ON a.k = b.k AND b.t > a.t AND b.t <= a.t + INTERVAL w
  * }}}
  * (either operand order in each conjunct; `>=`/`<` variants accepted).
  * Because `b.t ∈ (a.t, a.t + w]`, binning both sides at width w means b's
  * bin is a's bin or a's bin + 1. The rewrite:
  *
  *   - adds `bin = unix_micros(t) div w` to the left side (integral
  *     division truncates toward zero, NOT floor — for pre-1970 timestamps
  *     the cell around zero is up to 2w−1 wide; bin boundaries are still
  *     ≥ w apart, so an interval of width w crosses at most one boundary
  *     and the two-bin adjacency argument below holds unchanged),
  *   - explodes the right side to `{bin, bin − 1}` (expansion factor exactly
  *     2, independent of data volume),
  *   - joins on `(k, bin)` equality, keeping the original range predicates
  *     as exact post-filters.
  *
  * The rewrite only fires when NO cross-side equality conjunct exists: with
  * an equi key present the planner already hash-joins on it and evaluates
  * the range as a post-filter, and doubling the probe side via the bin
  * explode would cost more than it saves.
  *
  * Catalyst then plans a hash join partitioned by (k, bin): shuffle load
  * spreads with key × time cardinality — the 100 TB shape. Enable with
  * `spark.experimental.extraOptimizations ++= Seq(RangeBinJoinRewrite)` or
  * via [[graft.GraftExtensions]].
  */
object RangeBinJoinRewrite extends Rule[LogicalPlan] {

  /** (lowerBound: b.t > a.t [+c] , upperBound: b.t <= a.t + w) extraction. */
  private case class RangePair(aT: Expression, bT: Expression, widthMicros: Long)

  private def timestampMicros(e: Expression): Option[Expression] = e.dataType match {
    case TimestampType => Some(UnixMicros(e))
    case _ => None
  }

  /** Match `x + INTERVAL w` → (x, micros(w)); both the ANSI day-time
    * interval literal (Long micros) and legacy CalendarInterval forms. */
  private def plusInterval(e: Expression): Option[(Expression, Long)] = {
    def micros(l: Literal): Option[Long] = (l.value, l.dataType) match {
      case (m: java.lang.Long, _: org.apache.spark.sql.types.DayTimeIntervalType)
        if m > 0 => Some(m)
      case (ci: org.apache.spark.unsafe.types.CalendarInterval, _)
        if ci.months == 0 && ci.days == 0 && ci.microseconds > 0 => Some(ci.microseconds)
      case _ => None
    }
    e match {
      case TimestampAddInterval(x, l: Literal, _) => micros(l).map((x, _))
      case TimeAddInterval(x, l: Literal) => l.value match {
        case d: java.time.Duration => Some((x, d.toNanos / 1000))
        case _ => micros(l).map((x, _))
      }
      case Add(x, l: Literal, _) => micros(l).map((x, _))
      case _ => None
    }
  }

  /** From the conjuncts, find a (strict lower on bT vs aT, upper bT <= aT+w)
    * pair over TimestampType attributes from opposite join sides. */
  private def findRange(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[RangePair] = {
    def sideOf(e: Expression): Option[Boolean] = { // Some(true)=left only
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(left.outputSet)) Some(true)
      else if (refs.subsetOf(right.outputSet)) Some(false)
      else None
    }
    // upper bound: bT <= aT + w  (bT from right, aT from left)
    val upper = conjuncts.collectFirst {
      case LessThanOrEqual(bT, rhs)
        if sideOf(bT).contains(false) && plusInterval(rhs).exists(p => sideOf(p._1).contains(true)) =>
        val (aT, w) = plusInterval(rhs).get
        (aT, bT, w)
      case GreaterThanOrEqual(rhs, bT)
        if sideOf(bT).contains(false) && plusInterval(rhs).exists(p => sideOf(p._1).contains(true)) =>
        val (aT, w) = plusInterval(rhs).get
        (aT, bT, w)
    }
    upper.flatMap { case (aT, bT, w) =>
      val hasLower = conjuncts.exists {
        case GreaterThan(l, r) => l.semanticEquals(bT) && r.semanticEquals(aT)
        case LessThan(l, r) => l.semanticEquals(aT) && r.semanticEquals(bT)
        case GreaterThanOrEqual(l, r) => l.semanticEquals(bT) && r.semanticEquals(aT)
        case LessThanOrEqual(l, r) => l.semanticEquals(aT) && r.semanticEquals(bT)
        case _ => false
      }
      if (hasLower && w > 0 && aT.dataType == TimestampType && bT.dataType == TimestampType)
        Some(RangePair(aT, bT, w))
      else None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && !j.getTagValue(rewritten).contains(true)
          && !left.output.exists(_.name == "__graft_bin_l")
          && !right.output.exists(_.name == "__graft_bin_r") =>
      val conjuncts = splitConjunctivePredicates(cond)
      // an existing cross-side equality means the planner hash-joins on it
      // already — the bin explode would only double that join's probe side
      def crossSides(l: Expression, r: Expression): Boolean =
        l.references.nonEmpty && r.references.nonEmpty &&
          ((l.references.subsetOf(left.outputSet) && r.references.subsetOf(right.outputSet)) ||
            (l.references.subsetOf(right.outputSet) && r.references.subsetOf(left.outputSet)))
      val hasEquiKey = conjuncts.exists {
        case EqualTo(l, r) => crossSides(l, r)
        case EqualNullSafe(l, r) => crossSides(l, r)
        case _ => false
      }
      if (hasEquiKey) j
      else findRange(conjuncts, left, right) match {
        case Some(RangePair(aT, bT, w)) =>
          val binL = Alias(IntegralDivide(UnixMicros(aT), Literal(w)), "__graft_bin_l")()
          val binRBase = IntegralDivide(UnixMicros(bT), Literal(w))
          val newLeft = Project(left.output :+ binL, left)
          // right side exploded into its two candidate bins
          val binArr = CreateArray(Seq(binRBase, Subtract(binRBase, Literal(1L))))
          val binROut = AttributeReference("__graft_bin_r", LongType)()
          val newRight = Generate(Explode(binArr), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(binROut), right)
          val newCond = And(EqualTo(binL.toAttribute, binROut), cond)
          val newJoin = Join(newLeft, newRight, Inner, Some(newCond), hint)
          newJoin.setTagValue(rewritten, true) // only the join we created
          Project(j.output, newJoin)
        case None => j
      }
  }

  private val rewritten = new org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean]("graftRangeBinRewritten")

  private def splitConjunctivePredicates(condition: Expression): Seq[Expression] =
    condition match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => other :: Nil
    }
}
