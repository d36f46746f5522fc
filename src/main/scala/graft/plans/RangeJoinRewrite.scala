package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, LongType}

/** Optimizer rule: rewrite the pure range join
  *
  * {{{ a JOIN b ON  b.lo <= a.pt AND a.pt <= b.hi }}}
  *
  * (no equi conjunct — Spark's only physical choice is a nested-loop
  * join, O(|a|·|b|) and a driver-killer at scale) into a BINNED
  * equi-join: the point side computes `bin = floor(pt / w)`, the
  * interval side EXPLODES its covered bin range, and the join becomes a
  * hash join on the bin plus the original predicate as an exact
  * residual — cost |a| + |b|·(interval span / w) instead of |a|·|b|.
  * This is the standard interval-join rewrite (DuckDB ships IEJoin,
  * Databricks a range-join hint; here it is an injected rule over the
  * open Catalyst API).
  *
  * Fires only when exactly semantics-preserving AND profitable:
  *  - inner join whose condition splits into bound conjuncts
  *    `pt >= lo` / `pt <= hi` (strict or inclusive) with the SAME
  *    deterministic point expression from one side and both bound
  *    expressions from the other — plus any residual conjuncts that
  *    stay in the join condition untouched;
  *  - NO equi conjunct between the sides (one would already make this
  *    a hash join — the rewrite would only add work);
  *  - numeric types (int/long/float/double), all compared in double —
  *    floor-of-double binning is monotone, so a point's bin always
  *    falls inside its interval's exploded bin range;
  *  - `spark.graft.rangeJoin.binWidth` set positive (bin width is
  *    domain knowledge: ~the typical interval length; a poor choice
  *    costs performance, never correctness — the residual predicate is
  *    always applied).
  *
  * Empty intervals (lo > hi) explode to zero bins — `sequence` would
  * count DOWN, so the range is guarded with an `if`.
  */
object RangeJoinRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  private val WidthKey = "spark.graft.rangeJoin.binWidth"

  private def numeric(e: Expression): Boolean = e.dataType match {
    case IntegerType | LongType | FloatType | DoubleType => true
    case _ => false
  }

  private def dbl(e: Expression): Expression = e.dataType match {
    case DoubleType => e
    case _ => Cast(e, DoubleType)
  }

  /** (point, bound) when `c` is a lower/upper bound between the sides. */
  private def boundPair(c: Expression, lower: Boolean,
      left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression)] = {
    def sides(pt: Expression, bd: Expression): Option[(Expression, Expression)] = {
      val ok = numeric(pt) && numeric(bd) && pt.deterministic && bd.deterministic &&
        ((pt.references.subsetOf(left.outputSet) && bd.references.subsetOf(right.outputSet)) ||
          (pt.references.subsetOf(right.outputSet) && bd.references.subsetOf(left.outputSet)))
      if (ok && pt.references.nonEmpty && bd.references.nonEmpty) Some((pt, bd)) else None
    }
    c match {
      case GreaterThanOrEqual(a, b) => if (lower) sides(a, b) else sides(b, a)
      case GreaterThan(a, b)        => if (lower) sides(a, b) else sides(b, a)
      case LessThanOrEqual(a, b)    => if (lower) sides(b, a) else sides(a, b)
      case LessThan(a, b)           => if (lower) sides(b, a) else sides(a, b)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthKey, "0").toDouble
    if (width <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) =>
            (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
              (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
          case _ => false
        }
        val lowers = conjuncts.flatMap(c => boundPair(c, lower = true, left, right))
        val uppers = conjuncts.flatMap(c => boundPair(c, lower = false, left, right))
        val pair = (for {
          (pt1, lo) <- lowers; (pt2, hi) <- uppers
          if pt1.semanticEquals(pt2)
        } yield (pt1, lo, hi)).headOption
        pair match {
          case Some((pt, lo, hi)) if !hasEqui =>
            val ptOnLeft = pt.references.subsetOf(left.outputSet)
            val (ptSide, ivSide) = if (ptOnLeft) (left, right) else (right, left)
            val w = Literal(width, DoubleType)
            def binOf(e: Expression): Expression =
              Cast(Floor(Divide(dbl(e), w)), LongType)
            // point side: one projected bin column
            val ptAlias = Alias(binOf(pt), "__graft_pt_bin")()
            val ptProj = Project(ptSide.output :+ ptAlias, ptSide)
            // interval side: explode the covered bin range (guarded —
            // sequence(a, b) counts DOWN when a > b)
            val startB = binOf(lo)
            val endB = binOf(hi)
            // the analyzer normally fills Sequence's timezone; an
            // optimizer-built one must carry it or the plan unresolves
            val seq = If(LessThanOrEqual(startB, endB),
              Sequence(startB, endB, Some(Literal(1L, LongType)),
                Some(conf.sessionLocalTimeZone)),
              Literal.create(Array.empty[Long],
                ArrayType(LongType, containsNull = false)))
            val binAttr = AttributeReference("__graft_iv_bin", LongType,
              nullable = false)()
            val ivGen = Generate(Explode(seq), unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(binAttr), child = ivSide)
            val newCond = And(EqualTo(ptAlias.toAttribute, binAttr), cond)
            val (nl, nr) =
              if (ptOnLeft) (ptProj: LogicalPlan, ivGen: LogicalPlan)
              else (ivGen: LogicalPlan, ptProj: LogicalPlan)
            Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
          case _ => j
        }
    }
  }
}