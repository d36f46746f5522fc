package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous top-k-per-group idiom
  *
  * {{{ Filter(rn <= k, Window(rn := row_number() OVER (PARTITION BY g ORDER BY o), ...)) }}}
  *
  * to run the bounded-heap [[TopKPerGroup]] operator UNDER the window:
  * the partial phase reduces every scan partition to at most k rows per
  * group before the exchange, so the shuffle moves ~groups·k·partitions
  * rows instead of the whole table, and the window then sorts only
  * groups·k rows to re-derive the row numbers. At 100 TB this turns the
  * dominant sort-everything plan into a streaming scan.
  *
  * Fires only when the rewrite is exactly semantics-preserving:
  *  - single `row_number()` window expression, non-empty PARTITION BY;
  *  - single ORDER BY key whose null ordering is NULLS LAST (the default
  *    for DESC) — [[TopKPerGroupExec]] ranks nulls worst, i.e. NULLS LAST;
  *  - deterministic ordering expression;
  *  - a literal integer bound `rn <= k` / `rn < k` with k >= 1.
  *
  * Like any `row_number` bound, ties at the k-boundary are resolved
  * arbitrarily unless the ordering key is unique — the rewrite preserves
  * the set of possible outcomes, not one particular tie-break.
  *
  * Relationship to Spark's own `InferWindowGroupLimit` (3.5+): the
  * built-in rule inserts sort-based partial `WindowGroupLimit`s and also
  * covers multi-key orderings and rank()/dense_rank(). This rule fires
  * first (only on the single-key shapes above) and replaces the
  * per-partition SORT of all rows with a bounded HEAP — O(n log k)
  * versus O(n log n) map-side work; everything it declines falls through
  * to the built-in.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private def boundOf(cond: Expression, rnId: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k)) if a.exprId == rnId => Some(k)
    case LessThan(a: AttributeReference, IntegerLiteral(k)) if a.exprId == rnId => Some(k - 1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: AttributeReference) if a.exprId == rnId => Some(k)
    case GreaterThan(IntegerLiteral(k), a: AttributeReference) if a.exprId == rnId => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
          partitionSpec, Seq(order), child, _))
        if partitionSpec.nonEmpty &&
          !child.isInstanceOf[TopKPerGroup] &&
          order.nullOrdering == NullsLast &&
          order.child.deterministic &&
          partitionSpec.forall(_.deterministic) =>
      boundOf(cond, alias.exprId) match {
        case Some(k) if k >= 1 =>
          val desc = order.direction == Descending
          val topk = TopKPerGroup(partitionSpec, order.child, k, desc, child)
          f.copy(child = w.copy(child = topk))
        case _ => f
      }
  }
}
