package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point: registers graft's native expressions as
  * SQL functions, the top-k rewrite rule, and the top-k planner strategy
  * at session construction.
  *
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`. For an already
  * running session use [[graft.functions.Functions.registerAll]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    graft.functions.Functions.sqlBuilders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
    // `row_number() <= k` filters run on the bounded-heap operator:
    // partial top-k before the exchange instead of a full per-group sort
    e.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
    // pure range joins (no equi conjunct) become binned hash joins when
    // spark.graft.rangeJoin.binWidth is set
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewriteRule)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
