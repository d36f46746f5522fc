package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator custom plan (SURVEY §7.3 option (c), the deep end of
  * the custom-operator ladder): top-k rows per group without a full sort.
  *
  * The window-function formulation (`row_number().over(...) <= k`) sorts
  * every group completely; this operator keeps a bounded heap of k rows
  * per group instead — O(n log k) work and O(groups·k) memory. The
  * strategy plans it in two phases like an aggregate: a partial pass on
  * whatever partitioning the child has (map-side reduction to ≤k rows
  * per group per partition), then a final pass after Catalyst inserts the
  * exchange demanded by `ClusteredDistribution(groupExprs)`. At 100 TB
  * the shuffle therefore moves at most groups·k·partitions rows, not the
  * full table.
  *
  * Null ordering values sort WORST (after every non-null value, i.e.
  * NULLS LAST for the chosen direction) — they fill remaining top-k
  * slots only when a group has fewer than k better rows, matching
  * `row_number` over `ORDER BY x DESC` (whose default is NULLS LAST).
  * Ties at the k-boundary keep an arbitrary row (supply a unique
  * composite ordering expression for deterministic output).
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    orderExpr: Expression,
    k: Int,
    desc: Boolean,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, desc, child) =>
      val partial = TopKPerGroupExec(g, o, k, desc, partial = true, planLater(child))
      TopKPerGroupExec(g, o, k, desc, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    orderExpr: Expression,
    k: Int,
    desc: Boolean,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val boundGroup = groupExprs.map(BindReferences.bindReference(_, child.output))
    val boundOrder = BindReferences.bindReference(orderExpr, child.output)
    val kLocal = k
    val baseOrd = TypeUtils.getInterpretedOrdering(orderExpr.dataType)
    val descLocal = desc
    // "goodness": >0 means a ranks strictly better than b. Nulls are
    // always worst (NULLS LAST for either direction).
    val cmpGood: (Any, Any) => Int = (a, b) =>
      if (a == null && b == null) 0
      else if (a == null) -1
      else if (b == null) 1
      else if (descLocal) baseOrd.compare(a, b)
      else -baseOrd.compare(a, b)
    // heap dequeues the WORST kept row: order the queue so the worst
    // value has the highest priority
    val heapOrd: Ordering[(Any, InternalRow)] =
      (x: (Any, InternalRow), y: (Any, InternalRow)) => cmpGood(y._1, x._1)
    val better: (Any, Any) => Boolean = (a, b) => cmpGood(a, b) > 0
    // buffer-backed ordering values (UTF8String/binary/nested) alias the
    // scan's reused UnsafeRow buffer — they must be copied before they
    // outlive the current iterator position, or stored heap keys mutate
    // as iteration advances
    val copyValue: Any => Any = orderExpr.dataType match {
      case org.apache.spark.sql.types.StringType =>
        v => v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].clone()
      case org.apache.spark.sql.types.BinaryType =>
        v => v.asInstanceOf[Array[Byte]].clone()
      case _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.MapType |
           _: org.apache.spark.sql.types.StructType => {
        case r: InternalRow => r.copy()
        case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
        case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
        case other => other
      }
      case _ => identity // primitives and immutable boxed values
    }

    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(boundGroup)
      val heaps = new java.util.HashMap[UnsafeRow, mutable.PriorityQueue[(Any, InternalRow)]]()
      while (it.hasNext) {
        val row = it.next()
        val v0 = boundOrder.eval(row)
        val v = if (v0 == null) null else copyValue(v0)
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null) {
          q = mutable.PriorityQueue.empty[(Any, InternalRow)](heapOrd)
          heaps.put(key.copy(), q)
        }
        if (q.size < kLocal) q.enqueue((v, row.copy()))
        else if (better(v, q.head._1)) {
          q.dequeue()
          q.enqueue((v, row.copy()))
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator.map(_._2))
    }, preservesPartitioning = true)
  }
}
