package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.Shims
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.plans.RangeJoinRewriteRule

/** The binned range-join rewrite: a pure inequality join must become a
  * hash join on bins + exact residual, and must stay bit-identical to
  * the naive nested-loop result. */
class RangeJoinRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = Session.local(4)
    Shims.addOptimization(s, RangeJoinRewriteRule)
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def points = {
    import spark.implicits._
    (-50 to 150).map(i => (i.toLong, i * 3 - 77)).toDF("pid", "pt")
  }

  private def intervals = {
    import spark.implicits._
    Seq((1L, -100, -40), (2L, -45, 10), (3L, 0, 0), (4L, 7, 300),
      (5L, 50, 20) /* empty */, (6L, 400, 500) /* no match */)
      .toDF("iid", "lo", "hi")
  }

  private def withWidth[A](w: String)(f: => A): A = {
    spark.conf.set("spark.graft.rangeJoin.binWidth", w)
    try f finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
  }

  test("rewrite fires: no nested-loop join, bins explode, result identical") {
    import spark.implicits._
    val naive = points.join(intervals,
        $"pt" >= $"lo" && $"pt" <= $"hi")
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val (plan, got) = withWidth("25") {
      val df = points.join(intervals, $"pt" >= $"lo" && $"pt" <= $"hi")
        .select($"pid", $"iid")
      (df.queryExecution.executedPlan.toString,
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    }
    assert(got == naive)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join must not plan as a nested loop:\n$plan")
    assert(plan.contains("Generate explode"),
      s"expected the interval side's bin explode:\n$plan")
  }

  test("strict bounds and reversed operand order are preserved exactly") {
    import spark.implicits._
    val naive = points.join(intervals,
        $"lo" < $"pt" && $"hi" > $"pt")   // bounds written from the other side
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val got = withWidth("10") {
      points.join(intervals, $"lo" < $"pt" && $"hi" > $"pt")
        .select($"pid", $"iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(got == naive)
  }

  test("extra residual conjuncts ride along untouched") {
    import spark.implicits._
    val cond = ($"pt" >= $"lo") && ($"pt" <= $"hi") && ($"pid" % 2 === 0)
    val naive = points.join(intervals, cond).select($"pid", $"iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = withWidth("40") {
      points.join(intervals, cond).select($"pid", $"iid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(got == naive && naive.nonEmpty)
  }

  test("declines when an equi conjunct already makes it a hash join") {
    import spark.implicits._
    val cond = ($"pid" === $"iid") && ($"pt" >= $"lo") && ($"pt" <= $"hi")
    val plan = withWidth("25") {
      points.join(intervals, cond).queryExecution.executedPlan.toString
    }
    assert(!plan.contains("Generate explode"),
      s"must not add bin work to an equi join:\n$plan")
  }

  test("disabled without the bin-width conf") {
    import spark.implicits._
    val plan = points.join(intervals, $"pt" >= $"lo" && $"pt" <= $"hi")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate explode"))
  }
}
