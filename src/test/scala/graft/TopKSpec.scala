package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.TopK
import graft.sources.Tables

class TopKSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  test("custom top-k operator matches the window-function formulation") {
    import spark.implicits._
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    // unique composite so ties can't make the comparison flaky
    val ord = round($"o_totalprice" * 100).cast("long") * 10000000L + $"o_orderkey"

    val custom = TopK.topKPerGroup(orders, Seq("o_custkey"), ord, k = 3)
      .select($"o_custkey", $"o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy(ord.desc)
    val expected = orders.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).select($"o_custkey", $"o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(custom == expected)
    assert(custom.nonEmpty)
  }

  test("plan shows partial and final phases around one exchange") {
    import spark.implicits._
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val df = TopK.topKPerGroup(orders, Seq("o_custkey"), $"o_totalprice", 2)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerGroup ".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("Exchange hashpartitioning(o_custkey"), plan)
  }

  test("string ordering values are copied, not aliased to the scan buffer") {
    import spark.implicits._
    // many rows per group with distinct string keys: if the heap stored
    // UTF8String views into the reused UnsafeRow buffer, stored keys would
    // mutate as iteration advances and the winners would be wrong
    val df = (1 to 2000).map(i => (i % 7, f"s$i%06d")).toDF("g", "s")
      .repartition(4)
    val out = TopK.topKPerGroup(df, Seq("g"), $"s", k = 2)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"s".desc)
    val expected = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2).select($"g", $"s").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(out == expected)
  }

  test("ascending mode returns the smallest rows per group") {
    import spark.implicits._
    val df = Seq((1, 10), (1, 5), (1, 7), (2, 3), (2, 9)).toDF("g", "v")
    val out = TopK.topKPerGroup(df, Seq("g"), $"v", k = 1, desc = false)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(out == Set((1, 5), (2, 3)))
  }
}
