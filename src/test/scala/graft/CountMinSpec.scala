package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.CountMinAgg

class CountMinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private def words = {
    import spark.implicits._
    // zipfish: w0 appears 5000x, w1 2500x, ... plus a long tail
    ((0 until 10).flatMap(i => Seq.fill(5000 >> i)(s"w$i")) ++
      (0 until 2000).map(i => s"tail$i")).toDF("w").repartition(8)
  }

  test("count-min estimates bound true counts within epsilon*N") {
    import spark.implicits._
    val sk = words.select(CountMinAgg.sketch($"w", 0.001, 0.99).as("cms"))
      .as[Array[Byte]].head()
    val n = words.count()
    for (i <- 0 until 10) {
      val truth = 5000 >> i
      val est = CountMinAgg.estimate(sk, s"w$i")
      assert(est >= truth, s"w$i: $est < $truth (CMS never undercounts)")
      assert(est <= truth + (0.001 * n).toLong + 1, s"w$i overcounted: $est vs $truth")
    }
  }

  test("typed aggregator works per group and partial sketches merge") {
    import spark.implicits._
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "x"))
      .toDF("g", "w")
    val perGroup = df.groupBy($"g")
      .agg(CountMinAgg.sketch($"w", 0.01, 0.99).as("cms"))
      .as[(String, Array[Byte])].collect().toMap
    assert(CountMinAgg.estimate(perGroup("a"), "x") == 2L)
    assert(CountMinAgg.estimate(perGroup("a"), "y") == 1L)
    assert(CountMinAgg.estimate(perGroup("b"), "x") == 1L)
    // merging per-group sketches == sketching the union
    val merged = CountMinAgg.mergeAll(perGroup.values.toSeq)
    assert(CountMinAgg.estimate(merged, "x") == 3L)
  }
}
