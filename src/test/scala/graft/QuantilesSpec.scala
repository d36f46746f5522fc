package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Quantiles

class QuantilesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  test("sort-rank quantiles match the built-in exact percentile") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1 to 1001).map(i => (i % 3, (i * 37 % 997).toDouble)).toDF("g", "v")
    val got = Quantiles.exactQuantiles(df, Seq("g"), "v", Seq(0.25, 0.5, 0.75))
      .orderBy($"g").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val exp = df.groupBy($"g")
      .agg(percentile($"v", lit(0.25)).as("p25"),
        percentile($"v", lit(0.5)).as("p50"),
        percentile($"v", lit(0.75)).as("p75"))
      .orderBy($"g").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    got.zip(exp).foreach { case ((g1, a1, b1, c1), (g2, a2, b2, c2)) =>
      assert(g1 == g2)
      assert(math.abs(a1 - a2) < 1e-9 && math.abs(b1 - b2) < 1e-9 && math.abs(c1 - c2) < 1e-9)
    }
  }

  test("global quantiles (no grouping) interpolate like percentile") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1 to 100).map(i => ("x", i.toDouble)).toDF("k", "v")
    val got = Quantiles.exactQuantiles(df, Nil, "v", Seq(0.5, 0.9)).collect().head
    assert(math.abs(got.getDouble(0) - 50.5) < 1e-9)
    assert(math.abs(got.getDouble(1) - 90.1) < 1e-9)
  }
}
