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

  test("fractions outside [0,1] are rejected up front") {
    import spark.implicits._
    val df = Seq((1, 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, Seq("g"), "v", Seq(0.5, 1.5))
    }
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, Seq("g"), "v", Seq(-0.1))
    }
  }

  test("high-cardinality groups route to the distributed window path and stay exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 100k groups × 3 values: far past the forced histogram cap, so the
    // driver-histogram path MUST NOT run (it would be 100k+ collected
    // entries); the windowed fallback must still match built-in percentile
    val df = spark.range(300000)
      .select(($"id" % 100000).as("g"), (($"id" * 37) % 997).cast("double").as("v"))
    val got = Quantiles.exactQuantiles(df, Seq("g"), "v", Seq(0.5), maxDriverHistogram = 1000L)
    val exp = df.groupBy($"g").agg(percentile($"v", lit(0.5)).as("e"))
    val joined = got.join(exp, "g")
      .select(abs(col("p50") - col("e")).as("d"))
      .agg(max(col("d"))).collect().head.getDouble(0)
    assert(joined < 1e-9, s"windowed quantiles diverge from percentile by $joined")
    assert(got.count() == 100000)
  }

  test("multi-column quantiles equal per-column quantiles from one sort") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1 to 500).map(i =>
      (i % 4, (i * 37 % 997).toDouble, (i * 53 % 991).toDouble)).toDF("g", "a", "b")
    val wide = Quantiles.exactQuantilesMulti(df, Seq("g"), Seq("a", "b"), Seq(0.25, 0.75))
      .orderBy($"g").collect()
    val ea = Quantiles.exactQuantiles(df, Seq("g"), "a", Seq(0.25, 0.75)).orderBy($"g").collect()
    val eb = Quantiles.exactQuantiles(df, Seq("g"), "b", Seq(0.25, 0.75)).orderBy($"g").collect()
    wide.zip(ea.zip(eb)).foreach { case (w, (a, b)) =>
      assert(w.getInt(0) == a.getInt(0))
      assert(math.abs(w.getAs[Double]("a_p25") - a.getDouble(1)) < 1e-9)
      assert(math.abs(w.getAs[Double]("a_p75") - a.getDouble(2)) < 1e-9)
      assert(math.abs(w.getAs[Double]("b_p25") - b.getDouble(1)) < 1e-9)
      assert(math.abs(w.getAs[Double]("b_p75") - b.getDouble(2)) < 1e-9)
    }
  }

  test("multi-column quantiles work globally (no grouping) and with one fraction") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toDouble, (101 - i).toDouble)).toDF("a", "b")
    val row = Quantiles.exactQuantilesMulti(df, Nil, Seq("a", "b"), Seq(0.5)).collect().head
    assert(math.abs(row.getAs[Double]("a_p50") - 50.5) < 1e-9)
    assert(math.abs(row.getAs[Double]("b_p50") - 50.5) < 1e-9)
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
