package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Quantiles, TimeSeries}

/** Round-6 seventh-wave operators: decay score, clamped balance,
  * weighted median. */
class Round15OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private def r6(x: Double) = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("decayScore weights by exact integer-second age") {
    import spark.implicits._
    val df = Seq(("u", "2024-01-01 00:00:00", 10.0),
        ("u", "2024-01-01 00:00:30", 20.0),
        ("u", "2024-01-01 00:01:00", 40.0)) // reference event, Δt = 0
      .toDF("k", "ts", "v").withColumn("ts", $"ts".cast("timestamp"))
    val r = TimeSeries.decayScore(df, "k", "ts", "v", tauSeconds = 30.0)
      .collect()(0)
    assert(r.getLong(1) == 3)
    assert(r.getDouble(2) ==
      r6(10.0 * math.exp(-2.0) + 20.0 * math.exp(-1.0) + 40.0))
  }

  test("clampedRunningBalance clamps at zero and accounts the lost amount") {
    import spark.implicits._
    // +5, -8 (clamp: lose 3), +2, -1 -> final 1; sum = -2; lost = 3
    val df = Seq(("k", 1L, 5.0), ("k", 2L, -8.0), ("k", 3L, 2.0),
      ("k", 4L, -1.0)).toDF("k", "seq", "d")
    val r = TimeSeries.clampedRunningBalance(df, "k", Seq("seq"), "d")
      .collect()(0)
    assert(r.getLong(1) == 4)
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 3.0)
  }

  test("clampedRunningBalance order comes from orderCols, not arrival") {
    import spark.implicits._
    val df = Seq(("k", 2L, -8.0), ("k", 4L, -1.0), ("k", 1L, 5.0),
      ("k", 3L, 2.0)).toDF("k", "seq", "d").repartition(7)
    val r = TimeSeries.clampedRunningBalance(df, "k", Seq("seq"), "d")
      .collect()(0)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 3.0)
  }

  test("weightedMedian picks the smallest value reaching half the weight") {
    import spark.implicits._
    // values 1(w1), 2(w1), 3(w10): half of 12 is 6 -> median 3
    // group h: symmetric 1(w2), 2(w2): cum(1)=2, 2*2 >= 4 -> lower = 1
    val df = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 3.0, 10L),
      ("h", 1.0, 2L), ("h", 2.0, 2L)).toDF("k", "v", "w")
    val m = Quantiles.weightedMedian(df, Seq("k"), "v", "w")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(m("g") == (12L, 3.0))
    assert(m("h") == (4L, 1.0))
  }

  test("weightedMedian with unit weights equals the lower median") {
    import spark.implicits._
    val df = (1 to 9).map(v => ("k", v.toDouble, 1L)).toDF("k", "v", "w")
    val r = Quantiles.weightedMedian(df, Seq("k"), "v", "w").collect()(0)
    assert(r.getDouble(2) == 5.0)
    val even = (1 to 8).map(v => ("k", v.toDouble, 1L)).toDF("k", "v", "w")
    val r2 = Quantiles.weightedMedian(even, Seq("k"), "v", "w").collect()(0)
    assert(r2.getDouble(2) == 4.0) // lower median of 1..8
  }
}
