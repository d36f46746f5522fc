package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Profile, TimeSeries}

/** Round-6 eighteenth-wave operators: Theil–Sen, autocorrelation,
  * jackknife. */
class Round26OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  test("theilSen ignores the outlier OLS would chase") {
    import spark.implicits._
    // y = 2x except one wild point; median slope stays 2
    val pts = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0),
      (5.0, 500.0)).map { case (x, y) => ("k", x, y) }
    val r = TimeSeries.theilSen(pts.toDF("k", "x", "y"), "k", "x", "y")
      .collect()(0)
    assert(r.getInt(1) == 5 && r.getLong(2) == 10)
    assert(r.getDouble(3) == 2.0)
  }

  test("theilSen: equal-x pairs are excluded, keys over maxPoints dropped") {
    import spark.implicits._
    val dup = Seq(("k", 1.0, 1.0), ("k", 1.0, 9.0), ("k", 2.0, 3.0))
      .toDF("k", "x", "y")
    val r = TimeSeries.theilSen(dup, "k", "x", "y").collect()(0)
    assert(r.getLong(2) == 2) // (1,1)-(2,3) and (1,9)-(2,3) only
    val big = (1 to 50).map(i => ("big", i.toDouble, i.toDouble))
      .toDF("k", "x", "y")
    assert(TimeSeries.theilSen(big, "k", "x", "y", maxPoints = 10)
      .count() == 0)
  }

  test("lag1Autocorr: trend ~ +1, alternation -> -1 exactly on symmetric data") {
    import spark.implicits._
    // perfect alternation 0,4,0,4,... -> pairs (0,4),(4,0) balanced -> r1 = -1
    val alt = (1 to 20).map(i => ("a", i.toLong, if (i % 2 == 0) 4L else 0L))
    val r = TimeSeries.lag1Autocorr(alt.toDF("k", "o", "v"), "k", "o", "v")
      .collect()(0)
    assert(r.getLong(1) == 19)
    assert(r.getDouble(2) < -0.99)
    // constant series: zero variance -> dropped
    val const = (1 to 5).map(i => ("c", i.toLong, 7L))
    assert(TimeSeries.lag1Autocorr(const.toDF("k", "o", "v"),
      "k", "o", "v").count() == 0)
  }

  test("jackknifeRatioSE: hand-computed leave-one-out variance") {
    import spark.implicits._
    // two units: (n,d) = (1,2) and (3,6). total ratio = 4/8 = 0.5.
    // loo ratios: drop u1 -> 3/6 = .5; drop u2 -> 1/2 = .5 -> SE 0
    val even = Seq(("u1", 1L, 2L), ("u2", 3L, 6L)).toDF("u", "n", "d")
    val r0 = Profile.jackknifeRatioSE(even, "u", "n", "d").collect()(0)
    assert(r0.getDouble(1) == 0.5 && r0.getDouble(2) == 0.0)
    // heterogeneous: (2,4), (0,4): total 2/8=0.25;
    // loo: 0/4=0, 2/4=.5; mean .25; ssq=2*(.25)^2=.125; se=sqrt(.5*.125)=.25
    val het = Seq(("u1", 2L, 4L), ("u2", 0L, 4L)).toDF("u", "n", "d")
    val r1 = Profile.jackknifeRatioSE(het, "u", "n", "d").collect()(0)
    assert(r1.getDouble(1) == 0.25 && r1.getDouble(2) == 0.25)
    assert(r1.getDouble(3) == 0.25 - 1.96 * 0.25 &&
      r1.getDouble(4) == 0.25 + 1.96 * 0.25)
  }
}
