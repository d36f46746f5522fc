package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.TimeSeries

/** Round-9 wave #4: cross-correlation function and periodogram —
  * independent reference computations, structural laws (lag-0 CCF =
  * Pearson, pure-cosine series concentrates power at its frequency),
  * and the partitioning-invariance contract. */
class Round80OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private def pearson(a: Seq[Long], b: Seq[Long]): Double = {
    val n = a.length.toDouble
    val sx = a.map(_.toDouble).sum; val sy = b.map(_.toDouble).sum
    val sxy = a.zip(b).map { case (p, q) => p.toDouble * q }.sum
    val sxx = a.map(v => v.toDouble * v).sum
    val syy = b.map(v => v.toDouble * v).sum
    (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
  }

  // ---- ccf ---------------------------------------------------------------

  test("ccf at lag 0 is Pearson; at lag k it matches the shifted overlap") {
    import spark.implicits._
    val x = (1 to 50).map(i => ((i * 7) % 23).toLong)
    // y is x delayed by 2 steps (y_t = x_{t-2}) → CCF peaks at lag -2
    // (x at t correlates with y at t+(-2)... y_{t+2} = x_t → peak at +2)
    val y = Seq(0L, 0L) ++ x.dropRight(2)
    val df = x.indices.map(i => ("g", i, x(i), y(i))).toDF("k","i","x","y")
    val out = TimeSeries.ccf(df, "k", "i", "x", "y", maxLag = 3)
      .collect().map(r => r.getAs[Long]("lag") ->
        (r.getAs[Double]("ccf"), r.getAs[Long]("n_pairs"))).toMap
    // lag 0: plain Pearson over the full overlap
    assert(math.abs(out(0L)._1 - pearson(x, y)) < 1e-6, s"got $out")
    // lag +2: x_t vs y_{t+2} = x_t → correlation 1 over the 48 pairs
    assert(out(2L)._1 == 1.0 && out(2L)._2 == 48L, s"got $out")
    // reference check at lag -1: x_t vs y_{t-1}, overlap t=1..49
    val ref = pearson(x.tail, y.init)
    assert(math.abs(out(-1L)._1 - ref) < 1e-6, s"got ${out(-1L)} want $ref")
  }

  test("ccf drops constant-side lags") {
    import spark.implicits._
    val df = (1 to 20).map(i => ("g", i, 5L, (i * 3 % 7).toLong))
      .toDF("k", "i", "x", "y")
    assert(TimeSeries.ccf(df, "k", "i", "x", "y", maxLag = 2).count() == 0L)
  }

  test("ccf is partitioning-invariant") {
    import spark.implicits._
    val rows = (1 to 300).map(i =>
      ("g", i, ((i * 11) % 101).toLong, ((i * 17) % 89).toLong))
    val a = TimeSeries.ccf(rows.toDF("k","i","x","y").repartition(1),
      "k", "i", "x", "y", 3).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("ccf")).toMap
    val b = TimeSeries.ccf(rows.toDF("k","i","x","y").repartition(32),
      "k", "i", "x", "y", 3).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("ccf")).toMap
    assert(a == b)
  }

  // ---- periodogram ---------------------------------------------------------

  test("periodogram concentrates power at a planted frequency") {
    import spark.implicits._
    // v_t = round(1e8·cos(2π·3t/n)): all power at k=3, ~zero elsewhere
    val n = 120
    val rows = (0 until n).map { t =>
      ("g", t, math.round(1e8 * math.cos(2 * math.Pi * 3 * t / n)))
    }
    val out = TimeSeries.periodogram(rows.toDF("k", "i", "v"),
        "k", "i", "v", maxFreq = 6, valueScale = 1e-8)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Double]("power"))
      .toMap
    // planted k=3: P = n·amp²/4 /... with scaling amp'=1: C ≈ n/2 →
    // P ≈ n/4 = 30; off frequencies ≈ 0
    assert(math.abs(out(3L) - n / 4.0) < 0.01, s"got $out")
    for (k <- Seq(1L, 2L, 4L, 5L, 6L))
      assert(out(k) < 0.01, s"leakage at $k: $out")
  }

  test("periodogram matches a straight-line reference DFT") {
    import spark.implicits._
    val vals = (0 until 80).map(t => ((t * 13) % 31 + (t * 7) % 11) * 1000000L)
    val rows = vals.zipWithIndex.map { case (v, t) => ("g", t, v) }
    val out = TimeSeries.periodogram(rows.toDF("k", "i", "v"),
        "k", "i", "v", maxFreq = 4, valueScale = 1e-8)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Double]("power"))
      .toMap
    val n = vals.length
    val mu = vals.map(_.toDouble).sum / n
    for (k <- 1 to 4) {
      val c = vals.zipWithIndex.map { case (v, t) =>
        (v - mu) * 1e-8 * math.cos(2 * math.Pi * k * t / n) }.sum
      val s = vals.zipWithIndex.map { case (v, t) =>
        (v - mu) * 1e-8 * math.sin(2 * math.Pi * k * t / n) }.sum
      val p = (c * c + s * s) / n
      assert(math.abs(out(k.toLong) - p) < 1e-6, s"k=$k got ${out(k.toLong)} want $p")
    }
  }

  test("periodogram is partitioning-invariant") {
    import spark.implicits._
    val rows = (0 until 200).map(t => ("g", t, ((t * 37) % 1009) * 100000L))
    val a = TimeSeries.periodogram(rows.toDF("k","i","v").repartition(1),
      "k", "i", "v", 5, 1e-8).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Double]("power")).toMap
    val b = TimeSeries.periodogram(rows.toDF("k","i","v").repartition(32),
      "k", "i", "v", 5, 1e-8).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Double]("power")).toMap
    assert(a == b)
  }
}
