package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.TimeSeries

/** Round-9 wave #3: Engle–Granger cointegration and DTW distance —
  * independent reference implementations, degenerate-case drops, and the
  * partitioning-invariance contract. */
class Round79OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  // ---- engleGranger ----------------------------------------------------

  /** Straight-line Scala reference: OLS + DF regression with plain
    * loops — a different code path than the operator's fold columns. */
  private def refEG(y: Seq[Long], x: Seq[Long])
      : (Double, Double, Double, Double) = {
    val n = y.length.toDouble
    val sx = x.map(_.toDouble).sum; val sy = y.map(_.toDouble).sum
    val sxx = x.map(v => v.toDouble * v).sum
    val sxy = y.zip(x).map { case (a, b) => a.toDouble * b }.sum
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val a = (sy - b * sx) / n
    val e = y.zip(x).map { case (yy, xx) => yy - a - b * xx }
    val s11 = e.init.map(v => v * v).sum
    val s12 = e.init.zip(e.tail).map { case (p, c) => p * (c - p) }.sum
    val g = s12 / s11
    val ssr = e.init.zip(e.tail).map { case (p, c) =>
      val d = c - p - g * p; d * d }.sum
    val t = g / math.sqrt((ssr / (y.length - 2)) / s11)
    (b, a, g, t)
  }

  test("engleGranger matches a straight-line reference implementation") {
    import spark.implicits._
    // y tracks 2x with a decaying disturbance: cointegrated by build
    val x = (1 to 30).map(i => 100L + i * 7 + (i * i) % 13)
    val y = x.zipWithIndex.map { case (xx, i) => 2 * xx + ((i * 5) % 11) }
    val df = y.indices.map(i => ("g", i, y(i), x(i))).toDF("k","i","y","x")
    val r = TimeSeries.engleGranger(df, "k", "i", "y", "x").collect()(0)
    val (b, a, g, t) = refEG(y, x)
    assert(r.getAs[Long]("n") == 30L)
    assert(math.abs(r.getAs[Double]("beta") - b) < 1e-6, s"got $r want $b")
    assert(math.abs(r.getAs[Double]("alpha") - a) < 1e-4, s"got $r want $a")
    assert(math.abs(r.getAs[Double]("gamma") - g) < 1e-6, s"got $r want $g")
    assert(math.abs(r.getAs[Double]("adf_t") - t) < 1e-4, s"got $r want $t")
    // stationary residuals by construction → strongly negative DF stat
    assert(r.getAs[Double]("adf_t") < -3.0, s"got $r")
  }

  test("engleGranger drops exact fits and constant regressors") {
    import spark.implicits._
    // y = 2x exactly → zero residuals (s11 = 0); constant x → singular
    val rows = (1 to 10).map(i => ("exact", i, 2L * i * 10, i * 10L)) ++
      (1 to 10).map(i => ("const", i, (i * 3 % 7).toLong, 5L))
    val df = rows.toDF("k", "i", "y", "x")
    assert(TimeSeries.engleGranger(df, "k", "i", "y", "x").count() == 0L)
  }

  test("engleGranger is partitioning-invariant") {
    import spark.implicits._
    val rows = (1 to 200).map(i =>
      ("g", i, (i * 20 + (i * 13) % 97).toLong, (i * 10 + (i * 7) % 31).toLong))
    val a = TimeSeries.engleGranger(rows.toDF("k","i","y","x")
      .repartition(1), "k", "i", "y", "x").collect()(0)
    val b = TimeSeries.engleGranger(rows.toDF("k","i","y","x")
      .repartition(32), "k", "i", "y", "x").collect()(0)
    assert(a.getAs[Double]("adf_t") == b.getAs[Double]("adf_t"))
    assert(a.getAs[Double]("gamma") == b.getAs[Double]("gamma"))
  }

  // ---- dtwDistance -----------------------------------------------------

  test("dtwDistance matches the hand-computed DP") {
    import spark.implicits._
    // s=[5,3,4] vs r=[4,6]: dp → dtw = |5-4| + |3-4|?? — full grid gives 4
    // (verified against a straight-line DP: path (5,4)(3,4)(4,4)(4,6)
    // costs 1+1+0+2 = 4)
    val s = Seq(("g", 1, 5L), ("g", 2, 3L), ("g", 3, 4L)).toDF("k","i","v")
    val r = Seq((1, 4L), (2, 6L)).toDF("i", "v")
    val out = TimeSeries.dtwDistance(s, "k", "i", "v", r, "i", "v")
      .collect()(0)
    assert(out.getAs[Long]("n") == 3L && out.getAs[Long]("m") == 2L)
    assert(out.getAs[Long]("dtw_cents") == 4L, s"got $out")
    assert(math.abs(out.getAs[Double]("dtw_norm") - 4.0 / 5.0) < 1e-12)
  }

  test("dtwDistance is zero for an identical series and tolerant of shift") {
    import spark.implicits._
    val vals = (1 to 40).map(i => ((i * 17) % 23 + i).toLong)
    val ref = vals.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "v")
    // same series → 0; the same series shifted by one step → small,
    // far below the pointwise (Euclidean-ish) mismatch
    val shifted = vals.drop(1) :+ vals.last
    val s = (vals.zipWithIndex.map { case (v, i) => ("same", i, v) } ++
      shifted.zipWithIndex.map { case (v, i) => ("shift", i, v) })
      .toDF("k", "i", "v")
    val out = TimeSeries.dtwDistance(s, "k", "i", "v", ref, "i", "v")
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Long]("dtw_cents"))
      .toMap
    assert(out("same") == 0L, s"got $out")
    val pointwise = vals.zip(shifted).map { case (a, b) =>
      math.abs(a - b) }.sum
    assert(out("shift") < pointwise / 2, s"got $out vs pointwise $pointwise")
  }

  test("dtwDistance is partitioning-invariant") {
    import spark.implicits._
    val vals = (1 to 60).map(i => ((i * 31) % 101).toLong)
    val ref = (1 to 60).map(i => (i, ((i * 13) % 89).toLong)).toDF("i", "v")
    val rows = vals.zipWithIndex.map { case (v, i) => ("g", i, v) }
    val a = TimeSeries.dtwDistance(rows.toDF("k","i","v").repartition(1),
      "k", "i", "v", ref, "i", "v").collect()(0)
    val b = TimeSeries.dtwDistance(rows.toDF("k","i","v").repartition(32),
      "k", "i", "v", ref, "i", "v").collect()(0)
    assert(a.getAs[Long]("dtw_cents") == b.getAs[Long]("dtw_cents"))
    assert(a.getAs[Double]("dtw_norm") == b.getAs[Double]("dtw_norm"))
  }
}
