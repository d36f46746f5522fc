package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Hypothesis, Metrics, Quantiles}

/** Round-9 wave #2: Hill tail index, empirical tail dependence, Pettitt
  * changepoint, lag-1 Granger causality — hand-computed textbook cases,
  * documented edge semantics, and the partitioning-invariance contract. */
class Round78OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  // ---- hillTailIndex ---------------------------------------------------

  test("hillTailIndex matches the hand-computed k=2 estimate") {
    import spark.implicits._
    // top-3 of the positives: 100, 50, 40 → x_k = 40
    // H = (ln(100/40) + ln(50/40)) / 2; zero/negative values ignored
    val df = Seq(100L, 50L, 40L, 20L, 10L, 0L, -7L)
      .map(("g", _)).toDF("g", "v")
    val r = Quantiles.hillTailIndex(df, Seq("g"), "v", k = 2).collect()(0)
    val h = (math.log(100.0 / 40.0) + math.log(50.0 / 40.0)) / 2.0
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("x_k") == 40L)
    assert(math.abs(r.getAs[Double]("hill") - h) < 1e-6, s"got $r")
    assert(math.abs(r.getAs[Double]("alpha") - 1.0 / h) < 1e-5, s"got $r")
  }

  test("hillTailIndex drops short groups and degenerate (H=0) tails") {
    import spark.implicits._
    // "short": only k positives (needs k+1); "flat": top-3 all equal → H=0
    val df = (Seq(90L, 80L).map(("short", _)) ++
      Seq(70L, 70L, 70L, 10L).map(("flat", _))).toDF("g", "v")
    assert(Quantiles.hillTailIndex(df, Seq("g"), "v", k = 2).count() == 0L)
  }

  test("hillTailIndex is partitioning-invariant") {
    import spark.implicits._
    val rows = (1 to 500).map(i => ("g", (i.toLong * i * 7) % 99991 + 1))
    val a = Quantiles.hillTailIndex(rows.toDF("g", "v").repartition(1),
      Seq("g"), "v", k = 50).collect()(0)
    val b = Quantiles.hillTailIndex(rows.toDF("g", "v").repartition(32),
      Seq("g"), "v", k = 50).collect()(0)
    assert(a.getAs[Double]("hill") == b.getAs[Double]("hill"))
    assert(a.getAs[Long]("x_k") == b.getAs[Long]("x_k"))
  }

  // ---- tailDependence --------------------------------------------------

  test("tailDependence matches the hand-built decile case") {
    import spark.implicits._
    // n=10, m=1. x = 10i; y follows x except the two smallest swap:
    // top pair (100,100) is joint-upper; x-min (10) has y=20 (not y-min)
    // → n_upper=1 (λ_U=1), n_lower=0 (λ_L=0)
    val rows = (1 to 10).map { i =>
      val y = i match { case 1 => 20L; case 2 => 10L; case _ => i * 10L }
      ("g", i * 10L, y)
    }
    val r = Metrics.tailDependence(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect()(0)
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("m") == 1L)
    assert(r.getAs[Long]("n_upper") == 1L
      && r.getAs[Double]("lambda_u") == 1.0, s"got $r")
    assert(r.getAs[Long]("n_lower") == 0L
      && r.getAs[Double]("lambda_l") == 0.0, s"got $r")
  }

  test("tailDependence counts a boundary-straddling tie run whole") {
    import spark.implicits._
    // two rows tie at the x-max AND y-max: each has rank-count 10 > 9,
    // so BOTH are upper-tail → n_upper=2, λ_U=2.0 (documented semantics)
    val rows = (1 to 8).map(i => ("g", i * 10L, i * 10L)) ++
      Seq(("g", 100L, 100L), ("g", 100L, 100L))
    val r = Metrics.tailDependence(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect()(0)
    assert(r.getAs[Long]("n_upper") == 2L
      && r.getAs[Double]("lambda_u") == 2.0, s"got $r")
  }

  test("tailDependence is partitioning-invariant") {
    import spark.implicits._
    val rows = (1 to 300).map(i =>
      ("g", (i.toLong * 37) % 1009, (i.toLong * 61) % 997))
    val a = Metrics.tailDependence(rows.toDF("g", "x", "y").repartition(1),
      "g", "x", "y").collect()(0)
    val b = Metrics.tailDependence(rows.toDF("g", "x", "y").repartition(32),
      "g", "x", "y").collect()(0)
    assert(a.getAs[Double]("lambda_u") == b.getAs[Double]("lambda_u"))
    assert(a.getAs[Double]("lambda_l") == b.getAs[Double]("lambda_l"))
  }

  // ---- pettitt ---------------------------------------------------------

  test("pettitt matches the hand-computed break") {
    import spark.implicits._
    // series 1,2,10,11: U₁=−3, U₂=−4, U₃=−3 (sgn-form verified) → K=4
    // at t=2, p = 2·exp(−6·16/(64+16)) = 2·exp(−1.2)
    val df = Seq(("g", 1, 1L), ("g", 2, 2L), ("g", 3, 10L), ("g", 4, 11L))
      .toDF("k", "i", "v")
    val r = Hypothesis.pettitt(df, "k", "i", "v").collect()(0)
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("k_stat") == 4L)
    assert(r.getAs[Int]("changepoint") == 2)
    assert(math.abs(r.getAs[Double]("p_approx")
      - 2.0 * math.exp(-1.2)) < 1e-6, s"got $r")
  }

  test("pettitt handles ties via midranks (sgn-form verified)") {
    import spark.implicits._
    // series 5,5,1: U₁ = sgn(0)+sgn(4) = 1, U₂ = sgn(4)+sgn(4) = 2 → K=2
    val df = Seq(("g", 1, 5L), ("g", 2, 5L), ("g", 3, 1L))
      .toDF("k", "i", "v")
    val r = Hypothesis.pettitt(df, "k", "i", "v").collect()(0)
    assert(r.getAs[Long]("k_stat") == 2L
      && r.getAs[Int]("changepoint") == 2, s"got $r")
  }

  test("pettitt ties on |U| break by earliest index") {
    import spark.implicits._
    // symmetric series: |U| peaks equally at both ends → earliest wins
    val vs = Seq(10L, 1L, 1L, 10L)
    val df = vs.indices.map(t => ("g", t + 1, vs(t))).toDF("k", "i", "v")
    val r = Hypothesis.pettitt(df, "k", "i", "v").collect()(0)
    // brute-force sgn form U_t = Σ_{i≤t} Σ_{j>t} sgn(x_i − x_j)
    val all = (1 to 3).map { t =>
      (0 until t).map(i => (t until 4).map(j =>
        math.signum(vs(i) - vs(j))).sum).sum
    }
    val k = all.map(math.abs).max
    assert(r.getAs[Long]("k_stat") == k)
    assert(r.getAs[Int]("changepoint") ==
      all.indexWhere(u => math.abs(u) == k) + 1, s"got $r")
  }

  test("pettitt is partitioning-invariant") {
    import spark.implicits._
    val rows = (1 to 200).map(i =>
      ("g", i, ((i * 13) % 37 + (if (i > 120) 50 else 0)).toLong))
    val a = Hypothesis.pettitt(rows.toDF("k", "i", "v").repartition(1),
      "k", "i", "v").collect()(0)
    val b = Hypothesis.pettitt(rows.toDF("k", "i", "v").repartition(32),
      "k", "i", "v").collect()(0)
    assert(a.getAs[Long]("k_stat") == b.getAs[Long]("k_stat"))
    assert(a.getAs[Int]("changepoint") == b.getAs[Int]("changepoint"))
    // the injected level shift at i=120 should be found
    assert(math.abs(a.getAs[Int]("changepoint") - 120) <= 2, s"got $a")
  }

  // ---- grangerLag1 -----------------------------------------------------

  /** Independent check: solve the 3×3 normal equations by Gaussian
    * elimination (not Cramer) and compute RSS by direct residual
    * summation — a different numeric path than the operator's. */
  private def referenceGranger(y: Seq[Long], x: Seq[Long])
      : (Double, Double, Double) = {
    val rows = (1 until y.length).map(t =>
      (y(t).toDouble, y(t - 1).toDouble, x(t - 1).toDouble))
    def solve(cols: Seq[(Double, Double, Double) => Double])
        : Seq[Double] = {
      val k = cols.length
      val a = Array.ofDim[Double](k, k + 1)
      for (i <- 0 until k; j <- 0 until k)
        a(i)(j) = rows.map { case (yy, aa, bb) =>
          cols(i)(yy, aa, bb) * cols(j)(yy, aa, bb) }.sum
      for (i <- 0 until k)
        a(i)(k) = rows.map { case (yy, aa, bb) =>
          cols(i)(yy, aa, bb) * yy }.sum
      for (p <- 0 until k) {
        val piv = (p until k).maxBy(r => math.abs(a(r)(p)))
        val tmp = a(p); a(p) = a(piv); a(piv) = tmp
        for (r <- p + 1 until k) {
          val f = a(r)(p) / a(p)(p)
          for (c <- p to k) a(r)(c) -= f * a(p)(c)
        }
      }
      val beta = Array.ofDim[Double](k)
      for (p <- (k - 1) to 0 by -1) {
        beta(p) = (a(p)(k) - (p + 1 until k)
          .map(c => a(p)(c) * beta(c)).sum) / a(p)(p)
      }
      beta.toSeq
    }
    def rss(beta: Seq[Double],
        cols: Seq[(Double, Double, Double) => Double]): Double =
      rows.map { case (yy, aa, bb) =>
        val e = yy - beta.zip(cols).map { case (bc, f) =>
          bc * f(yy, aa, bb) }.sum
        e * e
      }.sum
    val one = (_: Double, _: Double, _: Double) => 1.0
    val fa = (_: Double, aa: Double, _: Double) => aa
    val fb = (_: Double, _: Double, bb: Double) => bb
    val bu = solve(Seq(one, fa, fb)); val ru = rss(bu, Seq(one, fa, fb))
    val br = solve(Seq(one, fa)); val rr = rss(br, Seq(one, fa))
    val n = rows.length.toDouble
    (rr, ru, (rr - ru) * (n - 3.0) / ru)
  }

  test("grangerLag1 matches an independent Gaussian-elimination solve") {
    import spark.implicits._
    val y = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L, 5L, 8L)
    val x = Seq(2L, 7L, 1L, 8L, 2L, 8L, 1L, 8L, 2L, 8L, 4L, 5L)
    val df = y.indices.map(i => ("g", i, y(i), x(i))).toDF("k","i","y","x")
    val r = Hypothesis.grangerLag1(df, "k", "i", "y", "x").collect()(0)
    val (rr, ru, f) = referenceGranger(y, x)
    assert(r.getAs[Long]("n") == (y.length - 1).toLong)
    assert(math.abs(r.getAs[Double]("rss_r") - rr) < 1e-6 * rr, s"got $r")
    assert(math.abs(r.getAs[Double]("rss_u") - ru) < 1e-6 * ru, s"got $r")
    assert(math.abs(r.getAs[Double]("f_stat") - f) < 1e-4, s"got $r")
    assert(r.getAs[Long]("df2") == (y.length - 4).toLong)
  }

  test("grangerLag1 drops singular groups (constant x-lag)") {
    import spark.implicits._
    val df = (0 to 9).map(i => ("g", i, (i * i % 7).toLong, 5L))
      .toDF("k", "i", "y", "x")
    assert(Hypothesis.grangerLag1(df, "k", "i", "y", "x").count() == 0L)
  }

  test("grangerLag1 is partitioning-invariant") {
    import spark.implicits._
    val rows = (0 until 300).map(i =>
      ("g", i, ((i * 17) % 101 + (i * 3) % 11).toLong, ((i * 7) % 53).toLong))
    val a = Hypothesis.grangerLag1(rows.toDF("k","i","y","x")
      .repartition(1), "k", "i", "y", "x").collect()(0)
    val b = Hypothesis.grangerLag1(rows.toDF("k","i","y","x")
      .repartition(32), "k", "i", "y", "x").collect()(0)
    assert(a.getAs[Double]("f_stat") == b.getAs[Double]("f_stat"))
    assert(a.getAs[Double]("rss_u") == b.getAs[Double]("rss_u"))
  }
}
