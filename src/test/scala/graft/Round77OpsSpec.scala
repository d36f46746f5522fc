package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Hypothesis, TimeSeries}

/** Round-9 wave: Friedman blocked rank ANOVA, Wilcoxon signed-rank,
  * Kendall τ-b over the contingency table, additive Holt–Winters —
  * hand-computed textbook cases plus the partitioning-invariance
  * contract. */
class Round77OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  // ---- friedman ------------------------------------------------------------

  test("friedman matches the hand-computed tie-free T1") {
    import spark.implicits._
    // blocks b1..b3 over treatments A,B,C:
    //   b1: 1,2,3  b2: 1,3,2  b3: 2,1,3 → in-block ranks as written
    // R_A=4, R_B=6, R_C=8; n=3, k=3; A2 = 3·14 = 42, C2 = 3·3·16/4 = 36
    // S = 4+0+4 = 8 → T1 = (k−1)·S/(A2−C2) = 2·8/6 = 2.666667
    val df = Seq(
      ("g","b1","A",1.0),("g","b1","B",2.0),("g","b1","C",3.0),
      ("g","b2","A",1.0),("g","b2","B",3.0),("g","b2","C",2.0),
      ("g","b3","A",2.0),("g","b3","B",1.0),("g","b3","C",3.0))
      .toDF("k","blk","t","x")
    val r = Hypothesis.friedman(df, "k", "blk", "t", "x").collect()(0)
    assert(r.getAs[Long]("n") == 3L && r.getAs[Long]("k") == 3L)
    assert(math.abs(r.getAs[Double]("t1") - 2.666667) < 1e-6, s"got $r")
    assert(r.getAs[Long]("df1") == 2L && r.getAs[Long]("df2") == 4L)
  }

  test("friedman drops incomplete blocks and handles in-block ties") {
    import spark.implicits._
    // b3 lacks treatment C → excluded; b2 has a tie (A=B=1):
    //   b1 ranks: A=1, B=2, C=3;  b2 midranks: A=1.5, B=1.5, C=3
    // n=2, k=3; R_A=2.5, R_B=3.5, R_C=6; mean rank sum = n(k+1)/2 = 4
    // S = 2.25 + 0.25 + 4 = 6.5; A2 = 1+4+9+2.25+2.25+9 = 27.5
    // C2 = 2·3·16/4 = 24 → T1 = 2·6.5/3.5 = 3.714286
    val df = Seq(
      ("g","b1","A",1.0),("g","b1","B",2.0),("g","b1","C",3.0),
      ("g","b2","A",1.0),("g","b2","B",1.0),("g","b2","C",3.0),
      ("g","b3","A",5.0),("g","b3","B",6.0))
      .toDF("k","blk","t","x")
    val r = Hypothesis.friedman(df, "k", "blk", "t", "x").collect()(0)
    assert(r.getAs[Long]("n") == 2L && r.getAs[Long]("k") == 3L)
    assert(math.abs(r.getAs[Double]("t1") - 3.714286) < 1e-6, s"got $r")
  }

  test("friedman is partitioning-invariant") {
    import spark.implicits._
    val rows = (1 to 40).flatMap { b =>
      Seq(("g", s"b$b", "A", (b * 7 % 13).toDouble),
        ("g", s"b$b", "B", (b * 11 % 17).toDouble),
        ("g", s"b$b", "C", (b * 3 % 7).toDouble))
    }
    val r1 = Hypothesis.friedman(rows.toDF("k","blk","t","x")
      .repartition(1), "k", "blk", "t", "x").collect()(0)
    val r32 = Hypothesis.friedman(rows.toDF("k","blk","t","x")
      .repartition(32), "k", "blk", "t", "x").collect()(0)
    assert(r1.getAs[Double]("t1") == r32.getAs[Double]("t1"))
  }

  // ---- wilcoxonSignedRank --------------------------------------------------

  test("wilcoxonSignedRank matches the hand-computed W+ and z") {
    import spark.implicits._
    // d = +1, −2, +3, −4, +5, +6: |d| ranks 1..6 (no ties)
    // W+ = 1+3+5+6 = 15; n=6, mu = 6·7/4 = 10.5
    // var = 6·7·13/24 = 22.75 → z = 4.5/√22.75 = 0.943456
    val df = Seq(1L, -2L, 3L, -4L, 5L, 6L).map(("g", _)).toDF("k","d")
    val r = Hypothesis.wilcoxonSignedRank(df, "k", "d").collect()(0)
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Double]("w_plus") == 15.0)
    assert(math.abs(r.getAs[Double]("z") - 0.943456) < 1e-6, s"got $r")
  }

  test("wilcoxonSignedRank drops zeros and tie-corrects") {
    import spark.implicits._
    // d = 0 (dropped), +2, −2, +2, −5: |d|: 2,2,2 midrank 2, 5 rank 4
    // doubled midranks: 2·2 ties t=3; W+ = 2+2 = 4; n=4
    // ties Σ(t³−t) = 24; var = 4·5·9/24 − 24/48 = 7.5 − 0.5 = 7
    // mu = 4·5/4 = 5 → z = −1/√7 = −0.377964
    val df = Seq(0L, 2L, -2L, 2L, -5L).map(("g", _)).toDF("k","d")
    val r = Hypothesis.wilcoxonSignedRank(df, "k", "d").collect()(0)
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("w_plus") == 4.0)
    assert(math.abs(r.getAs[Double]("z") - (-0.377964)) < 1e-6, s"got $r")
  }

  test("wilcoxonSignedRank symmetric differences give z = 0") {
    import spark.implicits._
    val df = Seq(3L, -3L, 7L, -7L, 11L, -11L).map(("g", _)).toDF("k","d")
    val r = Hypothesis.wilcoxonSignedRank(df, "k", "d").collect()(0)
    assert(r.getAs[Double]("z") == 0.0, s"got $r")
  }

  // ---- kendallTauB ---------------------------------------------------------

  test("kendallTauB perfect concordance gives tau = 1, reversal −1") {
    import spark.implicits._
    val up = Seq((1L,1L),(2L,2L),(3L,3L),(4L,4L)).map { case (x,y) => ("g",x,y) }
      .toDF("k","x","y")
    val dn = Seq((1L,4L),(2L,3L),(3L,2L),(4L,1L)).map { case (x,y) => ("g",x,y) }
      .toDF("k","x","y")
    assert(Hypothesis.kendallTauB(up, "k", "x", "y").collect()(0)
      .getAs[Double]("tau_b") == 1.0)
    assert(Hypothesis.kendallTauB(dn, "k", "x", "y").collect()(0)
      .getAs[Double]("tau_b") == -1.0)
  }

  test("kendallTauB matches the hand-computed tied case") {
    import spark.implicits._
    // (x,y): (1,1),(1,2),(2,1),(2,2),(3,3) — cells all count 1
    // C: (1,1)<(2,2),(3,3); (1,2)<(3,3)... enumerate: pairs with x'>x:
    //   (1,1)-(2,2) C, (1,1)-(3,3) C, (1,2)-(2,1)? y'<y → D? wait x'>x
    //   pairs: (1,1)x(2,1): y equal → neither; (1,1)x(2,2): C;
    //   (1,1)x(3,3): C; (1,2)x(2,1): D; (1,2)x(2,2): tie y; (1,2)x(3,3): C;
    //   (2,1)x(3,3): C; (2,2)x(3,3): C → C=6? count: C {11-22,11-33,12-33,
    //   21-33,22-33} = 5, wait (1,1)x(2,2) and (1,1)x(3,3) and (1,2)x(3,3)
    //   and (2,1)x(3,3) and (2,2)x(3,3) = 5; D = {(1,2)x(2,1)} = 1
    // n=5, n(n−1)=20; tx2 = Σtx(tx−1) = 2+2+0 = 4; ty2 = 4
    // tau = (5−1)/sqrt((20−4)(20−4)/4) = 4/8 = 0.5
    val df = Seq((1L,1L),(1L,2L),(2L,1L),(2L,2L),(3L,3L))
      .map { case (x,y) => ("g",x,y) }.toDF("k","x","y")
    val r = Hypothesis.kendallTauB(df, "k", "x", "y").collect()(0)
    assert(r.getAs[Long]("n") == 5L && r.getAs[Long]("n_cells") == 5L)
    assert(r.getAs[Double]("tau_b") == 0.5, s"got $r")
  }

  test("kendallTauB is partitioning-invariant") {
    import spark.implicits._
    val rows = (1 to 500).map(i => ("g", (i * 7 % 23).toLong,
      (i * 13 % 11).toLong))
    val t1 = Hypothesis.kendallTauB(rows.toDF("k","x","y").repartition(1),
      "k", "x", "y").collect()(0).getAs[Double]("tau_b")
    val t32 = Hypothesis.kendallTauB(rows.toDF("k","x","y").repartition(32),
      "k", "x", "y").collect()(0).getAs[Double]("tau_b")
    assert(t1 == t32)
  }

  // ---- holtWinters ---------------------------------------------------------

  test("holtWinters matches a hand-rolled reference fold") {
    import spark.implicits._
    val xs = Vector(10.0, 12.0, 9.0, 14.0, 11.0, 13.0, 10.0, 15.0, 12.0)
    val period = 3
    val (a, b, g) = (0.3, 0.1, 0.2)
    // reference: rotating-queue state [level, trend, s1..s3]
    var st = Vector(xs.head, 0.0) ++ Vector.fill(period)(0.0)
    for (x <- xs.tail) {
      val nl = a * (x - st(2)) + (1.0 - a) * (st(0) + st(1))
      val nt = b * (nl - st(0)) + (1.0 - b) * st(1)
      val ns = g * (x - nl) + (1.0 - g) * st(2)
      st = Vector(nl, nt) ++ st.slice(3, 2 + period) :+ ns
    }
    val df = xs.zipWithIndex.map { case (v, i) => ("k1", i, v) }
      .toDF("k", "o", "v")
    val r = TimeSeries.holtWinters(df, "k", "o", "v", a, b, g, period)
      .collect()(0)
    assert(r.getAs[Int]("n_points") == 9)
    assert(math.abs(r.getAs[Double]("level")
      - math.rint(st(0) * 1e6) / 1e6) < 1e-9, s"got $r expected $st")
    assert(math.abs(r.getAs[Double]("trend")
      - math.rint(st(1) * 1e6) / 1e6) < 1e-9)
    assert(math.abs(r.getAs[Double]("season_next")
      - math.rint(st(2) * 1e6) / 1e6) < 1e-9)
    assert(math.abs(r.getAs[Double]("forecast")
      - math.rint((st(0) + st(1) + st(2)) * 1e6) / 1e6) < 1e-9)
  }

  test("holtWinters drops keys shorter than period + 2") {
    import spark.implicits._
    val df = (0 until 8).map(i => ("short", i, i.toDouble)).toDF("k","o","v")
    assert(TimeSeries.holtWinters(df, "k", "o", "v", 0.3, 0.1, 0.2, 7)
      .count() == 0)
  }

  // ---- randomized brute-force laws -----------------------------------------

  test("kendallTauB matches the O(n²) pair count on random data ×10") {
    import spark.implicits._
    val rng = new scala.util.Random(77)
    for (trial <- 1 to 10) {
      val n = 20 + rng.nextInt(60)
      val rows = Vector.fill(n)((rng.nextInt(6).toLong, rng.nextInt(4).toLong))
      var c = 0L; var dsc = 0L; var tx = 0L; var ty = 0L
      for (i <- rows.indices; j <- (i + 1) until n) {
        val ((x1, y1), (x2, y2)) = (rows(i), rows(j))
        if (x1 != x2 && y1 != y2) {
          if ((x2 - x1) * (y2 - y1) > 0) c += 1 else dsc += 1
        }
        if (x1 == x2) tx += 1
        if (y1 == y2) ty += 1
      }
      val n0 = n.toLong * (n - 1) / 2
      val expected = (c - dsc).toDouble /
        math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
      val df = rows.map { case (x, y) => ("g", x, y) }.toDF("k","x","y")
      val got = Hypothesis.kendallTauB(df, "k", "x", "y")
        .collect()(0).getAs[Double]("tau_b")
      assert(math.abs(got - expected) < 1e-6,
        s"trial $trial: got $got expected $expected (n=$n)")
    }
  }

  test("wilcoxonSignedRank matches a direct midrank computation ×10") {
    import spark.implicits._
    val rng = new scala.util.Random(78)
    for (trial <- 1 to 10) {
      val n = 15 + rng.nextInt(50)
      val ds = Vector.fill(n)((rng.nextInt(21) - 10).toLong).filter(_ != 0L)
      val ads = ds.map(math.abs).sorted
      def midrank(a: Long): Double = {
        val lo = ads.count(_ < a); val t = ads.count(_ == a)
        lo + (t + 1) / 2.0
      }
      val wPlus = ds.filter(_ > 0).map(d => midrank(math.abs(d))).sum
      val m = ds.size
      val ties = ads.distinct.map { a =>
        val t = ads.count(_ == a).toLong; t * t * t - t
      }.sum
      val mu = m.toLong * (m + 1) / 4.0
      val v = m.toLong * (m + 1) * (2L * m + 1) / 24.0 - ties / 48.0
      val df = ds.map(("g", _)).toDF("k","d")
      val r = Hypothesis.wilcoxonSignedRank(df, "k", "d").collect()(0)
      assert(r.getAs[Double]("w_plus") == wPlus,
        s"trial $trial: W+ ${r.getAs[Double]("w_plus")} expected $wPlus")
      if (v > 0)
        assert(math.abs(r.getAs[Double]("z")
          - math.rint((wPlus - mu) / math.sqrt(v) * 1e6) / 1e6) < 1e-9,
          s"trial $trial: z mismatch")
    }
  }

  test("friedman matches a direct in-block midrank computation ×10") {
    import spark.implicits._
    val rng = new scala.util.Random(79)
    for (trial <- 1 to 10) {
      val k = 3 + rng.nextInt(3)
      val nb = 5 + rng.nextInt(10)
      val data = for (b <- 1 to nb; t <- 0 until k)
        yield (s"b$b", s"t$t", rng.nextInt(8).toDouble)
      // direct: midranks within each block
      val byBlock = data.groupBy(_._1)
      var a2 = 0.0
      val rSums = scala.collection.mutable.Map.empty[String, Double]
        .withDefaultValue(0.0)
      for ((_, rows) <- byBlock) {
        val vals = rows.map(_._3).sorted
        for ((_, t, v) <- rows) {
          val lo = vals.count(_ < v); val ties = vals.count(_ == v)
          val r = lo + (ties + 1) / 2.0
          a2 += r * r; rSums(t) += r
        }
      }
      val c2 = nb.toDouble * k * (k + 1) * (k + 1) / 4.0
      val s = (0 until k).map(t =>
        math.pow(rSums(s"t$t") - nb * (k + 1) / 2.0, 2)).sum
      val df = data.map { case (b, t, v) => ("g", b, t, v) }
        .toDF("k","blk","t","x")
      val rows = Hypothesis.friedman(df, "k", "blk", "t", "x").collect()
      if (a2 > c2) {
        val expected = (k - 1) * s / (a2 - c2)
        val got = rows(0).getAs[Double]("t1")
        assert(rows(0).getAs[Long]("n") == nb.toLong)
        assert(math.abs(got - expected) < 1e-5,
          s"trial $trial: got $got expected $expected (n=$nb k=$k)")
      } else assert(rows.isEmpty)
    }
  }

  test("holtWinters on a pure repeating cycle learns near-zero trend") {
    import spark.implicits._
    // strict period-3 cycle: seasonal slots absorb the pattern, trend → ~0
    val xs = (0 until 30).map(i => Seq(10.0, 20.0, 30.0)(i % 3))
    val df = xs.zipWithIndex.map { case (v, i) => ("k", i, v) }
      .toDF("k","o","v")
    val r = TimeSeries.holtWinters(df, "k", "o", "v", 0.3, 0.1, 0.2, 3)
      .collect()(0)
    assert(math.abs(r.getAs[Double]("trend")) < 1.0, s"got $r")
  }
}
