package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Hypothesis

/** Round-7 hypothesis-test family: Kruskal–Wallis, log-rank, Cohen's d,
  * McNemar, Mann–Kendall, Page–Hinkley — hand-computed textbook cases plus
  * partitioning-invariance (the determinism contract). */
class HypothesisSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  // ---- kruskalWallis -------------------------------------------------------

  test("kruskalWallis matches the hand-computed tie-free H") {
    import spark.implicits._
    // groups a={1,2}, b={3,4}, c={5,6}: ranks 1..6, Rj = 3, 7, 11
    // H = 12/(6·7)·(9/2 + 49/2 + 121/2) − 3·7 = (2/7)·89.5 − 21 ≈ 4.571429
    val df = Seq(("g","a",1.0),("g","a",2.0),("g","b",3.0),
      ("g","b",4.0),("g","c",5.0),("g","c",6.0)).toDF("k","t","x")
    val r = Hypothesis.kruskalWallis(df, "k", "t", "x").collect()(0)
    assert(r.getAs[Long]("n") == 6L && r.getAs[Long]("k") == 3L)
    assert(math.abs(r.getAs[Double]("h") - 4.571429) < 1e-6)
    assert(r.getAs[Double]("h_adj") == r.getAs[Double]("h")) // no ties
    assert(r.getAs[Long]("df") == 2L)
  }

  test("kruskalWallis tie correction divides by 1 − Σ(t³−t)/(n³−n)") {
    import spark.implicits._
    // one tied pair among n=4: Σ(t³−t) = 2³−2 = 6, C = 1 − 6/60 = 0.9
    val df = Seq(("g","a",1.0),("g","a",2.0),("g","b",2.0),("g","b",5.0))
      .toDF("k","t","x")
    val r = Hypothesis.kruskalWallis(df, "k", "t", "x").collect()(0)
    assert(math.abs(r.getAs[Double]("h_adj")
      - r.getAs[Double]("h") / 0.9) < 1e-6)
  }

  test("kruskalWallis is invariant under repartitioning") {
    import spark.implicits._
    val df = (1 to 200).map(i =>
      ("g", s"t${i % 4}", (i * 37 % 101).toDouble)).toDF("k","t","x")
    val a = Hypothesis.kruskalWallis(df, "k", "t", "x").collect()(0)
    val b = Hypothesis.kruskalWallis(df.repartition(13), "k", "t", "x")
      .collect()(0)
    assert(a == b)
  }

  // ---- logRank -------------------------------------------------------------

  test("logRank single event time matches the 2×2 hypergeometric form") {
    import spark.implicits._
    // at t=1: groups A and B each 2 at risk; one A event.
    // E_A = 1·2/4 = 0.5; V = 1·(2/4)(1−2/4)(4−1)/(4−1) = 0.25
    // z = (1 − 0.5)/0.5 = 1.0
    val df = Seq((1L, 1L, "A"), (2L, 0L, "A"), (2L, 0L, "B"), (2L, 0L, "B"))
      .toDF("dur", "ev", "side")
    val r = Hypothesis.logRank(df, "dur", "ev", "side", "A").collect()(0)
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("o_a") == 1L)
    assert(math.abs(r.getAs[Double]("e_a") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("v") - 0.25) < 1e-9)
    assert(math.abs(r.getAs[Double]("z") - 1.0) < 1e-9)
  }

  test("logRank symmetric cohorts give z = 0") {
    import spark.implicits._
    val df = (1 to 40).flatMap(i =>
      Seq((i.toLong, 1L, "A"), (i.toLong, 1L, "B"))).toDF("dur","ev","side")
    val r = Hypothesis.logRank(df, "dur", "ev", "side", "A").collect()(0)
    assert(r.getAs[Double]("z") == 0.0)
  }

  test("logRank routed (corpus-sized spine) path matches the window path") {
    import spark.implicits._
    // ~1100 distinct event times with a hazard imbalance between cohorts;
    // maxSpineRows = 1 forces the prefixSums route on the same input
    val df = (1 to 3000).map { i =>
      val side = if (i % 2 == 0) "A" else "B"
      val dur = ((i * 131) % 1103 + 1 + (if (side == "A") i % 7 else 0)).toLong
      (dur, if (i % 5 == 0) 0L else 1L, side)
    }.toDF("dur", "ev", "side")
    val w = Hypothesis.logRank(df, "dur", "ev", "side", "A").collect()(0)
    val r = Hypothesis.logRank(df, "dur", "ev", "side", "A",
      maxSpineRows = 1L).collect()(0)
    assert(r.getAs[Long]("n_a") == w.getAs[Long]("n_a"))
    assert(r.getAs[Long]("n_b") == w.getAs[Long]("n_b"))
    assert(r.getAs[Long]("o_a") == w.getAs[Long]("o_a"))
    // E and V accumulate doubles in different (agg vs sequential) order
    assert(math.abs(r.getAs[Double]("e_a") - w.getAs[Double]("e_a")) < 1e-6)
    assert(math.abs(r.getAs[Double]("v") - w.getAs[Double]("v")) < 1e-6)
    assert(math.abs(r.getAs[Double]("z") - w.getAs[Double]("z")) < 1e-6)
  }

  // ---- cohensD -------------------------------------------------------------

  test("cohensD matches the hand-computed pooled-variance case") {
    import spark.implicits._
    // A={2,4}, B={1,3}: d = 1/√2 ≈ 0.707107; g = d·(1 − 3/7) ≈ 0.404061
    val df = Seq(("g","A",2.0),("g","A",4.0),("g","B",1.0),("g","B",3.0))
      .toDF("k","side","x")
    val r = Hypothesis.cohensD(df, "k", "side", "A", "B", "x").collect()(0)
    assert(math.abs(r.getAs[Double]("cohens_d") - 0.707107) < 1e-6)
    assert(math.abs(r.getAs[Double]("hedges_g") - 0.404061) < 1e-6)
  }

  // ---- mcnemar -------------------------------------------------------------

  test("mcnemar counts discordant pairs and applies continuity correction") {
    import spark.implicits._
    val df = (Seq.fill(5)((true, false)) ++ Seq.fill(1)((false, true))
      ++ Seq.fill(3)((true, true)) ++ Seq.fill(2)((false, false)))
      .map { case (a, b) => ("g", a, b) }.toDF("k", "a", "b")
    val r = Hypothesis.mcnemar(df, "k", "a", "b").collect()(0)
    assert(r.getAs[Long]("n_pairs") == 11L)
    assert(r.getAs[Long]("b") == 5L && r.getAs[Long]("c") == 1L)
    assert(math.abs(r.getAs[Double]("chi2") - 16.0 / 6.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("chi2_cc") - 9.0 / 6.0) < 1e-6)
  }

  // ---- mannKendall ---------------------------------------------------------

  test("mannKendall strictly increasing series has tau_b = 1") {
    import spark.implicits._
    val df = (1 to 10).map(i => ("g", i.toLong, i * 10.0)).toDF("k","i","x")
    val r = Hypothesis.mannKendall(df, "k", "i", "x").collect()(0)
    assert(r.getAs[Long]("s") == 45L) // n(n−1)/2
    assert(r.getAs[Double]("tau_b") == 1.0)
    assert(r.getAs[Double]("z") > 3.0)
  }

  test("mannKendall alternating series has |tau_b| near 0") {
    import spark.implicits._
    val df = (1 to 20).map(i =>
      ("g", i.toLong, if (i % 2 == 0) 10.0 else 9.0 + i * 0.001))
      .toDF("k","i","x")
    val r = Hypothesis.mannKendall(df, "k", "i", "x").collect()(0)
    assert(math.abs(r.getAs[Double]("tau_b")) < 0.4)
  }

  // ---- pageHinkley ---------------------------------------------------------

  test("pageHinkley stays silent on a constant series, fires on a shift") {
    import spark.implicits._
    val flat = (1 to 30).map(i => ("f", i, 100.0)).toDF("k","i","x")
    val rf = Hypothesis.pageHinkley(flat, "k", "i", "x", 0.0, 5.0)
      .collect()(0)
    assert(rf.getAs[Double]("ph_max") == 0.0)
    assert(rf.isNullAt(rf.fieldIndex("first_alarm")))

    val shift = ((1 to 20).map(i => ("s", i, 100.0))
      ++ (21 to 40).map(i => ("s", i, 200.0))).toDF("k","i","x")
    val rs = Hypothesis.pageHinkley(shift, "k", "i", "x", 0.0, 5.0)
      .collect()(0)
    assert(rs.getAs[Double]("ph_max") > 5.0)
    assert(rs.getAs[Int]("first_alarm") > 20)
  }

  test("pageHinkley is invariant under repartitioning") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("g", i, (i * 17 % 23) * 1.5))
      .toDF("k","i","x")
    val a = Hypothesis.pageHinkley(df, "k", "i", "x", 0.5, 10.0).collect()(0)
    val b = Hypothesis.pageHinkley(df.repartition(11), "k", "i", "x",
      0.5, 10.0).collect()(0)
    assert(a == b)
  }
}
