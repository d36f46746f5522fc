package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Hypothesis, Metrics}

/** Round-9 wave #7: rank-biased overlap and Dunn's post-hoc test —
  * hand-computed cases, truncation/tie laws, partitioning invariance. */
class Round83OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private def lists(rows: Seq[(String, Int, Long)]) = {
    import spark.implicits._
    rows.toDF("g", "pos", "id")
  }

  // ---- rbo -----------------------------------------------------------------

  test("rbo matches the hand-computed prefix overlaps") {
    // a=[1,2,3], b=[2,1,4], p=.5: ov=(0,2,2) →
    // RBO = .5·(0/1 + .5·2/2 + .25·2/3) = 1/3
    val a = lists(Seq(("g",1,1L),("g",2,2L),("g",3,3L)))
    val b = lists(Seq(("g",1,2L),("g",2,1L),("g",3,4L)))
    val r = Metrics.rbo(a, b, "g", "pos", "id", p = 0.5).collect()(0)
    assert(r.getAs[Long]("d") == 3L)
    assert(math.abs(r.getAs[Double]("rbo") - 1.0 / 3.0) < 1e-6, s"got $r")
  }

  test("rbo is 1−p^d on identical lists and 0 on disjoint lists") {
    val idRows = (1 to 10).map(i => ("same", i, i.toLong))
    val a = lists(idRows ++ (1 to 10).map(i => ("disj", i, i.toLong)))
    val b = lists(idRows ++ (1 to 10).map(i => ("disj", i, i + 100L)))
    val out = Metrics.rbo(a, b, "g", "pos", "id", p = 0.9).collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Double]("rbo")).toMap
    assert(math.abs(out("same") - (1.0 - math.pow(0.9, 10))) < 1e-6,
      s"got $out")
    assert(out("disj") == 0.0, s"got $out")
  }

  test("rbo truncates unequal depths to the common prefix and is partitioning-invariant") {
    import spark.implicits._
    val a = lists((1 to 5).map(i => ("g", i, i.toLong)) ++
      (1 to 3).map(i => ("short", i, i.toLong)))
    val b = lists((1 to 5).map(i => ("g", i, (i * 2).toLong)) ++
      (1 to 2).map(i => ("short", i, i.toLong)))
    val out = Metrics.rbo(a, b, "g", "pos", "id", p = 0.8).collect()
      .map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("d"), r.getAs[Double]("rbo"))).toMap
    // "short": identical prefixes compared at d = 2 → 1 − p² = 0.36
    assert(out("short")._1 == 2L
      && math.abs(out("short")._2 - 0.36) < 1e-6, s"got $out")
    val r1 = Metrics.rbo(a.repartition(1), b.repartition(1),
      "g", "pos", "id", 0.8).collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Double]("rbo")).toMap
    val r32 = Metrics.rbo(a.repartition(32), b.repartition(32),
      "g", "pos", "id", 0.8).collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Double]("rbo")).toMap
    assert(r1 == r32)
  }

  // ---- dunnPostHoc -----------------------------------------------------------

  test("dunnPostHoc matches the hand-computed tie-free pair") {
    import spark.implicits._
    // A={1,2}, B={3,4}: R̄A=1.5, R̄B=3.5, σ² = 4·5/12 = 5/3
    // z = −2/√(5/3·1) = −1.549193
    val df = Seq(("g","A",1L),("g","A",2L),("g","B",3L),("g","B",4L))
      .toDF("g","t","x")
    val r = Hypothesis.dunnPostHoc(df, "g", "t", "x").collect()(0)
    assert(r.getAs[String]("treat_a") == "A"
      && r.getAs[String]("treat_b") == "B")
    assert(math.abs(r.getAs[Double]("z")
      - (-2.0 / math.sqrt(5.0 / 3.0))) < 1e-6, s"got $r")
  }

  test("dunnPostHoc applies the tie correction") {
    import spark.implicits._
    // A={1,1}, B={1,2}: midranks 2,2,2,4 → means 2,3 (doubled 4,6)
    // tsum = t³−t = 24 → σ² = 20/12 − 24/36 = 1 → z = −1
    val df = Seq(("g","A",1L),("g","A",1L),("g","B",1L),("g","B",2L))
      .toDF("g","t","x")
    val r = Hypothesis.dunnPostHoc(df, "g", "t", "x").collect()(0)
    assert(r.getAs[Double]("z") == -1.0, s"got $r")
  }

  test("dunnPostHoc emits k(k−1)/2 pairs and is partitioning-invariant") {
    import spark.implicits._
    val rows = (1 to 300).map(i =>
      ("g", Seq("A","B","C","D")(i % 4), ((i * 13) % 97).toLong))
    val a = Hypothesis.dunnPostHoc(rows.toDF("g","t","x")
      .repartition(1), "g", "t", "x").collect()
    val b = Hypothesis.dunnPostHoc(rows.toDF("g","t","x")
      .repartition(32), "g", "t", "x").collect()
    assert(a.length == 6 && b.length == 6)
    val am = a.map(r => (r.getAs[String]("treat_a"),
      r.getAs[String]("treat_b")) -> r.getAs[Double]("z")).toMap
    val bm = b.map(r => (r.getAs[String]("treat_a"),
      r.getAs[String]("treat_b")) -> r.getAs[Double]("z")).toMap
    assert(am == bm)
  }
}
