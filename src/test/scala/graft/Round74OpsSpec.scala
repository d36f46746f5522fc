package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Hypothesis, Scale}

/** Round-8 fourth wave: the multi-column grouped prefix scan and the
  * linearized energy distance — brute-force equality, consistency with
  * the single-column machinery, and the determinism contract. */
class Round74OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  test("groupedPrefixSums equals stacked single-column groupedPrefixSum") {
    import spark.implicits._
    val spine = Seq(
      ("g1", 1L, 2L, 10L), ("g1", 3L, 1L, 30L), ("g1", 7L, 4L, 70L),
      ("g2", 2L, 5L, 20L), ("g2", 3L, 2L, 60L))
      .toDF("g", "v", "a", "b")
    val multi = Scale.groupedPrefixSums(spine, Seq("g"), "v",
        Seq("a", "b"), suffix = "_c", inclusive = false)
      .select($"g", $"v", $"a_c", $"b_c")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val singleA = Scale.groupedPrefixSum(spine, Seq("g"), "v", "a", "ac",
        inclusive = false)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("v")) ->
        r.getAs[Long]("ac")).toMap
    val singleB = Scale.groupedPrefixSum(spine, Seq("g"), "v", "b", "bc",
        inclusive = false)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("v")) ->
        r.getAs[Long]("bc")).toMap
    assert(multi.keySet == singleA.keySet)
    multi.foreach { case (k, (ac, bc)) =>
      assert(ac == singleA(k) && bc == singleB(k), s"$k")
    }
    // hand check: g1 exclusive cums of a are 0, 2, 3; of b: 0, 10, 40
    assert(multi(("g1", 7L)) == ((3L, 40L)))
  }

  test("energyDistance equals the in-JVM quadratic brute force") {
    import spark.implicits._
    val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    val ys = Seq(2L, 7L, 1L, 8L, 2L, 8L)
    val df = (xs.map(("g", "a", _)) ++ ys.map(("g", "b", _)))
      .toDF("k", "t", "x")
    def mAbs(u: Seq[Long], v: Seq[Long]): Double =
      u.flatMap(a => v.map(b => math.abs(a - b).toDouble)).sum /
        (u.size.toDouble * v.size)
    val expected = 2.0 * mAbs(xs, ys) - mAbs(xs, xs) - mAbs(ys, ys)
    val r = Hypothesis.energyDistance(df, "k", "t", "x").collect()(0)
    assert(r.getAs[Long]("n1") == xs.size && r.getAs[Long]("n2") == ys.size)
    assert(math.abs(r.getAs[Double]("e_dist") - expected) < 1e-6,
      s"got ${r.getAs[Double]("e_dist")} want $expected")
  }

  test("energyDistance is zero on identical samples and invariant under partitioning") {
    import spark.implicits._
    val xs = Seq(1L, 2L, 2L, 5L, 9L)
    val df = (xs.map(("g", "a", _)) ++ xs.map(("g", "b", _)))
      .toDF("k", "t", "x")
    val r = Hypothesis.energyDistance(df, "k", "t", "x").collect()(0)
    assert(r.getAs[Double]("e_dist") == 0.0)
    val big = (1 to 40).flatMap(i =>
      Seq(("g", "a", (i * 7 % 13).toLong), ("g", "b", (i * 5 % 11).toLong)))
      .toDF("k", "t", "x")
    val e1 = Hypothesis.energyDistance(big.repartition(1), "k", "t", "x")
      .collect()(0).getAs[Double]("e_dist")
    val e7 = Hypothesis.energyDistance(big.repartition(7), "k", "t", "x")
      .collect()(0).getAs[Double]("e_dist")
    assert(e1 == e7)
    assert(e1 > 0.0) // different residue distributions
  }
}
