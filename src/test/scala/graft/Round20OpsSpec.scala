package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Profile

/** Round-6 twelfth-wave operators: segment overlap, Cramér's V, PSI. */
class Round20OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  test("segmentOverlap computes exact intersections and Jaccard") {
    import spark.implicits._
    // A = {1,2,3}, B = {2,3,4}, C = {9}; duplicates must not double-count
    val df = Seq(("A", 1), ("A", 2), ("A", 3), ("A", 2),
      ("B", 2), ("B", 3), ("B", 4), ("C", 9)).toDF("seg", "id")
    val r = Profile.segmentOverlap(df, "seg", "id").collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5)))).toMap
    assert(r.size == 1) // disjoint pairs absent
    assert(r(("A", "B")) == ((3L, 3L, 2L, 0.5))) // 2 / (3+3-2)
  }

  test("cramersV: perfectly dependent columns score 1, independent ~0") {
    import spark.implicits._
    // b = f(a): V = 1
    val dep = Seq.tabulate(60)(i => (s"a${i % 3}", s"b${i % 3}"))
      .toDF("x", "y")
    val rd = Profile.cramersV(dep, "x", "y").collect()(0)
    assert(rd.getLong(0) == 60 && rd.getLong(1) == 3 && rd.getLong(2) == 3)
    assert(rd.getDouble(4) == 1.0)
    // balanced independent grid: chi2 = 0
    val ind = (for (a <- 0 to 2; b <- 0 to 3) yield (s"a$a", s"b$b"))
      .toDF("x", "y")
    val ri = Profile.cramersV(ind, "x", "y").collect()(0)
    assert(ri.getDouble(3) == 0.0 && ri.getDouble(4) == 0.0)
  }

  test("cramersV includes empty grid cells (their full expectation)") {
    import spark.implicits._
    // 2x2 with one empty cell: chi2 by hand
    // cells: (a1,b1)=4, (a1,b2)=0, (a2,b1)=0... build: a1b1 x4, a2b2 x4
    val df = (Seq.fill(4)(("a1", "b1")) ++ Seq.fill(4)(("a2", "b2")))
      .toDF("x", "y")
    val r = Profile.cramersV(df, "x", "y").collect()(0)
    // perfect association on a 2x2 -> chi2 = n = 8, V = 1
    assert(r.getDouble(3) == 8.0 && r.getDouble(4) == 1.0)
  }

  test("psi: identical distributions score 0, a shift scores > 0") {
    import spark.implicits._
    val base = (1 to 1000).map(i => i.toDouble).toDF("v")
    val same = Profile.psi(base, base, "v", 10).collect()
    assert(same.length == 10)
    assert(same.forall(_.getDouble(6) == 0.0)) // psi column
    assert(same.forall(r => r.getLong(1) == 100 && r.getLong(2) == 100))
    val shifted = (1 to 1000).map(i => i.toDouble + 400).toDF("v")
    val drift = Profile.psi(base, shifted, "v", 10).collect()
    assert(drift.forall(r => r.isNullAt(6) || r.getDouble(6) > 0.2))
  }

  test("psi: a bucket empty on one side nulls the total, keeps the rows") {
    import spark.implicits._
    val base = (1 to 100).map(_.toDouble).toDF("v")
    val gap = (51 to 150).map(_.toDouble).toDF("v") // buckets 1-5 empty in B
    val r = Profile.psi(base, gap, "v", 10).collect()
    assert(r.length == 10)
    assert(r.forall(_.isNullAt(6)))
    assert(r.count(_.isNullAt(5)) >= 1) // null contribs visible
  }

  test("psi is partitioning-invariant") {
    import spark.implicits._
    val a = (1 to 500).map(i => (i * 37 % 1009).toDouble).toDF("v")
    val b = (1 to 400).map(i => (i * 53 % 997).toDouble).toDF("v")
    val r1 = Profile.psi(a, b, "v", 10).collect()(0).getDouble(6)
    val r2 = Profile.psi(a.repartition(13), b.repartition(7), "v", 10)
      .collect()(0).getDouble(6)
    assert(r1 == r2)
  }
}
