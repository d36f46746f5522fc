package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Hypothesis

/** Round-9 wave #6: Page's trend test and Mood's median test —
  * hand-computed cases, drop semantics, partitioning invariance. */
class Round82OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  // ---- pageTrend -----------------------------------------------------------

  test("pageTrend matches the hand-computed perfect trend") {
    import spark.implicits._
    // 2 complete blocks, values strictly increasing A<B<C:
    // per block L = 1·1 + 2·2 + 3·3 = 14 → L2 = 56
    // μ2 = 2·3·16/2 = 48, σ2² = 2·9·4·8/36 = 16 → z = (56−48)/4 = 2
    val df = Seq(
      ("g","b1","A",1.0),("g","b1","B",2.0),("g","b1","C",3.0),
      ("g","b2","A",4.0),("g","b2","B",5.0),("g","b2","C",6.0))
      .toDF("k","blk","t","x")
    val r = Hypothesis.pageTrend(df, "k", "blk", "t", "x").collect()(0)
    assert(r.getAs[Long]("n") == 2L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("l2") == 56L, s"got $r")
    assert(r.getAs[Double]("z") == 2.0, s"got $r")
  }

  test("pageTrend drops incomplete blocks and handles ties via midranks") {
    import spark.implicits._
    // b2 lacks C → dropped; b1 has a tie A=B: midranks 1.5,1.5,3
    // → d = 3,3,6; L2 = 1·3 + 2·3 + 3·6 = 27
    val df = Seq(
      ("g","b1","A",1.0),("g","b1","B",1.0),("g","b1","C",3.0),
      ("g","b2","A",5.0),("g","b2","B",6.0))
      .toDF("k","blk","t","x")
    val r = Hypothesis.pageTrend(df, "k", "blk", "t", "x").collect()(0)
    assert(r.getAs[Long]("n") == 1L && r.getAs[Long]("l2") == 27L,
      s"got $r")
  }

  test("pageTrend is partitioning-invariant") {
    import spark.implicits._
    val rows = (1 to 60).flatMap { b =>
      Seq("A","B","C","D").zipWithIndex.map { case (t, j) =>
        ("g", s"b$b", t, ((b * 7 + j * b) % 19).toDouble) }
    }
    val a = Hypothesis.pageTrend(rows.toDF("k","blk","t","x")
      .repartition(1), "k", "blk", "t", "x").collect()(0)
    val c = Hypothesis.pageTrend(rows.toDF("k","blk","t","x")
      .repartition(32), "k", "blk", "t", "x").collect()(0)
    assert(a.getAs[Long]("l2") == c.getAs[Long]("l2"))
    assert(a.getAs[Double]("z") == c.getAs[Double]("z"))
  }

  // ---- moodMedianTest --------------------------------------------------------

  test("moodMedianTest matches the hand-computed 2x2 table") {
    import spark.implicits._
    // A: 1,2,3  B: 4,5,6 → pooled lower median 3 (cum ≥ 3), a_A=0, a_B=3
    // E = 1.5 each cell → χ² = 4·(1.5²/1.5) = 6
    val df = Seq(("g","A",1L),("g","A",2L),("g","A",3L),
      ("g","B",4L),("g","B",5L),("g","B",6L)).toDF("g","t","x")
    val r = Hypothesis.moodMedianTest(df, "g", "t", "x").collect()(0)
    assert(r.getAs[Long]("n") == 6L && r.getAs[Long]("k") == 2L)
    assert(r.getAs[Long]("median") == 3L, s"got $r")
    assert(r.getAs[Double]("chi2") == 6.0, s"got $r")
    assert(r.getAs[Long]("df") == 1L)
  }

  test("moodMedianTest drops one-sided groups") {
    import spark.implicits._
    // all values equal → nothing above the median → dropped
    val df = (1 to 12).map(i => ("g", if (i % 2 == 0) "A" else "B", 7L))
      .toDF("g","t","x")
    assert(Hypothesis.moodMedianTest(df, "g", "t", "x").count() == 0L)
  }

  test("moodMedianTest is partitioning-invariant") {
    import spark.implicits._
    val rows = (1 to 400).map(i =>
      ("g", Seq("A","B","C")(i % 3), ((i * 13) % 97).toLong))
    val a = Hypothesis.moodMedianTest(rows.toDF("g","t","x")
      .repartition(1), "g", "t", "x").collect()(0)
    val c = Hypothesis.moodMedianTest(rows.toDF("g","t","x")
      .repartition(32), "g", "t", "x").collect()(0)
    assert(a.getAs[Double]("chi2") == c.getAs[Double]("chi2"))
    assert(a.getAs[Long]("median") == c.getAs[Long]("median"))
  }
}
