package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Profile

/** Round-6 sixth-wave operators: correlation matrix. */
class Round14OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  test("corrMatrix recovers exact +/-1 and 0 correlations") {
    import spark.implicits._
    // b = 2a (corr 1), c = -a (corr -1), d alternates independently of
    // the a-ramp's mean structure
    val df = (1 to 40).map(i => (i.toDouble, 2.0 * i, -i.toDouble,
      if (i % 2 == 0) 1.0 else -1.0)).toDF("a", "b", "c", "d")
    val m = Profile.corrMatrix(df, Seq("a", "b", "c", "d"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    assert(m(("a", "b")) == 1.0)
    assert(m(("a", "c")) == -1.0)
    assert(m(("b", "c")) == -1.0)
    assert(math.abs(m(("a", "d"))) < 0.05) // alternating vs ramp ~ 0
  }

  test("corrMatrix survives large-mean low-variance columns") {
    import spark.implicits._
    // offset by 1e9: the one-pass closed form would cancel; the
    // centered pass must still read corr = 1 exactly
    val df = (1 to 30).map(i => (1e9 + i, 2e9 + 2 * i)).toDF("x", "y")
    val r = Profile.corrMatrix(df, Seq("x", "y")).collect()(0)
    assert(r.getDouble(3) == 1.0)
    assert(r.getLong(2) == 30L)
  }

  test("corrMatrix drops rows with any null so every pair shares one n") {
    import spark.implicits._
    val df = Seq((Some(1.0), Some(2.0), Some(3.0)),
      (Some(2.0), None, Some(5.0)),
      (Some(3.0), Some(6.0), Some(7.0))).toDF("a", "b", "c")
    val out = Profile.corrMatrix(df, Seq("a", "b", "c")).collect()
    assert(out.forall(_.getLong(2) == 2L))
  }
}
