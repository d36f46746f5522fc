package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Metrics, TimeSeries}

/** Round-6 twenty-eighth-wave operators: decision stump, Markov
  * absorption. (q266's streaming-sample proof is covered by the
  * hash-equality of the stream query against the batch oracle.) */
class Round13OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  // ---- decisionStump -------------------------------------------------------

  test("decisionStump finds the perfectly separating threshold") {
    import spark.implicits._
    // labels 1 iff f <= 10: split at 10 is pure (gain = parent gini)
    val df = Seq(("g", 5L, 1L), ("g", 10L, 1L), ("g", 20L, 0L),
      ("g", 30L, 0L)).toDF("g", "f", "y")
    val r = Metrics.decisionStump(df, "g", "f", "y").collect()(0)
    assert(r.getLong(2) == 10L) // threshold
    assert(r.getLong(3) == 2L)  // n_left
    assert(r.getDouble(4) == 0.5) // parent gini 0.5, children pure
  }

  test("decisionStump: uninformative feature has zero best gain") {
    import spark.implicits._
    // every split leaves the same 50/50 label mix on both sides
    val df = Seq(("g", 1L, 1L), ("g", 1L, 0L), ("g", 2L, 1L),
      ("g", 2L, 0L)).toDF("g", "f", "y")
    val r = Metrics.decisionStump(df, "g", "f", "y").collect()(0)
    assert(r.getDouble(4) == 0.0)
  }

  test("decisionStump drops single-valued groups and ties break low") {
    import spark.implicits._
    val df = Seq(("solo", 7L, 1L), ("solo", 7L, 0L),
      // two equally pure splits (1|2 3 and 1 2|3 both separate? no:
      // labels 1,0,0 → split at 1 is pure; split at 2 has gain less)
      ("g", 1L, 1L), ("g", 2L, 0L), ("g", 3L, 0L)).toDF("g", "f", "y")
    val out = Metrics.decisionStump(df, "g", "f", "y").collect()
    assert(out.map(_.getString(0)).toSet == Set("g"))
    assert(out(0).getLong(2) == 1L)
  }

  test("decisionStump is partitioning-invariant") {
    import spark.implicits._
    val rows = (0 until 400).map(i =>
      ("g" + (i % 3), (i % 23).toLong, if ((i * 13) % 7 < 3) 1L else 0L))
    val df = rows.toDF("g", "f", "y")
    val a = Metrics.decisionStump(df.repartition(1), "g", "f", "y")
      .orderBy("g").collect().toSeq
    val b = Metrics.decisionStump(df.repartition(13), "g", "f", "y")
      .orderBy("g").collect().toSeq
    assert(a == b)
  }

  // ---- markovAbsorption ----------------------------------------------------

  test("markovAbsorption matches the hand-computed 2-state chain") {
    import spark.implicits._
    // one user, sequence a a a conv: transitions a→a (2), a→conv (1)
    // T[a,a]=2/3, T[a,conv]=1/3; q1=1/3, q2=1/3+2/3·1/3=5/9,
    // q3=1/3+2/3·5/9=19/27
    val df = Seq((1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "a"),
      (1L, 4L, "conv")).toDF("u", "t", "s")
    val r = TimeSeries.markovAbsorption(df, "u", "t", "t", "s", "conv", 3)
      .collect()(0)
    assert(r.getString(0) == "a" && r.getLong(1) == 3L)
    assert(math.abs(r.getDouble(2) - 19.0 / 27.0) < 1e-6)
  }

  test("markovAbsorption: unreachable state has probability 0") {
    import spark.implicits._
    // b only loops to itself; a converts directly half the time
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "conv"),
      (2L, 1L, "a"), (2L, 2L, "a"), (2L, 3L, "conv"),
      (3L, 1L, "b"), (3L, 2L, "b"), (3L, 3L, "b")).toDF("u", "t", "s")
    val out = TimeSeries.markovAbsorption(df, "u", "t", "t", "s", "conv", 4)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("b") == 0.0)
    assert(out("a") > 0.9) // a almost surely converts within 4 steps
  }

  test("markovAbsorption: more steps never decrease the probability") {
    import spark.implicits._
    val df = Seq((1L, 1L, "x"), (1L, 2L, "y"), (1L, 3L, "x"),
      (1L, 4L, "conv"), (2L, 1L, "y"), (2L, 2L, "x"), (2L, 3L, "y"),
      (2L, 4L, "conv")).toDF("u", "t", "s")
    def p(k: Int) = TimeSeries
      .markovAbsorption(df, "u", "t", "t", "s", "conv", k)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val p1 = p(1); val p3 = p(3)
    assert(p1.keySet == p3.keySet)
    assert(p1.forall { case (s, v) => p3(s) >= v - 1e-12 })
  }
}
