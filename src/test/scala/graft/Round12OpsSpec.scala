package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Metrics, TextAnalysis, TimeSeries}

/** Round-6 twenty-seventh-wave operators: KS test, ACF, Zipf fit. */
class Round12OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  // ---- ksTest --------------------------------------------------------------

  test("ksTest: disjoint supports give D = 1") {
    import spark.implicits._
    val df = Seq(("g", "A", 1.0), ("g", "A", 2.0),
      ("g", "B", 10.0), ("g", "B", 11.0)).toDF("g", "s", "x")
    val r = Metrics.ksTest(df, "g", "s", "A", "B", "x").collect()(0)
    assert(r.getLong(1) == 2 && r.getLong(2) == 2)
    assert(r.getDouble(3) == 1.0)
  }

  test("ksTest: identical samples give D = 0") {
    import spark.implicits._
    val df = Seq(("g", "A", 1.0), ("g", "A", 2.0),
      ("g", "B", 1.0), ("g", "B", 2.0)).toDF("g", "s", "x")
    val r = Metrics.ksTest(df, "g", "s", "A", "B", "x").collect()(0)
    assert(r.getDouble(3) == 0.0)
  }

  test("ksTest matches a hand-computed interleaved case") {
    import spark.implicits._
    // A={1,3}, B={2,4}: after v=1 gap=|1*2-0*2|/4=0.5; v=2 0; v=3 0.5;
    // v=4 0 → D = 0.5
    val df = Seq(("g", "A", 1.0), ("g", "A", 3.0),
      ("g", "B", 2.0), ("g", "B", 4.0)).toDF("g", "s", "x")
    val r = Metrics.ksTest(df, "g", "s", "A", "B", "x").collect()(0)
    assert(r.getDouble(3) == 0.5)
  }

  test("ksTest drops groups missing a side; is partitioning-invariant") {
    import spark.implicits._
    val base = (1 to 300).map(i =>
      ("g", if (i % 3 == 0) "A" else "B", (i % 37) * 1.25))
    val df = (base :+ (("solo", "A", 1.0))).toDF("g", "s", "x")
    val a = Metrics.ksTest(df.repartition(1), "g", "s", "A", "B", "x")
      .collect()
    val b = Metrics.ksTest(df.repartition(13), "g", "s", "A", "B", "x")
      .collect()
    assert(a.map(_.getString(0)).toSet == Set("g"))
    assert(a.map(_.getDouble(3)).toSeq == b.map(_.getDouble(3)).toSeq)
  }

  // ---- acf -----------------------------------------------------------------

  test("acf: a strictly linear series has acf 1 at every lag") {
    import spark.implicits._
    val df = (1 to 20).map(i => ("k", i, i * 10L)).toDF("k", "t", "v")
    val out = TimeSeries.acf(df, "k", "t", "v", maxLag = 3)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(out == Map(1 -> 1.0, 2 -> 1.0, 3 -> 1.0))
  }

  test("acf: a period-2 alternating series has acf -1 at lag 1, +1 at lag 2") {
    import spark.implicits._
    val df = (1 to 20).map(i => ("k", i, if (i % 2 == 0) 100L else 0L))
      .toDF("k", "t", "v")
    val out = TimeSeries.acf(df, "k", "t", "v", maxLag = 2)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(out(1) == -1.0 && out(2) == 1.0)
  }

  test("acf counts pairs per lag and drops degenerate lags") {
    import spark.implicits._
    // 5 points → lag 1: 4 pairs, lag 4: 1 pair (dropped, n<2),
    // constant tail variance-0 cases dropped
    val df = Seq(("k", 1, 1L), ("k", 2, 5L), ("k", 3, 2L), ("k", 4, 8L),
      ("k", 5, 3L)).toDF("k", "t", "v")
    val out = TimeSeries.acf(df, "k", "t", "v", maxLag = 4)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(out.get(4).isEmpty)
    assert(out(1) == 4L && out(2) == 3L && out(3) == 2L)
  }

  test("acf is partitioning-invariant (integer moments)") {
    import spark.implicits._
    val df = (0 until 120).map(i => ("k" + (i % 3), i / 3,
      ((i * 31) % 100).toLong)).toDF("k", "t", "v")
    val a = TimeSeries.acf(df.repartition(1), "k", "t", "v", 5)
      .orderBy("k", "lag").collect().toSeq
    val b = TimeSeries.acf(df.repartition(11), "k", "t", "v", 5)
      .orderBy("k", "lag").collect().toSeq
    assert(a == b)
  }

  // ---- zipfFit -------------------------------------------------------------

  test("zipfFit recovers the exponent of an exact power law") {
    import spark.implicits._
    // token w_r repeated floor(1000/r) times → ln(cnt) ≈ ln(1000) − ln r
    val docs = (1 to 50).flatMap(r =>
      Seq.fill(1000 / r)(s"w$r")).mkString(" ")
    val df = Seq(Tuple1(docs)).toDF("text")
    val out = TextAnalysis.zipfFit(df, "text", topN = 50).collect()(0)
    assert(out.getLong(0) == 50)
    // floor() perturbs the tail slightly; slope must sit near −1
    assert(math.abs(out.getDouble(1) - (-1.0)) < 0.01)
    assert(math.abs(out.getDouble(2) - math.log(1000.0)) < 0.05)
  }

  test("zipfFit: a flat (uniform) corpus fits slope 0") {
    import spark.implicits._
    val docs = (1 to 30).flatMap(r => Seq.fill(10)(s"w$r")).mkString(" ")
    val df = Seq(Tuple1(docs)).toDF("text")
    val out = TextAnalysis.zipfFit(df, "text", topN = 30).collect()(0)
    assert(out.getDouble(1) == 0.0)
  }

  test("zipfFit is partitioning-invariant (grid-snapped logs)") {
    import spark.implicits._
    val rows = (1 to 200).map(i => s"tok${i % 60} filler${i % 13} x")
    val df = rows.toDF("text")
    val a = TextAnalysis.zipfFit(df.repartition(1), "text", 40).collect()(0)
    val b = TextAnalysis.zipfFit(df.repartition(17), "text", 40).collect()(0)
    assert(a.getDouble(1) == b.getDouble(1)
      && a.getDouble(2) == b.getDouble(2))
  }
}
