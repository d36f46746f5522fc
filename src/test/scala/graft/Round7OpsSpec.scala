package graft

import java.sql.Date

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Merge, Profile, TimeSeries}

/** Round-5 third-wave operators: SCD2 history build, CUSUM
  * changepoints, lag-feature matrices, Welch t statistics. */
class Round7OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private def d(s: String) = Date.valueOf(s)

  // ---- scd2 ----------------------------------------------------------------

  test("scd2 compresses consecutive runs into validity intervals") {
    import spark.implicits._
    // key 1: A,A,B,A — three runs (the second A run is NEW history,
    // not merged with the first: SCD2 tracks time ranges, not values)
    val feed = Seq(
      (1L, "A", d("2024-01-01"), 1L), (1L, "A", d("2024-01-05"), 2L),
      (1L, "B", d("2024-02-01"), 3L), (1L, "A", d("2024-03-01"), 4L),
      (2L, "X", d("2024-01-02"), 5L)
    ).toDF("k", "status", "ts", "id")
    val out = Merge.scd2(feed, Seq("k"), Seq("status"), "ts", Seq("id"))
      .orderBy($"k", $"valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2),
        Option(r.getDate(3)).map(_.toString).orNull, r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, "A", d("2024-01-01"), "2024-02-01", false),
      (1L, "B", d("2024-02-01"), "2024-03-01", false),
      (1L, "A", d("2024-03-01"), null, true),
      (2L, "X", d("2024-01-02"), null, true)))
  }

  test("scd2 handles NULL attribute values and same-day ties by tieCol") {
    import spark.implicits._
    // NULL runs must compare equal to themselves (null-safe lag) and a
    // same-day status flip resolves by the tie column, not partition order
    val feed = Seq(
      (1L, null.asInstanceOf[String], d("2024-01-01"), 1L),
      (1L, null.asInstanceOf[String], d("2024-01-02"), 2L),
      (1L, "A", d("2024-01-03"), 3L),
      (2L, "P", d("2024-01-01"), 4L), (2L, "Q", d("2024-01-01"), 5L)
    ).toDF("k", "status", "ts", "id")
    val out = Merge.scd2(feed, Seq("k"), Seq("status"), "ts", Seq("id"))
      .orderBy($"k", $"valid_from", $"status")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, null, false), (1L, "A", true),
      (2L, "P", false), (2L, "Q", true)))
  }

  test("scd2 is partitioning-invariant") {
    import spark.implicits._
    val feed = (1L to 400L).map(i =>
      (i % 7, s"s${(i / 3) % 4}", d("2024-01-01"), i)).toDF("k", "v", "ts", "id")
      .withColumn("ts", org.apache.spark.sql.functions.date_add(
        col("ts"), (col("id") % 90).cast("int")))
    val a = Merge.scd2(feed, Seq("k"), Seq("v"), "ts", Seq("id")).collect().toSet
    val b = Merge.scd2(feed.repartition(13), Seq("k"), Seq("v"), "ts", Seq("id"))
      .collect().toSet
    assert(a == b && a.nonEmpty)
  }

  // ---- cusumChangepoint ----------------------------------------------------

  test("cusumChangepoint finds a planted level shift") {
    import spark.implicits._
    // series: 10 points at 0, then 10 points at 10 — |cusum| peaks at
    // the last pre-shift point (t=9): each 0 adds -5, each 10 adds +5
    val pts = ((1 to 10).map(t => ("k", t, 0.0)) ++
      (11 to 20).map(t => ("k", t, 10.0))).toDF("k", "t", "v")
    val r = TimeSeries.cusumChangepoint(pts, "k", "t", "v").collect()(0)
    assert(r.getLong(1) == 20L, s"n_points: $r")
    assert(r.getInt(2) == 10, s"changepoint: $r")
    assert(r.getDouble(3) == -50.0, s"peak: $r")
  }

  test("cusumChangepoint breaks |cusum| ties toward the earliest point") {
    import spark.implicits._
    // symmetric series: cusum hits the same magnitude twice; earliest wins
    val pts = Seq(("k", 1, 0.0), ("k", 2, 2.0), ("k", 3, 4.0), ("k", 4, 2.0))
      .toDF("k", "t", "v")
    // mean=2, cusum = -2, -2, 0, 0 -> |peak|=2 at t=1 and t=2; pick t=1
    val r = TimeSeries.cusumChangepoint(pts, "k", "t", "v").collect()(0)
    assert(r.getInt(2) == 1 && r.getDouble(3) == -2.0, s"got $r")
  }

  // ---- lagFeatures ---------------------------------------------------------

  test("lagFeatures emits exact lags and a current-row-free rolling mean") {
    import spark.implicits._
    val rows = Seq(("k", 1, 10.0), ("k", 2, 20.0), ("k", 3, 30.0),
      ("k", 4, 40.0), ("j", 1, 7.0)).toDF("k", "t", "v")
    val out = TimeSeries.lagFeatures(rows, "k", Seq("t"), "v", 2, 3)
      .orderBy($"k", $"t").collect()
      .map(r => (r.getString(0), r.getInt(1),
        Option(r.get(3)).orNull, Option(r.get(4)).orNull,
        Option(r.get(5)).orNull))
    assert(out.toSeq == Seq(
      ("j", 1, null, null, null),
      ("k", 1, null, null, null),
      ("k", 2, 10.0, null, 10.0),
      ("k", 3, 20.0, 10.0, 15.0),
      ("k", 4, 30.0, 20.0, 20.0)))
  }

  test("lagFeatures serves all features from one WindowExec pass") {
    import spark.implicits._
    val rows = (1 to 100).map(i => (i % 5, i, i * 1.5)).toDF("k", "t", "v")
    val plan = TimeSeries.lagFeatures(rows, "k", Seq("t"), "v", 3, 4)
      .queryExecution.executedPlan.toString
    val windows = "(?m)^[^\\n]*Window ".r.findAllIn(plan).size
    assert(windows == 1, s"expected one WindowExec, plan:\n$plan")
  }

  // ---- welchTTest ----------------------------------------------------------

  test("welchTTest matches the hand-computed statistic") {
    import spark.implicits._
    // arm 0: 1,2,3,4 (n=4, m=2.5, s2=5/3); arm 1: 6,8 (n=2, m=7, s2=2)
    // se = 5/12 + 1 = 17/12; t = -4.5/sqrt(17/12)
    // df = (17/12)^2 / ((5/12)^2/3 + 1^2/1)
    val df0 = Seq(("s", 0, 1.0), ("s", 0, 2.0), ("s", 0, 3.0), ("s", 0, 4.0),
      ("s", 1, 6.0), ("s", 1, 8.0)).toDF("seg", "arm", "v")
    val r = Profile.welchTTest(df0, "seg", "arm", "v").collect()(0)
    val se = 5.0 / 12 + 1.0
    assert((r.getLong(1), r.getLong(2)) == ((4L, 2L)))
    assert(r.getDouble(3) == -4.5)
    assert(math.abs(r.getDouble(4) - BigDecimal(-4.5 / math.sqrt(se))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    val dof = se * se / (math.pow(5.0 / 12, 2) / 3 + 1.0)
    assert(math.abs(r.getDouble(5) - dof) < 1e-5, s"df: $r vs $dof")
  }

  test("welchTTest drops degenerate strata") {
    import spark.implicits._
    // one-armed stratum, an n=1 arm, and a both-variances-zero stratum
    // must all vanish; the healthy stratum survives
    val df0 = Seq(
      ("one_arm", 0, 1.0), ("one_arm", 0, 2.0),
      ("tiny", 0, 1.0), ("tiny", 0, 2.0), ("tiny", 1, 5.0),
      ("flat", 0, 3.0), ("flat", 0, 3.0), ("flat", 1, 3.0), ("flat", 1, 3.0),
      ("ok", 0, 1.0), ("ok", 0, 2.0), ("ok", 1, 4.0), ("ok", 1, 6.0)
    ).toDF("seg", "arm", "v")
    val segs = Profile.welchTTest(df0, "seg", "arm", "v")
      .select("seg").collect().map(_.getString(0)).toSeq
    assert(segs == Seq("ok"), s"got $segs")
  }

  test("welchTTest is partitioning-invariant") {
    import spark.implicits._
    val df0 = (1 to 500).map(i => (s"s${i % 3}", i % 2, i * 0.37))
      .toDF("seg", "arm", "v")
    val a = Profile.welchTTest(df0, "seg", "arm", "v").collect().toSet
    val b = Profile.welchTTest(df0.repartition(11), "seg", "arm", "v")
      .collect().toSet
    assert(a == b && a.size == 3)
  }
}
