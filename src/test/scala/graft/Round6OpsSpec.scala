package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Baskets, Graph, Mixing, Profile, Quantiles, Similarity, TimeSeries}

/** Round-5 second-wave operators: triangle stats, basket pair mining,
  * date-bin expansion, z-score outliers, RRF fusion, gap filling. */
class Round6OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  // ---- triangle stats ------------------------------------------------------

  test("triangleStats counts a hand graph exactly") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles) + pendant 5-1 + isolated edge 6-7.
    // nodes=7, edges=8, wedges: deg(1)=4->6, deg(2..4)=3->3 each,
    // deg(5)=deg(6)=deg(7)=1->0 => 6+9=15; triangles=4; gcc=12/15=0.8
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 1L), (6L, 7L)).toDF("src", "dst")
    val r = Graph.triangleStats(edges, "src", "dst").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((7L, 8L, 15L, 4L)), s"got $r")
    assert(r.getDouble(4) == 0.8, s"gcc: $r")
  }

  test("triangleStats canonicalizes direction, duplicates, self-loops") {
    import spark.implicits._
    // the same triangle stated redundantly: both directions, repeats,
    // and a self-loop that must vanish
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (1L, 3L), (2L, 2L)).toDF("a", "b")
    val r = Graph.triangleStats(edges, "a", "b").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 3L, 3L, 1L)), s"got $r")
    assert(r.getDouble(4) == 1.0, s"gcc: $r")
  }

  test("triangleStats is partitioning-invariant") {
    import spark.implicits._
    val edges = (1L to 40L).flatMap(i => (i + 1 to 40L).collect {
      case j if (i + j) % 3 != 0 => (i, j)
    }).toDF("src", "dst")
    val a = Graph.triangleStats(edges, "src", "dst").collect()(0)
    val b = Graph.triangleStats(edges.repartition(13), "src", "dst").collect()(0)
    assert(a == b)
  }

  // ---- basket pairs --------------------------------------------------------

  test("frequentPairs counts distinct-basket support with the A-Priori prune") {
    import spark.implicits._
    // baskets: {a,b,c}, {a,b}, {a,b,b}, {c,d}, {d} — item d has support 2
    // but pair (c,d) only 1; in-basket repeats count once
    val baskets = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"), (3L, "b"), (4L, "c"), (4L, "d"), (5L, "d"))
      .toDF("basket", "item")
    val got = Baskets.frequentPairs(baskets, "basket", "item", 2, 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("a", "b", 3L)), s"got $got")
  }

  test("frequentPairs: the item prune is invisible at minItemSupport <= minPairSupport") {
    import spark.implicits._
    val baskets = (1L to 50L).flatMap(b =>
      Seq((b, b % 5), (b, b % 7), (b, b % 11))).toDF("basket", "item")
    val pruned = Baskets.frequentPairs(baskets, "basket", "item", 3, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val unpruned = Baskets.frequentPairs(baskets, "basket", "item", 1, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pruned == unpruned && pruned.nonEmpty, s"got $pruned vs $unpruned")
    intercept[IllegalArgumentException] {
      Baskets.frequentPairs(baskets, "basket", "item", 4, 3)
    }
  }

  // ---- date-bin expansion --------------------------------------------------

  test("explodeMonthBins emits exactly the overlapped months") {
    import spark.implicits._
    val iv = Seq(
      (1L, Date.valueOf("2024-01-15"), Date.valueOf("2024-01-20")), // 1 month
      (2L, Date.valueOf("2024-01-31"), Date.valueOf("2024-02-01")), // boundary
      (3L, Date.valueOf("2024-11-30"), Date.valueOf("2025-02-01"))  // year wrap
    ).toDF("id", "s", "e")
    val got = TimeSeries.explodeMonthBins(iv, "s", "e")
      .collect().map(r => (r.getLong(0), r.getDate(3).toString)).toSet
    assert(got == Set((1L, "2024-01-01"), (2L, "2024-01-01"),
      (2L, "2024-02-01"), (3L, "2024-11-01"), (3L, "2024-12-01"),
      (3L, "2025-01-01"), (3L, "2025-02-01")), s"got $got")
  }

  // ---- z-score outliers ----------------------------------------------------

  test("zscoreOutliers flags the planted outlier and drops degenerate groups") {
    import spark.implicits._
    // group g: nine 10.0s and one 20.0 -> mean 11, var (81+9)/9 = 10,
    // z(20) = 9/sqrt(10) = 2.846; z(10) = -1/sqrt(10) = -0.316.
    // group h has one row (dropped); group i is constant (z undefined)
    val df = ((1 to 9).map(i => ("g", i.toLong, 10.0)) ++
      Seq(("g", 10L, 20.0), ("h", 11L, 99.0),
        ("i", 12L, 5.0), ("i", 13L, 5.0))).toDF("k", "id", "v")
    val got = Quantiles.zscoreOutliers(df, Seq("k"), "v", 2.0)
      .collect().map(r => (r.getLong(1), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(10L), s"got ${got.toSeq}")
    assert(math.abs(got(0)._2 - 9.0 / math.sqrt(10.0)) < 1e-12)
  }

  test("zscoreOutliers centered variance survives a large offset") {
    import spark.implicits._
    // same spread shifted by 1e9: the one-pass sum-of-squares form loses
    // the variance entirely at this magnitude; centered must not
    val base = 1e9
    val df = ((1 to 9).map(i => ("g", i.toLong, base + 10.0)) :+
      ("g", 10L, base + 20.0)).toDF("k", "id", "v")
    val got = Quantiles.zscoreOutliers(df, Seq("k"), "v", 2.0)
      .collect().map(r => (r.getLong(1), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(10L), s"got ${got.toSeq}")
    assert(math.abs(got(0)._2 - 9.0 / math.sqrt(10.0)) < 1e-6, s"got ${got.toSeq}")
  }

  // ---- RRF fusion ----------------------------------------------------------

  test("rrfFuse sums reciprocal ranks across lists; singletons keep one term") {
    import spark.implicits._
    val l1 = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "r")
    val l2 = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("id", "r")
    val got = Similarity.rrfFuse(Seq(l1, l2), "id", "r", rrfK = 60)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got(10L) == ((1.0 / 61 + 1.0 / 62, 2L)))
    assert(got(20L) == ((1.0 / 62 + 1.0 / 61, 2L)))
    assert(got(30L) == ((1.0 / 63, 1L)))
    assert(got(40L) == ((1.0 / 63, 1L)))
  }

  // ---- gap fill ------------------------------------------------------------

  test("gapFillDaily carries the last per-day winner forward over gaps") {
    import spark.implicits._
    val ev = Seq(
      // day 1: two events — the later ts wins
      (1L, Timestamp.valueOf("2024-01-01 08:00:00"), 100L, 1.0),
      (1L, Timestamp.valueOf("2024-01-01 18:00:00"), 101L, 2.0),
      // day 2 missing; day 3: same ts — higher event_id wins
      (1L, Timestamp.valueOf("2024-01-03 12:00:00"), 102L, 3.0),
      (1L, Timestamp.valueOf("2024-01-03 12:00:00"), 103L, 4.0),
      // second key: single day, no fill rows
      (2L, Timestamp.valueOf("2024-01-05 00:00:00"), 104L, 9.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.gapFillDaily(ev, "user_id", "ts", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2)))
      .toSet
    assert(got == Set(
      (1L, "2024-01-01", 2.0), (1L, "2024-01-02", 2.0),
      (1L, "2024-01-03", 4.0), (2L, "2024-01-05", 9.0)), s"got $got")
  }

  // ---- negative sampling ---------------------------------------------------

  test("negativeSample draws k replayable negatives per anchor, never self") {
    import spark.implicits._
    val ids = (0L until 200L).toDF("id")
    val neg = Mixing.negativeSample(ids, "id", k = 5, salt = 3L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(neg.forall { case (a, _, n) => n != a && n >= 0 && n < 200 })
    // every anchor keeps k draws minus self-collisions (>= k-1 of them)
    val perAnchor = neg.groupBy(_._1).view.mapValues(_.length)
    assert(perAnchor.values.forall(c => c == 5 || c == 4))
    assert(perAnchor.size == 200)
    val again = Mixing.negativeSample(ids.repartition(7), "id", 5, 3L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(neg.toSet == again.toSet, "draws must be partitioning-invariant")
    val salted = Mixing.negativeSample(ids, "id", 5, 4L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(salted.toSet != neg.toSet, "salt must decorrelate draws")
  }

  // ---- profile drift ---------------------------------------------------------

  test("profileDrift reports planted null/distinct/range changes exactly") {
    import spark.implicits._
    val a = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)).toDF("k", "v")
    val b = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 1.0), (2L, 1.0), (3L, 9.0), (4L, null)).toDF("k", "v")
    val r = Profile.profileDrift(a, b, Seq("v")).collect()(0)
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    assert(m("n_rows_a") == 4L && m("n_rows_b") == 4L)
    assert(m("n_nulls_a") == 0L && m("n_nulls_b") == 1L)
    assert(m("n_distinct_a") == 4L && m("n_distinct_b") == 2L)
    assert(m("null_frac_delta") == 0.25)
    assert(m("distinct_ratio") == 0.5)
    // range a = 4-1 = 3; range b = 9-1 = 8 -> +5
    assert(m("range_delta") == 5.0, s"got $m")
  }

  // ---- equi-depth histogram --------------------------------------------------

  test("equiDepthHistogram splits evenly and reports exact boundaries") {
    import spark.implicits._
    // 1..16 into 4 buckets of 4; boundaries q0..q4 = 1, 4.75, 8.5, 12.25, 16
    val df = (1 to 16).map(_.toDouble).toDF("v")
    val got = Quantiles.equiDepthHistogram(df, "v", 4)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.map(_._4).toSeq == Seq(4L, 4L, 4L, 4L), s"got ${got.toSeq}")
    assert(got.map(_._1).toSeq == Seq(1, 2, 3, 4))
    assert(got(0) == ((1, 1.0, 4.75, 4L)), s"got ${got.toSeq}")
    assert(got(3) == ((4, 12.25, 16.0, 4L)), s"got ${got.toSeq}")
  }

  test("equiDepthHistogram: heavy ties collapse boundaries, empty bins absent") {
    import spark.implicits._
    // 12 copies of 5.0 and the values 1,9: quartile boundaries mostly 5
    val df = (Seq.fill(12)(5.0) ++ Seq(1.0, 9.0)).toDF("v")
    val got = Quantiles.equiDepthHistogram(df, "v", 4)
      .collect().map(r => (r.getInt(0), r.getLong(3))).toMap
    assert(got.values.sum == 14L, s"got $got")
    // all mass where the 5s fall; no bucket row for empty spans
    assert(got.keySet.subsetOf(Set(1, 2, 3, 4)) && got.size < 4, s"got $got")
  }

  // ---- Markov transitions ----------------------------------------------------

  test("transitionMatrix counts adjacent pairs per key and row-normalizes") {
    import spark.implicits._
    // user 1: a->b->a->c ; user 2: b->a. Transitions: a->b, b->a, a->c, b->a
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
      (1L, Timestamp.valueOf("2024-01-01 10:01:00"), "b"),
      (1L, Timestamp.valueOf("2024-01-01 10:02:00"), "a"),
      (1L, Timestamp.valueOf("2024-01-01 10:03:00"), "c"),
      (2L, Timestamp.valueOf("2024-01-01 10:00:00"), "b"),
      (2L, Timestamp.valueOf("2024-01-01 10:05:00"), "a")
    ).toDF("user_id", "ts", "event_type")
    val got = TimeSeries.transitionMatrix(ev, "user_id", "ts", "event_type")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      ("a", "b") -> ((1L, 0.5)), ("a", "c") -> ((1L, 0.5)),
      ("b", "a") -> ((2L, 1.0))), s"got $got")
  }

  // ---- session paths -----------------------------------------------------------

  test("sessionPaths orders events within a session and splits on the gap") {
    import spark.implicits._
    // user 1: 3 events inside 30min (one path), then a 31-min gap opens
    // a second session; out-of-order input must not disturb the path
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:10:00"), "browse"),
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), "signup"),
      (1L, Timestamp.valueOf("2024-01-01 10:20:00"), "purchase"),
      (1L, Timestamp.valueOf("2024-01-01 10:51:00"), "browse")
    ).toDF("user_id", "ts", "event_type")
    val got = TimeSeries.sessionPaths(ev, "user_id", "ts", "event_type")
      .collect().map(r => (r.getString(2), r.getLong(3))).toSet
    assert(got == Set(("signup>browse>purchase", 3L), ("browse", 1L)),
      s"got $got")
  }

  test("gapFillDaily is partitioning-invariant") {
    import spark.implicits._
    val ev = (1 to 300).map { i =>
      (i % 7L, new Timestamp(86400000L * (i % 23) + i * 1000L),
        i.toLong, i / 3.0)
    }.toDF("user_id", "ts", "event_id", "value")
    val a = TimeSeries.gapFillDaily(ev, "user_id", "ts", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2))).toSet
    val b = TimeSeries.gapFillDaily(ev.repartition(11), "user_id", "ts",
        "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2))).toSet
    assert(a == b)
  }
}
