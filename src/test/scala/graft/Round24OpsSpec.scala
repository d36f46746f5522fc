package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Metrics, Mixing, TimeSeries}

/** Round-6 sixteenth-wave operators: PAV isotonic, Neyman allocation,
  * Kaplan–Meier. */
class Round24OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  test("pav pools adjacent violators to the weighted mean") {
    // textbook: (0.2, 0.6, 0.4) -> (0.2, 0.5, 0.5)
    val r1 = Metrics.pav(Array(1.0, 1.0, 1.0), Array(0.2, 0.6, 0.4))
    assert(r1.toSeq == Seq(0.2, 0.5, 0.5))
    // weighted: (0.6 w1, 0.2 w3) -> pooled mean 0.3 (up to fp)
    val r2 = Metrics.pav(Array(1.0, 3.0), Array(0.6, 0.2))
    assert(r2.forall(v => math.abs(v - 0.3) < 1e-12))
    // already monotone input unchanged
    val r3 = Metrics.pav(Array(2.0, 1.0, 5.0), Array(0.1, 0.2, 0.9))
    assert(r3.toSeq == Seq(0.1, 0.2, 0.9))
  }

  test("pav laws: monotone output, weighted mean preserved") {
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 10) {
      val n = 2 + rnd.nextInt(30)
      val ws = Array.fill(n)(1.0 + rnd.nextInt(9))
      val ys = Array.fill(n)(rnd.nextDouble())
      val iso = Metrics.pav(ws, ys)
      assert(iso.sliding(2).forall(p => p.length < 2 || p(0) <= p(1) + 1e-12))
      val before = ws.zip(ys).map { case (w, y) => w * y }.sum
      val after = ws.zip(iso).map { case (w, y) => w * y }.sum
      assert(math.abs(before - after) < 1e-9)
    }
  }

  test("pavCounts equals double pav and the minimax closed form on random cells") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val n = 2 + rnd.nextInt(25)
      val ns = Array.fill(n)(1L + rnd.nextInt(50))
      val ps = ns.map(w => rnd.nextInt(w.toInt + 1).toLong)
      val got = Metrics.pavCounts(ns, ps)
      // double-pav reference (rates as doubles, incremental pooling)
      val ref = Metrics.pav(ns.map(_.toDouble),
        ns.zip(ps).map { case (w, p) => p.toDouble / w })
      got.zip(ref).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
      // exact minimax form: fit(i) = max_{j<=i} min_{k>=i} (P(j..k)/N(j..k))
      // — every candidate ONE division of exact integer sums, the same
      // ratios q233's DuckDB oracle evaluates
      val mm = (0 until n).map { i =>
        (0 to i).map { j =>
          (i until n).map { k =>
            val w = (j to k).map(ns).sum; val p = (j to k).map(ps).sum
            p.toDouble / w.toDouble
          }.min
        }.max
      }
      got.zip(mm).foreach { case (a, b) => assert(a == b, s"$a != $b") }
      // monotone
      assert(got.sliding(2).forall(q => q.length < 2 || q(0) <= q(1)))
    }
  }

  test("isotonicCalibration produces monotone per-group rates end-to-end") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 4000).map { i =>
      val score = rnd.nextDouble()
      // noisy but increasing true rate; PAV must smooth the noise
      val label = if (rnd.nextDouble() < 0.2 + 0.6 * score) 1 else 0
      ("g", score, i.toLong, label)
    }
    val out = Metrics.isotonicCalibration(
      rows.toDF("g", "score", "id", "label"),
      "g", "score", "label", Seq("id"), bins = 10)
      .orderBy("bin").collect()
    assert(out.length == 10)
    val iso = out.map(_.getDouble(4))
    assert(iso.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    // rising true curve -> ends higher than it starts
    assert(iso.last > iso.head)
  }

  test("neymanAllocation: equal strata split evenly, spread pulls budget") {
    import spark.implicits._
    // A: values alternate 0/100 (big sigma); B: constant 50 (sigma 0)
    val rows = (1 to 100).map(i => ("A", if (i % 2 == 0) 0L else 100L)) ++
      (1 to 100).map(_ => ("B", 50L))
    val r = Mixing.neymanAllocation(rows.toDF("s", "v"), "s", "v", 100)
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(r("A") == 100L && r("B") == 0L) // all budget to the variable stratum
  }

  test("kaplanMeier reproduces the textbook censored curve, including S=0") {
    import spark.implicits._
    // durations: 1+ (censored), 2, 3+, 4, 5 -> S(2)=0.75, S(4)=0.375, S(5)=0
    val df = Seq((1L, 0L), (2L, 1L), (3L, 0L), (4L, 1L), (5L, 1L))
      .toDF("dur", "obs")
    val r = TimeSeries.kaplanMeier(df, "dur", "obs")
      .orderBy("t").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(4)))).toMap
    assert(r(2L) == ((4L, 0.75)))
    assert(r(4L) == ((2L, 0.375)))
    assert(r(5L) == ((1L, 0.0)))
    assert(!r.contains(1L) && !r.contains(3L)) // censored-only times absent
  }

  test("kaplanMeier without censoring equals the empirical survivor function") {
    import spark.implicits._
    val df = Seq(1L, 1L, 2L, 3L).map(t => (t, 1L)).toDF("dur", "obs")
    val r = TimeSeries.kaplanMeier(df, "dur", "obs")
      .orderBy("t").collect().map(x => x.getLong(0) -> x.getDouble(4)).toMap
    assert(r(1L) == 0.5 && r(2L) == 0.25 && r(3L) == 0.0)
  }

  test("kaplanMeier routed (corpus-sized spine) path equals the window path") {
    import spark.implicits._
    // continuous-ish durations: ~1500 distinct values incl. a terminal
    // S=0 step and censored-only times; maxSpineRows = 1 forces the
    // range-partitioned route on the same input
    val df = (1 to 3000).map { i =>
      (((i * 97) % 1499 + 1).toLong, if (i % 3 != 0) 1L else 0L)
    }.toDF("dur", "obs")
      .union(Seq((2000L, 1L)).toDF("dur", "obs")) // lone terminal event
    def snap(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    val windowed = snap(TimeSeries.kaplanMeier(df, "dur", "obs"))
    val routed = snap(TimeSeries.kaplanMeier(df, "dur", "obs",
      maxSpineRows = 1L))
    assert(routed == windowed && routed.nonEmpty)
    assert(routed.exists(_._5 == 0.0)) // the terminal step survived routing
  }
}
