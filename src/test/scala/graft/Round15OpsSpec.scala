package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Graph, TimeSeries}

/** Round-6 thirty-first-wave operators: modularity, Nelson–Aalen.
  * (q275's frame dedup is a composition pinned by its oracle.) */
class Round15OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  // ---- modularity ----------------------------------------------------------

  test("modularity of two clean cliques matches the hand computation") {
    import spark.implicits._
    // two triangles {1,2,3}, {4,5,6}: m=6, labels = component →
    // e_c sums to 6 intra; d_c = 6 each; Q = (4·6·6 − 72)/(4·36) = 0.5
    val edges = Seq((1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6))
      .toDF("a", "b")
    val labels = Seq((1, 1), (2, 1), (3, 1), (4, 2), (5, 2), (6, 2))
      .toDF("node", "label")
    val r = Graph.modularity(edges, "a", "b", labels, "node", "label")
      .collect()(0)
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L && r.getLong(2) == 6L)
    assert(r.getDouble(3) == 0.5)
  }

  test("modularity of everything-in-one-community is 0") {
    import spark.implicits._
    // all degree mass in one community: Q = (4m·m − (2m)²)/4m² = 0
    val edges = Seq((1, 2), (2, 3), (3, 4)).toDF("a", "b")
    val labels = Seq((1, 9), (2, 9), (3, 9), (4, 9)).toDF("node", "label")
    val r = Graph.modularity(edges, "a", "b", labels, "node", "label")
      .collect()(0)
    assert(r.getDouble(3) == 0.0)
  }

  test("modularity penalizes a split that cuts every edge") {
    import spark.implicits._
    // path 1-2 with each node its own community: e_c = 0,
    // Q = (0 − (1+1))/4 = −0.5
    val edges = Seq((1, 2)).toDF("a", "b")
    val labels = Seq((1, 1), (2, 2)).toDF("node", "label")
    val r = Graph.modularity(edges, "a", "b", labels, "node", "label")
      .collect()(0)
    assert(r.getDouble(3) == -0.5)
  }

  // ---- nelsonAalen ---------------------------------------------------------

  test("nelsonAalen matches the hand-computed hazard steps") {
    import spark.implicits._
    // durations: 1 (event), 2 (event), 2 (censored), 3 (event)
    // t=1: n=4, d=1 → H=0.25; t=2: n=3, d=1 → H=0.25+1/3;
    // t=3: n=1, d=1 → H += 1
    val df = Seq((1L, 1L), (2L, 1L), (2L, 0L), (3L, 1L)).toDF("dur", "obs")
    val out = TimeSeries.nelsonAalen(df, "dur", "obs")
      .orderBy("t").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getLong(1)).toSeq == Seq(4L, 3L, 1L))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getDouble(3) == 0.25)
    assert(out(1).getDouble(3) == r6(0.25 + 1.0 / 3.0))
    assert(out(2).getDouble(3) == r6(0.25 + 1.0 / 3.0 + 1.0))
  }

  test("nelsonAalen: censored-only times never appear but shrink risk") {
    import spark.implicits._
    val df = Seq((1L, 0L), (2L, 1L)).toDF("dur", "obs")
    val out = TimeSeries.nelsonAalen(df, "dur", "obs").collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 2L && out(0).getLong(1) == 1L)
    assert(out(0).getDouble(3) == 1.0)
  }

  test("nelsonAalen routed (corpus-sized spine) path equals the window path") {
    import spark.implicits._
    val df = (1 to 2500).map { i =>
      (((i * 113) % 1201 + 1).toLong, if (i % 4 == 0) 0L else 1L)
    }.toDF("dur", "obs")
    def snap(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val windowed = snap(TimeSeries.nelsonAalen(df, "dur", "obs"))
    val routed = snap(TimeSeries.nelsonAalen(df, "dur", "obs",
      maxSpineRows = 1L))
    assert(routed == windowed && routed.nonEmpty)
  }

  test("nelsonAalen stays below -ln(KM survival) upper-bound relation") {
    import spark.implicits._
    // H_NA ≤ −ln(S_KM) pointwise (standard inequality, strict with
    // multiplicities > 1 per risk set); sanity-ties the two estimators
    val df = (1 to 30).map(i => ((i % 7 + 1).toLong, (i % 3 min 1).toLong))
      .toDF("dur", "obs")
    val na = TimeSeries.nelsonAalen(df, "dur", "obs")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val km = TimeSeries.kaplanMeier(df, "dur", "obs")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(na.keySet == km.keySet)
    na.foreach { case (t, h) =>
      val s = km(t)
      if (s > 0) assert(h <= -math.log(s) + 1e-9, s"t=$t H=$h S=$s")
    }
  }
}
