package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Fuzzy, Graph, Metrics, TimeSeries}

/** Round-6 twenty-fifth-wave operators: weighted SSSP, Gini,
  * Mann–Whitney, sorted-neighborhood blocking, linear interpolation. */
class Round10OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  // ---- weightedSssp --------------------------------------------------------

  test("weightedSssp finds the cheaper 2-hop path over the direct edge") {
    import spark.implicits._
    // a→c direct costs 10; a→b→c costs 3; hop budget decides which wins
    val edges = Seq(("a", "c", 10.0), ("a", "b", 1.0), ("b", "c", 2.0))
      .toDF("src", "dst", "w")
    val seeds = Seq("a").toDF("node")
    val oneHop = Graph.weightedSssp(edges, "src", "dst", "w", seeds,
        "node", maxHops = 1)
      .collect().map(r => r.getString(0) -> r.getDecimal(1).doubleValue())
      .toMap
    assert(oneHop("c") == 10.0 && oneHop("b") == 1.0 && oneHop("a") == 0.0)
    val twoHop = Graph.weightedSssp(edges, "src", "dst", "w", seeds,
        "node", maxHops = 2)
      .collect().map(r => r.getString(0) -> r.getDecimal(1).doubleValue())
      .toMap
    assert(twoHop("c") == 3.0)
  }

  test("weightedSssp keeps the lightest of parallel edges and converges early") {
    import spark.implicits._
    val edges = Seq(("a", "b", 5.0), ("a", "b", 2.0)).toDF("src", "dst", "w")
    val seeds = Seq("a").toDF("node")
    // maxHops far beyond the diameter: early exit must still terminate
    val out = Graph.weightedSssp(edges, "src", "dst", "w", seeds, "node",
        maxHops = 50)
      .collect().map(r => r.getString(0) -> r.getDecimal(1).doubleValue())
      .toMap
    assert(out == Map("a" -> 0.0, "b" -> 2.0))
  }

  test("weightedSssp multi-seed takes the per-node minimum across seeds") {
    import spark.implicits._
    val edges = Seq(("s1", "x", 7.0), ("s2", "x", 4.0)).toDF("src", "dst", "w")
    val seeds = Seq("s1", "s2").toDF("node")
    val out = Graph.weightedSssp(edges, "src", "dst", "w", seeds, "node", 2)
      .filter($"node" === "x").collect()
    assert(out.length == 1 && out(0).getDecimal(1).doubleValue() == 4.0)
  }

  // ---- giniByGroup ---------------------------------------------------------

  test("giniByGroup: uniform values → 0; hand-computed skewed case") {
    import spark.implicits._
    val df = Seq(
      ("even", 1, 5.0), ("even", 2, 5.0), ("even", 3, 5.0), ("even", 4, 5.0),
      ("skew", 1, 0.0), ("skew", 2, 0.0), ("skew", 3, 0.0), ("skew", 4, 10.0)
    ).toDF("g", "id", "x")
    val out = Metrics.giniByGroup(df, "g", "x", "id")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("even") == 0.0)
    // sorted [0,0,0,10]: G = 2*(4*10)/(4*10) - 5/4 = 0.75
    assert(out("skew") == 0.75)
  }

  test("giniByGroup is partitioning-invariant (decimal rank sums)") {
    import spark.implicits._
    val df = (1 to 200).map(i => ("g", i, (i % 17) * 1.5)).toDF("g", "id", "x")
    val a = Metrics.giniByGroup(df.repartition(1), "g", "x", "id").collect()(0)
    val b = Metrics.giniByGroup(df.repartition(13), "g", "x", "id").collect()(0)
    assert(a.getDouble(2) == b.getDouble(2))
  }

  // ---- mannWhitney ---------------------------------------------------------

  test("mannWhitney matches the hand-computed U and z (no ties)") {
    import spark.implicits._
    // A = {1,2,3}, B = {4,5,6}: ranks of A = 1,2,3 → R_A = 6,
    // U = 6 - 3*4/2 = 0; sigma = sqrt(9/12 * 7) = sqrt(5.25)
    val df = Seq(("g", "A", 1.0), ("g", "A", 2.0), ("g", "A", 3.0),
      ("g", "B", 4.0), ("g", "B", 5.0), ("g", "B", 6.0)).toDF("g", "s", "x")
    val r = Metrics.mannWhitney(df, "g", "s", "A", "B", "x").collect()(0)
    assert(r.getLong(1) == 3 && r.getLong(2) == 3)
    assert(r.getDouble(3) == 0.0)
    val z = (0.0 - 4.5) / math.sqrt(5.25)
    assert(math.abs(r.getDouble(4) - BigDecimal(z)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("mannWhitney midranks and tie correction on a tied pool") {
    import spark.implicits._
    // pool = A:{1,2,2}, B:{2,3}: midrank of the 2-run (ranks 2,3,4) = 3
    // R_A = 1 + 3 + 3 = 7, U = 7 - 6 = 1; tsum: run of 3 → 3*(9-1)=24
    val df = Seq(("g", "A", 1.0), ("g", "A", 2.0), ("g", "A", 2.0),
      ("g", "B", 2.0), ("g", "B", 3.0)).toDF("g", "s", "x")
    val r = Metrics.mannWhitney(df, "g", "s", "A", "B", "x").collect()(0)
    assert(r.getDouble(3) == 1.0)
    val sigma = math.sqrt(3.0 * 2.0 / 12.0 * (6.0 - 24.0 / (5.0 * 4.0)))
    val z = (1.0 - 3.0) / sigma
    assert(math.abs(r.getDouble(4) - BigDecimal(z)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("mannWhitney drops groups missing a side and ignores other sides") {
    import spark.implicits._
    val df = Seq(("only_a", "A", 1.0), ("both", "A", 1.0), ("both", "B", 2.0),
      ("both", "C", 99.0)).toDF("g", "s", "x")
    val out = Metrics.mannWhitney(df, "g", "s", "A", "B", "x").collect()
    // only_a has no B sample → dropped; side C rows never enter the pool
    assert(out.map(_.getString(0)).toSet == Set("both"))
    assert(out(0).getLong(1) == 1 && out(0).getLong(2) == 1)
  }

  // ---- sortedNeighborhood --------------------------------------------------

  test("sortedNeighborhood pairs each record with its w in-block successors") {
    import spark.implicits._
    val df = Seq(("blk", "aaa", 1L), ("blk", "aab", 2L), ("blk", "aac", 3L),
      ("other", "zzz", 9L)).toDF("b", "name", "id")
    val out = Fuzzy.sortedNeighborhood(df, "b", "name", "id", "name",
        w = 2, maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // window 2 over sorted (aaa,aab,aac): (1,2),(1,3),(2,3); zzz alone
    assert(out == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("sortedNeighborhood enforces the edit-distance verify") {
    import spark.implicits._
    val df = Seq(("blk", "aaaa", 1L), ("blk", "zzzz", 2L)).toDF("b", "name", "id")
    val out = Fuzzy.sortedNeighborhood(df, "b", "name", "id", "name", 1, 3)
    assert(out.count() == 0) // dist 4 > 3
  }

  // ---- interpolateDaily ----------------------------------------------------

  test("interpolateDaily linearly fills the hole between observed endpoints") {
    import spark.implicits._
    val df = Seq(
      ("u", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 100.0),
      ("u", java.sql.Timestamp.valueOf("2024-01-04 10:00:00"), 400.0)
    ).toDF("k", "ts", "v")
    val out = TimeSeries.interpolateDaily(df, "k", "ts", "v")
      .orderBy("day").collect()
    assert(out.length == 4)
    assert(out.map(_.getDouble(3)).toSeq == Seq(100.0, 200.0, 300.0, 400.0))
    assert(out.map(_.getBoolean(2)).toSeq == Seq(true, false, false, true))
  }

  test("interpolateDaily sums multiple observations of one day exactly") {
    import spark.implicits._
    val df = Seq(
      ("u", java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 0.1),
      ("u", java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 0.2),
      ("u", java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 0.9)
    ).toDF("k", "ts", "v")
    val out = TimeSeries.interpolateDaily(df, "k", "ts", "v")
      .orderBy("day").collect()
    // day1 = 0.3 (decimal-exact, no 0.30000000000000004), day2 = 0.6
    assert(out.map(_.getDouble(3)).toSeq == Seq(0.3, 0.6, 0.9))
  }

  test("interpolateDaily is partitioning-invariant") {
    import spark.implicits._
    val rows = (0 until 50).map { i =>
      ("u" + (i % 3),
        java.sql.Timestamp.valueOf(f"2024-01-${(i % 25) + 1}%02d 05:00:00"),
        i * 1.37)
    }
    val df = rows.toDF("k", "ts", "v")
    val a = TimeSeries.interpolateDaily(df.repartition(1), "k", "ts", "v")
      .orderBy("k", "day").collect().toSeq
    val b = TimeSeries.interpolateDaily(df.repartition(11), "k", "ts", "v")
      .orderBy("k", "day").collect().toSeq
    assert(a == b)
  }
}
