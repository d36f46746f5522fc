package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Fuzzy, Graph, TimeSeries, TopK}

/** Round-6 twenty-sixth-wave operators: label propagation, mutual best
  * match, top-p coverage, rolling slope. */
class Round11OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  // ---- labelPropagation ----------------------------------------------------

  test("labelPropagation: round 1 adopts the min neighbor on a path") {
    import spark.implicits._
    // path 1-2-3: round 1 → node1:2, node2:1 (min of {1,3}), node3:2
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = Graph.labelPropagation(edges, "a", "b", rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("labelPropagation: a triangle converges to the min label") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    // round 1: 1→2 (min of 2,3), 2→1, 3→1; round 2: everyone sees a
    // majority/min of {1,2} → node1:1? neighbors of 1 = {2,3} labels
    // {1,1} → 1; neighbors of 2 = {1,3} labels {2,1} tie → 1;
    // neighbors of 3 = {1,2} labels {2,1} tie → 1
    val out = Graph.labelPropagation(edges, "a", "b", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("labelPropagation: two components never exchange labels") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (10L, 11L)).toDF("a", "b")
    val out = Graph.labelPropagation(edges, "a", "b", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.filter(_._1 < 10).values.forall(_ < 10))
    assert(out.filter(_._1 >= 10).values.forall(_ >= 10))
  }

  test("labelPropagation is partitioning-invariant") {
    import spark.implicits._
    val edges = (1 to 60).map(i => (i.toLong, ((i * 7) % 20 + 1).toLong))
      .toDF("a", "b")
    val a = Graph.labelPropagation(edges.repartition(1), "a", "b", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Graph.labelPropagation(edges.repartition(9), "a", "b", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  // ---- mutualBestMatch -----------------------------------------------------

  test("mutualBestMatch keeps only reciprocal pairs") {
    import spark.implicits._
    // L1(10) ↔ R1(11) mutual; L2(50): best right is R1 (|39|) but R1's
    // best left is L1 (|1|) → L2 unmatched
    val left = Seq(("b", 1L, 10L), ("b", 2L, 50L)).toDF("blk", "id", "k")
    val right = Seq(("b", 1L, 11L)).toDF("blk", "id", "k")
    val out = Fuzzy.mutualBestMatch(left, "id", "k", right, "id", "k", "blk")
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 1L && out(0).getLong(2) == 1L
      && out(0).getLong(3) == 1L)
  }

  test("mutualBestMatch ties break on the smaller partner id") {
    import spark.implicits._
    val left = Seq(("b", 1L, 10L)).toDF("blk", "id", "k")
    val right = Seq(("b", 7L, 12L), ("b", 3L, 8L)).toDF("blk", "id", "k")
    // both rights at dist 2 → right 3 wins the tie
    val out = Fuzzy.mutualBestMatch(left, "id", "k", right, "id", "k", "blk")
      .collect()
    assert(out.length == 1 && out(0).getLong(2) == 3L)
  }

  test("mutualBestMatch never crosses blocks") {
    import spark.implicits._
    val left = Seq(("x", 1L, 10L)).toDF("blk", "id", "k")
    val right = Seq(("y", 2L, 10L)).toDF("blk", "id", "k")
    assert(Fuzzy.mutualBestMatch(left, "id", "k", right, "id", "k", "blk")
      .count() == 0)
  }

  // ---- topPByGroup ---------------------------------------------------------

  test("topPByGroup keeps the smallest prefix reaching the target") {
    import spark.implicits._
    // weights 50,30,15,5 (total 100), p=0.8: 50+30=80 → prefix of 2
    // (the keep test is cum_before < 80: 0,50 pass; 80,95 fail)
    val df = Seq(("g", "a", 50L), ("g", "b", 30L), ("g", "c", 15L),
      ("g", "d", 5L)).toDF("grp", "id", "w")
    val out = TopK.topPByGroup(df, Seq("grp"), "w", "id", 4, 5)
      .orderBy("rank").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("a", "b"))
    assert(out.last.getLong(4) == 80L && out.last.getLong(5) == 100L)
  }

  test("topPByGroup p=1 keeps everything; first member always kept") {
    import spark.implicits._
    val df = Seq(("g", "a", 99L), ("g", "b", 1L)).toDF("grp", "id", "w")
    assert(TopK.topPByGroup(df, Seq("grp"), "w", "id", 1, 1).count() == 2)
    // even when the first member alone overshoots the target
    val one = TopK.topPByGroup(df, Seq("grp"), "w", "id", 1, 2)
      .collect()
    assert(one.length == 1 && one(0).getString(1) == "a")
  }

  test("topPByGroup boundary: exact hit stops the prefix (strict <)") {
    import spark.implicits._
    // weights 40,40,20, p=2/5: target mass 40; cum_before of b = 40 →
    // NOT < 40 → only a survives
    val df = Seq(("g", "a", 40L), ("g", "b", 40L), ("g", "c", 20L))
      .toDF("grp", "id", "w")
    val out = TopK.topPByGroup(df, Seq("grp"), "w", "id", 2, 5).collect()
    assert(out.length == 1 && out(0).getString(1) == "a")
  }

  // ---- rollingSlope --------------------------------------------------------

  test("rollingSlope matches the hand-computed OLS slope") {
    import spark.implicits._
    // y = 2x + 1 exactly → slope 2 on every full window
    val df = (0 to 9).map(x => ("k", x.toLong, 2.0 * x + 1))
      .toDF("k", "x", "v")
    val out = TimeSeries.rollingSlope(df, "k", "x", "v", 3)
      .orderBy("x").collect()
    // first row: window of 1 → NULL slope
    assert(out.head.isNullAt(3))
    assert(out.drop(2).forall(_.getDouble(3) == 2.0))
  }

  test("rollingSlope yields NULL on degenerate x spread") {
    import spark.implicits._
    val df = Seq(("k", 5L, 1.0), ("k", 5L, 3.0)).toDF("k", "x", "v")
    val out = TimeSeries.rollingSlope(df, "k", "x", "v", 2)
      .collect()
    assert(out.forall(r => r.isNullAt(3) || r.getLong(2) == 1))
  }

  test("rollingSlope is partitioning-invariant (integer arithmetic)") {
    import spark.implicits._
    val rows = (0 until 100).map(i =>
      ("k" + (i % 4), (i / 4).toLong, math.sin(i) * 1000))
    val df = rows.toDF("k", "x", "v")
    val a = TimeSeries.rollingSlope(df.repartition(1), "k", "x", "v", 7)
      .orderBy("k", "x").collect().toSeq
    val b = TimeSeries.rollingSlope(df.repartition(13), "k", "x", "v", 7)
      .orderBy("k", "x").collect().toSeq
    assert(a == b)
  }
}
