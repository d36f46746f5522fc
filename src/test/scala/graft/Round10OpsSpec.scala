package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Graph, Quantiles, TextAnalysis, TimeSeries}

/** Round-6 second-wave operators: interval merge, positional
  * co-occurrence, robust scaling, degree assortativity. */
class Round10OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private def dated(rows: Seq[(String, String, String)]) = {
    import spark.implicits._
    rows.toDF("k", "s", "e")
      .selectExpr("k", "CAST(s AS DATE) AS s", "CAST(e AS DATE) AS e")
  }

  // ---- TimeSeries.mergeIntervals -------------------------------------------

  test("mergeIntervals merges overlaps, keeps adjacency separate") {
    val iv = dated(Seq(
      ("k", "2024-01-01", "2024-01-05"),  // chain: overlaps next
      ("k", "2024-01-04", "2024-01-08"),
      ("k", "2024-01-09", "2024-01-10"),  // adjacent (gap 0 days) — NEW island
      ("k", "2024-02-01", "2024-02-02"))) // far — new island
    val out = TimeSeries.mergeIntervals(iv, "k", "s", "e")
      .orderBy("island_start").collect()
      .map(r => (r.getDate(1).toString, r.getDate(2).toString, r.getLong(3)))
    assert(out.toSeq == Seq(
      ("2024-01-01", "2024-01-08", 2L),
      ("2024-01-09", "2024-01-10", 1L),
      ("2024-02-01", "2024-02-02", 1L)))
  }

  test("mergeIntervals handles containment and is partitioning-invariant") {
    val iv = dated(Seq(
      ("a", "2024-01-01", "2024-01-31"),
      ("a", "2024-01-10", "2024-01-12"),  // contained
      ("a", "2024-01-20", "2024-02-05"),  // extends
      ("b", "2024-01-10", "2024-01-12"))) // other key untouched
    val out = TimeSeries.mergeIntervals(iv, "k", "s", "e").collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        r.getDate(2).toString, r.getLong(3))).toSet
    assert(out == Set(("a", "2024-01-01", "2024-02-05", 3L),
      ("b", "2024-01-10", "2024-01-12", 1L)))
    val again = TimeSeries.mergeIntervals(iv.repartition(7), "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getDate(2).toString, r.getLong(3))).toSet
    assert(out == again)
  }

  // ---- TextAnalysis.cooccurrencePairs --------------------------------------

  test("cooccurrencePairs counts ordered pairs within the window") {
    import spark.implicits._
    // "a b c": window 2 -> (a,b), (a,c), (b,c)
    // "b c":              (b,c)
    val docs = Seq("a b c", "b c").toDF("text")
    val out = TextAnalysis.cooccurrencePairs(docs, "text", 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(("a", "b") -> 1L, ("a", "c") -> 1L, ("b", "c") -> 2L))
  }

  test("cooccurrencePairs ignores 1-token docs and respects window=1") {
    import spark.implicits._
    val docs = Seq("solo", "x y z").toDF("text")
    val out = TextAnalysis.cooccurrencePairs(docs, "text", 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("x", "y"), ("y", "z")))
  }

  // ---- Quantiles.robustScale -----------------------------------------------

  test("robustScale matches hand-computed (x - median) / IQR") {
    import spark.implicits._
    // group g: 1..5 -> p25=2, p50=3, p75=4, IQR=2
    val df = (1 to 5).map(v => ("g", v.toDouble)).toDF("k", "v")
    val out = Quantiles.robustScale(df, Seq("k"), "v")
      .orderBy("v").collect().map(_.getDouble(2))
    assert(out.toSeq == Seq(-1.0, -0.5, 0.0, 0.5, 1.0))
  }

  test("robustScale nulls zero-IQR groups instead of dividing") {
    import spark.implicits._
    val df = Seq(("g", 5.0), ("g", 5.0), ("g", 5.0), ("g", 5.0),
      ("g", 9.0)).toDF("k", "v")
    // sorted (5,5,5,5,9): p25 and p75 both land on 5 -> IQR 0 -> null
    val out = Quantiles.robustScale(df, Seq("k"), "v").collect()
    assert(out.forall(_.isNullAt(2)))
  }

  // ---- Graph.degreeMixing --------------------------------------------------

  test("degreeMixing star graph is perfectly disassortative") {
    import spark.implicits._
    val edges = Seq((0, 1), (0, 2), (0, 3)).toDF("s", "d")
    val r = Graph.degreeMixing(edges, "s", "d").collect()(0)
    assert(r.getLong(0) == 4 && r.getLong(1) == 3)
    assert(r.getLong(3) == 3)               // max degree = hub
    assert(r.getDouble(4) == -1.0)          // star: r = -1 exactly
  }

  test("degreeMixing is invariant to direction, duplicates, partitioning") {
    import spark.implicits._
    val base = Seq((1, 2), (2, 3), (3, 4), (4, 1), (1, 3))
    val noisy = (base ++ base.map(_.swap) ++ base).toDF("s", "d")
    val a = Graph.degreeMixing(noisy, "s", "d").collect()(0)
    val b = Graph.degreeMixing(noisy.repartition(9), "s", "d").collect()(0)
    assert(a.toSeq == b.toSeq)
    assert(a.getLong(1) == 5) // canonical edge count
  }
}
