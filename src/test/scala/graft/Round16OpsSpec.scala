package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Graph, TimeSeries, TopK}

/** Round-6 eighth-wave operators: BFS distances, 2-D skyline, Hampel
  * filter. */
class Round16OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  test("bfsDistances finds minimum hop counts from multiple seeds") {
    import spark.implicits._
    // chain 1-2-3-4-5 plus isolated edge 8-9; seeds {1, 9}
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L),
      (4L, 3L), (4L, 5L), (5L, 4L), (8L, 9L), (9L, 8L)).toDF("src", "dst")
    val seeds = Seq(1L, 9L).toDF("node")
    val r = Graph.bfsDistances(edges, "src", "dst", seeds, "node", 10)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4,
      9L -> 0, 8L -> 1))
  }

  test("bfsDistances truncates at maxDepth and skips unreachable nodes") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("src", "dst") // directed
    val seeds = Seq(1L).toDF("node")
    val r = Graph.bfsDistances(edges, "src", "dst", seeds, "node", 2)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r == Map(1L -> 0, 2L -> 1, 3L -> 2)) // 4 beyond depth, 10/11 unreachable
  }

  test("bfsDistances: a node reachable two ways gets the SHORTER distance") {
    import spark.implicits._
    // 1->2->3 and 1->3 direct: dist(3) = 1
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r = Graph.bfsDistances(edges, "src", "dst", seeds, "node", 5)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r(3L) == 1)
  }

  test("skyline2DMax keeps exactly the non-dominated points, ties included") {
    import spark.implicits._
    // (5,1) and (1,5) and (3,3) are the frontier; (3,3) duplicated twice
    // (both kept); (2,2) dominated by (3,3); (3,1) dominated by (3,3)
    // via equal x / greater y; (1,4) dominated by (1,5)
    val df = Seq(("a", 5, 1), ("b", 1, 5), ("c", 3, 3), ("c2", 3, 3),
      ("d", 2, 2), ("e", 3, 1), ("f", 1, 4)).toDF("id", "x", "y")
    val r = TopK.skyline2DMax(df, "x", "y").select("id")
      .collect().map(_.getString(0)).toSet
    assert(r == Set("a", "b", "c", "c2"))
  }

  test("hampelFilter: hand-computed median/MAD and the planted spike flagged") {
    import spark.implicits._
    // series 10,10,10,100,10,10,10 with half=1: row 4's window is
    // (10,100,10) -> med 10, |dev| = (0,90,0) -> mad 0; |100-10|=90 > 0
    val df = (1 to 7).map(i => ("k", i.toLong, if (i == 4) 100.0 else 10.0))
      .toDF("k", "seq", "v")
    val r = TimeSeries.hampelFilter(df, "k", Seq("seq"), "v", half = 1)
      .select("seq", "med", "mad", "is_outlier")
      .collect().map(x => x.getLong(0) ->
        ((x.getDouble(1), x.getDouble(2), x.getBoolean(3)))).toMap
    assert(r(4L) == ((10.0, 0.0, true)))
    // neighbors of the spike see it in their window but their own
    // deviation from the window median (10) is zero -> not outliers
    assert(r(3L) == ((10.0, 0.0, false)) && r(5L) == ((10.0, 0.0, false)))
  }

  test("hampelFilter interpolates even-length edge frames like quantile_cont") {
    import spark.implicits._
    // first row of 1,2,3,4 with half=2: window (1,2,3) odd -> 2;
    // second row window (1,2,3,4) even -> (2+3)/2 = 2.5
    val df = Seq(("k", 1L, 1.0), ("k", 2L, 2.0), ("k", 3L, 3.0),
      ("k", 4L, 4.0)).toDF("k", "seq", "v")
    val r = TimeSeries.hampelFilter(df, "k", Seq("seq"), "v", half = 2)
      .select("seq", "med").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) == 2.0 && r(2L) == 2.5)
  }

  test("hampelFilter order comes from orderCols under any partitioning") {
    import spark.implicits._
    val rows = Seq(("k", 3L, 30.0), ("k", 1L, 10.0), ("k", 4L, 40.0),
      ("k", 2L, 20.0), ("k", 5L, 50.0))
    val a = TimeSeries.hampelFilter(rows.toDF("k", "seq", "v"),
      "k", Seq("seq"), "v", half = 1).select("seq", "med").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val b = TimeSeries.hampelFilter(
      rows.toDF("k", "seq", "v").repartition(7),
      "k", Seq("seq"), "v", half = 1).select("seq", "med").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(a == b && a(3L) == 30.0)
  }
}
