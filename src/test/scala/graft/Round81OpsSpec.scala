package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Graph, Hypothesis}

/** Round-9 wave #5: Katz centrality and Cochran's Q — hand-computed
  * textbook cases, edge/dedup semantics, and partitioning invariance. */
class Round81OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  // ---- katzCentrality ----------------------------------------------------

  test("katzCentrality matches the hand-computed path graph") {
    import spark.implicits._
    // symmetrized path 1-2-3, alpha=0.5, L=3:
    //   W1 = (1,2,1); W2 = (2,2,2); W3 = (2,4,2)
    //   katz = .5·W1 + .25·W2 + .125·W3 → (1.25, 2.0, 1.25)
    val edges = Seq((1L,2L),(2L,1L),(2L,3L),(3L,2L)).toDF("src","dst")
    val out = Graph.katzCentrality(edges, "src", "dst", 3, 0.5)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Double]("katz"))
      .toMap
    assert(out == Map(1L -> 1.25, 2L -> 2.0, 3L -> 1.25), s"got $out")
  }

  test("katzCentrality deduplicates parallel edges") {
    import spark.implicits._
    val edges = Seq((1L,2L),(1L,2L),(2L,1L),(2L,1L)).toDF("src","dst")
    val out = Graph.katzCentrality(edges, "src", "dst", 2, 0.5)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Double]("katz"))
      .toMap
    // single symmetric edge: W1 = 1 each, W2 = 1 each → .5 + .25
    assert(out == Map(1L -> 0.75, 2L -> 0.75), s"got $out")
  }

  test("katzCentrality is partitioning-invariant") {
    import spark.implicits._
    val base = (1 to 200).map(i => (i.toLong, ((i * 7) % 50 + 1).toLong))
    val edges = base ++ base.map(_.swap)
    val a = Graph.katzCentrality(edges.toDF("src","dst").repartition(1),
      "src", "dst", 3, 0.2).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("katz")).toMap
    val b = Graph.katzCentrality(edges.toDF("src","dst").repartition(32),
      "src", "dst", 3, 0.2).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("katz")).toMap
    assert(a == b)
  }

  // ---- cochranQ ------------------------------------------------------------

  test("cochranQ matches the hand-computed 4x3 table") {
    import spark.implicits._
    // blocks (rows) x treatments A,B,C:
    //   b1: 1,1,0  b2: 0,1,0  b3: 1,1,1  b4: 0,1,0
    // C = (2,4,1), N = 7, ΣC² = 21, ΣR² = 4+1+9+1 = 15
    // Q = 2·(3·21 − 49)/(3·7 − 15) = 2·14/6 = 4.666667
    val rows = Seq(
      ("g","b1","A",1),("g","b1","B",1),("g","b1","C",0),
      ("g","b2","A",0),("g","b2","B",1),("g","b2","C",0),
      ("g","b3","A",1),("g","b3","B",1),("g","b3","C",1),
      ("g","b4","A",0),("g","b4","B",1),("g","b4","C",0))
    val r = Hypothesis.cochranQ(rows.toDF("g","b","t","x"),
      "g", "b", "t", "x").collect()(0)
    assert(r.getAs[Long]("n_blocks") == 4L && r.getAs[Long]("k") == 3L)
    assert(math.abs(r.getAs[Double]("q_stat") - 14.0 / 3.0) < 1e-6,
      s"got $r")
    assert(r.getAs[Long]("df") == 2L)
  }

  test("cochranQ drops groups where every block is uninformative") {
    import spark.implicits._
    // all-1 and all-0 blocks only → kN − ΣR² = 0 → dropped
    val rows = Seq(
      ("g","b1","A",1),("g","b1","B",1),("g","b1","C",1),
      ("g","b2","A",0),("g","b2","B",0),("g","b2","C",0))
    assert(Hypothesis.cochranQ(rows.toDF("g","b","t","x"),
      "g", "b", "t", "x").count() == 0L)
  }

  test("cochranQ is partitioning-invariant") {
    import spark.implicits._
    val rows = (1 to 120).flatMap { b =>
      Seq("A", "B", "C", "D").zipWithIndex.map { case (t, j) =>
        ("g", s"b$b", t, (b * 7 + j * 3) % 5 match {
          case 0 | 1 => 1; case _ => 0 })
      }
    }
    val a = Hypothesis.cochranQ(rows.toDF("g","b","t","x")
      .repartition(1), "g", "b", "t", "x").collect()(0)
    val c = Hypothesis.cochranQ(rows.toDF("g","b","t","x")
      .repartition(32), "g", "b", "t", "x").collect()(0)
    assert(a.getAs[Double]("q_stat") == c.getAs[Double]("q_stat"))
  }
}
