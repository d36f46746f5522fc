package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.TextAnalysis

/** Round-9 wave #8: Chao1 richness and Good–Turing smoothing —
  * hand-computed frequency tables and partitioning invariance. */
class Round84OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  test("chao1 matches the hand-computed frequency table") {
    import spark.implicits._
    // tokens: a a b c → D=3, f1=2, f2=1, N=4
    // chao1 = 3 + 2·1/(2·2) = 3.5, coverage = 1 − 2/4 = 0.5
    val docs = Seq(("g", "a a"), ("g", "b c")).toDF("src", "text")
    val r = TextAnalysis.chao1(docs, "src", "text").collect()(0)
    assert(r.getAs[Long]("n_tokens") == 4L && r.getAs[Long]("n_types") == 3L)
    assert(r.getAs[Long]("f1") == 2L && r.getAs[Long]("f2") == 1L)
    assert(r.getAs[Double]("chao1") == 3.5, s"got $r")
    assert(r.getAs[Double]("coverage") == 0.5, s"got $r")
  }

  test("chao1 stays defined with no doubletons (bias-corrected form)") {
    import spark.implicits._
    // all singletons: D=3, f1=3, f2=0 → chao1 = 3 + 3·2/2 = 6
    val docs = Seq(("g", "x y z")).toDF("src", "text")
    val r = TextAnalysis.chao1(docs, "src", "text").collect()(0)
    assert(r.getAs[Double]("chao1") == 6.0, s"got $r")
  }

  test("goodTuring matches the hand-computed adjusted counts") {
    import spark.implicits._
    // a a b c → ff: f1=2, f2=1; r=1: r*=2·1/2=1; r=2: f3=0 → r*=0
    val docs = Seq(("g", "a a b c")).toDF("src", "text")
    val out = TextAnalysis.goodTuring(docs, "src", "text", maxR = 4)
      .collect().map(r => r.getAs[Long]("r") ->
        (r.getAs[Long]("f_r"), r.getAs[Long]("f_r1"),
          r.getAs[Double]("r_star"), r.getAs[Double]("p0"))).toMap
    assert(out(1L) == ((2L, 1L, 1.0, 0.5)), s"got $out")
    assert(out(2L) == ((1L, 0L, 0.0, 0.5)), s"got $out")
    assert(!out.contains(3L))
  }

  test("chao1 and goodTuring are partitioning-invariant") {
    import spark.implicits._
    val docs = (1 to 200).map(i =>
      ("g", s"w${i % 37} w${i % 11} w${(i * 7) % 53}"))
    val c1 = TextAnalysis.chao1(docs.toDF("src","text").repartition(1),
      "src", "text").collect()(0)
    val c32 = TextAnalysis.chao1(docs.toDF("src","text").repartition(32),
      "src", "text").collect()(0)
    assert(c1.getAs[Double]("chao1") == c32.getAs[Double]("chao1"))
    val g1 = TextAnalysis.goodTuring(docs.toDF("src","text")
      .repartition(1), "src", "text").collect()
      .map(r => r.getAs[Long]("r") -> r.getAs[Double]("r_star")).toMap
    val g32 = TextAnalysis.goodTuring(docs.toDF("src","text")
      .repartition(32), "src", "text").collect()
      .map(r => r.getAs[Long]("r") -> r.getAs[Double]("r_star")).toMap
    assert(g1 == g32)
  }
}
