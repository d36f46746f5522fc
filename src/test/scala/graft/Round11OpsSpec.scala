package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Graph, Profile, TextAnalysis}

/** Round-6 third-wave operators: held-out LM scoring, Adamic-Adar,
  * FK audit. */
class Round11OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private def r6(x: Double) = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---- TextAnalysis.bigramLogProbHeldOut -----------------------------------

  test("heldout LM smooths unseen bigrams and contexts to the alpha floor") {
    import spark.implicits._
    // train: "a b" x2 -> c2(a,b)=2, c1(a)=2, V=2
    val train = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    // test doc: "a b" (seen), "b a" (unseen bigram, seen ctx b? no —
    // ctx b has no outgoing bigrams in train -> c1(b)=0)
    val test = Seq((10L, "a b"), (11L, "b a"), (12L, "z z"))
      .toDF("doc_id", "text")
    val m = TextAnalysis
      .bigramLogProbHeldOut(train, test, "doc_id", "text", alpha = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m(10L) == r6(math.log((2 + 0.5) / (2 + 0.5 * 2))))
    assert(m(11L) == r6(math.log(0.5 / (0.5 * 2))))        // both unseen
    assert(m(12L) == r6(math.log(0.5 / (0.5 * 2))))        // novel token
  }

  test("heldout LM equals self-scoring when test is a train subset") {
    import spark.implicits._
    val docs = (1 to 20)
      .map(i => (i.toLong, s"w${i % 3} w${i % 5} w${i % 3}"))
      .toDF("doc_id", "text")
    val self = TextAnalysis.bigramLogProb(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val held = TextAnalysis
      .bigramLogProbHeldOut(docs, docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(self == held)
  }

  // ---- Graph.adamicAdar ----------------------------------------------------

  test("adamicAdar scores the shared-neighbor pair and skips existing edges") {
    import spark.implicits._
    // path graph 1-3-2 plus 3-4: N(1)∩N(2) = {3}, deg(3)=3
    // pairs via center 3: (1,2),(1,4),(2,4) each 1/ln 3; none adjacent
    val edges = Seq((1, 3), (2, 3), (3, 4)).toDF("s", "d")
    val out = Graph.adamicAdar(edges, "s", "d", maxHubDegree = 10)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val w = r6(1.0 / math.log(3))
    assert(out == Map((1, 2) -> (1L, w), (1, 4) -> (1L, w),
      (2, 4) -> (1L, w)))
  }

  test("adamicAdar hub cap excludes big centers; existing edges anti-joined") {
    import spark.implicits._
    // star center 0 with leaves 1..5 (deg 5) + edge 1-2.
    // cap 4: center 0 (deg 5) never expands; centers 1,2 have deg 2
    // -> pairs via 1: (0,2); via 2: (0,1) — both are EXISTING edges.
    val edges = (1 to 5).map((0, _)) ++ Seq((1, 2))
    val out = Graph.adamicAdar(edges.toDF("s", "d"), "s", "d", 4).collect()
    assert(out.isEmpty)
    // cap 5 lets the star expand: C(5,2)=10 pairs minus existing 1-2
    val out5 = Graph.adamicAdar(edges.toDF("s", "d"), "s", "d", 5).collect()
    assert(out5.length == 9)
    assert(out5.forall(_.getDouble(3) == r6(1.0 / math.log(5))))
  }

  // ---- Profile.fkAudit -----------------------------------------------------

  test("fkAudit counts orphans and null FKs separately") {
    import spark.implicits._
    val child = Seq(Some(1), Some(2), Some(99), None).toDF("fk")
    val parent = Seq(1, 2, 3).toDF("pk")
    val r = Profile.fkAudit(Seq(("c->p", child, "fk", parent, "pk")))
      .collect()(0)
    assert(r.getString(0) == "c->p")
    assert(r.getLong(1) == 4 && r.getLong(2) == 1 && r.getLong(3) == 1)
    assert(r.getDouble(4) == 0.25)
  }

  test("fkAudit duplicate parent keys do not inflate row counts") {
    import spark.implicits._
    val child = Seq(1, 1, 2).toDF("fk")
    val parent = Seq(1, 1, 1, 2).toDF("pk") // dup PKs
    val r = Profile.fkAudit(Seq(("c->p", child, "fk", parent, "pk")))
      .collect()(0)
    assert(r.getLong(1) == 3 && r.getLong(3) == 0)
  }
}
