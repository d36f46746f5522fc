package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Decontaminate, Hierarchy}

/** Round-6 fifth-wave operators: pointer-doubling hierarchy resolution
  * and semantic decontamination. */
class HierarchySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  test("resolveRoots walks a chain to its root with exact depths") {
    import spark.implicits._
    // 5 -> 4 -> 3 -> 2 -> 1, root 1 (parent outside the node set)
    val e = Seq((5, 4), (4, 3), (3, 2), (2, 1), (1, 0)).toDF("c", "p")
    val out = Hierarchy.resolveRoots(e, "c", "p", maxDepth = 8)
      .collect().map(r => r.getInt(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out == Map(1 -> (1, 0L), 2 -> (1, 1L), 3 -> (1, 2L),
      4 -> (1, 3L), 5 -> (1, 4L)))
  }

  test("resolveRoots handles self-parent roots, null parents, and forests") {
    import spark.implicits._
    val e = Seq((1, Some(1)), (2, Some(1)), (3, Some(2)),  // tree at 1
      (10, None), (11, Some(10)))                          // tree at 10
      .toDF("c", "p")
    val out = Hierarchy.resolveRoots(e, "c", "p", maxDepth = 4)
      .collect().map(r => r.getInt(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out == Map(1 -> (1, 0L), 2 -> (1, 1L), 3 -> (1, 2L),
      10 -> (10, 0L), 11 -> (10, 1L)))
  }

  test("resolveRoots fails loudly on cycles and on exceeded maxDepth") {
    import spark.implicits._
    val cyc = Seq((1, 2), (2, 1)).toDF("c", "p")
    assertThrows[IllegalArgumentException] {
      Hierarchy.resolveRoots(cyc, "c", "p", maxDepth = 4).collect()
    }
    // a 20-deep chain declared maxDepth=4 must refuse, not truncate
    val deep = (1 to 20).map(i => (i, i - 1)).toDF("c", "p")
    assertThrows[IllegalArgumentException] {
      Hierarchy.resolveRoots(deep, "c", "p", maxDepth = 4).collect()
    }
    // and resolve fine with an honest bound
    val ok = Hierarchy.resolveRoots(deep, "c", "p", maxDepth = 32)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(ok(20) == 19L && ok(1) == 0L)
  }

  test("resolveRoots is partitioning-invariant") {
    import spark.implicits._
    val e = (2 to 300).map(i => (i, i / 2)).toDF("c", "p")
    val a = Hierarchy.resolveRoots(e, "c", "p", 16).collect()
      .map(_.toSeq).toSet
    val b = Hierarchy.resolveRoots(e.repartition(13), "c", "p", 16)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("semanticContamination flags nearest eval match above threshold") {
    import spark.implicits._
    val corpus = Seq((100L, Seq(1f, 0f)), (101L, Seq(0f, 1f)),
      (102L, Seq(-1f, 0f))).toDF("vec_id", "embedding")
    val eval = Seq((1L, Seq(1f, 0.1f)), (2L, Seq(1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Decontaminate
      .semanticContamination(corpus, eval, "vec_id", "embedding", 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 100 matches eval 2 exactly (sim 1.0 beats eval 1); 101 is near-
    // orthogonal to both; 102 anti-parallel
    assert(out == Map(100L -> 2L))
  }
}
