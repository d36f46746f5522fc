package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Dedup

class ConnectedComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private def edgesDf = {
    import spark.implicits._
    // three 11-node chains (diameter 10) plus a bridge merging two of them
    val chains = for (c <- 0 until 3; j <- 0 until 10)
      yield (c * 1000L + j, c * 1000L + j + 1)
    (chains :+ (5L, 1005L)).toDF("a", "b")
  }

  test("driver union-find and distributed propagation agree") {
    val viaDriver = Dedup.connectedComponents(edgesDf, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaSpark = Dedup.connectedComponentsDistributed(edgesDf, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaDriver == viaSpark)
    assert(viaDriver.nonEmpty)
  }

  test("components are min-id labelled and transitive across the bridge") {
    val labels = Dedup.connectedComponents(edgesDf, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // chain 0 (0..30 step includes bridge to chain 1) all share min id 0
    assert(labels(0L) == 0L && labels(1005L) == 0L && labels(5L) == 0L)
    // chain 2 stays separate with min id 2000
    assert(labels(2000L) == 2000L && labels(2010L) == 2000L)
  }

  test("distributed path is forced above the driver-edge threshold") {
    val viaSpark = Dedup.connectedComponents(edgesDf, "a", "b", maxDriverEdges = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaDriver = Dedup.connectedComponents(edgesDf, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSpark == viaDriver)
  }
}
