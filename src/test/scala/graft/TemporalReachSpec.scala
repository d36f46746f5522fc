package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Graph

/** Time-respecting reachability: the causal-order semantics static
  * reachability over-counts. */
class TemporalReachSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private def reach(edges: Seq[(String, String, Long)], seed: String,
      hops: Int): Map[String, Option[Long]] = {
    import spark.implicits._
    Graph.temporalEarliestArrival(edges.toDF("s", "d", "t"), "s", "d",
        "t", Seq(seed).toDF("node"), "node", hops)
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
  }

  test("a time-decreasing path is NOT traversable (causality)") {
    // a→b at t=5, b→c at t=3: static reach says c, temporal says no
    val out = reach(Seq(("a", "b", 5L), ("b", "c", 3L)), "a", 3)
    assert(out.keySet == Set("a", "b"))
    assert(out("b") == Some(5L))
  }

  test("strictly-later edges chain and earliest arrival wins") {
    val out = reach(Seq(("a", "b", 2L), ("a", "b", 7L), ("b", "c", 5L)),
      "a", 2)
    // arrive b at 2 (earliest), then b→c at 5 > 2
    assert(out("b") == Some(2L) && out("c") == Some(5L))
  }

  test("same-timestamp hop is rejected (strict inequality)") {
    val out = reach(Seq(("a", "b", 4L), ("b", "c", 4L)), "a", 2)
    assert(!out.contains("c"))
  }

  test("hop budget bounds the walk; seeds report null arrival") {
    val out1 = reach(Seq(("a", "b", 1L), ("b", "c", 2L)), "a", 1)
    assert(out1.keySet == Set("a", "b"))
    assert(out1("a").isEmpty)
    val out2 = reach(Seq(("a", "b", 1L), ("b", "c", 2L)), "a", 2)
    assert(out2("c") == Some(2L))
  }

  test("earliest arrival dominates: a later arrival never unlocks more") {
    // two routes to b: t=3 and t=1; c needs an edge at t=2 — only the
    // t=1 arrival admits it, and the frontier must keep it
    val out = reach(Seq(("a", "b", 3L), ("a", "b", 1L), ("b", "c", 2L)),
      "a", 2)
    assert(out("b") == Some(1L) && out("c") == Some(2L))
  }
}
