package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.Shims
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Dedup, Graph}

/** Cache-hygiene regression guard (round-10): no operator may RETURN
  * with a `cache()`/`persist()` still pinned in the CacheManager — a
  * pinned artifact survives the call for the rest of the session,
  * holding executor memory/disk across every later query (the katz
  * leak of the round-9 advice, found again in triangleStats /
  * adamicAdar / linkPredictionScores / minHashNearDupPairs / the
  * returned pageRank+HITS frames in round 10). GC-lifetime
  * localCheckpoints do NOT register in the CacheManager, so the
  * approved discipline passes this probe untouched.
  */
class CacheHygieneSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private def edges = {
    import spark.implicits._
    (1L to 400L).map(i => (i % 37, (i * 13) % 37))
      .filter(e => e._1 != e._2).toDF("s", "t")
  }

  private def assertClean(name: String)(run: => Unit): Unit = {
    spark.catalog.clearCache() // isolate from any prior suite state
    assert(Shims.cacheManagerEmpty(spark), s"$name: dirty before the call")
    run
    assert(Shims.cacheManagerEmpty(spark),
      s"$name returned with a pinned cache/persist in the CacheManager")
  }

  test("graph operators release every cached artifact before returning") {
    assertClean("pageRank") {
      assert(Graph.pageRank(edges, "s", "t", iterations = 4).count() > 0)
    }
    assertClean("hits") {
      assert(Graph.hits(edges, "s", "t", iterations = 2).count() > 0)
    }
    assertClean("katzCentrality") {
      assert(Graph.katzCentrality(edges, "s", "t", 3, 0.2).count() > 0)
    }
    assertClean("triangleStats") {
      assert(Graph.triangleStats(edges, "s", "t").count() == 1)
    }
    assertClean("adamicAdar") {
      assert(Graph.adamicAdar(edges, "s", "t", maxHubDegree = 20).count() > 0)
    }
    assertClean("linkPredictionScores") {
      assert(Graph.linkPredictionScores(edges, "s", "t",
        maxHubDegree = 20).count() > 0)
    }
    assertClean("kCore") {
      assert(Graph.kCore(edges, "s", "t", k = 2).count() >= 0)
    }
  }

  test("minHashNearDupPairs releases the shingle-set artifact") {
    import spark.implicits._
    val docs = (1 to 60).map { i =>
      val base = (1 to 40).map(j => s"w${(i % 5) * 50 + j}").mkString(" ")
      (i.toLong, base)
    }.toDF("id", "text")
    assertClean("minHashNearDupPairs") {
      assert(Dedup.minHashNearDupPairs(docs, "id", "text",
        threshold = 0.5).count() >= 0)
    }
  }
}
