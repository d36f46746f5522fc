package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Dedup

/** PPJoin prefix filtering: exact-result equivalence with the full
  * inverted join, on real fixture text. */
class PpJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)
  private val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("ppJoinPairs equals shingleJaccardPairs exactly at t = 1/2") {
    val full = Dedup.shingleJaccardPairs(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val pp = Dedup.ppJoinPairs(docs, "doc_id", "text", 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(pp == full)
    assert(full.nonEmpty) // the fixture plants near-dups; a vacuous
                          // equality would prove nothing
  }

  test("ppJoinPairs equals the full join at a higher threshold too") {
    val full = Dedup.shingleJaccardPairs(docs, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pp = Dedup.ppJoinPairs(docs, "doc_id", "text", 4, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pp == full)
  }

  test("the prefix index is a small fraction of the full postings") {
    import org.apache.spark.sql.functions._
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
    val fullPostings = sets
      .select(explode(col("shingles"))).count()
    // t = 4/5 keeps prefixes of ~n/5 + 1 tokens
    val prefixLen = sets.select(size(col("shingles")).as("n"))
      .select(sum(col("n") - expr("(n * 4 + 4) div 5") + 1)).collect()(0)
      .getLong(0)
    assert(prefixLen * 3 < fullPostings,
      s"prefix $prefixLen vs full $fullPostings — filter buys nothing")
  }

  test("hand case: disjoint prefixes at t=1/2 are never candidates") {
    import spark.implicits._
    // two 4-shingle docs sharing only their 2 most-frequent shingles:
    // J = 2/6 = 0.33 < 0.5 and the prefix (rarest 3) is disjoint
    val df = Seq(
      (1L, "x x x a1 a2 common1 common2"),
      (2L, "y y y b1 b2 common1 common2")).toDF("doc_id", "text")
    assert(Dedup.ppJoinPairs(df, "doc_id", "text", 1, 2).count() == 0)
  }
}
