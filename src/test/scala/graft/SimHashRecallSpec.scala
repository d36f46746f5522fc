package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Dedup, TextAnalysis}
import graft.functions.Functions.simhash64
import graft.sources.Tables

/** The SimHash banding claims to be EXACT for its radius (pigeonhole over
  * `maxHamming + 1` chunks) — this spec proves it by comparing the banded
  * self-join against brute-force all-pairs `bit_count(a ^ b)` on the
  * fixture documents, for a radius below, at, and above the old 4-chunk
  * layout's limit. Set equality, not recall ≥ x: banding must lose
  * nothing and the verify filter must admit nothing extra. */
class SimHashRecallSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private def bruteForce(radius: Int): Set[(Long, Long, Long)] = {
    val sh = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").as("id"), simhash64(TextAnalysis.tokens(col("text"))).as("sh"))
    sh.as("a").join(sh.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .filter(col("hamming") <= radius)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
  }

  private def banded(radius: Int): Set[(Long, Long, Long)] =
    Dedup.simHashNearDupPairs(
        Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text", radius)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet

  for (radius <- Seq(3, 8, 12)) {
    test(s"banded pairs equal brute-force all-pairs at Hamming radius $radius") {
      val exact = bruteForce(radius)
      val got = banded(radius)
      assert(got == exact,
        s"missing=${(exact -- got).take(5)} extra=${(got -- exact).take(5)} " +
          s"(|exact|=${exact.size}, |banded|=${got.size})")
      if (radius == 12)
        assert(exact.nonEmpty, "fixture produced no near pairs — test is vacuous")
    }
  }

  test("radius beyond the supported band layout is rejected") {
    intercept[IllegalArgumentException] {
      Dedup.simHashNearDupPairs(
        Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text", 16)
    }
  }
}
