package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.Functions._
import graft.operators.{Dedup, TextAnalysis}

class FunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private def vecs = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(2.0f, 0.0f, 0.0f)),
      (3L, Array(1.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
  }

  test("cosine_similarity: identity, orthogonality, scale invariance") {
    import spark.implicits._
    val crossed = vecs.as("a").crossJoin(vecs.as("b"))
      .select($"a.vec_id".as("i"), $"b.vec_id".as("j"),
        cosine_similarity($"a.embedding", $"b.embedding").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(crossed((0L, 0L)) - 1.0) < 1e-12)
    assert(math.abs(crossed((0L, 1L))) < 1e-12)
    assert(math.abs(crossed((0L, 2L)) - 1.0) < 1e-12) // scale-invariant
    assert(math.abs(crossed((0L, 3L)) - math.sqrt(0.5)) < 1e-12)
  }

  test("simhash64 token hash matches an independent BigInt fmix64(poly257) model") {
    // The q31 oracle recomputes this hash in DuckDB SQL; this pins the
    // Scala side to the same closed form via arbitrary-precision
    // arithmetic (no Long wrapping shortcuts shared with the impl).
    val mask = (BigInt(1) << 64) - 1
    def model(s: String): Long = {
      val m = (BigInt(1) << 61) - 1
      var h = BigInt(0)
      s.getBytes("UTF-8").foreach { b => h = (h * 257 + (b & 0xff)) % m }
      var x = h
      x = x ^ (x >> 33); x = (x * BigInt("ff51afd7ed558ccd", 16)) & mask
      x = x ^ (x >> 33); x = (x * BigInt("c4ceb9fe1a85ec53", 16)) & mask
      x = x ^ (x >> 33)
      x.toLong
    }
    for (w <- Seq("hello", "a", "", "the-quick", "x" * 50, "Zq9!", "123456789"))
      assert(graft.functions.SimHash64.tokenHash(w.getBytes("UTF-8")) == model(w), w)
  }

  test("simhash64 is deterministic and identical for identical token sets") {
    import spark.implicits._
    val df = Seq(
      (0L, "the quick brown fox"),
      (1L, "the quick brown fox"),
      (2L, "a completely different document with other words entirely")
    ).toDF("id", "text")
      .select($"id", simhash64(TextAnalysis.tokens($"text")).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(0L) == m(1L))
    assert(m(0L) != m(2L))
  }

  test("rolling_hash and winnow_fingerprint are stable and shift-sensitive") {
    import spark.implicits._
    val df = Seq((0L, "abcdefghij"), (1L, "abcdefghij"), (2L, "abcdefghik"))
      .toDF("id", "text")
      .select($"id", rolling_hash($"text").as("rh"),
        size(winnow_fingerprint($"text", k = 3, w = 2)).as("nw"))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows(0)._2 == rows(1)._2)
    assert(rows(0)._2 != rows(2)._2)
    assert(rows.forall(_._3 > 0))
  }

  test("hyperplane_signature buckets identical vectors together") {
    import spark.implicits._
    val df = vecs.select($"vec_id", hyperplane_signature($"embedding", 16).as("sig"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(0L) == m(2L)) // same direction, different magnitude
    assert(m.values.forall(s => s >= 0 && s < (1L << 16)))
  }

  test("word shingles and jaccard edge cases") {
    import spark.implicits._
    val df = Seq((0L, "a b c d"), (1L, "a b"), (2L, "a b c d"))
      .toDF("id", "text")
      .select($"id", TextAnalysis.shingleSet($"text", 3).as("s"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(0L) == Seq("a b c", "b c d"))
    assert(m(1L).isEmpty) // shorter than n
    val j = df.as("x").join(df.as("y"), $"x.id" < $"y.id")
      .select($"x.id", $"y.id", TextAnalysis.jaccard($"x.s", $"y.s").as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((0L, 2L)) == 1.0)
  }

  test("minhash LSH finds exact-duplicate documents") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of 0
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "totally unrelated words appear in this document here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minHashNearDupPairs(docs, "doc_id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((0L, 1L)))
  }
}
