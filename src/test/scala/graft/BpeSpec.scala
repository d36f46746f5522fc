package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Bpe

/** BPE training + encoding contract (q114 is rows-only — the learned
  * merge table is a data-dependent artifact, so this spec is its
  * correctness gate): merges match the hand-computed sequence on the
  * classic corpus, encoding applies them greedily by rank, unseen words
  * fall back to characters, and training is partitioning-invariant.
  */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  // the Sennrich et al. running example: low*5 lower*2 newest*6 widest*3
  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, ("low " * 5).trim),
      (2L, ("lower " * 2).trim),
      (3L, ("newest " * 6).trim),
      (4L, ("widest " * 3).trim)).toDF("doc_id", "text")
  }

  test("merges match the hand-computed sequence on the classic corpus") {
    // pair counts: (e,s)=(s,t)=(t,</w>)=9 tie -> lexicographic picks
    // (e,s); then (es,t); then (est,</w>); then (l,o)=(o,w)=7 -> (l,o);
    // then (lo,w)
    val merges = Bpe.train(corpus, "doc_id", "text", numMerges = 5)
    assert(merges == Seq("e" -> "s", "es" -> "t", "est" -> "</w>",
      "l" -> "o", "lo" -> "w"))
  }

  test("encoding applies merges greedily by rank; unseen words fall back to chars") {
    import spark.implicits._
    val merges = Bpe.train(corpus, "doc_id", "text", numMerges = 5)
    val got = Seq((1L, "lowest low wide"), (2L, ""), (3L, "  "))
      .toDF("id", "t")
      .select($"id", Bpe.encode($"t", merges).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    // "lowest": l o w e s t</w> -> es -> est -> est</w> -> lo -> low
    assert(got(1L) == List("low", "est</w>", "low", "</w>",
      "w", "i", "d", "e", "</w>"))
    assert(got(2L) == Nil && got(3L) == Nil)
  }

  test("training is deterministic across partitionings and early-stops when dry") {
    val one = Bpe.train(corpus.coalesce(1), "doc_id", "text", 50)
    val many = Bpe.train(corpus.repartition(7), "doc_id", "text", 50)
    assert(one == many)
    // 50 requested but the corpus runs out of repeating pairs first
    assert(one.size < 50 && one.size >= 5, s"got ${one.size} merges")
  }

  test("trainAndEncode reconstructs every document's characters in order") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // lossless: concatenating a doc's pieces (marker stripped) must
    // reproduce its whitespace-normalized text
    val enc = Bpe.trainAndEncode(corpus, "doc_id", "text", numMerges = 8)
    val joined = enc.select($"doc_id",
        regexp_replace(concat_ws("", $"pieces"), "</w>", " ").as("rt"))
      .collect().map(r => r.getLong(0) -> r.getString(1).trim).toMap
    val want = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(joined == want)
  }
}
