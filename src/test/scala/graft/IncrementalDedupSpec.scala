package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Dedup, Mixing}

class IncrementalDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  // 40 distinct docs + near-dup copies of some, split so dups straddle
  // the corpus/new-batch boundary
  private def docs = {
    import spark.implicits._
    val base = (0 until 40).map { i =>
      (i.toLong, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g w${i}h")
    }
    // near-dups of docs 3, 7, 11: same text with one word changed
    val dups = Seq(3L, 7L, 11L).map { i =>
      (1000L + i, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g CHANGED")
    }
    (base ++ dups).toDF("doc_id", "text")
  }

  test("incremental pairs equal the batch pipeline's cross-set pairs") {
    val corpus = docs.filter(col("doc_id") < 1000)
    val fresh = docs.filter(col("doc_id") >= 1000)
    val inc = Dedup.incrementalNearDupPairs(
        Dedup.bandedSignatures(corpus, "doc_id", "text"), corpus, fresh,
        "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // full-batch pairs over the union, restricted to cross-set (batch
    // emits a_id < b_id, and corpus ids here are all < fresh ids)
    val full = Dedup.minHashNearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .filter(col("a_id") < 1000 && col("b_id") >= 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == full)
    assert(inc == Set((3L, 1003L), (7L, 1007L), (11L, 1011L)))
  }

  test("splitByHash is exhaustive, disjoint, and deterministic") {
    import spark.implicits._
    val ids = (0L until 2000L).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val once = Mixing.splitByHash(ids, "id", "split", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(once.size == 2000) // every row assigned exactly one split
    assert(once.values.toSet == Set("train", "val", "test"))
    val again = Mixing.splitByHash(ids, "id", "split", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(once == again)
    val frac = once.values.count(_ == "train") / 2000.0
    assert(frac > 0.75 && frac < 0.85, s"train fraction off: $frac")
  }
}
