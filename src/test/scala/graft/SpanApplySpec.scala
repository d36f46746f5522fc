package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Dedup

/** The substring-dedup APPLY: canonical-first-occurrence removal
  * semantics on planted corpora. */
class SpanApplySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private val k = 4

  private def run(rows: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    Dedup.removeDuplicatedSpans(rows.toDF("doc_id", "text"), "doc_id",
        "text", k)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
  }

  test("a duplicated span survives only in its first (doc, pos) home") {
    val span = "d1 d2 d3 d4"
    val rows = Seq(
      1L -> s"u1 u2 $span u3 u4",
      2L -> s"v1 v2 v3 $span v4")
    val out = run(rows)
    assert(out(1L) == ((8L, 0L, s"u1 u2 $span u3 u4")))
    assert(out(2L) == ((8L, 4L, "v1 v2 v3 v4")))
  }

  test("an exact duplicate document is fully emptied") {
    val text = "a b c d e f"
    val out = run(Seq(1L -> text, 2L -> text))
    assert(out(1L) == ((6L, 0L, text)))
    assert(out(2L) == ((6L, 6L, "")))
  }

  test("a unique corpus is untouched; short docs have no windows") {
    val out = run(Seq(1L -> "q w e r t y", 2L -> "z x c", 3L -> "m n b v k j"))
    assert(out(1L)._2 == 0 && out(2L)._2 == 0 && out(3L)._2 == 0)
    assert(out(1L)._3 == "q w e r t y" && out(2L)._3 == "z x c")
  }

  test("within-doc repetition keeps only the first occurrence") {
    val out = run(Seq(1L -> "r1 r2 r3 r4 mid r1 r2 r3 r4"))
    assert(out(1L) == ((9L, 4L, "r1 r2 r3 r4 mid")))
  }

  test("overlapping removals cover the union of their positions") {
    // doc2 repeats a 5-token run: two overlapping 4-windows both map to
    // doc1's canonicals; removal covers all 5 tokens
    val run5 = "s1 s2 s3 s4 s5"
    val out = run(Seq(1L -> s"$run5 tail1 tail2",
      2L -> s"head1 head2 $run5"))
    assert(out(2L) == ((7L, 5L, "head1 head2")))
  }

  test("partitioning-invariant (canonical choice is data-determined)") {
    import spark.implicits._
    val rows = (1L to 40L).map(i =>
      (i, if (i % 7 == 0) "p q r s t u v w" else s"a$i b$i p q r s c$i"))
    val df = rows.toDF("doc_id", "text")
    val a = Dedup.removeDuplicatedSpans(df.repartition(1), "doc_id", "text", k)
      .orderBy("id").collect().toSeq
    val b = Dedup.removeDuplicatedSpans(df.repartition(13), "doc_id", "text", k)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}
