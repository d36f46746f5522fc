package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Dedup

/** Exact-substring (repeated-span) dedup: planted spans are recovered
  * with exact boundaries, within-document repeats count, unique text
  * yields nothing, and the rolling window hash is shift-invariant.
  */
class SubstringDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private def spans(docs: Seq[(Long, String)], k: Int = 8): Set[(Long, Int, Int, Int)] = {
    import spark.implicits._
    Dedup.duplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
  }

  test("tokenization matches split(trim(text), \\s+) on tabs/newlines exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // leading tab and trailing newline: SQL trim strips neither, so the
    // token array gains empty-string tokens at both ends — the window
    // hashes must align with THAT array, or verify-side gram slicing
    // desyncs (Java's String.trim/split would eat them)
    val texts = Seq("\ta0 a1 a2 a3 a4 a5 a6 a7 a8\n", "b0 b1  b2\rb3 b4 b5 b6 b7 b8")
    val df = texts.toDF("text").select(
      size(graft.operators.TextAnalysis.tokens($"text")).as("nt"),
      size(graft.functions.Functions.token_window_hashes($"text", 8)).as("nw"))
    df.collect().foreach(r => assert(r.getInt(1) == r.getInt(0) - 7,
      s"windows ${r.getInt(1)} != tokens ${r.getInt(0)} - 7"))
    // and spans still land exactly on a whitespace-noisy planted repeat
    val shared = (0 until 10).map(i => s"dup$i").mkString(" ")
    val spansGot = spans(Seq((1L, "\t" + shared), (2L, shared + "\n")))
    // doc 1 tokens: ["", dup0..dup9] -> run at positions 1..10; doc 2:
    // [dup0..dup9, ""] -> run at 0..9; shared 8-token windows are the 3
    // fully inside dup0..dup9 on each side
    assert(spansGot == Set((1L, 1, 10, 3), (2L, 0, 10, 3)), spansGot)
  }

  test("a planted cross-document run is recovered with exact boundaries") {
    // unique filler words around one shared 10-token run: the run's
    // 10 − 8 + 1 = 3 windows are duplicated, nothing else is
    val shared = (0 until 10).map(i => s"dup$i").mkString(" ")
    val a = ((0 until 20).map(i => s"a$i") :+ shared).mkString(" ")
    val b = (shared +: (0 until 20).map(i => s"b$i")).mkString(" ")
    assert(spans(Seq((1L, a), (2L, b))) ==
      Set((1L, 20, 10, 3), (2L, 0, 10, 3)))
  }

  test("a WITHIN-document repeat is a duplicated span too") {
    val run = (0 until 8).map(i => s"r$i").mkString(" ")
    val doc = (Seq(run) ++ (0 until 10).map(i => s"m$i") ++ Seq(run)).mkString(" ")
    // the 8-token run sits at positions 0 and 18; each occurrence is its
    // own maximal single-window span
    assert(spans(Seq((1L, doc))) == Set((1L, 0, 8, 1), (1L, 18, 8, 1)))
  }

  test("an all-unique corpus has no repeated spans") {
    val docs = Seq(
      (1L, (0 until 30).map(i => s"u$i").mkString(" ")),
      (2L, (0 until 30).map(i => s"v$i").mkString(" ")))
    assert(spans(docs).isEmpty)
  }

  test("identical documents surface as one full-length span each") {
    val t = (0 until 12).map(i => s"w$i").mkString(" ")
    assert(spans(Seq((1L, t), (2L, t))) ==
      Set((1L, 0, 12, 5), (2L, 0, 12, 5)))
  }

  test("documents shorter than the window produce nothing") {
    assert(spans(Seq((1L, "a b c"), (2L, "a b c"))).isEmpty)
  }

  test("rolling window hashes equal hashes of each window in isolation") {
    import spark.implicits._
    import graft.functions.Functions.token_window_hashes
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val k = 4
    val rolled = Seq(text).toDF("t")
      .select(token_window_hashes($"t", k)).head.getSeq[Long](0)
    val words = text.split("\\s+")
    val isolated = words.sliding(k).map { w =>
      Seq(w.mkString(" ")).toDF("t")
        .select(token_window_hashes($"t", k)).head.getSeq[Long](0).head
    }.toSeq
    // shift-invariance: the incremental update never drifts from the
    // from-scratch polynomial of the same k tokens
    assert(rolled == isolated)
    // and the repeated window ("the" at positions 0 and 6 starts
    // different windows — but "again and again" has no 4-window repeat,
    // so all 9 hashes are distinct here)
    assert(rolled.distinct.size == rolled.size)
  }
}
