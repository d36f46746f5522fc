package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Decontaminate, TextAnalysis}

class DecontaminateSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta gamma delta epsilon"),     // shares "alpha beta gamma" + "beta gamma delta"
      (2L, "one two three four five six"),        // clean
      (3L, "alpha beta gamma zeta"),              // shares "alpha beta gamma" only
      (4L, "short doc"),                          // fewer than n words: no grams
      (5L, "beta gamma delta something else here") // shares "beta gamma delta" only
    ).toDF("doc_id", "text")
  }

  private def eval = {
    import spark.implicits._
    Seq((100L, "alpha beta gamma delta question answer")).toDF("doc_id", "text")
  }

  test("contaminationStats counts distinct overlapping grams per doc") {
    val stats = Decontaminate.contaminationStats(corpus, eval, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stats == Map(1L -> 2L, 3L -> 1L, 5L -> 1L))
  }

  test("removeContaminated drops flagged docs and keeps the rest intact") {
    val kept = Decontaminate.removeContaminated(corpus, eval, "doc_id", "text",
      minHits = 2L).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L, 5L)) // only doc 1 reaches 2 hits
    val keptAll = Decontaminate.removeContaminated(corpus, eval, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptAll == Set(2L, 4L)) // any overlap drops at the default threshold
  }

  test("redactPii scrubs every email and phone occurrence") {
    import spark.implicits._
    val msg = "Mail a.b-c_d@sub.example.org or x@y.io, call 25-989-741-2988 " +
      "then 123-456-789-0123; order #99-123 stays."
    val out = Seq(msg).toDF("t")
      .select(TextAnalysis.redactPii(col("t")).as("r"),
        TextAnalysis.piiCount(col("t"), TextAnalysis.emailPattern).as("ne"),
        TextAnalysis.piiCount(col("t"), TextAnalysis.phonePattern).as("np"))
      .head()
    assert(out.getString(0) ==
      "Mail <EMAIL> or <EMAIL>, call <PHONE> then <PHONE>; order #99-123 stays.")
    assert(out.getInt(1) == 2 && out.getInt(2) == 2)
  }
}
