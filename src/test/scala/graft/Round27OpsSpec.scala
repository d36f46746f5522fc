package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Profile, Similarity}

/** Round-6 nineteenth-wave operators: expectations, MMR. */
class Round27OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  test("expectations counts each rule's violations in one scan") {
    import spark.implicits._
    val df = Seq((1L, 5.0), (2L, -1.0), (3L, 200.0), (4L, -7.0))
      .toDF("id", "v")
    val r = Profile.expectations(df, Seq(
        "nonneg" -> ($"v" < 0), "upper" -> ($"v" > 100)))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r("nonneg") == ((2L, 0.5)))
    assert(r("upper") == ((1L, 0.25)))
  }

  test("uniquenessViolations counts ALL rows of duplicated keys") {
    import spark.implicits._
    val df = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("k")
    val r = Profile.uniquenessViolations(df, "k").collect()(0)
    assert(r.getString(0) == "unique_k")
    assert(r.getLong(1) == 5) // 2x'2' + 3x'3'
    val clean = Seq(1L, 2L, 3L).toDF("k")
    assert(Profile.uniquenessViolations(clean, "k")
      .collect()(0).getLong(1) == 0)
  }

  test("mmrRerank skips the near-duplicate the plain ranking would keep") {
    import spark.implicits._
    // candidates: a1 and a2 identical (sim .9), b orthogonal (sim .8).
    // plain top-2 = a1, a2; MMR(lambda .7) picks a1 then b:
    //   a2 score = .7*.9 - .3*1.0 = .33 < b = .7*.8 - .3*0 = .56
    val cands = Seq(
      (1L, 10L, 0.9, Seq(1.0f, 0.0f)),
      (1L, 11L, 0.9, Seq(1.0f, 0.0f)),
      (1L, 12L, 0.8, Seq(0.0f, 1.0f)))
      .toDF("probe_id", "vec_id", "sim", "embedding")
    val picks = Similarity.mmrRerank(cands, k = 2, lambda = 0.7)
      .orderBy($"rank").collect().map(_.getLong(2)).toSeq
    assert(picks == Seq(10L, 12L))
  }

  test("mmrRerank rank 1 is always the raw-relevance top candidate") {
    import spark.implicits._
    val cands = Seq(
      (1L, 20L, 0.5, Seq(1.0f, 0.0f)),
      (1L, 21L, 0.7, Seq(0.5f, 0.5f)),
      (1L, 22L, 0.6, Seq(0.0f, 1.0f)))
      .toDF("probe_id", "vec_id", "sim", "embedding")
    val first = Similarity.mmrRerank(cands, k = 3, lambda = 0.7)
      .filter($"rank" === 1).collect()(0)
    assert(first.getLong(2) == 21L)
    // mmr_score ships unrounded: rank-1 score is exactly λ·rel
    assert(first.getDouble(4) == 0.7 * 0.7)
  }
}
