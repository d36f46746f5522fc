package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Metrics, Retrieval}

/** Round-5 fourth-wave operators: BM25 scoring, ranking metrics,
  * per-group exact AUC, chi-squared token-label association. */
class Round8OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  // ---- rankingMetrics ------------------------------------------------------

  test("rankingMetrics matches the hand-computed NDCG/MRR/P@k") {
    import spark.implicits._
    val run = Seq(
      ("q", "A", 3.0, 1.0), ("q", "B", 2.0, 0.0), ("q", "C", 1.0, 1.0)
    ).toDF("query", "doc", "score", "rel")
    val r = Metrics.rankingMetrics(run, "query", "doc", "score", "rel", 2)
      .collect()(0)
    assert(r.getLong(1) == 2L) // n_rel
    assert(r.getDouble(2) == 1.0) // mrr: first hit at rank 1
    assert(r.getDouble(3) == 0.5) // precision@2: 1 of 2
    // DCG@2 = 1/log2(2) = 1; IDCG@2 = 1/log2(2) + 1/log2(3)
    val idcg = 1.0 + 1.0 / (math.log(3) / math.log(2))
    assert(math.abs(r.getDouble(4) - BigDecimal(1.0 / idcg)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("rankingMetrics keeps queries with no relevant candidate as zeros") {
    import spark.implicits._
    val run = Seq(("q", "A", 3.0, 1.0), ("z", "A", 3.0, 0.0), ("z", "B", 2.0, 0.0))
      .toDF("query", "doc", "score", "rel")
    val out = Metrics.rankingMetrics(run, "query", "doc", "score", "rel", 5)
      .orderBy("query").collect()
    assert(out.length == 2)
    val z = out(1)
    assert(z.getString(0) == "z" && z.getLong(1) == 0L &&
      z.getDouble(2) == 0.0 && z.getDouble(3) == 0.0 && z.getDouble(4) == 0.0)
  }

  test("rankingMetrics runs on ONE exchange (both windows + agg share it)") {
    import spark.implicits._
    val run = (1 to 300).map(i => (s"q${i % 7}", i, (i * 37 % 100).toDouble,
      (i % 3).toDouble)).toDF("query", "doc", "score", "rel")
    val plan = Metrics.rankingMetrics(run, "query", "doc", "score", "rel", 10)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one hash exchange, plan:\n$plan")
  }

  test("rankingMetrics is partitioning-invariant") {
    import spark.implicits._
    val run = (1 to 500).map(i => (s"q${i % 9}", i, (i * 41 % 83).toDouble,
      (i % 4 min 1).toDouble)).toDF("query", "doc", "score", "rel")
    val a = Metrics.rankingMetrics(run, "query", "doc", "score", "rel", 10)
      .collect().toSet
    val b = Metrics.rankingMetrics(run.repartition(13), "query", "doc",
      "score", "rel", 10).collect().toSet
    assert(a == b && a.size == 9)
  }

  // ---- aucByGroup ----------------------------------------------------------

  test("aucByGroup: separable=1, anti=0, tie=0.5, mixed hand-value") {
    import spark.implicits._
    val df = Seq(
      // perfect: positives above all negatives
      ("a", 1, 0.9), ("a", 1, 0.8), ("a", 0, 0.2), ("a", 0, 0.1),
      // single tied pair: AUC = 1/2 by the average-rank convention
      ("b", 1, 0.5), ("b", 0, 0.5),
      // mixed with a tie: pairs (1v1 tie=.5, 1v3=0, 2v1=1, 2v3=0) -> 0.375
      ("c", 1, 1.0), ("c", 1, 2.0), ("c", 0, 1.0), ("c", 0, 3.0),
      // one-class group must be dropped
      ("d", 1, 0.7), ("d", 1, 0.3)
    ).toDF("g", "y", "score")
    val out = Metrics.aucByGroup(df, "g", "y", "score")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(3)))
    assert(out.toSeq == Seq(("a", 1.0), ("b", 0.5), ("c", 0.375)))
  }

  test("aucByGroup inverts when the score flips sign") {
    import spark.implicits._
    val df = (1 to 200).map(i => ("g", i % 2, i * 0.5 * (i % 2 * 2 - 1)))
      .toDF("g", "y", "score")
    val auc = Metrics.aucByGroup(df, "g", "y", "score").collect()(0).getDouble(3)
    val flipped = Metrics.aucByGroup(
      df.withColumn("score", org.apache.spark.sql.functions.negate(
        org.apache.spark.sql.functions.col("score"))), "g", "y", "score")
      .collect()(0).getDouble(3)
    assert(auc == 1.0 && flipped == 0.0)
  }

  test("aucByGroup is partitioning-invariant") {
    import spark.implicits._
    val df = (1 to 400).map(i => (s"g${i % 5}", i % 2, (i * 7 % 13).toDouble))
      .toDF("g", "y", "score")
    val a = Metrics.aucByGroup(df, "g", "y", "score").collect().toSet
    val b = Metrics.aucByGroup(df.repartition(17), "g", "y", "score")
      .collect().toSet
    assert(a == b && a.size == 5)
  }

  // ---- bm25 ----------------------------------------------------------------

  test("bm25 matches the hand-computed Okapi score") {
    import spark.implicits._
    val docs = Seq((1L, "x x y"), (2L, "y z")).toDF("id", "text")
    val q = Seq((1L, "x")).toDF("qid", "term")
    val r = Retrieval.bm25(docs, "id", "text", q, "qid", "term")
      .collect()
    assert(r.length == 1) // only d1 contains x
    // N=2, df(x)=1, tf=2, dl=3, avgdl=2.5
    val idf = math.log(1.0 + (2 - 1 + 0.5) / (1 + 0.5))
    val norm = 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 3 / 2.5))
    assert(r(0).getLong(1) == 1L && r(0).getLong(2) == 1L)
    assert(math.abs(r(0).getDouble(3) - BigDecimal(idf * norm)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("bm25 ranks rare terms above common ones and dedups query terms") {
    import spark.implicits._
    // 'c' appears in every doc, 'r' in one; same tf/dl -> idf dominates
    val docs = Seq((1L, "c r"), (2L, "c a"), (3L, "c b")).toDF("id", "text")
    val q = Seq((1L, "c"), (1L, "r"), (2L, "c"), (2L, "c")).toDF("qid", "term")
    val out = Retrieval.bm25(docs, "id", "text", q, "qid", "term").collect()
    val d1q1 = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 1L).get
    assert(d1q1.getLong(2) == 2L) // matched both terms
    // q2 with the duplicated common term: counted once
    val q2 = out.filter(_.getLong(0) == 2L)
    assert(q2.forall(_.getLong(2) == 1L) && q2.length == 3)
    val scores = q2.map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(scores(1L) == scores(2L) && scores(2L) == scores(3L))
  }

  // ---- chiSquareTokens -----------------------------------------------------

  test("chiSquareTokens: perfect association scores chi2 = N") {
    import spark.implicits._
    val docs = Seq((1L, "x", "L1"), (2L, "x", "L1"),
      (3L, "y", "L2"), (4L, "y", "L2")).toDF("id", "text", "lab")
    val out = Metrics.chiSquareTokens(docs, "id", "text", "lab", 1L)
      .orderBy("token").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(4)))
    assert(out.toSeq == Seq(("x", "L1", 2L, 4.0), ("y", "L2", 2L, 4.0)))
  }

  test("chiSquareTokens counts presence per doc and honors minDf") {
    import spark.implicits._
    // 'x x x' is one presence; 'z' df=1 pruned at minDf=2
    val docs = Seq((1L, "x x x q", "L1"), (2L, "x z", "L2"), (3L, "q", "L2"))
      .toDF("id", "t", "lab")
    val out = Metrics.chiSquareTokens(docs, "id", "t", "lab", 2L).collect()
    assert(out.map(_.getString(0)).distinct.sorted.toSeq == Seq("q", "x"))
    assert(out.forall(_.getLong(3) == 2L)) // tok_df counts docs, not tokens
  }

  test("chiSquareTokens drops zero-margin cells (all-docs token or label)") {
    import spark.implicits._
    // 'c' is in every doc (tok_df = N) -> chi2 undefined, dropped;
    // a single-label corpus (lab_n = N) yields nothing at all
    val docs = Seq((1L, "c a", "L1"), (2L, "c b", "L2")).toDF("id", "t", "lab")
    val out = Metrics.chiSquareTokens(docs, "id", "t", "lab", 1L).collect()
    assert(!out.map(_.getString(0)).contains("c"))
    val mono = Seq((1L, "a b", "L"), (2L, "a c", "L")).toDF("id", "t", "lab")
    assert(Metrics.chiSquareTokens(mono, "id", "t", "lab", 1L).count() == 0L)
  }

  test("aucByGroup excludes NULL scores instead of ranking them lowest") {
    import spark.implicits._
    val df = Seq(("g", 1, Some(0.9)), ("g", 0, Some(0.1)), ("g", 1, None))
      .toDF("g", "y", "score")
    val out = Metrics.aucByGroup(df, "g", "y", "score").collect()
    assert(out.length == 1)
    // the null-scored positive is dropped: 1 pos vs 1 neg, separable
    assert(out(0).getLong(1) == 1L && out(0).getLong(2) == 1L)
    assert(out(0).getDouble(3) == 1.0)
  }

  // ---- classificationReport ------------------------------------------------

  test("classificationReport matches the hand-computed per-class table") {
    import spark.implicits._
    val df = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"),
      ("c", "b"), ("b", "e")).toDF("truth", "pred")
    val out = Metrics.classificationReport(df, "truth", "pred")
      .orderBy("klass").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(out.toSeq == Seq(
      ("a", 2L, 1L, 0L, 1L, 1.0, 0.5, 0.666667),
      ("b", 3L, 2L, 2L, 1L, 0.5, 0.666667, 0.571429),
      ("c", 1L, 0L, 0L, 1L, 0.0, 0.0, 0.0), // never predicted
      ("e", 0L, 0L, 1L, 0L, 0.0, 0.0, 0.0))) // never true
  }

  test("classificationReport is partitioning-invariant") {
    import spark.implicits._
    val df = (1 to 300).map(i => (s"c${i % 4}", s"c${(i * 7) % 5}"))
      .toDF("truth", "pred")
    val a = Metrics.classificationReport(df, "truth", "pred").collect().toSet
    val b = Metrics.classificationReport(df.repartition(13), "truth", "pred")
      .collect().toSet
    assert(a == b && a.size == 5)
  }

  // ---- regressionMetrics ---------------------------------------------------

  test("regressionMetrics matches hand-computed RMSE/MAE/R2") {
    import spark.implicits._
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 2.0), ("g", 3.0, 2.0),
      ("g", 4.0, 5.0)).toDF("g", "y", "pred")
    val r = Metrics.regressionMetrics(df, "g", "y", "pred").collect()(0)
    // e = [0,0,1,-1]: rmse = sqrt(.5), mae = .5, ssr = 2, sst = 5
    assert(r.getLong(1) == 4L)
    assert(math.abs(r.getDouble(2) - 0.707107) < 1e-9)
    assert(r.getDouble(3) == 0.5)
    assert(math.abs(r.getDouble(4) - 0.6) < 1e-9)
  }

  test("regressionMetrics survives large-mean low-variance targets") {
    import spark.implicits._
    // sum(y^2) - sum(y)^2/n cancels catastrophically at mean 1e9 and
    // can go negative, silently dropping the group; var_pop must not
    val df = Seq(("g", 1e9, 1e9), ("g", 1e9 + 1, 1e9 + 1),
      ("g", 1e9 + 2, 1e9 + 2)).toDF("g", "y", "pred")
    val out = Metrics.regressionMetrics(df, "g", "y", "pred").collect()
    assert(out.length == 1, "group with real variance must be kept")
    assert(out(0).getDouble(4) == 1.0) // perfect predictor
  }

  test("regressionMetrics drops zero-variance groups") {
    import spark.implicits._
    val df = Seq(("z", 5.0, 4.0), ("z", 5.0, 6.0), ("k", 1.0, 1.0),
      ("k", 3.0, 3.0)).toDF("g", "y", "pred")
    val out = Metrics.regressionMetrics(df, "g", "y", "pred").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("k"))
  }

  // ---- calibrationBins -----------------------------------------------------

  test("calibrationBins matches hand-computed bins and clamps the range") {
    import spark.implicits._
    val df = Seq((1, 0.1), (0, 0.3), (1, 0.9), (1, 1.0), (0, -0.2), (1, 1.7))
      .toDF("y", "score")
    val out = Metrics.calibrationBins(df, "y", "score", 4)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // -0.2 clamps into bin 0; 1.0 and 1.7 clamp into bin 3
    assert(out.toSeq == Seq(
      (0, 2L, -0.05, 0.5), (1, 1L, 0.3, 0.0), (3, 3L, 1.2, 1.0)))
  }

  // ---- passageChunks -------------------------------------------------------

  test("passageChunks matches hand-computed windows, strides, and tails") {
    import spark.implicits._
    // doc 1: 5 tokens, window 4 / stride 2 -> starts 0,2,4 with tails
    // doc 2: exactly one window; doc 3: empty text -> one 1-token chunk
    // (whitespace tokenization of "" is [""], the corpus convention)
    val docs = Seq((1L, "a b c d e"), (2L, "x y"), (3L, ""))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .passageChunks(docs, "doc_id", "text", window = 4, stride = 2)
      .orderBy("id", "chunk_idx")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4), r.getString(5)))
    assert(out.toSeq == Seq(
      (1L, 0, 0, 4, "a", "d"),
      (1L, 1, 2, 3, "c", "e"),
      (1L, 2, 4, 1, "e", "e"),
      (2L, 0, 0, 2, "x", "y"),
      (3L, 0, 0, 1, "", "")))
  }

  test("passageChunks chunk count is exactly ceil(n/stride) per doc") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 33).map(i => s"t$i").mkString(" ")),
      (2L, (1 to 32).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val counts = graft.operators.TextAnalysis
      .passageChunks(docs, "doc_id", "text", window = 32, stride = 16)
      .groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 3L, 2L -> 2L)) // ceil(33/16)=3, ceil(32/16)=2
  }
}
