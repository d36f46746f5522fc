package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Hypothesis, Mixing, Retrieval, TextAnalysis}

/** Round-8 third wave: Kneser–Ney scoring, DSIR importance weights,
  * Ansari–Bradley, and query-likelihood Dirichlet — each checked against
  * an in-JVM brute-force implementation or a hand-computed textbook case,
  * plus the partitioning-invariance determinism contract. */
class Round73OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private val corpus = Seq(
    (1L, "the cat sat on the mat", "en"),
    (2L, "the dog sat on the log", "en"),
    (3L, "le chat et le chien", "fr"),
    (4L, "the cat and the dog", "en"),
    (5L, "chien et chat et chien", "fr"))

  private def toks(t: String): Seq[String] = t.trim.split("\\s+").toSeq

  // ---- kneserNeyLogProb ----------------------------------------------------

  test("kneserNeyLogProb equals the in-JVM interpolated-KN brute force") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text", "lang")
    val d = 0.75
    val bigrams = corpus.flatMap { case (id, t, _) =>
      toks(t).sliding(2).collect { case Seq(a, b) => (id, a, b) } }
    val c2 = bigrams.groupBy(x => (x._2, x._3)).map { case (k, v) => k -> v.size }
    val c1 = c2.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val n1f = c2.groupBy(_._1._1).map { case (a, m) => a -> m.size }
    val cont = c2.groupBy(_._1._2).map { case (b, m) => b -> m.size }
    val tt = c2.size.toDouble
    val expected = bigrams.groupBy(_._1).map { case (id, bs) =>
      id -> bs.map { case (_, a, b) =>
        math.log((c2((a, b)) - d) / c1(a)
          + (d * n1f(a) / c1(a)) * (cont(b) / tt))
      }.sum / bs.size }
    val got = TextAnalysis.kneserNeyLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logp"))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) =>
      assert(got(id)._1 == toks(corpus.find(_._1 == id).get._2).size - 1L)
      assert(math.abs(got(id)._2 - e) < 1e-5, s"doc $id")
    }
  }

  test("kneserNey bigram probabilities sum to 1 over the vocabulary") {
    // Σ_b P(b|a) over every word b that occurs as a right context is
    // exactly 1: (1 − D·N1f/c1) discounted mass + the backoff term
    // spreads D·N1f/c1 across Pcont, which itself sums to 1.
    val d = 0.75
    val bigrams = corpus.flatMap { case (_, t, _) =>
      toks(t).sliding(2).collect { case Seq(a, b) => (a, b) } }
    val c2 = bigrams.groupBy(identity).map { case (k, v) => k -> v.size }
    val c1 = c2.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val n1f = c2.groupBy(_._1._1).map { case (a, m) => a -> m.size }
    val cont = c2.groupBy(_._1._2).map { case (b, m) => b -> m.size }
    val tt = c2.size.toDouble
    c1.keys.foreach { a =>
      // .toSeq: mapping over the key SET would collapse equal
      // probabilities before the sum
      val total = cont.keys.toSeq.map { b =>
        c2.get((a, b)).map(c => (c - d) / c1(a)).getOrElse(0.0) +
          (d * n1f(a) / c1(a)) * (cont(b) / tt)
      }.sum
      assert(math.abs(total - 1.0) < 1e-9, s"context $a sums to $total")
    }
  }

  // ---- importanceWeights ---------------------------------------------------

  private def dsirBucket(term: String, buckets: Int): Long = {
    val poly = term.foldLeft(0L)((a, ch) => (a * 31 + ch.toLong) % 2147483648L)
    poly * 1000003L % 2147483648L % buckets
  }

  test("importanceWeights equals the in-JVM hashed log-likelihood ratio") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text", "lang")
    val b = 64
    val alpha = 0.5
    val all = corpus.flatMap { case (id, t, l) =>
      toks(t).map(w => (id, l == "en", dsirBucket(w, b))) }
    val cr = all.groupBy(_._3).map { case (k, v) => k -> v.size }
    val ct = all.groupBy(_._3).map { case (k, v) => k -> v.count(_._2) }
    val nr = all.size.toDouble
    val nt = all.count(_._2).toDouble
    val expected = all.groupBy(_._1).map { case (id, rows) =>
      id -> rows.map { case (_, _, bk) =>
        math.log((ct(bk) + alpha) / (nt + alpha * b)) -
          math.log((cr(bk) + alpha) / (nr + alpha * b))
      }.sum }
    val got = Mixing.importanceWeights(docs, "doc_id", "text",
        col("lang") === "en", buckets = b)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("log_w"), r.getAs[Boolean]("keep"))).toMap
    expected.foreach { case (id, e) =>
      assert(math.abs(got(id)._1 - e) < 1e-5, s"doc $id")
      assert(got(id)._2 == (got(id)._1 > 0.0))
    }
    // English docs look like the target, French docs like the background
    assert(got(1L)._1 > 0 && got(4L)._1 > 0 && got(3L)._1 < 0 && got(5L)._1 < 0)
  }

  // ---- ansariBradley -------------------------------------------------------

  test("ansariBradley matches the hand-computed tie-free case") {
    import spark.implicits._
    // pooled sorted: 1(a) 5(b) 6(b) 10(a), scores min(r, 5−r) = 1,2,2,1
    // AB_a = 2, E = 3, Var = (n1 n2/(n−1))·σ² = (4/3)·0.25 = 1/3,
    // z = (2 − 3)/sqrt(1/3) = −1.732051
    val df = Seq(("g", "a", 1.0), ("g", "a", 10.0),
      ("g", "b", 5.0), ("g", "b", 6.0)).toDF("k", "t", "x")
    val r = Hypothesis.ansariBradley(df, "k", "t", "x").collect()(0)
    assert(r.getAs[String]("treatment") == "a")
    assert(r.getAs[Long]("n1") == 2L && r.getAs[Long]("n2") == 2L)
    assert(math.abs(r.getAs[Double]("ab_stat") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("z") - (-1.732051)) < 1e-6)
  }

  test("ansariBradley midrank scores and invariance under repartitioning") {
    import spark.implicits._
    // ties across treatments: pooled {2,2,7,7} → midranks 1.5,1.5,3.5,3.5
    // scores min(m, 5−m) = 1.5,1.5,1.5,1.5 → AB_a = 3, Var = 0 ⇒ z NaN is
    // avoided by construction here: use {2,2,2,9} → midranks 2,2,2,4 →
    // scores 2,2,2,1; a holds {2,9}: AB_a = 3, Σs = 7, Σs² = 13,
    // E = 2·3.5/2 = 3.5, σ² = 13/4 − 49/16 = 3/16,
    // Var = (4/3)·(3/16) = 1/4, z = (3 − 3.5)/0.5 = −1
    val df = Seq(("g", "a", 2.0), ("g", "a", 9.0),
      ("g", "b", 2.0), ("g", "b", 2.0)).toDF("k", "t", "x")
    val r = Hypothesis.ansariBradley(df, "k", "t", "x").collect()(0)
    assert(math.abs(r.getAs[Double]("ab_stat") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("z") - (-1.0)) < 1e-9)
    val many = df.union(df.repartition(7)).repartition(5)
    val r2 = Hypothesis.ansariBradley(many, "k", "t", "x")
      .collect()(0)
    val r3 = Hypothesis.ansariBradley(many.repartition(1), "k", "t", "x")
      .collect()(0)
    assert(r2.getAs[Double]("ab_stat") == r3.getAs[Double]("ab_stat"))
    assert(r2.getAs[Double]("z") == r3.getAs[Double]("z"))
  }

  // ---- queryLikelihoodDirichlet --------------------------------------------

  test("queryLikelihoodDirichlet equals the in-JVM smoothed LM score") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text", "lang")
    val queries = Seq((1L, "cat"), (1L, "dog"), (2L, "chien"))
      .toDF("qid", "term")
    val mu = 200.0
    val tf = corpus.flatMap { case (id, t, _) => toks(t).map((id, _)) }
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val cf = tf.groupBy(_._1._2).map { case (w, m) => w -> m.values.sum }
    val cc = tf.values.sum.toDouble
    val dl = corpus.map { case (id, t, _) => id -> toks(t).size }.toMap
    val qs = Map(1L -> Seq("cat", "dog"), 2L -> Seq("chien"))
    val expected = (for {
      (qid, terms) <- qs.toSeq
      id <- corpus.map(_._1)
      matched = terms.filter(w => tf.contains((id, w)))
      if matched.nonEmpty
    } yield (qid, id) -> (matched.size.toLong,
      matched.map(w => math.log(1.0 + tf((id, w)) * cc / (mu * cf(w)))).sum
        + terms.size * math.log(mu / (dl(id) + mu)))).toMap
    val got = Retrieval.queryLikelihoodDirichlet(docs, "doc_id", "text",
        queries, "qid", "term")
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("n_match"), r.getAs[Double]("ql_score"))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, (n, s)) =>
      assert(got(k)._1 == n, s"$k n_match")
      assert(math.abs(got(k)._2 - s) < 1e-5, s"$k score")
    }
  }
}
