package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-text retrieval scoring over the document corpus. Companion to
  * the inverted-index build (q161) and the RRF fusion combiner
  * ([[Similarity.rrfFuse]]): this is the keyword arm of a hybrid
  * keyword + embedding retrieval stack.
  */
object Retrieval {

  /** Okapi BM25 (Robertson & Walker 1994) scores for a bag-of-terms
    * query set: score(q,d) = Σ_{t∈q∩d} idf(t) · tf·(k1+1) /
    * (tf + k1·(1−b+b·dl/avgdl)), with the standard "plus one" idf
    * ln(1 + (N−df+0.5)/(df+0.5)) so scores stay positive. `queries`
    * holds one row per (query id, term); duplicate terms in a query
    * are counted once (bag-of-words query, set semantics — dedup'd
    * here so callers can pass raw tokenized queries).
    *
    * Cost shape at corpus scale: ONE explode+aggregate pass builds the
    * (doc, term) tf table — the only corpus-sized shuffle; document
    * lengths ride along via a size() on the same scan; df and the
    * corpus stats are vocab-sized / one-row aggregates; the query join
    * is |queries|-sized and broadcast. Nothing quadratic, nothing on
    * the driver. Returns one row per (query, matching doc) — docs
    * matching no term drop out, as an inverted index would. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, termCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol).as("__doc"),
      explode(TextAnalysis.tokens(col(textCol))).as("__term"))
    val tf = toks.groupBy(col("__doc"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val dl = docs.select(col(idCol).as("__doc"),
      TextAnalysis.tokenCount(col(textCol)).cast("double").as("__dl"))
    val dfT = tf.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    val stats = docs.agg(count(lit(1)).cast("double").as("__n"),
      avg(TextAnalysis.tokenCount(col(textCol))).as("__avgdl"))
    val q = queries.select(col(queryIdCol).as("__q"),
      col(termCol).as("__term")).distinct()
    val idf = log(lit(1.0)
      + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5))
    val norm = col("__tf") * (k1 + 1.0) /
      (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl")))
    tf.join(broadcast(q), "__term")
      .join(dfT, "__term")
      .join(dl, "__doc")
      .crossJoin(broadcast(stats))
      .groupBy(col("__q"), col("__doc"))
      .agg(count(lit(1)).as("n_terms"), sum(idf * norm).as("__s"))
      .select(col("__q").as(queryIdCol), col("__doc").as(idCol),
        col("n_terms"), round(col("__s"), 6).as("bm25"))
  }

  /** Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    * Lafferty 2001) — the language-modeling arm of the keyword stack,
    * next to [[bm25]]'s probabilistic-relevance arm:
    *
    *   score(q,d) = Σ_{t∈q∩d} ln(1 + tf·C/(μ·cf_t)) + |q|·ln(μ/(dl+μ))
    *
    * the standard sparse decomposition of Σ_t ln P(t|θ_d) under
    * P(t|θ_d) = (tf + μ·cf_t/C)/(dl + μ): only MATCHING (doc, term)
    * pairs contribute the first sum, and the second term depends on the
    * document alone — so the join shape is exactly [[bm25]]'s inverted-
    * index walk. Docs matching no query term drop out (their constant-
    * only score ranks below any match at equal length; an index would
    * never surface them).
    *
    * Cost shape at corpus scale: identical to [[bm25]] — one
    * explode+aggregate builds tf (the only corpus-sized shuffle), cf is
    * vocab-sized, C is one row, queries broadcast. Per-(query, doc)
    * float sums are query-bounded. */
  def queryLikelihoodDirichlet(docs: DataFrame, idCol: String,
      textCol: String, queries: DataFrame, queryIdCol: String,
      termCol: String, mu: Double = 200.0): DataFrame = {
    require(mu > 0, s"mu must be positive: $mu")
    val toks = docs.select(col(idCol).as("__doc"),
      explode(TextAnalysis.tokens(col(textCol))).as("__term"))
    val tf = toks.groupBy(col("__doc"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val cf = tf.groupBy(col("__term")).agg(sum(col("__tf")).as("__cf"))
    val corpus = tf.agg(sum(col("__tf")).cast("double").as("__cc"))
    val dl = docs.select(col(idCol).as("__doc"),
      TextAnalysis.tokenCount(col(textCol)).cast("double").as("__dl"))
    val q = queries.select(col(queryIdCol).as("__q"),
      col(termCol).as("__term")).distinct()
    val nq = q.groupBy(col("__q")).agg(count(lit(1)).as("__nq"))
    tf.join(broadcast(q), "__term")
      .join(cf, "__term")
      .crossJoin(broadcast(corpus))
      .groupBy(col("__q"), col("__doc"))
      .agg(count(lit(1)).as("n_match"),
        sum(log(lit(1.0) + col("__tf").cast("double") * col("__cc")
          / (lit(mu) * col("__cf")))).as("__s1"))
      .join(dl, "__doc")
      .join(broadcast(nq), "__q")
      .select(col("__q").as(queryIdCol), col("__doc").as(idCol),
        col("n_match"),
        round(col("__s1")
          + col("__nq") * log(lit(mu) / (col("__dl") + lit(mu))), 6)
          .as("ql_score"))
  }
}
