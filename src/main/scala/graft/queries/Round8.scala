package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Metrics, Mixing, Retrieval, Similarity, TextAnalysis}
import graft.sources.{Tables => T}

/** Round-5 fourth wave: the retrieval/eval read-outs — BM25 keyword
  * scoring, per-query ranking metrics (NDCG@k / MRR / P@k), per-group
  * exact ROC AUC, and chi-squared token–label feature selection.
  */
object Round8 {

  val all: Seq[Q] = Seq(

    // Okapi BM25 over the corpus for three bag-of-terms queries. One
    // corpus explode+aggregate builds tf; df/corpus stats are vocab- /
    // one-row-sized; the query table broadcasts. See Retrieval.bm25
    Q("q162_bm25", (s, d) => {
      import s.implicits._
      val queries = Seq((1L, "hash"), (1L, "join"), (2L, "stream"),
        (2L, "window"), (2L, "batch"), (3L, "vector"), (3L, "query"))
        .toDF("qid", "term")
      Retrieval.bm25(T.documents(s, d), "doc_id", "text",
          queries, "qid", "term")
        .orderBy($"qid", $"doc_id")
    }, Some("""
      WITH q(qid, term) AS (VALUES (1, 'hash'), (1, 'join'),
        (2, 'stream'), (2, 'window'), (2, 'batch'),
        (3, 'vector'), (3, 'query')),
      tok AS (SELECT doc_id,
                unnest(regexp_split_to_array(trim(text), '\s+')) AS term
              FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      dl AS (SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\s+')) AS dl
             FROM documents),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      st AS (SELECT count(*)::DOUBLE AS n,
               avg(len(regexp_split_to_array(trim(text), '\s+'))) AS avgdl
             FROM documents)
      SELECT CAST(qid AS BIGINT) AS qid, tf.doc_id AS doc_id,
             count(*) AS n_terms,
             round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
               * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6)
               AS bm25
      FROM tf JOIN q USING (term) JOIN df USING (term)
              JOIN dl ON dl.doc_id = tf.doc_id, st
      GROUP BY 1, 2 ORDER BY 1, 2""")),

    // retrieval-run eval: brute-force cosine top-50 per probe scored
    // against same-label relevance, then NDCG@10 / MRR / P@10 per
    // query — both metric windows share one hash partitioning on the
    // query id (see Metrics.rankingMetrics)
    Q("q163_ranking_metrics", (s, d) => {
      import s.implicits._
      val emb = T.embeddings(s, d)
      val labels = emb.select($"vec_id", $"label")
      val run = Similarity
        .bruteForceTopK(emb, emb.filter($"vec_id" < 20), 50)
        .join(labels.select($"vec_id".as("probe_id"),
          $"label".as("__ql")), "probe_id")
        .join(labels.select($"vec_id", $"label".as("__dl")), "vec_id")
        .withColumn("rel", when($"__ql" === $"__dl", 1.0).otherwise(0.0))
      Metrics.rankingMetrics(run, "probe_id", "vec_id", "sim", "rel", 10)
        .orderBy($"probe_id")
    }, Some("""
      WITH scored AS (
        SELECT a.vec_id AS probe_id, b.vec_id AS vec_id,
               round(list_cosine_similarity(a.embedding::DOUBLE[],
                 b.embedding::DOUBLE[]), 6) AS sim,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY round(list_cosine_similarity(a.embedding::DOUBLE[],
                   b.embedding::DOUBLE[]), 6) DESC, b.vec_id) AS rnk,
               CASE WHEN a.label = b.label THEN 1.0 ELSE 0.0 END AS rel
        FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id
        WHERE a.vec_id < 20),
      ranked AS (
        SELECT probe_id, vec_id, sim, rel,
               row_number() OVER (PARTITION BY probe_id
                 ORDER BY sim DESC, vec_id) AS r,
               row_number() OVER (PARTITION BY probe_id
                 ORDER BY rel DESC, vec_id) AS ir
        FROM scored WHERE rnk <= 50)
      SELECT probe_id,
             count(CASE WHEN rel > 0 THEN 1 END) AS n_rel,
             round(coalesce(max(CASE WHEN rel > 0 THEN 1.0 / r END), 0), 6)
               AS mrr,
             round(count(CASE WHEN r <= 10 AND rel > 0 THEN 1 END) / 10.0, 6)
               AS precision_k,
             round(CASE WHEN sum(CASE WHEN ir <= 10
                                 THEN rel / log2(ir + 1) ELSE 0 END) > 0
               THEN sum(CASE WHEN r <= 10 THEN rel / log2(r + 1) ELSE 0 END)
                    / sum(CASE WHEN ir <= 10
                          THEN rel / log2(ir + 1) ELSE 0 END)
               ELSE 0 END, 6) AS ndcg_k
      FROM ranked GROUP BY 1 ORDER BY probe_id""")),

    // per-label exact ROC AUC of a one-dimension scorer via the
    // Mann-Whitney rank-sum — every window partitioned by the group, so
    // the whole eval is one shuffle + one in-partition sort
    Q("q164_auc_by_group", (s, d) => {
      import s.implicits._
      val e = T.embeddings(s, d).select($"label",
        when(pmod($"vec_id", lit(2)) === 0, 1).otherwise(0).as("y"),
        element_at($"embedding", 1).cast("double").as("score"))
      Metrics.aucByGroup(e, "label", "y", "score").orderBy($"label")
    }, Some("""
      WITH e AS (
        SELECT label, CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END AS y,
               embedding[1]::DOUBLE AS score
        FROM embeddings),
      r AS (
        SELECT label, y,
               rank() OVER (PARTITION BY label ORDER BY score)
                 + (count(*) OVER (PARTITION BY label, score) - 1) / 2.0
                 AS ar
        FROM e),
      a AS (
        SELECT label,
               count(CASE WHEN y = 1 THEN 1 END) AS n_pos,
               count(CASE WHEN y = 0 THEN 1 END) AS n_neg,
               sum(CASE WHEN y = 1 THEN ar END) AS rs
        FROM r GROUP BY 1)
      SELECT label, n_pos, n_neg,
             round((rs - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg), 6)
               AS auc
      FROM a WHERE n_pos > 0 AND n_neg > 0 ORDER BY label""")),

    // chi-squared token-language association (one-vs-rest 2x2 per
    // observed cell): the feature-selection pass. Corpus shuffles once
    // for the cells; token/label totals are vocab- and label-sized
    Q("q165_chi2_tokens", (s, d) => {
      import s.implicits._
      Metrics.chiSquareTokens(T.documents(s, d), "doc_id", "text",
          "lang", minDf = 50L)
        .orderBy($"token", $"label")
    }, Some("""
      WITH toks AS (
        SELECT doc_id, lang AS label, unnest(list_distinct(
          regexp_split_to_array(trim(text), '\s+'))) AS token
        FROM documents),
      cells AS (SELECT token, label, count(*) AS a FROM toks GROUP BY 1, 2),
      tt AS (SELECT token, count(*) AS tok_df FROM toks
             GROUP BY 1 HAVING count(*) >= 50),
      lt AS (SELECT lang AS label, count(*) AS lab_n FROM documents
             GROUP BY 1),
      n AS (SELECT count(*) AS n FROM documents)
      SELECT token, label, a AS n_with, tok_df,
             round(n * pow(a * (n - tok_df - (lab_n - a))
                           - (tok_df - a) * (lab_n - a), 2)
               / (tok_df * (n - tok_df) * lab_n * (n - lab_n)), 6) AS chi2
      FROM cells JOIN tt USING (token) JOIN lt USING (label), n
      ORDER BY token, label""")),

    // per-class precision/recall/F1 report for a rule-based status
    // predictor: one corpus-sized (truth, pred) cell aggregate, then
    // class-sized marginals full-outer-joined so never-predicted and
    // never-true classes keep explicit zero rows
    Q("q166_classification_report", (s, d) => {
      import s.implicits._
      val preds = T.orders(s, d).select($"o_orderstatus".as("truth"),
        when($"o_totalprice" > 150000, "F")
          .when($"o_totalprice" > 50000, "O")
          .otherwise("P").as("pred"))
      Metrics.classificationReport(preds, "truth", "pred")
        .orderBy($"klass")
    }, Some("""
      WITH p AS (
        SELECT o_orderstatus AS truth,
               CASE WHEN o_totalprice > 150000 THEN 'F'
                    WHEN o_totalprice > 50000 THEN 'O'
                    ELSE 'P' END AS pred
        FROM orders),
      cells AS (SELECT truth, pred, count(*) AS n FROM p GROUP BY 1, 2),
      bt AS (SELECT truth AS klass, sum(n) AS support,
                    sum(CASE WHEN truth = pred THEN n ELSE 0 END) AS tp_t
             FROM cells GROUP BY 1),
      bp AS (SELECT pred AS klass, sum(n) AS pred_n,
                    sum(CASE WHEN truth = pred THEN n ELSE 0 END) AS tp_p
             FROM cells GROUP BY 1),
      j AS (SELECT coalesce(bt.klass, bp.klass) AS klass,
                   coalesce(support, 0) AS support,
                   coalesce(tp_t, tp_p, 0) AS tp,
                   coalesce(pred_n, 0) - coalesce(tp_p, 0) AS fp,
                   coalesce(support, 0) - coalesce(tp_t, 0) AS fn
            FROM bt FULL OUTER JOIN bp ON bt.klass = bp.klass)
      SELECT klass, support, tp, fp, fn,
             round(CASE WHEN tp + fp > 0
               THEN tp / CAST(tp + fp AS DOUBLE) ELSE 0 END, 6) AS precision,
             round(CASE WHEN support > 0
               THEN tp / CAST(support AS DOUBLE) ELSE 0 END, 6) AS recall,
             round(CASE WHEN (CASE WHEN tp + fp > 0
                     THEN tp / CAST(tp + fp AS DOUBLE) ELSE 0 END)
                     + (CASE WHEN support > 0
                        THEN tp / CAST(support AS DOUBLE) ELSE 0 END) > 0
               THEN 2.0 * (tp / CAST(tp + fp AS DOUBLE))
                        * (tp / CAST(support AS DOUBLE))
                    / (tp / CAST(tp + fp AS DOUBLE)
                       + tp / CAST(support AS DOUBLE))
               ELSE 0 END, 6) AS f1
      FROM j ORDER BY klass""")),

    // per-flag regression error read-out (RMSE / MAE / R2) of a linear
    // quantity-from-price rule. y and pred are integer-valued, so every
    // error sum is exact in double under any partitioning; the variance
    // term is Welford (var_pop) on both engines
    Q("q167_regression_metrics", (s, d) => {
      import s.implicits._
      val df = T.lineitem(s, d).select($"l_returnflag",
        $"l_quantity".as("y"),
        floor($"l_extendedprice" / 1500.0).cast("double").as("pred"))
      Metrics.regressionMetrics(df, "l_returnflag", "y", "pred")
        .orderBy($"l_returnflag")
    }, Some("""
      WITH p AS (
        SELECT l_returnflag, l_quantity AS y,
               CAST(floor(l_extendedprice / 1500.0) AS DOUBLE) AS pred
        FROM lineitem)
      SELECT l_returnflag, count(*) AS n,
             round(sqrt(avg((y - pred) * (y - pred))), 6) AS rmse,
             round(avg(abs(y - pred)), 6) AS mae,
             round(1.0 - sum((y - pred) * (y - pred))
                   / (var_pop(y) * count(*)), 6) AS r2
      FROM p GROUP BY 1 HAVING var_pop(y) * count(*) > 0
      ORDER BY l_returnflag""")),

    // reliability-diagram bins for a pseudo-probability scored off the
    // first embedding coordinate: bin assignment is map-side arithmetic
    // (out-of-range scores clamp into the edge bins), then one hash
    // aggregate over <= 10 groups
    Q("q168_calibration_bins", (s, d) => {
      import s.implicits._
      val e = T.embeddings(s, d).select(
        pmod($"vec_id", lit(2)).cast("int").as("y"),
        ((element_at($"embedding", 1).cast("double") + lit(3.0)) / 6.0)
          .as("score"))
      Metrics.calibrationBins(e, "y", "score", 10).orderBy($"bin")
    }, Some("""
      WITH e AS (
        SELECT CAST(vec_id % 2 AS INT) AS y,
               (embedding[1]::DOUBLE + 3.0) / 6.0 AS score
        FROM embeddings),
      b AS (
        SELECT greatest(0, least(CAST(floor(score * 10) AS INT), 9)) AS bin,
               score, y
        FROM e)
      SELECT bin, count(*) AS n, round(avg(score), 6) AS mean_score,
             round(avg(CAST(y AS DOUBLE)), 6) AS frac_pos
      FROM b GROUP BY 1 ORDER BY bin""")),

    // leakage-safe dataset split: near-dup GROUPS (q66's components;
    // singletons group as themselves) are assigned wholly to one split
    // by the reproducible multiplicative hash — a near-duplicate can
    // never straddle train/test, the leakage plain per-doc splitting
    // (q96) permits. Composition of two verified operators; the split
    // itself stays map-side once groups exist
    Q("q169_group_split", (s, d) => {
      import s.implicits._
      val docs = T.documents(s, d)
      val pairs = Dedup.minHashNearDupPairs(docs, "doc_id", "text", 0.5)
      val comps = Dedup.connectedComponents(pairs, "a_id", "b_id")
        .select($"id".as("doc_id"), $"component".as("group_id"))
      val grouped = docs.select($"doc_id").join(comps, Seq("doc_id"), "left")
        .withColumn("group_id", coalesce($"group_id", $"doc_id"))
      Mixing.splitByHash(grouped, "group_id", "split",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select($"doc_id", $"group_id", $"split")
        .orderBy($"doc_id")
    }, Some("""
      WITH RECURSIVE
      w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      sh AS (SELECT doc_id,
                    list_distinct(list_transform(
                      generate_series(1, greatest(len(ws) - 2, 0)),
                      i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS s
             FROM w),
      jsz AS (SELECT doc_id, len(s) AS n FROM sh),
      jpost AS (SELECT doc_id, unnest(s) AS g FROM sh),
      jcom AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
               FROM jpost a JOIN jpost b ON a.g = b.g AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
      pairs AS (SELECT a_id, b_id
                FROM jcom JOIN jsz sa ON sa.doc_id = a_id
                          JOIN jsz sb ON sb.doc_id = b_id
                WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5),
      edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
                UNION SELECT b_id, a_id FROM pairs),
      reach AS (SELECT src AS id, src AS lbl FROM edges
                UNION
                SELECT e.dst AS id, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
      comp AS (SELECT id AS doc_id, min(lbl) AS group_id FROM reach GROUP BY id),
      g AS (SELECT d.doc_id, coalesce(c.group_id, d.doc_id) AS group_id
            FROM documents d LEFT JOIN comp c USING (doc_id))
      SELECT doc_id, group_id,
             CASE WHEN ((group_id % 2147483648) * 2654435761) % 1000 < 800 THEN 'train'
                  WHEN ((group_id % 2147483648) * 2654435761) % 1000 < 900 THEN 'val'
                  ELSE 'test' END AS split
      FROM g ORDER BY doc_id""")),

    // per-domain quality-quantile gate: keep each language's top quartile
    // by token count — the "prune the bottom p% by quality signal within
    // each domain" shape of curated-corpus recipes. One keyed window
    // (shuffle on lang), no global sort; percent_rank's tie handling is
    // identical across engines, so the gate is exactly reproducible
    Q("q170_quality_quantile_gate", (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val scored = T.documents(s, d).select($"doc_id", $"lang",
        TextAnalysis.tokenCount($"text").as("n_tok"))
      scored
        .withColumn("pr", percent_rank().over(
          Window.partitionBy($"lang").orderBy($"n_tok")))
        .filter($"pr" >= 0.75)
        .select($"doc_id", $"lang", $"n_tok", round($"pr", 6).as("pr"))
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, lang,
                        CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tok
                 FROM documents),
      r AS (SELECT doc_id, lang, n_tok,
                   percent_rank() OVER (PARTITION BY lang ORDER BY n_tok) AS pr
            FROM t)
      SELECT doc_id, lang, n_tok, round(pr, 6) AS pr
      FROM r WHERE pr >= 0.75 ORDER BY doc_id""")),

    // retrieval-prep passage chunking: overlapping 32-token windows at
    // stride 16 over every document — map-side explode, zero shuffles,
    // output ∝ corpus tokens / stride. See TextAnalysis.passageChunks
    Q("q171_passage_chunks", (s, d) => {
      import s.implicits._
      TextAnalysis.passageChunks(T.documents(s, d), "doc_id", "text",
          window = 32, stride = 16)
        .select($"id".as("doc_id"), $"chunk_idx", $"start_tok",
          $"chunk_len", $"first_tok", $"last_tok")
        .orderBy($"doc_id", $"chunk_idx")
    }, Some("""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                 FROM documents),
      c AS (SELECT doc_id, ws, len(ws) AS n,
                   unnest(generate_series(0, len(ws) - 1, 16)) AS start_tok
            FROM w)
      SELECT doc_id, CAST(start_tok / 16 AS INT) AS chunk_idx,
             CAST(start_tok AS INT) AS start_tok,
             CAST(least(32, n - start_tok) AS INT) AS chunk_len,
             ws[CAST(start_tok AS INT) + 1] AS first_tok,
             ws[CAST(least(n, start_tok + 32) AS INT)] AS last_tok
      FROM c ORDER BY doc_id, chunk_idx"""))
  )
}
