package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.{Tables => T}

/** Round-9 wave #8: vocabulary-saturation estimators — Chao1 richness
  * (how many word types does each source REALLY have, seen or not) and
  * Good–Turing smoothing (the unseen probability mass and the adjusted
  * low-frequency counts a language model should charge). Both are exact
  * integer frequency reductions with one double formula per row.
  */
object Round84 {

  val all: Seq[Q] = Seq(

    // is each source's vocabulary saturated, or does more crawling buy
    // more types? Chao1 + Good's coverage per source
    Q("q417_chao1", (s, d) => {
      import s.implicits._
      TextAnalysis.chao1(T.documents(s, d), "source", "text")
        .orderBy($"source")
    }, Some("""
      WITH words AS (SELECT source, unnest(string_split(text, ' ')) AS w
                     FROM documents),
      wc AS (SELECT source, w, count(*) AS c
             FROM words WHERE length(w) > 0 GROUP BY 1, 2),
      agg AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
                     count(*) AS n_types,
                     CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                       AS BIGINT) AS f1,
                     CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)
                       AS BIGINT) AS f2
              FROM wc GROUP BY 1)
      SELECT source, n_tokens, CAST(n_types AS BIGINT) AS n_types, f1, f2,
             round(CAST(n_types AS DOUBLE)
               + CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - 1.0)
                 / (2.0 * (CAST(f2 AS DOUBLE) + 1.0)), 6) AS chao1,
             round(1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
               AS coverage
      FROM agg WHERE n_tokens > 0 ORDER BY source""")),

    // what should a unigram LM charge for rare words? Good-Turing
    // adjusted counts r* for r=1..4 and the unseen mass p0 per source
    Q("q418_good_turing", (s, d) => {
      import s.implicits._
      TextAnalysis.goodTuring(T.documents(s, d), "source", "text",
          maxR = 4)
        .orderBy($"source", $"r")
    }, Some("""
      WITH words AS (SELECT source, unnest(string_split(text, ' ')) AS w
                     FROM documents),
      wc AS (SELECT source, w, count(*) AS c
             FROM words WHERE length(w) > 0 GROUP BY 1, 2),
      ff AS (SELECT source, c AS r, count(*) AS f_r
             FROM wc GROUP BY 1, 2),
      tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
                     CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                       AS BIGINT) AS f1
              FROM wc GROUP BY 1)
      SELECT ff.source, CAST(ff.r AS BIGINT) AS r,
             CAST(ff.f_r AS BIGINT) AS f_r,
             CAST(coalesce(n1.f_r, 0) AS BIGINT) AS f_r1,
             round((CAST(ff.r AS DOUBLE) + 1.0)
               * CAST(coalesce(n1.f_r, 0) AS DOUBLE)
               / CAST(ff.f_r AS DOUBLE), 6) AS r_star,
             round(CAST(tot.f1 AS DOUBLE) / CAST(tot.n AS DOUBLE), 6)
               AS p0
      FROM ff LEFT JOIN ff n1
        ON ff.source = n1.source AND n1.r = ff.r + 1
      JOIN tot ON ff.source = tot.source
      WHERE ff.r <= 4
      ORDER BY ff.source, ff.r"""))
  )
}
