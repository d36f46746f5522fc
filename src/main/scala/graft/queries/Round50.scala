package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Mixing, TextAnalysis}
import graft.sources.{Tables => T}

/** Round-6 forty-second wave: the corpus-prep capstone.
  */
object Round50 {

  val all: Seq[Q] = Seq(

    // q300: the training-mix report an LLM data pipeline ships — one
    // composed plan: quality gate (token count + integer-exact mean
    // word length) → exact dedup (md5, min-id canonical) → reproducible
    // hash split → per-(split, lang) docs/tokens/chars; every stage is
    // an operator verified on its own elsewhere, composed here without
    // any intermediate materialization
    Q("q300_corpus_pipeline", (s, d) => {
      import s.implicits._
      val g = T.documents(s, d)
        .withColumn("__nt", size(TextAnalysis.tokens($"text")))
      val gated = g.filter($"__nt" >= 20 && $"__nt" <= 400 &&
        length($"text") <= $"__nt" * 12)
      // min-id canonical per md5 — exactKeepMinId's rule, kept inline so
      // the full rows flow on into the split (the operator projects to
      // its key/id/count report shape)
      val deduped = gated.withColumn("__h", md5($"text"))
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"__h").orderBy($"doc_id")))
        .filter($"__rn" === 1)
      Mixing.splitByHash(deduped, "doc_id", "split",
          Seq("train" -> 0.9, "val" -> 0.1))
        .groupBy($"split", $"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum($"__nt").as("n_tokens"),
          sum($"n_chars").as("total_chars"))
        .orderBy($"split", $"lang")
    }, Some("""
      WITH g AS (SELECT doc_id, lang, text, n_chars,
                   len(regexp_split_to_array(trim(text), '\s+')) AS nt
                 FROM documents),
      q AS (SELECT * FROM g
            WHERE nt >= 20 AND nt <= 400 AND length(text) <= nt * 12),
      dd AS (SELECT * FROM (
               SELECT *, row_number() OVER (PARTITION BY md5(text)
                 ORDER BY doc_id) AS rn
               FROM q) WHERE rn = 1),
      sp AS (SELECT *,
               CASE WHEN ((doc_id % 2147483648) * 2654435761) % 1000
                      < 900
                    THEN 'train' ELSE 'val' END AS split
             FROM dd)
      SELECT split, lang, count(*) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS n_tokens,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM sp GROUP BY 1, 2 ORDER BY split, lang"""))
  )
}
