package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.{Tables => T}

/** Round-4 surface additions: exact substring (repeated-span) dedup —
  * the suffix-style dedup of published training-data pipelines, which
  * the doc/shingle-level family (exact, MinHash, SimHash, n-gram
  * Jaccard, embedding) does not cover.
  */
object Round4 {

  val all: Seq[Q] = Seq(

    // maximal EXACT repeated token spans (k = 8 token windows): every
    // window occurring at >= 2 corpus positions is duplicated; runs of
    // consecutive duplicated positions merge into one maximal span per
    // document. Hash-candidates + exact-text verify make the result
    // exact, so the full span table hash-matches a plain SQL oracle
    Q("q101_substring_dedup", (s, d) => {
      import s.implicits._
      Dedup.duplicatedSpans(T.documents(s, d), "doc_id", "text", k = 8)
        .select($"id".as("doc_id"), $"start_pos", $"span_tokens", $"n_windows")
        .orderBy($"doc_id", $"start_pos")
    }, Some("""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                 FROM documents),
      g AS (SELECT doc_id,
                   CAST(unnest(generate_series(1, greatest(len(ws) - 7, 0))) - 1 AS INT) AS pos,
                   unnest(list_transform(generate_series(1, greatest(len(ws) - 7, 0)),
                     i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3],
                                         ws[i+4], ws[i+5], ws[i+6], ws[i+7]))) AS gram
            FROM w),
      dup AS (SELECT doc_id, pos FROM (
                SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS gn FROM g) t
              WHERE gn >= 2),
      isl AS (SELECT doc_id, pos,
                     pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
              FROM dup)
      SELECT doc_id, CAST(min(pos) AS INT) AS start_pos,
             CAST(max(pos) - min(pos) + 8 AS INT) AS span_tokens,
             CAST(count(*) AS INT) AS n_windows
      FROM isl GROUP BY doc_id, grp ORDER BY doc_id, start_pos"""))
  )
}
