package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.{Tables => T}

/** Round-6 thirty-seventh wave: the substring-dedup APPLY step.
  */
object Round45 {

  val all: Seq[Q] = Seq(

    // the removal pass q101 only reports: every duplicated 8-token
    // window deleted from the corpus except its canonical first
    // occurrence (lexicographic (doc, pos) — deterministic under any
    // partitioning), documents rebuilt from the surviving tokens; the
    // oracle replays the exact-text semantics end to end, so the hash
    // match covers the cleaned STRINGS, not just counts
    Q("q288_span_dedup_apply", (s, d) => {
      import s.implicits._
      Dedup.removeDuplicatedSpans(T.documents(s, d), "doc_id", "text",
          k = 8)
        .select($"id".as("doc_id"), $"n_tokens", $"n_removed", $"cleaned")
        .orderBy($"doc_id")
    }, Some("""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                 FROM documents),
      g AS (SELECT doc_id,
              CAST(unnest(generate_series(1, greatest(len(ws) - 7, 0)))
                - 1 AS INT) AS pos,
              unnest(list_transform(
                generate_series(1, greatest(len(ws) - 7, 0)),
                i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3],
                               ws[i+4], ws[i+5], ws[i+6], ws[i+7])))
                AS gram
            FROM w),
      rep AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
      occ AS (SELECT g.doc_id, g.pos,
                row_number() OVER (PARTITION BY g.gram
                  ORDER BY g.doc_id, g.pos) AS rn
              FROM g JOIN rep ON g.gram = rep.gram),
      rem AS (SELECT DISTINCT doc_id,
                unnest(generate_series(pos, pos + 7)) AS rp
              FROM occ WHERE rn > 1),
      remlist AS (SELECT doc_id, list(rp) AS rps FROM rem GROUP BY 1),
      base AS (SELECT w.doc_id, ws,
                 coalesce(rl.rps, CAST([] AS BIGINT[])) AS rps
               FROM w LEFT JOIN remlist rl ON w.doc_id = rl.doc_id),
      clean AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
                  list_filter(ws, (x, i) ->
                    NOT list_contains(rps, i - 1)) AS kept
                FROM base)
      SELECT doc_id, n_tokens,
             n_tokens - CAST(len(kept) AS BIGINT) AS n_removed,
             coalesce(array_to_string(kept, ' '), '') AS cleaned
      FROM clean ORDER BY doc_id"""))
  )
}
