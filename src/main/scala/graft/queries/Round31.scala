package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.{Tables => T}

/** Round-6 twenty-third wave: cross-source contamination matrix. */
object Round31 {

  val all: Seq[Q] = Seq(

    // how much does each source pair duplicate each other? near-dup
    // groups (q66's components) that SPAN two sources, counted per
    // source pair with the docs involved on each side — the
    // cross-source contamination read-out that decides which corpus
    // overlaps must be deduped before mixing
    Q("q250_cross_source_dup", (s, d) => {
      import s.implicits._
      val docs = T.documents(s, d)
      val pairs = Dedup.minHashNearDupPairs(docs, "doc_id", "text", 0.5)
      val comps = Dedup.connectedComponents(pairs, "a_id", "b_id")
        .select($"id".as("doc_id"), $"component")
      val member = docs.select($"doc_id", $"source").join(comps, "doc_id")
      val srcPairs = member.select($"component", $"source".as("src_a"))
        .distinct()
        .join(member.select($"component", $"source".as("src_b"))
          .distinct(), "component")
        .filter($"src_a" < $"src_b")
      val docCounts = srcPairs
        .join(member.select($"component", $"source", $"doc_id"),
          "component")
        .filter($"source" === $"src_a" || $"source" === $"src_b")
        .groupBy($"src_a", $"src_b")
        .agg(countDistinct($"component").as("n_groups"),
          countDistinct($"doc_id").as("n_docs_involved"))
      docCounts.orderBy($"src_a", $"src_b")
    }, Some("""
      WITH RECURSIVE
      w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
            FROM documents),
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
      prs AS (SELECT a_id, b_id
              FROM jcom JOIN jsz sa ON sa.doc_id = a_id
                        JOIN jsz sb ON sb.doc_id = b_id
              WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5),
      edges AS (SELECT a_id AS src, b_id AS dst FROM prs
                UNION SELECT b_id, a_id FROM prs),
      reach AS (SELECT src AS id, src AS lbl FROM edges
                UNION
                SELECT e.dst AS id, r.lbl FROM reach r
                JOIN edges e ON e.src = r.id),
      comp AS (SELECT id AS doc_id, min(lbl) AS component
               FROM reach GROUP BY id),
      member AS (SELECT d.doc_id, d.source, c.component
                 FROM documents d JOIN comp c USING (doc_id)),
      sp AS (SELECT DISTINCT a.component, a.source AS src_a,
                    b.source AS src_b
             FROM member a JOIN member b
             ON a.component = b.component AND a.source < b.source)
      SELECT sp.src_a, sp.src_b,
             count(DISTINCT sp.component) AS n_groups,
             count(DISTINCT m.doc_id) AS n_docs_involved
      FROM sp JOIN member m ON m.component = sp.component
        AND (m.source = sp.src_a OR m.source = sp.src_b)
      GROUP BY 1, 2 ORDER BY src_a, src_b"""))
  )
}
