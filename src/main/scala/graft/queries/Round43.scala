package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.{Tables => T}

/** Round-6 thirty-fifth wave: privacy audit, dedup threshold curve.
  */
object Round43 {

  val all: Seq[Q] = Seq(

    // data-governance gate: k-anonymity / l-diversity audit of the
    // customer table under the quasi-identifier (nation, balance
    // thousand) with market segment as the sensitive attribute — for
    // each k, equivalence classes and rows below it plus the worst l
    // (distinct sensitive values per class); integer-exact throughout
    Q("q284_k_anonymity", (s, d) => {
      import s.implicits._
      val classes = T.customer(s, d)
        .select($"c_nationkey",
          floor($"c_acctbal" / 1000).cast("long").as("bal_k"),
          $"c_mktsegment")
        .groupBy($"c_nationkey", $"bal_k")
        .agg(count(lit(1)).as("__sz"),
          countDistinct($"c_mktsegment").as("__l"))
      val ks = Seq(2, 5, 10).toDF("k")
      ks.crossJoin(classes)
        .groupBy($"k")
        .agg(count(lit(1)).as("n_classes"),
          sum(when($"__sz" < $"k", 1L).otherwise(0L))
            .as("classes_below_k"),
          sum(when($"__sz" < $"k", $"__sz").otherwise(0L))
            .as("rows_at_risk"),
          min($"__sz").as("min_class_size"),
          min($"__l").as("min_l_diversity"))
        .orderBy($"k")
    }, Some("""
      WITH cls AS (SELECT c_nationkey,
                     CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_k,
                     count(*) AS sz,
                     count(DISTINCT c_mktsegment) AS l
                   FROM customer GROUP BY 1, 2),
      ks AS (SELECT unnest([2, 5, 10]) AS k)
      SELECT k, count(*) AS n_classes,
             CAST(sum(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
               AS classes_below_k,
             CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
               AS rows_at_risk,
             min(sz) AS min_class_size,
             min(l) AS min_l_diversity
      FROM ks, cls GROUP BY k ORDER BY k""")),

    // dedup planning curve: how the near-dup cluster structure changes
    // with the Jaccard threshold (percent form keeps the grid integer)
    // — pairs, components, largest cluster, docs-in-clusters at each
    // cut; the read-out that picks a production dedup threshold
    Q("q285_component_curve", (s, d) => {
      import s.implicits._
      val docs = T.documents(s, d).filter($"doc_id" < 400)
      val rows = Seq(50, 70, 90).map { pct =>
        val pairs = Dedup.shingleJaccardPairs(docs, "doc_id", "text",
          pct / 100.0)
        val comp = Dedup.connectedComponents(pairs, "a_id", "b_id")
        comp.groupBy($"component").agg(count(lit(1)).as("__sz"))
          .agg(coalesce(count(lit(1)), lit(0L)).as("n_components"),
            coalesce(max($"__sz"), lit(0L)).as("max_cluster"),
            coalesce(sum($"__sz"), lit(0L)).as("docs_in_clusters"))
          .select(lit(pct).as("threshold_pct"),
            lit(pairs.count()).as("n_pairs"),
            $"n_components", $"max_cluster", $"docs_in_clusters")
      }
      rows.reduce(_ unionAll _).orderBy($"threshold_pct")
    }, Some("""
      WITH RECURSIVE
      w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
            FROM documents WHERE doc_id < 400),
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
      pr AS (SELECT a_id, b_id,
                    round(c * 1.0 / (sa.n + sb.n - c), 6) AS sim
             FROM jcom JOIN jsz sa ON sa.doc_id = a_id
                       JOIN jsz sb ON sb.doc_id = b_id),
      thr AS (SELECT unnest([50, 70, 90]) AS threshold_pct),
      curve AS (SELECT t.threshold_pct, p.a_id, p.b_id
                FROM thr t JOIN pr p ON p.sim >= t.threshold_pct / 100.0),
      edges AS (SELECT threshold_pct, a_id AS src, b_id AS dst FROM curve
                UNION SELECT threshold_pct, b_id, a_id FROM curve),
      reach AS (SELECT threshold_pct, src AS id, src AS lbl FROM edges
                UNION
                SELECT e.threshold_pct, e.dst, r.lbl
                FROM reach r JOIN edges e
                  ON e.threshold_pct = r.threshold_pct AND e.src = r.id),
      comp AS (SELECT threshold_pct, id, min(lbl) AS component
               FROM reach GROUP BY 1, 2),
      sizes AS (SELECT threshold_pct, component, count(*) AS sz
                FROM comp GROUP BY 1, 2),
      agg AS (SELECT threshold_pct, count(*) AS n_components,
                     max(sz) AS max_cluster,
                     CAST(sum(sz) AS BIGINT) AS docs_in_clusters
              FROM sizes GROUP BY 1),
      np AS (SELECT t.threshold_pct, count(p.a_id) AS n_pairs
             FROM thr t LEFT JOIN pr p ON p.sim >= t.threshold_pct / 100.0
             GROUP BY 1)
      SELECT np.threshold_pct, np.n_pairs,
             coalesce(agg.n_components, 0) AS n_components,
             coalesce(agg.max_cluster, 0) AS max_cluster,
             coalesce(agg.docs_in_clusters, 0) AS docs_in_clusters
      FROM np LEFT JOIN agg ON np.threshold_pct = agg.threshold_pct
      ORDER BY np.threshold_pct"""))
  )
}
