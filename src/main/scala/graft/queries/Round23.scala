package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.{Functions => F}
import graft.operators.{Dedup, TextAnalysis, TimeSeries}
import graft.sources.{Tables => T}

/** Round-6 fifteenth wave: golden records, rolling distinct actives,
  * boilerplate detection.
  */
object Round23 {

  val all: Seq[Q] = Seq(

    // master-data "golden record": JW-similar part names clustered into
    // entities (blocked pairs -> connected components), survivorship
    // picks the longest name (ties alphabetical), attributes aggregate
    // decimal-exact across the cluster
    Q("q230_golden_record", (s, d) => {
      import s.implicits._
      val n = T.part(s, d).groupBy($"p_name")
        .agg(min($"p_partkey").as("nid"), count(lit(1)).as("n_parts"),
          sum($"p_retailprice".cast("decimal(18,2)"))
            .cast("decimal(18,2)").as("retail"))
      val k = n.withColumn("blk", element_at(split($"p_name", " "), -1))
      val a = k.select($"p_name".as("name_a"), $"nid".as("nid_a"), $"blk")
      val b = k.select($"p_name".as("name_b"), $"nid".as("nid_b"), $"blk")
      val pairs = a.join(b, "blk").filter($"name_a" < $"name_b")
        .filter(F.jaro_winkler($"name_a", $"name_b") >= 0.82)
        .select($"nid_a", $"nid_b")
      val comps = Dedup.connectedComponents(pairs, "nid_a", "nid_b")
      val g = n
        .join(comps.select($"id".as("nid"), $"component"), Seq("nid"), "left")
        .withColumn("component", coalesce($"component", $"nid"))
      val best = g.groupBy($"component")
        .agg(min_by($"p_name",
          struct((-length($"p_name")).as("l"), $"p_name".as("n")))
          .as("canonical_name"))
      g.join(best, "component")
        .groupBy($"canonical_name")
        .agg(count(lit(1)).as("n_names"), sum($"n_parts").as("n_parts"),
          sum($"retail").cast("decimal(18,2)").as("total_retail"))
        .orderBy($"canonical_name")
    }, Some("""
      WITH RECURSIVE
      n AS (SELECT p_name, min(p_partkey) AS nid, count(*) AS n_parts,
                   CAST(sum(CAST(p_retailprice AS DECIMAL(18,2)))
                     AS DECIMAL(18,2)) AS retail
            FROM part GROUP BY 1),
      k AS (SELECT p_name, nid, string_split(p_name, ' ')[-1] AS blk
            FROM n),
      prs AS (SELECT a.nid AS a_id, b.nid AS b_id
              FROM k a JOIN k b ON a.blk = b.blk AND a.p_name < b.p_name
              WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.82),
      edges AS (SELECT a_id AS src, b_id AS dst FROM prs
                UNION SELECT b_id, a_id FROM prs),
      reach AS (SELECT src AS id, src AS lbl FROM edges
                UNION
                SELECT e.dst, r.lbl FROM reach r JOIN edges e
                ON e.src = r.id),
      comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY 1),
      g AS (SELECT nn.p_name, nn.n_parts, nn.retail,
                   coalesce(c.component, nn.nid) AS component
            FROM n nn LEFT JOIN comp c ON c.id = nn.nid),
      best AS (SELECT component, p_name AS canonical_name FROM (
                 SELECT component, p_name, row_number() OVER (
                   PARTITION BY component
                   ORDER BY length(p_name) DESC, p_name) AS rn
                 FROM g) WHERE rn = 1)
      SELECT b.canonical_name, count(*) AS n_names,
             sum(g.n_parts) AS n_parts,
             CAST(sum(g.retail) AS DECIMAL(18,2)) AS total_retail
      FROM g JOIN best b USING (component)
      GROUP BY 1 ORDER BY canonical_name""")),

    // exact rolling 7-day distinct actives per day, WITHOUT an
    // inequality join or distinct-over-window: map-side x7 day explode
    // of the deduped (user, day) pairs + one distinct aggregate
    Q("q231_rolling_dau", (s, d) => {
      import s.implicits._
      TimeSeries.rollingDistinctDaily(T.events(s, d), "user_id", "ts", 7)
        .orderBy($"day")
    }, Some("""
      WITH pairs AS (SELECT DISTINCT user_id AS k, CAST(ts AS DATE) AS day
                     FROM events),
      obs AS (SELECT DISTINCT day FROM pairs),
      win AS (SELECT o.day, count(DISTINCT p.k) AS active_window
              FROM obs o JOIN pairs p
              ON p.day BETWEEN o.day - 6 AND o.day
              GROUP BY 1),
      one AS (SELECT day, count(*) AS active_1d FROM pairs GROUP BY 1)
      SELECT one.day, active_1d, active_window
      FROM one JOIN win USING (day) ORDER BY day""")),

    // template/chrome detection: fraction of each doc's distinct
    // sentences shared with >3 other docs — the sentence-granular
    // complement of q101's span dedup
    Q("q232_boilerplate", (s, d) => {
      import s.implicits._
      TextAnalysis.boilerplateRatio(T.documents(s, d), "doc_id", "text",
          minDocs = 3)
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id,
                        list_filter(list_transform(
                          regexp_split_to_array(text, '[.!?]+'),
                          x -> trim(x)), x -> length(x) > 0) AS sent
                 FROM documents),
      ds AS (SELECT DISTINCT doc_id, s FROM
               (SELECT doc_id, unnest(sent) AS s FROM t)),
      dfq AS (SELECT s, count(DISTINCT doc_id) AS df FROM ds GROUP BY 1)
      SELECT doc_id, count(*) AS n_sentences,
             sum(CASE WHEN df > 3 THEN 1 ELSE 0 END) AS n_boilerplate,
             round(sum(CASE WHEN df > 3 THEN 1 ELSE 0 END)
               / CAST(count(*) AS DOUBLE), 6) AS boilerplate_ratio
      FROM ds JOIN dfq USING (s) GROUP BY 1 ORDER BY doc_id"""))
  )
}
