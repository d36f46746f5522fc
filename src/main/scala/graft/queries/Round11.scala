package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph, Profile, TextAnalysis}
import graft.sources.{Tables => T}

/** Round-6 third wave: held-out LM perplexity, dedup-cluster audit,
  * vocabulary growth, Adamic–Adar link prediction, FK integrity audit.
  */
object Round11 {

  val all: Seq[Q] = Seq(

    // held-out bigram LM scoring: model trained on the 80% train split
    // (doc_id % 5 != 0), applied to the 20% held-out docs — unseen
    // bigrams/contexts hit the add-α floor through LEFT joins, the
    // cases self-scoring (q115) never sees
    Q("q185_heldout_lm", (s, d) => {
      import s.implicits._
      val docs = T.documents(s, d)
      val train = docs.filter($"doc_id" % 5 =!= 0)
      val test = docs.filter($"doc_id" % 5 === 0)
      TextAnalysis.bigramLogProbHeldOut(train, test, "doc_id", "text",
          alpha = 0.5)
        .select($"id".as("doc_id"), $"n_bigrams", $"avg_logp")
        .orderBy($"doc_id")
    }, Some("""
      WITH tr AS (SELECT regexp_split_to_array(trim(text), '\s+') AS ws
                  FROM documents WHERE doc_id % 5 != 0),
      te AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
             FROM documents WHERE doc_id % 5 = 0),
      bi_tr AS (SELECT unnest(ws[1:len(ws)-1]) AS a,
                       unnest(ws[2:len(ws)]) AS b
                FROM tr WHERE len(ws) >= 2),
      c2 AS (SELECT a, b, count(*) AS c2 FROM bi_tr GROUP BY a, b),
      c1 AS (SELECT a, sum(c2) AS c1 FROM c2 GROUP BY a),
      v AS (SELECT count(DISTINCT w) AS v
            FROM (SELECT unnest(ws) AS w FROM tr) t),
      bi AS (SELECT doc_id, unnest(ws[1:len(ws)-1]) AS a,
                    unnest(ws[2:len(ws)]) AS b
             FROM te WHERE len(ws) >= 2)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             round(avg(ln((coalesce(c2.c2, 0) + 0.5)
               / (coalesce(c1.c1, 0) + 0.5 * v.v))), 6) AS avg_logp
      FROM bi LEFT JOIN c2 USING (a, b) LEFT JOIN c1 USING (a) CROSS JOIN v
      GROUP BY doc_id ORDER BY doc_id""")),

    // dedup-cluster audit: near-dup groups (q66's components) folded to
    // a cluster-size histogram with per-size duplicate counts — the
    // report that says what a dedup pass would actually remove
    Q("q186_cluster_stats", (s, d) => {
      import s.implicits._
      val pairs = Dedup.minHashNearDupPairs(T.documents(s, d),
        "doc_id", "text", 0.5)
      val comps = Dedup.connectedComponents(pairs, "a_id", "b_id")
      comps.groupBy($"component")
        .agg(count(lit(1)).as("__sz"))
        .groupBy($"__sz".as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum($"__sz").as("n_docs"),
          sum($"__sz" - 1).as("n_removable"))
        .orderBy($"cluster_size")
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
      pairs AS (SELECT a_id, b_id
                FROM jcom JOIN jsz sa ON sa.doc_id = a_id
                          JOIN jsz sb ON sb.doc_id = b_id
                WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5),
      edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
                UNION SELECT b_id, a_id FROM pairs),
      reach AS (SELECT src AS id, src AS lbl FROM edges
                UNION
                SELECT e.dst AS id, r.lbl
                FROM reach r JOIN edges e ON e.src = r.id),
      comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
      sz AS (SELECT component, count(*) AS sz FROM comp GROUP BY 1)
      SELECT sz AS cluster_size, count(*) AS n_clusters,
             sum(sz) AS n_docs, sum(sz - 1) AS n_removable
      FROM sz GROUP BY 1 ORDER BY cluster_size""")),

    // vocabulary growth (Heaps-law read-out): distinct vocab seen within
    // the first N docs, for a ladder of N — one explode, one min-first-
    // appearance aggregate, conditional counts against the ladder
    Q("q187_vocab_growth", (s, d) => {
      import s.implicits._
      val first = T.documents(s, d)
        .select($"doc_id", explode(TextAnalysis.tokens($"text")).as("tok"))
        .groupBy($"tok").agg(min($"doc_id").as("__fd"))
      first
        .select(explode(typedLit(Seq(50L, 100L, 200L, 500L))).as("n_docs"),
          $"__fd")
        .filter($"__fd" < $"n_docs")
        .groupBy($"n_docs")
        .agg(count(lit(1)).as("vocab_size"))
        .orderBy($"n_docs")
    }, Some("""
      WITH t AS (SELECT doc_id,
                        unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
                 FROM documents),
      f AS (SELECT tok, min(doc_id) AS fd FROM t GROUP BY 1),
      n AS (SELECT unnest([50, 100, 200, 500]) AS n_docs)
      SELECT CAST(n_docs AS BIGINT) AS n_docs, count(*) AS vocab_size
      FROM f JOIN n ON f.fd < n.n_docs
      GROUP BY 1 ORDER BY n_docs""")),

    // Adamic-Adar link prediction on the trade graph: supplier pairs
    // sharing customers, hub centers capped (suppliers, deg >= 443,
    // never expand; customers, deg <= ~70, do) — top 25 predicted links
    Q("q188_adamic_adar", (s, d) => {
      import s.implicits._
      val edges = T.orders(s, d)
        .join(T.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .select(($"o_custkey" * 2).as("src"),
          ($"l_suppkey" * 2 + 1).as("dst"))
      // exact integer decode (u div 2 for either parity): float `/` +
      // cast truncates even ids while DuckDB's CAST rounds — latent
      // cross-engine divergence whenever a customer id reaches the top-k
      Graph.adamicAdar(edges, "src", "dst", maxHubDegree = 100)
        .select(expr("u div 2").as("s1"),
          expr("v div 2").as("s2"),
          $"common_neighbors", $"aa")
        .orderBy($"aa".desc, $"s1", $"s2").limit(25)
    }, Some("""
      WITH canon AS (SELECT DISTINCT
                       least(o_custkey * 2, l_suppkey * 2 + 1) AS a,
                       greatest(o_custkey * 2, l_suppkey * 2 + 1) AS b
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      adj AS (SELECT a AS w, b AS n FROM canon
              UNION ALL SELECT b, a FROM canon),
      deg AS (SELECT w, count(*) AS deg FROM adj GROUP BY 1),
      ctr AS (SELECT adj.w, adj.n, deg.deg FROM adj JOIN deg USING (w)
              WHERE deg BETWEEN 2 AND 100),
      scored AS (SELECT x.n AS u, y.n AS v, count(*) AS common_neighbors,
                        round(sum(1.0 / ln(x.deg)), 6) AS aa
                 FROM ctr x JOIN ctr y ON x.w = y.w AND x.n < y.n
                 GROUP BY 1, 2),
      nk AS (SELECT u, v, common_neighbors, aa FROM scored
             WHERE NOT EXISTS (SELECT 1 FROM canon
                               WHERE canon.a = scored.u
                                 AND canon.b = scored.v))
      SELECT CAST(u // 2 AS BIGINT) AS s1,
             CAST(v // 2 AS BIGINT) AS s2, common_neighbors, aa
      FROM nk ORDER BY aa DESC, s1, s2 LIMIT 25""")),

    // referential-integrity audit over the star schema's FK relations —
    // the ingest gate before any join trusts its keys
    Q("q189_fk_audit", (s, d) => {
      import s.implicits._
      Profile.fkAudit(Seq(
          ("lineitem.l_orderkey->orders", T.lineitem(s, d), "l_orderkey",
            T.orders(s, d), "o_orderkey"),
          ("lineitem.l_partkey->part", T.lineitem(s, d), "l_partkey",
            T.part(s, d), "p_partkey"),
          ("lineitem.l_suppkey->supplier", T.lineitem(s, d), "l_suppkey",
            T.supplier(s, d), "s_suppkey"),
          ("orders.o_custkey->customer", T.orders(s, d), "o_custkey",
            T.customer(s, d), "c_custkey"),
          ("customer.c_nationkey->nation", T.customer(s, d), "c_nationkey",
            T.nation(s, d), "n_nationkey")))
        .orderBy($"relation")
    }, Some("""
      SELECT 'lineitem.l_orderkey->orders' AS relation,
             count(*) AS n_rows,
             count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS n_null_fk,
             count(CASE WHEN l_orderkey IS NOT NULL
                         AND o_orderkey IS NULL THEN 1 END) AS n_orphans,
             round(count(CASE WHEN l_orderkey IS NOT NULL
                               AND o_orderkey IS NULL THEN 1 END) * 1.0
               / count(*), 6) AS orphan_rate
      FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
      UNION ALL
      SELECT 'lineitem.l_partkey->part', count(*),
             count(CASE WHEN l_partkey IS NULL THEN 1 END),
             count(CASE WHEN l_partkey IS NOT NULL
                         AND p_partkey IS NULL THEN 1 END),
             round(count(CASE WHEN l_partkey IS NOT NULL
                               AND p_partkey IS NULL THEN 1 END) * 1.0
               / count(*), 6)
      FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
      UNION ALL
      SELECT 'lineitem.l_suppkey->supplier', count(*),
             count(CASE WHEN l_suppkey IS NULL THEN 1 END),
             count(CASE WHEN l_suppkey IS NOT NULL
                         AND s_suppkey IS NULL THEN 1 END),
             round(count(CASE WHEN l_suppkey IS NOT NULL
                               AND s_suppkey IS NULL THEN 1 END) * 1.0
               / count(*), 6)
      FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
      UNION ALL
      SELECT 'orders.o_custkey->customer', count(*),
             count(CASE WHEN o_custkey IS NULL THEN 1 END),
             count(CASE WHEN o_custkey IS NOT NULL
                         AND c_custkey IS NULL THEN 1 END),
             round(count(CASE WHEN o_custkey IS NOT NULL
                               AND c_custkey IS NULL THEN 1 END) * 1.0
               / count(*), 6)
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      UNION ALL
      SELECT 'customer.c_nationkey->nation', count(*),
             count(CASE WHEN c_nationkey IS NULL THEN 1 END),
             count(CASE WHEN c_nationkey IS NOT NULL
                         AND n_nationkey IS NULL THEN 1 END),
             round(count(CASE WHEN c_nationkey IS NOT NULL
                               AND n_nationkey IS NULL THEN 1 END) * 1.0
               / count(*), 6)
      FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
      ORDER BY relation"""))
  )
}
