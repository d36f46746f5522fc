package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Profile, Similarity}
import graft.sources.{Tables => T}

/** Round-6 nineteenth wave: data contracts, MMR diversity rerank.
  */
object Round27 {

  val all: Seq[Q] = Seq(

    // the ingest gate as a query: five row-level contract rules in ONE
    // scan, plus the uniqueness and referential rules that need their
    // own shuffles, unioned into a single violations report
    Q("q242_expectations", (s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
      val rules = Profile.expectations(o, Seq(
        "custkey_notnull" -> $"o_custkey".isNull,
        "orderdate_range" ->
          ($"o_orderdate" < lit("1990-01-01").cast("timestamp") ||
            $"o_orderdate" > lit("2005-01-01").cast("timestamp")),
        "status_domain" -> !$"o_orderstatus".isin("F", "O", "P"),
        "totalprice_nonneg" -> ($"o_totalprice" < 0),
        "totalprice_upper" -> ($"o_totalprice" > 450000)))
      val uniq = Profile.uniquenessViolations(o, "o_orderkey")
      val nAll = o.agg(count(lit(1)).as("__n"))
      val orphans = o.join(
          T.customer(s, d).select($"c_custkey".as("o_custkey")),
          Seq("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("__v"))
        .crossJoin(broadcast(nAll))
        .select(lit("fk_custkey").as("rule"), $"__v".as("n_violations"),
          round($"__v".cast("double") / $"__n", 6).as("violation_rate"))
      rules.unionAll(uniq).unionAll(orphans).orderBy($"rule")
    }, Some("""
      WITH n AS (SELECT count(*) AS nn FROM orders),
      r AS (
        SELECT 'custkey_notnull' AS rule,
               sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v
        FROM orders
        UNION ALL
        SELECT 'orderdate_range',
               sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                          OR o_orderdate > TIMESTAMP '2005-01-01'
                        THEN 1 ELSE 0 END)
        FROM orders
        UNION ALL
        SELECT 'status_domain',
               sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                        THEN 1 ELSE 0 END)
        FROM orders
        UNION ALL
        SELECT 'totalprice_nonneg',
               sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)
        FROM orders
        UNION ALL
        SELECT 'totalprice_upper',
               sum(CASE WHEN o_totalprice > 450000 THEN 1 ELSE 0 END)
        FROM orders
        UNION ALL
        SELECT 'unique_o_orderkey',
               coalesce((SELECT sum(c) FROM (
                 SELECT count(*) AS c FROM orders GROUP BY o_orderkey
                 HAVING count(*) > 1)), 0)
        UNION ALL
        SELECT 'fk_custkey',
               (SELECT count(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey)))
      SELECT rule, v AS n_violations,
             round(CAST(v AS DOUBLE) / nn, 6) AS violation_rate
      FROM r, n ORDER BY rule""")),

    // retrieval diversity: MMR rerank of each probe's brute-force
    // top-20 down to 5. The greedy trace is a recursive CTE (one row
    // per probe per rank, selected ids carried as a list): each step
    // re-joins the remaining candidates against the pairwise cosine
    // table restricted to the selected set and takes the windowed
    // argmax of λ·sim − (1−λ)·maxsim with the (score desc, vec_id)
    // tie-break — exactly the Scala fold. Double-constant parity:
    // (1.0 − 0.7) is computed IN DOUBLE on both sides (DuckDB's bare
    // decimal literals would give a 1-ulp-different 0.3); relevance AND
    // the pairwise cosines are 6-rounded (the q32/q33 basis), so every
    // score is the same short dot of 6-decimal rationals on both
    // engines and ships UNROUNDED (rounding λ·sim would sit on a
    // decimal half for every odd-final-digit sim — the q405 trap).
    Q("q243_mmr", (s, d) => {
      import s.implicits._
      val vectors = T.embeddings(s, d)
      val probes = vectors.filter($"vec_id" < 10)
      val top = Similarity.bruteForceTopK(vectors, probes, 20)
        .join(vectors.select($"vec_id", $"embedding"), "vec_id")
        .select($"probe_id", $"vec_id", $"sim", $"embedding")
      Similarity.mmrRerank(top, k = 5, lambda = 0.7)
        .orderBy($"probe_id", $"rank")
    }, Some("""
      WITH RECURSIVE cand AS (
        SELECT probe_id, vec_id, sim, embedding FROM (
          SELECT a.vec_id AS probe_id, b.vec_id AS vec_id,
                 round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim,
                 b.embedding AS embedding,
                 row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) DESC,
                            b.vec_id) AS rnk
          FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id
          WHERE a.vec_id < 10) t
        WHERE rnk <= 20),
      pair AS (
        SELECT a.probe_id, a.vec_id AS i, b.vec_id AS j,
               round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cs
        FROM cand a JOIN cand b ON a.probe_id = b.probe_id AND a.vec_id != b.vec_id),
      pick(probe_id, rank, vec_id, sim, mmr_score, selected) AS (
        SELECT probe_id, 1 AS rank, vec_id, sim,
               0.7::DOUBLE * sim AS mmr_score, [vec_id] AS selected
        FROM (SELECT probe_id, vec_id, sim,
                     row_number() OVER (PARTITION BY probe_id
                       ORDER BY 0.7::DOUBLE * sim DESC, vec_id) AS rn
              FROM cand) b0
        WHERE rn = 1
        UNION ALL
        SELECT probe_id, rank, vec_id, sim, mmr_score, list_append(selected, vec_id)
        FROM (
          SELECT p.probe_id, p.rank + 1 AS rank, c.vec_id, c.sim,
                 0.7::DOUBLE * c.sim - (1.0::DOUBLE - 0.7::DOUBLE) * max(pr.cs) AS mmr_score,
                 p.selected,
                 row_number() OVER (PARTITION BY p.probe_id
                   ORDER BY 0.7::DOUBLE * c.sim - (1.0::DOUBLE - 0.7::DOUBLE) * max(pr.cs) DESC,
                            c.vec_id) AS rn
          FROM pick p
          JOIN cand c ON c.probe_id = p.probe_id AND NOT list_contains(p.selected, c.vec_id)
          JOIN pair pr ON pr.probe_id = p.probe_id AND pr.i = c.vec_id
                      AND list_contains(p.selected, pr.j)
          WHERE p.rank < 5
          GROUP BY p.probe_id, p.rank, c.vec_id, c.sim, p.selected
        ) s
        WHERE rn = 1)
      SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id, sim, mmr_score
      FROM pick ORDER BY probe_id, rank"""))
  )
}
