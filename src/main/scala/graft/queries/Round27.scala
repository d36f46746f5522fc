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
    // top-20 down to 5 — the greedy trace is not SQL-expressible, so
    // rows-only + Round27OpsSpec's hand-built duplicate-cluster case
    Q("q243_mmr", (s, d) => {
      import s.implicits._
      val vectors = T.embeddings(s, d)
      val probes = vectors.filter($"vec_id" < 10)
      val top = Similarity.bruteForceTopK(vectors, probes, 20)
        .join(vectors.select($"vec_id", $"embedding"), "vec_id")
        .select($"probe_id", $"vec_id", $"sim", $"embedding")
      Similarity.mmrRerank(top, k = 5, lambda = 0.7)
        .orderBy($"probe_id", $"rank")
    }, None)
  )
}
