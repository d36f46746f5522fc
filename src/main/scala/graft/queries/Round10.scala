package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Quantiles, TextAnalysis, TimeSeries}
import graft.sources.{Tables => T}

/** Round-6 second wave: multi-step funnel, interval coverage
  * (gaps-and-islands), positional co-occurrence, robust scaling, and
  * degree assortativity.
  */
object Round10 {

  val all: Seq[Q] = Seq(

    // 3-step ordered funnel: first view → first click within 7 days of
    // it → first purchase within 7 days of that — per-user conditional
    // min aggregates chained through keyed joins (q76's shape, one more
    // step), folded to one row
    Q("q180_funnel3", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val week = expr("INTERVAL 7 DAYS")
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("v_ts"))
      val c = ev.filter($"event_type" === "click")
        .join(v, "user_id")
        .filter($"ts" > $"v_ts" && $"ts" <= $"v_ts" + week)
        .groupBy($"user_id").agg(min($"ts").as("c_ts"))
      val p = ev.filter($"event_type" === "purchase")
        .join(c, "user_id")
        .filter($"ts" > $"c_ts" && $"ts" <= $"c_ts" + week)
        .groupBy($"user_id").agg(min($"ts").as("p_ts"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_full")))
    }, Some("""
      WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
                 WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, min(e.ts) AS c_ts
            FROM events e JOIN v ON v.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ts > v.v_ts
              AND e.ts <= v.v_ts + INTERVAL 7 DAY
            GROUP BY 1),
      p AS (SELECT e.user_id, min(e.ts) AS p_ts
            FROM events e JOIN c ON c.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
              AND e.ts <= c.c_ts + INTERVAL 7 DAY
            GROUP BY 1)
      SELECT (SELECT count(*) FROM v) AS n_view,
             (SELECT count(*) FROM c) AS n_view_click,
             (SELECT count(*) FROM p) AS n_full""")),

    // per-customer order-window coverage: overlapping [orderdate, +14d]
    // intervals merged into maximal islands (gaps-and-islands, one
    // keyed window pass), then island counts + distinct covered days
    Q("q181_interval_coverage", (s, d) => {
      import s.implicits._
      val iv = T.orders(s, d).select($"o_custkey",
        to_date($"o_orderdate").as("s"),
        date_add(to_date($"o_orderdate"), 14).as("e"))
      TimeSeries.mergeIntervals(iv, "o_custkey", "s", "e")
        .groupBy($"key".as("o_custkey"))
        .agg(count(lit(1)).as("n_islands"),
          sum($"n_intervals").as("n_orders"),
          sum(datediff($"island_end", $"island_start") + 1)
            .as("covered_days"))
        .orderBy($"o_custkey")
    }, Some("""
      WITH iv AS (SELECT o_custkey AS key, CAST(o_orderdate AS DATE) AS s,
                         CAST(o_orderdate AS DATE) + 14 AS e
                  FROM orders),
      x AS (SELECT key, s, e,
                   max(e) OVER (PARTITION BY key ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
            FROM iv),
      z AS (SELECT key, s, e,
                   sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
                     OVER (PARTITION BY key ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS island
            FROM x),
      isl AS (SELECT key, island, min(s) AS i_s, max(e) AS i_e,
                     count(*) AS n
              FROM z GROUP BY 1, 2)
      SELECT key AS o_custkey, count(*) AS n_islands, sum(n) AS n_orders,
             sum(date_diff('day', i_s, i_e) + 1) AS covered_days
      FROM isl GROUP BY 1 ORDER BY o_custkey""")),

    // positional skip-gram co-occurrence (±2 tokens, ordered pairs):
    // pairs materialize map-side inside one array-HOF chain — the only
    // shuffle is the pair aggregate; top-50 by count via TakeOrdered
    Q("q182_cooccurrence", (s, d) => {
      import s.implicits._
      TextAnalysis.cooccurrencePairs(T.documents(s, d), "text", 2)
        .orderBy($"n".desc, $"w1", $"w2").limit(50)
    }, Some("""
      WITH w AS (SELECT regexp_split_to_array(trim(text), '\s+') AS ws
                 FROM documents),
      i AS (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
            FROM w WHERE len(ws) >= 2),
      j AS (SELECT ws, i, unnest(generate_series(1, 2)) AS j FROM i),
      p AS (SELECT ws[CAST(i AS INT)] AS w1,
                   ws[CAST(i + j AS INT)] AS w2
            FROM j WHERE i + j <= len(ws))
      SELECT w1, w2, count(*) AS n FROM p GROUP BY 1, 2
      ORDER BY n DESC, w1, w2 LIMIT 50""")),

    // robust feature scaling: (quantity − median) / IQR per return
    // flag — one exact-quantile sort pass for all three boundaries,
    // broadcastable stats join, map-side projection
    Q("q183_robust_scale", (s, d) => {
      import s.implicits._
      Quantiles.robustScale(T.lineitem(s, d)
          .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
            $"l_quantity"),
          Seq("l_returnflag"), "l_quantity")
        .orderBy($"l_orderkey", $"l_linenumber")
    }, Some("""
      WITH q AS (SELECT l_returnflag,
                        quantile_cont(l_quantity, 0.25) AS lo,
                        quantile_cont(l_quantity, 0.50) AS med,
                        quantile_cont(l_quantity, 0.75) AS hi
                 FROM lineitem GROUP BY 1)
      SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_quantity,
             CASE WHEN hi > lo
               THEN round((l.l_quantity - med) / (hi - lo), 6) END
               AS l_quantity_scaled
      FROM lineitem l JOIN q USING (l_returnflag)
      ORDER BY l_orderkey, l_linenumber""")),

    // degree assortativity of the customer↔supplier trade graph: the
    // one-number topology fingerprint (hub-to-hub vs hub-and-spoke)
    // from integer-exact correlation moments
    Q("q184_degree_mix", (s, d) => {
      import s.implicits._
      val edges = T.orders(s, d)
        .join(T.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .select(($"o_custkey" * 2).as("src"),
          ($"l_suppkey" * 2 + 1).as("dst"))
      Graph.degreeMixing(edges, "src", "dst")
    }, Some("""
      WITH canon AS (SELECT DISTINCT
                       least(o_custkey * 2, l_suppkey * 2 + 1) AS a,
                       greatest(o_custkey * 2, l_suppkey * 2 + 1) AS b
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      deg AS (SELECT node, count(*) AS deg FROM
                (SELECT a AS node FROM canon
                 UNION ALL SELECT b FROM canon)
              GROUP BY 1),
      m AS (SELECT count(*) AS m,
                   sum(da.deg + db.deg) AS sx,
                   sum(da.deg * da.deg + db.deg * db.deg) AS sxx,
                   sum(da.deg * db.deg * 2) AS sxy
            FROM canon JOIN deg da ON da.node = canon.a
                       JOIN deg db ON db.node = canon.b),
      ds AS (SELECT count(*) AS n_nodes, sum(deg) AS sumdeg,
                    max(deg) AS max_deg
             FROM deg)
      SELECT n_nodes, m AS n_edges,
             round(sumdeg::DOUBLE / n_nodes, 6) AS mean_deg, max_deg,
             round(((2 * m)::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sx::DOUBLE)
               / ((2 * m)::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE),
               6) AS assortativity
      FROM ds, m"""))
  )
}
