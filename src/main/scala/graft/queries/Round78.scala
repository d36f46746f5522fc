package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Hypothesis, Metrics, Quantiles}
import graft.sources.{Tables => T}

/** Round-9 wave #2: extreme-value and dependence diagnostics — the tail
  * behavior questions a pipeline asks before trusting means and
  * correlations — plus the two structural-break/causality tests the
  * time-series family lacked: Hill's Pareto tail index (heavy-tail
  * detection), empirical tail dependence (the copula diagnostic), the
  * Pettitt rank changepoint, and lag-1 Granger causality.
  * House rules as ever: every data-sized reduction exact (longs /
  * DECIMAL(38,0) / doubled midranks), bounded fold order fixed and
  * replayed verbatim by the oracle, integer division never spelled as a
  * float cast, hash-safe finals.
  */
object Round78 {

  val all: Seq[Q] = Seq(

    // how heavy is the order-value tail per market segment? Hill
    // estimator over the top-101 order totals — the k+1 survivors come
    // off the bounded-heap TopKPerGroup operator (O(n log k) map-side,
    // shuffle of at most groups*(k+1)*partitions rows), never a
    // data-sized sort; the only float reduction is the fixed-order fold
    // of 100 log-ratios over one bounded array
    Q("q403_hill_tail", (s, d) => {
      import s.implicits._
      val o = T.orders(s, d).select($"o_custkey",
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      val j = o.join(T.customer(s, d)
          .select($"c_custkey", $"c_mktsegment"),
        $"o_custkey" === $"c_custkey")
      Quantiles.hillTailIndex(j, Seq("c_mktsegment"), "cents", k = 100)
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH v AS (SELECT c.c_mktsegment AS g,
                        CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS v
                 FROM orders o JOIN customer c
                   ON o.o_custkey = c.c_custkey),
      t AS (SELECT g, v,
                   row_number() OVER (PARTITION BY g ORDER BY v DESC) AS rn
            FROM v WHERE v > 0),
      l AS (SELECT g, list(v ORDER BY v DESC) AS lst, count(*) AS cnt,
                   min(v) AS xk
            FROM t WHERE rn <= 101 GROUP BY g HAVING count(*) = 101),
      h AS (SELECT g, xk,
                   list_reduce(list_transform(lst[1:100],
                     x -> ln(CAST(x AS DOUBLE) / CAST(xk AS DOUBLE))),
                     (a, b) -> a + b) / 100.0 AS hill
            FROM l)
      SELECT g AS c_mktsegment, CAST(100 AS BIGINT) AS k,
             CAST(xk AS BIGINT) AS x_k,
             round(hill, 6) AS hill, round(1.0 / hill, 6) AS alpha
      FROM h WHERE hill > 0 ORDER BY g""")),

    // do a customer's TOTAL spend and LARGEST single order go extreme
    // together? Empirical upper/lower tail dependence per segment at the
    // decile level — rank-counts off the grouped-midrank spine (segment
    // is 5-valued; a segment-keyed cume window would be one task per
    // segment), tail membership and the joint counts all exact integers
    Q("q404_tail_dependence", (s, d) => {
      import s.implicits._
      val per = T.orders(s, d)
        .groupBy($"o_custkey")
        .agg(sum(($"o_totalprice".cast("decimal(18,2)") * 100)
            .cast("long")).as("tot"),
          max(($"o_totalprice".cast("decimal(18,2)") * 100)
            .cast("long")).as("mx"))
      val j = per.join(T.customer(s, d)
          .select($"c_custkey", $"c_mktsegment"),
        $"o_custkey" === $"c_custkey")
      Metrics.tailDependence(j, "c_mktsegment", "tot", "mx",
          tailDenom = 10)
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH per AS (SELECT o_custkey,
                          sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                            AS BIGINT)) AS tot,
                          max(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                            AS BIGINT)) AS mx
                   FROM orders GROUP BY 1),
      j AS (SELECT c.c_mktsegment AS g, per.tot, per.mx
            FROM per JOIN customer c ON per.o_custkey = c.c_custkey),
      r AS (SELECT g, tot, mx,
                   count(*) OVER (PARTITION BY g ORDER BY tot) AS cx,
                   count(*) OVER (PARTITION BY g ORDER BY mx) AS cy,
                   count(*) OVER (PARTITION BY g) AS n
            FROM j),
      a AS (SELECT g, max(n) AS n, max(n // 10) AS m,
                   sum(CASE WHEN cx > n - n // 10 AND cy > n - n // 10
                       THEN 1 ELSE 0 END) AS n_upper,
                   sum(CASE WHEN cx <= n // 10 AND cy <= n // 10
                       THEN 1 ELSE 0 END) AS n_lower
            FROM r GROUP BY 1)
      SELECT g AS c_mktsegment, CAST(n AS BIGINT) AS n,
             CAST(m AS BIGINT) AS m, CAST(n_upper AS BIGINT) AS n_upper,
             round(CAST(n_upper AS DOUBLE) / CAST(m AS DOUBLE), 6)
               AS lambda_u,
             CAST(n_lower AS BIGINT) AS n_lower,
             round(CAST(n_lower AS DOUBLE) / CAST(m AS DOUBLE), 6)
               AS lambda_l
      FROM a WHERE m > 0 ORDER BY g""")),

    // did the daily-revenue regime break, and when? Pettitt rank
    // changepoint per order priority over the calendar-bounded daily
    // series — U_t from doubled-midrank cumsums (exactly integral), K
    // and the changepoint day a plain integer max + first-argmax
    Q("q406_pettitt", (s, d) => {
      import s.implicits._
      val daily = T.orders(s, d)
        .groupBy($"o_orderpriority", $"o_orderdate")
        .agg(sum(($"o_totalprice".cast("decimal(18,2)") * 100)
          .cast("long")).as("rev"))
      Hypothesis.pettitt(daily, "o_orderpriority", "o_orderdate", "rev")
        .orderBy($"o_orderpriority")
    }, Some("""
      WITH dv AS (SELECT o_orderpriority AS k, o_orderdate AS i,
                         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS v
                  FROM orders GROUP BY 1, 2),
      r AS (SELECT k, i,
                   2 * rank() OVER (PARTITION BY k ORDER BY v)
                     + count(*) OVER (PARTITION BY k, v) - 1 AS r2,
                   row_number() OVER (PARTITION BY k ORDER BY i) AS t,
                   count(*) OVER (PARTITION BY k) AS n
            FROM dv),
      u AS (SELECT k, i, t, n,
                   sum(r2) OVER (PARTITION BY k ORDER BY t)
                     - t * (n + 1) AS uu
            FROM r),
      km AS (SELECT k, max(n) AS n, max(abs(uu)) AS ks
             FROM u WHERE t < n GROUP BY 1),
      cp AS (SELECT u.k, min(u.i) AS changepoint
             FROM u JOIN km ON u.k = km.k AND abs(u.uu) = km.ks
             WHERE u.t < km.n GROUP BY 1)
      SELECT km.k AS o_orderpriority, CAST(km.n AS BIGINT) AS n,
             CAST(km.ks AS BIGINT) AS k_stat, cp.changepoint,
             round(2.0 * exp(-6.0 * CAST(km.ks AS DOUBLE)
                 * CAST(km.ks AS DOUBLE)
               / (CAST(km.n AS DOUBLE) * CAST(km.n AS DOUBLE)
                   * CAST(km.n AS DOUBLE)
                 + CAST(km.n AS DOUBLE) * CAST(km.n AS DOUBLE))), 6)
               AS p_approx
      FROM km JOIN cp ON km.k = cp.k
      WHERE km.n > 2 ORDER BY km.k""")),

    // does yesterday's ORDER VOLUME predict today's revenue beyond
    // yesterday's revenue itself? Lag-1 Granger causality per priority:
    // both OLS fits in closed form from one exact moment aggregate
    // (longs + DECIMAL(38,0)), F from the two RSS — no iterative fitting
    Q("q405_granger", (s, d) => {
      import s.implicits._
      val daily = T.orders(s, d)
        .groupBy($"o_orderpriority", $"o_orderdate")
        .agg(sum(($"o_totalprice".cast("decimal(18,2)") * 100)
            .cast("long")).as("rev"),
          count(lit(1)).as("cnt"))
      Hypothesis.grangerLag1(daily, "o_orderpriority", "o_orderdate",
          "rev", "cnt")
        .orderBy($"o_orderpriority")
    }, Some("""
      WITH dv AS (SELECT o_orderpriority AS k, o_orderdate AS i,
                         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS y,
                         count(*) AS x
                  FROM orders GROUP BY 1, 2),
      lg AS (SELECT k, y,
                    lag(y) OVER (PARTITION BY k ORDER BY i) AS a,
                    lag(x) OVER (PARTITION BY k ORDER BY i) AS b
             FROM dv),
      m AS (SELECT k, count(*) AS n,
                   sum(a) AS p, sum(b) AS q, sum(y) AS sy,
                   sum(CAST(a AS HUGEINT) * a) AS saa,
                   sum(CAST(a AS HUGEINT) * b) AS sab,
                   sum(CAST(b AS HUGEINT) * b) AS sbb,
                   sum(CAST(a AS HUGEINT) * y) AS say,
                   sum(CAST(b AS HUGEINT) * y) AS sby,
                   sum(CAST(y AS HUGEINT) * y) AS syy
            FROM lg WHERE a IS NOT NULL AND b IS NOT NULL GROUP BY 1),
      f AS (SELECT k, n,
                   CAST(n AS DOUBLE) AS nd, CAST(p AS DOUBLE) AS pd,
                   CAST(q AS DOUBLE) AS qd, CAST(sy AS DOUBLE) AS syd,
                   CAST(saa AS DOUBLE) AS ad, CAST(sab AS DOUBLE) AS bd,
                   CAST(sbb AS DOUBLE) AS cd, CAST(say AS DOUBLE) AS s1y,
                   CAST(sby AS DOUBLE) AS s2y, CAST(syy AS DOUBLE) AS syy
            FROM m),
      c AS (SELECT k, n, nd, syd, s1y, s2y, syy, pd,
                   nd * (ad * cd - bd * bd) - pd * (pd * cd - bd * qd)
                     + qd * (pd * bd - ad * qd) AS det,
                   syd * (ad * cd - bd * bd) - pd * (s1y * cd - bd * s2y)
                     + qd * (s1y * bd - s2y * ad) AS d0,
                   nd * (s1y * cd - bd * s2y) - syd * (pd * cd - bd * qd)
                     + qd * (pd * s2y - s1y * qd) AS d1,
                   nd * (ad * s2y - s1y * bd) - pd * (pd * s2y - s1y * qd)
                     + syd * (pd * bd - ad * qd) AS d2,
                   nd * ad - pd * pd AS sxx
            FROM f),
      r AS (SELECT k, n, det, sxx,
                   syy - (d0 / det) * syd - (d1 / det) * s1y
                       - (d2 / det) * s2y AS rss_u,
                   syy - ((syd - ((nd * s1y - pd * syd) / sxx) * pd) / nd)
                         * syd
                       - ((nd * s1y - pd * syd) / sxx) * s1y AS rss_r,
                   d1 / det AS b1u, d2 / det AS b2u
            FROM c)
      SELECT k AS o_orderpriority, CAST(n AS BIGINT) AS n,
             round(b1u, 6) AS b_ylag, round(b2u, 6) AS b_xlag,
             rss_r, rss_u,
             round((rss_r - rss_u) * (CAST(n AS DOUBLE) - 3.0) / rss_u, 6)
               AS f_stat,
             CAST(n - 3 AS BIGINT) AS df2
      FROM r
      WHERE n > 3 AND det <> 0 AND sxx <> 0 AND rss_u > 0
      ORDER BY k"""))
  )
}
