package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Hypothesis, TimeSeries}
import graft.sources.{Tables => T}

/** Round-9 wave: the remaining classical-test families the suite lacked —
  * blocked-design rank ANOVA (Friedman), the paired-samples test
  * (Wilcoxon signed-rank), concordance-based rank correlation
  * (Kendall τ-b on the bounded contingency table), and seasonal
  * forecasting (additive Holt–Winters as one deterministic fold).
  * House rules: doubled midranks / DECIMAL(38,0) moments for every
  * data-sized reduction, identical expression structure in both
  * engines' final double formulas, one rounding, hash-safe finals.
  */
object Round77 {

  val all: Seq[Q] = Seq(

    // does event value differ by event type once each user's own level
    // is controlled for? Friedman blocked rank test per weekday —
    // blocks = users (complete blocks only), treatments = the 5 event
    // types, in-block doubled midranks over exact cent sums
    Q("q399_friedman", (s, d) => {
      import s.implicits._
      val cell = T.events(s, d)
        .groupBy(dayofweek($"ts").cast("long").as("dow"), $"user_id",
          $"event_type")
        .agg(sum(($"value".cast("decimal(18,2)") * 100).cast("long"))
          .as("cents"))
      Hypothesis.friedman(cell, "dow", "user_id", "event_type", "cents")
        .orderBy($"dow")
    }, Some("""
      WITH cell AS (SELECT dayofweek(ts) + 1 AS dow, user_id AS u,
                           event_type AS t,
                           sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS v
                    FROM events GROUP BY 1, 2, 3),
      k AS (SELECT dow, count(DISTINCT t) AS kk FROM cell GROUP BY 1),
      compl AS (SELECT c.dow, c.u FROM cell c JOIN k USING (dow)
                GROUP BY c.dow, c.u, k.kk
                HAVING count(DISTINCT c.t) = k.kk),
      r AS (SELECT c.dow, c.u, c.t,
                   2 * rank() OVER (PARTITION BY c.dow, c.u ORDER BY c.v)
                     + count(*) OVER (PARTITION BY c.dow, c.u, c.v) - 1 AS d
            FROM cell c JOIN compl ON c.dow = compl.dow AND c.u = compl.u),
      pg AS (SELECT dow, count(DISTINCT u) AS n,
                    sum(CAST(d AS HUGEINT) * d) AS a4
             FROM r GROUP BY 1),
      pt AS (SELECT dow, t, sum(d) AS r2 FROM r GROUP BY 1, 2),
      sd AS (SELECT pt.dow,
                    sum(CAST(pt.r2 - pg.n * (k.kk + 1) AS HUGEINT)
                      * (pt.r2 - pg.n * (k.kk + 1))) AS sdev
             FROM pt JOIN pg USING (dow) JOIN k USING (dow) GROUP BY 1)
      SELECT pg.dow, CAST(pg.n AS BIGINT) AS n, CAST(k.kk AS BIGINT) AS k,
             round((CAST(k.kk AS DOUBLE) - 1.0) * CAST(sd.sdev AS DOUBLE)
               / (CAST(pg.a4 AS DOUBLE)
                  - CAST(pg.n AS DOUBLE) * CAST(k.kk AS DOUBLE)
                    * (CAST(k.kk AS DOUBLE) + 1.0)
                    * (CAST(k.kk AS DOUBLE) + 1.0)), 6) AS t1,
             CAST(k.kk - 1 AS BIGINT) AS df1,
             CAST((pg.n - 1) * (k.kk - 1) AS BIGINT) AS df2
      FROM pg JOIN k USING (dow) JOIN sd USING (dow)
      WHERE k.kk > 1
        AND CAST(pg.a4 AS DOUBLE)
            - CAST(pg.n AS DOUBLE) * CAST(k.kk AS DOUBLE)
              * (CAST(k.kk AS DOUBLE) + 1.0)
              * (CAST(k.kk AS DOUBLE) + 1.0) > 0
      ORDER BY pg.dow""")),

    // did per-customer spend SHIFT between 1995's halves? Wilcoxon
    // signed-rank on paired half-year cent totals per market segment —
    // |d|-midranks on the grouped scan (segment is 5-valued; a
    // segment-keyed ranking window would be one task per segment)
    Q("q400_wilcoxon_signed_rank", (s, d) => {
      import s.implicits._
      val o = T.orders(s, d).filter(year($"o_orderdate") === 1995)
        .select($"o_custkey",
          ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long")
            .as("cents"),
          month($"o_orderdate").as("m"))
      val pairedSums = o.groupBy($"o_custkey").agg(
        sum(when($"m" <= 6, $"cents").otherwise(0L)).as("c1"),
        sum(when($"m" > 6, $"cents").otherwise(0L)).as("c2"),
        max(when($"m" <= 6, 1).otherwise(0)).as("h1"),
        max(when($"m" > 6, 1).otherwise(0)).as("h2"))
        .filter($"h1" === 1 && $"h2" === 1)
        .withColumn("dd", $"c2" - $"c1")
      val pairs = pairedSums.join(
        T.customer(s, d).select($"c_custkey", $"c_mktsegment"),
        $"o_custkey" === $"c_custkey")
      Hypothesis.wilcoxonSignedRank(pairs, "c_mktsegment", "dd")
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH o AS (SELECT o_custkey,
                        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents,
                        month(o_orderdate) AS m
                 FROM orders WHERE year(o_orderdate) = 1995),
      p AS (SELECT o_custkey,
                   sum(CASE WHEN m <= 6 THEN cents ELSE 0 END) AS c1,
                   sum(CASE WHEN m > 6 THEN cents ELSE 0 END) AS c2,
                   max(CASE WHEN m <= 6 THEN 1 ELSE 0 END) AS h1,
                   max(CASE WHEN m > 6 THEN 1 ELSE 0 END) AS h2
            FROM o GROUP BY 1),
      dd AS (SELECT c.c_mktsegment AS seg, p.c2 - p.c1 AS d
             FROM p JOIN customer c ON p.o_custkey = c.c_custkey
             WHERE p.h1 = 1 AND p.h2 = 1 AND p.c2 - p.c1 <> 0),
      r AS (SELECT seg, d,
                   2 * rank() OVER (PARTITION BY seg ORDER BY abs(d))
                     + count(*) OVER (PARTITION BY seg, abs(d)) - 1
                     AS rank2,
                   count(*) OVER (PARTITION BY seg, abs(d)) AS t
            FROM dd),
      g AS (SELECT seg, count(*) AS n,
                   sum(CASE WHEN d > 0 THEN CAST(rank2 AS HUGEINT)
                       ELSE 0 END) AS w2,
                   sum(CAST(t AS HUGEINT) * t - 1) AS ties
            FROM r GROUP BY 1)
      SELECT seg AS c_mktsegment, CAST(n AS BIGINT) AS n,
             round(CAST(w2 AS DOUBLE) / 2.0, 6) AS w_plus,
             round((CAST(w2 AS DOUBLE) / 2.0
                 - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)
               / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                   * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
                 - CAST(ties AS DOUBLE) / 48.0), 6) AS z
      FROM g
      WHERE n > 0
        AND CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
            * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
          - CAST(ties AS DOUBLE) / 48.0 > 0
      ORDER BY seg""")),

    // daily revenue per order priority, one-step-ahead with weekly
    // seasonality: additive Holt-Winters folded over the calendar-
    // bounded daily series — level, trend, and the 7-slot seasonal
    // queue in one deterministic aggregate HOF, replayed verbatim by
    // the oracle's list_reduce
    Q("q401_holt_winters", (s, d) => {
      import s.implicits._
      val daily = T.orders(s, d)
        .groupBy($"o_orderpriority", $"o_orderdate")
        .agg(sum(($"o_totalprice".cast("decimal(18,2)") * 100)
          .cast("long")).as("cents"))
      TimeSeries.holtWinters(daily, "o_orderpriority", "o_orderdate",
          "cents", alpha = 0.3, beta = 0.1, gamma = 0.2, period = 7)
        .orderBy($"o_orderpriority")
    }, Some("""
      WITH dv AS (SELECT o_orderpriority, o_orderdate AS day,
                         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS cents
                  FROM orders GROUP BY 1, 2),
      g AS (SELECT o_orderpriority,
                   list_transform(list(CAST(cents AS DOUBLE)
                     ORDER BY day), v -> [v, 0.0, 0.0, 0.0, 0.0, 0.0,
                       0.0, 0.0, 0.0]) AS vals,
                   count(*) AS n_points
            FROM dv GROUP BY 1),
      f AS (SELECT o_orderpriority, n_points,
                   list_reduce(vals, (acc, x) -> list_concat([
                     0.3 * (x[1] - acc[3]) + (1.0 - 0.3)
                       * (acc[1] + acc[2]),
                     0.1 * ((0.3 * (x[1] - acc[3]) + (1.0 - 0.3)
                         * (acc[1] + acc[2])) - acc[1])
                       + (1.0 - 0.1) * acc[2]],
                     acc[4:9]) || [
                     0.2 * (x[1] - (0.3 * (x[1] - acc[3]) + (1.0 - 0.3)
                       * (acc[1] + acc[2]))) + (1.0 - 0.2) * acc[3]])
                     AS st
            FROM g WHERE n_points >= 9)
      SELECT o_orderpriority, n_points, round(st[1], 6) AS level,
             round(st[2], 6) AS trend,
             round(st[3], 6) AS season_next,
             round(st[1] + st[2] + st[3], 6) AS forecast
      FROM f ORDER BY o_orderpriority""")),

    // do bigger line items get deeper discounts? Kendall tau-b per
    // return flag over the bounded (quantity x discount-cents)
    // contingency table — concordant/discordant pairs from cell
    // products, never an O(n^2) row pass
    Q("q402_kendall_tau", (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d).select($"l_returnflag",
        $"l_quantity".cast("long").as("q"),
        ($"l_discount".cast("decimal(18,2)") * 100).cast("long")
          .as("disc_c"))
      Hypothesis.kendallTauB(li, "l_returnflag", "q", "disc_c")
        .orderBy($"l_returnflag")
    }, Some("""
      WITH li AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
                         CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                           AS BIGINT) AS y
                  FROM lineitem),
      cells AS (SELECT g, x, y, count(*) AS c FROM li GROUP BY 1, 2, 3),
      pairs AS (SELECT a.g,
                  coalesce(sum(CASE WHEN b.y > a.y
                    THEN CAST(a.c AS HUGEINT) * b.c END), 0) AS conc,
                  coalesce(sum(CASE WHEN b.y < a.y
                    THEN CAST(a.c AS HUGEINT) * b.c END), 0) AS disco
                FROM cells a JOIN cells b ON a.g = b.g AND b.x > a.x
                GROUP BY 1),
      xm AS (SELECT g, sum(t) AS n, sum(CAST(t AS HUGEINT) * (t - 1)) AS tx2
             FROM (SELECT g, x, sum(c) AS t FROM cells GROUP BY 1, 2)
             GROUP BY 1),
      ym AS (SELECT g, sum(CAST(t AS HUGEINT) * (t - 1)) AS ty2
             FROM (SELECT g, y, sum(c) AS t FROM cells GROUP BY 1, 2)
             GROUP BY 1),
      nc AS (SELECT g, count(*) AS n_cells FROM cells GROUP BY 1)
      SELECT xm.g AS l_returnflag, CAST(xm.n AS BIGINT) AS n,
             CAST(nc.n_cells AS BIGINT) AS n_cells,
             round((CAST(pairs.conc AS DOUBLE) - CAST(pairs.disco AS DOUBLE))
               / sqrt((CAST(xm.n AS DOUBLE) * (CAST(xm.n AS DOUBLE) - 1.0)
                   - CAST(xm.tx2 AS DOUBLE))
                 * (CAST(xm.n AS DOUBLE) * (CAST(xm.n AS DOUBLE) - 1.0)
                   - CAST(ym.ty2 AS DOUBLE)) / 4.0), 6) AS tau_b
      FROM pairs JOIN xm USING (g) JOIN ym USING (g) JOIN nc USING (g)
      WHERE xm.n > 1
        AND CAST(xm.n AS DOUBLE) * (CAST(xm.n AS DOUBLE) - 1.0)
            - CAST(xm.tx2 AS DOUBLE) > 0
        AND CAST(xm.n AS DOUBLE) * (CAST(xm.n AS DOUBLE) - 1.0)
            - CAST(ym.ty2 AS DOUBLE) > 0
      ORDER BY xm.g"""))
  )
}
