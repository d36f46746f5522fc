package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries
import graft.sources.{Tables => T}

/** Round-9 wave #4: the signal-analysis pair — cross-correlation at
  * leads/lags (which series leads, and by how much; Granger q405's
  * profile view) and the low-frequency periodogram (is there a cycle at
  * all). CCF is exact end-to-end (integer moments per lag); the
  * periodogram's trig sums run as one sequential fold per frequency with
  * the 2π literal spelled identically in both engines.
  */
object Round80 {

  val all: Seq[Q] = Seq(

    // does order VOLUME lead or lag total revenue day-to-day? CCF per
    // priority between daily order count and daily revenue at k=-3..3 —
    // exact integer moments per (priority, lag), one double formula
    Q("q409_ccf", (s, d) => {
      import s.implicits._
      val daily = T.orders(s, d)
        .groupBy($"o_orderpriority", $"o_orderdate")
        .agg(count(lit(1)).as("x"),
          sum(($"o_totalprice".cast("decimal(18,2)") * 100)
            .cast("long")).as("y"))
      TimeSeries.ccf(daily, "o_orderpriority", "o_orderdate", "x", "y",
          maxLag = 3)
        .orderBy($"o_orderpriority", $"lag")
    }, Some("""
      WITH dv AS (SELECT o_orderpriority AS pr, o_orderdate AS i,
                         count(*) AS x,
                         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS y
                  FROM orders GROUP BY 1, 2),
      r AS (SELECT pr, i, x, y,
                   row_number() OVER (PARTITION BY pr ORDER BY i) AS rn
            FROM dv),
      lg AS (SELECT unnest(range(-3, 4)) AS lag),
      p AS (SELECT a.pr, lg.lag, a.x, b.y AS yy
            FROM r a JOIN lg ON true
            JOIN r b ON a.pr = b.pr AND b.rn = a.rn + lg.lag),
      m AS (SELECT pr, lag, count(*) AS n,
                   sum(x) AS sx, sum(yy) AS sy,
                   sum(CAST(x AS HUGEINT) * yy) AS sxy,
                   sum(CAST(x AS HUGEINT) * x) AS sxx,
                   sum(CAST(yy AS HUGEINT) * yy) AS syy
            FROM p GROUP BY 1, 2)
      SELECT pr AS o_orderpriority, CAST(lag AS BIGINT) AS lag,
             CAST(n AS BIGINT) AS n_pairs,
             round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS ccf
      FROM m
      WHERE n >= 2
        AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
      ORDER BY pr, lag""")),

    // is there any low-frequency cycle in daily revenue? Periodogram per
    // priority at whole-series frequencies k=1..6 — mean-centered,
    // scaled to O(1), one sequential trig fold per (priority, k)
    Q("q410_periodogram", (s, d) => {
      import s.implicits._
      val daily = T.orders(s, d)
        .groupBy($"o_orderpriority", $"o_orderdate")
        .agg(sum(($"o_totalprice".cast("decimal(18,2)") * 100)
          .cast("long")).as("v"))
      TimeSeries.periodogram(daily, "o_orderpriority", "o_orderdate", "v",
          maxFreq = 6, valueScale = 1e-8)
        .orderBy($"o_orderpriority", $"k")
    }, Some("""
      WITH dv AS (SELECT o_orderpriority AS pr, o_orderdate AS i,
                         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS v
                  FROM orders GROUP BY 1, 2),
      g AS (SELECT pr, count(*) AS n, sum(v) AS sv,
                   list(CAST(v AS DOUBLE) ORDER BY i) AS vs
            FROM dv GROUP BY 1 HAVING count(*) > 1),
      kk AS (SELECT unnest(range(1, 7)) AS kf),
      f AS (SELECT g.pr, kk.kf, g.n,
                   list_reduce(
                     [[0.0, 0.0, 0.0]] || list_transform(vs, v -> [v]),
                     (acc, x) -> [
                       acc[1] + (x[1] - CAST(sv AS DOUBLE)
                           / CAST(n AS DOUBLE)) * 1e-08
                         * cos(6.283185307179586 * CAST(kf AS DOUBLE)
                             * acc[3] / CAST(n AS DOUBLE)),
                       acc[2] + (x[1] - CAST(sv AS DOUBLE)
                           / CAST(n AS DOUBLE)) * 1e-08
                         * sin(6.283185307179586 * CAST(kf AS DOUBLE)
                             * acc[3] / CAST(n AS DOUBLE)),
                       acc[3] + 1.0]) AS st
            FROM g, kk)
      SELECT pr AS o_orderpriority, CAST(kf AS BIGINT) AS k,
             CAST(n AS BIGINT) AS n,
             round((st[1] * st[1] + st[2] * st[2]) / CAST(n AS DOUBLE), 6)
               AS power
      FROM f ORDER BY pr, k"""))
  )
}
