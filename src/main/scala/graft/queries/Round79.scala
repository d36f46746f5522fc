package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries
import graft.sources.{Tables => T}

/** Round-9 wave #3: the two series-comparison families the time-series
  * toolkit lacked — long-run equilibrium (Engle–Granger two-step
  * cointegration: OLS from exact moments + a Dickey–Fuller fold over the
  * day-sorted residuals) and alignment distance (dynamic time warping as
  * a nested fold whose DP cells stay exactly integral on cents).
  * Both keep every data-sized reduction exact or sequentially folded in
  * an order the oracle replays verbatim via seeded list_reduce.
  */
object Round79 {

  val all: Seq[Q] = Seq(

    // does each segment's daily revenue hold a long-run equilibrium with
    // the market's total? Engle-Granger per segment: OLS level fit from
    // exact moment sums, then the DF t-stat on residuals via two
    // fixed-order folds (never an unordered float sum)
    Q("q407_engle_granger", (s, d) => {
      import s.implicits._
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
      val segDaily = T.orders(s, d)
        .join(T.customer(s, d).select($"c_custkey", $"c_mktsegment"),
          $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment", $"o_orderdate")
        .agg(sum(cents).as("y"))
      val totDaily = T.orders(s, d)
        .groupBy($"o_orderdate").agg(sum(cents).as("x"))
      val j = segDaily.join(totDaily, "o_orderdate")
      TimeSeries.engleGranger(j, "c_mktsegment", "o_orderdate", "y", "x")
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH sd AS (SELECT c.c_mktsegment AS k, o.o_orderdate AS i,
                         sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS y
                  FROM orders o JOIN customer c
                    ON o.o_custkey = c.c_custkey GROUP BY 1, 2),
      td AS (SELECT o_orderdate AS i,
                    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS x
             FROM orders GROUP BY 1),
      j AS (SELECT sd.k, sd.i, sd.y, td.x FROM sd JOIN td USING (i)),
      m AS (SELECT k, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(CAST(x AS HUGEINT) * x) AS sxx,
                   sum(CAST(x AS HUGEINT) * y) AS sxy
            FROM j GROUP BY 1),
      ab AS (SELECT k, n,
                    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
                    sy, sx
             FROM m
             WHERE n > 3 AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0),
      ab2 AS (SELECT k, n, b,
                     (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
                       / CAST(n AS DOUBLE) AS a
              FROM ab),
      e AS (SELECT j.k, ab2.n, ab2.b, ab2.a,
                   list(CAST(j.y AS DOUBLE) - ab2.a
                        - ab2.b * CAST(j.x AS DOUBLE) ORDER BY j.i) AS es
            FROM j JOIN ab2 ON j.k = ab2.k
            GROUP BY j.k, ab2.n, ab2.b, ab2.a),
      f AS (SELECT k, n, b, a, es,
                   list_reduce(list_transform(es, x -> [x]),
                     (acc, x) -> CASE WHEN len(acc) = 1
                       THEN [acc[1]*acc[1], acc[1]*(x[1]-acc[1]), x[1]]
                       ELSE [acc[1] + acc[3]*acc[3],
                             acc[2] + acc[3]*(x[1]-acc[3]), x[1]] END)
                     AS f1
            FROM e WHERE len(es) > 1),
      gg AS (SELECT k, n, b, a, es, f1[1] AS s11, f1[2] / f1[1] AS g
             FROM f WHERE f1[1] > 0),
      r2 AS (SELECT k, n, b, a, s11, g,
                    list_reduce(list_transform(es, x -> [x]),
                      (acc, x) -> CASE WHEN len(acc) = 1
                        THEN [(x[1]-acc[1]-g*acc[1])
                                * (x[1]-acc[1]-g*acc[1]), x[1]]
                        ELSE [acc[1] + (x[1]-acc[2]-g*acc[2])
                                * (x[1]-acc[2]-g*acc[2]), x[1]] END)[1]
                      AS ssr
             FROM gg)
      SELECT k AS c_mktsegment, CAST(n AS BIGINT) AS n,
             round(b, 6) AS beta, round(a, 6) AS alpha,
             round(g, 6) AS gamma,
             round(g / sqrt((ssr / (CAST(n - 1 AS DOUBLE) - 1.0)) / s11), 6)
               AS adf_t
      FROM r2 WHERE ssr > 0 AND n > 3 ORDER BY k""")),

    // how far does each priority's 1995 weekly revenue trajectory warp
    // from URGENT's? Full-DP dynamic time warping as a nested fold over
    // the two bounded weekly arrays — every cell exactly integral on
    // cents, the reference one broadcast array row
    Q("q408_dtw", (s, d) => {
      import s.implicits._
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
      val wk = T.orders(s, d).filter(year($"o_orderdate") === 1995)
        .groupBy($"o_orderpriority",
          floor((dayofyear($"o_orderdate") - 1) / 7).cast("long").as("w"))
        .agg(sum(cents).as("v"))
      val ref = wk.filter($"o_orderpriority" === "1-URGENT")
        .select($"w", $"v")
      TimeSeries.dtwDistance(wk, "o_orderpriority", "w", "v",
          ref, "w", "v")
        .orderBy($"o_orderpriority")
    }, Some("""
      WITH wk AS (SELECT o_orderpriority AS k,
                         (dayofyear(o_orderdate) - 1) // 7 AS w,
                         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS v
                  FROM orders WHERE year(o_orderdate) = 1995
                  GROUP BY 1, 2),
      s AS (SELECT k, list(CAST(v AS DOUBLE) ORDER BY w) AS sv
            FROM wk GROUP BY 1),
      r AS (SELECT list(CAST(v AS DOUBLE) ORDER BY w) AS rv
            FROM wk WHERE k = '1-URGENT'),
      d AS (SELECT s.k, s.sv, r.rv,
                   list_reduce(
                     [[0.0] || list_transform(range(1, len(rv) + 1),
                        j -> 1e300)]
                       || list_transform(sv, v -> [v]),
                     (acc, x) -> list_reduce(
                       [[1e300]] || list_transform(range(1, len(rv) + 1),
                          j -> [0.0]),
                       (rw, dummy) -> rw
                         || [least(acc[len(rw)], acc[len(rw) + 1],
                               rw[len(rw)])
                             + abs(x[1] - rv[len(rw)])]))[len(rv) + 1]
                     AS dtw
            FROM s, r
            WHERE len(sv) > 0 AND len(rv) > 0)
      SELECT k AS o_orderpriority, CAST(len(sv) AS BIGINT) AS n,
             CAST(len(rv) AS BIGINT) AS m,
             CAST(dtw AS BIGINT) AS dtw_cents,
             dtw / CAST(len(sv) + len(rv) AS DOUBLE) AS dtw_norm
      FROM d WHERE dtw < 1e300 ORDER BY k"""))
  )
}
