package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Profile, TimeSeries}
import graft.sources.{Tables => T}

/** Round-6 eighteenth wave: robust slopes, autocorrelation, jackknife.
  */
object Round26 {

  val all: Seq[Q] = Seq(

    // outlier-proof revenue trend per user: Theil–Sen median-of-slopes
    // over the daily cent series — per-key C(n,2) enumerated map-side
    // from the collected array, exact interpolated median
    Q("q239_theil_sen", (s, d) => {
      import s.implicits._
      val daily = T.events(s, d).filter($"event_type" === "purchase")
        .groupBy($"user_id", to_date($"ts").as("day"))
        .agg(sum(($"value".cast("decimal(18,2)") * 100).cast("long"))
          .as("cents"))
        .select($"user_id",
          datediff($"day", lit("1970-01-01").cast("date")).as("x"),
          $"cents")
      TimeSeries.theilSen(daily, "user_id", "x", "cents")
        .orderBy($"user_id")
    }, Some("""
      WITH dv AS (SELECT user_id, CAST(ts AS DATE) AS day,
                         sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS cents
                  FROM events WHERE event_type = 'purchase'
                  GROUP BY 1, 2),
      pts AS (SELECT user_id,
                     CAST(day - DATE '1970-01-01' AS DOUBLE) AS x,
                     CAST(cents AS DOUBLE) AS y
              FROM dv),
      sl AS (SELECT a.user_id, (b.y - a.y) / (b.x - a.x) AS s
             FROM pts a JOIN pts b
             ON a.user_id = b.user_id AND b.x > a.x),
      g AS (SELECT user_id, list(s ORDER BY s) AS ls,
                   count(*) AS n_pairs
            FROM sl GROUP BY 1),
      med AS (SELECT user_id, n_pairs,
                     CASE WHEN n_pairs % 2 = 1
                          THEN ls[CAST((n_pairs + 1) // 2 AS INT)]
                          ELSE (ls[CAST(n_pairs // 2 AS INT)]
                                + ls[CAST(n_pairs // 2 + 1 AS INT)])
                               / 2.0 END AS med
              FROM g),
      np AS (SELECT user_id, count(*) AS n_points FROM pts GROUP BY 1)
      SELECT m.user_id, n_points, n_pairs, round(med, 6) AS slope
      FROM med m JOIN np USING (user_id) ORDER BY user_id""")),

    // is today like yesterday? lag-1 autocorrelation of the per-user
    // daily event-count series from exact integer pair moments
    Q("q240_autocorr", (s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .groupBy($"user_id", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("c"))
      TimeSeries.lag1Autocorr(daily, "user_id", "day", "c")
        .orderBy($"user_id")
    }, Some("""
      WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
                            count(*) AS c
                     FROM events GROUP BY 1, 2),
      p AS (SELECT user_id, c AS x,
                   lead(c) OVER (PARTITION BY user_id ORDER BY day) AS y
            FROM daily),
      pp AS (SELECT user_id, x, y FROM p WHERE y IS NOT NULL),
      m AS (SELECT user_id, count(*) AS n_pairs,
                   sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                   sum(x * x) AS sxx, sum(y * y) AS syy
            FROM pp GROUP BY 1),
      r AS (SELECT user_id, n_pairs,
                   CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
                   CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
                   CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
            FROM m)
      SELECT user_id, n_pairs, round(cov / sqrt(vx * vy), 6) AS r1
      FROM r WHERE n_pairs >= 2 AND vx > 0 AND vy > 0
      ORDER BY user_id""")),

    // purchase-per-click with an honest error bar: delete-one-DAY
    // jackknife (numerator and denominator both random — the naive
    // binomial SE is wrong); deterministic, no hash draws
    Q("q241_jackknife", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d).select(to_date($"ts").as("day"),
        ($"event_type" === "purchase").cast("long").as("num"),
        ($"event_type" === "click").cast("long").as("den"))
      Profile.jackknifeRatioSE(ev, "day", "num", "den")
    }, Some("""
      WITH per AS (SELECT CAST(ts AS DATE) AS day,
                          sum(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END) AS n,
                          sum(CASE WHEN event_type = 'click'
                              THEN 1 ELSE 0 END) AS dd
                   FROM events GROUP BY 1),
      tot AS (SELECT sum(n) AS tn, sum(dd) AS td, count(*) AS g
              FROM per),
      loo AS (SELECT day, CAST(tn - n AS DOUBLE) / (td - dd) AS r
              FROM per, tot),
      f AS (SELECT list_reduce(list_prepend(0.0, list(r ORDER BY day)),
              (a, x) -> a + x) AS sumr FROM loo),
      mn AS (SELECT sumr / g AS meanr, g FROM f, tot),
      ss AS (SELECT list_reduce(list_prepend(0.0,
               list((r - meanr) * (r - meanr) ORDER BY day)),
               (a, x) -> a + x) AS ssq
             FROM loo, mn),
      o AS (SELECT g AS n_units,
                   round(CAST(tn AS DOUBLE) / td, 6) AS ratio,
                   round(sqrt((CAST(g AS DOUBLE) - 1) / CAST(g AS DOUBLE)
                     * ssq), 6) AS se
            FROM tot, ss)
      SELECT n_units, ratio, se,
             round(ratio - 1.96 * se, 6) AS ci_lo,
             round(ratio + 1.96 * se, 6) AS ci_hi
      FROM o"""))
  )
}
