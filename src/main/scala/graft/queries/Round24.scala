package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Metrics, Mixing, TimeSeries}
import graft.sources.{Tables => T}

/** Round-6 sixteenth wave: isotonic calibration, Neyman allocation,
  * Kaplan–Meier survival.
  */
object Round24 {

  val all: Seq[Q] = Seq(

    // monotone repair of the "P(purchase | value)" curve per day-of-
    // week: quantile-binned rates pooled by PAV. The oracle avoids the
    // pooling RECURSION entirely via the closed minimax form
    // fit(i) = max_{j<=i} min_{k>=i} avg(j..k) (equal to PAV in exact
    // arithmetic); both sides compute every candidate mean as ONE
    // double division of exact integer sums (pavCounts pools on
    // cross-multiplied rationals), so the hashes agree bit-for-bit
    Q("q233_isotonic", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d).select(
        dayofweek($"ts").as("dow"), $"value", $"event_id",
        ($"event_type" === "purchase").cast("int").as("label"))
      Metrics.isotonicCalibration(ev, "dow", "value", "label",
          Seq("event_id"), bins = 20)
        .orderBy($"dow", $"bin")
    }, Some("""
      WITH ev AS (SELECT dayofweek(ts) + 1 AS dow, value, event_id,
                         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
                  FROM events),
      r AS (SELECT dow, label,
                   row_number() OVER (PARTITION BY dow ORDER BY value, event_id) AS rnk,
                   count(*) OVER (PARTITION BY dow) AS n
            FROM ev),
      b AS (SELECT dow, label,
                   CASE WHEN rnk <= (n % 20) * (n // 20 + 1)
                        THEN (rnk - 1) // (n // 20 + 1) + 1
                        ELSE (n % 20) + (rnk - (n % 20) * (n // 20 + 1) - 1)
                             // greatest(n // 20, 1) + 1
                   END AS bin
            FROM r),
      cells AS (SELECT dow, bin, count(*) AS n, sum(label) AS pos
                FROM b GROUP BY 1, 2),
      cum AS (SELECT dow, bin, n, pos,
                     sum(n) OVER (PARTITION BY dow ORDER BY bin) AS cn,
                     sum(pos) OVER (PARTITION BY dow ORDER BY bin) AS cp
              FROM cells),
      -- mean of the contiguous bin span j..k (inclusive), one exact division
      spans AS (SELECT j.dow, j.bin AS jb, k.bin AS kb,
                       CAST(k.cp - j.cp + j.pos AS DOUBLE)
                         / CAST(k.cn - j.cn + j.n AS DOUBLE) AS m
                FROM cum j JOIN cum k ON j.dow = k.dow AND j.bin <= k.bin),
      mins AS (SELECT s.dow, i.bin, s.jb, min(s.m) AS mn
               FROM spans s JOIN cells i
                 ON s.dow = i.dow AND s.jb <= i.bin AND s.kb >= i.bin
               GROUP BY 1, 2, 3),
      fit AS (SELECT dow, bin, max(mn) AS iso FROM mins GROUP BY 1, 2)
      SELECT c.dow, c.bin, c.n,
             round(CAST(c.pos AS DOUBLE) / c.n, 6) AS rate_raw,
             round(f.iso, 6) AS rate_iso
      FROM cells c JOIN fit f USING (dow, bin)
      ORDER BY c.dow, bin""")),

    // optimal sample-budget split across order priorities: Neyman
    // allocation ∝ n_h·σ_h from exact integer cent moments — the
    // statistically-right version of proportional sampling
    Q("q234_neyman", (s, d) => {
      import s.implicits._
      val o = T.orders(s, d).select($"o_orderpriority",
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      Mixing.neymanAllocation(o, "o_orderpriority", "cents",
          budget = 1000)
        .orderBy($"o_orderpriority")
    }, Some("""
      WITH c AS (SELECT o_orderpriority AS s,
                        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS x
                 FROM orders),
      m AS (SELECT s, count(*) AS n_rows, sum(x) AS sx,
                   sum(x * x) AS sxx
            FROM c GROUP BY 1),
      d AS (SELECT s, n_rows,
                   CASE WHEN n_rows >= 2 THEN
                     sqrt(greatest(0.0,
                       (CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       / (CAST(n_rows AS DOUBLE)
                          * (CAST(n_rows AS DOUBLE) - 1)))) END AS sigma
            FROM m),
      w AS (SELECT s, n_rows, sigma,
                   coalesce(CAST(n_rows AS DOUBLE) * sigma, 0.0) AS wt
            FROM d),
      t AS (SELECT list_reduce(list_prepend(0.0, list(wt ORDER BY s, wt)),
              (a, x) -> a + x) AS wtot FROM w)
      SELECT s AS o_orderpriority, n_rows, round(sigma, 6) AS sigma,
             CAST(floor(1000.0 * wt / wtot + 0.5) AS BIGINT) AS alloc
      FROM w, t ORDER BY o_orderpriority""")),

    // repeat-purchase survival done right: Kaplan–Meier over
    // purchase-to-next-purchase intervals, each user's FINAL purchase
    // right-censored at their last observed day — the naive
    // "fraction repurchased by day t" treats open intervals as
    // never-repurchasing
    Q("q235_kaplan_meier", (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = T.events(s, d)
      val p = ev.filter($"event_type" === "purchase")
        .select($"user_id", to_date($"ts").as("day"), $"event_id")
      val w = Window.partitionBy($"user_id").orderBy($"day", $"event_id")
      val lastDay = ev.groupBy($"user_id")
        .agg(max(to_date($"ts")).as("__last"))
      val obs = p.withColumn("__next", lead($"day", 1).over(w))
        .join(lastDay, "user_id")
        .select(
          when($"__next".isNotNull, datediff($"__next", $"day"))
            .otherwise(datediff($"__last", $"day")).cast("long").as("dur"),
          $"__next".isNotNull.cast("long").as("observed"))
      TimeSeries.kaplanMeier(obs, "dur", "observed").orderBy($"t")
    }, Some("""
      WITH pur AS (SELECT user_id, CAST(ts AS DATE) AS day, event_id
                   FROM events WHERE event_type = 'purchase'),
      ld AS (SELECT user_id, max(CAST(ts AS DATE)) AS lastd
             FROM events GROUP BY 1),
      nx AS (SELECT pur.user_id, pur.day,
                    lead(day) OVER (PARTITION BY pur.user_id
                                    ORDER BY day, event_id) AS nxt
             FROM pur),
      o AS (SELECT CASE WHEN nxt IS NOT NULL
                        THEN CAST(nxt - day AS BIGINT)
                        ELSE CAST(lastd - day AS BIGINT) END AS t,
                   CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev
            FROM nx JOIN ld USING (user_id)),
      p AS (SELECT t, sum(ev) AS n_events,
                   sum(1 - ev) AS n_censored_at_t
            FROM o GROUP BY 1),
      n AS (SELECT count(*) AS nn FROM o),
      r AS (SELECT t, n_events, n_censored_at_t,
                   nn - coalesce(sum(n_events + n_censored_at_t)
                     OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS n_risk
            FROM p, n),
      f AS (SELECT t, n_risk, n_events, n_censored_at_t,
                   1.0 - CAST(n_events AS DOUBLE) / n_risk AS fac
            FROM r),
      s AS (SELECT t, n_risk, n_events, n_censored_at_t,
                   CASE WHEN max(CASE WHEN fac = 0.0 THEN 1 ELSE 0 END)
                          OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                                PRECEDING AND CURRENT ROW) = 1
                        THEN 0.0
                        ELSE round(exp(sum(CASE WHEN fac > 0
                          THEN ln(fac) ELSE 0.0 END)
                          OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                          PRECEDING AND CURRENT ROW)), 6) END AS survival
            FROM f)
      SELECT t, n_risk, n_events, n_censored_at_t, survival
      FROM s WHERE n_events > 0 ORDER BY t"""))
  )
}
