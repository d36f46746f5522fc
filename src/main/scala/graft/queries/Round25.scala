package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries
import graft.sources.{Tables => T}

/** Round-6 seventeenth wave: Holt forecasting, burstiness, DiD.
  */
object Round25 {

  val all: Seq[Q] = Seq(

    // one-step-ahead revenue forecast per user: Holt level+trend fold
    // over the daily cent series — sequential recursion as an
    // aggregate HOF, constants as (1.0 − α) subexpressions so both
    // engines constant-fold identical doubles
    Q("q236_holt", (s, d) => {
      import s.implicits._
      val daily = T.events(s, d).filter($"event_type" === "purchase")
        .groupBy($"user_id", to_date($"ts").as("day"))
        .agg(sum(($"value".cast("decimal(18,2)") * 100).cast("long"))
          .as("cents"))
      TimeSeries.holtForecast(daily, "user_id", "day", "cents",
          alpha = 0.3, beta = 0.1)
        .orderBy($"user_id")
    }, Some("""
      WITH dv AS (SELECT user_id, CAST(ts AS DATE) AS day,
                         sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS cents
                  FROM events WHERE event_type = 'purchase'
                  GROUP BY 1, 2),
      g AS (SELECT user_id,
                   list_transform(list(CAST(cents AS DOUBLE)
                     ORDER BY day), v -> [v, 0.0]) AS vals,
                   count(*) AS n_points
            FROM dv GROUP BY 1),
      f AS (SELECT user_id, n_points,
                   list_reduce(vals, (acc, x) -> [
                     0.3 * x[1] + (1.0 - 0.3) * (acc[1] + acc[2]),
                     0.1 * (0.3 * x[1] + (1.0 - 0.3) * (acc[1] + acc[2])
                       - acc[1]) + (1.0 - 0.1) * acc[2]]) AS st
            FROM g WHERE n_points >= 2)
      SELECT user_id, n_points, round(st[1], 6) AS level,
             round(st[2], 6) AS trend,
             round(st[1] + st[2], 6) AS forecast
      FROM f ORDER BY user_id""")),

    // who hammers the system in bursts? Fano factor of daily event
    // counts over the global day range (zero days count) — the
    // dispersion signal behind per-key rate limits and skew salts
    Q("q237_burstiness", (s, d) => {
      import s.implicits._
      TimeSeries.burstiness(T.events(s, d), "user_id", "ts")
        .orderBy($"user_id")
    }, Some("""
      WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
                            count(*) AS c
                     FROM events GROUP BY 1, 2),
      nd AS (SELECT count(DISTINCT day) AS ndays FROM daily),
      m AS (SELECT user_id, count(*) AS n_active_days,
                   sum(c) AS n_events, sum(c * c) AS sc2
            FROM daily GROUP BY 1)
      SELECT user_id, ndays AS n_days, n_active_days, n_events,
             round(CAST(n_events AS DOUBLE) / ndays, 6) AS mean,
             round(((CAST(ndays AS DOUBLE) * CAST(sc2 AS DOUBLE)
                     - CAST(n_events AS DOUBLE)
                       * CAST(n_events AS DOUBLE))
                    / (CAST(ndays AS DOUBLE)
                       * (CAST(ndays AS DOUBLE) - 1)))
               / (CAST(n_events AS DOUBLE) / ndays), 6) AS fano
      FROM m, nd ORDER BY user_id""")),

    // difference-in-differences read-out: purchase value change across
    // the corpus midpoint for the B cohort net of the A cohort's
    // change — cell means from exact cent sums, one 4-cell fold
    Q("q238_diff_in_diff", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d).filter($"event_type" === "purchase")
        .select($"user_id", to_date($"ts").as("day"),
          ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      val cut = ev.agg(date_add(min($"day"), 15).as("__cut"))
      val cells = ev.crossJoin(broadcast(cut))
        .select(
          when(pmod($"user_id", lit(2L)) === 0, "A").otherwise("B")
            .as("cohort"),
          when($"day" < $"__cut", "pre").otherwise("post").as("period"),
          $"cents")
        .groupBy($"cohort", $"period")
        .agg(count(lit(1)).as("n"), sum($"cents").as("sc"))
      def m(c: String, p: String) = max(when($"cohort" === c &&
        $"period" === p, $"sc".cast("double") / $"n" / 100))
      cells.agg(
          round(m("A", "pre"), 6).as("mean_a_pre"),
          round(m("A", "post"), 6).as("mean_a_post"),
          round(m("B", "pre"), 6).as("mean_b_pre"),
          round(m("B", "post"), 6).as("mean_b_post"),
          round((m("B", "post") - m("B", "pre"))
            - (m("A", "post") - m("A", "pre")), 6).as("did"))
    }, Some("""
      WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day,
                         CAST(CAST(value AS DECIMAL(18,2)) * 100
                           AS BIGINT) AS cents
                  FROM events WHERE event_type = 'purchase'),
      ct AS (SELECT min(day) + 15 AS cut FROM ev),
      cells AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END
                         AS cohort,
                       CASE WHEN day < cut THEN 'pre' ELSE 'post' END
                         AS period,
                       count(*) AS n, sum(cents) AS sc
                FROM ev, ct GROUP BY 1, 2)
      SELECT
        round(max(CASE WHEN cohort = 'A' AND period = 'pre'
          THEN CAST(sc AS DOUBLE) / n / 100 END), 6) AS mean_a_pre,
        round(max(CASE WHEN cohort = 'A' AND period = 'post'
          THEN CAST(sc AS DOUBLE) / n / 100 END), 6) AS mean_a_post,
        round(max(CASE WHEN cohort = 'B' AND period = 'pre'
          THEN CAST(sc AS DOUBLE) / n / 100 END), 6) AS mean_b_pre,
        round(max(CASE WHEN cohort = 'B' AND period = 'post'
          THEN CAST(sc AS DOUBLE) / n / 100 END), 6) AS mean_b_post,
        round((max(CASE WHEN cohort = 'B' AND period = 'post'
                THEN CAST(sc AS DOUBLE) / n / 100 END)
             - max(CASE WHEN cohort = 'B' AND period = 'pre'
                THEN CAST(sc AS DOUBLE) / n / 100 END))
            - (max(CASE WHEN cohort = 'A' AND period = 'post'
                THEN CAST(sc AS DOUBLE) / n / 100 END)
             - max(CASE WHEN cohort = 'A' AND period = 'pre'
                THEN CAST(sc AS DOUBLE) / n / 100 END)), 6) AS did
      FROM cells"""))
  )
}
