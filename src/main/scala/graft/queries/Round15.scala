package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Quantiles, TimeSeries}
import graft.sources.{Tables => T}

/** Round-6 seventh wave: time-decay scoring, clamped running balances,
  * weighted medians.
  */
object Round15 {

  val all: Seq[Q] = Seq(

    // recency-weighted engagement score per user: sum of value·e^(−Δt/τ)
    // against the corpus's latest timestamp, τ = 7 days — one keyed hash
    // aggregate with Δt in exact integer seconds
    Q("q206_decay_score", (s, d) => {
      import s.implicits._
      TimeSeries.decayScore(T.events(s, d), "user_id", "ts", "value",
          tauSeconds = 604800.0)
        .orderBy($"key")
    }, Some("""
      WITH r AS (SELECT max(epoch_us(ts)) AS ref FROM events),
      t AS (SELECT user_id AS key,
                   value * exp(-(CAST((ref - epoch_us(ts)) // 1000000
                     AS DOUBLE)) / 604800.0) AS term
            FROM events, r)
      SELECT key, count(*) AS n_events,
             round(sum(term), 6) AS decayed_score
      FROM t GROUP BY 1 ORDER BY key""")),

    // prepaid-credit balance per user: purchases add value, errors
    // deduct it, and the balance clamps at zero — a sequential fold NO
    // window frame expresses (each step depends on the clamped prior
    // state); per-key sorted collect + aggregate HOF, exact semantics
    Q("q207_running_balance", (s, d) => {
      import s.implicits._
      val deltas = T.events(s, d)
        .filter($"event_type".isin("purchase", "error"))
        .select($"user_id", $"ts", $"event_id",
          when($"event_type" === "purchase", $"value")
            .otherwise(-$"value").as("delta"))
      TimeSeries.clampedRunningBalance(deltas, "user_id",
          Seq("ts", "event_id"), "delta")
        .orderBy($"key")
    }, Some("""
      WITH d AS (SELECT user_id, ts, event_id,
                        CASE WHEN event_type = 'purchase' THEN value
                             ELSE -value END AS delta
                 FROM events WHERE event_type IN ('purchase', 'error')),
      g AS (SELECT user_id AS key, count(*) AS n_events,
                   list(delta ORDER BY ts, event_id) AS ds
            FROM d GROUP BY 1)
      SELECT key, n_events,
             round(list_reduce(list_prepend(0.0, ds),
               (acc, x) -> greatest(0.0, acc + x)), 6) AS final_balance,
             round(list_reduce(list_prepend(0.0, ds),
                 (acc, x) -> greatest(0.0, acc + x))
               - list_sum(ds), 6) AS total_lost
      FROM g ORDER BY key""")),

    // revenue-weighted median order quantity per return flag: the
    // size-weighted typical value, integer-exact on cent weights —
    // smallest quantity whose cumulative revenue reaches half the total
    Q("q208_weighted_median", (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d).select($"l_returnflag", $"l_quantity",
        ($"l_extendedprice".cast("decimal(18,2)") * 100).cast("long")
          .as("__cents"))
      Quantiles.weightedMedian(li, Seq("l_returnflag"), "l_quantity",
          "__cents")
        .orderBy($"l_returnflag")
    }, Some("""
      WITH c AS (SELECT l_returnflag, l_quantity AS v,
                        sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                          * 100 AS BIGINT)) AS w
                 FROM lineitem GROUP BY 1, 2),
      x AS (SELECT l_returnflag, v, w,
                   sum(w) OVER (PARTITION BY l_returnflag ORDER BY v)
                     AS cum,
                   sum(w) OVER (PARTITION BY l_returnflag) AS tot
            FROM c)
      SELECT l_returnflag, max(tot) AS total_weight,
             min(v) AS weighted_median
      FROM x WHERE cum * 2 >= tot
      GROUP BY 1 ORDER BY l_returnflag"""))
  )
}
