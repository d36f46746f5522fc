package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.{Tables => T}

/** Round-6 thirty-fourth wave: prefix-filtered similarity join,
  * pattern funnel with exclusion.
  */
object Round42 {

  val all: Seq[Q] = Seq(

    // PPJoin: the same exact Jaccard-0.5 pairs as q29, but candidates
    // come from each set's rare-token PREFIX only (prefix-filter
    // theorem) — the oracle is the brute-force all-pairs join, so a
    // hash match PROVES the filter dropped no true pair on this corpus
    // (q129's framing, for set similarity)
    Q("q282_ppjoin", (s, d) => {
      import s.implicits._
      Dedup.ppJoinPairs(
          T.documents(s, d).filter($"doc_id" < 500), "doc_id", "text",
          tNum = 1, tDen = 2)
        .orderBy($"a_id", $"b_id")
    }, Some("""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                 FROM documents WHERE doc_id < 500),
      sh AS (SELECT doc_id,
                    list_distinct(list_transform(
                      generate_series(1, greatest(len(ws) - 2, 0)),
                      i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS s
             FROM w),
      jsz AS (SELECT doc_id, len(s) AS n FROM sh),
      jpost AS (SELECT doc_id, unnest(s) AS g FROM sh),
      jcom AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
               FROM jpost a JOIN jpost b ON a.g = b.g AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
      pairs AS (SELECT a_id, b_id,
                       round(c * 1.0 / (sa.n + sb.n - c), 6) AS sim
                FROM jcom JOIN jsz sa ON sa.doc_id = a_id
                          JOIN jsz sb ON sb.doc_id = b_id)
      SELECT a_id, b_id, sim FROM pairs WHERE sim >= 0.5
      ORDER BY a_id, b_id""")),

    // sequence-pattern funnel with EXCLUSION (the MATCH_RECOGNIZE
    // shape): users whose first signup is followed by a purchase
    // within 7 days with NO error strictly between — cascading
    // conditional argmins plus one anti-join, all user-keyed
    Q("q283_pattern_funnel", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val su = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"ts").as("s_ts"))
      val pu = ev.filter($"event_type" === "purchase")
        .join(su, "user_id")
        .filter($"ts" > $"s_ts")
        .groupBy($"user_id").agg(min($"ts").as("p_ts"))
      val qual = su.join(pu, "user_id")
        .filter($"p_ts" <= $"s_ts" + expr("INTERVAL 7 DAYS"))
      val errs = ev.filter($"event_type" === "error")
        .join(qual, "user_id")
        .filter($"ts" > $"s_ts" && $"ts" < $"p_ts")
        .select($"user_id").distinct()
      qual.join(errs, Seq("user_id"), "left_anti")
        .select($"user_id",
          to_date($"s_ts").as("signup_day"),
          to_date($"p_ts").as("purchase_day"),
          datediff(to_date($"p_ts"), to_date($"s_ts")).as("gap_days"))
        .orderBy($"user_id")
    }, Some("""
      WITH su AS (SELECT user_id, min(ts) AS s_ts FROM events
                  WHERE event_type = 'signup' GROUP BY 1),
      pu AS (SELECT e.user_id, min(e.ts) AS p_ts
             FROM events e JOIN su ON e.user_id = su.user_id
             WHERE e.event_type = 'purchase' AND e.ts > su.s_ts
             GROUP BY 1),
      qual AS (SELECT su.user_id, su.s_ts, pu.p_ts
               FROM su JOIN pu ON su.user_id = pu.user_id
               WHERE pu.p_ts <= su.s_ts + INTERVAL 7 DAY),
      er AS (SELECT DISTINCT q.user_id
             FROM qual q JOIN events e ON e.user_id = q.user_id
             WHERE e.event_type = 'error'
               AND e.ts > q.s_ts AND e.ts < q.p_ts)
      SELECT user_id, CAST(s_ts AS DATE) AS signup_day,
             CAST(p_ts AS DATE) AS purchase_day,
             date_diff('day', CAST(s_ts AS DATE), CAST(p_ts AS DATE))
               AS gap_days
      FROM qual WHERE user_id NOT IN (SELECT user_id FROM er)
      ORDER BY user_id"""))
  )
}
