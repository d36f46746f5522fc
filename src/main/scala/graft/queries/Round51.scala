package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.{Tables => T}

/** Round-6 forty-third wave: attribution model comparison.
  */
object Round51 {

  val all: Seq[Q] = Seq(

    // model disagreement table: the same 7-day-lookback touch set
    // credited under FIRST-touch and LAST-touch rules side by side
    // (q212 holds the linear split) — deterministic argmin/argmax via
    // (ts, touch id) tie-break, decimal-exact credited value
    Q("q301_attribution_models", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val c = ev.filter($"event_type" === "purchase")
        .select($"event_id".as("cid"), $"user_id", $"ts".as("cts"),
          $"value".cast("decimal(18,2)").as("v"))
      val t = ev.filter($"event_type".isin("view", "click"))
        .select($"user_id", $"ts".as("tts"), $"event_id".as("tid"),
          $"event_type".as("ch"))
      val j = c.join(t,
        Seq("user_id")).filter(
          $"tts" <= $"cts" && $"tts" >= $"cts" - expr("INTERVAL 7 DAYS"))
      val wf = Window.partitionBy($"cid").orderBy($"tts".asc, $"tid".asc)
      val wl = Window.partitionBy($"cid").orderBy($"tts".desc, $"tid".desc)
      val tagged = j
        .withColumn("__rf", row_number().over(wf))
        .withColumn("__rl", row_number().over(wl))
      val first = tagged.filter($"__rf" === 1)
        .groupBy($"ch".as("channel"))
        .agg(count(lit(1)).as("first_convs"),
          sum($"v").cast("decimal(18,2)").as("first_value"))
      val last = tagged.filter($"__rl" === 1)
        .groupBy($"ch".as("channel"))
        .agg(count(lit(1)).as("last_convs"),
          sum($"v").cast("decimal(18,2)").as("last_value"))
      first.join(last, Seq("channel"), "full_outer")
        .select($"channel",
          coalesce($"first_convs", lit(0L)).as("first_convs"),
          coalesce($"first_value", lit(0).cast("decimal(18,2)"))
            .as("first_value"),
          coalesce($"last_convs", lit(0L)).as("last_convs"),
          coalesce($"last_value", lit(0).cast("decimal(18,2)"))
            .as("last_value"))
        .orderBy($"channel")
    }, Some("""
      WITH c AS (SELECT event_id AS cid, user_id, ts AS cts,
                   CAST(value AS DECIMAL(18,2)) AS v
                 FROM events WHERE event_type = 'purchase'),
      t AS (SELECT user_id, ts AS tts, event_id AS tid,
              event_type AS ch
            FROM events WHERE event_type IN ('view', 'click')),
      j AS (SELECT c.cid, c.v, t.tts, t.tid, t.ch
            FROM c JOIN t ON t.user_id = c.user_id
              AND t.tts <= c.cts AND t.tts >= c.cts - INTERVAL 7 DAY),
      r AS (SELECT *,
              row_number() OVER (PARTITION BY cid
                ORDER BY tts, tid) AS rf,
              row_number() OVER (PARTITION BY cid
                ORDER BY tts DESC, tid DESC) AS rl
            FROM j),
      f AS (SELECT ch AS channel, count(*) AS first_convs,
              CAST(sum(v) AS DECIMAL(18,2)) AS first_value
            FROM r WHERE rf = 1 GROUP BY 1),
      l AS (SELECT ch AS channel, count(*) AS last_convs,
              CAST(sum(v) AS DECIMAL(18,2)) AS last_value
            FROM r WHERE rl = 1 GROUP BY 1)
      SELECT coalesce(f.channel, l.channel) AS channel,
             coalesce(first_convs, 0) AS first_convs,
             coalesce(first_value, CAST(0 AS DECIMAL(18,2)))
               AS first_value,
             coalesce(last_convs, 0) AS last_convs,
             coalesce(last_value, CAST(0 AS DECIMAL(18,2)))
               AS last_value
      FROM f FULL OUTER JOIN l ON f.channel = l.channel
      ORDER BY channel"""))
  )
}
