package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.{Tables => T}

/** Round-6 forty-sixth wave: binary-segmentation changepoint, one-way
  * ANOVA.
  */
object Round54 {

  val all: Seq[Q] = Seq(

    // exact single changepoint per event type (binary segmentation,
    // the top-1 step of Scott-Knott/BinSeg): the day boundary whose
    // mean split maximizes the between-segment SSE reduction
    // n_l·n_r/n·(m_l − m_r)² — cumulative cents sums are exact, every
    // candidate's score derives from identical integers through the
    // identical double expression, argmax tie-breaks on the day
    Q("q305_changepoint", (s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg((sum($"value".cast("decimal(18,2)")) * 100)
          .cast("long").as("yc"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wg = Window.partitionBy($"event_type")
      val cum = daily
        .withColumn("__nl", count(lit(1)).over(w))
        .withColumn("__sl", sum($"yc").over(w))
        .withColumn("__n", count(lit(1)).over(wg))
        .withColumn("__s", sum($"yc").over(wg))
        .filter($"__nl" < $"__n")
      val nl = $"__nl".cast("double"); val nr = ($"__n" - $"__nl").cast("double")
      val ml = $"__sl".cast("double") / nl
      val mr = ($"__s" - $"__sl").cast("double") / nr
      val red = nl * nr / $"__n".cast("double") * (ml - mr) * (ml - mr)
      cum.withColumn("__red", red)
        .withColumn("__rn", row_number().over(Window
          .partitionBy($"event_type")
          .orderBy($"__red".desc, $"day".asc)))
        .filter($"__rn" === 1)
        .select($"event_type", $"day".as("split_day"),
          $"__nl".as("n_left"), ($"__n" - $"__nl").as("n_right"),
          round(ml / 100.0, 6).as("mean_left"),
          round(mr / 100.0, 6).as("mean_right"),
          round($"__red" / 10000.0, 4).as("sse_reduction"))
        .orderBy($"event_type")
    }, Some("""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                       CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
                              AS DECIMAL(20,2)) * 100 AS BIGINT) AS yc
                     FROM events GROUP BY 1, 2),
      cum AS (SELECT event_type, day,
                count(*) OVER wc AS nl, CAST(sum(yc) OVER wc AS BIGINT)
                  AS sl,
                count(*) OVER wg AS n, CAST(sum(yc) OVER wg AS BIGINT)
                  AS s
              FROM daily
              WINDOW wc AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              wg AS (PARTITION BY event_type)),
      sc AS (SELECT *,
               CAST(nl AS DOUBLE) * CAST(n - nl AS DOUBLE)
                 / CAST(n AS DOUBLE)
                 * (CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)
                    - CAST(s - sl AS DOUBLE) / CAST(n - nl AS DOUBLE))
                 * (CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)
                    - CAST(s - sl AS DOUBLE) / CAST(n - nl AS DOUBLE))
                 AS red
             FROM cum WHERE nl < n),
      r AS (SELECT *, row_number() OVER (PARTITION BY event_type
              ORDER BY red DESC, day) AS rn
            FROM sc)
      SELECT event_type, day AS split_day, nl AS n_left,
             n - nl AS n_right,
             round(CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE) / 100.0, 6)
               AS mean_left,
             round(CAST(s - sl AS DOUBLE) / CAST(n - nl AS DOUBLE)
                   / 100.0, 6) AS mean_right,
             round(red / 10000.0, 4) AS sse_reduction
      FROM r WHERE rn = 1 ORDER BY event_type""")),

    // does weekday matter at all? one-way ANOVA F per event type over
    // weekday groups — SSB and SSW from exact integer-cent moments
    // through identical double expressions, one rounded F
    Q("q306_anova", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d).select($"event_type",
        dayofweek($"ts").as("dow"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("yc"))
      val grp = ev.groupBy($"event_type", $"dow")
        .agg(count(lit(1)).as("__ng"), sum($"yc").as("__sg"),
          sum($"yc".cast("decimal(18,0)") * $"yc".cast("decimal(18,0)"))
            .as("__qg"))
      val tot = grp.groupBy($"event_type")
        .agg(count(lit(1)).as("k"), sum($"__ng").as("__n"),
          sum($"__sg").as("__s"), sum($"__qg").as("__q"))
      val ssb = grp.join(tot, "event_type")
        .groupBy($"event_type")
        .agg(sum(($"__sg".cast("double") / $"__ng".cast("double")
            - $"__s".cast("double") / $"__n".cast("double"))
          * ($"__sg".cast("double") / $"__ng".cast("double")
            - $"__s".cast("double") / $"__n".cast("double"))
          * $"__ng".cast("double")).as("__ssb"))
      val ssw = grp.groupBy($"event_type")
        .agg(sum($"__qg".cast("double")
          - $"__sg".cast("double") * $"__sg".cast("double")
            / $"__ng".cast("double")).as("__ssw"))
      tot.join(ssb, "event_type").join(ssw, "event_type")
        .filter($"k" > 1 && $"__n" > $"k" && $"__ssw" > 0)
        .select($"event_type", $"k", $"__n".as("n"),
          round(($"__ssb" / ($"k" - 1).cast("double"))
            / ($"__ssw" / ($"__n" - $"k").cast("double")) , 6).as("f"))
        .orderBy($"event_type")
    }, Some("""
      WITH ev AS (SELECT event_type, dayofweek(ts) + 1 AS dow,
                    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                      AS yc
                  FROM events),
      grp AS (SELECT event_type, dow, count(*) AS ng,
                CAST(sum(yc) AS BIGINT) AS sg,
                sum(CAST(yc AS DECIMAL(18,0)) * CAST(yc AS DECIMAL(18,0)))
                  AS qg
              FROM ev GROUP BY 1, 2),
      tot AS (SELECT event_type, count(*) AS k,
                CAST(sum(ng) AS BIGINT) AS n,
                CAST(sum(sg) AS BIGINT) AS s,
                sum(qg) AS q
              FROM grp GROUP BY 1),
      ssb AS (SELECT grp.event_type,
                sum((CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)
                     - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)
                       - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    * CAST(ng AS DOUBLE)) AS v
              FROM grp JOIN tot ON grp.event_type = tot.event_type
              GROUP BY 1),
      ssw AS (SELECT event_type,
                sum(CAST(qg AS DOUBLE)
                    - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                      / CAST(ng AS DOUBLE)) AS v
              FROM grp GROUP BY 1)
      SELECT tot.event_type, k, n,
             round((ssb.v / CAST(k - 1 AS DOUBLE))
                   / (ssw.v / CAST(n - k AS DOUBLE)), 6) AS f
      FROM tot JOIN ssb ON tot.event_type = ssb.event_type
      JOIN ssw ON tot.event_type = ssw.event_type
      WHERE k > 1 AND n > k AND ssw.v > 0
      ORDER BY tot.event_type"""))
  )
}
