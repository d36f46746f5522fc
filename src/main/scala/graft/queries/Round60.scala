package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{Tables => T}

/** Round-7 sixth wave: robust-statistics completions (seasonal
  * Mann–Kendall, Hodges–Lehmann shift, Wald–Wolfowitz runs test) and
  * t-closeness — the ordered-EMD privacy audit that completes the
  * k-anonymity / l-diversity family. Same determinism discipline as
  * [[graft.operators.Hypothesis]]: exact integers and decimals up to a
  * final double division.
  */
object Round60 {

  val all: Seq[Q] = Seq(

    // seasonal Mann–Kendall (Hirsch–Slack): trend in daily value totals
    // per event type, comparing only like weekdays — S and Var(S) sum
    // over the seven seasonal sub-series. The pair join runs on the
    // calendar-bounded daily reduce (≤C(5,2)·7 pairs per key), sign
    // comparisons on exact decimals.
    Q("q331_seasonal_mk", (s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(sum($"value".cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("x"))
        .withColumn("dow", dayofweek($"day"))
      val pairs = daily.as("l")
        .join(daily.as("r"), col("l.event_type") === col("r.event_type")
          && col("l.dow") === col("r.dow")
          && col("l.day") < col("r.day"))
        .groupBy(col("l.event_type").as("event_type")).agg(
          sum(signum(col("r.x") - col("l.x")).cast("long")).as("s"))
      val seasons = daily.groupBy($"event_type", $"dow")
        .agg(count(lit(1)).as("__ns"))
        .groupBy($"event_type").agg(
          sum($"__ns").as("n_days"),
          sum($"__ns" * ($"__ns" - 1) * ($"__ns" * 2 + 5)).as("__v18"))
      val j = pairs.join(seasons, "event_type")
      val varS = $"__v18".cast("double") / 18.0
      val sD = $"s".cast("double")
      j.filter(varS > 0)
        .select($"event_type", $"n_days", $"s",
          round(when($"s" === 0, lit(0.0))
            .otherwise((sD - signum(sD)) / sqrt(varS)), 6).as("z"))
        .orderBy($"event_type")
    }, Some("""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS x
            FROM events GROUP BY 1, 2),
      dd AS (SELECT event_type, day, x, dayofweek(day) + 1 AS dow
             FROM daily),
      p AS (SELECT l.event_type,
              CAST(sum(sign(r.x - l.x)) AS BIGINT) AS s
            FROM dd l JOIN dd r ON l.event_type = r.event_type
              AND l.dow = r.dow AND l.day < r.day
            GROUP BY 1),
      se AS (SELECT event_type, dow, count(*) AS ns
             FROM dd GROUP BY 1, 2),
      sz AS (SELECT event_type, CAST(sum(ns) AS BIGINT) AS n_days,
               CAST(sum(ns * (ns - 1) * (ns * 2 + 5)) AS BIGINT) AS v18
             FROM se GROUP BY 1)
      SELECT p.event_type, n_days, s,
             round(CASE WHEN s = 0 THEN 0.0
                   ELSE (CAST(s AS DOUBLE) - sign(CAST(s AS DOUBLE)))
                        / sqrt(CAST(v18 AS DOUBLE) / 18.0) END, 6) AS z
      FROM p JOIN sz USING (event_type)
      WHERE CAST(v18 AS DOUBLE) / 18.0 > 0
      ORDER BY event_type""")),

    // Hodges–Lehmann shift estimator per nation: the median of all
    // 1999-month × 2000-month revenue differences — the robust "how much
    // did revenue move" companion to q313's Cohen's d. The pair set is
    // calendar² (≤144/nation) over the monthly reduce; the even-count
    // median midpoint is computed in double from two exact decimals.
    Q("q332_hodges_lehmann", (s, d) => {
      import s.implicits._
      val monthly = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(T.nation(s, d), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name", year($"o_orderdate").as("yr"),
          month($"o_orderdate").as("mo"))
        .agg(sum($"o_totalprice".cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("rev"))
      val a = monthly.filter($"yr" === 1999)
        .select($"n_name", $"rev".as("ra"))
      val b = monthly.filter($"yr" === 2000)
        .select($"n_name".as("__nb"), $"rev".as("rb"))
      val diffs = a.join(b, $"n_name" === $"__nb")
        .select($"n_name", (($"rb" - $"ra") * 100).cast("long").as("dd"))
      val w = Window.partitionBy($"n_name").orderBy($"dd")
      val wn = Window.partitionBy($"n_name")
      val ranked = diffs
        .withColumn("__rk", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(wn))
      val mid = ranked.filter(
        $"__rk" === expr("(__n + 1) div 2") ||
          $"__rk" === expr("__n div 2") + 1)
      // exact integer cents to the last step: one IEEE division, no
      // engine-specific decimal rounding (sum over 1 or 2 mid rows;
      // ×(3−cnt) doubles the odd-n single median so /200 is uniform)
      mid.groupBy($"n_name").agg(
          max($"__n").as("n_pairs"),
          ((sum($"dd") * (lit(3L) - count(lit(1)))).cast("double")
            / 200.0).as("hl_shift"))
        .orderBy($"n_name")
    }, Some("""
      WITH monthly AS (SELECT n_name, year(o_orderdate) AS yr,
              month(o_orderdate) AS mo,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS rev
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2, 3),
      diffs AS (SELECT a.n_name,
                  CAST((b.rev - a.rev) * 100 AS BIGINT) AS dd
                FROM monthly a JOIN monthly b ON a.n_name = b.n_name
                WHERE a.yr = 1999 AND b.yr = 2000),
      ranked AS (SELECT n_name, dd,
                   row_number() OVER (PARTITION BY n_name ORDER BY dd)
                     AS rk,
                   count(*) OVER (PARTITION BY n_name) AS n
                 FROM diffs),
      mid AS (SELECT n_name, dd, n FROM ranked
              WHERE rk = (n + 1) // 2 OR rk = n // 2 + 1)
      SELECT n_name, CAST(max(n) AS BIGINT) AS n_pairs,
             CAST(sum(dd) * (3 - count(*)) AS DOUBLE) / 200.0 AS hl_shift
      FROM mid GROUP BY 1 ORDER BY 1""")),

    // Wald–Wolfowitz runs test: are daily up/down moves random per event
    // type? Signs from exact decimal day-over-day differences, runs as a
    // sign-change cumulative, and the classic mean/variance from exact
    // up/down counts — one keyed window pass over the daily reduce.
    Q("q333_runs_test", (s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(sum($"value".cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("x"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val moves = daily
        .withColumn("__diff", $"x" - lag($"x", 1).over(w))
        .filter($"__diff".isNotNull && $"__diff" =!= 0)
        .withColumn("__up", ($"__diff" > 0).cast("long"))
      val w2 = Window.partitionBy($"event_type").orderBy($"day")
      val runs = moves
        .withColumn("__chg",
          when(lag($"__up", 1).over(w2).isNull, 1L)
            .when(lag($"__up", 1).over(w2) =!= $"__up", 1L)
            .otherwise(0L))
      val agg = runs.groupBy($"event_type").agg(
        sum($"__up").as("__n1"),
        sum(lit(1L) - $"__up").as("__n2"),
        sum($"__chg").as("n_runs"))
      val n1 = $"__n1".cast("double"); val n2 = $"__n2".cast("double")
      val n = n1 + n2
      val mu = lit(2.0) * n1 * n2 / n + 1.0
      val sig2 = (lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n1 - n2))
        ./(n * n * (n - 1.0))
      agg.filter($"__n1" > 0 && $"__n2" > 0 && sig2 > 0)
        .select($"event_type", ($"__n1" + $"__n2").as("n_moves"),
          $"n_runs",
          round(($"n_runs".cast("double") - mu) / sqrt(sig2), 6).as("z"))
        .orderBy($"event_type")
    }, Some("""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS x
            FROM events GROUP BY 1, 2),
      mv AS (SELECT event_type, day,
               x - lag(x) OVER (PARTITION BY event_type ORDER BY day)
                 AS diff
             FROM daily),
      up AS (SELECT event_type, day,
               CASE WHEN diff > 0 THEN 1 ELSE 0 END AS u
             FROM mv WHERE diff IS NOT NULL AND diff <> 0),
      ch AS (SELECT event_type, u,
               CASE WHEN lag(u) OVER w IS NULL THEN 1
                    WHEN lag(u) OVER w <> u THEN 1 ELSE 0 END AS chg
             FROM up
             WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      agg AS (SELECT event_type, CAST(sum(u) AS BIGINT) AS n1,
                CAST(sum(1 - u) AS BIGINT) AS n2,
                CAST(sum(chg) AS BIGINT) AS n_runs
              FROM ch GROUP BY 1)
      SELECT event_type, n1 + n2 AS n_moves, n_runs,
             round((CAST(n_runs AS DOUBLE)
                    - (2.0 * n1 * n2 / (CAST(n1 AS DOUBLE) + n2) + 1.0))
                   / sqrt((2.0 * n1 * n2
                           * (2.0 * n1 * n2 - CAST(n1 AS DOUBLE) - n2))
                          / ((CAST(n1 AS DOUBLE) + n2)
                             * (CAST(n1 AS DOUBLE) + n2)
                             * (CAST(n1 AS DOUBLE) + n2 - 1.0))), 6) AS z
      FROM agg
      WHERE n1 > 0 AND n2 > 0
        AND (2.0 * n1 * n2 * (2.0 * n1 * n2 - CAST(n1 AS DOUBLE) - n2))
            / ((CAST(n1 AS DOUBLE) + n2) * (CAST(n1 AS DOUBLE) + n2)
               * (CAST(n1 AS DOUBLE) + n2 - 1.0)) > 0
      ORDER BY event_type""")),

    // t-closeness: ordered earth-mover's distance between each
    // (segment, nation) class's sensitive distribution (acctbal-thousand
    // buckets, q326's attribute) and the global one. The EMD numerator
    // Σ|cumN_b·M − cumM_b·N| is EXACT cross-multiplied integer
    // arithmetic summed over the bucket spine — one division at the end.
    // Grid = classes × global buckets, linear in classes.
    Q("q334_t_closeness", (s, d) => {
      import s.implicits._
      val rows = T.customer(s, d)
        .join(T.nation(s, d), $"c_nationkey" === $"n_nationkey")
        .select($"c_mktsegment", $"n_name",
          floor($"c_acctbal" / 1000.0).cast("long").as("b"))
      val global = rows.groupBy($"b").agg(count(lit(1)).as("m"))
      val classes = rows.select($"c_mktsegment", $"n_name").distinct()
      val perClass = rows.groupBy($"c_mktsegment", $"n_name", $"b")
        .agg(count(lit(1)).as("cnt"))
      val grid = classes.crossJoin(broadcast(global))
        .join(perClass, Seq("c_mktsegment", "n_name", "b"), "left")
        .withColumn("__c", coalesce($"cnt", lit(0L)))
      val wCum = Window.partitionBy($"c_mktsegment", $"n_name")
        .orderBy($"b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wCls = Window.partitionBy($"c_mktsegment", $"n_name")
      val cum = grid
        .withColumn("__cumn", sum($"__c").over(wCum))
        .withColumn("__cumm", sum($"m").over(wCum))
        .withColumn("__ntot", sum($"__c").over(wCls))
        .withColumn("__mtot", sum($"m").over(wCls))
        .withColumn("__k", count(lit(1)).over(wCls))
      cum.groupBy($"c_mktsegment", $"n_name").agg(
          max($"__ntot").as("n"),
          max($"__mtot").as("__m"),
          max($"__k").as("__kk"),
          sum(abs($"__cumn" * $"__mtot" - $"__cumm" * $"__ntot"))
            .as("__num"))
        .filter($"n" > 0 && $"__kk" > 1)
        .select($"c_mktsegment", $"n_name", $"n",
          round($"__num".cast("double")
            / ($"n" * $"__m" * ($"__kk" - 1)).cast("double"), 6)
            .as("t_emd"))
        .orderBy($"c_mktsegment", $"n_name")
    }, Some("""
      WITH rows_ AS (SELECT c_mktsegment, n_name,
              CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS b
            FROM customer JOIN nation ON c_nationkey = n_nationkey),
      global_ AS (SELECT b, count(*) AS m FROM rows_ GROUP BY 1),
      classes AS (SELECT DISTINCT c_mktsegment, n_name FROM rows_),
      pc AS (SELECT c_mktsegment, n_name, b, count(*) AS cnt
             FROM rows_ GROUP BY 1, 2, 3),
      grid AS (SELECT c.c_mktsegment, c.n_name, g.b, g.m,
                 coalesce(cnt, 0) AS cc
               FROM classes c CROSS JOIN global_ g
               LEFT JOIN pc ON pc.c_mktsegment = c.c_mktsegment
                 AND pc.n_name = c.n_name AND pc.b = g.b),
      cum AS (SELECT c_mktsegment, n_name, b, m, cc,
                sum(cc) OVER wc AS cumn,
                sum(m) OVER wc AS cumm,
                sum(cc) OVER wp AS ntot,
                sum(m) OVER wp AS mtot,
                count(*) OVER wp AS k
              FROM grid
              WINDOW wc AS (PARTITION BY c_mktsegment, n_name ORDER BY b
                  ROWS UNBOUNDED PRECEDING),
                wp AS (PARTITION BY c_mktsegment, n_name))
      SELECT c_mktsegment, n_name, CAST(max(ntot) AS BIGINT) AS n,
             round(CAST(sum(abs(cumn * mtot - cumm * ntot)) AS DOUBLE)
                   / CAST(max(ntot) * max(mtot) * (max(k) - 1)
                       AS DOUBLE), 6) AS t_emd
      FROM cum GROUP BY 1, 2
      HAVING max(ntot) > 0 AND max(k) > 1
      ORDER BY 1, 2"""))
  )
}
