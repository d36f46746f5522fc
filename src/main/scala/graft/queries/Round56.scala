package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Hypothesis
import graft.sources.{Tables => T}

/** Round-7 second wave: the k-sample / paired / survival hypothesis-test
  * family ([[graft.operators.Hypothesis]]), rank correlations, sequential
  * drift detection, and two exact-arithmetic inequality/diversity reports.
  * Every final projection follows the hash-safe type contract
  * (BIGINT/DOUBLE/VARCHAR/DATE only).
  */
object Round56 {

  val all: Seq[Q] = Seq(

    // Kruskal–Wallis rank ANOVA: does order value differ across market
    // segments within each region? Midranks + Σ(t²−1) tie trick share one
    // hash partitioning on region; the only fractional reduction (ΣRⱼ²/nⱼ)
    // is an ordered ≤k-row window cumsum, so both engines add identically.
    Q("q308_kruskal_wallis", (s, d) => {
      import s.implicits._
      val df = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(T.nation(s, d), $"c_nationkey" === $"n_nationkey")
        .join(T.region(s, d), $"n_regionkey" === $"r_regionkey")
        .select($"r_name", $"c_mktsegment", $"o_totalprice")
      Hypothesis.kruskalWallis(df, "r_name", "c_mktsegment", "o_totalprice")
        .orderBy($"r_name")
    }, Some("""
      WITH pool AS (
        SELECT r_name, c_mktsegment AS treat,
               CAST(o_totalprice AS DOUBLE) AS x
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE o_totalprice IS NOT NULL),
      r AS (SELECT r_name, treat, x,
              rank() OVER (PARTITION BY r_name ORDER BY x) AS minrank,
              count(*) OVER (PARTITION BY r_name, x) AS t
            FROM pool),
      g AS (SELECT r_name, count(*) AS n,
              CAST(sum(t * t - 1) AS BIGINT) AS tsum
            FROM r GROUP BY 1),
      pt AS (SELECT r_name, treat, count(*) AS nj,
               sum(minrank + (t - 1) / 2.0) AS rj
             FROM r GROUP BY 1, 2),
      cum AS (SELECT r_name, treat,
                sum(rj * rj / nj) OVER (PARTITION BY r_name ORDER BY treat
                  ROWS UNBOUNDED PRECEDING) AS cumterm
              FROM pt),
      srn AS (SELECT r_name, count(*) AS k,
                max_by(cumterm, treat) AS srn
              FROM cum GROUP BY 1)
      SELECT g.r_name, n, k,
             round(12.0 / (n * (n + 1.0)) * srn - 3.0 * (n + 1.0), 6) AS h,
             round((12.0 / (n * (n + 1.0)) * srn - 3.0 * (n + 1.0))
                   / (1.0 - CAST(tsum AS DOUBLE)
                            / (CAST(n AS DOUBLE) * n * n - n)), 6) AS h_adj,
             k - 1 AS df
      FROM g JOIN srn USING (r_name)
      WHERE n > k AND k > 1
        AND 1.0 - CAST(tsum AS DOUBLE)
                  / (CAST(n AS DOUBLE) * n * n - n) > 0
      ORDER BY r_name""")),

    // log-rank survival comparison: is time-to-next-purchase hazard the
    // same for even- vs odd-id users? Reuses q235's censored-duration
    // shaping; at-risk tables come from one per-duration reduce, so the
    // Mantel–Haenszel windows run over ≤ (distinct durations) rows.
    Q("q309_logrank", (s, d) => {
      import s.implicits._
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
          $"__next".isNotNull.cast("long").as("observed"),
          when(pmod($"user_id", lit(2)) === 0, "even")
            .otherwise("odd").as("cohort"))
      Hypothesis.logRank(obs, "dur", "observed", "cohort", "even")
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
                   CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev,
                   CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS a
            FROM nx JOIN ld USING (user_id)),
      byt AS (SELECT t, CAST(sum(ev * a) AS BIGINT) AS d_a,
                CAST(sum(ev) AS BIGINT) AS d,
                count(*) AS c, CAST(sum(a) AS BIGINT) AS c_a
              FROM o GROUP BY 1),
      risk AS (SELECT *,
                 sum(c) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                   AND UNBOUNDED FOLLOWING) AS n,
                 sum(c_a) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                   AND UNBOUNDED FOLLOWING) AS n_a
               FROM byt),
      terms AS (SELECT t, d_a, c_a, c,
          CAST(d AS DOUBLE) * n_a / n AS e_a,
          CASE WHEN n > 1
               THEN CAST(d AS DOUBLE) * (CAST(n_a AS DOUBLE) / n)
                    * (1.0 - CAST(n_a AS DOUBLE) / n)
                    * (n - CAST(d AS DOUBLE)) / (n - 1.0)
               ELSE 0.0 END AS v
        FROM risk),
      cum AS (SELECT t, sum(d_a) OVER w AS o_cum, sum(e_a) OVER w AS e_cum,
                     sum(v) OVER w AS v_cum, sum(c_a) OVER w AS na_tot,
                     sum(c) OVER w AS n_tot
              FROM terms WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING))
      SELECT CAST(max_by(na_tot, t) AS BIGINT) AS n_a,
             CAST(max_by(n_tot, t) - max_by(na_tot, t) AS BIGINT) AS n_b,
             CAST(max_by(o_cum, t) AS BIGINT) AS o_a,
             round(max_by(e_cum, t), 6) AS e_a,
             round(max_by(v_cum, t), 6) AS v,
             round((CAST(max_by(o_cum, t) AS DOUBLE) - max_by(e_cum, t))
                   / sqrt(max_by(v_cum, t)), 6) AS z
      FROM cum
      HAVING max_by(v_cum, t) > 0""")),

    // Spearman rank correlation per returnflag between quantity and price.
    // Doubled midranks 2r = 2·minrank + t − 1 are exact integers, so all
    // five Pearson moments accumulate exactly (DECIMAL(38,0) / int128);
    // the correlation is one double expression over exact moments.
    Q("q310_spearman", (s, d) => {
      import s.implicits._
      val base = T.lineitem(s, d).select($"l_returnflag",
        $"l_quantity".cast("double").as("__x"),
        $"l_extendedprice".cast("double").as("__y"))
      // doubled midranks 2r = 2·cum − t + 1 (exact integers) from the
      // range-partitioned grouped scan — one spine per axis, joined back
      // on the high-cardinality (flag, value) key; no low-cardinality
      // window partition ever sorts the raw table
      def spine(c: String, out: String) =
        graft.operators.Scale
          .groupedMidranks(base.select($"l_returnflag", col(c)),
            Seq("l_returnflag"), c, tieCol = "__t", cumCol = "__cum",
            rank2Col = out)
          .select($"l_returnflag", col(c), col(out))
      val ranked = base
        .join(spine("__x", "__a"), Seq("l_returnflag", "__x"))
        .join(spine("__y", "__b"), Seq("l_returnflag", "__y"))
      val m = ranked.groupBy($"l_returnflag").agg(
        count(lit(1)).as("n"),
        sum($"__a".cast("decimal(28,0)")).as("__sa"),
        sum($"__b".cast("decimal(28,0)")).as("__sb"),
        sum(($"__a" * $"__a").cast("decimal(38,0)")).as("__saa"),
        sum(($"__b" * $"__b").cast("decimal(38,0)")).as("__sbb"),
        sum(($"__a" * $"__b").cast("decimal(38,0)")).as("__sab"))
      val nD = $"n".cast("double")
      val sa = $"__sa".cast("double"); val sb = $"__sb".cast("double")
      val saa = $"__saa".cast("double"); val sbb = $"__sbb".cast("double")
      val sab = $"__sab".cast("double")
      m.filter($"n" > 2)
        .select($"l_returnflag", $"n",
          round((nD * sab - sa * sb)
            / sqrt((nD * saa - sa * sa) * (nD * sbb - sb * sb)), 6)
            .as("rho"))
        .orderBy($"l_returnflag")
    }, Some("""
      WITH base AS (SELECT l_returnflag,
              CAST(l_quantity AS DOUBLE) AS x,
              CAST(l_extendedprice AS DOUBLE) AS y
            FROM lineitem),
      r AS (SELECT l_returnflag,
              2 * rank() OVER (PARTITION BY l_returnflag ORDER BY x)
                + count(*) OVER (PARTITION BY l_returnflag, x) - 1 AS a,
              2 * rank() OVER (PARTITION BY l_returnflag ORDER BY y)
                + count(*) OVER (PARTITION BY l_returnflag, y) - 1 AS b
            FROM base),
      m AS (SELECT l_returnflag, count(*) AS n,
              sum(a) AS sa, sum(b) AS sb, sum(a * a) AS saa,
              sum(b * b) AS sbb, sum(a * b) AS sab
            FROM r GROUP BY 1)
      SELECT l_returnflag, n,
             round((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
                    - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                   / sqrt((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                           - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                          * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                             - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))),
                   6) AS rho
      FROM m WHERE n > 2 ORDER BY l_returnflag""")),

    // Mann–Kendall monotone-trend test with Kendall τ_b per nation over
    // the monthly revenue series. The pair join is over the calendar-
    // bounded monthly reduce (≈80 rows/nation), never the raw orders;
    // S and the tie counts are exact-decimal comparisons.
    Q("q311_mann_kendall", (s, d) => {
      import s.implicits._
      val monthly = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(T.nation(s, d), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name",
          (year($"o_orderdate") * 12 + month($"o_orderdate"))
            .cast("long").as("ym"))
        .agg(sum($"o_totalprice".cast("decimal(18,2)")).as("rev"))
      Hypothesis.mannKendall(monthly, "n_name", "ym", "rev")
        .orderBy($"n_name")
    }, Some("""
      WITH m AS (SELECT n_name,
              CAST(year(o_orderdate) * 12 + month(o_orderdate)
                AS BIGINT) AS ym,
              sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2),
      p AS (SELECT l.n_name,
              CAST(sum(sign(r.rev - l.rev)) AS BIGINT) AS s,
              CAST(sum(CASE WHEN l.rev = r.rev THEN 1 ELSE 0 END)
                AS BIGINT) AS tpairs
            FROM m l JOIN m r
              ON l.n_name = r.n_name AND l.ym < r.ym
            GROUP BY 1),
      t AS (SELECT n_name, count(*) AS nvals,
              CAST(sum(t) AS BIGINT) AS n,
              CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tvar
            FROM (SELECT n_name, rev, count(*) AS t
                  FROM m GROUP BY 1, 2) GROUP BY 1)
      SELECT p.n_name, n, s,
             round(CAST(s AS DOUBLE)
                   / sqrt((n * (n - 1.0) / 2.0 - CAST(tpairs AS DOUBLE))
                          * (n * (n - 1.0) / 2.0)), 6) AS tau_b,
             round(CASE WHEN s = 0 THEN 0.0
                   ELSE (CAST(s AS DOUBLE) - sign(CAST(s AS DOUBLE)))
                        / sqrt((CAST(n AS DOUBLE) * (n - 1.0)
                                * (2.0 * n + 5.0)
                                - CAST(tvar AS DOUBLE)) / 18.0) END,
                   6) AS z
      FROM p JOIN t USING (n_name)
      WHERE n > 2 AND tpairs < n * (n - 1) // 2
        AND (CAST(n AS DOUBLE) * (n - 1.0) * (2.0 * n + 5.0)
             - CAST(tvar AS DOUBLE)) / 18.0 > 0
      ORDER BY n_name""")),

    // McNemar's paired test per market segment: did each customer order
    // in 1999 vs in 2000? Discordant counts stay integers to the last
    // division; one reduce over orders, one broadcastable join back.
    Q("q312_mcnemar", (s, d) => {
      import s.implicits._
      val f = T.orders(s, d)
        .select($"o_custkey", year($"o_orderdate").as("__y"))
        .groupBy($"o_custkey").agg(
          max(($"__y" === 1999).cast("int")).as("__a"),
          max(($"__y" === 2000).cast("int")).as("__b"))
      val base = T.customer(s, d)
        .join(f, $"c_custkey" === $"o_custkey", "left")
        .select($"c_mktsegment",
          (coalesce($"__a", lit(0)) === 1).as("in_a"),
          (coalesce($"__b", lit(0)) === 1).as("in_b"))
      Hypothesis.mcnemar(base, "c_mktsegment", "in_a", "in_b")
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH f AS (SELECT o_custkey,
              max(CASE WHEN year(o_orderdate) = 1999 THEN 1 ELSE 0 END)
                AS a,
              max(CASE WHEN year(o_orderdate) = 2000 THEN 1 ELSE 0 END)
                AS b
            FROM orders GROUP BY 1),
      base AS (SELECT c_mktsegment,
                 coalesce(a, 0) = 1 AS in_a, coalesce(b, 0) = 1 AS in_b
               FROM customer LEFT JOIN f ON c_custkey = o_custkey),
      agg AS (SELECT c_mktsegment, count(*) AS n_pairs,
                CAST(sum(CASE WHEN in_a AND NOT in_b THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
                CAST(sum(CASE WHEN NOT in_a AND in_b THEN 1 ELSE 0 END)
                  AS BIGINT) AS c
              FROM base GROUP BY 1)
      SELECT c_mktsegment, n_pairs, b, c,
             round((CAST(b AS DOUBLE) - c) * (CAST(b AS DOUBLE) - c)
                   / (CAST(b AS DOUBLE) + c), 6) AS chi2,
             round(greatest(abs(CAST(b AS DOUBLE) - c) - 1.0, 0.0)
                   * greatest(abs(CAST(b AS DOUBLE) - c) - 1.0, 0.0)
                   / (CAST(b AS DOUBLE) + c), 6) AS chi2_cc
      FROM agg WHERE b + c > 0 ORDER BY c_mktsegment""")),

    // Cohen's d / Hedges' g effect size per nation, open vs fulfilled
    // order values — the magnitude companion to q158's Welch t and
    // q255's Mann–Whitney z. Exact decimal moments, one aggregate pass.
    Q("q313_cohens_d", (s, d) => {
      import s.implicits._
      val df = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(T.nation(s, d), $"c_nationkey" === $"n_nationkey")
        .select($"n_name", $"o_orderstatus", $"o_totalprice")
      Hypothesis.cohensD(df, "n_name", "o_orderstatus", "O", "F",
          "o_totalprice")
        .orderBy($"n_name")
    }, Some("""
      WITH pool AS (SELECT n_name, o_orderstatus AS side,
              CAST(o_totalprice AS DECIMAL(18,2)) AS x
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE o_orderstatus IN ('O', 'F')
              AND o_totalprice IS NOT NULL),
      agg AS (SELECT n_name,
                CAST(sum(CASE WHEN side = 'O' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_a,
                CAST(sum(CASE WHEN side = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_b,
                sum(CASE WHEN side = 'O' THEN x
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS sxa,
                sum(CASE WHEN side = 'F' THEN x
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS sxb,
                sum(CASE WHEN side = 'O' THEN CAST(x * x AS DECIMAL(38,4))
                         ELSE CAST(0 AS DECIMAL(38,4)) END) AS sxa2,
                sum(CASE WHEN side = 'F' THEN CAST(x * x AS DECIMAL(38,4))
                         ELSE CAST(0 AS DECIMAL(38,4)) END) AS sxb2
              FROM pool GROUP BY 1)
      SELECT n_name, n_a, n_b,
             round((CAST(sxa AS DOUBLE) / n_a - CAST(sxb AS DOUBLE) / n_b)
                   / sqrt(((CAST(sxa2 AS DOUBLE)
                            - CAST(sxa AS DOUBLE) * CAST(sxa AS DOUBLE)
                              / n_a)
                           + (CAST(sxb2 AS DOUBLE)
                              - CAST(sxb AS DOUBLE) * CAST(sxb AS DOUBLE)
                                / n_b))
                          / (CAST(n_a AS DOUBLE) + n_b - 2.0)), 6)
               AS cohens_d,
             round((CAST(sxa AS DOUBLE) / n_a - CAST(sxb AS DOUBLE) / n_b)
                   / sqrt(((CAST(sxa2 AS DOUBLE)
                            - CAST(sxa AS DOUBLE) * CAST(sxa AS DOUBLE)
                              / n_a)
                           + (CAST(sxb2 AS DOUBLE)
                              - CAST(sxb AS DOUBLE) * CAST(sxb AS DOUBLE)
                                / n_b))
                          / (CAST(n_a AS DOUBLE) + n_b - 2.0))
                   * (1.0 - 3.0 / (4.0 * (CAST(n_a AS DOUBLE) + n_b)
                                   - 9.0)), 6) AS hedges_g
      FROM agg
      WHERE n_a > 1 AND n_b > 1
        AND ((CAST(sxa2 AS DOUBLE)
              - CAST(sxa AS DOUBLE) * CAST(sxa AS DOUBLE) / n_a)
             + (CAST(sxb2 AS DOUBLE)
                - CAST(sxb AS DOUBLE) * CAST(sxb AS DOUBLE) / n_b)) > 0
      ORDER BY n_name""")),

    // Page–Hinkley sequential drift monitor per event type over daily
    // value totals — the online companion to q156's retrospective CUSUM.
    // Daily totals are exact decimals; the PH recursion is ordered window
    // cumsums over the ≤31-day series.
    Q("q314_page_hinkley", (s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(sum($"value".cast("decimal(18,2)")).as("x"))
      Hypothesis.pageHinkley(daily, "event_type", "day", "x",
          delta = 0.0, lambda = 500.0)
        .orderBy($"event_type")
    }, Some("""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
              CAST(sum(CAST(value AS DECIMAL(18,2)))
                AS DECIMAL(18,4)) AS x
            FROM events GROUP BY 1, 2),
      st AS (SELECT event_type, day, x,
               count(*) OVER w AS i,
               sum(x) OVER w AS cumx
             FROM daily
             WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING)),
      tm AS (SELECT event_type, day, i,
               CAST(x AS DOUBLE) - CAST(cumx AS DOUBLE)
                 / CAST(i AS DOUBLE) - 0.0 AS term
             FROM st),
      mm AS (SELECT event_type, day, i,
               sum(term) OVER w AS m
             FROM tm
             WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING)),
      ph AS (SELECT event_type, day, i,
               m - min(m) OVER w AS ph
             FROM mm
             WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING))
      SELECT event_type, CAST(max(i) AS BIGINT) AS n_points,
             round(max_by(ph, day), 6) AS ph_final,
             round(max(ph), 6) AS ph_max,
             min(CASE WHEN ph > 500.0 THEN day END) AS first_alarm
      FROM ph GROUP BY 1 ORDER BY 1""")),

    // lead–lag cross-correlation: daily click volume vs purchase volume
    // at lags −7..+7 — which signal leads? Count moments are exact
    // integers; the lag fan-out is a 15-row broadcast against the
    // calendar-bounded daily reduce.
    Q("q315_lead_lag", (s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .groupBy(to_date($"ts").as("day"))
        .agg(sum(($"event_type" === "click").cast("long")).as("a"),
          sum(($"event_type" === "purchase").cast("long")).as("b"))
      val lags = s.range(-7, 8).select($"id".as("lag"))
      val pairs = daily.select($"day", $"a")
        .crossJoin(broadcast(lags))
        .join(daily.select($"day".as("__day_b"), $"b"),
          expr("__day_b = date_add(day, cast(lag as int))"))
      val m = pairs.groupBy($"lag").agg(
        count(lit(1)).as("n_days"),
        sum($"a").as("__sa"), sum($"b").as("__sb"),
        sum($"a" * $"a").as("__saa"), sum($"b" * $"b").as("__sbb"),
        sum($"a" * $"b").as("__sab"))
      val nD = $"n_days".cast("double")
      val sa = $"__sa".cast("double"); val sb = $"__sb".cast("double")
      val saa = $"__saa".cast("double"); val sbb = $"__sbb".cast("double")
      val sab = $"__sab".cast("double")
      val den = (nD * saa - sa * sa) * (nD * sbb - sb * sb)
      m.filter($"n_days" > 2 && den > 0)
        .select($"lag", $"n_days",
          round((nD * sab - sa * sb) / sqrt(den), 6).as("xcorr"))
        .orderBy($"lag")
    }, Some("""
      WITH daily AS (SELECT CAST(ts AS DATE) AS day,
              CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS a,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS b
            FROM events GROUP BY 1),
      lags AS (SELECT CAST(range AS BIGINT) AS lag FROM range(-7, 8)),
      pairs AS (SELECT lag, x.a, y.b
                FROM lags CROSS JOIN daily x
                JOIN daily y ON y.day = x.day + CAST(lag AS INTEGER)),
      m AS (SELECT lag, count(*) AS n_days,
              CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
              CAST(sum(a * a) AS BIGINT) AS saa,
              CAST(sum(b * b) AS BIGINT) AS sbb,
              CAST(sum(a * b) AS BIGINT) AS sab
            FROM pairs GROUP BY 1)
      SELECT lag, n_days,
             round((CAST(n_days AS DOUBLE) * CAST(sab AS DOUBLE)
                    - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                   / sqrt((CAST(n_days AS DOUBLE) * CAST(saa AS DOUBLE)
                           - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                          * (CAST(n_days AS DOUBLE) * CAST(sbb AS DOUBLE)
                             - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))),
                   6) AS xcorr
      FROM m
      WHERE n_days > 2
        AND (CAST(n_days AS DOUBLE) * CAST(saa AS DOUBLE)
             - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
            * (CAST(n_days AS DOUBLE) * CAST(sbb AS DOUBLE)
               - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) > 0
      ORDER BY lag""")),

    // lexical-diversity report per source: type–token ratio and hapax
    // share — corpus-health signals next to q187's vocab growth and
    // q265's Zipf fit. One (source, word) reduce carries all three
    // counts; ratios are single divisions over exact longs.
    Q("q316_lexical_diversity", (s, d) => {
      import s.implicits._
      val words = T.documents(s, d)
        .select($"source", explode(split($"text", " ")).as("w"))
        .filter(length($"w") > 0)
      val wc = words.groupBy($"source", $"w").agg(count(lit(1)).as("c"))
      wc.groupBy($"source").agg(
          sum($"c").as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(($"c" === 1).cast("long")).as("n_hapax"))
        .select($"source", $"n_tokens", $"n_types", $"n_hapax",
          round($"n_types".cast("double") / $"n_tokens".cast("double"), 6)
            .as("ttr"),
          round($"n_hapax".cast("double") / $"n_types".cast("double"), 6)
            .as("hapax_ratio"))
        .orderBy($"source")
    }, Some("""
      WITH words AS (SELECT source, unnest(string_split(text, ' ')) AS w
                     FROM documents),
      wc AS (SELECT source, w, count(*) AS c
             FROM words WHERE length(w) > 0 GROUP BY 1, 2),
      agg AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
                count(*) AS n_types,
                CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_hapax
              FROM wc GROUP BY 1)
      SELECT source, n_tokens, n_types, n_hapax,
             round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
               AS ttr,
             round(CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE), 6)
               AS hapax_ratio
      FROM agg ORDER BY source""")),

    // Hoover (Robin Hood) inequality index per market segment over
    // customer lifetime spend — the transfer-share companion to q254's
    // Gini and q269's Lorenz points. The numerator Σ|xᵢ·n − X| stays an
    // exact decimal under any partitioning; one double division at the end.
    Q("q317_hoover", (s, d) => {
      import s.implicits._
      val spend = T.orders(s, d).groupBy($"o_custkey")
        .agg(sum($"o_totalprice".cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("x"))
      val seg = T.customer(s, d)
        .join(spend, $"c_custkey" === $"o_custkey")
        .select($"c_mktsegment", $"x")
      val wg = Window.partitionBy($"c_mktsegment")
      val dev = seg
        .withColumn("__n", count(lit(1)).over(wg))
        .withColumn("__tot",
          sum($"x").over(wg).cast("decimal(18,2)"))
        .withColumn("__dev",
          abs($"x" * $"__n".cast("decimal(10,0)") - $"__tot"))
      dev.groupBy($"c_mktsegment").agg(
          max($"__n").as("n_customers"),
          max($"__tot".cast("double")).as("total_spend"),
          (sum($"__dev").cast("double")
            / (lit(2.0) * max($"__n").cast("double")
               * max($"__tot".cast("double")))).as("__h"))
        .select($"c_mktsegment", $"n_customers",
          round($"total_spend", 2).as("total_spend"),
          round($"__h", 6).as("hoover"))
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH spend AS (SELECT o_custkey,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS x
            FROM orders GROUP BY 1),
      seg AS (SELECT c_mktsegment, x
              FROM customer JOIN spend ON c_custkey = o_custkey),
      dev AS (SELECT c_mktsegment,
                count(*) OVER (PARTITION BY c_mktsegment) AS n,
                CAST(sum(x) OVER (PARTITION BY c_mktsegment)
                  AS DECIMAL(18,2)) AS tot,
                abs(x * CAST(count(*) OVER (PARTITION BY c_mktsegment)
                      AS DECIMAL(10,0))
                    - CAST(sum(x) OVER (PARTITION BY c_mktsegment)
                        AS DECIMAL(18,2))) AS dev
              FROM seg)
      SELECT c_mktsegment, CAST(max(n) AS BIGINT) AS n_customers,
             round(max(CAST(tot AS DOUBLE)), 2) AS total_spend,
             round(CAST(sum(dev) AS DOUBLE)
                   / (2.0 * CAST(max(n) AS DOUBLE)
                      * max(CAST(tot AS DOUBLE))), 6) AS hoover
      FROM dev GROUP BY 1 ORDER BY 1"""))
  )
}
