package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TimeSeries
import graft.sources.{Tables => T}

/** Round-7 eighth wave: rank concordance (Kendall tau-b), mutual
  * information, stratified-propensity treatment effect, and restricted
  * mean survival time. Everything reduces to exact integer/decimal
  * moments; doubles appear only in final formulas written
  * token-identically in both engines, and the one log-bearing query
  * (MI) adds its three fixed-category terms in explicit column order —
  * never through an order-free double aggregate.
  */
object Round62 {

  val all: Seq[Q] = Seq(

    // Kendall tau-b per region: concordance between nation revenue and
    // nation order count over the ≤C(5,2) nation pairs of each region.
    // C−D is a sum of exact sign products; ties enter through the
    // tau-b denominator from exact pair counts.
    Q("q339_kendall_tau", (s, d) => {
      import s.implicits._
      val base = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(T.nation(s, d), $"c_nationkey" === $"n_nationkey")
        .join(T.region(s, d), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(sum($"o_totalprice".cast("decimal(18,2)"))
            .cast("decimal(18,2)").as("rev"),
          count(lit(1)).as("cnt"))
      val p = base.as("l").join(base.as("r"),
          col("l.r_name") === col("r.r_name")
            && col("l.n_name") < col("r.n_name"))
        .select(col("l.r_name").as("r_name"),
          signum(col("l.rev") - col("r.rev")).cast("long").as("sx"),
          signum((col("l.cnt") - col("r.cnt")).cast("double"))
            .cast("long").as("sy"))
      p.groupBy($"r_name").agg(
          count(lit(1)).as("n_pairs"),
          sum($"sx" * $"sy").as("__cd"),
          sum(when($"sx" === 0, 1L).otherwise(0L)).as("__tx"),
          sum(when($"sy" === 0, 1L).otherwise(0L)).as("__ty"))
        .filter(($"n_pairs" - $"__tx") > 0 && ($"n_pairs" - $"__ty") > 0)
        .select($"r_name", $"n_pairs",
          round($"__cd".cast("double")
            / sqrt((($"n_pairs" - $"__tx") * ($"n_pairs" - $"__ty"))
              .cast("double")), 6).as("tau_b"))
        .orderBy($"r_name")
    }, Some("""
      WITH base AS (SELECT r_name, n_name,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS rev,
              count(*) AS cnt
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1, 2),
      p AS (SELECT l.r_name,
              CAST(sign(l.rev - r.rev) AS BIGINT) AS sx,
              CAST(sign(CAST(l.cnt - r.cnt AS DOUBLE)) AS BIGINT) AS sy
            FROM base l JOIN base r ON l.r_name = r.r_name
              AND l.n_name < r.n_name),
      a AS (SELECT r_name, count(*) AS n_pairs,
              CAST(sum(sx * sy) AS BIGINT) AS cd,
              CAST(sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS tx,
              CAST(sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS ty
            FROM p GROUP BY 1)
      SELECT r_name, n_pairs,
             round(CAST(cd AS DOUBLE)
                   / sqrt(CAST((n_pairs - tx) * (n_pairs - ty)
                     AS DOUBLE)), 6) AS tau_b
      FROM a
      WHERE (n_pairs - tx) > 0 AND (n_pairs - ty) > 0
      ORDER BY r_name""")),

    // mutual information between part brand and return flag, reported
    // as per-brand contributions: the flag alphabet is FIXED {A,N,R},
    // so the three log terms add in explicit column order — the
    // summation never passes through an order-free double aggregate.
    // Marginals ride in on one broadcast scalar row.
    Q("q340_mutual_info", (s, d) => {
      import s.implicits._
      val rows = T.lineitem(s, d)
        .join(T.part(s, d), $"l_partkey" === $"p_partkey")
        .select($"p_brand", $"l_returnflag")
      val cell = rows.groupBy($"p_brand").agg(
        count(lit(1)).as("n_b"),
        sum(when($"l_returnflag" === "A", 1L).otherwise(0L)).as("ca"),
        sum(when($"l_returnflag" === "N", 1L).otherwise(0L)).as("cn"),
        sum(when($"l_returnflag" === "R", 1L).otherwise(0L)).as("cr"))
      val tot = rows.agg(count(lit(1)).as("__n"),
        sum(when($"l_returnflag" === "A", 1L).otherwise(0L)).as("__fa"),
        sum(when($"l_returnflag" === "N", 1L).otherwise(0L)).as("__fn"),
        sum(when($"l_returnflag" === "R", 1L).otherwise(0L)).as("__fr"))
      def term(c: org.apache.spark.sql.Column,
          f: org.apache.spark.sql.Column) =
        when(c > 0, c.cast("double")
          * log(($"__n" * c).cast("double")
            / ($"n_b" * f).cast("double"))).otherwise(lit(0.0))
      cell.crossJoin(broadcast(tot))
        .select($"p_brand", $"n_b",
          round((term($"ca", $"__fa") + term($"cn", $"__fn")
            + term($"cr", $"__fr")) / $"__n".cast("double"), 9)
            .as("mi_contrib"))
        .orderBy($"p_brand")
    }, Some("""
      WITH rows_ AS (SELECT p_brand, l_returnflag
                     FROM lineitem JOIN part ON l_partkey = p_partkey),
      cell AS (SELECT p_brand, count(*) AS n_b,
                 CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
                   AS BIGINT) AS ca,
                 CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
                   AS BIGINT) AS cn,
                 CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                   AS BIGINT) AS cr
               FROM rows_ GROUP BY 1),
      tot AS (SELECT count(*) AS n,
                CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
                  AS BIGINT) AS fa,
                CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
                  AS BIGINT) AS fn,
                CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS fr
              FROM rows_)
      SELECT p_brand, n_b,
             round(((CASE WHEN ca > 0 THEN CAST(ca AS DOUBLE)
                       * ln(CAST(n * ca AS DOUBLE)
                            / CAST(n_b * fa AS DOUBLE)) ELSE 0.0 END)
                    + (CASE WHEN cn > 0 THEN CAST(cn AS DOUBLE)
                       * ln(CAST(n * cn AS DOUBLE)
                            / CAST(n_b * fn AS DOUBLE)) ELSE 0.0 END)
                    + (CASE WHEN cr > 0 THEN CAST(cr AS DOUBLE)
                       * ln(CAST(n * cr AS DOUBLE)
                            / CAST(n_b * fr AS DOUBLE)) ELSE 0.0 END))
                   / CAST(n AS DOUBLE), 9) AS mi_contrib
      FROM cell CROSS JOIN tot
      ORDER BY p_brand""")),

    // stratified-propensity treatment effect: treatment = urgent/high
    // order priority, strata = market segment, outcome = order total.
    // Within a stratum the propensity is the exact treated share and
    // the stratum ATE is a difference of two decimal-sum means — one
    // double division each, no cross-stratum double accumulation.
    Q("q341_stratified_ate", (s, d) => {
      import s.implicits._
      val rows = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment",
          ($"o_orderpriority".isin("1-URGENT", "2-HIGH")).cast("long")
            .as("t"),
          $"o_totalprice".cast("decimal(18,2)").as("y"))
      rows.groupBy($"c_mktsegment").agg(
          count(lit(1)).as("n"),
          sum($"t").as("__nt"),
          sum(when($"t" === 1, $"y")).cast("double").as("__yt"),
          sum(when($"t" === 0, $"y")).cast("double").as("__yc"))
        .filter($"__nt" > 0 && ($"n" - $"__nt") > 0)
        .select($"c_mktsegment", $"n",
          round($"__nt".cast("double") / $"n".cast("double"), 6)
            .as("propensity"),
          round($"__yt" / $"__nt".cast("double")
            - $"__yc" / ($"n" - $"__nt").cast("double"), 2).as("ate"))
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH rows_ AS (SELECT c_mktsegment,
              CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 1 ELSE 0 END AS t,
              CAST(o_totalprice AS DECIMAL(18,2)) AS y
            FROM orders JOIN customer ON o_custkey = c_custkey),
      a AS (SELECT c_mktsegment, count(*) AS n,
              CAST(sum(t) AS BIGINT) AS nt,
              CAST(sum(CASE WHEN t = 1 THEN y END) AS DOUBLE) AS yt,
              CAST(sum(CASE WHEN t = 0 THEN y END) AS DOUBLE) AS yc
            FROM rows_ GROUP BY 1)
      SELECT c_mktsegment, n,
             round(CAST(nt AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS propensity,
             round(yt / CAST(nt AS DOUBLE)
                   - yc / CAST(n - nt AS DOUBLE), 2) AS ate
      FROM a WHERE nt > 0 AND (n - nt) > 0
      ORDER BY c_mktsegment""")),

    // restricted mean survival time at τ=60 days over q235's
    // repurchase-gap survival curve: RMST = ∫₀^τ S(t)dt. The rounded
    // 6-place survival becomes an exact ×1e6 integer, each interval
    // contribution is integer × integer days, and the whole area is an
    // exact micro-integer sum — one final /1e6 division.
    Q("q342_rmst", (s, d) => {
      import s.implicits._
      val tau = 60L
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
      val km = TimeSeries.kaplanMeier(obs, "dur", "observed")
        .select($"t", round($"survival" * 1e6, 0).cast("long").as("s6"))
      val wt = Window.orderBy($"t")
      val seg = km
        .withColumn("__tn", lead($"t", 1).over(wt))
        .select($"t", $"s6",
          (least(coalesce($"__tn", lit(tau)), lit(tau))
            - least($"t", lit(tau))).as("__dt"))
      seg.agg(
          count(lit(1)).as("n_event_times"),
          min(least($"t", lit(tau))).as("__t1"),
          sum($"s6" * $"__dt").as("__area"))
        .select(lit(tau).as("tau"), $"n_event_times",
          round(($"__t1" * lit(1000000L) + $"__area").cast("double")
            / 1e6, 6).as("rmst_days"))
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
      pt AS (SELECT t, sum(ev) AS n_events,
                    sum(1 - ev) AS n_cens
             FROM o GROUP BY 1),
      nn AS (SELECT count(*) AS n FROM o),
      r AS (SELECT t, n_events, n_cens,
                   n - coalesce(sum(n_events + n_cens)
                     OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS n_risk
            FROM pt, nn),
      f AS (SELECT t, n_events,
                   1.0 - CAST(n_events AS DOUBLE) / n_risk AS fac
            FROM r),
      sv AS (SELECT t, n_events,
                    CASE WHEN max(CASE WHEN fac = 0.0 THEN 1 ELSE 0 END)
                           OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND CURRENT ROW) = 1
                         THEN 0.0
                         ELSE round(exp(sum(CASE WHEN fac > 0
                           THEN ln(fac) ELSE 0.0 END)
                           OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW)), 6) END AS survival
             FROM f),
      km AS (SELECT t, CAST(round(survival * 1e6, 0) AS BIGINT) AS s6
             FROM sv WHERE n_events > 0),
      seg AS (SELECT t, s6,
                least(coalesce(lead(t) OVER (ORDER BY t), 60), 60)
                  - least(t, 60) AS dt
              FROM km)
      SELECT CAST(60 AS BIGINT) AS tau,
             count(*) AS n_event_times,
             round(CAST(min(least(t, 60)) * 1000000
                        + sum(s6 * dt) AS DOUBLE) / 1e6, 6) AS rmst_days
      FROM seg"""))
  )
}
