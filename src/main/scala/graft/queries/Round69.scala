package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{Tables => T}

/** Round-7 fifteenth wave: the regression-diagnostics family — Deming
  * errors-in-variables regression, Durbin–Watson serial-correlation,
  * Ljung–Box portmanteau, and Grubbs' outlier test. House discipline
  * throughout: every data-sized reduction is an exact integer/decimal
  * moment; the fractional arithmetic is token-identical closed forms or
  * ordered cumsums over the bounded daily spine (≤ calendar days).
  */
object Round69 {

  val all: Seq[Q] = Seq(

    // Deming regression (errors in both variables, δ = 1) of extended
    // price on quantity per return flag. The five raw moments are exact
    // longs/decimals (y² rides DECIMAL(37,0) products — order-free);
    // the centered forms and the closed-form slope
    // (Syy−Sxx+√((Syy−Sxx)²+4Sxy²))/(2Sxy) are token-identical doubles
    // (the formula is degree-1 homogeneous, so the common n² scale of
    // the centered moments cancels). √ is IEEE-exact in both engines.
    Q("q362_deming", (s, d) => {
      import s.implicits._
      val rows = T.lineitem(s, d).select($"l_returnflag",
        $"l_quantity".cast("decimal(18,2)").cast("long").as("x"),
        ($"l_extendedprice".cast("decimal(18,2)") * 100).cast("long")
          .as("y"))
      val m = rows.groupBy($"l_returnflag").agg(
        count(lit(1)).as("n"),
        sum($"x").as("sx"),
        sum($"x" * $"x").as("sxx"),
        sum($"y").as("sy"),
        sum($"y".cast("decimal(18,0)") * $"y".cast("decimal(18,0)"))
          .as("syy"),
        sum($"x" * $"y").as("sxy"))
      val dn = $"n".cast("double")
      val dsx = $"sx".cast("double")
      val dsy = $"sy".cast("double")
      val sxxC = dn * $"sxx".cast("double") - dsx * dsx
      val syyC = dn * $"syy".cast("double") - dsy * dsy
      val sxyC = dn * $"sxy".cast("double") - dsx * dsy
      val slope = (syyC - sxxC
        + sqrt((syyC - sxxC) * (syyC - sxxC) + lit(4.0) * sxyC * sxyC))
        ./(lit(2.0) * sxyC)
      // no final round: slope ~ 1e6, and round-to-9 needs |x|·1e9 ≲ 2^53
      // to be exact — DuckDB's float-based round() flips an ulp there.
      // The whole pipeline is token-identical IEEE arithmetic, so the
      // unrounded doubles are bit-identical across engines.
      m.select($"l_returnflag", $"n",
          (slope / 100.0).as("slope"),
          ((dsy - slope * dsx) / dn / 100.0).as("intercept"))
        .orderBy($"l_returnflag")
    }, Some("""
      WITH rows_ AS (SELECT l_returnflag,
              CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS x,
              CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                AS BIGINT) AS y
            FROM lineitem),
      m AS (SELECT l_returnflag, count(*) AS n,
              CAST(sum(x) AS BIGINT) AS sx,
              CAST(sum(x * x) AS BIGINT) AS sxx,
              CAST(sum(y) AS BIGINT) AS sy,
              sum(CAST(y AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0)))
                AS syy,
              CAST(sum(x * y) AS BIGINT) AS sxy
            FROM rows_ GROUP BY 1),
      c AS (SELECT l_returnflag, n,
              CAST(n AS DOUBLE) AS dn, CAST(sx AS DOUBLE) AS dsx,
              CAST(sy AS DOUBLE) AS dsy,
              CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS sxx_c,
              CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS syy_c,
              CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS sxy_c
            FROM m),
      sl AS (SELECT l_returnflag, n, dn, dsx, dsy,
               (syy_c - sxx_c
                + sqrt((syy_c - sxx_c) * (syy_c - sxx_c)
                       + 4.0 * sxy_c * sxy_c)) / (2.0 * sxy_c) AS slope
             FROM c)
      SELECT l_returnflag, n, slope / 100.0 AS slope,
             (dsy - slope * dsx) / dn / 100.0 AS intercept
      FROM sl ORDER BY l_returnflag""")),

    // Durbin–Watson serial-correlation statistic of the daily-revenue
    // trend residuals per event type: OLS against the 0-based day index
    // from five exact long moments, residuals in doubles, and both
    // quadratic sums walked through an ordered cumsum over the ≤31-day
    // spine so the two engines add in the same order. DW ∈ [0,4].
    Q("q363_durbin_watson", (s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg((sum($"value".cast("decimal(18,2)")) * 100).cast("long")
          .as("y"))
        .withColumn("x", row_number()
          .over(Window.partitionBy($"event_type").orderBy($"day"))
          .cast("long") - 1)
      val m = daily.groupBy($"event_type").agg(
        count(lit(1)).as("n"), sum($"x").as("sx"),
        sum($"x" * $"x").as("sxx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"))
      val fit = m.select($"event_type", $"n",
        (($"n" * $"sxy" - $"sx" * $"sy").cast("double")
          / ($"n" * $"sxx" - $"sx" * $"sx").cast("double")).as("b"),
        $"sx".cast("double").as("dsx"), $"sy".cast("double").as("dsy"),
        $"n".cast("double").as("dn"))
        .withColumn("a", ($"dsy" - $"b" * $"dsx") / $"dn")
      val wd = Window.partitionBy($"event_type").orderBy($"day")
      val wCum = wd.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val res = daily.join(fit, "event_type")
        .withColumn("e",
          $"y".cast("double") - $"a" - $"b" * $"x".cast("double"))
        .withColumn("de", $"e" - lag($"e", 1).over(wd))
        .withColumn("cnum", sum($"de" * $"de").over(wCum))
        .withColumn("cden", sum($"e" * $"e").over(wCum))
      res.groupBy($"event_type").agg(
          max($"n").as("n_days"), max($"b").as("__b"),
          max_by($"cnum", $"day").as("__num"),
          max_by($"cden", $"day").as("__den"))
        .select($"event_type", $"n_days",
          round($"__b" / 100.0, 9).as("slope"),
          round($"__num" / $"__den", 9).as("dw"))
        .orderBy($"event_type")
    }, Some("""
      WITH daily0 AS (SELECT event_type, CAST(ts AS DATE) AS day,
              CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                AS y
            FROM events GROUP BY 1, 2),
      daily AS (SELECT event_type, day, y,
              CAST(row_number() OVER (PARTITION BY event_type
                ORDER BY day) AS BIGINT) - 1 AS x
            FROM daily0),
      m AS (SELECT event_type, count(*) AS n,
              CAST(sum(x) AS BIGINT) AS sx,
              CAST(sum(x * x) AS BIGINT) AS sxx,
              CAST(sum(y) AS BIGINT) AS sy,
              CAST(sum(x * y) AS BIGINT) AS sxy
            FROM daily GROUP BY 1),
      fit AS (SELECT event_type, n,
                CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE) AS b,
                CAST(sx AS DOUBLE) AS dsx, CAST(sy AS DOUBLE) AS dsy,
                CAST(n AS DOUBLE) AS dn
              FROM m),
      fit2 AS (SELECT *, (dsy - b * dsx) / dn AS a FROM fit),
      res AS (SELECT d.event_type, d.day, f.n, f.b,
                CAST(d.y AS DOUBLE) - f.a - f.b * CAST(d.x AS DOUBLE)
                  AS e
              FROM daily d JOIN fit2 f ON d.event_type = f.event_type),
      res2 AS (SELECT *, e - lag(e, 1) OVER wd AS de
               FROM res
               WINDOW wd AS (PARTITION BY event_type ORDER BY day)),
      cum AS (SELECT event_type, day, n, b,
                sum(de * de) OVER wc AS cnum,
                sum(e * e) OVER wc AS cden
              FROM res2
              WINDOW wc AS (PARTITION BY event_type ORDER BY day
                ROWS UNBOUNDED PRECEDING))
      SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
             round(max(b) / 100.0, 9) AS slope,
             round(max_by(cnum, day) / max_by(cden, day), 9) AS dw
      FROM cum GROUP BY 1 ORDER BY 1""")),

    // Ljung–Box portmanteau test (lags 1..7) on the demeaned daily
    // revenue per event type. The demeaned series n·y − Σy is an exact
    // long, every lag product an exact DECIMAL(37,0) whose data-sized
    // sum is order-FREE, and Q = n(n+2)·Σ r_k²/(n−k) adds its seven
    // terms in explicit textual order — no order-dependent float sum
    // anywhere.
    Q("q364_ljung_box", (s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg((sum($"value".cast("decimal(18,2)")) * 100).cast("long")
          .as("y"))
      val wn = Window.partitionBy($"event_type")
      val wd = Window.partitionBy($"event_type").orderBy($"day")
      val dem = daily
        .withColumn("n", count(lit(1)).over(wn))
        .withColumn("sy", sum($"y").over(wn))
        .withColumn("ee", ($"n" * $"y" - $"sy").cast("decimal(18,0)"))
      val lagged = (1 to 7).foldLeft(dem) { (df, k) =>
        df.withColumn(s"l$k", lag($"ee", k).over(wd))
      }
      val aggCols = sum($"ee" * $"ee").as("den") +:
        (1 to 7).map(k => sum($"ee" * col(s"l$k")).as(s"p$k"))
      val agg = lagged.groupBy($"event_type")
        .agg(max($"n").as("n_days"), aggCols: _*)
      val dn = $"n_days".cast("double")
      def r(k: Int) = col(s"p$k").cast("double") / $"den".cast("double")
      val qlb = (1 to 7).map(k => r(k) * r(k) / (dn - k.toDouble))
        .reduceLeft(_ + _) * dn * (dn + 2.0)
      agg.select($"event_type", $"n_days",
          round(r(1), 9).as("r1"), round(qlb, 9).as("q_lb"))
        .orderBy($"event_type")
    }, Some("""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
              CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                AS y
            FROM events GROUP BY 1, 2),
      dem AS (SELECT event_type, day,
                CAST(count(*) OVER wn AS BIGINT) AS n,
                CAST(n * y - sum(y) OVER wn AS DECIMAL(18,0)) AS ee
              FROM daily
              WINDOW wn AS (PARTITION BY event_type)),
      lagged AS (SELECT event_type, day, n, ee,
                   lag(ee, 1) OVER wd AS l1, lag(ee, 2) OVER wd AS l2,
                   lag(ee, 3) OVER wd AS l3, lag(ee, 4) OVER wd AS l4,
                   lag(ee, 5) OVER wd AS l5, lag(ee, 6) OVER wd AS l6,
                   lag(ee, 7) OVER wd AS l7
                 FROM dem
                 WINDOW wd AS (PARTITION BY event_type ORDER BY day)),
      agg AS (SELECT event_type, max(n) AS n_days,
                sum(ee * ee) AS den,
                sum(ee * l1) AS p1, sum(ee * l2) AS p2,
                sum(ee * l3) AS p3, sum(ee * l4) AS p4,
                sum(ee * l5) AS p5, sum(ee * l6) AS p6,
                sum(ee * l7) AS p7
              FROM lagged GROUP BY 1),
      rs AS (SELECT event_type, n_days, CAST(n_days AS DOUBLE) AS dn,
               CAST(p1 AS DOUBLE) / CAST(den AS DOUBLE) AS r1,
               CAST(p2 AS DOUBLE) / CAST(den AS DOUBLE) AS r2,
               CAST(p3 AS DOUBLE) / CAST(den AS DOUBLE) AS r3,
               CAST(p4 AS DOUBLE) / CAST(den AS DOUBLE) AS r4,
               CAST(p5 AS DOUBLE) / CAST(den AS DOUBLE) AS r5,
               CAST(p6 AS DOUBLE) / CAST(den AS DOUBLE) AS r6,
               CAST(p7 AS DOUBLE) / CAST(den AS DOUBLE) AS r7
             FROM agg)
      SELECT event_type, n_days, round(r1, 9) AS r1,
             round((r1 * r1 / (dn - 1.0) + r2 * r2 / (dn - 2.0)
                    + r3 * r3 / (dn - 3.0) + r4 * r4 / (dn - 4.0)
                    + r5 * r5 / (dn - 5.0) + r6 * r6 / (dn - 6.0)
                    + r7 * r7 / (dn - 7.0)) * dn * (dn + 2.0), 9)
               AS q_lb
      FROM rs ORDER BY event_type""")),

    // Grubbs' outlier test per market segment: the candidate is ranked
    // by the exact integer deviation |n·x − Σx| (the monotone image of
    // |x − x̄| — no float in the ordering) with a deterministic custkey
    // tiebreak; G = |x* − x̄|/s is one token-identical double formula
    // from exact moments. Law: G ≤ (n−1)/√n.
    Q("q365_grubbs", (s, d) => {
      import s.implicits._
      val rows = T.customer(s, d).select($"c_mktsegment", $"c_custkey",
        ($"c_acctbal".cast("decimal(18,2)") * 100).cast("long").as("x"))
      val m = rows.groupBy($"c_mktsegment").agg(
        count(lit(1)).as("n"), sum($"x").as("sx"),
        sum($"x" * $"x").as("sxx"))
      val wr = Window.partitionBy($"c_mktsegment")
        .orderBy(col("dev").desc, $"c_custkey")
      val top = rows.join(m, "c_mktsegment")
        .withColumn("dev", abs($"n" * $"x" - $"sx"))
        .withColumn("__rk", row_number().over(wr))
        .filter($"__rk" === 1)
      val dn = $"n".cast("double")
      val dsx = $"sx".cast("double")
      val g = $"dev".cast("double") / (dn
        * sqrt((dn * $"sxx".cast("double") - dsx * dsx)
          / (dn * (dn - 1.0))))
      top.select($"c_mktsegment", $"n", $"c_custkey",
          round($"x".cast("double") / 100.0, 2).as("balance"),
          round(g, 9).as("g"))
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH rows_ AS (SELECT c_mktsegment, c_custkey,
              CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                AS x
            FROM customer),
      m AS (SELECT c_mktsegment, count(*) AS n,
              CAST(sum(x) AS BIGINT) AS sx,
              CAST(sum(x * x) AS BIGINT) AS sxx
            FROM rows_ GROUP BY 1),
      dev AS (SELECT r.c_mktsegment, r.c_custkey, r.x, m.n, m.sx, m.sxx,
                abs(m.n * r.x - m.sx) AS dev
              FROM rows_ r JOIN m ON r.c_mktsegment = m.c_mktsegment),
      rk AS (SELECT *, row_number() OVER (PARTITION BY c_mktsegment
               ORDER BY dev DESC, c_custkey) AS rn
             FROM dev)
      SELECT c_mktsegment, n, c_custkey,
             round(CAST(x AS DOUBLE) / 100.0, 2) AS balance,
             round(CAST(dev AS DOUBLE)
                   / (CAST(n AS DOUBLE)
                      * sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                             / (CAST(n AS DOUBLE)
                                * (CAST(n AS DOUBLE) - 1.0)))), 9) AS g
      FROM rk WHERE rn = 1 ORDER BY c_mktsegment"""))
  )
}
