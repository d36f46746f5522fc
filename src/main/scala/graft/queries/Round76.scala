package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{Tables => T}

/** Round-8 sixth wave: regression diagnostics and tabular feature prep —
  * Bartlett's variance-homogeneity test, Jarque–Bera normality,
  * Goldfeld–Quandt heteroscedasticity, Cook's-distance influence,
  * seasonal decomposition on the calendar spine, the hashing trick with
  * collision audit, and leakage-free out-of-fold target encoding.
  * House rules: exact long/DECIMAL(38,0) moments for every data-sized
  * reduction, group-bounded ordered cumsums for fractional k-term sums,
  * one rounding, hash-safe finals.
  */
object Round76 {

  val all: Seq[Q] = Seq(

    // Bartlett's test for equal variances of order totals across the 5
    // priorities: per-group exact moments (cents, DECIMAL(38,0)
    // squares) give the sample variances; the chi-square statistic's
    // <=5 fractional/log terms accumulate through a priority-ordered
    // cumsum (the q373 discipline) so both engines add in one order.
    Q("q392_bartlett", (s, d) => {
      import s.implicits._
      val rows = T.orders(s, d).select($"o_orderpriority",
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("y"))
      val g = rows.groupBy($"o_orderpriority").agg(
        count(lit(1)).as("nj"), sum($"y").as("sy"),
        sum(($"y" * $"y").cast("decimal(38,0)")).as("syy"))
      def dd(c: String) = col(c).cast("double")
      val s2j = (dd("nj") * dd("syy") - dd("sy") * dd("sy")) /
        (dd("nj") * (dd("nj") - 1.0))
      val wCum = Window.orderBy($"o_orderpriority")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val terms = g
        .withColumn("t_ln", (dd("nj") - 1.0) * log(s2j))
        .withColumn("t_sp", (dd("nj") - 1.0) * s2j)
        .withColumn("t_inv", lit(1.0) / (dd("nj") - 1.0))
        .withColumn("c_ln", sum($"t_ln").over(wCum))
        .withColumn("c_sp", sum($"t_sp").over(wCum))
        .withColumn("c_inv", sum($"t_inv").over(wCum))
      val fin = terms.groupBy().agg(
        count(lit(1)).as("k"), sum($"nj").as("n"),
        max_by($"c_ln", $"o_orderpriority").as("sln"),
        max_by($"c_sp", $"o_orderpriority").as("ssp"),
        max_by($"c_inv", $"o_orderpriority").as("sinv"))
      val nD = dd("n")
      val kD = dd("k")
      val sp2 = $"ssp" / (nD - kD)
      fin.select($"k", $"n",
        round(((nD - kD) * log(sp2) - $"sln")
          / (lit(1.0) + ($"sinv" - lit(1.0) / (nD - kD))
            / (lit(3.0) * (kD - 1.0))), 6).as("bartlett_t"))
    }, Some("""
      WITH rows_ AS (SELECT o_orderpriority,
              CAST(round(o_totalprice * 100) AS BIGINT) AS y
            FROM orders),
      g AS (SELECT o_orderpriority, count(*) AS nj, sum(y) AS sy,
              sum(CAST(y * y AS HUGEINT)) AS syy
            FROM rows_ GROUP BY 1),
      t AS (SELECT o_orderpriority, nj,
              (CAST(nj AS DOUBLE) - 1.0)
                * ln((CAST(nj AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(nj AS DOUBLE) * (CAST(nj AS DOUBLE) - 1.0)))
                AS t_ln,
              (CAST(nj AS DOUBLE) - 1.0)
                * ((CAST(nj AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(nj AS DOUBLE) * (CAST(nj AS DOUBLE) - 1.0)))
                AS t_sp,
              1.0 / (CAST(nj AS DOUBLE) - 1.0) AS t_inv
            FROM g),
      c AS (SELECT o_orderpriority, nj,
              sum(t_ln) OVER w AS c_ln, sum(t_sp) OVER w AS c_sp,
              sum(t_inv) OVER w AS c_inv
            FROM t
            WINDOW w AS (ORDER BY o_orderpriority
              ROWS UNBOUNDED PRECEDING)),
      f AS (SELECT count(*) AS k, sum(nj) AS n,
              max_by(c_ln, o_orderpriority) AS sln,
              max_by(c_sp, o_orderpriority) AS ssp,
              max_by(c_inv, o_orderpriority) AS sinv
            FROM c)
      SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
             round(((CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
                 * ln(ssp / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) - sln)
               / (1.0 + (sinv - 1.0 / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
                 / (3.0 * (CAST(k AS DOUBLE) - 1.0))), 6) AS bartlett_t
      FROM f""")),

    // Jarque-Bera normality test of extendedprice per return flag:
    // skewness and excess kurtosis from RAW exact moments (cents;
    // Sigma y^3 / Sigma y^4 as DECIMAL(38,0) via long y^2 partials), the
    // central-moment expansion and JB = n/6 (g1^2 + g2^2/4) in one
    // double formula. Explicit products, no pow.
    Q("q393_jarque_bera", (s, d) => {
      import s.implicits._
      val rows = T.lineitem(s, d).select($"l_returnflag",
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("y"))
      val g = rows
        .withColumn("y2", $"y" * $"y")
        .groupBy($"l_returnflag").agg(
          count(lit(1)).as("n"), sum($"y").as("s1"),
          sum($"y2".cast("decimal(38,0)")).as("s2"),
          sum($"y2".cast("decimal(38,0)") * $"y").as("s3"),
          sum($"y2".cast("decimal(38,0)") * $"y2").as("s4"))
      def dd(c: String) = col(c).cast("double")
      val nD = dd("n")
      val mu = dd("s1") / nD
      val m2 = dd("s2") / nD - mu * mu
      val m3 = dd("s3") / nD - lit(3.0) * mu * (dd("s2") / nD) + lit(2.0) * mu * mu * mu
      val m4 = dd("s4") / nD - lit(4.0) * mu * (dd("s3") / nD) +
        lit(6.0) * mu * mu * (dd("s2") / nD) - lit(3.0) * mu * mu * mu * mu
      val g1 = m3 / (sqrt(m2) * m2)
      val g2 = m4 / (m2 * m2) - 3.0
      g.select($"l_returnflag", $"n",
          round(g1, 6).as("skewness"),
          round(g2, 6).as("ex_kurtosis"),
          round(nD / 6.0 * (g1 * g1 + g2 * g2 / 4.0), 6).as("jb"))
        .orderBy($"l_returnflag")
    }, Some("""
      WITH rows_ AS (SELECT l_returnflag,
              CAST(round(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem),
      g AS (SELECT l_returnflag, count(*) AS n, sum(y) AS s1,
              sum(CAST(y * y AS HUGEINT)) AS s2,
              sum(CAST(y * y AS HUGEINT) * y) AS s3,
              sum(CAST(y * y AS HUGEINT) * (y * y)) AS s4
            FROM rows_ GROUP BY 1),
      m AS (SELECT l_returnflag, n,
              CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
              CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
              CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
              CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
            FROM g),
      c AS (SELECT l_returnflag, n,
              r2 - mu * mu AS m2,
              r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
              r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
                - 3.0 * mu * mu * mu * mu AS m4
            FROM m)
      SELECT l_returnflag, CAST(n AS BIGINT) AS n,
             round(m3 / (sqrt(m2) * m2), 6) AS skewness,
             round(m4 / (m2 * m2) - 3.0, 6) AS ex_kurtosis,
             round(CAST(n AS DOUBLE) / 6.0
               * ((m3 / (sqrt(m2) * m2)) * (m3 / (sqrt(m2) * m2))
                 + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0) / 4.0), 6)
               AS jb
      FROM c ORDER BY l_returnflag""")),

    // Goldfeld-Quandt heteroscedasticity test: does residual variance
    // of price ~ quantity grow with quantity? Split at quantity <= 25 /
    // > 25, fit OLS per half from exact moments, expand each half's
    // residual SS algebraically (the q380 identity), F = s2_hi/s2_lo.
    // One scan, two group rows, zero per-row float work.
    Q("q394_goldfeld_quandt", (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d).select(
        when($"l_quantity" <= 25, "lo").otherwise("hi").as("half"),
        expr("CAST(l_quantity AS BIGINT)").as("x"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("y"))
      val g = li.groupBy($"half").agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum(($"x" * $"x").cast("decimal(38,0)")).as("sxx"),
        sum(($"x" * $"y").cast("decimal(38,0)")).as("sxy"),
        sum(($"y" * $"y").cast("decimal(38,0)")).as("syy"))
      def dd(c: String) = col(c).cast("double")
      val nD = dd("n")
      val b = (nD * dd("sxy") - dd("sx") * dd("sy")) /
        (nD * dd("sxx") - dd("sx") * dd("sx"))
      val a = (dd("sy") - b * dd("sx")) / nD
      val sse = dd("syy") - lit(2.0) * a * dd("sy") - lit(2.0) * b * dd("sxy") +
        lit(2.0) * a * b * dd("sx") + a * a * nD + b * b * dd("sxx")
      val halves = g.select($"half", $"n", (sse / (nD - 2.0)).as("s2"))
      halves.groupBy().agg(
          min_by($"n", $"half").as("n_hi"), max_by($"n", $"half").as("n_lo"),
          min_by($"s2", $"half").as("s2_hi"), max_by($"s2", $"half").as("s2_lo"))
        .select($"n_lo", $"n_hi",
          round($"s2_lo" / 10000.0, 6).as("s2_lo"),
          round($"s2_hi" / 10000.0, 6).as("s2_hi"),
          round($"s2_hi" / $"s2_lo", 6).as("gq_f"))
    }, Some("""
      WITH li AS (SELECT CASE WHEN l_quantity <= 25 THEN 'lo'
                              ELSE 'hi' END AS half,
              CAST(l_quantity AS BIGINT) AS x,
              CAST(round(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem),
      g AS (SELECT half, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
              sum(CAST(x * x AS HUGEINT)) AS sxx,
              sum(CAST(x * y AS HUGEINT)) AS sxy,
              sum(CAST(y * y AS HUGEINT)) AS syy
            FROM li GROUP BY 1),
      fit AS (SELECT half, n,
                (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
                sx, sy, sxx, sxy, syy
              FROM g),
      ab AS (SELECT half, n, b,
               (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) AS a,
               sx, sy, sxx, sxy, syy
             FROM fit),
      s2 AS (SELECT half, n,
               (CAST(syy AS DOUBLE) - 2.0 * a * CAST(sy AS DOUBLE)
                 - 2.0 * b * CAST(sxy AS DOUBLE)
                 + 2.0 * a * b * CAST(sx AS DOUBLE)
                 + a * a * CAST(n AS DOUBLE)
                 + b * b * CAST(sxx AS DOUBLE))
               / (CAST(n AS DOUBLE) - 2.0) AS s2
             FROM ab)
      SELECT CAST(max_by(n, half) AS BIGINT) AS n_lo,
             CAST(min_by(n, half) AS BIGINT) AS n_hi,
             round(max_by(s2, half) / 10000.0, 6) AS s2_lo,
             round(min_by(s2, half) / 10000.0, 6) AS s2_hi,
             round(min_by(s2, half) / max_by(s2, half), 6) AS gq_f
      FROM s2""")),

    // Cook's distance influence audit for price ~ quantity: leverage
    // h_i and residual e_i are per-row doubles from the broadcast
    // 1-row moment table (map-side — no shuffle beyond the one
    // aggregate), D_i = e^2 h / (2 s^2 (1-h)^2); top 10 by rounded D
    // with the (orderkey, linenumber) tiebreak.
    Q("q395_cooks_distance", (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d).select($"l_orderkey", $"l_linenumber",
        expr("CAST(l_quantity AS BIGINT)").as("x"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("y"))
      val m = li.agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum(($"x" * $"x").cast("decimal(38,0)")).as("sxx"),
        sum(($"x" * $"y").cast("decimal(38,0)")).as("sxy"),
        sum(($"y" * $"y").cast("decimal(38,0)")).as("syy"))
      def dd(c: String) = col(c).cast("double")
      val nD = dd("n")
      val b = (nD * dd("sxy") - dd("sx") * dd("sy")) /
        (nD * dd("sxx") - dd("sx") * dd("sx"))
      val a = (dd("sy") - b * dd("sx")) / nD
      val s2 = (dd("syy") - lit(2.0) * a * dd("sy") - lit(2.0) * b * dd("sxy") +
        lit(2.0) * a * b * dd("sx") + a * a * nD + b * b * dd("sxx")) / (nD - 2.0)
      val xbar = dd("sx") / nD
      val sxxC = dd("sxx") - nD * xbar * xbar
      val e = $"y".cast("double") - a - b * $"x".cast("double")
      val h = lit(1.0) / nD + ($"x".cast("double") - xbar) *
        ($"x".cast("double") - xbar) / sxxC
      val dcook = e * e * h / (lit(2.0) * s2 * (lit(1.0) - h) * (lit(1.0) - h))
      li.crossJoin(broadcast(m))
        .select($"l_orderkey", $"l_linenumber",
          round(e / 100.0, 6).as("residual"),
          round(h, 6).as("leverage"),
          round(dcook, 6).as("cooks_d"))
        .orderBy($"cooks_d".desc, $"l_orderkey", $"l_linenumber")
        .limit(10)
    }, Some("""
      WITH li AS (SELECT l_orderkey, l_linenumber,
              CAST(l_quantity AS BIGINT) AS x,
              CAST(round(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem),
      m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
              sum(CAST(x * x AS HUGEINT)) AS sxx,
              sum(CAST(x * y AS HUGEINT)) AS sxy,
              sum(CAST(y * y AS HUGEINT)) AS syy
            FROM li),
      fit AS (SELECT n, sx, sy, sxx, sxy, syy,
                (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b
              FROM m),
      ab AS (SELECT *,
               (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) AS a,
               CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
             FROM fit),
      pre AS (SELECT *,
                (CAST(syy AS DOUBLE) - 2.0 * a * CAST(sy AS DOUBLE)
                  - 2.0 * b * CAST(sxy AS DOUBLE)
                  + 2.0 * a * b * CAST(sx AS DOUBLE)
                  + a * a * CAST(n AS DOUBLE)
                  + b * b * CAST(sxx AS DOUBLE))
                / (CAST(n AS DOUBLE) - 2.0) AS s2,
                CAST(sxx AS DOUBLE) - CAST(n AS DOUBLE) * xbar * xbar
                  AS sxxc
              FROM ab),
      sc AS (SELECT l_orderkey, l_linenumber,
               CAST(y AS DOUBLE) - a - b * CAST(x AS DOUBLE) AS e,
               1.0 / CAST(n AS DOUBLE)
                 + (CAST(x AS DOUBLE) - xbar) * (CAST(x AS DOUBLE) - xbar)
                   / sxxc AS h,
               s2
             FROM li CROSS JOIN pre)
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             round(e / 100.0, 6) AS residual,
             round(h, 6) AS leverage,
             round(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)), 6)
               AS cooks_d
      FROM sc
      ORDER BY cooks_d DESC, l_orderkey, l_linenumber LIMIT 10""")),

    // Additive seasonal decomposition of daily revenue per event type:
    // trend = centered 7-day moving average, seasonal = mean detrended
    // value per (day % 7) slot, remainder = the rest. Everything after
    // the one per-(type, day) cents aggregate lives on the <=31-row
    // calendar spine; dow is day-of-month mod 7 so no engine
    // day-of-week convention is involved.
    Q("q396_seasonal_decompose", (s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .groupBy($"event_type", dayofmonth($"ts").as("day"))
        .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("rev"))
      val wMa = Window.partitionBy($"event_type").orderBy($"day")
        .rowsBetween(-3, 3)
      val tr = daily
        .withColumn("trend", avg($"rev".cast("double")).over(wMa))
        .withColumn("det", $"rev".cast("double") - $"trend")
        .withColumn("dow", $"day" % 7)
      val seas = tr.groupBy($"event_type", $"dow")
        .agg(avg($"det").as("seasonal"))
      tr.join(seas, Seq("event_type", "dow"))
        .select($"event_type", $"day",
          round($"rev".cast("double") / 100.0, 6).as("revenue"),
          round($"trend" / 100.0, 6).as("trend"),
          round($"seasonal" / 100.0, 6).as("seasonal"),
          round(($"det" - $"seasonal") / 100.0, 6).as("remainder"))
        .orderBy($"event_type", $"day")
    }, Some("""
      WITH daily AS (SELECT event_type, day(ts) AS day,
              sum(CAST(round(value * 100) AS BIGINT)) AS rev
            FROM events GROUP BY 1, 2),
      tr AS (SELECT event_type, day, rev,
               avg(CAST(rev AS DOUBLE)) OVER (PARTITION BY event_type
                 ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                 AS trend,
               day % 7 AS dow
             FROM daily),
      det AS (SELECT *, CAST(rev AS DOUBLE) - trend AS det FROM tr),
      seas AS (SELECT event_type, dow, avg(det) AS seasonal
               FROM det GROUP BY 1, 2)
      SELECT event_type, CAST(day AS BIGINT) AS day,
             round(CAST(rev AS DOUBLE) / 100.0, 6) AS revenue,
             round(trend / 100.0, 6) AS trend,
             round(seasonal / 100.0, 6) AS seasonal,
             round((det - seasonal) / 100.0, 6) AS remainder
      FROM det JOIN seas USING (event_type, dow)
      ORDER BY event_type, day""")),

    // The hashing trick (Weinberger et al. 2009) for the nation x
    // segment categorical cross, with the collision audit every
    // feature-hashed pipeline needs: the engine-replayable polynomial+
    // Knuth hash (the q377 function) maps each DISTINCT cross once
    // (vocab-sized), loads and collision counts are exact.
    Q("q397_feature_hashing", (s, d) => {
      import s.implicits._
      val crosses = T.customer(s, d)
        .select(concat($"c_nationkey".cast("string"), lit("|"),
          $"c_mktsegment").as("feat"))
      val hashed = crosses.groupBy($"feat").agg(count(lit(1)).as("n"))
        .withColumn("bucket", expr(
          "aggregate(transform(sequence(1, length(feat)), " +
            "i -> CAST(ascii(substr(feat, i, 1)) AS BIGINT)), 0L, " +
            "(a, x) -> (a * 31 + x) % 2147483648L) " +
            "* 1000003 % 2147483648 % 64"))
      hashed.groupBy($"bucket").agg(
          sum($"n").as("n_rows"), count(lit(1)).as("n_features"))
        .withColumn("collided", $"n_features" > 1)
        .orderBy($"bucket")
    }, Some("""
      WITH crosses AS (SELECT CAST(c_nationkey AS VARCHAR) || '|'
              || c_mktsegment AS feat, count(*) AS n
            FROM customer GROUP BY 1),
      hashed AS (SELECT feat, n,
               list_reduce(list_prepend(0::BIGINT,
                   list_transform(generate_series(1, length(feat)),
                     i -> ascii(substr(feat, i, 1))::BIGINT)),
                 (a, x) -> (a * 31 + x) % 2147483648)
                 * 1000003 % 2147483648 % 64 AS bucket
             FROM crosses)
      SELECT bucket, CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_features,
             count(*) > 1 AS collided
      FROM hashed GROUP BY bucket ORDER BY bucket""")),

    // Leakage-free out-of-fold target encoding: the segment-mean
    // account balance each row's model input may legally see — the
    // mean over the OTHER four hash folds, by subtracting the row's
    // own fold from the segment totals. One scan to (segment, fold)
    // exact moments; the encode table is 25 rows.
    Q("q398_target_encoding", (s, d) => {
      import s.implicits._
      val rows = T.customer(s, d).select($"c_mktsegment",
        expr("CAST(c_custkey % 2147483648 * 2654435761 % 2147483648 % 5 AS BIGINT)")
          .as("fold"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal"))
      val perFold = rows.groupBy($"c_mktsegment", $"fold")
        .agg(count(lit(1)).as("n"), sum($"bal").as("sb"))
      val perSeg = perFold.groupBy($"c_mktsegment")
        .agg(sum($"n").as("tn"), sum($"sb").as("tsb"))
      perFold.join(perSeg, "c_mktsegment")
        .select($"c_mktsegment", $"fold", $"n".as("n_rows"),
          round(($"tsb" - $"sb").cast("double")
            / ($"tn" - $"n").cast("double") / 100.0, 6).as("oof_mean"))
        .orderBy($"c_mktsegment", $"fold")
    }, Some("""
      WITH rows_ AS (SELECT c_mktsegment,
              CAST(c_custkey % 2147483648 * 2654435761 % 2147483648 % 5
                AS BIGINT) AS fold,
              CAST(round(c_acctbal * 100) AS BIGINT) AS bal
            FROM customer),
      pf AS (SELECT c_mktsegment, fold, count(*) AS n, sum(bal) AS sb
             FROM rows_ GROUP BY 1, 2),
      ps AS (SELECT c_mktsegment, sum(n) AS tn, sum(sb) AS tsb
             FROM pf GROUP BY 1)
      SELECT c_mktsegment, fold, CAST(n AS BIGINT) AS n_rows,
             round(CAST(tsb - sb AS DOUBLE) / CAST(tn - n AS DOUBLE)
               / 100.0, 6) AS oof_mean
      FROM pf JOIN ps USING (c_mktsegment) ORDER BY c_mktsegment, fold"""))
  )
}
