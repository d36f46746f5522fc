package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{Tables => T}

/** Round-7 ninth wave: distribution-distance and forecast-evaluation
  * completions — Hellinger distance, Theil inequality decomposition,
  * two-sample Cramér–von Mises, and the Murphy reliability/resolution
  * decomposition of an out-of-sample probability forecast. Fractional
  * reductions only ever cross an ordered bounded window cumsum; every
  * data-sized reduction is exact integer/decimal.
  */
object Round63 {

  val all: Seq[Q] = Seq(

    // Hellinger distance between each segment's acctbal distribution
    // and the global one on the thousand-bucket spine: BC = Σ√(c·m) /
    // √(nM) accumulates its ~11 sqrt terms through an ordered window
    // cumsum (both engines add in bucket order), one last-row pick.
    Q("q343_hellinger", (s, d) => {
      import s.implicits._
      val rows = T.customer(s, d).select($"c_mktsegment",
        floor($"c_acctbal" / 1000.0).cast("long").as("b"))
      val global = rows.groupBy($"b").agg(count(lit(1)).as("m"))
      val per = rows.groupBy($"c_mktsegment", $"b")
        .agg(count(lit(1)).as("c"))
      val grid = per.select($"c_mktsegment").distinct()
        .crossJoin(broadcast(global))
        .join(per, Seq("c_mktsegment", "b"), "left")
        .withColumn("__c", coalesce($"c", lit(0L)))
      val wCum = Window.partitionBy($"c_mktsegment").orderBy($"b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wCls = Window.partitionBy($"c_mktsegment")
      val cum = grid
        .withColumn("__t", sqrt(($"__c" * $"m").cast("double")))
        .withColumn("__cum", sum($"__t").over(wCum))
        .withColumn("__n", sum($"__c").over(wCls))
        .withColumn("__m", sum($"m").over(wCls))
      cum.groupBy($"c_mktsegment").agg(
          max($"__n").as("n"),
          max_by($"__cum", $"b").as("__bcsum"),
          max($"__m").as("__mt"))
        .select($"c_mktsegment", $"n",
          round(sqrt(greatest(lit(0.0), lit(1.0)
            - $"__bcsum" / sqrt(($"n" * $"__mt").cast("double")))), 9)
            .as("hellinger"))
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH rows_ AS (SELECT c_mktsegment,
              CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS b
            FROM customer),
      global_ AS (SELECT b, count(*) AS m FROM rows_ GROUP BY 1),
      per AS (SELECT c_mktsegment, b, count(*) AS c
              FROM rows_ GROUP BY 1, 2),
      grid AS (SELECT s.c_mktsegment, g.b, g.m,
                 coalesce(per.c, 0) AS cc
               FROM (SELECT DISTINCT c_mktsegment FROM per) s
               CROSS JOIN global_ g
               LEFT JOIN per ON per.c_mktsegment = s.c_mktsegment
                 AND per.b = g.b),
      cum AS (SELECT c_mktsegment, b,
                sum(sqrt(CAST(cc * m AS DOUBLE))) OVER wc AS cumt,
                sum(cc) OVER wp AS n,
                sum(m) OVER wp AS mt
              FROM grid
              WINDOW wc AS (PARTITION BY c_mktsegment ORDER BY b
                  ROWS UNBOUNDED PRECEDING),
                wp AS (PARTITION BY c_mktsegment))
      SELECT c_mktsegment, CAST(max(n) AS BIGINT) AS n,
             round(sqrt(greatest(0.0, 1.0
               - max_by(cumt, b)
                 / sqrt(CAST(max(n) * max(mt) AS DOUBLE)))), 9)
               AS hellinger
      FROM cum GROUP BY 1 ORDER BY 1""")),

    // Theil-T inequality decomposition: within-region Theil over the
    // ≤5 nation lifetime revenues (exact cents) plus each region's
    // between-group term against the global mean — the log terms of
    // the ≤5-row group accumulate through an ordered cumsum, the
    // between term is one double formula over exact integer totals.
    Q("q344_theil_decomp", (s, d) => {
      import s.implicits._
      val nat = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(T.nation(s, d), $"c_nationkey" === $"n_nationkey")
        .join(T.region(s, d), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg((sum($"o_totalprice".cast("decimal(18,2)")) * 100)
          .cast("long").as("x"))
      val reg = nat.groupBy($"r_name").agg(
        count(lit(1)).as("ng"), sum($"x").as("xg"))
      val tot = reg.agg(sum($"ng").as("__n"), sum($"xg").as("__x"))
      val wCum = Window.partitionBy($"r_name").orderBy($"n_name")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val withTerms = nat.join(reg, "r_name")
        .withColumn("__r",
          ($"x" * $"ng").cast("double") / $"xg".cast("double"))
        .withColumn("__term", $"__r" * log($"__r"))
        .withColumn("__cum", sum($"__term").over(wCum))
      val within = withTerms.groupBy($"r_name").agg(
        max($"ng").as("n_nations"),
        max($"xg").as("__xg"),
        max_by($"__cum", $"n_name").as("__tsum"))
      val ratio = ($"__xg" * $"__n").cast("double")
        ./(($"__x" * $"n_nations").cast("double"))
      within.crossJoin(broadcast(tot))
        .select($"r_name", $"n_nations",
          round($"__tsum" / $"n_nations".cast("double"), 9)
            .as("theil_within"),
          round($"n_nations".cast("double") / $"__n".cast("double")
            * ratio * log(ratio), 9).as("between_term"))
        .orderBy($"r_name")
    }, Some("""
      WITH nat AS (SELECT r_name, n_name,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                AS BIGINT) AS x
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1, 2),
      reg AS (SELECT r_name, count(*) AS ng, CAST(sum(x) AS BIGINT) AS xg
              FROM nat GROUP BY 1),
      tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
                CAST(sum(xg) AS BIGINT) AS xt
              FROM reg),
      terms AS (SELECT nat.r_name, nat.n_name, reg.ng, reg.xg,
                  (CAST(nat.x * reg.ng AS DOUBLE) / CAST(reg.xg AS DOUBLE))
                    * ln(CAST(nat.x * reg.ng AS DOUBLE)
                         / CAST(reg.xg AS DOUBLE)) AS term
                FROM nat JOIN reg ON nat.r_name = reg.r_name),
      cum AS (SELECT r_name, n_name, ng, xg,
                sum(term) OVER (PARTITION BY r_name ORDER BY n_name
                  ROWS UNBOUNDED PRECEDING) AS cumt
              FROM terms),
      within AS (SELECT r_name, max(ng) AS n_nations, max(xg) AS xg,
                   max_by(cumt, n_name) AS tsum
                 FROM cum GROUP BY 1)
      SELECT r_name, n_nations,
             round(tsum / CAST(n_nations AS DOUBLE), 9) AS theil_within,
             round(CAST(n_nations AS DOUBLE) / CAST(n AS DOUBLE)
                   * (CAST(xg * n AS DOUBLE)
                      / CAST(xt * n_nations AS DOUBLE))
                   * ln(CAST(xg * n AS DOUBLE)
                        / CAST(xt * n_nations AS DOUBLE)), 9)
               AS between_term
      FROM within CROSS JOIN tot
      ORDER BY r_name""")),

    // two-sample Cramér–von Mises (Anderson 1962) per segment, O- vs
    // F-status order totals: T = Σ w·D² / (na·nb·(na+nb)²) with
    // D = cuma·nb − cumb·na on the pooled distinct-value spine. w·D
    // stays a long, (w·D)·D is an exact DECIMAL(37,0) product, and the
    // data-sized sum is exact decimal — order-free under partitioning.
    Q("q345_cvm", (s, d) => {
      import s.implicits._
      val pool = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .filter($"o_orderstatus".isin("O", "F"))
        .select($"c_mktsegment".as("seg"), $"o_orderstatus".as("side"),
          $"o_totalprice".cast("decimal(18,2)").as("x"))
      val pv = pool.groupBy($"seg", $"x").agg(
        sum(when($"side" === "O", 1L).otherwise(0L)).as("ca"),
        sum(when($"side" === "F", 1L).otherwise(0L)).as("cb"))
      val wCum = Window.partitionBy($"seg").orderBy($"x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wSeg = Window.partitionBy($"seg")
      val cum = pv
        .withColumn("__cuma", sum($"ca").over(wCum))
        .withColumn("__cumb", sum($"cb").over(wCum))
        .withColumn("__na", sum($"ca").over(wSeg))
        .withColumn("__nb", sum($"cb").over(wSeg))
        .withColumn("__d", $"__cuma" * $"__nb" - $"__cumb" * $"__na")
        .withColumn("__wd2",
          ((($"ca" + $"cb") * $"__d").cast("decimal(18,0)")
            * $"__d".cast("decimal(18,0)")))
      cum.groupBy($"seg").agg(
          max($"__na").as("n_o"),
          max($"__nb").as("n_f"),
          sum($"__wd2").as("__s"))
        .filter($"n_o" > 0 && $"n_f" > 0)
        .select($"seg".as("c_mktsegment"), $"n_o", $"n_f",
          round($"__s".cast("double")
            / ($"n_o".cast("double") * $"n_f".cast("double")
              * ($"n_o" + $"n_f").cast("double")
              * ($"n_o" + $"n_f").cast("double")), 9).as("t_cvm"))
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH pool AS (SELECT c_mktsegment AS seg, o_orderstatus AS side,
                      CAST(o_totalprice AS DECIMAL(18,2)) AS x
                    FROM orders JOIN customer ON o_custkey = c_custkey
                    WHERE o_orderstatus IN ('O', 'F')),
      pv AS (SELECT seg, x,
               CAST(sum(CASE WHEN side = 'O' THEN 1 ELSE 0 END)
                 AS BIGINT) AS ca,
               CAST(sum(CASE WHEN side = 'F' THEN 1 ELSE 0 END)
                 AS BIGINT) AS cb
             FROM pool GROUP BY 1, 2),
      cum AS (SELECT seg, ca, cb,
                sum(ca) OVER wc AS cuma,
                sum(cb) OVER wc AS cumb,
                sum(ca) OVER wp AS na,
                sum(cb) OVER wp AS nb
              FROM pv
              WINDOW wc AS (PARTITION BY seg ORDER BY x
                  ROWS UNBOUNDED PRECEDING),
                wp AS (PARTITION BY seg)),
      dd AS (SELECT seg, na, nb,
               CAST((ca + cb) * (cuma * nb - cumb * na)
                 AS DECIMAL(18,0))
                 * CAST(cuma * nb - cumb * na AS DECIMAL(18,0)) AS wd2
             FROM cum)
      SELECT seg AS c_mktsegment,
             CAST(max(na) AS BIGINT) AS n_o,
             CAST(max(nb) AS BIGINT) AS n_f,
             round(CAST(sum(wd2) AS DOUBLE)
                   / (CAST(max(na) AS DOUBLE) * CAST(max(nb) AS DOUBLE)
                      * CAST(max(na) + max(nb) AS DOUBLE)
                      * CAST(max(na) + max(nb) AS DOUBLE)), 9) AS t_cvm
      FROM dd GROUP BY seg
      HAVING max(na) > 0 AND max(nb) > 0
      ORDER BY c_mktsegment""")),

    // Murphy decomposition of an out-of-sample return-rate forecast:
    // per-brand A-flag rate TRAINED on ≤1998 shipments becomes an
    // exact floor-truncated micro-integer probability, evaluated on
    // 1999+ shipments in percent-point forecast bins — reliability and
    // resolution contributions per bin from exact integer tallies,
    // with the overall base rate on a broadcast scalar.
    Q("q346_brier_decomp", (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d).join(T.part(s, d),
        $"l_partkey" === $"p_partkey")
      val train = li.filter(year($"l_shipdate") <= 1998)
        .groupBy($"p_brand").agg(
          count(lit(1)).as("__ntr"),
          sum(when($"l_returnflag" === "A", 1L).otherwise(0L)).as("__atr"))
        .filter($"__ntr" > 0)
        .select($"p_brand",
          expr("(1000000 * __atr) div __ntr").as("p6"))
      val test = li.filter(year($"l_shipdate") >= 1999)
        .groupBy($"p_brand").agg(
          count(lit(1)).as("__nte"),
          sum(when($"l_returnflag" === "A", 1L).otherwise(0L)).as("__ate"))
      val binned = train.join(test, "p_brand")
        .withColumn("bin", least(expr("p6 div 10000"), lit(99L)))
      val wCum = Window.partitionBy($"bin").orderBy($"p_brand")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val perBin = binned
        .withColumn("__cump", sum($"__nte" * $"p6").over(wCum))
        .groupBy($"bin").agg(
          sum($"__nte").as("n_test"),
          sum($"__ate").as("__a"),
          max_by($"__cump", $"p_brand").as("__sp6"))
      val tot = perBin.agg(sum($"n_test").as("__n"), sum($"__a").as("__at"))
      val pbar = $"__sp6".cast("double") / 1e6 / $"n_test".cast("double")
      val obar = $"__a".cast("double") / $"n_test".cast("double")
      val base = $"__at".cast("double") / $"__n".cast("double")
      perBin.crossJoin(broadcast(tot))
        .select($"bin", $"n_test",
          round(pbar, 9).as("forecast_mean"),
          round(obar, 9).as("outcome_rate"),
          round($"n_test".cast("double") * (pbar - obar) * (pbar - obar)
            / $"__n".cast("double"), 9).as("reliability_contrib"),
          round($"n_test".cast("double") * (obar - base) * (obar - base)
            / $"__n".cast("double"), 9).as("resolution_contrib"))
        .orderBy($"bin")
    }, Some("""
      WITH li AS (SELECT l_returnflag, l_shipdate, p_brand
                  FROM lineitem JOIN part ON l_partkey = p_partkey),
      train AS (SELECT p_brand,
                  (1000000 * CAST(sum(CASE WHEN l_returnflag = 'A'
                       THEN 1 ELSE 0 END) AS BIGINT))
                    // CAST(count(*) AS BIGINT) AS p6
                FROM li WHERE year(CAST(l_shipdate AS DATE)) <= 1998
                GROUP BY 1 HAVING count(*) > 0),
      test AS (SELECT p_brand, count(*) AS nte,
                 CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
                   AS BIGINT) AS ate
               FROM li WHERE year(CAST(l_shipdate AS DATE)) >= 1999
               GROUP BY 1),
      binned AS (SELECT train.p_brand, p6, nte, ate,
                   least(p6 // 10000, 99) AS bin
                 FROM train JOIN test ON train.p_brand = test.p_brand),
      cum AS (SELECT bin, p_brand, nte, ate,
                sum(nte * p6) OVER (PARTITION BY bin ORDER BY p_brand
                  ROWS UNBOUNDED PRECEDING) AS cump
              FROM binned),
      per_bin AS (SELECT bin, CAST(sum(nte) AS BIGINT) AS n_test,
                    CAST(sum(ate) AS BIGINT) AS a,
                    CAST(max_by(cump, p_brand) AS BIGINT) AS sp6
                  FROM cum GROUP BY 1),
      tot AS (SELECT CAST(sum(n_test) AS BIGINT) AS n,
                CAST(sum(a) AS BIGINT) AS at
              FROM per_bin)
      SELECT bin, n_test,
             round(CAST(sp6 AS DOUBLE) / 1e6 / CAST(n_test AS DOUBLE), 9)
               AS forecast_mean,
             round(CAST(a AS DOUBLE) / CAST(n_test AS DOUBLE), 9)
               AS outcome_rate,
             round(CAST(n_test AS DOUBLE)
                   * (CAST(sp6 AS DOUBLE) / 1e6 / CAST(n_test AS DOUBLE)
                      - CAST(a AS DOUBLE) / CAST(n_test AS DOUBLE))
                   * (CAST(sp6 AS DOUBLE) / 1e6 / CAST(n_test AS DOUBLE)
                      - CAST(a AS DOUBLE) / CAST(n_test AS DOUBLE))
                   / CAST(n AS DOUBLE), 9) AS reliability_contrib,
             round(CAST(n_test AS DOUBLE)
                   * (CAST(a AS DOUBLE) / CAST(n_test AS DOUBLE)
                      - CAST(at AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(a AS DOUBLE) / CAST(n_test AS DOUBLE)
                      - CAST(at AS DOUBLE) / CAST(n AS DOUBLE))
                   / CAST(n AS DOUBLE), 9) AS resolution_contrib
      FROM per_bin CROSS JOIN tot
      ORDER BY bin"""))
  )
}
