package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{Tables => T}

/** Round-7 eleventh wave: Jensen–Shannon divergence, Atkinson
  * inequality, top-k turnover, and Burrows' Delta stylometry. The log /
  * reciprocal terms all live on bounded spines (buckets, nations,
  * top-20 words) and accumulate through ordered window cumsums; every
  * data-sized reduction below them is exact integer/decimal.
  */
object Round65 {

  val all: Seq[Q] = Seq(

    // Jensen–Shannon divergence between each segment's acctbal bucket
    // distribution and the global one — KL halves against the mixture
    // on the same grid/cumsum scaffold as q343's Hellinger; exact count
    // ratios enter one ln-bearing double term per bucket.
    Q("q351_jsd", (s, d) => {
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
      val wCls = Window.partitionBy($"c_mktsegment")
      val wCum = Window.partitionBy($"c_mktsegment").orderBy($"b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sized = grid
        .withColumn("__n", sum($"__c").over(wCls))
        .withColumn("__m", sum($"m").over(wCls))
      // p = c/n, q = m/M, mix = (p+q)/2; both KL halves in one term
      val p = $"__c".cast("double") / $"__n".cast("double")
      val q = $"m".cast("double") / $"__m".cast("double")
      val mix = (p + q) / 2.0
      val term = when($"__c" > 0, p * log(p / mix) / 2.0)
        .otherwise(lit(0.0)) + (q * log(q / mix) / 2.0)
      val cum = sized
        .withColumn("__t", term)
        .withColumn("__cum", sum($"__t").over(wCum))
      cum.groupBy($"c_mktsegment").agg(
          max($"__n").as("n"),
          max_by($"__cum", $"b").as("__jsd"))
        .select($"c_mktsegment", $"n", round($"__jsd", 9).as("jsd"))
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
      sized AS (SELECT c_mktsegment, b, m, cc,
                  sum(cc) OVER (PARTITION BY c_mktsegment) AS n,
                  sum(m) OVER (PARTITION BY c_mktsegment) AS mt
                FROM grid),
      terms AS (SELECT c_mktsegment, b, n,
                  (CASE WHEN cc > 0
                     THEN (CAST(cc AS DOUBLE) / CAST(n AS DOUBLE))
                       * ln((CAST(cc AS DOUBLE) / CAST(n AS DOUBLE))
                            / (((CAST(cc AS DOUBLE) / CAST(n AS DOUBLE))
                                + (CAST(m AS DOUBLE)
                                   / CAST(mt AS DOUBLE))) / 2.0)) / 2.0
                     ELSE 0.0 END)
                  + ((CAST(m AS DOUBLE) / CAST(mt AS DOUBLE))
                     * ln((CAST(m AS DOUBLE) / CAST(mt AS DOUBLE))
                          / (((CAST(cc AS DOUBLE) / CAST(n AS DOUBLE))
                              + (CAST(m AS DOUBLE)
                                 / CAST(mt AS DOUBLE))) / 2.0)) / 2.0)
                    AS t
                FROM sized),
      cum AS (SELECT c_mktsegment, b, n,
                sum(t) OVER (PARTITION BY c_mktsegment ORDER BY b
                  ROWS UNBOUNDED PRECEDING) AS cumt
              FROM terms)
      SELECT c_mktsegment, CAST(max(n) AS BIGINT) AS n,
             round(max_by(cumt, b), 9) AS jsd
      FROM cum GROUP BY 1 ORDER BY 1""")),

    // Atkinson inequality index (ε=2) per region over nation lifetime
    // revenues: A = 1 − n² / (Σ(1/xᵢ)·X) — the harmonic-mean form;
    // reciprocals of exact cents accumulate through the ordered ≤5-row
    // cumsum, totals stay exact longs.
    Q("q352_atkinson", (s, d) => {
      import s.implicits._
      val nat = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(T.nation(s, d), $"c_nationkey" === $"n_nationkey")
        .join(T.region(s, d), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg((sum($"o_totalprice".cast("decimal(18,2)")) * 100)
          .cast("long").as("x"))
      val wCum = Window.partitionBy($"r_name").orderBy($"n_name")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wReg = Window.partitionBy($"r_name")
      val cum = nat
        .withColumn("__inv", lit(1.0) / $"x".cast("double"))
        .withColumn("__cum", sum($"__inv").over(wCum))
        .withColumn("__ng", count(lit(1)).over(wReg))
        .withColumn("__xg", sum($"x").over(wReg))
      cum.groupBy($"r_name").agg(
          max($"__ng").as("n_nations"),
          max($"__xg").as("__x"),
          max_by($"__cum", $"n_name").as("__sinv"))
        .select($"r_name", $"n_nations",
          round(lit(1.0)
            - ($"n_nations" * $"n_nations").cast("double")
            / ($"__sinv" * $"__x".cast("double")), 9).as("atkinson2"))
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
      cum AS (SELECT r_name, n_name, x,
                sum(1.0 / CAST(x AS DOUBLE)) OVER (PARTITION BY r_name
                  ORDER BY n_name ROWS UNBOUNDED PRECEDING) AS cinv,
                count(*) OVER (PARTITION BY r_name) AS ng,
                sum(x) OVER (PARTITION BY r_name) AS xg
              FROM nat)
      SELECT r_name, CAST(max(ng) AS BIGINT) AS n_nations,
             round(1.0 - CAST(max(ng) * max(ng) AS DOUBLE)
                   / (max_by(cinv, n_name) * CAST(max(xg) AS DOUBLE)), 9)
               AS atkinson2
      FROM cum GROUP BY 1 ORDER BY 1""")),

    // top-k turnover: month-over-month Jaccard of the top-10 parts by
    // shipped quantity — deterministic (qty desc, partkey asc) cut,
    // consecutive months joined on the month spine, set overlap from
    // exact integer counts. The churn audit for any leaderboard.
    Q("q353_topk_turnover", (s, d) => {
      import s.implicits._
      val pm = T.lineitem(s, d)
        .groupBy(trunc(to_date($"l_shipdate"), "month").as("mo"),
          $"l_partkey")
        .agg(sum($"l_quantity".cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("qty"))
      val w = Window.partitionBy($"mo").orderBy($"qty".desc, $"l_partkey")
      val top = pm.withColumn("__rk", row_number().over(w))
        .filter($"__rk" <= 10)
        .select($"mo", $"l_partkey")
      val j = top.as("a").join(top.as("b"),
          add_months(col("a.mo"), 1) === col("b.mo")
            && col("a.l_partkey") === col("b.l_partkey"))
        .groupBy(col("b.mo").as("mo")).agg(count(lit(1)).as("n_common"))
      val months = top.groupBy($"mo").agg(count(lit(1)).as("__k"))
      months.as("m2").join(months.as("m1"),
          add_months(col("m1.mo"), 1) === col("m2.mo"))
        .join(j, col("m2.mo") === j("mo"), "left")
        .select(col("m2.mo").as("month"),
          coalesce($"n_common", lit(0L)).as("n_common"),
          round(coalesce($"n_common", lit(0L)).cast("double")
            / (col("m1.__k") + col("m2.__k")
              - coalesce($"n_common", lit(0L))).cast("double"), 6)
            .as("jaccard"))
        .orderBy($"month")
    }, Some("""
      WITH pm AS (SELECT date_trunc('month', CAST(l_shipdate AS DATE))
                    AS mo, l_partkey,
                  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                    AS DECIMAL(18,2)) AS qty
                  FROM lineitem GROUP BY 1, 2),
      top AS (SELECT mo, l_partkey FROM (
                SELECT mo, l_partkey,
                  row_number() OVER (PARTITION BY mo
                    ORDER BY qty DESC, l_partkey) AS rk
                FROM pm) WHERE rk <= 10),
      months AS (SELECT mo, count(*) AS k FROM top GROUP BY 1),
      j AS (SELECT b.mo, count(*) AS n_common
            FROM top a JOIN top b ON a.mo + INTERVAL 1 MONTH = b.mo
              AND a.l_partkey = b.l_partkey
            GROUP BY 1)
      SELECT CAST(m2.mo AS DATE) AS month,
             CAST(coalesce(j.n_common, 0) AS BIGINT) AS n_common,
             round(CAST(coalesce(j.n_common, 0) AS DOUBLE)
                   / CAST(m1.k + m2.k - coalesce(j.n_common, 0)
                     AS DOUBLE), 6) AS jaccard
      FROM months m2
      JOIN months m1 ON m1.mo + INTERVAL 1 MONTH = m2.mo
      LEFT JOIN j ON j.mo = m2.mo
      ORDER BY month""")),

    // Burrows' Delta stylometry between sources (English docs): the 20
    // corpus-wide most-frequent words (deterministic cut), per-source
    // rates as exact floor-truncated parts-per-million, per-word μ/σ
    // across sources from exact integer moments, and each pair's mean
    // |z_a − z_b| accumulated through the ordered 20-word cumsum.
    Q("q354_burrows_delta", (s, d) => {
      import s.implicits._
      val toks = T.documents(s, d).filter($"lang" === "en")
        .select($"source", explode(split($"text", " ")).as("w"))
        .filter(length($"w") > 0)
      val totals = toks.groupBy($"source").agg(count(lit(1)).as("__nt"))
      val topw = toks.groupBy($"w").agg(count(lit(1)).as("__cw"))
        .orderBy($"__cw".desc, $"w".asc).limit(20)
        .select($"w")
      val csw = toks.join(broadcast(topw), "w")
        .groupBy($"source", $"w").agg(count(lit(1)).as("__c"))
      val grid = totals.crossJoin(broadcast(topw))
        .join(csw, Seq("source", "w"), "left")
        .withColumn("__f", expr(
          "(1000000 * coalesce(__c, 0L)) div __nt"))
      val mom = grid.groupBy($"w").agg(
        count(lit(1)).as("__ns"),
        sum($"__f").as("__s1"),
        sum($"__f" * $"__f").as("__s2"))
      val z = grid.join(mom, "w")
        .withColumn("__mu",
          $"__s1".cast("double") / $"__ns".cast("double"))
        .withColumn("__sd", sqrt(
          ($"__ns" * $"__s2" - $"__s1" * $"__s1").cast("double")
            / ($"__ns" * $"__ns").cast("double")))
        .filter($"__sd" > 0)
        .select($"source", $"w",
          (($"__f".cast("double") - $"__mu") / $"__sd").as("__z"))
      val pairs = z.as("a").join(z.as("b"),
          col("a.w") === col("b.w")
            && col("a.source") < col("b.source"))
        .select(col("a.source").as("source_a"),
          col("b.source").as("source_b"), col("a.w").as("w"),
          abs(col("a.__z") - col("b.__z")).as("__dz"))
      val wCum = Window.partitionBy($"source_a", $"source_b")
        .orderBy($"w")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      pairs
        .withColumn("__cum", sum($"__dz").over(wCum))
        .groupBy($"source_a", $"source_b").agg(
          count(lit(1)).as("n_words"),
          max_by($"__cum", $"w").as("__sum"))
        .select($"source_a", $"source_b", $"n_words",
          round($"__sum" / $"n_words".cast("double"), 6).as("delta"))
        .orderBy($"source_a", $"source_b")
    }, Some("""
      WITH toks AS (SELECT source, w
                    FROM (SELECT source,
                            unnest(string_split(text, ' ')) AS w
                          FROM documents WHERE lang = 'en')
                    WHERE length(w) > 0),
      totals AS (SELECT source, count(*) AS nt FROM toks GROUP BY 1),
      topw AS (SELECT w FROM (SELECT w, count(*) AS cw FROM toks
                              GROUP BY 1 ORDER BY cw DESC, w LIMIT 20)),
      csw AS (SELECT source, t.w, count(*) AS c
              FROM toks t JOIN topw ON t.w = topw.w
              GROUP BY 1, 2),
      grid AS (SELECT totals.source, topw.w,
                 (1000000 * coalesce(csw.c, 0)) // totals.nt AS f
               FROM totals CROSS JOIN topw
               LEFT JOIN csw ON csw.source = totals.source
                 AND csw.w = topw.w),
      mom AS (SELECT w, count(*) AS ns,
                CAST(sum(f) AS BIGINT) AS s1,
                CAST(sum(f * f) AS BIGINT) AS s2
              FROM grid GROUP BY 1),
      z AS (SELECT source, grid.w,
              (CAST(f AS DOUBLE)
               - CAST(s1 AS DOUBLE) / CAST(ns AS DOUBLE))
              / sqrt(CAST(ns * s2 - s1 * s1 AS DOUBLE)
                     / CAST(ns * ns AS DOUBLE)) AS zz
            FROM grid JOIN mom ON grid.w = mom.w
            WHERE sqrt(CAST(ns * s2 - s1 * s1 AS DOUBLE)
                       / CAST(ns * ns AS DOUBLE)) > 0),
      pairs AS (SELECT a.source AS source_a, b.source AS source_b,
                  a.w, abs(a.zz - b.zz) AS dz
                FROM z a JOIN z b ON a.w = b.w
                  AND a.source < b.source),
      cum AS (SELECT source_a, source_b, w,
                sum(dz) OVER (PARTITION BY source_a, source_b
                  ORDER BY w ROWS UNBOUNDED PRECEDING) AS cumd
              FROM pairs)
      SELECT source_a, source_b, count(*) AS n_words,
             round(max_by(cumd, w) / CAST(count(*) AS DOUBLE), 6)
               AS delta
      FROM cum GROUP BY 1, 2 ORDER BY 1, 2"""))
  )
}
