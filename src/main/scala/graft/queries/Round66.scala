package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{Tables => T}

/** Round-7 twelfth wave: index-number theory (Laspeyres / Paasche /
  * Fisher), Wilson score intervals, and Benjamini–Hochberg FDR control.
  * Unit prices become exact floor-truncated micro-integers before any
  * cross-period weighting, so the index ratios are single double
  * divisions of exact long sums; the normal CDF for BH uses one fixed
  * Abramowitz–Stegun polynomial written token-identically per engine.
  */
object Round66 {

  val all: Seq[Q] = Seq(

    // Laspeyres / Paasche / Fisher price indices per brand, 1999 → 2000:
    // per-part unit prices as exact micro-dollar integers
    // ((10⁶·Σcents_ep) div Σcents_qty), quantity weights exact cents —
    // each index is one double ratio of exact long dot products.
    Q("q355_price_index", (s, d) => {
      import s.implicits._
      def period(yr: Int) = T.lineitem(s, d)
        .filter(year(to_date($"l_shipdate")) === yr)
        .join(T.part(s, d), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand", $"l_partkey")
        .agg((sum($"l_extendedprice".cast("decimal(18,2)")) * 100)
            .cast("long").as("ep_c"),
          (sum($"l_quantity".cast("decimal(18,2)")) * 100)
            .cast("long").as("q_c"))
        .filter($"q_c" > 0)
        .select($"p_brand", $"l_partkey", $"q_c",
          expr("(1000000 * ep_c) div q_c").as("p_micro"))
      val b = period(1999).select($"p_brand", $"l_partkey",
        $"q_c".as("q0"), $"p_micro".as("p0"))
      val t = period(2000).select($"p_brand".as("__pb"),
        $"l_partkey".as("__pk"), $"q_c".as("q1"), $"p_micro".as("p1"))
      val j = b.join(t, $"p_brand" === $"__pb" && $"l_partkey" === $"__pk")
        .groupBy($"p_brand").agg(
          count(lit(1)).as("n_parts"),
          sum($"p1" * $"q0").as("__l_num"),
          sum($"p0" * $"q0").as("__l_den"),
          sum($"p1" * $"q1").as("__p_num"),
          sum($"p0" * $"q1").as("__p_den"))
        .filter($"__l_den" > 0 && $"__p_den" > 0)
      val lasp = $"__l_num".cast("double") / $"__l_den".cast("double")
      val paas = $"__p_num".cast("double") / $"__p_den".cast("double")
      j.select($"p_brand", $"n_parts",
          round(lasp, 6).as("laspeyres"),
          round(paas, 6).as("paasche"),
          round(sqrt(lasp * paas), 6).as("fisher"))
        .orderBy($"p_brand")
    }, Some("""
      WITH per AS (SELECT year(CAST(l_shipdate AS DATE)) AS yr,
              p_brand, l_partkey,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                AS BIGINT) AS ep_c,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100
                AS BIGINT) AS q_c
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE year(CAST(l_shipdate AS DATE)) IN (1999, 2000)
            GROUP BY 1, 2, 3 HAVING sum(l_quantity) > 0),
      pm AS (SELECT yr, p_brand, l_partkey, q_c,
               (1000000 * ep_c) // q_c AS p_micro
             FROM per),
      j AS (SELECT b.p_brand, count(*) AS n_parts,
              CAST(sum(t.p_micro * b.q_c) AS DOUBLE) AS l_num,
              CAST(sum(b.p_micro * b.q_c) AS DOUBLE) AS l_den,
              CAST(sum(t.p_micro * t.q_c) AS DOUBLE) AS p_num,
              CAST(sum(b.p_micro * t.q_c) AS DOUBLE) AS p_den
            FROM pm b JOIN pm t ON b.p_brand = t.p_brand
              AND b.l_partkey = t.l_partkey
              AND b.yr = 1999 AND t.yr = 2000
            GROUP BY 1 HAVING sum(b.p_micro * b.q_c) > 0
              AND sum(b.p_micro * t.q_c) > 0)
      SELECT p_brand, n_parts,
             round(l_num / l_den, 6) AS laspeyres,
             round(p_num / p_den, 6) AS paasche,
             round(sqrt((l_num / l_den) * (p_num / p_den)), 6) AS fisher
      FROM j ORDER BY p_brand""")),

    // Wilson 95% score interval for each segment's urgent-order share —
    // the binomial interval that stays inside (0,1); exact counts, one
    // token-identical closed form with the constant z = 1.96.
    Q("q356_wilson_ci", (s, d) => {
      import s.implicits._
      val agg = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(
          count(lit(1)).as("n"),
          sum($"o_orderpriority".isin("1-URGENT", "2-HIGH").cast("long"))
            .as("k"))
      val nD = $"n".cast("double"); val p = $"k".cast("double") / nD
      val z2 = lit(1.96 * 1.96)
      val center = p + z2 / (nD * 2.0)
      val half = lit(1.96) * sqrt(p * (lit(1.0) - p) / nD
        + z2 / (nD * nD * 4.0))
      val denom = lit(1.0) + z2 / nD
      agg.select($"c_mktsegment", $"n", $"k",
          round(p, 6).as("p_hat"),
          round((center - half) / denom, 6).as("wilson_lo"),
          round((center + half) / denom, 6).as("wilson_hi"))
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH agg AS (SELECT c_mktsegment, count(*) AS n,
              CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS k
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1)
      SELECT c_mktsegment, n, k,
             round(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_hat,
             round(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                     + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE)))
                    - 1.96 * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                        * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                        / CAST(n AS DOUBLE)
                      + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE)
                        * CAST(n AS DOUBLE))))
                   / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)), 6)
               AS wilson_lo,
             round(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                     + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE)))
                    + 1.96 * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                        * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                        / CAST(n AS DOUBLE)
                      + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE)
                        * CAST(n AS DOUBLE))))
                   / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)), 6)
               AS wilson_hi
      FROM agg ORDER BY c_mktsegment""")),

    // Benjamini–Hochberg FDR over the 25 per-nation urgent-share shift
    // tests (1999 vs 2000 two-proportion z): two-sided p from the
    // Abramowitz–Stegun 7.1.26 erfc polynomial (fixed coefficients,
    // token-identical), then the step-up rule at α = 0.10 — the cutoff
    // rank is a window max over the sorted 25-row p spine.
    Q("q357_bh_fdr", (s, d) => {
      import s.implicits._
      val base = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(T.nation(s, d), $"c_nationkey" === $"n_nationkey")
        .filter(year($"o_orderdate").isin(1999, 2000))
        .groupBy($"n_name", year($"o_orderdate").as("yr")).agg(
          count(lit(1)).as("n"),
          sum($"o_orderpriority".isin("1-URGENT", "2-HIGH").cast("long"))
            .as("k"))
      val a = base.filter($"yr" === 1999)
        .select($"n_name", $"n".as("n1"), $"k".as("k1"))
      val b = base.filter($"yr" === 2000)
        .select($"n_name".as("__nb"), $"n".as("n2"), $"k".as("k2"))
      val m = a.join(b, $"n_name" === $"__nb")
        .filter($"n1" > 0 && $"n2" > 0)
      val p1 = $"k1".cast("double") / $"n1".cast("double")
      val p2 = $"k2".cast("double") / $"n2".cast("double")
      val pp = ($"k1" + $"k2").cast("double")
        ./(($"n1" + $"n2").cast("double"))
      val se = sqrt(pp * (lit(1.0) - pp)
        * (lit(1.0) / $"n1".cast("double")
          + lit(1.0) / $"n2".cast("double")))
      val zv = m.filter(se > 0)
        .select($"n_name", round((p1 - p2) / se, 6).as("z"))
      // two-sided p = erfc(|z|/√2): A&S 7.1.26 with t = 1/(1+0.3275911·x)
      val x = abs($"z") / math.sqrt(2.0)
      val tt = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
      val poly = tt * (lit(0.254829592)
        + tt * (lit(-0.284496736)
          + tt * (lit(1.421413741)
            + tt * (lit(-1.453152027) + tt * lit(1.061405429)))))
      val withP = zv.withColumn("p", round(poly * exp(-(x * x)), 9))
      val wRank = Window.orderBy($"p", $"n_name")
      val wAll = Window.partitionBy()
      val ranked = withP
        .withColumn("rank", row_number().over(wRank).cast("long"))
        .withColumn("__m", count(lit(1)).over(wAll))
        .withColumn("__pass",
          when($"p" * $"__m".cast("double")
            <= lit(0.10) * $"rank".cast("double"), $"rank"))
        .withColumn("__kmax", max($"__pass").over(wAll))
      ranked.select($"n_name", $"z", $"p", $"rank",
          ($"__kmax".isNotNull && $"rank" <= $"__kmax").as("discovered"))
        .orderBy($"rank")
    }, Some("""
      WITH base AS (SELECT n_name, year(CAST(o_orderdate AS DATE)) AS yr,
              count(*) AS n,
              CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS k
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE year(CAST(o_orderdate AS DATE)) IN (1999, 2000)
            GROUP BY 1, 2),
      m AS (SELECT a.n_name, a.n AS n1, a.k AS k1, b.n AS n2, b.k AS k2
            FROM base a JOIN base b ON a.n_name = b.n_name
              AND a.yr = 1999 AND b.yr = 2000
            WHERE a.n > 0 AND b.n > 0),
      zt AS (SELECT n_name,
               round(((CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                      - (CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
                     / sqrt((CAST(k1 + k2 AS DOUBLE)
                             / CAST(n1 + n2 AS DOUBLE))
                        * (1.0 - CAST(k1 + k2 AS DOUBLE)
                             / CAST(n1 + n2 AS DOUBLE))
                        * (1.0 / CAST(n1 AS DOUBLE)
                           + 1.0 / CAST(n2 AS DOUBLE))), 6) AS z
             FROM m
             WHERE sqrt((CAST(k1 + k2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                * (1.0 - CAST(k1 + k2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))
                > 0),
      pv AS (SELECT n_name, z,
               round(((1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))))
                 * (0.254829592
                    + (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))))
                    * (-0.284496736
                       + (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))))
                       * (1.421413741
                          + (1.0 / (1.0 + 0.3275911 * (abs(z)
                              / sqrt(2.0))))
                          * (-1.453152027
                             + (1.0 / (1.0 + 0.3275911 * (abs(z)
                                 / sqrt(2.0)))) * 1.061405429)))))
                 * exp(-((abs(z) / sqrt(2.0)) * (abs(z) / sqrt(2.0)))),
                 9) AS p
             FROM zt),
      ranked AS (SELECT n_name, z, p,
                   CAST(row_number() OVER (ORDER BY p, n_name) AS BIGINT)
                     AS rank,
                   count(*) OVER () AS m
                 FROM pv),
      km AS (SELECT max(CASE WHEN p * CAST(m AS DOUBLE)
                        <= 0.10 * CAST(rank AS DOUBLE)
                        THEN rank END) AS kmax
             FROM ranked)
      SELECT n_name, z, p, rank,
             (kmax IS NOT NULL AND rank <= kmax) AS discovered
      FROM ranked CROSS JOIN km
      ORDER BY rank"""))
  )
}
