package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Scale
import graft.sources.{Tables => T}

/** Round-8 second wave: the distributed rank toolkit — five operators
  * that all ride `Scale.groupedPrefixSum`/`groupedMidranks` (round-8's
  * range-partitioned grouped scan) or the global `prefixSum`, proving
  * the machinery composes: quantile normalization, winsorization,
  * Conover's squared-ranks variance test, Cliff's delta, and Mood's
  * median test. House determinism rules throughout: every data-sized
  * reduction is exact (long counts, doubled midranks, DECIMAL(38,0)
  * powers); the only floating-point accumulations are ordered cumsums
  * over group-bounded spines; finals are hash-safe BIGINT/DOUBLE/VARCHAR.
  */
object Round72 {

  val all: Seq[Q] = Seq(

    // Quantile normalization (the microarray/feature-prep transform):
    // map each (event_type, value) to the POOLED distribution's value at
    // the same relative rank, discretized to B = 256 pooled quantile
    // edges. Exact integer index arithmetic end-to-end: within-group
    // ECDF counts come off the grouped scan, the bucket index is
    // b = ceil(cum·B/ng), and each pooled edge value k_b = ceil(b·N/B)
    // is located by the spine row whose cumulative interval covers it —
    // found by a bounded per-row explode (≤ 3 candidate buckets per
    // spine row + B total), never a range join. Output: the normalized
    // distribution (type, bucket, count, edge value) — no float
    // accumulation anywhere.
    Q("q371_quantile_normalize", (s, d) => {
      import s.implicits._
      val B = 256
      val rows = T.events(s, d).filter($"value".isNotNull)
        .select($"event_type", $"value")
      val grouped = Scale.groupedMidranks(rows, Seq("event_type"), "value",
          tieCol = "__t", cumCol = "__cum")
      val ng = rows.groupBy($"event_type").agg(count(lit(1)).as("__ng"))
      val pooledSpine = rows.groupBy($"value").agg(count(lit(1)).as("__c"))
      val pooled = Scale.prefixSum(pooledSpine, "value", "__c", "__pcum")
      val nn = rows.agg(count(lit(1)).as("__nn"))
      // pooled edge values: bucket b's order statistic k_b = ceil(b·N/B)
      // lives in the spine row with __pcum − __c < k_b ≤ __pcum; candidate
      // b range per row is slack-bounded, the filter is the exact check
      val edges = pooled.crossJoin(broadcast(nn))
        .withColumn("__bLo",
          expr(s"greatest(1L, ($B * (__pcum - __c - 1)) div __nn)"))
        .withColumn("__bHi",
          expr(s"least(${B}L, ($B * __pcum) div __nn + 1)"))
        .filter($"__bLo" <= $"__bHi")
        .select($"value", $"__c", $"__pcum", $"__nn",
          explode(sequence($"__bLo", $"__bHi")).as("b"))
        .withColumn("__kb", expr(s"(b * __nn + ${B - 1}) div $B"))
        .filter($"__kb" > $"__pcum" - $"__c" && $"__kb" <= $"__pcum")
        .groupBy($"b").agg(min($"value").as("edge_value"))
      grouped.join(broadcast(ng), "event_type")
        .withColumn("b", expr(s"(__cum * $B + __ng - 1) div __ng"))
        .groupBy($"event_type", $"b").agg(sum($"__t").as("n_rows"))
        .join(broadcast(edges), "b")
        .select($"event_type", $"b", $"n_rows", $"edge_value")
        .orderBy($"event_type", $"b")
    }, Some(s"""
      WITH rows_ AS (SELECT event_type, value FROM events
                     WHERE value IS NOT NULL),
      g AS (SELECT event_type, value, count(*) AS t
            FROM rows_ GROUP BY 1, 2),
      gc AS (SELECT event_type, value, t,
               sum(t) OVER (PARTITION BY event_type ORDER BY value
                 ROWS UNBOUNDED PRECEDING) AS cum,
               sum(t) OVER (PARTITION BY event_type) AS ng
             FROM g),
      p AS (SELECT value, count(*) AS c FROM rows_ GROUP BY 1),
      pc AS (SELECT value, c,
               sum(c) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
                 AS pcum
             FROM p),
      n AS (SELECT count(*) AS nn FROM rows_),
      edges AS (SELECT b, min(value) AS edge_value
                FROM generate_series(1, 256) AS s(b), pc, n
                WHERE (b * nn + 255) // 256 > pcum - c
                  AND (b * nn + 255) // 256 <= pcum
                GROUP BY 1),
      m AS (SELECT event_type,
              -- cum is a DuckDB window sum -> HUGEINT; BIGINT keeps the
              -- final b inside the hash-safe output-type contract
              CAST((cum * 256 + ng - 1) // ng AS BIGINT) AS b, t
            FROM gc)
      SELECT event_type, b, CAST(sum(t) AS BIGINT) AS n_rows, edge_value
      FROM m JOIN edges USING (b)
      GROUP BY 1, 2, edge_value ORDER BY 1, 2""")),

    // Winsorization per market segment at the exact count-based p01/p99
    // order statistics (k = ceil(0.01·n), ceil(0.99·n)): the caps come
    // off the (segment, cents) spine — the same min-value-covering-k
    // selection as q367's medians, a per-group scalar, no range join —
    // and the winsorized mean is an exact clamped-cents sum. The
    // heavy-tails treatment every reward/score column gets before
    // training.
    Q("q372_winsorize", (s, d) => {
      import s.implicits._
      val rows = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment",
          round($"o_totalprice" * 100).cast("long").as("x"))
      val spine = rows.groupBy($"c_mktsegment", $"x")
        .agg(count(lit(1)).as("__t"))
      val sizes = rows.groupBy($"c_mktsegment").agg(count(lit(1)).as("ng"))
      val caps = Scale.groupedPrefixSum(spine, Seq("c_mktsegment"), "x",
          "__t", "__cum")
        .join(broadcast(sizes), "c_mktsegment")
        .withColumn("__klo", expr("(ng + 99) div 100"))       // ceil(0.01 n)
        .withColumn("__khi", expr("(ng * 99 + 99) div 100"))  // ceil(0.99 n)
        .groupBy($"c_mktsegment").agg(
          max($"ng").as("ng"),
          sum(when($"__cum" - $"__t" < $"__klo" && $"__klo" <= $"__cum",
            $"x")).as("__lo"),
          sum(when($"__cum" - $"__t" < $"__khi" && $"__khi" <= $"__cum",
            $"x")).as("__hi"))
      rows.join(broadcast(caps), "c_mktsegment")
        .withColumn("__w", greatest($"__lo", least($"__hi", $"x")))
        .groupBy($"c_mktsegment").agg(
          count(lit(1)).as("n"),
          round(sum($"__w").cast("double") / 100.0
            / count(lit(1)).cast("double"), 4).as("wins_mean"),
          round(max($"__lo").cast("double") / 100.0, 2).as("p01"),
          round(max($"__hi").cast("double") / 100.0, 2).as("p99"))
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH rows_ AS (SELECT c_mktsegment,
              CAST(round(o_totalprice * 100) AS BIGINT) AS x
            FROM orders JOIN customer ON o_custkey = c_custkey),
      sp AS (SELECT c_mktsegment, x, count(*) AS t
             FROM rows_ GROUP BY 1, 2),
      cm AS (SELECT c_mktsegment, x, t,
               sum(t) OVER (PARTITION BY c_mktsegment ORDER BY x
                 ROWS UNBOUNDED PRECEDING) AS cum,
               sum(t) OVER (PARTITION BY c_mktsegment) AS ng
             FROM sp),
      caps AS (SELECT c_mktsegment, max(ng) AS ng,
                 sum(CASE WHEN cum - t < (ng + 99) // 100
                          AND (ng + 99) // 100 <= cum THEN x END) AS lo,
                 sum(CASE WHEN cum - t < (ng * 99 + 99) // 100
                          AND (ng * 99 + 99) // 100 <= cum THEN x END) AS hi
               FROM cm GROUP BY 1)
      SELECT rows_.c_mktsegment, count(*) AS n,
             round(CAST(sum(greatest(lo, least(hi, x))) AS DOUBLE) / 100.0
                   / count(*), 4) AS wins_mean,
             round(CAST(max(lo) AS DOUBLE) / 100.0, 2) AS p01,
             round(CAST(max(hi) AS DOUBLE) / 100.0, 2) AS p99
      FROM rows_ JOIN caps USING (c_mktsegment)
      GROUP BY 1 ORDER BY 1""")),

    // Conover squared-ranks test for variance homogeneity across order
    // priorities: absolute deviations from the group median in exact
    // 2×-cent units (|2x − med2|, the q367 doubled-median trick), POOLED
    // doubled midranks d off the global prefix-sum spine, and the
    // statistic from exact power sums — Σd² in DECIMAL(38,0), Σd⁴ in
    // DECIMAL(38,0) (headroom to N ≈ 3·10⁹ rows; past that the d⁴
    // moment needs a scaled-double fold). The ≤5 fractional group terms
    // Σ S_g²/n_g add through an ordered cumsum, kruskalWallis-style.
    Q("q373_conover_squared_ranks", (s, d) => {
      import s.implicits._
      val rows = T.orders(s, d).select($"o_orderpriority",
        round($"o_totalprice" * 100).cast("long").as("x"))
      val spine = rows.groupBy($"o_orderpriority", $"x")
        .agg(count(lit(1)).as("__t"))
      val sizes = rows.groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("ng"))
      val med = Scale.groupedPrefixSum(spine, Seq("o_orderpriority"), "x",
          "__t", "__cum")
        .join(broadcast(sizes), "o_orderpriority")
        .withColumn("__klo", expr("(ng + 1) div 2"))
        .withColumn("__khi", expr("(ng + 2) div 2"))
        .groupBy($"o_orderpriority").agg(
          sum(when($"__cum" - $"__t" < $"__klo" && $"__klo" <= $"__cum",
            $"x")).as("__xlo"),
          sum(when($"__cum" - $"__t" < $"__khi" && $"__khi" <= $"__cum",
            $"x")).as("__xhi"))
        .withColumn("__med2", $"__xlo" + $"__xhi")
      // barrier (r11): z feeds the rank spine AND the rank join;
      // withRanks feeds the per-group and total folds — each
      // unmaterialized consumer re-ran the scan + median join upstream
      import graft.operators.BarrierOps
      val z = rows.join(broadcast(med), "o_orderpriority")
        .select($"o_orderpriority", abs($"x" * 2 - $"__med2").as("z"))
        .barrier()
      // pooled doubled midranks of z: global spine, d = 2·cum − t + 1
      val zSpine = z.groupBy($"z").agg(count(lit(1)).as("__c"))
      val ranked = Scale.prefixSum(zSpine, "z", "__c", "__zcum")
        .withColumn("__d", $"__zcum" * 2 - $"__c" + 1)
      val withRanks = z.join(ranked.select($"z", $"__d"), "z")
        .barrier()
      val perG = withRanks.groupBy($"o_orderpriority").agg(
        count(lit(1)).as("__n"),
        sum(($"__d" * $"__d").cast("decimal(38,0)")).as("__s2"))
      val tot = withRanks.agg(
        count(lit(1)).as("__nn"),
        sum(($"__d" * $"__d").cast("decimal(38,0)")).as("__su"),
        sum(($"__d" * $"__d").cast("decimal(38,0)") * ($"__d" * $"__d"))
          .as("__su2"))
      val wCum = Window.orderBy($"o_orderpriority")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val terms = perG.crossJoin(broadcast(tot))
        // u = d²/4: keep the /4 symbolic — applied once per moment below
        .withColumn("__termF",
          ($"__s2".cast("double") / 4.0) * ($"__s2".cast("double") / 4.0)
            / $"__n".cast("double"))
        .withColumn("__cumF", sum($"__termF").over(wCum))
      // ū² written as (su/4/nn)·(su/4/nn) — explicit products, not pow:
      // pow() is not bit-stable across engines on data-dependent input
      val uBar = $"__su".cast("double") / 4.0 / $"__nn".cast("double")
      terms.groupBy($"__nn", $"__su", $"__su2").agg(
          count(lit(1)).as("k"),
          max_by($"__cumF", $"o_orderpriority").as("__sgg"))
        .select($"k", $"__nn".as("n"),
          round(($"__sgg" - $"__nn".cast("double") * uBar * uBar)
            / (($"__su2".cast("double") / 16.0
              - $"__nn".cast("double") * uBar * uBar)
              / ($"__nn".cast("double") - 1.0)), 6).as("t_stat"))
    }, Some("""
      WITH rows_ AS (SELECT o_orderpriority,
              CAST(round(o_totalprice * 100) AS BIGINT) AS x
            FROM orders),
      sp AS (SELECT o_orderpriority, x, count(*) AS t
             FROM rows_ GROUP BY 1, 2),
      cm AS (SELECT o_orderpriority, x, t,
               sum(t) OVER (PARTITION BY o_orderpriority ORDER BY x
                 ROWS UNBOUNDED PRECEDING) AS cum,
               sum(t) OVER (PARTITION BY o_orderpriority) AS ng
             FROM sp),
      med AS (SELECT o_orderpriority,
                sum(CASE WHEN cum - t < (ng + 1) // 2
                         AND (ng + 1) // 2 <= cum THEN x END)
                + sum(CASE WHEN cum - t < (ng + 2) // 2
                           AND (ng + 2) // 2 <= cum THEN x END) AS med2
              FROM cm GROUP BY 1),
      z AS (SELECT rows_.o_orderpriority, abs(x * 2 - med2) AS z
            FROM rows_ JOIN med USING (o_orderpriority)),
      zr AS (SELECT o_orderpriority, z,
               2 * rank() OVER (ORDER BY z)
                 + count(*) OVER (PARTITION BY z) - 1 AS d
             FROM z),
      pg AS (SELECT o_orderpriority, count(*) AS n,
               sum(CAST(d * d AS HUGEINT)) AS s2
             FROM zr GROUP BY 1),
      tt AS (SELECT count(*) AS nn,
               sum(CAST(d * d AS HUGEINT)) AS su,
               sum(CAST(d * d AS HUGEINT) * (d * d)) AS su2
             FROM zr),
      terms AS (SELECT nn, su, su2, o_orderpriority,
                  sum((CAST(s2 AS DOUBLE) / 4.0) * (CAST(s2 AS DOUBLE) / 4.0)
                      / CAST(n AS DOUBLE))
                    OVER (ORDER BY o_orderpriority
                      ROWS UNBOUNDED PRECEDING) AS cumf
                FROM pg CROSS JOIN tt)
      SELECT CAST(count(*) AS BIGINT) AS k, CAST(nn AS BIGINT) AS n,
             round((max_by(cumf, o_orderpriority)
                    - CAST(nn AS DOUBLE)
                      * (CAST(su AS DOUBLE) / 4.0 / CAST(nn AS DOUBLE))
                      * (CAST(su AS DOUBLE) / 4.0 / CAST(nn AS DOUBLE)))
                   / ((CAST(su2 AS DOUBLE) / 16.0
                       - CAST(nn AS DOUBLE)
                         * (CAST(su AS DOUBLE) / 4.0 / CAST(nn AS DOUBLE))
                         * (CAST(su AS DOUBLE) / 4.0 / CAST(nn AS DOUBLE)))
                      / (CAST(nn AS DOUBLE) - 1.0)), 6) AS t_stat
      FROM terms GROUP BY nn, su, su2""")),

    // Cliff's delta (the nonparametric effect size behind every "is the
    // new mix actually better" readout) for returned (R) vs accepted (A)
    // lineitems on quantity, per linestatus: δ = (P − Q)/(n_a·n_b) with
    // P = #{x_R > x_A}, Q = #{x_R < x_A}, ties counted exactly. All
    // three pair counts come LINEARLY off the per-(status, value) spine:
    // P = Σ_v ca(v)·cumb(v−), Q = Σ_v ca(v)·(nb − cumb(v)), T = Σ ca·cb
    // — exact longs through the grouped scan, one double division.
    Q("q374_cliffs_delta", (s, d) => {
      import s.implicits._
      val rows = T.lineitem(s, d)
        .filter($"l_returnflag".isin("R", "A"))
        .select($"l_linestatus",
          ($"l_returnflag" === "R").cast("long").as("__isA"),
          $"l_quantity".cast("long").as("q"))
      val spine = rows.groupBy($"l_linestatus", $"q").agg(
        sum($"__isA").as("__ca"),
        sum(lit(1L) - $"__isA").as("__cb"))
      val cum = Scale.groupedPrefixSum(spine, Seq("l_linestatus"), "q",
          "__cb", "__cumb")
      val nb = rows.groupBy($"l_linestatus").agg(
        sum(lit(1L) - $"__isA").as("__nb"), sum($"__isA").as("__na"))
      cum.join(broadcast(nb), "l_linestatus")
        .groupBy($"l_linestatus").agg(
          max($"__na").as("n_r"), max($"__nb").as("n_a"),
          sum($"__ca" * ($"__cumb" - $"__cb")).as("p_gt"),
          sum($"__ca" * ($"__nb" - $"__cumb")).as("p_lt"),
          sum($"__ca" * $"__cb").as("ties"))
        .select($"l_linestatus", $"n_r", $"n_a", $"p_gt", $"p_lt", $"ties",
          round(($"p_gt" - $"p_lt").cast("double")
            / ($"n_r" * $"n_a").cast("double"), 6).as("delta"))
        .orderBy($"l_linestatus")
    }, Some("""
      WITH rows_ AS (SELECT l_linestatus,
              CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS isa,
              CAST(l_quantity AS BIGINT) AS q
            FROM lineitem WHERE l_returnflag IN ('R', 'A')),
      sp AS (SELECT l_linestatus, q,
               CAST(sum(isa) AS BIGINT) AS ca,
               CAST(sum(1 - isa) AS BIGINT) AS cb
             FROM rows_ GROUP BY 1, 2),
      cm AS (SELECT l_linestatus, q, ca, cb,
               sum(cb) OVER (PARTITION BY l_linestatus ORDER BY q
                 ROWS UNBOUNDED PRECEDING) AS cumb
             FROM sp),
      nn AS (SELECT l_linestatus, CAST(sum(1 - isa) AS BIGINT) AS nb,
               CAST(sum(isa) AS BIGINT) AS na
             FROM rows_ GROUP BY 1)
      SELECT l_linestatus,
             max(na) AS n_r, max(nb) AS n_a,
             CAST(sum(ca * (cumb - cb)) AS BIGINT) AS p_gt,
             CAST(sum(ca * (nb - cumb)) AS BIGINT) AS p_lt,
             CAST(sum(ca * cb) AS BIGINT) AS ties,
             round(CAST(sum(ca * (cumb - cb)) - sum(ca * (nb - cumb))
                     AS DOUBLE)
                   / CAST(max(na) * max(nb) AS DOUBLE), 6) AS delta
      FROM cm JOIN nn USING (l_linestatus)
      GROUP BY 1 ORDER BY 1""")),

    // Mood's median test: do the 25 nations share one customer-balance
    // median? Pooled doubled median off the global cents spine (exact),
    // per-nation above/not-above counts, χ² over the 25×2 contingency
    // with expected counts — exact longs everywhere, the ≤25 fractional
    // (O−E)²/E terms added through an ordered cumsum in nation order.
    Q("q375_mood_median", (s, d) => {
      import s.implicits._
      val rows = T.customer(s, d)
        .join(T.nation(s, d), $"c_nationkey" === $"n_nationkey")
        .select($"n_name",
          round($"c_acctbal" * 100).cast("long").as("x"))
      val spine = rows.groupBy($"x").agg(count(lit(1)).as("__c"))
      val nnRow = rows.agg(count(lit(1)).as("__nn"))
      val med2 = Scale.prefixSum(spine, "x", "__c", "__cum")
        .crossJoin(broadcast(nnRow))
        .withColumn("__klo", expr("(__nn + 1) div 2"))
        .withColumn("__khi", expr("(__nn + 2) div 2"))
        .agg(
          (sum(when($"__cum" - $"__c" < $"__klo" && $"__klo" <= $"__cum",
            $"x"))
            + sum(when($"__cum" - $"__c" < $"__khi" && $"__khi" <= $"__cum",
              $"x"))).as("__med2"))
      val cells = rows.crossJoin(broadcast(med2))
        .groupBy($"n_name").agg(
          sum(when($"x" * 2 > $"__med2", 1L).otherwise(0L)).as("__a"),
          count(lit(1)).as("__ng"))
      val tots = cells.agg(sum($"__a").as("__m"), sum($"__ng").as("__n"))
      val wCum = Window.orderBy($"n_name")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val nD = $"__n".cast("double")
      val mD = $"__m".cast("double")
      val ea = $"__ng".cast("double") * mD / nD
      val eb = $"__ng".cast("double") * (nD - mD) / nD
      val oa = $"__a".cast("double")
      val ob = ($"__ng" - $"__a").cast("double")
      val terms = cells.crossJoin(broadcast(tots))
        .withColumn("__chi",
          (oa - ea) * (oa - ea) / ea + (ob - eb) * (ob - eb) / eb)
        .withColumn("__cumChi", sum($"__chi").over(wCum))
      terms.groupBy($"__n", $"__m").agg(
          count(lit(1)).as("k"),
          max_by($"__cumChi", $"n_name").as("__chi2"))
        .select($"__n".as("n"), $"__m".as("n_above"),
          round($"__chi2", 6).as("chi2"), ($"k" - 1).as("df"))
    }, Some("""
      WITH rows_ AS (SELECT n_name,
              CAST(round(c_acctbal * 100) AS BIGINT) AS x
            FROM customer JOIN nation ON c_nationkey = n_nationkey),
      sp AS (SELECT x, count(*) AS c FROM rows_ GROUP BY 1),
      cm AS (SELECT x, c,
               sum(c) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum
             FROM sp),
      nn AS (SELECT count(*) AS n FROM rows_),
      med AS (SELECT
                sum(CASE WHEN cum - c < (n + 1) // 2
                         AND (n + 1) // 2 <= cum THEN x END)
                + sum(CASE WHEN cum - c < (n + 2) // 2
                           AND (n + 2) // 2 <= cum THEN x END) AS med2
              FROM cm CROSS JOIN nn),
      cells AS (SELECT n_name,
                  CAST(sum(CASE WHEN x * 2 > med2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS a,
                  count(*) AS ng
                FROM rows_ CROSS JOIN med GROUP BY 1),
      tots AS (SELECT CAST(sum(a) AS BIGINT) AS m,
                 CAST(sum(ng) AS BIGINT) AS n
               FROM cells),
      terms AS (SELECT n, m, n_name,
                  sum((CAST(a AS DOUBLE)
                       - CAST(ng AS DOUBLE) * CAST(m AS DOUBLE)
                         / CAST(n AS DOUBLE))
                      * (CAST(a AS DOUBLE)
                         - CAST(ng AS DOUBLE) * CAST(m AS DOUBLE)
                           / CAST(n AS DOUBLE))
                      / (CAST(ng AS DOUBLE) * CAST(m AS DOUBLE)
                         / CAST(n AS DOUBLE))
                      + (CAST(ng - a AS DOUBLE)
                         - CAST(ng AS DOUBLE)
                           * (CAST(n AS DOUBLE) - CAST(m AS DOUBLE))
                           / CAST(n AS DOUBLE))
                        * (CAST(ng - a AS DOUBLE)
                           - CAST(ng AS DOUBLE)
                             * (CAST(n AS DOUBLE) - CAST(m AS DOUBLE))
                             / CAST(n AS DOUBLE))
                        / (CAST(ng AS DOUBLE)
                           * (CAST(n AS DOUBLE) - CAST(m AS DOUBLE))
                           / CAST(n AS DOUBLE)))
                    OVER (ORDER BY n_name ROWS UNBOUNDED PRECEDING) AS cumchi
                FROM cells CROSS JOIN tots)
      SELECT n, m AS n_above,
             round(max_by(cumchi, n_name), 6) AS chi2,
             CAST(count(*) - 1 AS BIGINT) AS df
      FROM terms GROUP BY n, m"""))
  )
}
