package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{Tables => T}

/** Round-7 sixteenth wave: the SQL recursion surface (Spark 4's native
  * `WITH RECURSIVE`, executing the SAME statement text as the DuckDB
  * oracle), Brown–Forsythe variance homogeneity, the G-test of
  * independence, and Theil's uncertainty coefficients. Exactness: the
  * recursion advances pure-integer state (the %-trick makes integer
  * division out of engine-native float `/`), and the three test
  * statistics reduce through exact counts with their log terms on
  * ordered cumsums over bounded spines.
  */
object Round70 {

  /** Shared statement text for q366 — `%s` are the two table names, the
    * only tokens that differ between the Spark run (temp views) and the
    * DuckDB oracle (driver-registered tables). The integer step
    * `(bal*41 - (bal*41) %% 10000) / 10000` is exact in BOTH engines'
    * float division because the numerator is a multiple of 10⁴ below
    * 2⁵³; truncating `%%` matches between engines for negative balances
    * too.
    */
  private val recursiveSql = """
      WITH RECURSIVE start_ AS (
        SELECT n_name,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) * 100
                 AS BIGINT) AS bal
        FROM %s JOIN %s ON c_nationkey = n_nationkey
        GROUP BY n_name
      ),
      sched AS (
        SELECT n_name, 0 AS month, bal FROM start_
        UNION ALL
        SELECT n_name, month + 1,
               bal + CAST((bal * 41 - (bal * 41) %% 10000) / 10000
                 AS BIGINT)
        FROM sched WHERE month < 24
      )
      SELECT n_name, CAST(month AS BIGINT) AS month,
             bal AS balance_cents,
             CAST(bal AS DOUBLE) / 100.0 AS balance
      FROM sched ORDER BY n_name, month"""

  val all: Seq[Q] = Seq(

    // Native recursive CTE: a 24-month compound-interest schedule
    // (41 bp/month, integer cents) over each nation's total account
    // balance. Spark 4 executes the recursion itself (UnionLoop) — the
    // statement text is IDENTICAL to the oracle's, table names aside.
    Q("q366_recursive_schedule", (s, d) => {
      T.customer(s, d).createOrReplaceTempView("customer_r70")
      T.nation(s, d).createOrReplaceTempView("nation_r70")
      s.sql(recursiveSql.format("customer_r70", "nation_r70"))
    }, Some(recursiveSql.format("customer", "nation"))),

    // Brown–Forsythe (median-centered Levene) homogeneity-of-variance
    // F across order priorities on order totals. The group median rides
    // exact integer ranks (the doubled-median trick keeps even-count
    // midpoints integral), |2x − med2| is an exact long, its square an
    // exact DECIMAL(37,0) whose data-sized sum is order-free, and the
    // ≤5 fractional group terms add through an ordered cumsum.
    Q("q367_brown_forsythe", (s, d) => {
      import s.implicits._
      val rows = T.orders(s, d).select($"o_orderpriority",
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long")
          .as("x"))
      // group medians from the (priority, value) spine: cumulative
      // counts via the range-partitioned grouped scan pick the two
      // middle order statistics — no row_number over a 5-partition
      // window of the whole table
      val spine = rows.groupBy($"o_orderpriority", $"x")
        .agg(count(lit(1)).as("__t"))
      val sizes = rows.groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("ng"))
      val med = graft.operators.Scale
        .groupedPrefixSum(spine, Seq("o_orderpriority"), "x", "__t", "__cum")
        .join(broadcast(sizes), "o_orderpriority")
        .withColumn("__klo", expr("(ng + 1) div 2"))
        .withColumn("__khi", expr("(ng + 2) div 2"))
        .groupBy($"o_orderpriority").agg(
          max($"ng").as("ng"),
          sum(when($"__cum" - $"__t" < $"__klo" && $"__klo" <= $"__cum",
            $"x")).as("xlo"),
          sum(when($"__cum" - $"__t" < $"__khi" && $"__khi" <= $"__cum",
            $"x")).as("xhi"))
        .withColumn("med2", $"xlo" + $"xhi")
      val z = rows.join(med, "o_orderpriority")
        .withColumn("z", abs($"x" * 2 - $"med2"))
      val g = z.groupBy($"o_orderpriority").agg(
        max($"ng").as("ng"), sum($"z").as("sg"),
        sum($"z".cast("decimal(18,0)") * $"z".cast("decimal(18,0)"))
          .as("szz"))
      val tot = g.agg(sum($"ng").as("nn"), sum($"sg").as("ss"),
        count(lit(1)).as("k"))
      val wCum = Window.orderBy($"o_orderpriority")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dng = $"ng".cast("double")
      // parens keep the two-line expression ONE expression — a bare
      // leading `-` continuation silently becomes a discarded statement
      val diff = ($"sg".cast("double") / dng
        - $"ss".cast("double") / $"nn".cast("double"))
      val terms = g.crossJoin(broadcast(tot))
        .withColumn("tnum", dng * diff * diff)
        .withColumn("tden", $"szz".cast("double")
          - $"sg".cast("double") * $"sg".cast("double") / dng)
        .withColumn("cnum", sum($"tnum").over(wCum))
        .withColumn("cden", sum($"tden").over(wCum))
      terms.groupBy($"k", $"nn").agg(
          max_by($"cnum", $"o_orderpriority").as("__num"),
          max_by($"cden", $"o_orderpriority").as("__den"))
        .select($"k", $"nn".as("n"),
          round(($"__num" / ($"k" - 1).cast("double"))
            / ($"__den" / ($"nn" - $"k").cast("double")), 9).as("f_bf"))
    }, Some("""
      WITH rows_ AS (SELECT o_orderpriority,
              CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                AS x
            FROM orders),
      ranked AS (SELECT o_orderpriority, x,
                   CAST(row_number() OVER (PARTITION BY o_orderpriority
                     ORDER BY x) AS BIGINT) AS rn,
                   count(*) OVER (PARTITION BY o_orderpriority) AS ng
                 FROM rows_),
      med AS (SELECT o_orderpriority, max(ng) AS ng,
                CAST(sum(CASE WHEN rn = (ng + 1) // 2 THEN x END)
                  AS BIGINT)
                + CAST(sum(CASE WHEN rn = (ng + 2) // 2 THEN x END)
                    AS BIGINT) AS med2
              FROM ranked GROUP BY 1),
      z AS (SELECT r.o_orderpriority, abs(r.x * 2 - m.med2) AS z,
              m.ng
            FROM rows_ r JOIN med m
              ON r.o_orderpriority = m.o_orderpriority),
      g AS (SELECT o_orderpriority, max(ng) AS ng,
              CAST(sum(z) AS BIGINT) AS sg,
              sum(CAST(z AS DECIMAL(18,0)) * CAST(z AS DECIMAL(18,0)))
                AS szz
            FROM z GROUP BY 1),
      tot AS (SELECT CAST(sum(ng) AS BIGINT) AS nn,
                CAST(sum(sg) AS BIGINT) AS ss, count(*) AS k
              FROM g),
      terms AS (SELECT g.o_orderpriority, t.k, t.nn,
                  CAST(g.ng AS DOUBLE)
                    * (CAST(g.sg AS DOUBLE) / CAST(g.ng AS DOUBLE)
                       - CAST(t.ss AS DOUBLE) / CAST(t.nn AS DOUBLE))
                    * (CAST(g.sg AS DOUBLE) / CAST(g.ng AS DOUBLE)
                       - CAST(t.ss AS DOUBLE) / CAST(t.nn AS DOUBLE))
                    AS tnum,
                  CAST(g.szz AS DOUBLE)
                    - CAST(g.sg AS DOUBLE) * CAST(g.sg AS DOUBLE)
                      / CAST(g.ng AS DOUBLE) AS tden
                FROM g CROSS JOIN tot t),
      cum AS (SELECT o_orderpriority, k, nn,
                sum(tnum) OVER wc AS cnum, sum(tden) OVER wc AS cden
              FROM terms
              WINDOW wc AS (ORDER BY o_orderpriority
                ROWS UNBOUNDED PRECEDING))
      SELECT k, nn AS n,
             round((max_by(cnum, o_orderpriority)
                    / CAST(k - 1 AS DOUBLE))
                   / (max_by(cden, o_orderpriority)
                      / CAST(nn - k AS DOUBLE)), 9) AS f_bf
      FROM cum GROUP BY k, nn""")),

    // G-test (log-likelihood ratio) of brand × return-flag independence.
    // Observed/row/column/total counts are exact longs on the ≤75-cell
    // contingency spine; each O·ln(O·N/(R·C)) term joins the ordered
    // cumsum in (brand, flag) order. Zero cells are absent rows — their
    // terms are 0 by the O·ln(O) limit, so no grid fill is needed.
    Q("q368_g_test", (s, d) => {
      import s.implicits._
      val cells = T.lineitem(s, d)
        .join(T.part(s, d), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand", $"l_returnflag")
        .agg(count(lit(1)).as("o"))
      val wb = Window.partitionBy($"p_brand")
      val wf = Window.partitionBy($"l_returnflag")
      val wAll = Window.partitionBy()
      val wOrd = Window.orderBy($"p_brand", $"l_returnflag")
      val wCum = wOrd
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val withTot = cells
        .withColumn("r", sum($"o").over(wb))
        .withColumn("c", sum($"o").over(wf))
        .withColumn("n", sum($"o").over(wAll))
        .withColumn("rn", row_number().over(wOrd).cast("long"))
        .withColumn("term", $"o".cast("double")
          * log(($"o".cast("double") * $"n".cast("double"))
            / ($"r".cast("double") * $"c".cast("double"))))
        .withColumn("cum", sum($"term").over(wCum))
      withTot.groupBy($"n").agg(
          ((count_distinct($"p_brand") - 1)
            * (count_distinct($"l_returnflag") - 1)).as("df"),
          max_by($"cum", $"rn").as("__g2"))
        .select($"n", $"df", round($"__g2" * 2.0, 9).as("g_stat"))
    }, Some("""
      WITH cells AS (SELECT p_brand, l_returnflag, count(*) AS o
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1, 2),
      tot AS (SELECT p_brand, l_returnflag, o,
                CAST(sum(o) OVER (PARTITION BY p_brand) AS BIGINT) AS r,
                CAST(sum(o) OVER (PARTITION BY l_returnflag) AS BIGINT)
                  AS c,
                CAST(sum(o) OVER () AS BIGINT) AS n
              FROM cells),
      terms AS (SELECT *, CAST(o AS DOUBLE)
                  * ln((CAST(o AS DOUBLE) * CAST(n AS DOUBLE))
                       / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)))
                  AS term
                FROM tot),
      cum AS (SELECT p_brand, l_returnflag, n,
                CAST(row_number() OVER (ORDER BY p_brand, l_returnflag)
                  AS BIGINT) AS rn,
                sum(term) OVER (ORDER BY p_brand, l_returnflag
                  ROWS UNBOUNDED PRECEDING) AS cum
              FROM terms)
      SELECT n,
             (count(DISTINCT p_brand) - 1)
               * (count(DISTINCT l_returnflag) - 1) AS df,
             round(max_by(cum, rn) * 2.0, 9) AS g_stat
      FROM cum GROUP BY n""")),

    // Theil's uncertainty coefficients U(flag|brand), U(brand|flag) and
    // the symmetric form, from the same contingency reduction: mutual
    // information and both marginal entropies accumulate their log
    // terms through ordered cumsums over the bounded cell/marginal
    // spines; every probability is a ratio of exact longs.
    Q("q369_theils_u", (s, d) => {
      import s.implicits._
      val cells = T.lineitem(s, d)
        .join(T.part(s, d), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand", $"l_returnflag")
        .agg(count(lit(1)).as("o"))
      val wb = Window.partitionBy($"p_brand")
      val wf = Window.partitionBy($"l_returnflag")
      val wAll = Window.partitionBy()
      val wOrd = Window.orderBy($"p_brand", $"l_returnflag")
      val wCum = wOrd
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mi = cells
        .withColumn("r", sum($"o").over(wb))
        .withColumn("c", sum($"o").over(wf))
        .withColumn("n", sum($"o").over(wAll))
        .withColumn("rn", row_number().over(wOrd).cast("long"))
        .withColumn("term", ($"o".cast("double") / $"n".cast("double"))
          * log(($"o".cast("double") * $"n".cast("double"))
            / ($"r".cast("double") * $"c".cast("double"))))
        .withColumn("cum", sum($"term").over(wCum))
        .groupBy($"n")
        .agg(max_by($"cum", $"rn").as("mi"))
      def marginalEntropy(keyCol: String, out: String) = {
        val wCumM = Window.orderBy(col(keyCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cells.groupBy(col(keyCol)).agg(sum($"o").as("m"))
          .withColumn("nt", sum($"m").over(Window.partitionBy()))
          .withColumn("t", -($"m".cast("double") / $"nt".cast("double"))
            * log($"m".cast("double") / $"nt".cast("double")))
          .withColumn("cumh", sum($"t").over(wCumM))
          .agg(max_by($"cumh", col(keyCol)).as(out))
      }
      mi.crossJoin(broadcast(marginalEntropy("p_brand", "h_brand")))
        .crossJoin(broadcast(marginalEntropy("l_returnflag", "h_flag")))
        .select($"n", round($"h_brand", 9).as("h_brand"),
          round($"h_flag", 9).as("h_flag"), round($"mi", 9).as("mi"),
          round($"mi" / $"h_flag", 9).as("u_flag_given_brand"),
          round($"mi" / $"h_brand", 9).as("u_brand_given_flag"),
          round($"mi" * 2.0 / ($"h_brand" + $"h_flag"), 9).as("u_sym"))
    }, Some("""
      WITH cells AS (SELECT p_brand, l_returnflag, count(*) AS o
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1, 2),
      mi0 AS (SELECT p_brand, l_returnflag, o,
                CAST(sum(o) OVER (PARTITION BY p_brand) AS BIGINT) AS r,
                CAST(sum(o) OVER (PARTITION BY l_returnflag) AS BIGINT)
                  AS c,
                CAST(sum(o) OVER () AS BIGINT) AS n
              FROM cells),
      mi1 AS (SELECT *, (CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
                * ln((CAST(o AS DOUBLE) * CAST(n AS DOUBLE))
                     / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))) AS term
              FROM mi0),
      mi AS (SELECT n, max_by(cum, rn) AS mi
             FROM (SELECT n,
                     CAST(row_number() OVER (ORDER BY p_brand,
                       l_returnflag) AS BIGINT) AS rn,
                     sum(term) OVER (ORDER BY p_brand, l_returnflag
                       ROWS UNBOUNDED PRECEDING) AS cum
                   FROM mi1)
             GROUP BY n),
      bm AS (SELECT p_brand, CAST(sum(o) AS BIGINT) AS m
             FROM cells GROUP BY 1),
      hb AS (SELECT max_by(cumh, p_brand) AS h_brand
             FROM (SELECT p_brand,
                     sum(t) OVER (ORDER BY p_brand
                       ROWS UNBOUNDED PRECEDING) AS cumh
                   FROM (SELECT p_brand,
                           -(CAST(m AS DOUBLE) / CAST(nt AS DOUBLE))
                             * ln(CAST(m AS DOUBLE)
                                  / CAST(nt AS DOUBLE)) AS t
                         FROM (SELECT p_brand, m,
                                 CAST(sum(m) OVER () AS BIGINT) AS nt
                               FROM bm)))),
      fm AS (SELECT l_returnflag, CAST(sum(o) AS BIGINT) AS m
             FROM cells GROUP BY 1),
      hf AS (SELECT max_by(cumh, l_returnflag) AS h_flag
             FROM (SELECT l_returnflag,
                     sum(t) OVER (ORDER BY l_returnflag
                       ROWS UNBOUNDED PRECEDING) AS cumh
                   FROM (SELECT l_returnflag,
                           -(CAST(m AS DOUBLE) / CAST(nt AS DOUBLE))
                             * ln(CAST(m AS DOUBLE)
                                  / CAST(nt AS DOUBLE)) AS t
                         FROM (SELECT l_returnflag, m,
                                 CAST(sum(m) OVER () AS BIGINT) AS nt
                               FROM fm))))
      SELECT n, round(h_brand, 9) AS h_brand, round(h_flag, 9) AS h_flag,
             round(mi, 9) AS mi,
             round(mi / h_flag, 9) AS u_flag_given_brand,
             round(mi / h_brand, 9) AS u_brand_given_flag,
             round(mi * 2.0 / (h_brand + h_flag), 9) AS u_sym
      FROM mi CROSS JOIN hb CROSS JOIN hf"""))
  )
}
