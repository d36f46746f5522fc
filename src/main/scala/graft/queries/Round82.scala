package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Hypothesis
import graft.sources.{Tables => T}

/** Round-9 wave #6: the ordered-alternative and robust-location tests —
  * Page's trend test (does spend TREND across the ordinal priority
  * levels, the sharpening of q399's "any difference?" Friedman) and
  * Mood's median test (do the samples share a pooled median, counting
  * only which side of it each row falls on).
  */
object Round82 {

  val all: Seq[Q] = Seq(

    // does a customer's spend trend monotonically from URGENT to LOW?
    // Page's L per segment over complete (customer x 5 priorities)
    // blocks — doubled in-block midranks, ordinal positions off the
    // bounded treatment spine, L2 exactly integral
    Q("q413_page_trend", (s, d) => {
      import s.implicits._
      val cell = T.orders(s, d)
        .join(T.customer(s, d).select($"c_custkey", $"c_mktsegment"),
          $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment", $"o_custkey", $"o_orderpriority")
        .agg(sum(($"o_totalprice".cast("decimal(18,2)") * 100)
          .cast("long")).as("cents"))
      Hypothesis.pageTrend(cell, "c_mktsegment", "o_custkey",
          "o_orderpriority", "cents")
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH cell AS (SELECT c.c_mktsegment AS g, o.o_custkey AS b,
                           o.o_orderpriority AS t,
                           sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2))
                             * 100 AS BIGINT)) AS v
                    FROM orders o JOIN customer c
                      ON o.o_custkey = c.c_custkey
                    GROUP BY 1, 2, 3),
      k AS (SELECT g, count(DISTINCT t) AS kk FROM cell GROUP BY 1),
      compl AS (SELECT cell.g, cell.b FROM cell JOIN k USING (g)
                GROUP BY cell.g, cell.b, k.kk
                HAVING count(DISTINCT cell.t) = k.kk),
      r AS (SELECT cell.g, cell.b, cell.t,
                   2 * rank() OVER (PARTITION BY cell.g, cell.b
                     ORDER BY cell.v)
                     + count(*) OVER (PARTITION BY cell.g, cell.b, cell.v)
                     - 1 AS d
            FROM cell JOIN compl
              ON cell.g = compl.g AND cell.b = compl.b),
      ord AS (SELECT g, t, row_number() OVER (PARTITION BY g ORDER BY t)
                AS j
              FROM (SELECT DISTINCT g, t FROM cell)),
      a AS (SELECT r.g, sum(ord.j * r.d) AS l2,
                   count(DISTINCT r.b) AS n
            FROM r JOIN ord ON r.g = ord.g AND r.t = ord.t GROUP BY 1)
      SELECT a.g AS c_mktsegment, CAST(a.n AS BIGINT) AS n,
             CAST(k.kk AS BIGINT) AS k, CAST(a.l2 AS BIGINT) AS l2,
             round((CAST(a.l2 AS DOUBLE)
                 - CAST(a.n AS DOUBLE) * CAST(k.kk AS DOUBLE)
                   * (CAST(k.kk AS DOUBLE) + 1.0)
                   * (CAST(k.kk AS DOUBLE) + 1.0) / 2.0)
               / sqrt(CAST(a.n AS DOUBLE) * CAST(k.kk AS DOUBLE)
                   * CAST(k.kk AS DOUBLE) * (CAST(k.kk AS DOUBLE) + 1.0)
                   * (CAST(k.kk AS DOUBLE) * CAST(k.kk AS DOUBLE) - 1.0)
                   / 36.0), 6) AS z
      FROM a JOIN k USING (g)
      WHERE k.kk > 1 AND a.n > 0
        AND CAST(a.n AS DOUBLE) * CAST(k.kk AS DOUBLE)
            * CAST(k.kk AS DOUBLE) * (CAST(k.kk AS DOUBLE) + 1.0)
            * (CAST(k.kk AS DOUBLE) * CAST(k.kk AS DOUBLE) - 1.0)
            / 36.0 > 0
      ORDER BY a.g""")),

    // do the five priorities share a median order value within each
    // segment? Mood's 2xk median test — pooled lower median as an exact
    // count-based order statistic off the grouped scan, cell counts
    // exact, chi-square via the bounded ordered cumsum
    Q("q414_mood_median", (s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
        .join(T.customer(s, d).select($"c_custkey", $"c_mktsegment"),
          $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment", $"o_orderpriority",
          ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      Hypothesis.moodMedianTest(o, "c_mktsegment", "o_orderpriority",
          "cents")
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH o AS (SELECT c.c_mktsegment AS g, o.o_orderpriority AS t,
                        CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS x
                 FROM orders o JOIN customer c
                   ON o.o_custkey = c.c_custkey),
      nn AS (SELECT g, count(*) AS n FROM o GROUP BY 1),
      r AS (SELECT g, x, count(*) OVER (PARTITION BY g ORDER BY x) AS cum
            FROM o),
      m AS (SELECT r.g, min(r.x) AS med
            FROM r JOIN nn ON r.g = nn.g
            WHERE r.cum >= (nn.n + 1) // 2 GROUP BY 1),
      c AS (SELECT o.g, o.t, count(*) AS nt,
                   sum(CASE WHEN o.x > m.med THEN 1 ELSE 0 END) AS a
            FROM o JOIN m ON o.g = m.g GROUP BY 1, 2),
      tt AS (SELECT g, sum(nt) AS n, sum(a) AS ab, count(*) AS kk
             FROM c GROUP BY 1),
      f AS (SELECT c.g, c.t, tt.n, tt.ab, tt.kk,
                   (CAST(c.a AS DOUBLE)
                     - CAST(c.nt AS DOUBLE) * CAST(tt.ab AS DOUBLE)
                       / CAST(tt.n AS DOUBLE))
                   * (CAST(c.a AS DOUBLE)
                     - CAST(c.nt AS DOUBLE) * CAST(tt.ab AS DOUBLE)
                       / CAST(tt.n AS DOUBLE))
                   / (CAST(c.nt AS DOUBLE) * CAST(tt.ab AS DOUBLE)
                       / CAST(tt.n AS DOUBLE))
                 + (CAST(c.nt - c.a AS DOUBLE)
                     - CAST(c.nt AS DOUBLE)
                       * CAST(tt.n - tt.ab AS DOUBLE)
                       / CAST(tt.n AS DOUBLE))
                   * (CAST(c.nt - c.a AS DOUBLE)
                     - CAST(c.nt AS DOUBLE)
                       * CAST(tt.n - tt.ab AS DOUBLE)
                       / CAST(tt.n AS DOUBLE))
                   / (CAST(c.nt AS DOUBLE)
                       * CAST(tt.n - tt.ab AS DOUBLE)
                       / CAST(tt.n AS DOUBLE)) AS term
            FROM c JOIN tt USING (g)),
      s AS (SELECT g, t, n, ab, kk,
                   sum(term) OVER (PARTITION BY g ORDER BY t) AS c2
            FROM f)
      SELECT s.g AS c_mktsegment, CAST(max(s.n) AS BIGINT) AS n,
             CAST(max(s.kk) AS BIGINT) AS k,
             CAST(max(m.med) AS BIGINT) AS median,
             round(max_by(s.c2, s.t), 6) AS chi2,
             CAST(max(s.kk) - 1 AS BIGINT) AS df
      FROM s JOIN m ON s.g = m.g
      GROUP BY s.g
      HAVING max(s.kk) > 1 AND max(s.ab) > 0 AND max(s.ab) < max(s.n)
      ORDER BY s.g"""))
  )
}
