package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Hypothesis, Metrics, TopK}
import graft.sources.{Tables => T}

/** Round-9 wave #7: ranking comparison and post-hoc inference — RBO
  * (rank-biased overlap between two years' top-part rankings, the
  * top-weighted list similarity) and Dunn's post-hoc test (which
  * priority pairs differ, after Kruskal–Wallis says "some do").
  */
object Round83 {

  val all: Seq[Q] = Seq(

    // how stable is each nation's top-15 parts-by-revenue ranking from
    // 1995 to 1996? RBO@15 (p=0.9): prefix overlaps over two bounded
    // arrays off the TopKPerGroup heap, weights carried multiplicatively
    // in one fold (no libm pow)
    Q("q415_rbo", (s, d) => {
      import s.implicits._
      val rev = T.lineitem(s, d)
        .join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .filter(year($"o_orderdate").isin(1995, 1996))
        .join(T.supplier(s, d), $"l_suppkey" === $"s_suppkey")
        .join(T.nation(s, d), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name", year($"o_orderdate").as("yr"), $"l_partkey")
        .agg(sum(($"l_extendedprice".cast("decimal(18,2)") * 100)
          .cast("long")).as("cents"))
      val top = TopK.topKPerGroup(rev, Seq("n_name", "yr"),
        struct($"cents", $"l_partkey"), k = 15, desc = true)
      val withPos = top.withColumn("pos", row_number().over(
        Window.partitionBy($"n_name", $"yr")
          .orderBy($"cents".desc, $"l_partkey".desc)))
      val a = withPos.filter($"yr" === 1995)
        .select($"n_name", $"pos", $"l_partkey")
      val b = withPos.filter($"yr" === 1996)
        .select($"n_name", $"pos", $"l_partkey")
      Metrics.rbo(a, b, "n_name", "pos", "l_partkey", p = 0.9)
        .orderBy($"n_name")
    }, Some("""
      WITH rev AS (SELECT n.n_name, year(o.o_orderdate) AS yr,
                          l.l_partkey,
                          sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                            * 100 AS BIGINT)) AS cents
                   FROM lineitem l
                   JOIN orders o ON l.l_orderkey = o.o_orderkey
                   JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   JOIN nation n ON s.s_nationkey = n.n_nationkey
                   WHERE year(o.o_orderdate) IN (1995, 1996)
                   GROUP BY 1, 2, 3),
      t AS (SELECT n_name, yr, l_partkey,
                   row_number() OVER (PARTITION BY n_name, yr
                     ORDER BY cents DESC, l_partkey DESC) AS pos
            FROM rev),
      la AS (SELECT n_name, list(l_partkey ORDER BY pos) AS a
             FROM t WHERE pos <= 15 AND yr = 1995 GROUP BY 1),
      lb AS (SELECT n_name, list(l_partkey ORDER BY pos) AS b
             FROM t WHERE pos <= 15 AND yr = 1996 GROUP BY 1),
      j AS (SELECT la.n_name, la.a, lb.b,
                   least(len(la.a), len(lb.b)) AS d
            FROM la JOIN lb USING (n_name)
            WHERE least(len(la.a), len(lb.b)) > 0),
      f AS (SELECT n_name, d,
                   list_reduce(
                     [[0.0, 1.0]] || list_transform(range(1, d + 1),
                        i -> [CAST(i AS DOUBLE)]),
                     (st, x) -> [
                       st[1] + st[2]
                         * CAST(len(list_intersect(
                             a[1:CAST(x[1] AS BIGINT)],
                             b[1:CAST(x[1] AS BIGINT)])) AS DOUBLE)
                         / x[1],
                       st[2] * 0.9]) AS st
            FROM j)
      SELECT n_name, CAST(d AS BIGINT) AS d,
             round((1.0 - 0.9) * st[1], 6) AS rbo
      FROM f ORDER BY n_name""")),

    // after Kruskal-Wallis says order values differ by priority, WHICH
    // pairs? Dunn's pairwise z per segment — pooled midranks off the
    // grouped scan, tie-corrected, 10 pairs per segment
    Q("q416_dunn_posthoc", (s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
        .join(T.customer(s, d).select($"c_custkey", $"c_mktsegment"),
          $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment", $"o_orderpriority",
          ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      Hypothesis.dunnPostHoc(o, "c_mktsegment", "o_orderpriority",
          "cents")
        .orderBy($"c_mktsegment", $"treat_a", $"treat_b")
    }, Some("""
      WITH o AS (SELECT c.c_mktsegment AS g, o.o_orderpriority AS t,
                        CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS x
                 FROM orders o JOIN customer c
                   ON o.o_custkey = c.c_custkey),
      r AS (SELECT g, t, x,
                   2 * rank() OVER (PARTITION BY g ORDER BY x)
                     + count(*) OVER (PARTITION BY g, x) - 1 AS r2,
                   count(*) OVER (PARTITION BY g, x) AS tt
            FROM o),
      pg AS (SELECT g, count(*) AS n,
                    sum(CAST(tt AS HUGEINT) * tt - 1) AS tsum
             FROM r GROUP BY 1),
      pt AS (SELECT g, t, count(*) AS nj,
                    sum(CAST(r2 AS HUGEINT)) AS r2s
             FROM r GROUP BY 1, 2),
      pr AS (SELECT a.g, a.t AS treat_a, b.t AS treat_b,
                    a.nj AS na, a.r2s AS r2a, b.nj AS nb, b.r2s AS r2b
             FROM pt a JOIN pt b ON a.g = b.g AND a.t < b.t),
      z AS (SELECT pr.g, pr.treat_a, pr.treat_b, pr.na, pr.nb,
                   (CAST(pr.r2a AS DOUBLE) / CAST(pr.na AS DOUBLE)
                     - CAST(pr.r2b AS DOUBLE) / CAST(pr.nb AS DOUBLE))
                   / 2.0
                   / sqrt((CAST(pg.n AS DOUBLE)
                         * (CAST(pg.n AS DOUBLE) + 1.0) / 12.0
                       - CAST(pg.tsum AS DOUBLE)
                         / (12.0 * (CAST(pg.n AS DOUBLE) - 1.0)))
                     * (1.0 / CAST(pr.na AS DOUBLE)
                       + 1.0 / CAST(pr.nb AS DOUBLE))) AS zz,
                   pg.n, pg.tsum
            FROM pr JOIN pg USING (g)
            WHERE pg.n > 1
              AND CAST(pg.n AS DOUBLE) * (CAST(pg.n AS DOUBLE) + 1.0)
                  / 12.0
                - CAST(pg.tsum AS DOUBLE)
                  / (12.0 * (CAST(pg.n AS DOUBLE) - 1.0)) > 0)
      SELECT g AS c_mktsegment, treat_a, treat_b,
             CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             round(zz, 6) AS z
      FROM z ORDER BY g, treat_a, treat_b"""))
  )
}
