package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Hypothesis}
import graft.sources.{Tables => T}

/** Round-9 wave #5: Katz centrality (the walk-counting centrality the
  * graph family lacked — PageRank's non-normalized cousin, exact integer
  * walk counts) and Cochran's Q (the binary repeated-measures test, the
  * dichotomous sibling of q399's Friedman).
  */
object Round81 {

  val all: Seq[Q] = Seq(

    // who sits on the most short walks of the trade graph? Katz
    // centrality over the symmetrized customer-supplier graph at
    // L=3, alpha=0.2 — walk counts exact DECIMAL through three
    // join+agg rounds on the once-partitioned cached edge artifact
    Q("q411_katz", (s, d) => {
      import s.implicits._
      val ol = T.orders(s, d)
        .join(T.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("s"))
      val edges = ol.select(explode(array(
          struct($"c".as("src"), $"s".as("dst")),
          struct($"s".as("src"), $"c".as("dst")))).as("e"))
        .select($"e.src".as("src"), $"e.dst".as("dst"))
      Graph.katzCentrality(edges, "src", "dst", iterations = 3,
          alpha = 0.2)
        .orderBy(desc("katz"), asc("node"))
        .limit(20)
        .select(when($"node" % 2 === 0,
            concat(lit("c"), ($"node" / 2).cast("long")))
          .otherwise(concat(lit("s"), (($"node" - 1) / 2).cast("long")))
          .as("node"),
          round($"katz", 6).as("katz"))
    }, Some("""
      WITH ol AS (SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
                  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      e AS (SELECT DISTINCT src, dst FROM (
              SELECT c AS src, s AS dst FROM ol
              UNION ALL SELECT s, c FROM ol)),
      nd AS (SELECT DISTINCT src AS node FROM e),
      w1 AS (SELECT dst AS node, CAST(count(*) AS HUGEINT) AS w
             FROM e GROUP BY 1),
      w2 AS (SELECT e.dst AS node, sum(w1.w) AS w
             FROM e JOIN w1 ON e.src = w1.node GROUP BY 1),
      w3 AS (SELECT e.dst AS node, sum(w2.w) AS w
             FROM e JOIN w2 ON e.src = w2.node GROUP BY 1),
      k AS (SELECT nd.node,
                   0.2 * CAST(coalesce(w1.w, 0) AS DOUBLE)
                 + 0.2 * 0.2 * CAST(coalesce(w2.w, 0) AS DOUBLE)
                 + 0.2 * 0.2 * 0.2 * CAST(coalesce(w3.w, 0) AS DOUBLE)
                   AS katz
            FROM nd LEFT JOIN w1 ON nd.node = w1.node
                    LEFT JOIN w2 ON nd.node = w2.node
                    LEFT JOIN w3 ON nd.node = w3.node),
      top AS (SELECT node, katz FROM k
              ORDER BY katz DESC, node LIMIT 20)
      SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS BIGINT)
                  ELSE 's' || CAST((node - 1) // 2 AS BIGINT) END AS node,
             round(katz, 6) AS katz
      FROM top ORDER BY katz DESC, node""")),

    // did each customer's PROPENSITY to order move across 1995's
    // quarters? Cochran's Q per segment: blocks = customers active in
    // 1995, treatments = the four quarters, x = ordered-in-quarter —
    // exact integer moments, one double division
    Q("q412_cochran_q", (s, d) => {
      import s.implicits._
      val flags = T.orders(s, d).filter(year($"o_orderdate") === 1995)
        .groupBy($"o_custkey")
        .agg(
          max(when(quarter($"o_orderdate") === 1, 1).otherwise(0)).as("q1"),
          max(when(quarter($"o_orderdate") === 2, 1).otherwise(0)).as("q2"),
          max(when(quarter($"o_orderdate") === 3, 1).otherwise(0)).as("q3"),
          max(when(quarter($"o_orderdate") === 4, 1).otherwise(0)).as("q4"))
      val long = flags
        .join(T.customer(s, d).select($"c_custkey", $"c_mktsegment"),
          $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment", $"o_custkey", explode(array(
          struct(lit(1).as("qt"), $"q1".as("x")),
          struct(lit(2).as("qt"), $"q2".as("x")),
          struct(lit(3).as("qt"), $"q3".as("x")),
          struct(lit(4).as("qt"), $"q4".as("x")))).as("p"))
        .select($"c_mktsegment", $"o_custkey", $"p.qt".as("qt"),
          $"p.x".as("x"))
      Hypothesis.cochranQ(long, "c_mktsegment", "o_custkey", "qt", "x")
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH f AS (SELECT o_custkey,
                   max(CASE WHEN quarter(o_orderdate) = 1 THEN 1 ELSE 0 END) AS q1,
                   max(CASE WHEN quarter(o_orderdate) = 2 THEN 1 ELSE 0 END) AS q2,
                   max(CASE WHEN quarter(o_orderdate) = 3 THEN 1 ELSE 0 END) AS q3,
                   max(CASE WHEN quarter(o_orderdate) = 4 THEN 1 ELSE 0 END) AS q4
                 FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
      j AS (SELECT c.c_mktsegment AS g, f.q1, f.q2, f.q3, f.q4
            FROM f JOIN customer c ON f.o_custkey = c.c_custkey),
      m AS (SELECT g, count(*) AS nb,
                   sum(q1) AS c1, sum(q2) AS c2, sum(q3) AS c3,
                   sum(q4) AS c4,
                   sum(CAST(q1 + q2 + q3 + q4 AS HUGEINT)
                     * (q1 + q2 + q3 + q4)) AS sr2
            FROM j GROUP BY 1),
      t AS (SELECT g, nb, c1 + c2 + c3 + c4 AS n,
                   CAST(c1 AS HUGEINT) * c1 + CAST(c2 AS HUGEINT) * c2
                 + CAST(c3 AS HUGEINT) * c3 + CAST(c4 AS HUGEINT) * c4
                   AS sc2,
                   sr2
            FROM m)
      SELECT g AS c_mktsegment, CAST(nb AS BIGINT) AS n_blocks,
             CAST(4 AS BIGINT) AS k,
             round((4.0 - 1.0) * (4.0 * CAST(sc2 AS DOUBLE)
                 - CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
               / (4.0 * CAST(n AS DOUBLE) - CAST(sr2 AS DOUBLE)), 6)
               AS q_stat,
             CAST(3 AS BIGINT) AS df
      FROM t
      WHERE 4.0 * CAST(n AS DOUBLE) - CAST(sr2 AS DOUBLE) > 0
      ORDER BY g"""))
  )
}
