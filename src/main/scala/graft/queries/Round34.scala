package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Fuzzy, Graph, TimeSeries, TopK}
import graft.sources.{Tables => T}

/** Round-6 twenty-sixth wave: label-propagation communities, reciprocal
  * best-match linkage, top-p coverage selection, rolling OLS slopes.
  */
object Round34 {

  val all: Seq[Q] = Seq(

    // community detection on the customer–supplier trade graph: two
    // synchronous label-propagation rounds with min-label tie-break —
    // deterministic by construction (the async variant's order
    // dependence is exactly what a distributed engine must not have);
    // edges partitioned once, per-round cost = one join + one count agg
    Q("q259_label_prop", (s, d) => {
      import s.implicits._
      val edges = T.orders(s, d)
        .join(T.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .select(($"o_custkey" * 2).as("a"), ($"l_suppkey" * 2 + 1).as("b"))
      Graph.labelPropagation(edges, "a", "b", rounds = 2)
        .select(when($"node" % 2 === 0,
            concat(lit("c"), ($"node" / 2).cast("long")))
          .otherwise(concat(lit("s"), (($"node" - 1) / 2).cast("long")))
          .as("node"),
          $"label")
        .orderBy($"node")
    }, Some("""
      WITH ed AS (SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
                  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      sym AS (SELECT a AS src, b AS dst FROM ed
              UNION SELECT b, a FROM ed),
      l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
      r1 AS (SELECT node, label FROM (
               SELECT c.node, c.label,
                      row_number() OVER (PARTITION BY c.node
                        ORDER BY c.cnt DESC, c.label) AS rn
               FROM (SELECT s.dst AS node, l.label, count(*) AS cnt
                     FROM sym s JOIN l0 l ON s.src = l.node
                     GROUP BY 1, 2) c) WHERE rn = 1),
      r2 AS (SELECT node, label FROM (
               SELECT c.node, c.label,
                      row_number() OVER (PARTITION BY c.node
                        ORDER BY c.cnt DESC, c.label) AS rn
               FROM (SELECT s.dst AS node, l.label, count(*) AS cnt
                     FROM sym s JOIN r1 l ON s.src = l.node
                     GROUP BY 1, 2) c) WHERE rn = 1)
      SELECT CASE WHEN node % 2 = 0
                  THEN 'c' || CAST(node // 2 AS BIGINT)
                  ELSE 's' || CAST((node - 1) // 2 AS BIGINT) END AS node,
             label
      FROM r2 ORDER BY node""")),

    // account-pairing linkage: customer ↔ supplier reciprocal nearest
    // balance (integer cents) within each nation block — one block
    // equi-join bounds the quadratic, two argmin windows over the same
    // pair set, mutual-only pairs survive
    Q("q260_mutual_match", (s, d) => {
      import s.implicits._
      val cust = T.customer(s, d).select($"c_nationkey".as("nkey"),
        $"c_custkey",
        ($"c_acctbal".cast("decimal(18,2)") * 100).cast("long").as("ck"))
      val supp = T.supplier(s, d).select($"s_nationkey".as("nkey"),
        $"s_suppkey",
        ($"s_acctbal".cast("decimal(18,2)") * 100).cast("long").as("sk"))
      Fuzzy.mutualBestMatch(cust, "c_custkey", "ck",
          supp, "s_suppkey", "sk", "nkey")
        .select($"block".as("nationkey"), $"left_id".as("c_custkey"),
          $"right_id".as("s_suppkey"), $"dist".as("dist_cents"))
        .orderBy($"nationkey", $"c_custkey")
    }, Some("""
      WITH c AS (SELECT c_nationkey AS nkey, c_custkey,
                   CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                     AS ck
                 FROM customer),
      s AS (SELECT s_nationkey AS nkey, s_suppkey,
              CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS sk
            FROM supplier),
      p AS (SELECT c.nkey, c_custkey, s_suppkey, abs(ck - sk) AS dist
            FROM c JOIN s ON c.nkey = s.nkey),
      rb AS (SELECT *,
               row_number() OVER (PARTITION BY nkey, c_custkey
                 ORDER BY dist, s_suppkey) AS bl,
               row_number() OVER (PARTITION BY nkey, s_suppkey
                 ORDER BY dist, c_custkey) AS br
             FROM p)
      SELECT nkey AS nationkey, c_custkey, s_suppkey, dist AS dist_cents
      FROM rb WHERE bl = 1 AND br = 1
      ORDER BY nationkey, c_custkey""")),

    // corpus-concentration audit: per language, the smallest set of
    // sources covering ≥ 4/5 of character mass — the keep test is the
    // cross-multiplied INTEGER comparison (no floating point anywhere),
    // identical under any partitioning or engine
    Q("q261_top_p", (s, d) => {
      import s.implicits._
      val mass = T.documents(s, d).groupBy($"lang", $"source")
        .agg(sum($"n_chars").as("chars"))
      TopK.topPByGroup(mass, Seq("lang"), "chars", "source",
          pNum = 4, pDen = 5)
        .select($"lang", $"source", $"rank", $"chars",
          $"cum_weight", $"total_weight")
        .orderBy($"lang", $"rank")
    }, Some("""
      WITH m AS (SELECT lang, source, sum(n_chars) AS chars
                 FROM documents GROUP BY 1, 2),
      w AS (SELECT lang, source, chars,
              row_number() OVER win AS rank,
              sum(chars) OVER (win
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS cum_weight,
              sum(chars) OVER (PARTITION BY lang) AS total_weight
            FROM m
            WINDOW win AS (PARTITION BY lang ORDER BY chars DESC, source))
      SELECT lang, source, rank, chars, cum_weight, total_weight
      FROM w WHERE (cum_weight - chars) * 5 < total_weight * 4
      ORDER BY lang, rank""")),

    // local trend features: 7-day rolling OLS slope of each user's
    // daily value series — the closed form evaluated entirely in
    // integer arithmetic (x = epoch day, y = cents), every windowed sum
    // exact, one double division at the end
    Q("q262_rolling_slope", (s, d) => {
      import s.implicits._
      val daily = T.events(s, d).filter($"user_id" % 5 === 1)
        .groupBy($"user_id", to_date($"ts").as("day"))
        .agg(sum($"value".cast("decimal(18,2)")).cast("decimal(18,2)")
          .as("v"))
        .select($"user_id",
          datediff($"day", lit("1970-01-01")).as("xday"), $"v")
      TimeSeries.rollingSlope(daily, "user_id", "xday", "v", n = 7)
        .orderBy($"user_id", $"xday")
    }, Some("""
      WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
                       CAST(sum(CAST(value AS DECIMAL(18,2)))
                         AS DECIMAL(18,2)) AS v
                     FROM events WHERE user_id % 5 = 1
                     GROUP BY 1, 2),
      c AS (SELECT user_id,
              date_diff('day', DATE '1970-01-01', day) AS xday,
              CAST(v * 100 AS BIGINT) AS yc
            FROM daily),
      s AS (SELECT user_id, xday,
              count(*) OVER w AS cnt,
              sum(xday) OVER w AS sx, sum(yc) OVER w AS sy,
              sum(xday * yc) OVER w AS sxy,
              sum(xday * xday) OVER w AS sxx
            FROM c
            WINDOW w AS (PARTITION BY user_id ORDER BY xday
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      SELECT user_id, xday, cnt AS n_window,
             CASE WHEN cnt < 2 OR cnt * sxx = sx * sx THEN NULL
                  ELSE CAST(cnt * sxy - sx * sy AS DOUBLE)
                       / CAST(cnt * sxx - sx * sx AS DOUBLE)
                       / 100.0
             END AS slope
      FROM s ORDER BY user_id, xday"""))
  )
}
