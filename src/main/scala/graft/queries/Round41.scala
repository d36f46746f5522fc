package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Quantiles}
import graft.sources.{Tables => T}

/** Round-6 thirty-third wave: temporal reachability, daily percentile
  * bands.
  */
object Round41 {

  val all: Seq[Q] = Seq(

    // time-respecting reachability on the trade graph: starting from
    // one nation's customers, alternate cust→supp / supp→cust hops
    // where each order must be placed STRICTLY AFTER the previous
    // arrival (Holme–Saramäki temporal paths — static reachability
    // over-counts); earliest arrival epoch-day per node within 2 hops
    Q("q280_temporal_reach", (s, d) => {
      import s.implicits._
      val ol = T.orders(s, d)
        .join(T.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("sx"),
          datediff(to_date($"o_orderdate"), lit("1970-01-01")).as("t"))
      // both directions of the same stamped trade edge
      val edges = ol.select(explode(array(
          struct($"c".as("src"), $"sx".as("dst"), $"t"),
          struct($"sx".as("src"), $"c".as("dst"), $"t"))).as("e"))
        .select($"e.src".as("src"), $"e.dst".as("dst"), $"e.t".as("t"))
      val seeds = T.customer(s, d)
        .join(T.nation(s, d), $"c_nationkey" === $"n_nationkey")
        .filter($"n_name" === "NATION_0")
        .select(($"c_custkey" * 2).as("node"))
      Graph.temporalEarliestArrival(edges, "src", "dst", "t",
          seeds, "node", maxHops = 2)
        .select(when($"node" % 2 === 0,
            concat(lit("c"), ($"node" / 2).cast("long")))
          .otherwise(concat(lit("s"), (($"node" - 1) / 2).cast("long")))
          .as("node"),
          $"arr")
        .orderBy($"node")
    }, Some("""
      WITH RECURSIVE
      ol AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS sx,
               date_diff('day', DATE '1970-01-01',
                 CAST(o_orderdate AS DATE)) AS t
             FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      e AS (SELECT c AS src, sx AS dst, t FROM ol
            UNION SELECT sx, c, t FROM ol),
      seeds AS (SELECT c_custkey * 2 AS node
                FROM customer JOIN nation ON c_nationkey = n_nationkey
                WHERE n_name = 'NATION_0'),
      walk AS (
        SELECT node, CAST(-9223372036854775808 AS BIGINT) AS arr,
               0 AS hops
        FROM seeds
        UNION
        SELECT e.dst, e.t, w.hops + 1
        FROM walk w JOIN e ON e.src = w.node AND e.t > w.arr
        WHERE w.hops < 2),
      best AS (SELECT node, min(arr) AS arr FROM walk GROUP BY 1)
      SELECT CASE WHEN node % 2 = 0
                  THEN 'c' || CAST(node // 2 AS BIGINT)
                  ELSE 's' || CAST((node - 1) // 2 AS BIGINT) END AS node,
             CASE WHEN arr = -9223372036854775808 THEN NULL
                  ELSE arr END AS arr
      FROM best ORDER BY node""")),

    // operations dashboard staple: P10/P50/P90 daily bands of event
    // value per type — the exact sort-rank quantile machinery keyed on
    // (type, day), quantile_cont parity on both sides
    Q("q281_quantile_bands", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .select($"event_type", to_date($"ts").as("day"), $"value")
      Quantiles.exactQuantiles(ev, Seq("event_type", "day"), "value",
          Seq(0.1, 0.5, 0.9))
        .select($"event_type", $"day",
          round($"p10", 6).as("p10"), round($"p50", 6).as("p50"),
          round($"p90", 6).as("p90"))
        .orderBy($"event_type", $"day")
    }, Some("""
      SELECT event_type, CAST(ts AS DATE) AS day,
             round(quantile_cont(value, 0.1), 6) AS p10,
             round(quantile_cont(value, 0.5), 6) AS p50,
             round(quantile_cont(value, 0.9), 6) AS p90
      FROM events GROUP BY 1, 2 ORDER BY event_type, day"""))
  )
}
