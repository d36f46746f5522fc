package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Graph, TimeSeries, TopK}
import graft.sources.{Tables => T}

/** Round-6 eighth wave: multi-source BFS reach, skyline frontier,
  * Hampel despiking.
  */
object Round16 {

  val all: Seq[Q] = Seq(

    // blast-radius audit: minimum hop distance from the BUILDING-segment
    // customers through the symmetrized customer–supplier trade graph,
    // explored 3 levels — level-synchronous BFS, edges partitioned once,
    // only frontiers move
    Q("q209_bfs_distances", (s, d) => {
      import s.implicits._
      val ol = T.orders(s, d)
        .join(T.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("sx"))
      // symmetrize both directions out of ONE join pass (q130's shape)
      val edges = ol.select(explode(array(
          struct($"c".as("src"), $"sx".as("dst")),
          struct($"sx".as("src"), $"c".as("dst")))).as("e"))
        .select($"e.src".as("src"), $"e.dst".as("dst"))
      val seeds = T.customer(s, d).filter($"c_mktsegment" === "BUILDING")
        .select(($"c_custkey" * 2).as("node"))
      Graph.bfsDistances(edges, "src", "dst", seeds, "node", maxDepth = 3)
        .select(when($"node" % 2 === 0,
            concat(lit("c"), ($"node" / 2).cast("long")))
          .otherwise(concat(lit("s"), (($"node" - 1) / 2).cast("long")))
          .as("node"),
          $"dist")
        .orderBy($"node")
    }, Some("""
      WITH RECURSIVE ed AS (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      edges AS (SELECT src, dst FROM ed UNION SELECT dst, src FROM ed),
      bfs AS (
        SELECT c_custkey * 2 AS node, 0 AS dist
        FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT e.dst, b.dist + 1
        FROM bfs b JOIN edges e ON e.src = b.node
        WHERE b.dist < 3)
      SELECT CASE WHEN node % 2 = 0
                  THEN 'c' || CAST(node // 2 AS BIGINT)
                  ELSE 's' || CAST((node - 1) // 2 AS BIGINT) END AS node,
             min(dist) AS dist
      FROM bfs GROUP BY 1 ORDER BY node""")),

    // product portfolio frontier: parts no other part beats on BOTH
    // total quantity sold and total revenue (Börzsönyi et al. 2001
    // skyline) — decimal-exact sums, no pairwise join: one per-x
    // reduction + one running-max pass over the reduced set
    Q("q210_skyline", (s, d) => {
      import s.implicits._
      val pts = T.lineitem(s, d).groupBy($"l_partkey")
        .agg(sum($"l_quantity".cast("decimal(18,2)")).cast("decimal(18,2)")
            .as("total_qty"),
          sum($"l_extendedprice".cast("decimal(18,2)")).cast("decimal(18,2)")
            .as("total_rev"))
      TopK.skyline2DMax(pts, "total_qty", "total_rev")
        .select($"l_partkey", $"total_qty", $"total_rev")
        .orderBy($"l_partkey")
    }, Some("""
      WITH p AS (SELECT l_partkey,
                        CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                          AS DECIMAL(18,2)) AS total_qty,
                        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                          AS DECIMAL(18,2)) AS total_rev
                 FROM lineitem GROUP BY 1)
      SELECT l_partkey, total_qty, total_rev FROM p o
      WHERE NOT EXISTS (
        SELECT 1 FROM p q
        WHERE q.total_qty >= o.total_qty AND q.total_rev >= o.total_rev
          AND (q.total_qty > o.total_qty OR q.total_rev > o.total_rev))
      ORDER BY l_partkey""")),

    // robust despiking of the per-user value stream: exact median + MAD
    // of the centered ±3 window, outlier when |v−med| > 3·1.4826·MAD —
    // one keyed window pass, then map-side array arithmetic
    Q("q211_hampel", (s, d) => {
      import s.implicits._
      TimeSeries.hampelFilter(
          T.events(s, d).select($"event_id", $"user_id", $"ts", $"value"),
          "user_id", Seq("ts", "event_id"), "value",
          half = 3, nSigma = 3.0)
        .select($"event_id", $"user_id", $"value", $"med", $"mad",
          $"is_outlier")
        .orderBy($"event_id")
    }, Some("""
      WITH b AS (
        SELECT event_id, user_id, value, list(value) OVER w AS win
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      m AS (SELECT event_id, user_id, value, win,
                   list_aggregate(win, 'median') AS med
            FROM b),
      x AS (SELECT event_id, user_id, value, med,
                   list_aggregate(list_transform(win, v -> abs(v - med)),
                     'median') AS mad
            FROM m)
      SELECT event_id, user_id, value,
             round(med, 6) AS med, round(mad, 6) AS mad,
             abs(value - med) > 3 * 1.4826 * mad AS is_outlier
      FROM x ORDER BY event_id"""))
  )
}
