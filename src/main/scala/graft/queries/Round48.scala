package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{Graph, Quantiles}
import graft.sources.{Tables => T}

/** Round-6 fortieth wave: sampled closeness centrality, trigram path
  * mining, seasonal-residual outliers.
  */
object Round48 {

  val all: Seq[Q] = Seq(

    // closeness centrality of a deterministic seed sample: per seed,
    // harmonic closeness Σ 1/dist over nodes within 3 hops of the
    // customer–supplier graph — each seed is one level-synchronous BFS
    // over the SAME cached edge artifact; 1/dist sums accumulate in
    // exact 1e6-scaled integers (dist ∈ {1,2,3} → 1000000/500000/333333)
    Q("q295_closeness", (s, d) => {
      import s.implicits._
      val ol = T.orders(s, d)
        .join(T.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("sx"))
      val edges = ol.select(explode(array(
          struct($"c".as("src"), $"sx".as("dst")),
          struct($"sx".as("src"), $"c".as("dst")))).as("e"))
        .select($"e.src".as("src"), $"e.dst".as("dst"))
      val seeds = Seq(2L, 42L, 202L, 1002L, 2002L).toDF("node")
      // all five BFS runs share ONE cached edge artifact and one level
      // loop — the (seed, node)-keyed variant, not per-seed pipelines
      Graph.bfsDistancesPerSeed(edges, "src", "dst", seeds, "node",
          maxDepth = 3)
        .filter($"dist" > 0)
        .groupBy($"seed")
        .agg(count(lit(1)).as("n_reached"),
          sum(expr("1000000 div dist")).as("__h"))
        .select(($"seed" / 2).cast("long").as("seed_cust"), $"n_reached",
          round($"__h".cast("double") / 1e6, 6).as("harmonic"))
        .orderBy($"seed_cust")
    }, Some("""
      WITH RECURSIVE ed AS (
        SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      edges AS (SELECT a AS src, b AS dst FROM ed
                UNION SELECT b, a FROM ed),
      bfs AS (
        SELECT s.seed, s.seed AS node, 0 AS dist
        FROM (SELECT unnest([2, 42, 202, 1002, 2002]) AS seed) s
        UNION
        SELECT b.seed, e.dst, b.dist + 1
        FROM bfs b JOIN edges e ON e.src = b.node
        WHERE b.dist < 3),
      best AS (SELECT seed, node, min(dist) AS dist
               FROM bfs GROUP BY 1, 2),
      agg AS (SELECT seed, count(*) AS n_reached,
                CAST(sum(1000000 // dist) AS BIGINT) AS h
              FROM best WHERE dist > 0 GROUP BY 1)
      SELECT CAST(seed // 2 AS BIGINT) AS seed_cust, n_reached,
             round(CAST(h AS DOUBLE) / 1e6, 6) AS harmonic
      FROM agg ORDER BY seed_cust""")),

    // funnel discovery: the 15 most common CONTIGUOUS 3-step event
    // paths — per-user lead windows (no self-join), deterministic
    // (count desc, path asc) cut
    Q("q296_trigram_paths", (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      T.events(s, d)
        .withColumn("__e2", lead($"event_type", 1).over(w))
        .withColumn("__e3", lead($"event_type", 2).over(w))
        .filter($"__e3".isNotNull)
        .select(concat_ws(">", $"event_type", $"__e2", $"__e3")
          .as("path"))
        .groupBy($"path").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"path".asc)
        .limit(15)
    }, Some("""
      WITH o AS (SELECT user_id, event_type,
                   lead(event_type, 1) OVER w AS e2,
                   lead(event_type, 2) OVER w AS e3
                 FROM events
                 WINDOW w AS (PARTITION BY user_id
                   ORDER BY ts, event_id))
      SELECT event_type || '>' || e2 || '>' || e3 AS path,
             count(*) AS n
      FROM o WHERE e3 IS NOT NULL
      GROUP BY 1 ORDER BY n DESC, path LIMIT 15""")),

    // STL-lite anomaly gate: remove each event type's weekday profile
    // (decimal-exact means), then flag values whose residual sits more
    // than 3 robust sigmas (median/MAD from the exact quantile
    // machinery, bounds rounded identically) from the type's center
    Q("q297_seasonal_residuals", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d).select($"event_id", $"event_type",
        dayofweek($"ts").as("dow"), $"value")
      val prof = ev.groupBy($"event_type", $"dow")
        .agg((sum($"value".cast("decimal(18,2)")).cast("double")
          / count(lit(1)).cast("double")).as("__mean"))
      // barrier (r11): the quantile passes are separate ACTIONS (their
      // histogram/neighbor collects run as their own jobs), so AQE
      // exchange reuse cannot span them — resid and withMed each fed a
      // quantile pass AND a join and were re-evaluated per consumer
      import graft.operators.BarrierOps
      val resid = ev.join(prof, Seq("event_type", "dow"))
        .withColumn("__r", round($"value" - $"__mean", 6))
        .barrier()
      // broadcast med/mad (r12): both are one-row-per-event-type
      // quantile outputs behind barrier/collect machinery with no size
      // stats, so the planner sort-merge-joined them against the
      // data-sized residual frame — two needless exchanges of the big
      // side for answer-sized probe tables
      val med = broadcast(Quantiles.exactQuantiles(resid, Seq("event_type"),
          "__r", Seq(0.5))
        .select($"event_type", round($"p50", 6).as("__med")))
      val withMed = resid.join(med, "event_type")
        .withColumn("__ad", round(abs($"__r" - $"__med"), 6))
        .barrier()
      val mad = broadcast(Quantiles.exactQuantiles(withMed, Seq("event_type"),
          "__ad", Seq(0.5))
        .select($"event_type", round($"p50", 6).as("__mad")))
      withMed.join(mad, "event_type")
        .filter($"__mad" > 0 &&
          abs($"__r" - $"__med") > lit(3.0) * lit(1.4826) * $"__mad")
        .select($"event_id", $"event_type", $"dow",
          round($"value", 6).as("value"), $"__r".as("residual"))
        .orderBy($"event_id")
    }, Some("""
      WITH ev AS (SELECT event_id, event_type,
                    dayofweek(ts) + 1 AS dow, value
                  FROM events),
      prof AS (SELECT event_type, dow,
                 CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS mean
               FROM ev GROUP BY 1, 2),
      resid AS (SELECT ev.event_id, ev.event_type, ev.dow, ev.value,
                  round(ev.value - prof.mean, 6) AS r
                FROM ev JOIN prof ON ev.event_type = prof.event_type
                  AND ev.dow = prof.dow),
      med AS (SELECT event_type, round(quantile_cont(r, 0.5), 6) AS m
              FROM resid GROUP BY 1),
      wm AS (SELECT resid.*, med.m,
               round(abs(r - m), 6) AS ad
             FROM resid JOIN med ON resid.event_type = med.event_type),
      mad AS (SELECT event_type, round(quantile_cont(ad, 0.5), 6) AS md
              FROM wm GROUP BY 1)
      SELECT event_id, wm.event_type, dow, round(value, 6) AS value,
             r AS residual
      FROM wm JOIN mad ON wm.event_type = mad.event_type
      WHERE md > 0 AND abs(r - m) > 3.0 * 1.4826 * md
      ORDER BY event_id"""))
  )
}
