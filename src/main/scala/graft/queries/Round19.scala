package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Metrics, TimeSeries}
import graft.sources.{Tables => T}

/** Round-6 eleventh wave: closed-form multiple regression, watermark
  * disorder audit, k-core extraction.
  */
object Round19 {

  val all: Seq[Q] = Seq(

    // per-type two-regressor OLS of order value (cents) on hour-of-day
    // and day-of-week: multiple regression as ONE hash aggregate of
    // exact integer moments + a map-side Cramer solve
    Q("q218_ols2", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d).select($"event_type",
        hour($"ts").as("x1"), dayofweek($"ts").as("x2"),
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("y"))
      Metrics.ols2(ev, "event_type", "x1", "x2", "y")
        .orderBy($"event_type")
    }, Some("""
      WITH base AS (SELECT event_type AS grp, hour(ts) AS x1,
                           dayofweek(ts) + 1 AS x2,
                           CAST(CAST(value AS DECIMAL(18,2)) * 100
                             AS BIGINT) AS y
                    FROM events),
      m AS (SELECT grp, count(*) AS n,
                   sum(x1) AS sp, sum(x2) AS sq, sum(y) AS ssy,
                   sum(x1*x1) AS sa, sum(x1*x2) AS sb, sum(x2*x2) AS sc,
                   sum(x1*y) AS s1, sum(x2*y) AS s2
            FROM base GROUP BY 1),
      d AS (SELECT grp, n, CAST(n AS DOUBLE) AS nd,
                   CAST(sp AS DOUBLE) AS p, CAST(sq AS DOUBLE) AS q,
                   CAST(ssy AS DOUBLE) AS sy, CAST(sa AS DOUBLE) AS a,
                   CAST(sb AS DOUBLE) AS b2, CAST(sc AS DOUBLE) AS c,
                   CAST(s1 AS DOUBLE) AS s1y, CAST(s2 AS DOUBLE) AS s2y
            FROM m),
      x AS (SELECT grp, n,
              nd*(a*c - b2*b2) - p*(p*c - b2*q) + q*(p*b2 - a*q) AS det,
              sy*(a*c - b2*b2) - p*(s1y*c - b2*s2y)
                + q*(s1y*b2 - s2y*a) AS d0,
              nd*(s1y*c - b2*s2y) - sy*(p*c - b2*q)
                + q*(p*s2y - s1y*q) AS d1,
              nd*(a*s2y - s1y*b2) - p*(p*s2y - s1y*q)
                + sy*(p*b2 - a*q) AS d2
            FROM d)
      SELECT grp AS event_type, n, round(d0/det, 6) AS b0,
             round(d1/det, 6) AS b1, round(d2/det, 6) AS b2
      FROM x WHERE det <> 0 ORDER BY event_type""")),

    // how late do events really arrive? per-user high-water mark over
    // arrival order, lateness in exact integer seconds, p95 lateness
    // per event type — the number a watermark should be SET to
    Q("q219_disorder_audit", (s, d) => {
      import s.implicits._
      TimeSeries.disorderAudit(
          T.events(s, d).select($"event_type", $"user_id", $"event_id",
            $"ts"),
          "user_id", Seq("event_id"), "ts", "event_type",
          latenessP = 0.95)
        .orderBy($"event_type")
    }, Some("""
      WITH x AS (SELECT event_type, user_id, event_id, epoch_us(ts) AS us
                 FROM events),
      h AS (SELECT event_type, us,
                   max(us) OVER (PARTITION BY user_id ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS hwm
            FROM x),
      l AS (SELECT event_type, us, hwm,
                   CASE WHEN hwm IS NOT NULL AND us < hwm
                        THEN (hwm - us) // 1000000 END AS late_s
            FROM h),
      a AS (SELECT event_type, count(*) AS n_events,
                   count(late_s) AS n_late, max(late_s) AS max_late_s
            FROM l GROUP BY 1),
      q AS (SELECT event_type, quantile_cont(late_s, 0.95) AS p95
            FROM l WHERE late_s IS NOT NULL GROUP BY 1)
      SELECT a.event_type, n_events, n_late,
             round(CAST(n_late AS DOUBLE) / n_events, 6) AS late_frac,
             max_late_s, round(p95, 6) AS p95_late_s
      FROM a LEFT JOIN q ON a.event_type = q.event_type
      ORDER BY a.event_type""")),

    // dense trade core: the median-degree-core of the symmetrized
    // customer-supplier graph (k tracks the fixture scale: ~10-core at
    // sf0.001, ~33-core at sf0.01) — iterated peel to the unique fixed
    // point. The oracle iterates the SAME peel as a recursive CTE whose
    // working row carries the surviving-node LIST (one row per round;
    // the list comparison vs the previous round terminates exactly at
    // the fixed point), plus Round19OpsSpec's brute-force reference on
    // randomized graphs
    Q("q220_kcore", (s, d) => {
      import s.implicits._
      // barrier (r11): the median-degree probe below is its own action
      // (a 1-row collect), so the orders⋈lineitem edge join re-ran for
      // it AND for the peel — materialize the edge frame once
      import graft.operators.BarrierOps
      val edges = T.orders(s, d)
        .join(T.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .select(($"o_custkey" * 2).as("src"),
          ($"l_suppkey" * 2 + 1).as("dst"))
        .barrier()
      // data-driven k = median degree (a bounded 1-row scalar); below
      // the median half the nodes peel immediately, so the surviving
      // core is non-trivial at every fixture scale
      val e = edges.distinct()
      val deg = e.select($"src".as("n")).unionAll(e.select($"dst"))
        .groupBy($"n").agg(count(lit(1)).as("d"))
      val k = math.max(2, graft.operators.Quantiles
        .exactQuantiles(deg, Seq(), "d", Seq(0.5))
        .select($"p50").collect()(0).getDouble(0).toInt)
      Graph.kCore(edges, "src", "dst", k = k)
        .select(when($"node" % 2 === 0,
            concat(lit("c"), ($"node" / 2).cast("long")))
          .otherwise(concat(lit("s"), (($"node" - 1) / 2).cast("long")))
          .as("node"),
          $"core_degree")
        .orderBy($"node")
    }, Some {
      // UNROLLED peel, not a recursive CTE: the former one-row recursion
      // carried the surviving-node LIST and membership-tested edges
      // against correlated unnests of it — DuckDB plans that as a
      // dependent join whose per-step cost is O(|edges|·|nodes|)
      // (~9.4B probes at sf0.1; the sf0.1 sweep never finished it).
      // Peeling is monotone and idempotent at the fixed point, so 8
      // plain equi-join steps over survivor ROWS compute the same set
      // whenever the peel converges within 8 rounds (it takes 2-3 on
      // every fixture scale), and the convergence GUARD row makes the
      // compare fail loudly — never silently wrong — if a future
      // corpus needs more: s7 and s8 counts must agree (monotone
      // shrinkage makes count equality set equality). Every chained CTE
      // is AS MATERIALIZED: each step references its predecessor twice,
      // so DuckDB's default inlining re-expands the whole chain 2^8
      // times (hundreds of parquet re-scans — the first un-materialized
      // attempt died on fd exhaustion before it could be slow).
      val step = (i: Int) => s"""
      s$i AS MATERIALIZED (SELECT x AS node FROM (
               SELECT e.a AS x FROM e
                 JOIN s${i - 1} p ON e.a = p.node JOIN s${i - 1} q ON e.b = q.node
               UNION ALL
               SELECT e.b FROM e
                 JOIN s${i - 1} p ON e.a = p.node JOIN s${i - 1} q ON e.b = q.node) t
             GROUP BY x HAVING count(*) >= (SELECT k FROM kv)),"""
      """
      WITH ol AS (SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
             FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      e0 AS MATERIALIZED (SELECT DISTINCT c AS src, s AS dst FROM ol),
      deg AS MATERIALIZED (SELECT n, count(*) AS d FROM (
                SELECT src AS n FROM e0 UNION ALL SELECT dst FROM e0)
              GROUP BY n),
      kv AS MATERIALIZED (SELECT greatest(2,
                CAST(floor(quantile_cont(d, 0.5)) AS INT)) AS k
             FROM deg),
      e AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
                greatest(src, dst) AS b
            FROM e0 WHERE src <> dst),
      s0 AS MATERIALIZED (SELECT n AS node FROM deg),""" +
        (1 to 8).map(step).mkString + """
      degf AS (SELECT node, count(*) AS core_degree FROM (
                 SELECT e.a AS node FROM e
                   JOIN s8 x ON e.a = x.node JOIN s8 y ON e.b = y.node
                 UNION ALL
                 SELECT e.b FROM e
                   JOIN s8 x ON e.a = x.node JOIN s8 y ON e.b = y.node)
               GROUP BY node)
      SELECT * FROM (
        SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
                    ELSE 's' || CAST((node - 1) // 2 AS VARCHAR) END AS node,
               core_degree
        FROM degf
        UNION ALL
        SELECT 'PEEL-NOT-CONVERGED-WITHIN-8', CAST(-1 AS BIGINT)
        WHERE (SELECT count(*) FROM s7) <> (SELECT count(*) FROM s8)
      ) ORDER BY node"""
    })
  )
}
