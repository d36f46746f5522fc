package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Fuzzy, Graph, Metrics, TimeSeries}
import graft.sources.{Tables => T}

/** Round-6 twenty-fifth wave: weighted shortest paths, concentration /
  * rank-sum statistics, sorted-neighborhood blocking, Simpson's-paradox
  * slope audit, and linear gap interpolation.
  */
object Round33 {

  val all: Seq[Q] = Seq(

    // trade-lane shortest paths: nations as nodes, cust-nation →
    // supp-nation edges weighted by the lightest lineitem quantity on
    // the lane, hop-bounded Bellman–Ford (≤3 relaxation rounds) from
    // the EUROPE nations — decimal-exact path sums, edges partitioned
    // once, only the |nodes|-sized distance table moves per round
    Q("q253_sssp", (s, d) => {
      import s.implicits._
      val edges = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(T.nation(s, d).select($"n_nationkey".as("c_nationkey"),
          $"n_name".as("src")), Seq("c_nationkey"))
        .join(T.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .join(T.supplier(s, d), $"l_suppkey" === $"s_suppkey")
        .join(T.nation(s, d).select($"n_nationkey".as("s_nationkey"),
          $"n_name".as("dst")), Seq("s_nationkey"))
        .select($"src", $"dst", $"l_quantity".as("w"))
      val seeds = T.nation(s, d)
        .join(T.region(s, d), $"n_regionkey" === $"r_regionkey")
        .filter($"r_name" === "EUROPE")
        .select($"n_name".as("node"))
      Graph.weightedSssp(edges, "src", "dst", "w", seeds, "node",
          maxHops = 3)
        .orderBy($"node")
    }, Some("""
      WITH RECURSIVE
      e AS (SELECT cn.n_name AS src, sn.n_name AS dst,
                   CAST(min(l_quantity) AS DECIMAL(28,2)) AS w
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            GROUP BY 1, 2),
      seeds AS (SELECT n_name AS node
                FROM nation JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'EUROPE'),
      walk AS (
        SELECT node, CAST(0 AS DECIMAL(28,2)) AS dist, 0 AS hops
        FROM seeds
        UNION
        SELECT e.dst, CAST(w.dist + e.w AS DECIMAL(28,2)), w.hops + 1
        FROM walk w JOIN e ON e.src = w.node
        WHERE w.hops < 3)
      SELECT node, min(dist) AS dist FROM walk
      GROUP BY 1 ORDER BY node""")),

    // spend-concentration audit: Gini coefficient of per-customer total
    // spend within each market segment — rank-weighted decimal sums
    // (exact under any partitioning), one keyed shuffle
    Q("q254_gini", (s, d) => {
      import s.implicits._
      val spend = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .groupBy($"c_custkey", $"c_mktsegment")
        .agg(sum($"o_totalprice".cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("spend"))
      Metrics.giniByGroup(spend, "c_mktsegment", "spend", "c_custkey")
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH sp AS (SELECT c_custkey, c_mktsegment,
                    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                      AS DECIMAL(18,2)) AS spend
                  FROM orders JOIN customer ON o_custkey = c_custkey
                  GROUP BY 1, 2),
      r AS (SELECT c_mktsegment, spend,
              row_number() OVER (PARTITION BY c_mktsegment
                ORDER BY spend, c_custkey) AS i
            FROM sp),
      a AS (SELECT c_mktsegment, count(*) AS n,
              CAST(sum(spend) AS DECIMAL(28,2)) AS sx,
              CAST(sum(spend * i) AS DECIMAL(28,2)) AS six
            FROM r GROUP BY 1)
      SELECT c_mktsegment, n,
             round(2.0 * CAST(six AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
                   - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE),
                   6) AS gini
      FROM a WHERE sx > 0 ORDER BY c_mktsegment""")),

    // distribution-shift test per nation: Mann–Whitney rank-sum z for
    // order value, open ('O') vs fulfilled ('F') orders — midrank
    // windows and aggregates all share one hash partitioning on nation
    Q("q255_mann_whitney", (s, d) => {
      import s.implicits._
      val df = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(T.nation(s, d), $"c_nationkey" === $"n_nationkey")
        .select($"n_name", $"o_orderstatus", $"o_totalprice")
      Metrics.mannWhitney(df, "n_name", "o_orderstatus", "O", "F",
          "o_totalprice")
        .orderBy($"n_name")
    }, Some("""
      WITH pool AS (SELECT n_name, o_orderstatus AS side,
                           CAST(o_totalprice AS DOUBLE) AS x
                    FROM orders
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
                    WHERE o_orderstatus IN ('O', 'F')
                      AND o_totalprice IS NOT NULL),
      r AS (SELECT n_name, side, x,
              rank() OVER (PARTITION BY n_name ORDER BY x) AS minrank,
              count(*) OVER (PARTITION BY n_name, x) AS t
            FROM pool),
      a AS (SELECT n_name,
              CAST(sum(CASE WHEN side = 'O' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_a,
              CAST(sum(CASE WHEN side = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_b,
              sum(CASE WHEN side = 'O'
                       THEN minrank + (t - 1) / 2.0 ELSE 0.0 END) AS r_a,
              CAST(sum(t * t - 1) AS BIGINT) AS tsum
            FROM r GROUP BY 1)
      SELECT n_name, n_a, n_b,
             round(r_a - n_a * (n_a + 1.0) / 2.0, 1) AS u_a,
             round((r_a - n_a * (n_a + 1.0) / 2.0 - n_a * n_b / 2.0)
                   / sqrt(n_a * n_b / 12.0
                          * ((n_a + n_b + 1.0)
                             - CAST(tsum AS DOUBLE)
                               / ((n_a + n_b) * (n_a + n_b - 1.0)))),
                   6) AS z
      FROM a
      WHERE n_a > 0 AND n_b > 0
        AND n_a * n_b / 12.0
            * ((n_a + n_b + 1.0)
               - CAST(tsum AS DOUBLE)
                 / ((n_a + n_b) * (n_a + n_b - 1.0))) > 0
      ORDER BY n_name""")),

    // entity-blocking candidates: sorted-neighborhood within each brand
    // (sort by name, window 2, verify by edit distance ≤ 6) — linear
    // candidate count via lead(), no self-join, one keyed shuffle
    Q("q256_sorted_neighborhood", (s, d) => {
      import s.implicits._
      Fuzzy.sortedNeighborhood(
          T.part(s, d).select($"p_brand", $"p_name", $"p_partkey"),
          blockCol = "p_brand", keyCol = "p_name", idCol = "p_partkey",
          textCol = "p_name", w = 2, maxDist = 6)
        .orderBy($"p_brand", $"id_a", $"id_b")
    }, Some("""
      WITH l AS (SELECT p_brand, p_partkey AS id_a, p_name AS ta,
                   lead(p_partkey, 1) OVER w AS id1,
                   lead(p_name, 1) OVER w AS t1,
                   lead(p_partkey, 2) OVER w AS id2,
                   lead(p_name, 2) OVER w AS t2
                 FROM part
                 WINDOW w AS (PARTITION BY p_brand
                   ORDER BY p_name, p_partkey)),
      c AS (SELECT p_brand, id_a, id1 AS id_b,
                   levenshtein(ta, t1) AS dist
            FROM l WHERE id1 IS NOT NULL
            UNION ALL
            SELECT p_brand, id_a, id2, levenshtein(ta, t2)
            FROM l WHERE id2 IS NOT NULL)
      SELECT p_brand, id_a, id_b, dist FROM c
      WHERE dist <= 6 ORDER BY p_brand, id_a, id_b""")),

    // Simpson's-paradox audit: per-returnflag OLS slope of revenue on
    // quantity vs the pooled slope, flagging sign reversals — centered
    // two-pass moments (q203's cancellation-safe shape), two aggregate
    // folds sharing one scan
    Q("q257_simpson_slopes", (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d).select($"l_returnflag",
        $"l_quantity".cast("double").as("__x"),
        $"l_extendedprice".cast("double").as("__y"))
      val means = li.groupBy($"l_returnflag")
        .agg(avg($"__x").as("__mx"), avg($"__y").as("__my"))
      val grp = li.join(means, "l_returnflag")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(($"__x" - $"__mx") * ($"__y" - $"__my")).as("__sxy"),
          sum(($"__x" - $"__mx") * ($"__x" - $"__mx")).as("__sxx"))
        .select($"l_returnflag", $"n",
          round($"__sxy" / $"__sxx", 6).as("slope"))
      val pm = li.agg(avg($"__x").as("__px"), avg($"__y").as("__py"))
      val pooled = li.crossJoin(pm)
        .agg(sum(($"__x" - $"__px") * ($"__y" - $"__py")).as("__psxy"),
          sum(($"__x" - $"__px") * ($"__x" - $"__px")).as("__psxx"))
        .select(round($"__psxy" / $"__psxx", 6).as("pooled_slope"))
      grp.crossJoin(pooled)
        .withColumn("reversed",
          signum($"slope") =!= signum($"pooled_slope"))
        .orderBy($"l_returnflag")
    }, Some("""
      WITH m AS (SELECT l_returnflag, avg(l_quantity) AS mx,
                        avg(l_extendedprice) AS my
                 FROM lineitem GROUP BY 1),
      g AS (SELECT l.l_returnflag, count(*) AS n,
              round(sum((l_quantity - mx) * (l_extendedprice - my))
                    / sum((l_quantity - mx) * (l_quantity - mx)),
                    6) AS slope
            FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
            GROUP BY 1),
      pm AS (SELECT avg(l_quantity) AS px,
                    avg(l_extendedprice) AS py FROM lineitem),
      p AS (SELECT round(sum((l_quantity - px) * (l_extendedprice - py))
                         / sum((l_quantity - px) * (l_quantity - px)),
                         6) AS pooled_slope
            FROM lineitem, pm)
      SELECT l_returnflag, n, slope, pooled_slope,
             sign(slope) <> sign(pooled_slope) AS reversed
      FROM g, p ORDER BY l_returnflag""")),

    // gap repair for per-user daily value series: linear interpolation
    // across missing days between decimal-exact observed endpoints —
    // span-bounded calendar explode + two ignoreNulls windows, all on
    // one keyed partitioning
    Q("q258_interp_daily", (s, d) => {
      import s.implicits._
      TimeSeries.interpolateDaily(
          T.events(s, d).filter($"user_id" % 10 === 0),
          keyCol = "user_id", tsCol = "ts", valueCol = "value")
        .orderBy($"user_id", $"day")
    }, Some("""
      WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
                       CAST(sum(CAST(value AS DECIMAL(18,2)))
                         AS DECIMAL(18,2)) AS v
                     FROM events WHERE user_id % 10 = 0
                     GROUP BY 1, 2),
      cal AS (SELECT user_id, unnest(generate_series(
                CAST(min(day) AS DATE), CAST(max(day) AS DATE),
                INTERVAL 1 DAY))::DATE AS day
              FROM daily GROUP BY user_id),
      j AS (SELECT c.user_id, c.day, v,
              last_value(v IGNORE NULLS) OVER wp AS pv,
              last_value(CASE WHEN v IS NOT NULL THEN c.day END
                IGNORE NULLS) OVER wp AS pd,
              first_value(v IGNORE NULLS) OVER wn AS nv,
              first_value(CASE WHEN v IS NOT NULL THEN c.day END
                IGNORE NULLS) OVER wn AS nd
            FROM cal c LEFT JOIN daily dl
              ON c.user_id = dl.user_id AND c.day = dl.day
            WINDOW
              wp AS (PARTITION BY c.user_id ORDER BY c.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              wn AS (PARTITION BY c.user_id ORDER BY c.day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT user_id, day, v IS NOT NULL AS observed,
             round(CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
                        ELSE CAST(pv AS DOUBLE)
                          + CAST(nv - pv AS DOUBLE)
                            * CAST(date_diff('day', pd, day) AS DOUBLE)
                            / CAST(date_diff('day', pd, nd) AS DOUBLE)
                   END, 6) AS value
      FROM j ORDER BY user_id, day"""))
  )
}
