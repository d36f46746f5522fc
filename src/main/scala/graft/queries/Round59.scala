package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.{Tables => T}

/** Round-7 fifth wave: two classic analytics shapes at scale — the
  * TPC-H Q21 multi-EXISTS chain re-expressed as one keyed aggregate, and
  * exact trailing-window distinct counts via offset fan-out instead of a
  * range join.
  */
object Round59 {

  val all: Seq[Q] = Seq(

    // TPC-H Q21 shape (suppliers who alone held up a multi-supplier
    // order): the EXISTS / NOT-EXISTS chain collapses into ONE per-order
    // aggregate — n_suppliers > 1 ∧ n_late_suppliers = 1 ∧ this supplier
    // late — so the plan is a single orderkey shuffle plus broadcast
    // dims, not four correlated self-probes of the fact table. Late =
    // shipped more than 90 days after the order date.
    Q("q329_multi_exists", (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d)
        .join(T.orders(s, d).select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey", $"l_suppkey",
          ($"l_shipdate" > date_add(to_date($"o_orderdate"), 90))
            .cast("long").as("__late"))
      val perOrder = li.groupBy($"l_orderkey", $"l_suppkey")
        .agg(max($"__late").as("__slate"))
      val orderStats = perOrder.groupBy($"l_orderkey").agg(
        count(lit(1)).as("__nsupp"),
        sum($"__slate").as("__nlate"))
      val waiting = perOrder
        .join(orderStats, "l_orderkey")
        .filter($"__slate" === 1 && $"__nsupp" > 1 && $"__nlate" === 1)
      waiting
        .join(T.supplier(s, d), $"l_suppkey" === $"s_suppkey")
        .join(T.nation(s, d), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name").agg(count(lit(1)).as("numwait"))
        .orderBy($"n_name")
    }, Some("""
      WITH li AS (SELECT l_orderkey, l_suppkey,
              CASE WHEN l_shipdate > CAST(o_orderdate AS DATE) + 90
                   THEN 1 ELSE 0 END AS late
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      per_supp AS (SELECT l_orderkey, l_suppkey, max(late) AS slate
                   FROM li GROUP BY 1, 2),
      per_order AS (SELECT l_orderkey, count(*) AS nsupp,
                      sum(slate) AS nlate
                    FROM per_supp GROUP BY 1),
      waiting AS (SELECT l_suppkey
                  FROM per_supp JOIN per_order USING (l_orderkey)
                  WHERE slate = 1 AND nsupp > 1 AND nlate = 1)
      SELECT n_name, count(*) AS numwait
      FROM waiting
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY 1 ORDER BY 1""")),

    // trailing-7-day distinct active users per day, EXACTLY, at scale:
    // the (day, user) reduce fans each pair out to the ≤7 window days it
    // serves (a map-side explode — linear, one keyed shuffle), instead of
    // a day-range join that rescans the pairs per window. DAU rides the
    // same pass; the day spine keeps only observed days.
    Q("q330_sliding_distinct", (s, d) => {
      import s.implicits._
      val du = T.events(s, d)
        .select(to_date($"ts").as("day"), $"user_id").distinct()
      val days = du.select($"day").distinct()
      val fan = du
        .withColumn("__w", explode(sequence(lit(0), lit(6))))
        .select(date_add($"day", $"__w").as("wday"), $"user_id")
        .distinct()
      val wau = fan.join(days, $"wday" === $"day")
        .groupBy($"day").agg(count(lit(1)).as("wau7"))
      val dau = du.groupBy($"day").agg(count(lit(1)).as("dau"))
      dau.join(wau, "day")
        .select($"day", $"dau", $"wau7",
          round($"wau7".cast("double") / $"dau".cast("double"), 6)
            .as("stickiness"))
        .orderBy($"day")
    }, Some("""
      WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
                  FROM events),
      days AS (SELECT DISTINCT day FROM du),
      fan AS (SELECT DISTINCT day + CAST(w AS INTEGER) AS wday, user_id
              FROM du CROSS JOIN (SELECT unnest(range(0, 7)) AS w)),
      wau AS (SELECT days.day, count(*) AS wau7
              FROM fan JOIN days ON fan.wday = days.day
              GROUP BY 1),
      dau AS (SELECT day, count(*) AS dau FROM du GROUP BY 1)
      SELECT dau.day AS day, dau, wau7,
             round(CAST(wau7 AS DOUBLE) / CAST(dau AS DOUBLE), 6)
               AS stickiness
      FROM dau JOIN wau ON dau.day = wau.day
      ORDER BY day"""))
  )
}
