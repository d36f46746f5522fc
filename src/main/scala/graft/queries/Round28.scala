package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Merge, TimeSeries}
import graft.sources.{Tables => T}

/** Round-6 twentieth wave: temporal joins, OLAP shares, backlog.
  */
object Round28 {

  val all: Seq[Q] = Seq(

    // point-in-time enrichment: every shipment tagged with the
    // customer's order-status regime VALID AT SHIP TIME (ship dates
    // lag order dates, so this is NOT the order's own status) — SCD2
    // build + keyed temporal join, folded to a per-status revenue
    // read-out that checks the whole chain
    Q("q244_temporal_join", (s, d) => {
      import s.implicits._
      val dim = Merge.scd2(
        T.orders(s, d).select($"o_custkey", $"o_orderstatus",
          $"o_orderdate", $"o_orderkey"),
        keyCols = Seq("o_custkey"), attrCols = Seq("o_orderstatus"),
        tsCol = "o_orderdate", tieCols = Seq("o_orderkey"))
        .select($"o_custkey".as("dim_key"),
          $"o_orderstatus".as("status_at_ship"),
          $"valid_from", $"valid_to")
      val facts = T.orders(s, d).select($"o_orderkey", $"o_custkey")
        .join(T.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .select($"o_custkey", $"l_shipdate",
          $"l_extendedprice".cast("decimal(18,2)").as("rev"))
      Merge.temporalJoin(facts, "o_custkey", "l_shipdate",
          dim, "dim_key")
        .groupBy(coalesce($"status_at_ship", lit("unknown"))
          .as("status_at_ship"))
        .agg(count(lit(1)).as("n_shipments"),
          sum($"rev").cast("decimal(18,2)").as("revenue"))
        .orderBy($"status_at_ship")
    }, Some("""
      WITH lagged AS (
        SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
               CASE WHEN o_orderstatus IS NOT DISTINCT FROM
                         lag(o_orderstatus) OVER w
                    THEN 0 ELSE 1 END AS chg
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)),
      runs AS (
        SELECT *, sum(chg) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey
                                 ROWS UNBOUNDED PRECEDING) AS run
        FROM lagged),
      seg AS (
        SELECT o_custkey, o_orderstatus, run, min(o_orderdate) AS vf
        FROM runs GROUP BY 1, 2, 3),
      hist AS (
        -- order by RUN, not vf: two same-day status flips create two
        -- runs with equal vf, and a bare ORDER BY vf would assign
        -- their leads arbitrarily (the engine orders by run number)
        SELECT o_custkey AS dim_key, o_orderstatus AS status_at_ship,
               vf AS valid_from,
               lead(vf) OVER (PARTITION BY o_custkey ORDER BY run)
                 AS valid_to
        FROM seg),
      facts AS (
        SELECT o.o_custkey, l.l_shipdate,
               CAST(l.l_extendedprice AS DECIMAL(18,2)) AS rev
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      j AS (
        SELECT f.rev, h.status_at_ship
        FROM facts f LEFT JOIN hist h
        ON h.dim_key = f.o_custkey
           AND h.valid_from <= f.l_shipdate
           AND (h.valid_to IS NULL OR f.l_shipdate < h.valid_to))
      SELECT coalesce(status_at_ship, 'unknown') AS status_at_ship,
             count(*) AS n_shipments,
             CAST(sum(rev) AS DECIMAL(18,2)) AS revenue
      FROM j GROUP BY 1 ORDER BY status_at_ship""")),

    // the OLAP percent-of-parent read-out: each nation's revenue share
    // WITHIN its region — two-level decimal-exact rollup, ratio in
    // integer-cent arithmetic before one terminal double division
    Q("q245_share_of_parent", (s, d) => {
      import s.implicits._
      val rev = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(T.nation(s, d), $"c_nationkey" === $"n_nationkey")
        .join(T.region(s, d), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg((sum($"o_totalprice".cast("decimal(18,2)")) * 100)
          .cast("long").as("__cents"))
      val regional = rev.groupBy($"r_name")
        .agg(sum($"__cents").as("__rc"))
      rev.join(regional, "r_name")
        .select($"r_name", $"n_name",
          ($"__cents".cast("decimal(20,2)") / 100).cast("decimal(18,2)")
            .as("revenue"),
          round($"__cents".cast("double") / $"__rc", 6).as("share"))
        .orderBy($"r_name", $"n_name")
    }, Some("""
      WITH rev AS (SELECT r_name, n_name,
                          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                            * 100 AS BIGINT) AS cents
                   FROM orders
                   JOIN customer ON o_custkey = c_custkey
                   JOIN nation ON c_nationkey = n_nationkey
                   JOIN region ON n_regionkey = r_regionkey
                   GROUP BY 1, 2),
      reg AS (SELECT r_name, sum(cents) AS rc FROM rev GROUP BY 1)
      SELECT rev.r_name, n_name,
             CAST(CAST(cents AS DECIMAL(20,2)) / 100 AS DECIMAL(18,2))
               AS revenue,
             round(CAST(cents AS DOUBLE) / rc, 6) AS share
      FROM rev JOIN reg ON rev.r_name = reg.r_name
      ORDER BY rev.r_name, n_name""")),

    // open-order backlog curve: per calendar day, orders opened but
    // not yet fully shipped — interval concurrency WITHOUT an
    // inequality join (map-side day explode, one day-keyed count)
    Q("q246_backlog", (s, d) => {
      import s.implicits._
      val spans = T.orders(s, d)
        .join(T.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey")
        .agg(min($"o_orderdate").as("opened"),
          max($"l_shipdate").as("closed"))
      TimeSeries.dailyConcurrency(spans, "opened", "closed")
        .orderBy($"day")
    }, Some("""
      WITH sp AS (SELECT o_orderkey,
                         CAST(min(o_orderdate) AS DATE) AS opened,
                         CAST(max(l_shipdate) AS DATE) AS closed
                  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                  GROUP BY 1),
      cal AS (SELECT unnest(generate_series(
                (SELECT min(opened) FROM sp),
                (SELECT max(closed) FROM sp),
                INTERVAL 1 DAY))::DATE AS day)
      SELECT day, count(*) AS n_open
      FROM cal JOIN sp ON sp.opened <= cal.day AND cal.day <= sp.closed
      GROUP BY 1 ORDER BY day"""))
  )
}
