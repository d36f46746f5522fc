package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Profile, Scale}
import graft.sources.{Tables => T}

/** Round-6 sixth wave: Pareto contribution analysis, correlation
  * matrix, and seasonality profiles.
  */
object Round14 {

  val all: Seq[Q] = Seq(

    // Pareto / ABC analysis: suppliers ranked by revenue with exact
    // cumulative shares and the 80% frontier — cumulative revenue from
    // the range-partitioned prefix sum over integer cents (never a
    // single-partition window), the share rounded half-up in integer
    // arithmetic and the 80% flag compared as 5·cum <= 4·total (exact)
    Q("q202_pareto", (s, d) => {
      import s.implicits._
      val rev = T.lineitem(s, d)
        .groupBy($"l_suppkey")
        .agg((sum($"l_extendedprice".cast("decimal(18,2)")) * 100)
          .cast("long").as("__cents"))
      val ordered = rev
        .withColumn("__ord", struct((-$"__cents").as("c"),
          $"l_suppkey".as("k")))
        .withColumn("__one", lit(1))
      val cum = Scale.prefixSum(
        Scale.prefixSum(ordered, "__ord", "__cents", "__cum"),
        "__ord", "__one", "rank")
      val total = rev.agg(sum($"__cents").as("__tot"))
      cum.crossJoin(broadcast(total))
        .select($"l_suppkey", $"rank",
          round(($"__cents" / 100.0), 2).as("revenue"),
          (expr("(2 * __cum * 1000000 + __tot) div (2 * __tot)")
            / lit(1000000.0)).as("cum_share"),
          ($"__cum" * 5 <= $"__tot" * 4).as("is_top80"))
        .orderBy($"rank")
    }, Some("""
      WITH rev AS (SELECT l_suppkey,
                          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                            * 100 AS BIGINT) AS cents
                   FROM lineitem GROUP BY 1),
      w AS (SELECT l_suppkey, cents,
                   row_number() OVER (ORDER BY cents DESC, l_suppkey)
                     AS rank,
                   sum(cents) OVER (ORDER BY cents DESC, l_suppkey)
                     AS cum,
                   sum(cents) OVER () AS tot
            FROM rev)
      SELECT l_suppkey, rank, round(cents / 100.0, 2) AS revenue,
             ((2 * cum * 1000000 + tot) // (2 * tot)) / 1000000.0
               AS cum_share,
             cum * 5 <= tot * 4 AS is_top80
      FROM w ORDER BY rank""")),

    // multicollinearity screen: pairwise Pearson over the four lineitem
    // measures — centered two-pass moments (the one-pass closed form
    // cancels on large-mean columns), two single-row aggregate folds
    Q("q203_corr_matrix", (s, d) => {
      import s.implicits._
      Profile.corrMatrix(T.lineitem(s, d),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy($"col_a", $"col_b")
    }, Some("""
      WITH m AS (SELECT count(*) AS n,
                        avg(l_quantity) AS mq, avg(l_extendedprice) AS me,
                        avg(l_discount) AS md, avg(l_tax) AS mt
                 FROM lineitem),
      s AS (SELECT max(n) AS n,
                   sum((l_quantity - mq) * (l_extendedprice - me)) AS qe,
                   sum((l_quantity - mq) * (l_discount - md)) AS qd,
                   sum((l_quantity - mq) * (l_tax - mt)) AS qt,
                   sum((l_extendedprice - me) * (l_discount - md)) AS ed,
                   sum((l_extendedprice - me) * (l_tax - mt)) AS et,
                   sum((l_discount - md) * (l_tax - mt)) AS dt,
                   sum((l_quantity - mq) * (l_quantity - mq)) AS qq,
                   sum((l_extendedprice - me) * (l_extendedprice - me))
                     AS ee,
                   sum((l_discount - md) * (l_discount - md)) AS dd,
                   sum((l_tax - mt) * (l_tax - mt)) AS tt
            FROM lineitem, m)
      SELECT * FROM (
        SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n,
               round(qe / sqrt(qq * ee), 6) AS corr FROM s
        UNION ALL SELECT 'l_quantity', 'l_discount', n,
               round(qd / sqrt(qq * dd), 6) FROM s
        UNION ALL SELECT 'l_quantity', 'l_tax', n,
               round(qt / sqrt(qq * tt), 6) FROM s
        UNION ALL SELECT 'l_extendedprice', 'l_discount', n,
               round(ed / sqrt(ee * dd), 6) FROM s
        UNION ALL SELECT 'l_extendedprice', 'l_tax', n,
               round(et / sqrt(ee * tt), 6) FROM s
        UNION ALL SELECT 'l_discount', 'l_tax', n,
               round(dt / sqrt(dd * tt), 6) FROM s)
      ORDER BY col_a, col_b""")),

    // day-of-week seasonality profile: per (event_type, weekday) mean
    // value and its deviation from the type's overall mean — two hash
    // aggregates joined on the |types|-sized key
    Q("q204_seasonality", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d).select($"event_type",
        dayofweek($"ts").as("dow"), $"value")
      val cell = ev.groupBy($"event_type", $"dow")
        .agg(count(lit(1)).as("n"), avg($"value").as("__mean"))
      val overall = ev.groupBy($"event_type")
        .agg(avg($"value").as("__tmean"))
      cell.join(overall, "event_type")
        .select($"event_type", $"dow", $"n",
          round($"__mean", 6).as("mean_value"),
          round($"__mean" - $"__tmean", 6).as("dev_from_type_mean"))
        .orderBy($"event_type", $"dow")
    }, Some("""
      WITH e AS (SELECT event_type, dayofweek(ts) + 1 AS dow, value
                 FROM events),
      c AS (SELECT event_type, dow, count(*) AS n, avg(value) AS m
            FROM e GROUP BY 1, 2),
      o AS (SELECT event_type, avg(value) AS tm FROM e GROUP BY 1)
      SELECT event_type, dow, n, round(m, 6) AS mean_value,
             round(m - tm, 6) AS dev_from_type_mean
      FROM c JOIN o USING (event_type)
      ORDER BY event_type, dow""")),

    // a NAIVE pure range join (no equi key — Spark's only physical
    // choice is a nested loop) written exactly as a user would, made
    // scale-safe by the injected RangeJoinRewriteRule: bin equi-join +
    // exact residual. RangeJoinRewriteSpec proves bit-equality with the
    // nested-loop plan; PlanSpec pins the rewritten shape
    Q("q205_range_join_auto", (s, d) => {
      import s.implicits._
      org.apache.spark.sql.graft.Shims.addOptimization(s,
        graft.plans.RangeJoinRewriteRule)
      s.conf.set("spark.graft.rangeJoin.binWidth", "500")
      val bands = T.part(s, d).select($"p_partkey",
        ($"p_retailprice" * 50).as("lo"),
        ($"p_retailprice" * 50 + 200).as("hi"))
      val orders = T.orders(s, d).select($"o_orderkey", $"o_totalprice")
      orders.join(bands, $"o_totalprice" >= $"lo" && $"o_totalprice" <= $"hi")
        .groupBy($"p_partkey")
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice".cast("decimal(18,2)")).cast("double"), 2)
            .as("sum_in_band"))
        .orderBy($"p_partkey")
    }, Some("""
      SELECT p_partkey, count(*) AS n_orders,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
               2) AS sum_in_band
      FROM orders JOIN part
        ON o_totalprice >= p_retailprice * 50
       AND o_totalprice <= p_retailprice * 50 + 200
      GROUP BY 1 ORDER BY p_partkey"""))
  )
}
