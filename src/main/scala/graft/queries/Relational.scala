package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.{Tables => T}

/** Relational / aggregation operator suite (SURVEY §2.2 mapping table).
  *
  * Each query is the Spark-native expression of one operator category:
  * scan+filter+project, hash aggregation, shuffle joins, broadcast joins,
  * semi/anti joins, window functions, sort/limit, set ops, rollup/cube,
  * scalar functions. All doubles that pass through an order-dependent
  * aggregation are rounded identically on both the Spark and oracle side so
  * floating-point summation order cannot flip the hash compare; per-row
  * arithmetic is left unrounded (IEEE-exact in both engines).
  *
  * Scale posture: dimension joins (region/nation/supplier/customer) are
  * explicit `broadcast()`; fact-fact joins shuffle on their keys and rely on
  * AQE for skew; every aggregation is a partial+final hash agg planned by
  * Catalyst (map-side combine comes free).
  */
object Relational {

  private def ts(s: String) = lit(s).cast("timestamp")

  val all: Seq[Q] = Seq(

    // --- scan / filter / project / aggregate -----------------------------
    Q("q01_agg", (s, d) => {
      import s.implicits._
      // exact money arithmetic in integer CENTS (the q332/q355 pattern):
      // the fixture's 2-dp doubles become exact longs via round(x·100),
      // every sum is a codegen-primitive long reduction (no Decimal
      // boxing on the suite's hottest aggregate), and one double
      // division at the end restores dollars. Scaled units: price 1e-2;
      // disc_price 1e-4 (cents × (100−d)); charge 1e-6 (× (100+t)).
      // Headroom: |charge| ≈ 1e11/row, so the long accumulator is exact
      // past 10⁷ rows per group per partial — beyond that, widen the
      // charge lane to decimal(25,0) (same per-row longs, wider fold).
      val cents = round($"l_extendedprice" * 100).cast("long")
      val d100 = round($"l_discount" * 100).cast("long")
      val t100 = round($"l_tax" * 100).cast("long")
      T.lineitem(s, d)
        .filter($"l_shipdate" <= ts("1998-09-01"))
        .select($"l_returnflag", $"l_linestatus",
          $"l_quantity".cast("long").as("__q"), cents.as("__c"),
          d100.as("__d"), t100.as("__t"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"__q").cast("double"), 2).as("sum_qty"),
          round(sum($"__c").cast("double") / 100.0, 2).as("sum_base_price"),
          round(sum($"__c" * (lit(100L) - $"__d")).cast("double") / 1e4, 2).as("sum_disc_price"),
          round(sum($"__c" * (lit(100L) - $"__d") * (lit(100L) + $"__t")).cast("double") / 1e6, 2).as("sum_charge"),
          round(sum($"__q").cast("double") / count(lit(1)), 4).as("avg_qty"),
          round(sum($"__c").cast("double") / 100.0 / count(lit(1)), 4).as("avg_price"),
          round(sum($"__d").cast("double") / 100.0 / count(lit(1)), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }, Some("""
      WITH c AS (SELECT l_returnflag, l_linestatus,
               CAST(l_quantity AS BIGINT) AS q,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
               CAST(round(l_discount * 100) AS BIGINT) AS d,
               CAST(round(l_tax * 100) AS BIGINT) AS t
             FROM lineitem
             WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00')
      SELECT l_returnflag, l_linestatus,
             round(CAST(sum(q) AS DOUBLE), 2) AS sum_qty,
             round(CAST(sum(c) AS DOUBLE) / 100.0, 2) AS sum_base_price,
             round(CAST(sum(c * (100 - d)) AS DOUBLE) / 1e4, 2) AS sum_disc_price,
             round(CAST(sum(c * (100 - d) * (100 + t)) AS DOUBLE) / 1e6, 2) AS sum_charge,
             round(CAST(sum(q) AS DOUBLE) / count(*), 4) AS avg_qty,
             round(CAST(sum(c) AS DOUBLE) / 100.0 / count(*), 4) AS avg_price,
             round(CAST(sum(d) AS DOUBLE) / 100.0 / count(*), 4) AS avg_disc,
             count(*) AS count_order
      FROM c
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),

    Q("q02_filter_project", (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .filter($"l_quantity" > 45)
        .select($"l_orderkey", $"l_linenumber",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }, Some("""
      SELECT l_orderkey, l_linenumber,
             l_extendedprice * (1.0 - l_discount) AS revenue
      FROM lineitem WHERE l_quantity > 45
      ORDER BY l_orderkey, l_linenumber""")),

    // --- joins -----------------------------------------------------------
    Q("q03_join_agg", (s, d) => {
      import s.implicits._
      val cust = T.customer(s, d).filter($"c_mktsegment" === "BUILDING")
      val ord = T.orders(s, d).filter($"o_orderdate" < ts("1998-03-15"))
      val li = T.lineitem(s, d).filter($"l_shipdate" > ts("1998-03-15"))
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(round(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast("decimal(24,8)")).cast("double"), 2).as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    }, Some("""
      SELECT l_orderkey, o_orderdate, o_orderpriority,
             round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))) AS DOUBLE), 2) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10""")),

    Q("q04_multi_join", (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .join(broadcast(T.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(T.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(T.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(
          round(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast("decimal(24,8)")).cast("double"), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"r_name", $"n_name")
    }, Some("""
      SELECT r_name, n_name,
             round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))) AS DOUBLE), 2) AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name""")),

    Q("q05_broadcast_join", (s, d) => {
      import s.implicits._
      T.customer(s, d)
        .join(broadcast(T.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(T.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(count(lit(1)).as("n_customers"),
          round(sum($"c_acctbal".cast("decimal(18,2)")).cast("double"), 2).as("sum_acctbal"))
        .orderBy($"r_name")
    }, Some("""
      SELECT r_name, count(*) AS n_customers,
             round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_acctbal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""")),

    Q("q06_semi_join", (s, d) => {
      import s.implicits._
      val ord = T.orders(s, d).filter($"o_orderstatus" === "F")
      T.customer(s, d)
        .join(ord, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }, Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      ORDER BY c_custkey""")),

    Q("q07_anti_join", (s, d) => {
      import s.implicits._
      val big = T.orders(s, d).filter($"o_totalprice" > 400000)
      T.customer(s, d)
        .join(big, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    }, Some("""
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      ORDER BY c_custkey""")),

    // --- window functions ------------------------------------------------
    Q("q08_window_rank", (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      T.orders(s, d)
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rnk")
        .orderBy($"o_custkey", $"rnk")
    }, Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INT) AS rnk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        FROM orders) t
      WHERE rnk <= 3 ORDER BY o_custkey, rnk""")),

    Q("q09_window_running", (s, d) => {
      import s.implicits._
      val order = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      val frame = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.orders(s, d)
        .select($"o_custkey", $"o_orderkey", $"o_orderdate",
          // decimal window sum: DuckDB evaluates window aggregates with a
          // segment tree, so double additions happen in a different order
          // than Spark's sequential running accumulation — exact decimal
          // makes both engines order-independent
          round(sum($"o_totalprice".cast("decimal(18,2)")).over(frame).cast("double"), 2).as("running_total"),
          lag($"o_totalprice", 1).over(order).as("prev_price"),
          lead($"o_totalprice", 1).over(order).as("next_price"))
        .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
    }, Some("""
      SELECT o_custkey, o_orderkey, o_orderdate,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running_total,
             lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS prev_price,
             lead(o_totalprice, 1) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS next_price
      FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""")),

    Q("q61_ntile", (s, d) => {
      import s.implicits._
      // unique ordering (price composite) keeps bucket boundaries stable
      val ord = round($"o_totalprice" * 100).cast("long") * 10000000L + $"o_orderkey"
      val w = Window.partitionBy($"o_orderstatus").orderBy(ord)
      T.orders(s, d)
        .withColumn("quartile", ntile(4).over(w))
        .groupBy($"o_orderstatus", $"quartile")
        .agg(count(lit(1)).as("n"),
          round((sum($"o_totalprice".cast("decimal(18,2)")).cast("double") / count(lit(1))), 4).as("avg_price"))
        .orderBy($"o_orderstatus", $"quartile")
    }, Some("""
      SELECT o_orderstatus, CAST(quartile AS INT) AS quartile, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price
      FROM (SELECT o_orderstatus, o_totalprice,
                   ntile(4) OVER (PARTITION BY o_orderstatus
                     ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) * 10000000
                              + o_orderkey) AS quartile
            FROM orders) t
      GROUP BY o_orderstatus, quartile ORDER BY o_orderstatus, quartile""")),

    // --- sort / limit / set ops -----------------------------------------
    Q("q10_sort_limit", (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
        .limit(20)
    }, Some("""
      SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""")),

    Q("q11_union", (s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
      val y97 = o.filter(year($"o_orderdate") === 1997).select($"o_custkey")
      val y98 = o.filter(year($"o_orderdate") === 1998).select($"o_custkey")
      y97.union(y98).distinct().orderBy($"o_custkey")
    }, Some("""
      SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
      UNION
      SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1998
      ORDER BY o_custkey""")),

    Q("q12_intersect", (s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
      val y97 = o.filter(year($"o_orderdate") === 1997).select($"o_custkey")
      val y98 = o.filter(year($"o_orderdate") === 1998).select($"o_custkey")
      y97.intersect(y98).orderBy($"o_custkey")
    }, Some("""
      SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
      INTERSECT
      SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1998
      ORDER BY o_custkey""")),

    Q("q13_except", (s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
      val y97 = o.filter(year($"o_orderdate") === 1997).select($"o_custkey")
      val y98 = o.filter(year($"o_orderdate") === 1998).select($"o_custkey")
      y97.except(y98).orderBy($"o_custkey")
    }, Some("""
      SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
      EXCEPT
      SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1998
      ORDER BY o_custkey""")),

    // --- distinct / grouping sets ---------------------------------------
    Q("q14_distinct_agg", (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          count(lit(1)).as("n_rows"),
          round(sum($"l_quantity"), 2).as("sum_qty"))
        .orderBy($"l_returnflag")
    }, Some("""
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps,
             count(*) AS n_rows,
             round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    Q("q15_rollup", (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(round(sum($"l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }, Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    Q("q16_cube", (s, d) => {
      import s.implicits._
      T.orders(s, d)
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum($"o_totalprice".cast("decimal(18,2)")).cast("double"), 2).as("sum_price"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }, Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    Q("q63_histogram", (s, d) => {
      import s.implicits._
      T.orders(s, d)
        .groupBy(floor($"o_totalprice" / 50000).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min($"o_totalprice"), 2).as("lo"),
          round(max($"o_totalprice"), 2).as("hi"))
        .orderBy($"bucket")
    }, Some("""
      SELECT CAST(floor(o_totalprice / 50000) AS INT) AS bucket,
             count(*) AS n,
             round(min(o_totalprice), 2) AS lo,
             round(max(o_totalprice), 2) AS hi
      FROM orders GROUP BY 1 ORDER BY bucket""")),

    // exact quantiles via the sort-rank operator: the built-in exact
    // `percentile` aggregate buffers a value→count map whose size grows
    // with value cardinality — unusable for continuous measures at scale
    Q("q64_quantiles", (s, d) => {
      import s.implicits._
      val q = graft.operators.Quantiles.exactQuantiles(
        T.lineitem(s, d), Seq("l_returnflag"), "l_extendedprice", Seq(0.25, 0.5, 0.75))
      q.select($"l_returnflag",
          round($"p25", 6).as("p25"),
          round($"p50", 6).as("p50"),
          round($"p75", 6).as("p75"))
        .orderBy($"l_returnflag")
    }, Some("""
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
             round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
             round(quantile_cont(l_extendedprice, 0.75), 6) AS p75
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // --- scalar functions ------------------------------------------------
    Q("q17_string_funcs", (s, d) => {
      import s.implicits._
      T.part(s, d)
        .select($"p_partkey",
          upper($"p_brand").as("brand_u"),
          lower($"p_type").as("type_l"),
          length($"p_name").as("name_len"),
          substring($"p_name", 1, 10).as("name_pfx"),
          concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
          regexp_replace($"p_type", " ", "_").as("type_us"))
        .orderBy($"p_partkey")
    }, Some("""
      SELECT p_partkey,
             upper(p_brand) AS brand_u,
             lower(p_type) AS type_l,
             CAST(length(p_name) AS INT) AS name_len,
             substring(p_name, 1, 10) AS name_pfx,
             concat_ws('|', p_brand, p_type) AS brand_type,
             regexp_replace(p_type, ' ', '_', 'g') AS type_us
      FROM part ORDER BY p_partkey""")),

    Q("q18_date_funcs", (s, d) => {
      import s.implicits._
      T.orders(s, d)
        .groupBy(
          year($"o_orderdate").cast("int").as("o_year"),
          month($"o_orderdate").cast("int").as("o_month"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice".cast("decimal(18,2)")).cast("double"), 2).as("sum_price"))
        .orderBy($"o_year", $"o_month")
    }, Some("""
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             CAST(EXTRACT(month FROM o_orderdate) AS INT) AS o_month,
             count(*) AS n_orders,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
      FROM orders GROUP BY 1, 2 ORDER BY o_year, o_month""")),

    Q("q19_math_funcs", (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .filter($"l_orderkey" < 100)
        .select($"l_orderkey", $"l_linenumber",
          abs($"l_discount" - 0.05).as("disc_dev"),
          ceil($"l_extendedprice").cast("long").as("price_ceil"),
          floor($"l_extendedprice").cast("long").as("price_floor"),
          round(sqrt($"l_quantity"), 6).as("qty_sqrt"),
          ($"l_quantity" * $"l_quantity").as("qty_sq"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }, Some("""
      SELECT l_orderkey, l_linenumber,
             abs(l_discount - 0.05) AS disc_dev,
             CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
             CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
             round(sqrt(l_quantity), 6) AS qty_sqrt,
             l_quantity * l_quantity AS qty_sq
      FROM lineitem WHERE l_orderkey < 100
      ORDER BY l_orderkey, l_linenumber""")),

    Q("q20_case_coalesce", (s, d) => {
      import s.implicits._
      T.orders(s, d)
        .select(
          when($"o_totalprice" > 300000, "big")
            .when($"o_totalprice" > 100000, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif($"o_orderstatus", lit("O")), lit("OPEN")).as("status"))
        .groupBy($"bucket", $"status")
        .agg(count(lit(1)).as("n"))
        .orderBy($"bucket", $"status")
    }, Some("""
      SELECT CASE WHEN o_totalprice > 300000 THEN 'big'
                  WHEN o_totalprice > 100000 THEN 'mid'
                  ELSE 'small' END AS bucket,
             coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status,
             count(*) AS n
      FROM orders GROUP BY 1, 2 ORDER BY bucket, status"""))
  )
}
