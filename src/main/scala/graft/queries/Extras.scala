package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import graft.sources.{Tables => T}
import graft.operators.TopK

/** Coverage extras for SURVEY §2.2's remaining rows: outer joins,
  * array/map/struct scalar functions, a typed custom Aggregator (UDAF),
  * pivot, and the SQL entry point.
  */
object Extras {

  /** Typed weighted-mean Aggregator — the engine's UDAF surface
    * (SURVEY §2.2 "UDF/UDAF/UDTF"; `Aggregator[IN, BUF, OUT]`). */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2) // (Σ x·w, Σ w); in = (x, weight)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Double, Double)): Double = r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  private val priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  val all: Seq[Q] = Seq(

    Q("q42_left_outer_join", (s, d) => {
      import s.implicits._
      val big = T.lineitem(s, d).filter($"l_quantity" > 49)
        .groupBy($"l_orderkey")
        .agg(count(lit(1)).as("n_big"), round(sum($"l_quantity"), 2).as("big_qty"))
      T.orders(s, d)
        .join(big, $"o_orderkey" === $"l_orderkey", "left_outer")
        .select($"o_orderkey",
          coalesce($"n_big", lit(0L)).as("n_big"),
          coalesce($"big_qty", lit(0.0)).as("big_qty"))
        .orderBy($"o_orderkey")
    }, Some("""
      SELECT o_orderkey, coalesce(n_big, 0) AS n_big,
             coalesce(big_qty, 0.0) AS big_qty
      FROM orders LEFT JOIN (
        SELECT l_orderkey, count(*) AS n_big,
               round(sum(l_quantity), 2) AS big_qty
        FROM lineitem WHERE l_quantity > 49 GROUP BY 1) t
        ON o_orderkey = l_orderkey
      ORDER BY o_orderkey""")),

    Q("q43_full_outer_join", (s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
      val a = o.filter(year($"o_orderdate") === 1997)
        .groupBy($"o_custkey").agg(count(lit(1)).as("n97"))
      val b = o.filter(year($"o_orderdate") === 1998)
        .groupBy($"o_custkey").agg(count(lit(1)).as("n98"))
      a.join(b, Seq("o_custkey"), "full_outer")
        .select($"o_custkey",
          coalesce($"n97", lit(0L)).as("n97"),
          coalesce($"n98", lit(0L)).as("n98"))
        .orderBy($"o_custkey")
    }, Some("""
      SELECT o_custkey, coalesce(n97, 0) AS n97, coalesce(n98, 0) AS n98
      FROM (SELECT o_custkey, count(*) AS n97 FROM orders
            WHERE EXTRACT(year FROM o_orderdate) = 1997 GROUP BY 1) a
      FULL JOIN (SELECT o_custkey, count(*) AS n98 FROM orders
                 WHERE EXTRACT(year FROM o_orderdate) = 1998 GROUP BY 1) b
      USING (o_custkey)
      ORDER BY o_custkey""")),

    Q("q44_array_funcs", (s, d) => {
      import s.implicits._
      val arr = array($"p_size", $"p_size" * 2, lit(7))
      // array outputs serialized to strings: nested types don't survive
      // the oracle's row-sort canonicalization
      T.part(s, d)
        .select($"p_partkey",
          array_join(sort_array(arr), ",").as("arr_sorted"),
          array_contains(arr, 7).as("has7"),
          element_at(arr, 2).as("second"),
          array_join(slice(arr, 1, 2), ",").as("first2"),
          element_at(map(lit("sz"), $"p_size"), "sz").as("sz_val"),
          struct($"p_brand".as("b"), $"p_size".as("sz")).getField("b").as("brand_fld"))
        .orderBy($"p_partkey")
    }, Some("""
      SELECT p_partkey,
             array_to_string(list_sort([p_size, p_size * 2, 7]), ',') AS arr_sorted,
             list_contains([p_size, p_size * 2, 7], 7) AS has7,
             [p_size, p_size * 2, 7][2] AS second,
             array_to_string([p_size, p_size * 2, 7][1:2], ',') AS first2,
             MAP{'sz': p_size}['sz'][1] AS sz_val,
             struct_pack(b := p_brand, sz := p_size).b AS brand_fld
      FROM part ORDER BY p_partkey""")),

    Q("q45_custom_agg", (s, d) => {
      import s.implicits._
      val wavg = udaf(WeightedMean)
      T.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(round(wavg($"l_extendedprice", $"l_quantity"), 4).as("wavg_price"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    }, Some("""
      SELECT l_returnflag,
             round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    Q("q46_pivot", (s, d) => {
      import s.implicits._
      val pivoted = T.orders(s, d)
        .groupBy($"o_orderstatus")
        .pivot("o_orderpriority", priorities)
        .count()
      pivoted.select(col("o_orderstatus") +:
          priorities.map(p => coalesce(col(s"`$p`"), lit(0L)).as(p)): _*)
        .orderBy($"o_orderstatus")
    }, Some(
      "SELECT o_orderstatus, " + priorities.map(p =>
        s"""count(*) FILTER (WHERE o_orderpriority = '$p') AS "$p"""").mkString(", ") +
        " FROM orders GROUP BY 1 ORDER BY o_orderstatus")),

    Q("q51_string_agg", (s, d) => {
      import s.implicits._
      // deterministic listagg: sort collected values before joining
      T.orders(s, d).filter($"o_custkey" < 50)
        .groupBy($"o_orderstatus")
        .agg(concat_ws("|", array_sort(collect_list($"o_orderpriority"))).as("prios"),
          count(lit(1)).as("n"))
        .orderBy($"o_orderstatus")
    }, Some("""
      SELECT o_orderstatus,
             string_agg(o_orderpriority, '|' ORDER BY o_orderpriority) AS prios,
             count(*) AS n
      FROM orders WHERE o_custkey < 50
      GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    Q("q52_stats_agg", (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          round(corr($"l_quantity", $"l_extendedprice"), 6).as("qp_corr"),
          round(covar_samp($"l_quantity", $"l_extendedprice"), 2).as("qp_covar"),
          round(var_samp($"l_quantity"), 6).as("qty_var"),
          round(stddev_samp($"l_extendedprice"), 4).as("price_sd"))
        .orderBy($"l_returnflag")
    }, Some("""
      SELECT l_returnflag,
             round(corr(l_quantity, l_extendedprice), 6) AS qp_corr,
             round(covar_samp(l_quantity, l_extendedprice), 2) AS qp_covar,
             round(var_samp(l_quantity), 6) AS qty_var,
             round(stddev_samp(l_extendedprice), 4) AS price_sd
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    Q("q54_grouping_sets", (s, d) => {
      T.lineitem(s, d).createOrReplaceTempView("li_v")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        FROM li_v
        GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
    }, Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(grouping(l_returnflag) AS INT) AS g_flag,
             CAST(grouping(l_linestatus) AS INT) AS g_status,
             count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    Q("q53_minmax_by", (s, d) => {
      import s.implicits._
      // exact integer composite (price has 2 decimals) so ties break on
      // orderkey identically in both engines
      val key = (round($"o_totalprice" * 100).cast("long") * 10000000L + $"o_orderkey")
      T.orders(s, d)
        .groupBy($"o_custkey")
        .agg(max_by($"o_orderkey", key).as("best_order"),
          min_by($"o_orderkey", key).as("worst_order"),
          count(lit(1)).as("n"))
        .orderBy($"o_custkey")
    }, Some("""
      SELECT o_custkey,
             arg_max(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey) AS best_order,
             arg_min(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey) AS worst_order,
             count(*) AS n
      FROM orders GROUP BY o_custkey ORDER BY o_custkey""")),

    // deterministic "sample": portable multiplicative hash on the key —
    // the reproducible systematic-sampling pattern for pipeline debugging
    Q("q55_det_sample", (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        // low-31-bit mask before the multiply: overflow-proof under ANSI
        // (see Mixing.slotOf); identity for keys below 2^31
        .filter((pmod($"l_orderkey", lit(2147483648L)) * 2654435761L) % 100 < 10)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
        .orderBy($"l_returnflag")
    }, Some("""
      SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem WHERE ((l_orderkey % 2147483648) * 2654435761) % 100 < 10
      GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // exact decimal arithmetic: no fp rounding needed on either side
    Q("q56_decimal", (s, d) => {
      import s.implicits._
      val dec = $"l_extendedprice".cast("decimal(12,2)")
      T.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(sum(dec).as("sum_price_exact"),
          max(dec).as("max_price_exact"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    }, Some("""
      SELECT l_returnflag,
             sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sum_price_exact,
             max(CAST(l_extendedprice AS DECIMAL(12,2))) AS max_price_exact,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    Q("q57_date_arith", (s, d) => {
      import s.implicits._
      T.orders(s, d).filter($"o_orderkey" < 2000)
        .select($"o_orderkey",
          date_add($"o_orderdate", 30).as("due_date"),
          datediff($"o_orderdate", lit("1970-01-01").cast("date")).as("epoch_days"),
          quarter($"o_orderdate").cast("int").as("q"),
          dayofmonth($"o_orderdate").cast("int").as("dom"))
        .orderBy($"o_orderkey")
    }, Some("""
      SELECT o_orderkey,
             CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
             CAST(datediff('day', DATE '1970-01-01', o_orderdate) AS INT) AS epoch_days,
             CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS q,
             CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dom
      FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""")),

    Q("q58_scalar_subquery", (s, d) => {
      T.customer(s, d).createOrReplaceTempView("customer_v")
      s.sql("""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer_v
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_v)
        ORDER BY c_custkey""")
    }, Some("""
      SELECT c_custkey, c_name, c_acctbal
      FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
      ORDER BY c_custkey""")),

    // custom physical operator: bounded-heap top-k per group (partial →
    // exchange → final), verified against the window-function oracle
    Q("q59_topk_custom", (s, d) => {
      import s.implicits._
      val ord = round($"o_totalprice" * 100).cast("long") * 10000000L + $"o_orderkey"
      TopK.topKPerGroup(T.orders(s, d), Seq("o_custkey"), ord, k = 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_custkey", $"o_orderkey")
    }, Some("""
      SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                 PARTITION BY o_custkey
                 ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) * 10000000
                          + o_orderkey DESC) AS rn
        FROM orders) t
      WHERE rn <= 3 ORDER BY o_custkey, o_orderkey""")),

    Q("q47_sparksql", (s, d) => {
      T.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem_v
        WHERE l_quantity < 24 AND l_discount BETWEEN 0.05 AND 0.07""")
    }, Some("""
      SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      FROM lineitem
      WHERE l_quantity < 24 AND l_discount BETWEEN 0.05 AND 0.07"""))
  )
}
