package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Quantiles
import graft.sources.{Tables => T}

/** Round-3 surface additions: the multi-column single-sort quantile
  * variant and the high-cardinality distributed quantile path, each
  * oracle-verified against DuckDB `quantile_cont`.
  */
object Round3 {

  val all: Seq[Q] = Seq(

    // several value columns' quantiles from ONE range-partitioned sort:
    // the columns are stack-unpivoted so the sort is paid once for n
    // columns — n independent sorts collapse into one shuffle
    Q("q84_quantiles_multi", (s, d) => {
      import s.implicits._
      Quantiles.exactQuantilesMulti(T.lineitem(s, d), Seq("l_returnflag"),
          Seq("l_quantity", "l_extendedprice"), Seq(0.25, 0.5, 0.75))
        .select($"l_returnflag",
          round($"l_quantity_p25", 6).as("qty_p25"),
          round($"l_quantity_p50", 6).as("qty_p50"),
          round($"l_quantity_p75", 6).as("qty_p75"),
          round($"l_extendedprice_p25", 6).as("price_p25"),
          round($"l_extendedprice_p50", 6).as("price_p50"),
          round($"l_extendedprice_p75", 6).as("price_p75"))
        .orderBy($"l_returnflag")
    }, Some("""
      SELECT l_returnflag,
             round(quantile_cont(l_quantity, 0.25), 6) AS qty_p25,
             round(quantile_cont(l_quantity, 0.50), 6) AS qty_p50,
             round(quantile_cont(l_quantity, 0.75), 6) AS qty_p75,
             round(quantile_cont(l_extendedprice, 0.25), 6) AS price_p25,
             round(quantile_cont(l_extendedprice, 0.50), 6) AS price_p50,
             round(quantile_cont(l_extendedprice, 0.75), 6) AS price_p75
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // quantiles with a HIGH-cardinality group key: the driver-histogram
    // path is forced to route to the fully distributed window plan
    // (maxDriverHistogram = 100), proving per-customer medians never
    // materialize group state on the driver
    Q("q85_quantiles_wide", (s, d) => {
      import s.implicits._
      Quantiles.exactQuantiles(T.orders(s, d), Seq("o_custkey"), "o_totalprice",
          Seq(0.5), maxDriverHistogram = 100L)
        .select($"o_custkey", round($"p50", 6).as("med_price"))
        .orderBy($"o_custkey")
    }, Some("""
      SELECT o_custkey, round(quantile_cont(o_totalprice, 0.5), 6) AS med_price
      FROM orders GROUP BY o_custkey ORDER BY o_custkey"""))
  )
}
