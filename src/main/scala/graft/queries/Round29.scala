package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Scale
import graft.sources.{Tables => T}

/** Round-6 twenty-first wave: layout utilities inside the graded loop.
  */
object Round29 {

  val all: Seq[Q] = Seq(

    // the pay-the-shuffle-once layout, end to end in the oracle loop:
    // orders and lineitem written as co-bucketed sorted tables, joined
    // bucket-to-bucket (ScaleSpec proves the plan has NO Exchange),
    // aggregated decimal-exact — equal to the direct-join oracle
    Q("q247_bucketed_join", (s, d) => {
      import s.implicits._
      Scale.writeBucketed(T.orders(s, d)
        .select($"o_orderkey", $"o_orderstatus"),
        "graft_q247_orders", "o_orderkey", 8)
      Scale.writeBucketed(T.lineitem(s, d)
        .select($"l_orderkey".as("o_orderkey"), $"l_extendedprice"),
        "graft_q247_lineitem", "o_orderkey", 8)
      s.table("graft_q247_orders")
        .join(s.table("graft_q247_lineitem"), "o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_items"),
          sum($"l_extendedprice".cast("decimal(18,2)"))
            .cast("decimal(18,2)").as("revenue"))
        .orderBy($"o_orderstatus")
    }, Some("""
      SELECT o_orderstatus, count(*) AS n_items,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1 ORDER BY o_orderstatus""")),

    // partition-pruned scan, end to end: events written partitioned by
    // event_type, one partition read back (the scan touches only that
    // directory — PlanSpec pins the pruning), aggregated per day
    Q("q248_partition_prune", (s, d) => {
      import s.implicits._
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_q248"
      Scale.writePartitioned(T.events(s, d), path, Seq("event_type"))
      s.read.parquet(path)
        .filter($"event_type" === "purchase")
        .groupBy(to_date($"ts").as("day"))
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(18,2)")).cast("decimal(18,2)")
            .as("total"))
        .orderBy($"day")
    }, Some("""
      SELECT CAST(ts AS DATE) AS day, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS total
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1 ORDER BY day"""))
  )
}
