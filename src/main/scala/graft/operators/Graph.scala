package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on DataFrames (connected components live
  * in [[Dedup]]; this file holds the rank-propagation family).
  *
  * PageRank (Page, Brin, Motwani & Winograd 1999) with the standard
  * dangling-node fix: each iteration every node's rank splits evenly
  * over its out-edges, nodes WITHOUT out-edges donate their whole rank
  * to the uniform pool, and every node receives
  * `(1-d)/N + d·(in-contributions + danglingMass/N)`.
  *
  * Spark shape: the edge list and out-degrees are computed once and
  * cached; each iteration is one join-aggregate (shuffle keyed on dst)
  * plus a 1-row dangling-mass aggregate that stays IN the plan via a
  * broadcast cross join — no per-iteration driver collect. The plan
  * deepens linearly with iterations (fine for the single-digit counts
  * rank propagation needs to stabilize a ranking; checkpoint past
  * ~20).
  */
object Graph {

  /** Ranks after `iterations` rounds from a uniform start. Directed
    * edges; duplicate edges count once. Returns `(node, rank)`. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1): $damping")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .distinct().cache()
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst"))).distinct().cache()
    val n = nodes.count() // bounded: one scalar, once, not per iteration
    require(n > 0, "empty graph")
    val outDeg = e.groupBy(col("__src")).agg(count(lit(1)).as("__deg")).cache()

    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      val contrib = e.join(outDeg, "__src")
        .join(ranks.withColumnRenamed("node", "__src"), "__src")
        .groupBy(col("__dst").as("node"))
        .agg(sum(col("rank") / col("__deg")).as("__in"))
      // nodes with no out-edges donate their rank to the uniform pool;
      // the 1-row aggregate rides the plan as a broadcast cross join
      val dangling = ranks
        .join(outDeg.withColumnRenamed("__src", "node"), Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("__in"), lit(0.0)) + col("__dm") / n)).as("rank"))
    }
    ranks
  }
}
