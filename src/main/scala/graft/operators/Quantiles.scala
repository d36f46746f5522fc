package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles via sort-rank, not value-count maps.
  *
  * Spark's built-in exact `percentile` aggregate accumulates a
  * value→count map per partition and merges them on the reducer — memory
  * grows with the DISTINCT-VALUE cardinality, which is unbounded for
  * continuous measures at 100 TB (and it is several times slower than a
  * sort even at sf0.1). This operator instead ranks each group's values
  * with one shuffle-sort, locates the two interpolation neighbors of
  * every requested quantile by row number, and reduces them with a
  * conditional aggregate: O(n log n) work, O(1) aggregate state, and the
  * sort is Tungsten's spillable external sort.
  *
  * Interpolation matches SQL `quantile_cont`/`percentile_cont`:
  * pos = p·(n−1)+1 (1-based), value = v_lo + (pos−lo)·(v_hi − v_lo).
  */
object Quantiles {

  /** @param df        input
    * @param groupCols grouping columns (empty = global)
    * @param valueCol  numeric column to take quantiles of (nulls dropped)
    * @param ps        quantile fractions in [0,1], each becomes column `p<frac·100>`
    */
  def exactQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[Double]): DataFrame = {
    val v = col(valueCol).cast("double")
    val rows = df.filter(v.isNotNull).select(groupCols.map(col) :+ v.as("__v"): _*)

    val counts = rows.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))

    // Rank WITHOUT a per-group window: a window partitioned by the group
    // key sorts each group on a single task, so 3 groups = 3-way
    // parallelism no matter the cluster size. Instead: range-partition on
    // (group, value) — a parallel global sort across all partitions —
    // then derive the within-group rank from a global zipWithIndex and
    // each group's first global index. Parallelism is partition-count-
    // bound, independent of group cardinality.
    val spark = df.sparkSession
    val sorted = groupCols match {
      case Nil => rows.repartitionByRange(col("__v"))
        .sortWithinPartitions(col("__v"))
      case gs => rows.repartitionByRange((gs :+ "__v").map(col): _*)
        .sortWithinPartitions((gs :+ "__v").map(col): _*)
    }
    val withIdx = {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.LongType
      val schema = sorted.schema.add("__gidx", LongType, nullable = false)
      spark.createDataFrame(
        sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
        schema)
    }
    val starts = withIdx.groupBy(groupCols.map(col): _*)
      .agg(min(col("__gidx")).as("__start"))
    val joinKeys = groupCols
    val ranked0 =
      if (joinKeys.isEmpty) withIdx.crossJoin(broadcast(starts)).crossJoin(broadcast(counts))
      else withIdx.join(starts, joinKeys).join(counts, joinKeys)
    val ranked = ranked0.withColumn("__rn", col("__gidx") - col("__start") + 1)

    def qAgg(p: Double): Column = {
      // row-level neighbor selection: every row carries its group's __n,
      // so the interpolation positions are computable inside the aggregate
      // argument (evaluated per row)
      val pos = lit(p) * (col("__n") - 1) + 1
      val lo = floor(pos)
      val hi = ceil(pos)
      val vLo = max(when(col("__rn") === lo, col("__v")))
      val vHi = max(when(col("__rn") === hi, col("__v")))
      // aggregate-level fraction: recompute pos from the group-constant n
      // (max-lifted) since non-aggregated refs are invalid post-grouping
      val posA = lit(p) * (max(col("__n")) - 1) + 1
      val frac = posA - floor(posA)
      // identical arithmetic shape to quantile_cont: lower + frac·(upper−lower)
      vLo + frac * (vHi - vLo)
    }

    val aggs = ps.map(p => qAgg(p).as(s"p${(p * 100).round}"))
    val grouped = groupCols match {
      case Nil => ranked.groupBy()
      case gs => ranked.groupBy(gs.map(col): _*)
    }
    grouped.agg(aggs.head, aggs.tail: _*)
  }
}
