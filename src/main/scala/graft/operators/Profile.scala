package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling and drift monitoring — the validation pass an
  * ingest pipeline runs on every new snapshot, and the comparison that
  * decides whether the new snapshot is safe to train on.
  */
object Profile {

  /** Per-column profile of numeric columns in ONE scan of the input
    * (q80's shape): stack-unpivot to (column, v), partial-aggregate by
    * value — map-side combine collapses repeated values before the
    * shuffle — then fold into
    * `(column, n_rows, n_nulls, n_distinct, min_v, max_v)`. Exact
    * distinct counts for every column without an Expand and without
    * one scan per column. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val stackArgs = cols.map(c => s"'$c', cast(`$c` as double)").mkString(", ")
    df.selectExpr(s"stack(${cols.length}, $stackArgs) AS (column, v)")
      .groupBy(col("column"), col("v")).agg(count(lit(1)).as("__c"))
      .groupBy(col("column")).agg(
        sum(col("__c")).as("n_rows"),
        coalesce(sum(when(col("v").isNull, col("__c"))), lit(0L)).as("n_nulls"),
        count(when(col("v").isNotNull, 1)).as("n_distinct"),
        round(min(col("v")), 6).as("min_v"),
        round(max(col("v")), 6).as("max_v"))
  }

  /** Drift report between two snapshots of the same schema: both
    * profiles joined per column with the drift signals monitoring
    * alerts on — null-fraction delta, distinct-cardinality ratio, and
    * range expansion/contraction. Two single-scan profiles + one
    * |columns|-row join; cost is two corpus scans at any scale, the
    * report itself is column-count-sized. Fractions and ratios are
    * computed to 6 places from the exact counts on both sides, so the
    * report is engine-replayable. */
  def profileDrift(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    val pa = columnProfile(a, cols)
    val pb = columnProfile(b, cols)
    val sides = Seq("a", "b")
    val renamed = Seq(pa, pb).zip(sides).map { case (p, s) =>
      p.select(col("column") +: Seq("n_rows", "n_nulls", "n_distinct",
        "min_v", "max_v").map(c => col(c).as(s"${c}_$s")): _*)
    }
    renamed.head.join(renamed.last, "column")
      .withColumn("null_frac_delta",
        round(col("n_nulls_b") / col("n_rows_b")
          - col("n_nulls_a") / col("n_rows_a"), 6))
      .withColumn("distinct_ratio",
        // all-null column on side a: ratio undefined, null (ANSI mode
        // makes an unguarded x/0 a task failure, not an Infinity)
        when(col("n_distinct_a") > 0,
          round(col("n_distinct_b") / col("n_distinct_a").cast("double"), 6)))
      .withColumn("range_delta",
        round((col("max_v_b") - col("min_v_b"))
          - (col("max_v_a") - col("min_v_a")), 6))
  }
}
