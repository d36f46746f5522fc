package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graft.Shims

import graft.plans.{TopKPerGroup, TopKStrategy}

/** User-facing API over the custom [[graft.plans.TopKPerGroup]] operator. */
object TopK {

  /** Top-k rows per group by `orderCol` (descending by default), planned
    * as partial bounded heaps → exchange on the group keys → final heaps.
    * Output row order is unspecified, like any aggregate — sort downstream
    * if needed. Supply a unique ordering expression for deterministic
    * results under ties. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: Column,
      k: Int, desc: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    Shims.addStrategy(spark, TopKStrategy)
    val withOrd = df.withColumn("__ord", orderCol)
    val analyzed = withOrd.queryExecution.analyzed
    val out = analyzed.output
    val groupAttrs = groupCols.map(c => out.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(s"no such column: $c")))
    val ordAttr = out.find(_.name == "__ord").get
    Shims.ofRows(spark, TopKPerGroup(groupAttrs, ordAttr, k, desc, analyzed))
      .drop("__ord")
  }

  /** 2-D skyline (Pareto frontier), maximizing both `xCol` and `yCol`:
    * keeps every row no other row dominates, where `q` dominates `p`
    * iff `q.x ≥ p.x ∧ q.y ≥ p.y` with at least one strict — the
    * Börzsönyi et al. (2001) skyline operator. Duplicate extreme
    * points all survive (neither dominates the other).
    *
    * Spark shape — the 2-D case needs NO pairwise join: reduce to one
    * `max(y)` row per distinct x (one hash aggregate; this is the only
    * corpus-sized shuffle), then a single running-max pass in
    * decreasing x order decides each x-group — a group survives iff
    * its ymax strictly exceeds every ymax at strictly larger x — and
    * the survivors semi-join back to recover all tied originals. The
    * running max rides [[Scale.prefixMax]]'s range-partitioned scan
    * UNCONDITIONALLY (max is order-insensitive, so it is bit-identical
    * to the sequential window) — a continuous-valued x whose distinct
    * set is corpus-sized never serializes through one window task. */
  def skyline2DMax(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val perX = df.groupBy(col(xCol)).agg(max(col(yCol)).as("__ymax"))
    val surviving = Scale
      .prefixMax(perX, xCol, "__ymax", "__prev",
        descending = true, inclusive = false)
      .filter(col("__prev").isNull || col("__ymax") > col("__prev"))
      .select(col(xCol), col("__ymax").as(yCol))
    df.join(surviving, Seq(xCol, yCol), "left_semi")
  }

  /** Top-p (cumulative-coverage) selection per group — the nucleus-
    * sampling analog for corpus audits: per group, the SMALLEST prefix
    * of members (by descending integer weight, tie on `tieCol`) whose
    * cumulative weight reaches fraction `pNum/pDen` of the group total.
    * A member is kept iff the mass BEFORE it is still short of the
    * target, so the first member always survives and the prefix stops
    * at the first one that closes the gap.
    *
    * Determinism: weights are integers, the threshold is the rational
    * `pNum/pDen`, and the keep test is the cross-multiplied integer
    * comparison `cum_before · pDen < total · pNum` — no floating point
    * anywhere, so the selected set is identical under any partitioning
    * or engine. One hash partitioning on the group keys carries the
    * total, the prefix window, and the rank. */
  def topPByGroup(df: DataFrame, groupCols: Seq[String],
      weightCol: String, tieCol: String, pNum: Long, pDen: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    require(pNum > 0 && pDen > 0 && pNum <= pDen,
      s"p must be a fraction in (0,1]: $pNum/$pDen")
    val gcols = groupCols.map(col)
    val w = Window.partitionBy(gcols: _*)
      .orderBy(col(weightCol).desc, col(tieCol).asc)
    val wg = Window.partitionBy(gcols: _*)
    df.withColumn("__w", col(weightCol).cast("long"))
      .withColumn("__total", sum(col("__w")).over(wg))
      .withColumn("__cum", sum(col("__w")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rank", row_number().over(w))
      .filter((col("__cum") - col("__w")) * pDen < col("__total") * pNum)
      .withColumn("cum_weight", col("__cum"))
      .withColumn("total_weight", col("__total"))
      .drop("__w", "__total", "__cum")
  }
}
