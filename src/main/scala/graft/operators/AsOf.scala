package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-prior) join — the classic time-series operator Spark
  * lacks natively (SURVEY §2.2 "range/as-of [extension]").
  *
  * For every left row, attach the right row's values with the greatest
  * `rightTime <= leftTime` within the same key. Implemented by
  * composition (preference order (a) of the custom-operator ladder): tag
  * and union both sides, sort each key's timeline once, and carry the
  * last-seen right values forward with a running `last(ignoreNulls)`
  * window. The left row's own columns ride through the same union, so
  * the whole operator is ONE shuffle on the key — no row ids, no
  * self-join, no per-row probing. At 100 TB this is a single sort pass
  * per key, and the output is deterministic regardless of upstream
  * partitioning (no reliance on monotonically_increasing_id).
  */
object AsOf {

  /** @param left       probe side
    * @param right      build side (history to look back into)
    * @param key        equi-join key column present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param carryCols  right-side columns to carry (exposed as `asof_<name>`)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      carryCols: Seq[String]): DataFrame = {
    val carried = carryCols.map(c => s"asof_$c")
    val leftCols = left.columns.toSeq
    val reserved = Set("__k", "__t", "__isR") ++ carried
    val clashes = leftCols.filter(reserved.contains)
    require(clashes.isEmpty,
      s"left columns collide with asof-join internals/aliases: ${clashes.mkString(", ")}")

    val taggedRight = right.select(
      Seq(col(key).as("__k"), col(rightTime).as("__t"), lit(1).as("__isR")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        carryCols.zip(carried).map { case (c, a) => col(c).as(a) }: _*)

    val taggedLeft = left.select(
      Seq(col(key).as("__k"), col(leftTime).as("__t"), lit(0).as("__isR")) ++
        leftCols.map(col) ++
        carryCols.zip(carried).map { case (c, a) =>
          lit(null).cast(right.schema(c).dataType).as(a)
        }: _*)

    // at equal timestamps the right row sorts first, so `rt <= lt` is
    // inclusive; the carried columns break ties among right rows sharing
    // (key, timestamp) — `last` then deterministically picks the greatest
    // carried tuple run-to-run regardless of upstream partitioning
    // (column-wise when a tied row carries nulls, since `last` skips them)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t") +: col("__isR").desc +: carried.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight.unionByName(taggedLeft)
      .select(
        Seq(col("__isR")) ++ leftCols.map(col) ++
          carried.map(a => last(col(a), ignoreNulls = true).over(w).as(a)): _*)
      .filter(col("__isR") === 0)
      .select(leftCols.map(col) ++ carried.map(col): _*)
  }

  /** Forward as-of join: for every left row, the right row's values
    * with the SMALLEST `rightTime >= leftTime` within the key — the
    * next-scheduled-event lookup ([[asofJoin]] mirrored in time). Same
    * one-shuffle union-and-window shape, with the frame flipped to
    * `currentRow..unboundedFollowing` and a `first(ignoreNulls)` carry:
    * at equal timestamps the LEFT row sorts first, so `rt >= lt` is
    * inclusive; ties among right rows sharing (key, time) resolve to
    * the smallest carried tuple, deterministically. */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      carryCols: Seq[String]): DataFrame = {
    val carried = carryCols.map(c => s"asof_$c")
    val leftCols = left.columns.toSeq
    val reserved = Set("__k", "__t", "__isR") ++ carried
    val clashes = leftCols.filter(reserved.contains)
    require(clashes.isEmpty,
      s"left columns collide with asof-join internals/aliases: ${clashes.mkString(", ")}")

    val taggedRight = right.select(
      Seq(col(key).as("__k"), col(rightTime).as("__t"), lit(1).as("__isR")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        carryCols.zip(carried).map { case (c, a) => col(c).as(a) }: _*)

    val taggedLeft = left.select(
      Seq(col(key).as("__k"), col(leftTime).as("__t"), lit(0).as("__isR")) ++
        leftCols.map(col) ++
        carryCols.zip(carried).map { case (c, a) =>
          lit(null).cast(right.schema(c).dataType).as(a)
        }: _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t") +: col("__isR").asc +: carried.map(col): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    taggedRight.unionByName(taggedLeft)
      .select(
        Seq(col("__isR")) ++ leftCols.map(col) ++
          carried.map(a => first(col(a), ignoreNulls = true).over(w).as(a)): _*)
      .filter(col("__isR") === 0)
      .select(leftCols.map(col) ++ carried.map(col): _*)
  }
}
