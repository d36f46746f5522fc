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
  * window. One shuffle on the key, no per-row probing, no custom
  * physical operator — at 100 TB this is a single sort pass per key.
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

    val taggedRight = right.select(
      Seq(col(key).as("__k"), col(rightTime).as("__t"), lit(1).as("__isR"),
        lit(null).cast("long").as("__rowid")) ++
        carryCols.zip(carried).map { case (c, a) => col(c).as(a) }: _*)

    val withId = left.withColumn("__rowid", monotonically_increasing_id())
    val taggedLeft = withId.select(
      Seq(col(key).as("__k"), col(leftTime).as("__t"), lit(0).as("__isR"),
        col("__rowid")) ++
        carryCols.zip(carried).map { case (c, a) =>
          lit(null).cast(right.schema(c).dataType).as(a)
        }: _*)

    // at equal timestamps the right row sorts first, so `rt <= lt` is inclusive
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__isR").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val merged = taggedRight.unionByName(taggedLeft)
      .select(
        Seq(col("__isR"), col("__rowid")) ++
          carried.map(a => last(col(a), ignoreNulls = true).over(w).as(a)): _*)

    val probes = merged.filter(col("__isR") === 0)
      .select(col("__rowid") +: carried.map(col): _*)

    withId.join(probes, Seq("__rowid"), "left_outer").drop("__rowid")
  }
}
