package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key time-series features over event streams. */
object TimeSeries {

  /** Final exponentially-weighted moving average per key:
    * `ewma_i = (1-α)·ewma_{i-1} + α·v_i` folded over each key's events
    * in `(orderCols)` order from a 0.0 start — the classic recency-
    * weighted feature a behavior profile ships. The recurrence is
    * inherently sequential, so it runs as an `aggregate` HOF fold over
    * the key's time-sorted value array — exact sequential semantics,
    * no `pow(1/(1-α), n)` overflow trick (that formulation blows past
    * double range around 2k events/key). State is O(events per key)
    * during the aggregate; keys are independent and distribute freely.
    * `orderCols` must be unique per key for a deterministic fold.
    * Returns (key, n_events, ewma). */
  def ewmaPerKey(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val sortKey = struct(
      orderCols.map(col) :+ col(valueCol).cast("double").as("__v"): _*)
    val values = transform(array_sort(collect_list(sortKey)),
      s => s.getField("__v"))
    val fold = aggregate(values, lit(0.0),
      (acc: Column, v: Column) => acc * lit(1.0 - alpha) + v * lit(alpha))
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), round(fold, 6).as("ewma"))
  }
}
