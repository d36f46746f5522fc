package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture application — MERGE INTO re-expressed as a plain
  * shuffle: apply a feed of keyed upserts and deletes to a base snapshot
  * and produce the next snapshot. The lakehouse primitive behind dataset
  * versioning (a training corpus is re-released as base + change feeds,
  * not rewritten from scratch).
  *
  * Semantics (per key, matching SQL MERGE):
  *   - change op 'U' (upsert): the change row replaces the base row, or
  *     inserts if the key is absent;
  *   - change op 'D' (delete): the key disappears from the snapshot;
  *   - keys untouched by the feed pass through unchanged;
  *   - multiple changes per key resolve by highest `seqCol` (latest
  *     wins); ties on seq are rejected nowhere — the caller owns feed
  *     ordering, we just take max.
  *
  * Execution: union (base tagged seq = -infinity) with the feed, one
  * hash shuffle on the key, keep each key's max-seq row, drop deletes.
  * No join at all — a single exchange + aggregate-free window, the
  * minimal movement for a full-snapshot merge at 100 TB. The window is
  * row_number over (key; seq desc), which AQE handles like any keyed
  * shuffle (skewed hot keys would need salting only if one key received
  * millions of changes — not a CDC shape).
  */
object Merge {

  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      opCol: String, seqCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    import org.apache.spark.sql.expressions.Window
    val dataCols = base.columns.toSeq
    require(dataCols.forall(changes.columns.contains),
      s"changes must carry every base column; missing ${dataCols.filterNot(changes.columns.contains)}")
    // base rows sort below every change row: Long.MinValue sentinel seq
    val tagged = base
      .select(dataCols.map(col) :+ lit("U").as("__op") :+ lit(Long.MinValue).as("__seq"): _*)
      .unionByName(changes.select(
        dataCols.map(col) :+ col(opCol).as("__op") :+ col(seqCol).cast("long").as("__seq"): _*))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__seq").desc)
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("__op") =!= "D")
      .select(dataCols.map(col): _*)
  }
}
