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

  /** Snapshot diff — what changed between two dataset versions: per key,
    * `added` / `removed` / `changed` / `unchanged` (null-safe column
    * compare via `<=>`, so NULL→value and value→NULL count as changes).
    * The audit complement of [[applyChanges]]: diff(base, applyChanges
    * (base, feed)) recovers the feed's effect. One full-outer hash join
    * on the key — the minimal movement to compare snapshots at 100 TB;
    * both sides shuffle once, nothing collects. */
  def snapshotDiff(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(a.columns.sorted.sameElements(b.columns.sorted),
      s"snapshots must share a schema: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val dataCols = a.columns.toSeq.filterNot(keyCols.contains)
    // presence markers: data columns can be legitimately NULL, so NULL
    // on the join output cannot mean "side absent" by itself
    val l = a.select(keyCols.map(col) ++ dataCols.map(c => col(c).as(s"__l_$c"))
      :+ lit(true).as("__l"): _*)
    val r = b.select(keyCols.map(col) ++ dataCols.map(c => col(c).as(s"__r_$c"))
      :+ lit(true).as("__r"): _*)
    val changed = dataCols.map(c => !(col(s"__l_$c") <=> col(s"__r_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    l.join(r, keyCols, "full_outer")
      .withColumn("change",
        when(col("__r").isNull, "removed")
          .when(col("__l").isNull, "added")
          .when(changed, "changed")
          .otherwise("unchanged"))
      .select(keyCols.map(col) :+ col("change"): _*)
  }

  private def bucketOf(keyCols: Seq[String], buckets: Int) =
    pmod(xxhash64(keyCols.map(col): _*), lit(buckets.toLong)).cast("int")

  /** Write `df` as a key-hash-bucketed snapshot layout:
    * `path/__bucket=N/…` directory partitions. The layout exists so
    * [[applyChangesBucketed]] can rewrite ONLY the buckets a change feed
    * touches — at 100 TB a CDC batch touches a tiny key set, and
    * rewriting the whole snapshot per batch (the naive plain-parquet
    * MERGE) is exactly the non-scalable shape to avoid. */
  def writeBucketedSnapshot(df: DataFrame, path: String, keyCols: Seq[String],
      buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    df.withColumn("__bucket", bucketOf(keyCols, buckets))
      .write.partitionBy("__bucket").mode("overwrite").parquet(path)
  }

  /** Apply a change feed to a bucketed snapshot IN PLACE, touching only
    * the affected buckets: changes map to their key buckets, the ≤
    * `buckets` distinct affected ids collect to the driver, the snapshot
    * is read WITH a bucket partition filter (partition pruning — the
    * untouched corpus is never opened), merged via [[applyChanges]], and
    * the rewritten buckets swap in directory-by-directory with the same
    * crash-safe rename-aside protocol as `Scale.compact` (at every step
    * each bucket's full data exists under a well-known name).
    *
    * This is the Delta/Iceberg MERGE access pattern on plain parquet:
    * per-batch cost scales with the touched buckets, not the snapshot.
    * Crash safety: every bucket's full data always exists under either
    * its live name or its `.old` name, and the NEXT apply begins by
    * recovering interrupted swaps (restoring `.old` when the live dir is
    * missing — that batch's merge is lost and must be replayed — and
    * dropping it when the swap had completed). Readers racing a swap can
    * briefly see a bucket mid-rename — a transaction log is the cure and
    * is out of scope.
    */
  def applyChangesBucketed(path: String, changes: DataFrame,
      keyCols: Seq[String], opCol: String, seqCol: String,
      buckets: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = changes.sparkSession
    val base = path.stripSuffix("/")
    val fs = new Path(base).getFileSystem(spark.sessionState.newHadoopConf())
    // recover any interrupted swap BEFORE reading: a crash between the
    // rename-aside and the rename-in leaves a bucket's only copy at its
    // hidden `.old` name, where the reader would silently see an empty
    // bucket (and the blind delete below would then destroy the data).
    // Recovery: live dir missing -> restore the old copy (that batch's
    // merge was lost and must be replayed); live present -> the swap
    // completed, the old copy is stale
    fs.listStatus(new Path(base)).foreach { f =>
      val n = f.getPath.getName
      if (n.startsWith(".__bucket=") && n.endsWith(".old")) {
        val live = new Path(base, n.stripPrefix(".").stripSuffix(".old"))
        if (!fs.exists(live))
          require(fs.rename(f.getPath, live), s"recovery rename ${f.getPath} -> $live failed")
        else fs.delete(f.getPath, true)
      }
    }
    val withB = changes.withColumn("__bucket", bucketOf(keyCols, buckets))
    val affected = withB.select(col("__bucket")).distinct()
      .collect().map(_.getInt(0)).sorted
    if (affected.isEmpty) return
    val snap = spark.read.parquet(path)
      .filter(col("__bucket").isin(affected.map(Integer.valueOf).toSeq: _*))
    val merged = applyChanges(snap, withB, keyCols, opCol, seqCol)
    val tmp = base + ".merge_tmp"
    merged.write.partitionBy("__bucket").mode("overwrite").parquet(tmp)
    affected.foreach { b =>
      val live = new Path(s"$base/__bucket=$b")
      val next = new Path(s"$tmp/__bucket=$b")
      // no .old can exist here: the recovery pass at entry cleared them
      val old = new Path(s"$base/.__bucket=$b.old")
      if (fs.exists(live))
        require(fs.rename(live, old), s"rename $live -> $old failed")
      // a bucket with every row deleted has no output directory — the
      // rename-away above already removed it from the live layout
      if (fs.exists(next))
        require(fs.rename(next, live), s"rename $next -> $live failed; old at $old")
      fs.delete(old, true)
    }
    fs.delete(new Path(tmp), true)
  }
}
