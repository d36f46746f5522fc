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
  *     wins). Ties on seq tiebreak deterministically by op ('D' before
  *     'U', so a tied delete wins) — but equal-seq changes for one key
  *     are a malformed feed (the caller owns sequencing), and two tied
  *     'U' rows with different payloads still resolve arbitrarily;
  *   - a change row with seqCol == Long.MinValue is rejected at run
  *     time (raise_error): that value is the internal base-row sentinel
  *     and would make base-vs-change resolution ambiguous.
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
      opCol: String, seqCol: String, evolveSchema: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    import org.apache.spark.sql.expressions.Window
    val baseCols = base.columns.toSeq
    require(baseCols.forall(changes.columns.contains),
      s"changes must carry every base column; missing ${baseCols.filterNot(changes.columns.contains)}")
    // schema evolution: columns the feed carries beyond the base schema
    // widen the snapshot — base rows null-pad them (the lakehouse
    // mergeSchema write). Off by default: extra feed columns are
    // metadata and drop silently
    val newCols =
      if (!evolveSchema) Seq.empty
      else changes.columns.toSeq
        .filterNot(c => baseCols.contains(c) || c == opCol || c == seqCol)
    val dataCols = baseCols ++ newCols
    val paddedBase =
      if (newCols.isEmpty) base
      else base.select(baseCols.map(col) ++ newCols.map(c =>
        lit(null).cast(changes.schema(c).dataType).as(c)): _*)
    // base rows sort below every change row: Long.MinValue sentinel seq.
    // A feed row carrying the sentinel itself would tie the base row, so
    // it fails fast (codegen'd per-row check, no extra pass)
    val seqExpr = col(seqCol).cast("long")
    val guardedSeq = when(seqExpr === Long.MinValue,
      raise_error(concat(lit(s"change $seqCol == Long.MinValue collides with the base-row sentinel for key "),
        concat_ws(",", keyCols.map(k => col(k).cast("string")): _*)))
      .cast("long")).otherwise(seqExpr)
    val tagged = paddedBase
      .select(dataCols.map(col) :+ lit("U").as("__op") :+ lit(Long.MinValue).as("__seq"): _*)
      .unionByName(changes.select(
        dataCols.map(col) :+ col(opCol).as("__op") :+ guardedSeq.as("__seq"): _*))
    // secondary key __op: equal-seq ties resolve the same way on every
    // run and partitioning ('D' < 'U' — a tied delete wins)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__seq").desc, col("__op"))
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

  /** Slowly-changing-dimension Type 2 history build: collapse an
    * ordered change feed into validity intervals — one row per run of
    * consecutive identical `attrCols` values per key, carrying
    * `valid_from` (first `tsCol` of the run), `valid_to` (start of the
    * next run, NULL while current) and `is_current`. The dimension
    * table a warehouse keeps so fact rows can join "the attributes as
    * of then" (Kimball's SCD2), built here from a raw feed in one pass.
    *
    * Classic gaps-and-islands: a null-safe struct compare against the
    * previous row flags run starts, a running sum numbers the runs, a
    * per-run aggregate takes the first timestamp, and `lead` closes
    * each interval. All four steps share one (key, order) sort, so the
    * whole build is ONE keyed shuffle + one WindowExec pass + one
    * partial-aggregated reduce; per-key state is a row, keys
    * distribute freely. `tieCols` must make (tsCol, tieCols) unique
    * per key — runs and interval bounds are then deterministic under
    * any partition order. */
  def scd2(feed: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
      tsCol: String, tieCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keyCols.nonEmpty, "need at least one key column")
    require(attrCols.nonEmpty, "need at least one tracked attribute")
    val ord = (col(tsCol) +: tieCols.map(col)).toSeq
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val attrs = struct(attrCols.map(col): _*)
    // <=> is null-safe: the first row per key (lag = NULL struct) and
    // NULL-valued attributes both compare correctly
    val runStart = when(attrs <=> lag(attrs, 1).over(w), 0L).otherwise(1L)
    val runs = feed
      .withColumn("__run", sum(runStart)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((keyCols.map(col) :+ col("__run")) ++ attrCols.map(col): _*)
      .agg(min(col(tsCol)).as("valid_from"))
    val wk = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wk))
      .withColumn("is_current", col("valid_to").isNull)
      .select(keyCols.map(col) ++ attrCols.map(col) :+
        col("valid_from") :+ col("valid_to") :+ col("is_current"): _*)
  }

  private def bucketOf(keyCols: Seq[String], buckets: Int) =
    pmod(xxhash64(keyCols.map(col): _*), lit(buckets.toLong)).cast("int")

  // ——— snapshot manifest (transaction-log lite) ———————————————————————
  // `_manifest.json` at the snapshot root records, per bucket, the row
  // count, an order-independent content checksum (bit-XOR of xxhash64
  // over the data columns in sorted-name order), and the exact file
  // list (name + length). It serves two purposes:
  //   1. readers ([[readBucketedSnapshot]]) can detect a bucket caught
  //      mid-swap (live files disagree with the manifest) and retry
  //      instead of silently reading a hole — closing the documented
  //      race of the rename-based swap;
  //   2. a red end-to-end checksum now names WHICH bucket diverged
  //      (the per-bucket rows+checksum are on disk after every apply).
  // The manifest commits atomically (write `.tmp`, delete, rename); it
  // always lands AFTER the bucket swaps, so mid-apply readers validate
  // against the previous manifest and keep retrying until the commit.
  // A crash between the swaps and the manifest commit leaves the
  // manifest one apply behind — readers fail closed, and the next
  // apply heals stale entries by re-deriving them from the live data.
  //
  // ——— determinism audit (round 6, for the q108/q119 driver flake) ————
  // Every surface that could make two runs of the bucketed-CDC path
  // disagree, and why each is pinned:
  //   1. Merge resolution (applyChanges): row_number over
  //      (key; __seq desc, __op asc) — a TOTAL order for any feed with
  //      at most one change row per (key, seq): the base row carries the
  //      MinValue sentinel, so base-vs-change and D-vs-U both order
  //      deterministically under any partitioning (spec: "as-of reads
  //      reproduce every version exactly"). Equal-seq same-op duplicate
  //      payload rows are the one documented arbitrary case; q108/q119
  //      feeds emit one change row per key by construction.
  //   2. Bucket iteration / manifest bytes: swap loop walks `affected`
  //      SORTED; writeManifest sorts buckets, history (bucket, since)
  //      and commit_times keys — manifest bytes are a function of
  //      content only. Checksums are bit-XOR of xxhash64 rows, invariant
  //      to row/file/partition order (spec: "manifest bucket checksums
  //      are invariant to input partitioning and row order").
  //   3. Wall-clock commit stamps: used ONLY by readSnapshotAsOfTime
  //      (q119 travels by seq, not time); same-ms ties resolve to
  //      max(seq) (spec: "same-millisecond commit stamps..."); heal /
  //      vacuum rewrites keep original stamps (spec: "timestamp-based
  //      travel...").
  //   4. Parquet row-group / file ordering on re-read: both driver
  //      queries reduce to count + per-value-cast decimal sums —
  //      order-insensitive aggregates; no window or limit touches the
  //      re-read data.
  //   5. Input admission (q108): exact fixture filename, one file → one
  //      AvailableNow micro-batch; a glob that admitted a stray sidecar
  //      was the one environment-shape dependency found — removed.
  //   6. Task retries: every stage between scan and write is a
  //      deterministic function of its input partition (no sampling, no
  //      RNG, no time), so a retried task reproduces its output bytes.

  private val ManifestName = "_manifest.json"

  /** `since` = the apply seq that wrote this bucket's current content
    * (0 at snapshot creation) — the key that makes time travel exact:
    * as-of S serves the live bucket only when since <= S. */
  private[graft] case class BucketStat(rows: Long, checksum: Long,
      files: Seq[(String, Long)], since: Long = 0L)

  /** A retained historical bucket version: `dir` (under the snapshot
    * root) holds bucket `bucket`'s content that was live for apply seqs
    * `[since, until]`. Version intervals of one bucket never overlap —
    * each replacement's `since` is its `until + 1` — and a gap means the
    * bucket did not exist in that seq range (deleted, later recreated). */
  private[graft] case class Retained(bucket: Int, since: Long, until: Long,
      dir: String, rows: Long, checksum: Long)

  /** (rows, checksum) of one bucket's data — checksum is invariant to
    * row and file order, so any two byte-layouts of the same row set
    * agree. Column order is canonicalized by name. */
  private def statsOf(df: DataFrame): (Long, Long) = {
    val dataCols = df.columns.filterNot(_ == "__bucket").sorted.map(col)
    val r = df.withColumn("__h", xxhash64(dataCols: _*))
      .agg(count(lit(1)).as("rows"),
        coalesce(expr("bit_xor(__h)"), lit(0L)).as("checksum"))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  /** Per-bucket (rows, checksum) in one distributed pass over a frame
    * that carries `__bucket` — one keyed aggregate, nothing collects
    * beyond ≤ `buckets` rows. */
  private def statsByBucket(df: DataFrame): Map[Int, (Long, Long)] = {
    val dataCols = df.columns.filterNot(_ == "__bucket").sorted.map(col)
    df.withColumn("__h", xxhash64(dataCols: _*))
      .groupBy(col("__bucket").cast("int").as("__b"))
      .agg(count(lit(1)).as("rows"), expr("bit_xor(__h)").as("checksum"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  private def bucketFiles(fs: org.apache.hadoop.fs.FileSystem, base: String,
      b: Int): Seq[(String, Long)] = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(s"$base/__bucket=$b")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filterNot(f => f.getPath.getName.startsWith("_") || f.getPath.getName.startsWith("."))
      .map(f => (f.getPath.getName, f.getLen)).sortBy(_._1)
  }

  private def liveBucketIds(fs: org.apache.hadoop.fs.FileSystem,
      base: String): Seq[Int] =
    fs.listStatus(new org.apache.hadoop.fs.Path(base)).toSeq
      .filter(f => f.isDirectory && f.getPath.getName.startsWith("__bucket="))
      .map(_.getPath.getName.stripPrefix("__bucket=").toInt).sorted

  /** Full manifest state. `retainOk` = every apply so far retained the
    * versions it replaced, so the history intervals chain back to each
    * bucket's creation and an uncovered seq provably means "bucket did
    * not exist then" — the invariant [[readSnapshotAsOf]] needs to be
    * exact instead of silently partial. One non-retaining apply flips it
    * false forever. `minAsOf` = the oldest seq [[vacuumSnapshot]] has
    * kept readable. */
  private[graft] case class ManifestData(applySeq: Long,
      buckets: Map[Int, BucketStat], history: Seq[Retained],
      retainOk: Boolean, minAsOf: Long, evolved: Boolean,
      columns: Seq[String], commitTimes: Map[Long, Long])

  private[graft] def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      base: String): Option[(Long, Map[Int, BucketStat])] =
    readManifestFull(fs, base).map(m => (m.applySeq, m.buckets))

  private[graft] def readManifestFull(fs: org.apache.hadoop.fs.FileSystem,
      base: String): Option[ManifestData] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(base, ManifestName)
    // the exists/open pair can race a concurrent manifest commit
    // (delete + rename) — a vanished file reads as "no manifest yet",
    // which callers treat as a retryable state
    if (!fs.exists(p)) None
    else try {
      val st = fs.getFileStatus(p)
      val bytes = new Array[Byte](st.getLen.toInt)
      val in = fs.open(p)
      try in.readFully(bytes) finally in.close()
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(bytes)
      val buckets = scala.collection.mutable.Map[Int, BucketStat]()
      val it = root.get("buckets").fields()
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue
        val files = (0 until v.get("files").size()).map { i =>
          val f = v.get("files").get(i)
          (f.get("name").asText(), f.get("size").asLong())
        }
        val since = if (v.has("since")) v.get("since").asLong() else 0L
        buckets(e.getKey.toInt) =
          BucketStat(v.get("rows").asLong(), v.get("checksum").asLong(), files, since)
      }
      val history = if (!root.has("history")) Seq.empty else
        (0 until root.get("history").size()).map { i =>
          val h = root.get("history").get(i)
          Retained(h.get("bucket").asInt(), h.get("since").asLong(),
            h.get("until").asLong(), h.get("dir").asText(),
            h.get("rows").asLong(), h.get("checksum").asLong())
        }
      // legacy manifests predate history: unknown past, fail time travel
      // closed
      val retainOk = root.has("retain_history") && root.get("retain_history").asBoolean()
      val minAsOf = if (root.has("min_asof_seq")) root.get("min_asof_seq").asLong() else 0L
      // legacy manifests lack these: evolved=true falls back to the
      // safe (mergeSchema) read; columns empty = schema unknown
      val evolved = !root.has("evolved") || root.get("evolved").asBoolean()
      val columns = if (!root.has("columns")) Seq.empty else
        (0 until root.get("columns").size()).map(root.get("columns").get(_).asText())
      val commitTimes = scala.collection.mutable.Map[Long, Long]()
      if (root.has("commit_times_ms")) {
        val ct = root.get("commit_times_ms").fields()
        while (ct.hasNext) {
          val e = ct.next()
          commitTimes(e.getKey.toLong) = e.getValue.asLong()
        }
      }
      Some(ManifestData(root.get("apply_seq").asLong(), buckets.toMap, history,
        retainOk, minAsOf, evolved, columns, commitTimes.toMap))
    } catch {
      case _: java.io.FileNotFoundException => None
    }
  }

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem, base: String,
      applySeq: Long, buckets: Map[Int, BucketStat],
      history: Seq[Retained] = Seq.empty, retainOk: Boolean = true,
      minAsOf: Long = 0L, evolved: Boolean = false,
      columns: Seq[String] = Seq.empty,
      commitTimes: Map[Long, Long] = Map.empty): Unit = {
    import org.apache.hadoop.fs.Path
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()
    root.put("apply_seq", applySeq)
    root.put("retain_history", retainOk)
    root.put("min_asof_seq", minAsOf)
    root.put("evolved", evolved)
    val ca = root.putArray("columns")
    columns.foreach(ca.add)
    // per-seq wall-clock commit times back timestamp-based time travel.
    // A NEW seq is stamped here at commit; a manifest rewrite at the
    // same seq (vacuum, heal) keeps the original stamp
    val ct = root.putObject("commit_times_ms")
    (Map(applySeq -> System.currentTimeMillis()) ++ commitTimes)
      .toSeq.sortBy(_._1).foreach { case (k, v) => ct.put(k.toString, v) }
    val bn = root.putObject("buckets")
    buckets.toSeq.sortBy(_._1).foreach { case (b, s) =>
      val o = bn.putObject(b.toString)
      o.put("rows", s.rows)
      o.put("checksum", s.checksum)
      o.put("since", s.since)
      val fa = o.putArray("files")
      s.files.foreach { case (n, sz) =>
        val f = fa.addObject(); f.put("name", n); f.put("size", sz)
      }
    }
    val ha = root.putArray("history")
    history.sortBy(r => (r.bucket, r.since)).foreach { r =>
      val o = ha.addObject()
      o.put("bucket", r.bucket); o.put("since", r.since); o.put("until", r.until)
      o.put("dir", r.dir); o.put("rows", r.rows); o.put("checksum", r.checksum)
    }
    val tmp = new Path(base, ManifestName + ".tmp")
    val live = new Path(base, ManifestName)
    val out = fs.create(tmp, true)
    try out.write(m.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    finally out.close()
    fs.delete(live, false)
    require(fs.rename(tmp, live), s"manifest commit rename $tmp -> $live failed")
  }

  /** Write `df` as a key-hash-bucketed snapshot layout:
    * `path/__bucket=N/…` directory partitions, plus a `_manifest.json`
    * recording every bucket's rows/checksum/files. The layout exists so
    * [[applyChangesBucketed]] can rewrite ONLY the buckets a change feed
    * touches — at 100 TB a CDC batch touches a tiny key set, and
    * rewriting the whole snapshot per batch (the naive plain-parquet
    * MERGE) is exactly the non-scalable shape to avoid. The manifest
    * pass re-reads the written data once — a one-time cost at snapshot
    * creation; per-batch applies checksum only the touched buckets. */
  def writeBucketedSnapshot(df: DataFrame, path: String, keyCols: Seq[String],
      buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    df.withColumn("__bucket", bucketOf(keyCols, buckets))
      .write.partitionBy("__bucket").mode("overwrite").parquet(path)
    val spark = df.sparkSession
    val base = path.stripSuffix("/")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val stats = statsByBucket(spark.read.parquet(path))
    writeManifest(fs, base, 0L, stats.map { case (b, (n, c)) =>
      b -> BucketStat(n, c, bucketFiles(fs, base, b))
    }, columns = df.columns.toSeq :+ "__bucket")
  }

  /** Validated read of a bucketed snapshot: loads `_manifest.json`,
    * checks every manifest bucket's live file list against it, and
    * returns the plain parquet read once they agree. A disagreement
    * means a concurrent [[applyChangesBucketed]] is mid-swap — the read
    * retries (the apply commits a fresh manifest right after its swaps)
    * and fails closed after `maxRetries` rather than serving a bucket
    * caught between renames. A snapshot with no manifest (legacy layout)
    * falls back to an unvalidated read. */
  def readBucketedSnapshot(spark: org.apache.spark.sql.SparkSession,
      path: String, maxRetries: Int = 20, retryMs: Long = 100): DataFrame = {
    val base = path.stripSuffix("/")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    var attempt = 0
    while (attempt <= maxRetries) {
      readManifestFull(fs, base) match {
        case None =>
          // no manifest at all: either a legacy layout (valid, read it)
          // or the instant of a manifest commit (retry a few times first)
          if (attempt >= math.min(3, maxRetries))
            return spark.read.option("mergeSchema", "true").parquet(path)
        case Some(m) =>
          val torn = m.buckets.find { case (b, s) => bucketFiles(fs, base, b) != s.files }
          // mergeSchema only when an evolveSchema apply actually widened
          // the layout: it costs a footer read of EVERY file, which the
          // common never-evolved path must not pay per read
          if (torn.isEmpty)
            return spark.read.option("mergeSchema", m.evolved.toString).parquet(path)
          else if (attempt == maxRetries)
            throw new IllegalStateException(
              s"bucket ${torn.get._1} of $base disagrees with the manifest after " +
                s"$maxRetries retries — apply crashed mid-swap? run applyChangesBucketed to heal")
      }
      attempt += 1
      Thread.sleep(retryMs)
    }
    spark.read.option("mergeSchema", "true").parquet(path)
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
    * missing — that batch's merge is lost and must be REPLAYED, which
    * requires the caller to run the feed from a durable streaming
    * checkpoint or re-apply the batch itself; a temporary checkpoint
    * silently drops the lost batch — and dropping it when the swap had
    * completed). Readers go through [[readBucketedSnapshot]], which
    * validates the live file lists against `_manifest.json` and retries
    * across a concurrent swap. The manifest commits after the swaps; a
    * crash in between leaves it one apply behind, which the next apply
    * heals by re-deriving stale entries from the live data.
    *
    * Edge: a snapshot whose buckets have ALL been deleted is re-seeded
    * by the next apply — the feed (which carries every base column by
    * contract) defines the schema when no parquet remains to infer from.
    *
    * With `retainHistory` every replaced bucket version is kept under a
    * hidden `.__bucket=N.v<seq>` name and recorded in the manifest, so
    * [[readSnapshotAsOf]] can reconstruct any earlier apply seq;
    * [[vacuumSnapshot]] bounds the retained space. The default keeps
    * nothing (live-only, the round-4 behavior, byte-identical layout).
    */
  def applyChangesBucketed(path: String, changes: DataFrame,
      keyCols: Seq[String], opCol: String, seqCol: String,
      buckets: Int, retainHistory: Boolean = false,
      evolveSchema: Boolean = false): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = changes.sparkSession
    val base = path.stripSuffix("/")
    val fs = new Path(base).getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(new Path(base)),
      s"snapshot $base does not exist — write it first with writeBucketedSnapshot")
    val prior = readManifestFull(fs, base)
    val applySeq = prior.map(_.applySeq + 1).getOrElse(0L)
    // recover any interrupted swap BEFORE reading: a crash between the
    // rename-aside and the rename-in leaves a bucket's only copy at its
    // hidden `.old` name, where the reader would silently see an empty
    // bucket (and the blind delete below would then destroy the data).
    // Recovery: live dir missing -> restore the old copy (that batch's
    // merge was lost and must be replayed). Live PRESENT -> the swap
    // completed and the .old is the replaced version: under retention it
    // is the only copy of the pre-crash data (the crash hit between the
    // rename-in and the retained rename), so finish the crashed
    // attempt's rename — .v{prior seq} — instead of deleting it; the
    // manifest must have KNOWN the bucket, else the .old is a crashed
    // CREATE's aside-copy of merged output, not a historical version
    fs.listStatus(new Path(base)).foreach { f =>
      val n = f.getPath.getName
      if (n.startsWith(".__bucket=") && n.endsWith(".old")) {
        val b = n.stripPrefix(".__bucket=").stripSuffix(".old").toInt
        val live = new Path(base, n.stripPrefix(".").stripSuffix(".old"))
        if (!fs.exists(live))
          require(fs.rename(f.getPath, live), s"recovery rename ${f.getPath} -> $live failed")
        else if (retainHistory && prior.exists(_.buckets.contains(b))) {
          val ret = new Path(base, s".__bucket=$b.v${prior.get.applySeq}")
          if (!fs.exists(ret))
            require(fs.rename(f.getPath, ret), s"recovery rename ${f.getPath} -> $ret failed")
          else fs.delete(f.getPath, true)
        } else fs.delete(f.getPath, true)
      }
    }
    // load + heal the manifest: entries whose file list disagrees with
    // the live layout (crash between swap and manifest commit, or a
    // legacy layout with no manifest) are re-derived from the live data
    // — a listStatus per bucket, plus one bucket scan only when stale
    // columns beyond the manifest's record found on a healed bucket mean
    // a crashed evolveSchema apply reached disk without committing: the
    // evolved flag and column list must latch HERE or later reads would
    // drop the widened column (mergeSchema=false infers one footer)
    val healExtraCols = scala.collection.mutable.LinkedHashSet[String]()
    val healed: Map[Int, BucketStat] = liveBucketIds(fs, base).map { b =>
      val files = bucketFiles(fs, base, b)
      prior.flatMap(_.buckets.get(b)).filter(_.files == files) match {
        case Some(ok) => b -> ok
        case None =>
          val df = spark.read.parquet(s"$base/__bucket=$b")
          prior.map(_.columns).filter(_.nonEmpty).foreach { pc =>
            healExtraCols ++= df.columns.filterNot(c => pc.contains(c) || c == "__bucket")
          }
          val (n, c) = statsOf(df)
          // an unknown bucket's validity start is unknowable: 0 keeps
          // every as-of read serving it (fail-open to the live data)
          b -> BucketStat(n, c, files,
            prior.flatMap(_.buckets.get(b)).map(_.since).getOrElse(0L))
      }
    }.toMap
    // history entries whose retained dir vanished (vacuumed by hand,
    // torn vacuum) drop out rather than serving a dead pointer — and
    // every seq a dropped interval covered must become unreadable
    // (minAsOf moves past it), or as-of reads would silently omit that
    // bucket instead of failing closed
    val (healedHistory, droppedHistory) = prior.map(_.history).getOrElse(Seq.empty)
      .partition(r => fs.exists(new Path(base, r.dir)))
    val healedMinAsOf = (prior.map(_.minAsOf).getOrElse(0L) +:
      droppedHistory.map(_.until + 1)).max
    val withB = changes.withColumn("__bucket", bucketOf(keyCols, buckets))
    val affected = withB.select(col("__bucket")).distinct()
      .collect().map(_.getInt(0)).sorted
    if (affected.isEmpty) {
      // still commit the healed manifest (it may have been stale/absent)
      if (prior.map(p => (p.buckets, p.history)) != Some((healed, healedHistory))
          || healExtraCols.nonEmpty)
        writeManifest(fs, base, applySeq, healed, healedHistory,
          prior.forall(_.retainOk), healedMinAsOf,
          prior.map(_.evolved).getOrElse(healed.nonEmpty) || healExtraCols.nonEmpty,
          prior.map(_.columns).getOrElse(Seq.empty) ++ healExtraCols,
          prior.map(_.commitTimes).getOrElse(Map.empty))
      return
    }
    val snap = if (healed.isEmpty) {
      // a fully-deleted snapshot has no parquet to infer a schema from:
      // the manifest's recorded columns define the base schema (so a
      // non-evolving reseed still drops extra feed columns); a legacy
      // manifest without them falls back to the feed's data columns
      val priorCols = prior.map(_.columns).getOrElse(Seq.empty)
      val dataCols =
        if (priorCols.nonEmpty) {
          require(priorCols.forall(withB.columns.contains),
            s"reseed feed must carry every snapshot column; missing ${priorCols.filterNot(withB.columns.contains)}")
          priorCols
        } else withB.columns.toSeq.filterNot(c => c == opCol || c == seqCol)
      withB.select(dataCols.map(col): _*).filter(lit(false))
    } else spark.read
      .option("mergeSchema", prior.exists(_.evolved).toString).parquet(path)
      .filter(col("__bucket").isin(affected.map(Integer.valueOf).toSeq: _*))
    val merged = applyChanges(snap, withB, keyCols, opCol, seqCol, evolveSchema)
    val tmp = base + ".merge_tmp"
    merged.write.partitionBy("__bucket").mode("overwrite").parquet(tmp)
    // checksum the rewritten buckets from the staged output BEFORE the
    // swap: rename preserves file names and bytes, so the staged stats
    // describe exactly what goes live, and the data is read while it is
    // still immutable-by-construction. An all-delete batch stages zero
    // bucket dirs — nothing to checksum (and nothing to infer from)
    val nextStats = if (liveBucketIds(fs, tmp).isEmpty) Map.empty[Int, (Long, Long)]
      else statsByBucket(spark.read.parquet(tmp)
        .withColumn("__bucket", col("__bucket").cast("int")))
    val nextFiles = affected.map { b =>
      b -> bucketFiles(fs, tmp, b)
    }.toMap
    val retained = scala.collection.mutable.ArrayBuffer[Retained]()
    affected.foreach { b =>
      val live = new Path(s"$base/__bucket=$b")
      val next = new Path(s"$tmp/__bucket=$b")
      // no .old can exist here: the recovery pass at entry cleared them
      val old = new Path(s"$base/.__bucket=$b.old")
      val hadLive = fs.exists(live)
      if (hadLive)
        require(fs.rename(live, old), s"rename $live -> $old failed")
      // a bucket with every row deleted has no output directory — the
      // rename-away above already removed it from the live layout
      if (fs.exists(next))
        require(fs.rename(next, live), s"rename $next -> $live failed; old at $old")
      if (hadLive) {
        // time travel: keep the replaced version under its valid-until
        // seq instead of deleting it. applySeq 0 means a legacy layout
        // with no manifest — there is no seq to file the old data under.
        // A crash between the rename-in and this rename loses only the
        // historical copy, never live data (the recovery pass deletes a
        // stale .old when live exists)
        if (retainHistory && applySeq > 0 &&
            prior.exists(_.buckets.contains(b))) {
          val ret = new Path(s"$base/.__bucket=$b.v${applySeq - 1}")
          if (fs.exists(ret)) {
            // a pre-existing target is the remnant of a crashed attempt
            // of this SAME seq (the manifest never advanced) — and that
            // attempt's rename already preserved the true v{applySeq-1}
            // data there. The data at `old` is the crashed attempt's
            // MERGED output re-renamed aside, not the older version —
            // keep the existing retained copy, drop `old`, and re-derive
            // the retained stats from the copy itself (the healed stats
            // describe the post-crash live data, not this version)
            fs.delete(old, true)
            val (n, c) = statsOf(spark.read.parquet(ret.toString))
            retained += Retained(b,
              healed.get(b).map(_.since).getOrElse(0L), applySeq - 1,
              ret.getName, n, c)
          } else {
            require(fs.rename(old, ret), s"rename $old -> $ret failed")
            healed.get(b).foreach { st =>
              retained += Retained(b, st.since, applySeq - 1, ret.getName,
                st.rows, st.checksum)
            }
          }
        } else fs.delete(old, true)
      }
    }
    // fold in recovery-renamed versions of buckets this feed did NOT
    // touch: the replay contract sends the same batch back, but if a
    // different feed arrives after a crash, the recovered .v dir still
    // holds the true prior version and must enter the manifest (and the
    // bucket's live data — the crashed merge output — became live at
    // this seq, not at its pre-crash since)
    val liveSinceOverride = scala.collection.mutable.Map[Int, Long]()
    if (applySeq > 0)
      fs.listStatus(new Path(base)).foreach { f =>
        val n = f.getPath.getName
        if (n.startsWith(".__bucket=") && n.endsWith(s".v${applySeq - 1}")) {
          val b = n.stripPrefix(".__bucket=").takeWhile(_ != '.').toInt
          if (!affected.contains(b) && !retained.exists(_.bucket == b) &&
              !healedHistory.exists(_.dir == n)) {
            prior.flatMap(_.buckets.get(b)).foreach { pe =>
              retained += Retained(b, pe.since, applySeq - 1, n, pe.rows, pe.checksum)
              if (healed.contains(b)) liveSinceOverride(b) = applySeq
            }
          }
        }
      }
    val committed = healed -- affected ++ nextStats.map { case (b, (n, c)) =>
      b -> BucketStat(n, c, nextFiles.getOrElse(b, Seq.empty), applySeq)
    } ++ liveSinceOverride.map { case (b, sq) => b -> healed(b).copy(since = sq) }
    // history completeness survives only if nothing replaced was dropped:
    // one non-retaining apply that discarded a live version makes every
    // earlier seq unreconstructable, and the flag records that forever.
    // A legacy layout (no prior manifest) starts its seq history HERE —
    // there is nothing earlier to reconstruct, so completeness holds
    val replacedAny = affected.exists(b => healed.contains(b))
    val stillRetainOk = prior match {
      case None    => true
      case Some(p) => p.retainOk && (retainHistory || !replacedAny)
    }
    // schema tracking: the union of the recorded columns and what this
    // merge produced; `evolved` latches once heterogeneous bucket
    // schemas exist on disk (a legacy manifest with live data counts as
    // evolved — its schema history is unknown, reads must merge footers)
    val priorCols = prior.map(_.columns).getOrElse(Seq.empty)
    val mergedCols = merged.columns.toSeq
    val committedCols = (priorCols ++ mergedCols.filterNot(priorCols.contains)
      ++ healExtraCols).distinct
    val nowEvolved = prior.map(_.evolved).getOrElse(healed.nonEmpty) ||
      healExtraCols.nonEmpty ||
      (priorCols.nonEmpty && mergedCols.exists(!priorCols.contains(_)))
    writeManifest(fs, base, applySeq, committed, healedHistory ++ retained,
      stillRetainOk, healedMinAsOf, nowEvolved, committedCols,
      prior.map(_.commitTimes).getOrElse(Map.empty))
    fs.delete(new Path(tmp), true)
  }

  /** Read a bucketed snapshot AS OF an earlier apply seq — time travel
    * over the [[applyChangesBucketed]] layout (pass `retainHistory =
    * true` on every apply to build the history; seq 0 is the
    * [[writeBucketedSnapshot]] state). Per bucket, the manifest names
    * exactly one directory valid at `asOfSeq` — the live one when its
    * `since` predates the ask, else the retained version whose
    * `[since, until]` interval covers it, else the bucket did not exist
    * then. The result is ONE multi-root parquet scan (no union tree —
    * the plan has a single FileScan whatever the bucket count), with
    * `__bucket` recovered from the file path, so an as-of read costs
    * the same as a live read of equal size. */
  def readSnapshotAsOf(spark: org.apache.spark.sql.SparkSession, path: String,
      asOfSeq: Long): DataFrame = {
    import org.apache.hadoop.fs.Path
    require(asOfSeq >= 0, s"asOfSeq must be >= 0: $asOfSeq")
    val base = path.stripSuffix("/")
    val fs = new Path(base).getFileSystem(spark.sessionState.newHadoopConf())
    val m = readManifestFull(fs, base).getOrElse(
      throw new IllegalStateException(s"$base has no manifest — time travel " +
        "needs a snapshot written by writeBucketedSnapshot"))
    require(asOfSeq <= m.applySeq,
      s"asOfSeq $asOfSeq is in the future: snapshot is at ${m.applySeq}")
    // asking for the CURRENT seq is just the live read — always valid;
    // anything earlier needs the complete, unvacuumed interval chain or
    // the result would silently miss replaced buckets
    if (asOfSeq < m.applySeq) {
      if (!m.retainOk) throw new IllegalStateException(s"$base history is " +
        "incomplete (an apply ran without retainHistory) — as-of reads " +
        "before the current seq would be partial")
      if (asOfSeq < m.minAsOf) throw new IllegalStateException(s"$base " +
        s"history before seq ${m.minAsOf} was vacuumed")
    }
    val liveDirs = m.buckets.collect {
      case (b, st) if st.since <= asOfSeq => s"$base/__bucket=$b"
    }.toSeq
    val histDirs = m.history.filter(r => r.since <= asOfSeq && asOfSeq <= r.until)
      .map(r => s"$base/${r.dir}")
    val dirs = (liveDirs ++ histDirs).sorted
    val roots = if (dirs.nonEmpty) dirs else {
      // a version where every bucket was deleted is a valid EMPTY
      // snapshot — serve it under the merged schema of the dirs that
      // existed AT OR BEFORE the ask (never a future version's: a later
      // evolveSchema apply must not leak its column into the past), and
      // deterministically (sorted union, not a Map-ordered pick)
      val past = m.history.filter(_.until < asOfSeq).map(r => s"$base/${r.dir}")
      (if (past.nonEmpty) past
       else (m.buckets.keys.map(b => s"$base/__bucket=$b").toSeq ++
         m.history.map(r => s"$base/${r.dir}"))).sorted
    }
    if (roots.isEmpty)
      throw new IllegalStateException(s"$base has no data in any version")
    val mergeFooters = (m.evolved || dirs.isEmpty).toString
    val df = spark.read.option("mergeSchema", mergeFooters).parquet(roots: _*)
      .withColumn("__bucket",
        regexp_extract(input_file_name(), "__bucket=(\\d+)", 1).cast("int"))
    if (dirs.nonEmpty) df else df.filter(lit(false))
  }

  /** Timestamp-based time travel (AS OF TIMESTAMP): resolve the newest
    * apply seq whose manifest commit happened at or before `tsMillis`
    * (wall-clock times recorded per seq in the manifest) and read that
    * version via [[readSnapshotAsOf]] — same fail-closed guarantees. */
  def readSnapshotAsOfTime(spark: org.apache.spark.sql.SparkSession,
      path: String, tsMillis: Long): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = path.stripSuffix("/")
    val fs = new Path(base).getFileSystem(spark.sessionState.newHadoopConf())
    val m = readManifestFull(fs, base).getOrElse(
      throw new IllegalStateException(s"$base has no manifest — time travel " +
        "needs a snapshot written by writeBucketedSnapshot"))
    val eligible = m.commitTimes.filter(_._2 <= tsMillis)
    require(eligible.nonEmpty,
      s"no commit at or before $tsMillis: earliest is " +
        s"${if (m.commitTimes.isEmpty) "unknown (legacy manifest)" else m.commitTimes.values.min.toString}")
    readSnapshotAsOf(spark, path, eligible.keys.max)
  }

  /** Drop retained history older than `minSeqToKeep`: as-of reads for
    * seqs >= the cutoff keep working, older ones fail closed. The
    * manifest commits BEFORE the directories are removed, so a racing
    * [[readSnapshotAsOf]] never holds a manifest pointing at a deleted
    * dir; a crash in between leaves orphan `.v` dirs, which the next
    * vacuum sweeps (any retained-style dir the manifest no longer
    * references). */
  def vacuumSnapshot(spark: org.apache.spark.sql.SparkSession, path: String,
      minSeqToKeep: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val base = path.stripSuffix("/")
    val fs = new Path(base).getFileSystem(spark.sessionState.newHadoopConf())
    val m = readManifestFull(fs, base).getOrElse(return)
    val keep = m.history.filter(_.until >= minSeqToKeep)
    val newMinAsOf = math.max(m.minAsOf, math.min(minSeqToKeep, m.applySeq))
    // commit stamps for vacuumed seqs can never resolve again (the read
    // fails closed below minAsOf) — prune them so the manifest does not
    // grow one entry per apply forever
    writeManifest(fs, base, m.applySeq, m.buckets, keep, m.retainOk,
      newMinAsOf, m.evolved, m.columns,
      m.commitTimes.filter(_._1 >= newMinAsOf))
    val kept = keep.map(_.dir).toSet
    fs.listStatus(new Path(base)).foreach { f =>
      val n = f.getPath.getName
      if (n.startsWith(".__bucket=") && n.contains(".v") && !kept.contains(n)) {
        // an unreferenced dir at version >= the committed applySeq is
        // the remnant of an IN-FLIGHT apply that crashed before its
        // manifest commit — its checkpoint replay needs that dir to
        // preserve the true older version (deleting it would make the
        // retry mislabel merged output as history). Only strictly older
        // unreferenced dirs are committed-then-orphaned garbage
        val v = n.substring(n.lastIndexOf(".v") + 2)
        val inFlight = v.forall(_.isDigit) && v.nonEmpty && v.toLong >= m.applySeq
        if (!inFlight) fs.delete(f.getPath, true)
      }
    }
  }

  /** Incremental aggregate maintenance: fold partial aggregate tables
    * (yesterday's materialized rollup + today's delta rollup) into the
    * aggregate of the union of their inputs — the reason a 100 TB
    * pipeline never recomputes a rollup from scratch. Only MERGEABLE
    * aggregates qualify: per-key counts and sums re-merge by `sum`,
    * min/max by themselves; averages must ship as (sum, count) pairs
    * and divide after the fold. `merges` maps each value column to its
    * re-merge function ("sum" | "min" | "max"); all parts must carry
    * the key and value columns. One keyed shuffle over data that is
    * already aggregate-sized. */
  def mergeAggregates(parts: Seq[DataFrame], keys: Seq[String],
      merges: Map[String, String]): DataFrame = {
    require(parts.nonEmpty, "need at least one partial aggregate")
    require(merges.nonEmpty, "need at least one value column")
    val fns = merges.map { case (c, f) =>
      f match {
        case "sum" => sum(col(c)).as(c)
        case "min" => min(col(c)).as(c)
        case "max" => max(col(c)).as(c)
        case other => throw new IllegalArgumentException(
          s"column $c: '$other' is not a mergeable re-combine (sum|min|max)")
      }
    }.toSeq
    val cols = keys ++ merges.keys.toSeq
    parts.map(_.select(cols.map(col): _*)).reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(fns.head, fns.tail: _*)
  }

  /** Temporal (point-in-time) join of an event-timed fact stream
    * against an SCD2 dimension history ([[scd2]]'s output): each fact
    * row is enriched with the dimension attributes VALID AT its event
    * time — `valid_from ≤ ts < valid_to` (open-ended current rows
    * match everything after their start). The join every "status at
    * time of shipment / price at time of click" question needs, and
    * the one a plain latest-version join silently gets wrong.
    *
    * Spark shape: a keyed equi-join with the interval test as a
    * RESIDUAL predicate — per key a fact meets only that key's version
    * rows, which the SCD2 contract keeps bounded (change counts, not
    * row counts), so the fan-out is never corpus×corpus; facts with no
    * valid version (before the key's first interval, or unknown keys)
    * keep NULL attributes via the left join. */
  def temporalJoin(facts: DataFrame, factKeyCol: String, factTsCol: String,
      dim: DataFrame, dimKeyCol: String,
      fromCol: String = "valid_from", toCol: String = "valid_to"): DataFrame = {
    val cond = facts(factKeyCol) === dim(dimKeyCol) &&
      dim(fromCol) <= facts(factTsCol) &&
      (dim(toCol).isNull || facts(factTsCol) < dim(toCol))
    facts.join(dim, cond, "left").drop(dim(dimKeyCol))
  }

  /** Incremental maintenance of a JOIN-then-aggregate view (the delta
    * algebra of materialized views, Gupta & Mumick 1995): with
    * `A = A₀ ∪ ΔA` and `B = B₀ ∪ ΔB`,
    * `A ⋈ B = A₀⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈B₀ ∪ ΔA⋈ΔB` — so when the `A₀⋈B₀`
    * rollup is already materialized, refreshing the view costs only the
    * three delta terms, each bounded by a delta's size, never a rescan
    * of the 100 TB bases. `measure` must be a decimal (or integer)
    * expression so the partial-rollup merge is exact and associative
    * under any partitioning — the fold is [[mergeAggregates]].
    *
    * Returns the refreshed view `(groupCol, total, n_rows)` — equal,
    * by construction, to the full recompute over `A ⋈ B`; a hash match
    * against a from-scratch oracle is the correctness proof that the
    * incremental path loses nothing. */
  def deltaJoinView(aBase: DataFrame, aDelta: DataFrame,
      bBase: DataFrame, bDelta: DataFrame, aKey: String, bKey: String,
      groupCol: String,
      measure: org.apache.spark.sql.Column): DataFrame = {
    def term(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b, col(aKey) === col(bKey))
        .groupBy(col(groupCol))
        .agg(sum(measure).as("total"), count(lit(1)).as("n_rows"))
    // A₀⋈B₀ stands in for the materialized view; the three delta terms
    // are the per-refresh work
    val parts = Seq(term(aBase, bBase), term(aBase, bDelta),
      term(aDelta, bBase), term(aDelta, bDelta))
    mergeAggregates(parts, Seq(groupCol),
      Map("total" -> "sum", "n_rows" -> "sum"))
  }

  /** Write–audit–publish: the batch is STAGED to parquet next to the
    * snapshot, AUDITED from the staged files (per-row `checks` predicates
    * plus a duplicate-(key, seq) check — the audit reads what would be
    * published, not the in-memory plan), and only a fully clean batch is
    * PUBLISHED into the bucketed snapshot via [[applyChangesBucketed]];
    * any violation leaves the snapshot untouched. Returns the audit
    * report `(check, n_violations, published)` — one row per check.
    *
    * The whole audit is ONE scan of the staged batch: a per-(key, seq)
    * aggregate carries every row-check violation tally alongside the
    * duplicate count, then a single global fold — adding audit rules is
    * free at 100 TB (the same shape as Profile.expectations). A batch
    * may legitimately carry several sequenced ops for one key (that is
    * what `seqCol` exists to resolve in the publish); only rows sharing
    * the SAME (key, seq) — order-ambiguous — violate `unique_key`.
    * Publish inherits applyChangesBucketed's touched-buckets-only cost
    * and then clears the staging dir; on rejection staging is kept as
    * the inspectable quarantine half of the pattern. */
  def writeAuditPublish(path: String, batch: DataFrame, keyCols: Seq[String],
      opCol: String, seqCol: String, buckets: Int,
      checks: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    val spark = batch.sparkSession
    val stagePath = path.stripSuffix("/") + ".staging"
    batch.write.mode("overwrite").parquet(stagePath)
    val staged = spark.read.parquet(stagePath)
    val perKey = staged.groupBy((keyCols :+ seqCol).map(col): _*).agg(
      count(lit(1)).as("__nk"),
      checks.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(s"__v$i")
      }: _*)
    val totals = perKey.agg(
      coalesce(sum(when(col("__nk") > 1, lit(1L)).otherwise(0L)), lit(0L))
        .as("__dup"),
      checks.indices.map(i =>
        coalesce(sum(col(s"__v$i")), lit(0L)).as(s"__v$i")): _*)
      .collect()(0)
    val report = checks.zipWithIndex.map { case ((name, _), i) =>
      name -> totals.getAs[Long](s"__v$i")
    } :+ ("unique_key" -> totals.getAs[Long]("__dup"))
    val clean = report.forall(_._2 == 0L)
    if (clean) {
      applyChangesBucketed(path, staged, keyCols, opCol, seqCol, buckets)
      val hp = new org.apache.hadoop.fs.Path(stagePath)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(hp, true)
    }
    import spark.implicits._
    report.map { case (name, v) => (name, v, clean) }
      .toDF("check", "n_violations", "published")
  }
}
