package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Merge

/** Time travel over the bucketed CDC snapshot: retained versions,
  * as-of reconstruction, vacuum, and the fail-closed cases. */
class TimeTravelSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private def freshPath() = s"/tmp/graft_tt_spec_${System.nanoTime()}"

  private def cleanup(path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
    fs.delete(new org.apache.hadoop.fs.Path(path + ".merge_tmp"), true)
  }

  private def rows(df: DataFrame): Set[(Long, Long)] =
    df.select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("as-of reads reproduce every version exactly") {
    import spark.implicits._
    val path = freshPath()
    try {
      val base = (1L to 60L).map(k => (k, k * 10)).toDF("k", "v")
      Merge.writeBucketedSnapshot(base, path, Seq("k"), buckets = 4)
      val feed1 = base.filter($"k" % 5 === 0)
        .withColumn("v", $"v" + 100L)
        .withColumn("op", org.apache.spark.sql.functions.lit("U"))
        .withColumn("seq", org.apache.spark.sql.functions.lit(1L))
      Merge.applyChangesBucketed(path, feed1, Seq("k"), "op", "seq", 4,
        retainHistory = true)
      val feed2 = base.filter($"k" % 3 === 0)
        .withColumn("op", org.apache.spark.sql.functions.lit("D"))
        .withColumn("seq", org.apache.spark.sql.functions.lit(2L))
      Merge.applyChangesBucketed(path, feed2, Seq("k"), "op", "seq", 4,
        retainHistory = true)
      val v1 = Merge.applyChanges(base, feed1, Seq("k"), "op", "seq")
      val v2 = Merge.applyChanges(v1, feed2, Seq("k"), "op", "seq")
      assert(rows(Merge.readSnapshotAsOf(spark, path, 0)) == rows(base))
      assert(rows(Merge.readSnapshotAsOf(spark, path, 1)) == rows(v1))
      assert(rows(Merge.readSnapshotAsOf(spark, path, 2)) == rows(v2))
      // the recovered __bucket column matches the key hashing
      val b = Merge.readSnapshotAsOf(spark, path, 1)
        .select("k", "__bucket").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val live = spark.read.parquet(path).select("k", "__bucket").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(live.keySet.forall(k => b(k) == live(k)))
    } finally cleanup(path)
  }

  test("a bucket deleted then recreated leaves a gap; empty versions read as empty") {
    import spark.implicits._
    val path = freshPath()
    try {
      val base = (1L to 10L).map(k => (k, k)).toDF("k", "v")
      Merge.writeBucketedSnapshot(base, path, Seq("k"), buckets = 1)
      // seq 1: delete everything -> the only bucket disappears
      val wipe = base.withColumn("op", org.apache.spark.sql.functions.lit("D"))
        .withColumn("seq", org.apache.spark.sql.functions.lit(1L))
      Merge.applyChangesBucketed(path, wipe, Seq("k"), "op", "seq", 1,
        retainHistory = true)
      // seq 2: fresh keys recreate the bucket
      val reborn = (11L to 15L).map(k => (k, k)).toDF("k", "v")
        .withColumn("op", org.apache.spark.sql.functions.lit("U"))
        .withColumn("seq", org.apache.spark.sql.functions.lit(2L))
      Merge.applyChangesBucketed(path, reborn, Seq("k"), "op", "seq", 1,
        retainHistory = true)
      assert(rows(Merge.readSnapshotAsOf(spark, path, 0)) ==
        (1L to 10L).map(k => (k, k)).toSet)
      assert(Merge.readSnapshotAsOf(spark, path, 1).count() == 0,
        "the wiped version must read as an empty snapshot")
      assert(rows(Merge.readSnapshotAsOf(spark, path, 2)) ==
        (11L to 15L).map(k => (k, k)).toSet)
    } finally cleanup(path)
  }

  test("vacuum drops old versions, keeps newer ones, and fails closed") {
    import spark.implicits._
    val path = freshPath()
    try {
      val base = (1L to 40L).map(k => (k, k)).toDF("k", "v")
      Merge.writeBucketedSnapshot(base, path, Seq("k"), buckets = 2)
      (1 to 3).foreach { s =>
        val feed = base.filter($"k" % 4 === 0)
          .withColumn("v", $"v" + s * 1000L)
          .withColumn("op", org.apache.spark.sql.functions.lit("U"))
          .withColumn("seq", org.apache.spark.sql.functions.lit(s.toLong))
        Merge.applyChangesBucketed(path, feed, Seq("k"), "op", "seq", 2,
          retainHistory = true)
      }
      Merge.vacuumSnapshot(spark, path, minSeqToKeep = 2)
      val ex = intercept[IllegalStateException](
        Merge.readSnapshotAsOf(spark, path, 1))
      assert(ex.getMessage.contains("vacuumed"))
      // seq >= cutoff still reconstructs
      assert(rows(Merge.readSnapshotAsOf(spark, path, 2))
        .collect { case (k, v) if k % 4 == 0 => v }.forall(_ > 2000))
      assert(rows(Merge.readSnapshotAsOf(spark, path, 3)) ==
        rows(spark.read.parquet(path)))
      // vacuumed dirs are actually gone
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val retained = fs.listStatus(new org.apache.hadoop.fs.Path(path))
        .map(_.getPath.getName).filter(n => n.startsWith(".__bucket=") && n.contains(".v"))
      assert(retained.forall(_.endsWith(".v2")), s"left: ${retained.toSeq}")
    } finally cleanup(path)
  }

  test("an apply without retainHistory makes earlier as-of reads fail closed") {
    import spark.implicits._
    val path = freshPath()
    try {
      val base = (1L to 20L).map(k => (k, k)).toDF("k", "v")
      Merge.writeBucketedSnapshot(base, path, Seq("k"), buckets = 2)
      val feed = base.filter($"k" % 2 === 0)
        .withColumn("v", $"v" + 7L)
        .withColumn("op", org.apache.spark.sql.functions.lit("U"))
        .withColumn("seq", org.apache.spark.sql.functions.lit(1L))
      Merge.applyChangesBucketed(path, feed, Seq("k"), "op", "seq", 2)
      val ex = intercept[IllegalStateException](
        Merge.readSnapshotAsOf(spark, path, 0))
      assert(ex.getMessage.contains("incomplete"))
      // the current seq is still just the live read
      assert(rows(Merge.readSnapshotAsOf(spark, path, 1)) ==
        rows(spark.read.parquet(path)))
    } finally cleanup(path)
  }

  test("snapshotDiff between consecutive as-of reads recovers the feed effect") {
    import spark.implicits._
    val path = freshPath()
    try {
      val base = (1L to 30L).map(k => (k, k)).toDF("k", "v")
      Merge.writeBucketedSnapshot(base, path, Seq("k"), buckets = 4)
      val feed = base.filter($"k" % 6 === 0)
        .withColumn("v", $"v" * 2L)
        .withColumn("op", org.apache.spark.sql.functions
          .when($"k" % 12 === 0, "D").otherwise("U"))
        .withColumn("seq", org.apache.spark.sql.functions.lit(1L))
      Merge.applyChangesBucketed(path, feed, Seq("k"), "op", "seq", 4,
        retainHistory = true)
      val diff = Merge.snapshotDiff(
          Merge.readSnapshotAsOf(spark, path, 0).drop("__bucket"),
          Merge.readSnapshotAsOf(spark, path, 1).drop("__bucket"), Seq("k"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      (1L to 30L).foreach { k =>
        val want = if (k % 12 == 0) "removed"
        else if (k % 6 == 0) "changed" else "unchanged"
        assert(diff(k) == want, s"k=$k: ${diff(k)} != $want")
      }
    } finally cleanup(path)
  }

  test("streaming applies with retention leave every micro-batch reconstructable") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val path = freshPath()
    val feedDir = path + ".feed"
    try {
      val base = (1L to 20L).map(k => (k, k)).toDF("k", "v")
      Merge.writeBucketedSnapshot(base, path, Seq("k"), buckets = 4)
      // three feed files, five fresh keys each -> every micro-batch grows
      // the snapshot by exactly 5 rows whatever order the files arrive in
      Seq(101L to 105L, 201L to 205L, 301L to 305L).zipWithIndex.foreach {
        case (ks, i) =>
          ks.map(k => (k, k)).toDF("k", "v")
            .withColumn("op", org.apache.spark.sql.functions.lit("U"))
            .withColumn("seq", org.apache.spark.sql.functions.lit(i.toLong))
            .coalesce(1).write.mode("append").parquet(feedDir)
      }
      val schema = spark.read.parquet(feedDir).schema
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(feedDir)
        .writeStream.option("checkpointLocation", path + ".ckpt")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          Merge.applyChangesBucketed(path, b, Seq("k"), "op", "seq", 4,
            retainHistory = true)
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      (0L to 3L).foreach { s =>
        assert(Merge.readSnapshotAsOf(spark, path, s).count() == 20 + 5 * s,
          s"version $s has the wrong row count")
      }
    } finally {
      cleanup(path)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(feedDir), true)
      fs.delete(new org.apache.hadoop.fs.Path(path + ".ckpt"), true)
    }
  }

  test("a crashed retained apply retried does not corrupt the older version") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val path = freshPath()
    try {
      val base = (1L to 20L).map(k => (k, k)).toDF("k", "v")
      Merge.writeBucketedSnapshot(base, path, Seq("k"), buckets = 2)
      val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
      // snapshot the pre-apply manifest
      val mPath = new Path(path, "_manifest.json")
      val m0 = new Array[Byte](fs.getFileStatus(mPath).getLen.toInt)
      val in = fs.open(mPath); try in.readFully(m0) finally in.close()
      val feed = base.filter($"k" % 2 === 0)
        .withColumn("v", $"v" + 100L)
        .withColumn("op", org.apache.spark.sql.functions.lit("U"))
        .withColumn("seq", org.apache.spark.sql.functions.lit(1L))
      Merge.applyChangesBucketed(path, feed, Seq("k"), "op", "seq", 2,
        retainHistory = true)
      // simulate a crash between the retained rename and the manifest
      // commit: live + .v0 dirs hold the post-apply state, manifest
      // rolls back to seq 0 — exactly what a killed process leaves
      val out = fs.create(mPath, true); try out.write(m0) finally out.close()
      // the durable-checkpoint contract replays the batch
      Merge.applyChangesBucketed(path, feed, Seq("k"), "op", "seq", 2,
        retainHistory = true)
      // v0 must still be the ORIGINAL data, not the crashed attempt's
      // merged output; v1 is the merged state; the merge is idempotent
      assert(rows(Merge.readSnapshotAsOf(spark, path, 0)) == rows(base),
        "the retained v0 copy was clobbered by the retry")
      val want1 = (1L to 20L).map(k => (k, if (k % 2 == 0) k + 100 else k)).toSet
      assert(rows(Merge.readSnapshotAsOf(spark, path, 1)) == want1)
    } finally cleanup(path)
  }

  test("bucketed apply evolves the schema; untouched buckets read back null-padded") {
    import spark.implicits._
    val path = freshPath()
    try {
      val base = (1L to 40L).map(k => (k, k)).toDF("k", "v")
      Merge.writeBucketedSnapshot(base, path, Seq("k"), buckets = 8)
      // feed touches a strict subset of buckets and carries a NEW column
      val feed = base.filter($"k" <= 5)
        .withColumn("tag", org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("t"), $"k".cast("string")))
        .withColumn("op", org.apache.spark.sql.functions.lit("U"))
        .withColumn("seq", org.apache.spark.sql.functions.lit(1L))
      Merge.applyChangesBucketed(path, feed, Seq("k"), "op", "seq", 8,
        retainHistory = true, evolveSchema = true)
      val got = Merge.readBucketedSnapshot(spark, path)
        .select("k", "tag").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got.size == 40)
      (1L to 5L).foreach(k => assert(got(k) == Some(s"t$k"), s"k=$k: ${got(k)}"))
      (6L to 40L).foreach(k => assert(got(k).isEmpty, s"k=$k must be null"))
      // time travel across the evolution: v0 reads under the merged
      // schema with the new column all-null
      val v0 = Merge.readSnapshotAsOf(spark, path, 0)
      assert(v0.count() == 40)
      if (v0.columns.contains("tag"))
        assert(v0.filter($"tag".isNotNull).count() == 0,
          "pre-evolution version must not carry values for the new column")
    } finally cleanup(path)
  }

  test("a crash between rename-in and the retained rename still preserves the old version") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val path = freshPath()
    try {
      val base = (1L to 20L).map(k => (k, k)).toDF("k", "v")
      Merge.writeBucketedSnapshot(base, path, Seq("k"), buckets = 1)
      val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
      val mPath = new Path(path, "_manifest.json")
      val m0 = new Array[Byte](fs.getFileStatus(mPath).getLen.toInt)
      val in = fs.open(mPath); try in.readFully(m0) finally in.close()
      val feed = base.filter($"k" % 2 === 0)
        .withColumn("v", $"v" + 100L)
        .withColumn("op", org.apache.spark.sql.functions.lit("U"))
        .withColumn("seq", org.apache.spark.sql.functions.lit(1L))
      Merge.applyChangesBucketed(path, feed, Seq("k"), "op", "seq", 1,
        retainHistory = true)
      // reconstruct the crash state AFTER the rename-in but BEFORE the
      // retained rename: live = merged output, .old = true v0 (the only
      // copy), no .v0, manifest still at seq 0
      require(fs.rename(new Path(path, ".__bucket=0.v0"),
        new Path(path, ".__bucket=0.old")))
      val out = fs.create(mPath, true); try out.write(m0) finally out.close()
      // the checkpoint replay: recovery must finish the crashed rename
      // (old -> .v0) instead of deleting the old version
      Merge.applyChangesBucketed(path, feed, Seq("k"), "op", "seq", 1,
        retainHistory = true)
      assert(rows(Merge.readSnapshotAsOf(spark, path, 0)) == rows(base),
        "the pre-crash version was lost or mislabeled")
      val want1 = (1L to 20L).map(k => (k, if (k % 2 == 0) k + 100 else k)).toSet
      assert(rows(Merge.readSnapshotAsOf(spark, path, 1)) == want1)
    } finally cleanup(path)
  }

  test("timestamp-based travel resolves the newest commit at or before the ask") {
    import spark.implicits._
    val path = freshPath()
    try {
      val base = (1L to 20L).map(k => (k, k)).toDF("k", "v")
      Merge.writeBucketedSnapshot(base, path, Seq("k"), buckets = 2)
      Thread.sleep(5)
      val feed = base.filter($"k" % 2 === 0)
        .withColumn("v", $"v" + 100L)
        .withColumn("op", org.apache.spark.sql.functions.lit("U"))
        .withColumn("seq", org.apache.spark.sql.functions.lit(1L))
      Merge.applyChangesBucketed(path, feed, Seq("k"), "op", "seq", 2,
        retainHistory = true)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val times = Merge.readManifestFull(fs, path).get.commitTimes
      assert(times.keySet == Set(0L, 1L) && times(0L) < times(1L),
        s"commit times: $times")
      // exactly at seq 0's stamp -> v0; at seq 1's stamp (and later) -> v1
      assert(rows(Merge.readSnapshotAsOfTime(spark, path, times(0L))) == rows(base))
      assert(rows(Merge.readSnapshotAsOfTime(spark, path, times(1L) + 1000)) ==
        rows(spark.read.parquet(path)))
      // before the first commit: nothing existed
      intercept[IllegalArgumentException](
        Merge.readSnapshotAsOfTime(spark, path, times(0L) - 1))
      // a vacuum rewrite must NOT re-stamp existing seqs
      Merge.vacuumSnapshot(spark, path, minSeqToKeep = 0)
      assert(Merge.readManifestFull(fs, path).get.commitTimes == times,
        "vacuum re-stamped commit times")
    } finally cleanup(path)
  }

  test("same-millisecond commit stamps resolve to the latest seq (deterministic tie)") {
    import spark.implicits._
    val path = freshPath()
    try {
      val base = (1L to 20L).map(k => (k, k)).toDF("k", "v")
      Merge.writeBucketedSnapshot(base, path, Seq("k"), buckets = 2)
      val feed = base.filter($"k" % 2 === 0)
        .withColumn("v", $"v" + 100L)
        .withColumn("op", org.apache.spark.sql.functions.lit("U"))
        .withColumn("seq", org.apache.spark.sql.functions.lit(1L))
      Merge.applyChangesBucketed(path, feed, Seq("k"), "op", "seq", 2,
        retainHistory = true)
      // force the tie the wall clock rarely produces: rewrite the
      // manifest JSON so both seqs carry the SAME stamp, then ask for
      // exactly that instant — the resolution must pick max(seq), not a
      // map-iteration-order seq
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(new java.io.File(path, "_manifest.json"))
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val ct = root.`with`("commit_times_ms")
      val t0 = ct.get("0").asLong()
      ct.put("1", t0)
      // rewrite through the Hadoop fs so the local ChecksumFileSystem's
      // .crc sidecar stays in sync with the edited bytes
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val out = fs.create(new org.apache.hadoop.fs.Path(path, "_manifest.json"), true)
      try out.write(om.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
      finally out.close()
      assert(rows(Merge.readSnapshotAsOfTime(spark, path, t0)) ==
        rows(spark.read.parquet(path)),
        "a same-ms tie must serve the newest version deterministically")
    } finally cleanup(path)
  }

  test("manifest bucket checksums are invariant to input partitioning and row order") {
    import spark.implicits._
    val pathA = freshPath(); val pathB = freshPath() + "b"
    try {
      val data = (1L to 200L).map(k => (k, k * 3))
      val a = data.toDF("k", "v")
      val b = scala.util.Random.shuffle(data).toDF("k", "v").repartition(7)
      Merge.writeBucketedSnapshot(a, pathA, Seq("k"), buckets = 4)
      Merge.writeBucketedSnapshot(b, pathB, Seq("k"), buckets = 4)
      val fs = new org.apache.hadoop.fs.Path(pathA)
        .getFileSystem(spark.sessionState.newHadoopConf())
      def sums(p: String) = Merge.readManifest(fs, p).get._2
        .map { case (bk, st) => bk -> ((st.rows, st.checksum)) }
      // the per-bucket (rows, checksum) pair — q108's red-row forensic —
      // must match bit-for-bit whatever partitioning produced the files
      assert(sums(pathA) == sums(pathB))
    } finally { cleanup(pathA); cleanup(pathB) }
  }

  test("a fresh snapshot reads as-of 0 and rejects the future") {
    import spark.implicits._
    val path = freshPath()
    try {
      val base = (1L to 9L).map(k => (k, k)).toDF("k", "v")
      Merge.writeBucketedSnapshot(base, path, Seq("k"), buckets = 2)
      assert(rows(Merge.readSnapshotAsOf(spark, path, 0)) == rows(base))
      intercept[IllegalArgumentException](Merge.readSnapshotAsOf(spark, path, 1))
      intercept[IllegalArgumentException](Merge.readSnapshotAsOf(spark, path, -1))
    } finally cleanup(path)
  }
}
