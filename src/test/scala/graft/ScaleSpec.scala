package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Scale
import graft.sources.Tables

class ScaleSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  test("saltedJoin equals plain inner join on a skewed key") {
    import spark.implicits._
    // one hot key (0) carrying most rows
    val large = (1 to 1000).map(i => (if (i % 10 == 0) i.toLong else 0L, i))
      .toDF("k", "v")
    val small = Seq((0L, "hot"), (10L, "ten"), (20L, "twenty")).toDF("k", "name")
    val expected = large.join(small, "k").select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = Scale.saltedJoin(large, small, "k", salts = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == expected)
    assert(salted.nonEmpty)
  }

  test("AQE splits a skewed join at runtime") {
    import spark.implicits._
    // one key carries ~all rows; thresholds lowered so the tiny fixture
    // trips the same runtime skew handling a 100 TB join would
    val conf = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      val large = spark.range(200000)
        .select((when($"id" % 100 === 0, $"id").otherwise(lit(7L))).as("k"),
          concat(lit("payload_"), $"id").as(("v")))
      val small = spark.range(2000).select($"id".as("k"), lit("dim").as("name"))
      val joined = large.join(small, "k")
      // execute THIS QueryExecution (a write action would plan its own),
      // so executedPlan is the final adaptive plan
      assert(joined.collect().nonEmpty)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected runtime skew split in plan:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val lineitem = Tables.lineitem(spark, "/root/testdata/sf0.001")
    Scale.writeBucketed(orders, "orders_b", "o_orderkey", 8)
    Scale.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", "o_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == lineitem.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bloomPruneJoin equals plain join and pre-filters the large side") {
    import spark.implicits._
    val large = (1 to 10000).map(i => (i.toLong % 500, i)).toDF("k", "v")
    val small = Seq(3L, 7L, 11L).map(k => (k, s"dim$k")).toDF("k", "name")
    val got = Scale.bloomPruneJoin(large, small, "k")
      .select($"k", $"v", $"name").collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val exp = large.join(small, "k")
      .select($"k", $"v", $"name").collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got == exp && got.nonEmpty)
    // over a LocalRelation the optimizer evaluates the bloom filter at
    // plan time (ConvertToLocalRelation), so assert on the analyzed plan
    val plan = Scale.bloomPruneJoin(large, small, "k").queryExecution.analyzed.toString
    assert(plan.contains("might_contain"), plan)
  }

  test("prefixSum equals a global-window running sum, without the single task") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 5000).map(i => ((i * 37) % 4999, i % 97)).toDF("k", "v")
      .dropDuplicates("k")
    val got = graft.operators.Scale.prefixSum(df, "k", "v", "cum")
      .select($"k", $"cum")
    val exp = df.withColumn("cum",
      sum($"v".cast("long")).over(
        Window.orderBy($"k").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"k", $"cum".as("cum_exp"))
    assert(got.join(exp, "k").filter($"cum" =!= $"cum_exp").count() == 0)
    assert(got.count() == df.count())
  }

  test("bloomPruneAntiJoin equals a plain left_anti join") {
    import spark.implicits._
    val large = (1L to 5000L).map(i => (i % 997, i % 31, i)).toDF("a", "b", "payload")
    val small = (1L to 300L).map(i => (i % 997, i % 31)).toDF("a", "b").distinct()
    val got = Scale.bloomPruneAntiJoin(large, small, Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exp = large.join(small, Seq("a", "b"), "left_anti")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exp && got.nonEmpty && got.size < 5000)
  }

  test("bloomPruneAntiJoin against an EMPTY right side keeps all rows") {
    import spark.implicits._
    // BloomFilterAggregate over zero rows is a NULL bloom; without the
    // guard both branches filter to nothing and the anti join lies
    val large = (1L to 500L).map(i => (i % 97, i % 13, i)).toDF("a", "b", "payload")
    val small = large.filter($"payload" < 0).select($"a", $"b")
    assert(small.isEmpty)
    assert(Scale.bloomPruneAntiJoin(large, small, Seq("a", "b")).count() == 500L)
  }

  test("groupedPrefixSum equals per-group window cumsums, inclusive and exclusive") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // spine shape: one row per (group, order key)
    val df = (1 to 4000).map(i => (s"g${i % 3}", (i * 131) % 3989, i % 53))
      .toDF("g", "k", "v").dropDuplicates("g", "k")
    val w = Window.partitionBy($"g").orderBy($"k")
    val expInc = df.withColumn("ce",
      sum($"v".cast("long")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val expExc = df.withColumn("ce",
      coalesce(sum($"v".cast("long")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val gotInc = Scale.groupedPrefixSum(df, Seq("g"), "k", "v", "cum")
    val gotExc = Scale.groupedPrefixSum(df, Seq("g"), "k", "v", "cum", inclusive = false)
    for ((got, exp) <- Seq((gotInc, expInc), (gotExc, expExc))) {
      assert(got.join(exp, Seq("g", "k")).filter($"cum" =!= $"ce").count() == 0)
      assert(got.count() == df.count())
    }
  }

  test("groupedPrefixSum is invariant under input partitioning and handles null groups") {
    import spark.implicits._
    val df = (1 to 2000).map(i =>
      (if (i % 7 == 0) null else s"g${i % 4}", i, i % 11)).toDF("g", "k", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Scale.groupedPrefixSum(d, Seq("g"), "k", "v", "cum")
        .select($"g", $"k", $"cum").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(run(df) == run(df.repartition(13)))
    // the null group accumulates independently of "null"-the-string
    val withNullStr = df.union(Seq(("null", 1, 5)).toDF("g", "k", "v"))
    val out = run(withNullStr)
    assert(out.exists(_._1 == null) && out.exists(_._1 == "null"))
  }

  test("groupedMidranks matches rank()-window doubled midranks on a multi-group pool") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rows = (1 to 3000).map(i => (s"f${i % 3}", (i * 17) % 200))
      .toDF("g", "x")
    val spine = Scale.groupedMidranks(rows, Seq("g"), "x")
    val w = Window.partitionBy($"g").orderBy($"x")
    val wt = Window.partitionBy($"g", $"x")
    val exp = rows
      .withColumn("r2e", rank().over(w).cast("long") * 2 +
        count(lit(1)).over(wt).cast("long") - 1)
      .select($"g", $"x", $"r2e").distinct()
    val joined = spine.join(exp, Seq("g", "x"))
    assert(joined.count() == spine.count() && spine.count() > 0)
    assert(joined.filter($"rank2" =!= $"r2e").count() == 0)
    // ECDF count = cum; tie counts sum back to the row count
    assert(spine.agg(sum($"ties")).collect()(0).getLong(0) == rows.count())
  }

  test("writePartitioned produces prunable directory layout") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_part").toString
    val df = Seq((1, "2024-01-01", 10.0), (2, "2024-01-02", 20.0),
      (3, "2024-01-01", 30.0)).toDF("id", "day", "v")
    Scale.writePartitioned(df, dir, Seq("day"))
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("day="))
    assert(dirs.toSet == Set("day=2024-01-01", "day=2024-01-02"))
    // partition filter prunes: only one partition's rows are read
    val pruned = spark.read.parquet(dir).filter($"day" === "2024-01-01")
    assert(pruned.collect().map(_.getAs[Int]("id")).toSet == Set(1, 3))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"))
  }

  test("zValue interleaves bits; zOrderWrite clusters BOTH dimensions per file") {
    import spark.implicits._
    // bit-interleave spot checks: a=0b11, b=0 -> 0b0101; a=0, b=0b11 -> 0b1010
    val z = Seq((3L, 0L), (0L, 3L), (3L, 3L)).toDF("a", "b")
      .select(Scale.zValue($"a", $"b", 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(z == Seq(5L, 10L, 15L))

    // uniform 2-D grid written z-ordered into 16 files: every file's
    // bounding box must be narrow on BOTH dims (~1/4 of each range for
    // 16 files) — a single-column sort would leave one dim at full width
    val n = 64
    val grid = for (a <- 0 until n; b <- 0 until n) yield (a.toLong, b.toLong)
    val dir = Files.createTempDirectory("graft_zorder").toString
    Scale.zOrderWrite(grid.toDF("a", "b"), dir, "a", "b", files = 16, bits = 6)
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max($"a") - min($"a")).as("sa"), (max($"b") - min($"b")).as("sb"))
      .collect()
    assert(spans.length >= 8, s"expected ~16 files, got ${spans.length}")
    val avgA = spans.map(_.getAs[Long]("sa")).sum.toDouble / spans.length
    val avgB = spans.map(_.getAs[Long]("sb")).sum.toDouble / spans.length
    // full range is 63; z-clustering should hold both dims well under half
    assert(avgA < 32 && avgB < 32, s"per-file spans too wide: a=$avgA b=$avgB")
  }

  test("compact rewrites a many-small-file layout preserving every row") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact").toString
    (0 until 1000).toDF("v").repartition(64).write.mode("overwrite").parquet(dir)
    def parquetFiles = new java.io.File(dir).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(parquetFiles == 64)
    val before = spark.read.parquet(dir).collect().map(_.getInt(0)).toSet
    Scale.compact(spark, dir, targetBytes = 1L * 1024 * 1024)
    assert(parquetFiles < 8, s"still $parquetFiles files after compaction")
    val after = spark.read.parquet(dir).collect().map(_.getInt(0)).toSet
    assert(after == before)
  }

  test("compact refuses a hive-partitioned layout instead of flattening it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact_part").toString
    Seq((1, "a"), (2, "b")).toDF("v", "p")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Scale.compact(spark, dir)
    }
    assert(e.getMessage.contains("partitioned"))
  }

  test("prefixSums equals per-column global-window cumsums, inclusive and exclusive") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 4000).map(i => ((i * 37) % 3989, i % 97, i % 13))
      .toDF("k", "a", "b").dropDuplicates("k")
    val w = Window.orderBy($"k")
    for (inc <- Seq(true, false)) {
      val frame = if (inc)
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else w.rowsBetween(Window.unboundedPreceding, -1)
      val exp = df
        .withColumn("ae", coalesce(sum($"a".cast("long")).over(frame), lit(0L)))
        .withColumn("be", coalesce(sum($"b".cast("long")).over(frame), lit(0L)))
      val got = Scale.prefixSums(df, "k", Seq("a", "b"), inclusive = inc)
      assert(got.join(exp, Seq("k"))
        .filter($"a_cum" =!= $"ae" || $"b_cum" =!= $"be").count() == 0)
      assert(got.count() == df.count())
    }
  }

  test("prefixSumD matches the sequential double cumsum and is partition-invariant") {
    import spark.implicits._
    val df = (1 to 3000).map(i => ((i * 61) % 2999, 1.0 / (1 + i % 89)))
      .toDF("k", "v").dropDuplicates("k")
    // sequential driver-side reference in ascending-k order
    val exp = df.collect().map(r => (r.getInt(0), r.getDouble(1)))
      .sortBy(_._1).scanLeft((0, 0.0)) { case ((_, acc), (k, v)) => (k, acc + v) }
      .drop(1).toMap
    def run(d: org.apache.spark.sql.DataFrame) =
      Scale.prefixSumD(d, "k", "v", "cum").select($"k", $"cum")
        .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    for (got <- Seq(run(df), run(df.repartition(17)))) {
      assert(got.size == exp.size)
      // partition-boundary reassociation may move the last ulps only
      got.foreach { case (k, v) => assert(math.abs(v - exp(k)) < 1e-9, s"k=$k") }
    }
  }

  test("prefixMax equals the running-max window, asc/desc, incl/excl, native type") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // longs near 2^60: a double round-trip would corrupt them
    val big = 1L << 60
    val df = (1 to 3000).map(i => ((i * 53) % 2999, big + ((i * 7919L) % 1000000)))
      .toDF("k", "v").dropDuplicates("k")
    for (desc <- Seq(false, true); inc <- Seq(true, false)) {
      val ord = if (desc) $"k".desc else $"k".asc
      val frame = Window.orderBy(ord).rowsBetween(
        Window.unboundedPreceding, if (inc) Window.currentRow else -1)
      val exp = df.withColumn("me", max($"v").over(frame))
      val got = Scale.prefixMax(df, "k", "v", "m",
        descending = desc, inclusive = inc)
      assert(got.schema("m").dataType ==
        org.apache.spark.sql.types.LongType)
      val bad = got.join(exp, Seq("k"))
        .filter(!($"m" <=> $"me")).count()
      assert(bad == 0, s"desc=$desc inc=$inc: $bad mismatches")
      assert(got.count() == df.count())
    }
  }
}
