package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sources.{Formats, Tables}

/** Round-trip every supported batch format and prove reads are faithful. */
class FormatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)
  private val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("parquet, orc, csv, and json round-trip the nation table") {
    val nation = Tables.nation(spark, sf)
    val expected = rows(nation)
    val base = Files.createTempDirectory("graft_fmt").toString

    Formats.writeParquet(nation, s"$base/p")
    assert(rows(Formats.readParquet(spark, s"$base/p")) == expected)

    Formats.writeOrc(nation, s"$base/o")
    assert(rows(Formats.readOrc(spark, s"$base/o")) == expected)

    Formats.writeCsv(nation, s"$base/c")
    assert(rows(Formats.readCsv(spark, s"$base/c", nation.schema)) == expected)

    Formats.writeJson(nation, s"$base/j")
    assert(rows(Formats.readJson(spark, s"$base/j", nation.schema)) == expected)
  }

  test("avro round-trips every supported primitive, nulls, and timestamp micros") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft_avro").toString
    val df = Seq(
      (1L, 10, 1.5, true, "abc", "2021-03-04 05:06:07.123456", "2020-01-31"),
      (2L, -7, -0.25, false, "", "1999-12-31 23:59:59.999999", "1970-01-01"))
      .toDF("l", "i", "d", "b", "s", "ts", "dt")
      .withColumn("ts", to_timestamp($"ts"))
      .withColumn("dt", to_date($"dt"))
      .withColumn("bin", when($"l" === 1L, $"s".cast("binary")))
      .withColumn("maybe", when($"l" === 1L, $"d")) // null on row 2
    Formats.writeAvro(df, s"$base/a")
    val back = Formats.readAvro(spark, s"$base/a", df.schema)
    assert(back.schema == df.schema)
    // byte arrays compare by reference in Row.mkString — render as hex
    def canon(d: org.apache.spark.sql.DataFrame): Set[String] =
      rows(d.withColumn("bin", hex($"bin")))
    assert(canon(back) == canon(df))
    // sub-millisecond precision survives (micros logical type)
    val us = back.filter($"l" === 1L)
      .select(date_format($"ts", "SSSSSS")).collect()(0).getString(0)
    assert(us == "123456")
  }

  test("avro round-trips the orders table and the write is map-only (no shuffle)") {
    val orders = Tables.orders(spark, sf)
    val base = Files.createTempDirectory("graft_avro2").toString
    Formats.writeAvro(orders, s"$base/orders")
    val back = Formats.readAvro(spark, s"$base/orders", orders.schema)
    assert(rows(back) == rows(orders))
    // one container file per input partition: the write job never shuffles
    val parts = orders.rdd.getNumPartitions
    val files = new java.io.File(s"$base/orders").listFiles()
      .count(_.getName.endsWith(".avro"))
    assert(files == parts, s"expected $parts avro part files, got $files")
  }

  test("predicate pushdown reaches orc scans too") {
    val base = Files.createTempDirectory("graft_orc").toString
    Formats.writeOrc(Tables.customer(spark, sf), s"$base/c")
    val plan = Formats.readOrc(spark, s"$base/c")
      .filter("c_custkey < 10").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_custkey), LessThan(c_custkey,10)]"))
  }

  test("schema evolution: mergeSchema reads old and new file generations together") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // generation 1 lacks the column a later pipeline version added
    val base = Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$base/t")
    Seq((3L, "c", 0.5)).toDF("id", "v", "score")
      .write.mode("append").parquet(s"$base/t")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$base/t")
    assert(merged.columns.toSet == Set("id", "v", "score"))
    val byId = merged.select($"id", coalesce($"score", lit(-1.0)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // old-generation rows surface the new column as null, new rows keep it
    assert(byId == Map(1L -> -1.0, 2L -> -1.0, 3L -> 0.5))
  }
}
