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
