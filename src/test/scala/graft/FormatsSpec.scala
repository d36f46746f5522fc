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
}
