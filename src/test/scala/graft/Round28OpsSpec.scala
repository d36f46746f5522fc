package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Merge, TimeSeries}

/** Round-6 twentieth-wave operators: temporal join, concurrency. */
class Round28OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  test("temporalJoin picks the version valid AT the fact's event time") {
    import spark.implicits._
    val dim = Seq(
      (1L, "bronze", "2024-01-01", "2024-02-01"),
      (1L, "gold", "2024-02-01", null))
      .toDF("k", "tier", "valid_from", "valid_to")
      .withColumn("valid_from", $"valid_from".cast("timestamp"))
      .withColumn("valid_to", $"valid_to".cast("timestamp"))
    val facts = Seq(
      (1L, "2023-12-25"), // before first version -> NULL
      (1L, "2024-01-15"), // bronze
      (1L, "2024-02-01"), // boundary: new regime starts AT valid_from
      (2L, "2024-01-15")) // unknown key -> NULL
      .toDF("k", "ts").withColumn("ts", $"ts".cast("timestamp"))
    val r = Merge.temporalJoin(facts, "k", "ts", dim, "k")
      .select($"ts".cast("string"), $"tier", $"k")
      .collect().map(x => (x.getLong(2), x.getString(0).take(10)) ->
        Option(x.getString(1))).toMap
    assert(r((1L, "2023-12-25")).isEmpty)
    assert(r((1L, "2024-01-15")).contains("bronze"))
    assert(r((1L, "2024-02-01")).contains("gold"))
    assert(r((2L, "2024-01-15")).isEmpty)
    // exactly one output row per fact (intervals don't overlap)
    assert(Merge.temporalJoin(facts, "k", "ts", dim, "k").count() == 4)
  }

  test("temporalJoin: zero-width versions (same-instant flips) never match") {
    import spark.implicits._
    val dim = Seq(
      (1L, "a", "2024-01-01", "2024-01-01"), // zero-width
      (1L, "b", "2024-01-01", null))
      .toDF("k", "tier", "valid_from", "valid_to")
      .withColumn("valid_from", $"valid_from".cast("timestamp"))
      .withColumn("valid_to", $"valid_to".cast("timestamp"))
    val facts = Seq((1L, "2024-01-01")).toDF("k", "ts")
      .withColumn("ts", $"ts".cast("timestamp"))
    val r = Merge.temporalJoin(facts, "k", "ts", dim, "k").collect()
    assert(r.length == 1 && r(0).getAs[String]("tier") == "b")
  }

  test("dailyConcurrency counts inclusive interval coverage per day") {
    import spark.implicits._
    val spans = Seq(
      ("2024-01-01", "2024-01-03"),
      ("2024-01-02", "2024-01-02"),
      ("2024-01-05", "2024-01-05"))
      .toDF("s", "e")
      .withColumn("s", $"s".cast("timestamp"))
      .withColumn("e", $"e".cast("timestamp"))
    val r = TimeSeries.dailyConcurrency(spans, "s", "e")
      .collect().map(x => x.getDate(0).toString -> x.getLong(1)).toMap
    assert(r == Map("2024-01-01" -> 1L, "2024-01-02" -> 2L,
      "2024-01-03" -> 1L, "2024-01-05" -> 1L)) // 01-04 absent
  }
}
