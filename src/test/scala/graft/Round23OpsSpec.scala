package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{TextAnalysis, TimeSeries}

/** Round-6 fifteenth-wave operators: rolling distinct, boilerplate. */
class Round23OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  test("rollingDistinctDaily counts each user once per window") {
    import spark.implicits._
    // u1 active days 1,2; u2 active day 3; window 2:
    // day1: 1d={u1} w={u1}; day2: 1d={u1} w={u1}; day3: 1d={u2} w={u1,u2}
    val df = Seq(("u1", "2024-01-01"), ("u1", "2024-01-01"),
      ("u1", "2024-01-02"), ("u2", "2024-01-03"))
      .toDF("u", "ts")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts")
        .cast("timestamp"))
    val r = TimeSeries.rollingDistinctDaily(df, "u", "ts", 2)
      .collect().map(x => x.getDate(0).toString ->
        ((x.getLong(1), x.getLong(2)))).toMap
    assert(r("2024-01-01") == ((1L, 1L)))
    assert(r("2024-01-02") == ((1L, 1L))) // u1 counted once, not twice
    assert(r("2024-01-03") == ((1L, 2L))) // u1 carries in from day 2
  }

  test("rollingDistinctDaily clips contributions past the observed range") {
    import spark.implicits._
    val df = Seq(("u", "2024-01-01")).toDF("u", "ts")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts")
        .cast("timestamp"))
    val r = TimeSeries.rollingDistinctDaily(df, "u", "ts", 7).collect()
    assert(r.length == 1) // no phantom days 02..07
  }

  test("boilerplateRatio flags sentences shared beyond minDocs others") {
    import spark.implicits._
    // "common." appears in docs 1-4 (df=4 > 3); each doc also has a
    // unique sentence -> ratio 0.5 for docs 1-4; doc 5 all-unique -> 0
    val docs = (1 to 4).map(i => (i.toLong, s"common. unique$i."))
      .toDF("doc_id", "text")
      .unionAll(Seq((5L, "alone here. nothing shared."))
        .toDF("doc_id", "text"))
    val r = TextAnalysis.boilerplateRatio(docs, "doc_id", "text", 3)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((2L, 1L, 0.5)))
    assert(r(5L) == ((2L, 0L, 0.0)))
  }

  test("boilerplateRatio: duplicate sentences within one doc count once") {
    import spark.implicits._
    // each doc has "dup." twice; df counts DISTINCT docs (3 < minDocs+1
    // when minDocs=3 needs >3) -> with 4 docs it flips to boilerplate
    val three = (1 to 3).map(i => (i.toLong, "dup. dup.")).toDF("doc_id", "text")
    val r3 = TextAnalysis.boilerplateRatio(three, "doc_id", "text", 3)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r3.values.forall(_ == 0L)) // df=3, needs >3
    val four = (1 to 4).map(i => (i.toLong, "dup. dup.")).toDF("doc_id", "text")
    val r4 = TextAnalysis.boilerplateRatio(four, "doc_id", "text", 3)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r4.values.forall(_ == 1L))
  }
}
