package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{TextAnalysis, TimeSeries}

/** Round-6 thirteenth-wave operators: readability, streaks. */
class Round21OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  test("fleschReadingEase: hand-computed counts and score") {
    import spark.implicits._
    // "the cat sat. it ran!" -> 2 sentences, 5 words
    // syllables: the(1) cat(1) sat.(1) it(1) ran!(1) = 5
    val df = Seq((1L, "the cat sat. it ran!")).toDF("id", "text")
    val r = TextAnalysis.fleschReadingEase(df, "id", "text").collect()(0)
    assert(r.getInt(1) == 2 && r.getInt(2) == 5 && r.getLong(3) == 5)
    val expected = BigDecimal(206.835 - 1.015 * (5.0 / 2) - 84.6 * (5.0 / 5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) == expected)
  }

  test("fleschReadingEase: vowelless words floor at 1 syllable; empty text") {
    import spark.implicits._
    val df = Seq((1L, "tsk tsk hmm"), (2L, "")).toDF("id", "text")
    val rows = TextAnalysis.fleschReadingEase(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(3) == 3) // floored syllables
    assert(rows(2L).getInt(2) == 0 && rows(2L).isNullAt(4))
  }

  test("longestDailyStreak: gaps split runs, duplicates within a day collapse") {
    import spark.implicits._
    // days 1,2,3, gap, 5,6 -> longest 3, active 5; day 2 duplicated
    val df = Seq("01", "02", "02", "03", "05", "06")
      .map(dd => ("u", s"2024-03-$dd 10:00:00"))
      .toDF("u", "ts")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts")
        .cast("timestamp"))
    val r = TimeSeries.longestDailyStreak(df, "u", "ts").collect()(0)
    assert(r.getLong(1) == 5 && r.getLong(2) == 3)
  }

  test("longestDailyStreak: a single active day is a streak of 1") {
    import spark.implicits._
    val df = Seq(("u", "2024-03-01 00:00:00")).toDF("u", "ts")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts")
        .cast("timestamp"))
    val r = TimeSeries.longestDailyStreak(df, "u", "ts").collect()(0)
    assert(r.getLong(1) == 1 && r.getLong(2) == 1)
  }
}
