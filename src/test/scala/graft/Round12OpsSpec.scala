package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Similarity, TimeSeries}

/** Round-6 fourth-wave operators: OHLC resample, centroid geometry,
  * TWAP. */
class Round12OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  // ---- TimeSeries.resampleOhlc ---------------------------------------------

  test("resampleOhlc picks open/close by time with deterministic ties") {
    import spark.implicits._
    val df = Seq(
      // one Monday-started week; two rows share the open timestamp —
      // the lower tie id must win open
      ("u", "2024-01-01 09:00:00", 1L, 10.0),
      ("u", "2024-01-01 09:00:00", 2L, 99.0),
      ("u", "2024-01-03 09:00:00", 3L, -5.0),
      ("u", "2024-01-05 09:00:00", 4L, 42.0),
      // next week
      ("u", "2024-01-08 09:00:00", 5L, 7.0)
    ).toDF("k", "ts", "id", "v").withColumn("ts", $"ts".cast("timestamp"))
    val out = TimeSeries.resampleOhlc(df, "k", "ts", "id", "v", "week")
      .orderBy("period").collect()
    assert(out.length == 2)
    val w1 = out(0)
    assert(w1.getDouble(2) == 10.0 && w1.getDouble(3) == 99.0 &&
      w1.getDouble(4) == -5.0 && w1.getDouble(5) == 42.0 &&
      w1.getLong(6) == 4)
    assert(out(1).getDouble(2) == 7.0 && out(1).getLong(6) == 1)
  }

  test("resampleOhlc is partitioning-invariant") {
    import spark.implicits._
    val df = (1 to 200).map(i => (s"u${i % 5}",
        f"2024-01-${1 + i % 28}%02d 0${i % 10}:00:00", i.toLong,
        (i * 37 % 101).toDouble))
      .toDF("k", "ts", "id", "v").withColumn("ts", $"ts".cast("timestamp"))
    val a = TimeSeries.resampleOhlc(df, "k", "ts", "id", "v", "week")
      .collect().map(_.toSeq).toSet
    val b = TimeSeries.resampleOhlc(df.repartition(13), "k", "ts", "id",
      "v", "week").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  // ---- TimeSeries.twapPerKey -----------------------------------------------

  test("twapPerKey weights values by holding duration") {
    import spark.implicits._
    // v=10 held 1s, v=20 held 3s, v=99 terminal (no weight)
    val df = Seq(("k", "2024-01-01 00:00:00", 10.0),
        ("k", "2024-01-01 00:00:01", 20.0),
        ("k", "2024-01-01 00:00:04", 99.0))
      .toDF("k", "ts", "v").withColumn("ts", $"ts".cast("timestamp"))
    val r = TimeSeries.twapPerKey(df, "k", "ts", "v").collect()(0)
    assert(r.getLong(1) == 3)
    assert(r.getDouble(2) == 4.0)                    // span 4 seconds
    assert(r.getDouble(3) == (10.0 * 1 + 20.0 * 3) / 4)
  }

  test("twapPerKey drops single-event keys") {
    import spark.implicits._
    val df = Seq(("a", "2024-01-01 00:00:00", 5.0),
        ("b", "2024-01-01 00:00:00", 1.0),
        ("b", "2024-01-01 00:01:00", 2.0))
      .toDF("k", "ts", "v").withColumn("ts", $"ts".cast("timestamp"))
    val out = TimeSeries.twapPerKey(df, "k", "ts", "v").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("b"))
  }

  // ---- Similarity.centroidSimilarity ---------------------------------------

  test("centroidSimilarity matches hand-computed centroid cosines") {
    import spark.implicits._
    // label 0: vectors (1,0),(3,0) -> centroid (2,0)
    // label 1: (0,2) -> centroid (0,2);  label 2: (4,4) -> (4,4)
    val df = Seq((0, Seq(1f, 0f)), (0, Seq(3f, 0f)), (1, Seq(0f, 2f)),
      (2, Seq(4f, 4f))).toDF("label", "embedding")
    val m = Similarity.centroidSimilarity(df, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3))
      .toMap
    assert(m((0, 1)) == 0.0)
    assert(m((0, 2)) == BigDecimal(1.0 / math.sqrt(2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(m((1, 2)) == m((0, 2)))
  }

  test("centroidSimilarity keeps element order under partitioning") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 4, Seq.tabulate(8)(j =>
      ((i * 31 + j * 7) % 13).toFloat))).toDF("label", "embedding")
    val a = Similarity.centroidSimilarity(df, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(3))).toSet
    val b = Similarity
      .centroidSimilarity(df.repartition(11), "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(3))).toSet
    assert(a == b)
  }
}
