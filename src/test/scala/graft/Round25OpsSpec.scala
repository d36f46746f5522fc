package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.TimeSeries

/** Round-6 seventeenth-wave operators: Holt smoothing, burstiness. */
class Round25OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private def r6(x: Double) = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("holtForecast reproduces the hand-computed level/trend recursion") {
    import spark.implicits._
    val df = Seq(("k", 1L, 10.0), ("k", 2L, 12.0), ("k", 3L, 14.0),
      ("k", 4L, 13.0)).toDF("k", "o", "v")
    val r = TimeSeries.holtForecast(df, "k", "o", "v").collect()(0)
    // l0=10, b0=0; fold 12, 14, 13 at alpha=.3, beta=.1
    var l = 10.0; var b = 0.0
    for (v <- Seq(12.0, 14.0, 13.0)) {
      val nl = 0.3 * v + (1.0 - 0.3) * (l + b)
      val nb = 0.1 * (nl - l) + (1.0 - 0.1) * b
      l = nl; b = nb
    }
    assert(r.getInt(1) == 4)
    assert(r.getDouble(2) == r6(l) && r.getDouble(3) == r6(b))
    assert(r.getDouble(4) == r6(l + b))
  }

  test("holtForecast order comes from orderCol, not arrival; <2 points dropped") {
    import spark.implicits._
    val shuffled = Seq(("k", 3L, 14.0), ("k", 1L, 10.0), ("k", 4L, 13.0),
      ("k", 2L, 12.0), ("solo", 1L, 5.0)).toDF("k", "o", "v")
      .repartition(7)
    val rows = TimeSeries.holtForecast(shuffled, "k", "o", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(rows.keySet == Set("k")) // solo has 1 point
    val ordered = TimeSeries.holtForecast(
      Seq(("k", 1L, 10.0), ("k", 2L, 12.0), ("k", 3L, 14.0),
        ("k", 4L, 13.0)).toDF("k", "o", "v"), "k", "o", "v")
      .collect()(0).getDouble(4)
    assert(rows("k") == ordered)
  }

  test("burstiness: constant activity ~ sub-Poisson, concentrated activity bursty") {
    import spark.implicits._
    // 10 observed days. steady: 1 event each of 10 days (var 0 -> F 0).
    // bursty: 10 events on one day, 9 days silent.
    val steady = (1 to 10).map(i => ("s", f"2024-01-$i%02d 00:00:00"))
    val bursty = (1 to 10).map(_ => ("b", "2024-01-05 00:00:00"))
    val df = (steady ++ bursty).toDF("k", "ts")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts")
        .cast("timestamp"))
    val r = TimeSeries.burstiness(df, "k", "ts").collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(4), x.getDouble(5))))
      .toMap
    val (nd, act, mean, fano) = r("s")
    assert(nd == 10 && act == 10 && mean == 1.0 && fano == 0.0)
    val (_, actB, meanB, fanoB) = r("b")
    // var = (10*100 - 100)/90 = 10; mean 1 -> F = 10
    assert(actB == 1 && meanB == 1.0 && fanoB == 10.0)
  }
}
