package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Metrics, Mixing}

/** Round-6 twenty-ninth-wave operators: Lorenz deciles, embargo split.
  * (q270's streaming heavy hitters is covered by the hash-equality of
  * the stream query against the batch oracle.) */
class Round14OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  // ---- lorenzDeciles -------------------------------------------------------

  test("lorenzDeciles: uniform mass climbs linearly to 1.0") {
    import spark.implicits._
    val df = (1 to 20).map(i => ("g", i, 5.0)).toDF("g", "id", "x")
    val out = Metrics.lorenzDeciles(df, "g", "x", "id")
      .orderBy("decile").collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(2)).forall(_ == 2L)) // 2 members each
    assert(out.map(_.getDouble(3)).toSeq ==
      (1 to 10).map(d => d / 10.0).toSeq)
    assert(out.last.getDouble(3) == 1.0)
  }

  test("lorenzDeciles: one member holding everything → bottom shares 0") {
    import spark.implicits._
    val df = ((1 to 9).map(i => ("g", i, 0.0)) :+ (("g", 10, 100.0)))
      .toDF("g", "id", "x")
    val out = Metrics.lorenzDeciles(df, "g", "x", "id")
      .orderBy("decile").collect()
    assert(out.take(9).forall(_.getDouble(3) == 0.0))
    assert(out.last.getDouble(3) == 1.0)
  }

  test("lorenzDeciles decile sizes follow the floor formula when n < 10") {
    import spark.implicits._
    // n = 4: ranks 1..4 → deciles ⌊(i−1)·10/4⌋+1 = 1, 3, 6, 8
    val df = Seq(("g", 1, 1.0), ("g", 2, 2.0), ("g", 3, 3.0),
      ("g", 4, 4.0)).toDF("g", "id", "x")
    val out = Metrics.lorenzDeciles(df, "g", "x", "id")
      .orderBy("decile").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 3, 6, 8))
  }

  test("lorenzDeciles is partitioning-invariant") {
    import spark.implicits._
    val df = (1 to 137).map(i => ("g" + (i % 2), i, (i % 19) * 2.5))
      .toDF("g", "id", "x")
    val a = Metrics.lorenzDeciles(df.repartition(1), "g", "x", "id")
      .orderBy("g", "decile").collect().toSeq
    val b = Metrics.lorenzDeciles(df.repartition(11), "g", "x", "id")
      .orderBy("g", "decile").collect().toSeq
    assert(a == b)
  }

  // ---- embargoSplit --------------------------------------------------------

  test("embargoSplit tags train/test and drops the embargo window") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq((1, ts("2024-01-10 12:00:00")),
      (2, ts("2024-01-18 23:59:59")), // boundary day → train
      (3, ts("2024-01-19 00:00:01")), // embargo → dropped
      (4, ts("2024-01-22 12:00:00")), // embargo last day → dropped
      (5, ts("2024-01-23 00:00:01"))) // after embargo → test
      .toDF("id", "ts")
    val out = Mixing.embargoSplit(df, "ts", "2024-01-18", 4)
      .collect().map(r => r.getInt(0) -> r.getString(2)).toMap
    assert(out == Map(1 -> "train", 2 -> "train", 5 -> "test"))
  }

  test("embargoSplit with zero embargo keeps every row") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq((1, ts("2024-01-18 10:00:00")),
      (2, ts("2024-01-19 10:00:00"))).toDF("id", "ts")
    val out = Mixing.embargoSplit(df, "ts", "2024-01-18", 0)
      .collect().map(r => r.getInt(0) -> r.getString(2)).toMap
    assert(out == Map(1 -> "train", 2 -> "test"))
  }
}
