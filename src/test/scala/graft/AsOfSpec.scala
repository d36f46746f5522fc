package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("asofJoin picks the nearest prior right row per key, inclusive at ties") {
    import spark.implicits._
    val left = Seq((1L, 1L, ts(10)), (2L, 1L, ts(20)), (3L, 2L, ts(5)), (4L, 3L, ts(30)))
      .toDF("id", "k", "t")
    val right = Seq((1L, ts(8), "a"), (1L, ts(15), "b"), (1L, ts(20), "c"), (2L, ts(7), "x"))
      .toDF("k", "t", "v")
    val out = AsOf.asofJoin(left, right, "k", "t", "t", Seq("t", "v"))
      .select($"id", $"asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) == Some("a"))   // 8 <= 10
    assert(out(2L) == Some("c"))   // tie at 20 is inclusive
    assert(out(3L) == None)        // no right row at or before 5
    assert(out(4L) == None)        // key 3 has no history
  }
}
