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

  test("asofJoinForward picks the nearest following right row, inclusive") {
    import spark.implicits._
    val left = Seq((1L, 1L, ts(10)), (2L, 1L, ts(20)), (3L, 2L, ts(50)), (4L, 3L, ts(30)))
      .toDF("id", "k", "t")
    val right = Seq((1L, ts(12), "a"), (1L, ts(20), "b"), (1L, ts(25), "c"), (2L, ts(7), "x"))
      .toDF("k", "t", "v")
    val out = AsOf.asofJoinForward(left, right, "k", "t", "t", Seq("t", "v"))
      .select($"id", $"asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) == Some("a"))   // 12 >= 10 is the nearest following
    assert(out(2L) == Some("b"))   // tie at 20 is inclusive
    assert(out(3L) == None)        // no right row at or after 50
    assert(out(4L) == None)        // key 3 has no future
  }

  test("asofJoinForward matches per-row brute force on randomized data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (1 to 400).map(i =>
      (i.toLong, (rnd.nextInt(20) + 1).toLong, ts(rnd.nextInt(60))))
    val right = (1 to 300).map(i =>
      ((rnd.nextInt(25) + 1).toLong, ts(rnd.nextInt(60)), s"v$i"))
    val got = AsOf.asofJoinForward(left.toDF("id", "k", "t").repartition(7),
        right.toDF("k", "t", "v").repartition(5), "k", "t", "t", Seq("t", "v"))
      .select($"id", $"asof_t").collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    left.foreach { case (id, k, t) =>
      val expected = right.filter(r => r._1 == k && !r._2.before(t))
        .map(_._2).sortBy(_.getTime).headOption
      assert(got(id) == expected, s"row $id key $k t $t")
    }
  }

  test("asofJoin matches per-row brute force on randomized data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 400).map(i =>
      (i.toLong, (rnd.nextInt(20) + 1).toLong, ts(rnd.nextInt(60))))
    val right = (1 to 300).map(i =>
      ((rnd.nextInt(25) + 1).toLong, ts(rnd.nextInt(60)), s"v$i"))
    val leftDf = left.toDF("id", "k", "t").repartition(7) // scrambled layout
    val rightDf = right.toDF("k", "t", "v").repartition(5)

    val got = AsOf.asofJoin(leftDf, rightDf, "k", "t", "t", Seq("t", "v"))
      .select($"id", $"asof_t").collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap

    left.foreach { case (id, k, t) =>
      // brute force: greatest right t <= left t within the key
      val expected = right.filter(r => r._1 == k && !r._2.after(t))
        .map(_._2).sortBy(_.getTime).lastOption
      assert(got(id) == expected, s"row $id key $k t $t")
    }
  }
}
