package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Graph, Metrics, TimeSeries}

/** Round-6 eleventh-wave operators: OLS-2, disorder audit, k-core. */
class Round19OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  test("ols2 recovers exact coefficients from noiseless integer data") {
    import spark.implicits._
    // y = 7 + 3*x1 - 2*x2 exactly, over a grid (det != 0)
    val rows = for (x1 <- 0 to 5; x2 <- 0 to 4)
      yield ("g", x1.toLong, x2.toLong, 7L + 3 * x1 - 2 * x2)
    val r = Metrics.ols2(rows.toDF("g", "x1", "x2", "y"),
      "g", "x1", "x2", "y").collect()(0)
    assert(r.getLong(1) == 30)
    assert(r.getDouble(2) == 7.0 && r.getDouble(3) == 3.0 &&
      r.getDouble(4) == -2.0)
  }

  test("ols2 drops singular groups instead of emitting NaN") {
    import spark.implicits._
    // x2 = 2*x1 exactly -> collinear -> det 0 -> dropped
    val rows = (0 to 9).map(i => ("s", i.toLong, 2L * i, i.toLong))
    assert(Metrics.ols2(rows.toDF("g", "x1", "x2", "y"),
      "g", "x1", "x2", "y").count() == 0)
  }

  test("ols2 is partitioning-invariant (integer moments are exact)") {
    import spark.implicits._
    val rows = (1 to 200).map(i =>
      ("g", (i % 13).toLong, (i % 7).toLong, (i * 31 % 101).toLong))
    val a = Metrics.ols2(rows.toDF("g", "x1", "x2", "y"),
      "g", "x1", "x2", "y").collect()(0)
    val b = Metrics.ols2(rows.toDF("g", "x1", "x2", "y").repartition(17),
      "g", "x1", "x2", "y").collect()(0)
    assert(a.getDouble(2) == b.getDouble(2) &&
      a.getDouble(3) == b.getDouble(3) && a.getDouble(4) == b.getDouble(4))
  }

  test("disorderAudit counts late events against the running high-water mark") {
    import spark.implicits._
    // arrival 1,2,3,4: ts 10:00:00, 10:00:30, 10:00:20, 10:01:00
    // event 3 is 10s behind the mark set by event 2; others on time
    val df = Seq(
      (1L, "k", "a", "2024-01-01 10:00:00"),
      (2L, "k", "a", "2024-01-01 10:00:30"),
      (3L, "k", "a", "2024-01-01 10:00:20"),
      (4L, "k", "a", "2024-01-01 10:01:00"))
      .toDF("arr", "u", "slice", "ts")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts")
        .cast("timestamp"))
    val r = TimeSeries.disorderAudit(df, "u", Seq("arr"), "ts", "slice")
      .collect()(0)
    assert(r.getLong(1) == 4 && r.getLong(2) == 1)
    assert(r.getDouble(3) == 0.25)
    assert(r.getLong(4) == 10)
    assert(r.getDouble(5) == 10.0) // p95 of the single late value
  }

  test("disorderAudit: fully ordered keys report zero lateness, null p95") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toLong, "k", "a",
        f"2024-01-01 10:00:$i%02d"))
      .toDF("arr", "u", "slice", "ts")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts")
        .cast("timestamp"))
    val r = TimeSeries.disorderAudit(df, "u", Seq("arr"), "ts", "slice")
      .collect()(0)
    assert(r.getLong(2) == 0 && r.isNullAt(4) && r.isNullAt(5))
  }

  /** Independent reference: sequential peel with plain collections. */
  private def refKCore(edges: Set[(Long, Long)], k: Int): Map[Long, Int] = {
    var adj = scala.collection.mutable.Map[Long, Set[Long]]()
    edges.foreach { case (a, b) =>
      if (a != b) {
        adj(a) = adj.getOrElse(a, Set()) + b
        adj(b) = adj.getOrElse(b, Set()) + a
      }
    }
    var changed = true
    while (changed) {
      val bad = adj.filter(_._2.size < k).keys.toSet
      changed = bad.nonEmpty
      if (changed) {
        bad.foreach(adj.remove)
        adj = adj.map { case (n, ns) => n -> (ns -- bad) }
        adj.filterInPlace((_, ns) => ns.nonEmpty)
      }
    }
    adj.map { case (n, ns) => n -> ns.size }.toMap
  }

  test("kCore matches a brute-force peel on randomized graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 40
      val edges = (1 to 260).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).toSet
      val k = 3 + trial // 4, 5, 6
      val expected = refKCore(edges, k)
      val got = Graph.kCore(edges.toSeq.toDF("s", "d"), "s", "d", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      assert(got == expected, s"trial $trial k=$k")
    }
  }

  test("kCore of a clique is the clique; below its degree it is empty") {
    import spark.implicits._
    val clique = (for (a <- 0 to 4; b <- 0 to 4 if a < b)
      yield (a.toLong, b.toLong)).toDF("s", "d")
    val core4 = Graph.kCore(clique, "s", "d", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core4 == (0L to 4L).map(_ -> 4L).toMap)
    assert(Graph.kCore(clique, "s", "d", 5).count() == 0)
  }
}
