package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Baskets, Metrics, Scale}

/** Round-6 ninth-wave operators: linear attribution, item cosine,
  * rendezvous sharding. */
class Round17OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  test("linearAttribution splits value evenly over in-window touches") {
    import spark.implicits._
    val touches = Seq(
      ("u1", "2024-01-10 00:00:00", "view"),
      ("u1", "2024-01-10 01:00:00", "view"),
      ("u1", "2024-01-11 00:00:00", "click"),
      ("u1", "2024-01-11 01:00:00", "click"),
      ("u1", "2024-01-11 02:00:00", "click"),
      ("u1", "2024-01-01 00:00:00", "view"), // outside 7d lookback
      ("u2", "2024-01-12 00:00:00", "view")) // other user
      .toDF("u", "ts", "ch").withColumn("ts", $"ts".cast("timestamp"))
    val convs = Seq(
      ("u1", "2024-01-12 00:00:00", 1L, 10.0),
      ("u3", "2024-01-12 00:00:00", 2L, 7.5)) // no touches at all
      .toDF("u", "ts", "id", "v").withColumn("ts", $"ts".cast("timestamp"))
    val r = Metrics.linearAttribution(touches, "u", "ts", "ch",
        convs, "u", "ts", "id", "v", lookbackDays = 7)
      .collect().map(x => x.getString(0) ->
        ((x.getDecimal(1).doubleValue(), x.getLong(2)))).toMap
    // u1's 10.0 over 2 views + 3 clicks: view 4.0, click 6.0
    assert(r("view") == ((4.0, 1L)))
    assert(r("click") == ((6.0, 1L)))
    assert(r("unattributed") == ((7.5, 1L)))
  }

  test("linearAttribution window boundary: touch AT conversion time counts") {
    import spark.implicits._
    val touches = Seq(("u", "2024-01-12 00:00:00", "view"))
      .toDF("u", "ts", "ch").withColumn("ts", $"ts".cast("timestamp"))
    val convs = Seq(("u", "2024-01-12 00:00:00", 1L, 5.0))
      .toDF("u", "ts", "id", "v").withColumn("ts", $"ts".cast("timestamp"))
    val r = Metrics.linearAttribution(touches, "u", "ts", "ch",
        convs, "u", "ts", "id", "v", 7)
      .collect().map(x => x.getString(0) -> x.getDecimal(1).doubleValue())
      .toMap
    assert(r == Map("view" -> 5.0))
  }

  test("itemCosine normalizes co-occurrence by basket-count geometry") {
    import spark.implicits._
    // baskets: {A,B} x3, {A,C}, {B,C}; n_A=4, n_B=4, n_C=2
    // co(A,B)=3 -> 3/sqrt(16)=0.75; co(A,C)=1 (below pair support 2)
    val b = Seq((1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (3, "B"),
      (4, "A"), (4, "C"), (5, "B"), (5, "C")).toDF("b", "i")
    val r = Baskets.itemCosine(b, "b", "i", 1, 2).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getString(0) == "A" && row.getString(1) == "B")
    assert(row.getLong(2) == 3 && row.getLong(3) == 4 && row.getLong(4) == 4)
    assert(row.getDouble(5) == 0.75)
  }

  test("rendezvousShard: stable in range, and growing k moves few keys") {
    import spark.implicits._
    val ids = (0L until 2000L).toDF("id")
    val df = ids
      .withColumn("s10", Scale.rendezvousShard($"id", 10))
      .withColumn("s10b", Scale.rendezvousShard($"id", 10))
      .withColumn("s11", Scale.rendezvousShard($"id", 11))
      .cache()
    // deterministic + in range
    assert(df.filter($"s10" =!= $"s10b").count() == 0)
    assert(df.filter($"s10" < 0 || $"s10" >= 10).count() == 0)
    assert(df.filter($"s11" < 0 || $"s11" >= 11).count() == 0)
    // minimal-movement property: far fewer moves than modulo's ~10/11
    val moved = df.filter($"s10" =!= $"s11").count()
    assert(moved < 2000 / 4, s"HRW moved $moved of 2000")
    // every shard actually receives keys (no dead shard)
    assert(df.select("s10").distinct().count() == 10)
    df.unpersist()
  }
}
