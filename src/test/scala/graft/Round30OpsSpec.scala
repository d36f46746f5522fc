package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Quantiles

/** Round-6 twenty-second-wave operator: quantile normalization. */
class Round30OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  test("quantileNormalize is the identity when B already has A's shape") {
    import spark.implicits._
    val a = Seq(1.0, 3.0, 7.0, 9.0, 20.0).toDF("v")
    val r = Quantiles.quantileNormalize(a, a, "v")
      .collect().map(x => x.getDouble(0) -> x.getDouble(2)).toMap
    assert(r.forall { case (v, m) => v == m }, r.toString)
  }

  test("quantileNormalize undoes a constant shift exactly") {
    import spark.implicits._
    val a = Seq(1.0, 3.0, 7.0, 9.0).toDF("v")
    val b = Seq(101.0, 103.0, 107.0, 109.0).toDF("v")
    val r = Quantiles.quantileNormalize(a, b, "v")
      .collect().map(x => x.getDouble(0) -> x.getDouble(2)).toMap
    assert(r == Map(101.0 -> 1.0, 103.0 -> 3.0, 107.0 -> 7.0,
      109.0 -> 9.0))
  }

  test("quantileNormalize interpolates mid-ranks and shares ties") {
    import spark.implicits._
    val a = Seq(0.0, 20.0).toDF("v")
    val b = Seq(0.0, 5.0, 5.0, 10.0).toDF("v") // ranks 1, 2, 2, 4
    val r = Quantiles.quantileNormalize(a, b, "v")
      .collect().map(x => (x.getDouble(0), x.getLong(1), x.getDouble(2)))
      .sortBy(_._1)
    // n=4: p = (rank-1)/3 -> 0, 1/3, 1 -> mapped 0, 20/3, 20
    assert(r(0) == ((0.0, 1L, 0.0)))
    assert(r(1)._2 == 2L &&
      r(1)._3 == BigDecimal(20.0 / 3)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r(2) == ((10.0, 1L, 20.0)))
  }

  test("quantileNormalize is partitioning-invariant") {
    import spark.implicits._
    val a = (1 to 500).map(i => (i * 37 % 1009).toDouble).toDF("v")
    val b = (1 to 300).map(i => (i * 53 % 997 + 2000).toDouble).toDF("v")
    val r1 = Quantiles.quantileNormalize(a, b, "v")
      .collect().map(x => x.getDouble(0) -> x.getDouble(2)).toMap
    val r2 = Quantiles.quantileNormalize(a.repartition(13),
        b.repartition(7), "v")
      .collect().map(x => x.getDouble(0) -> x.getDouble(2)).toMap
    assert(r1 == r2)
    // order-preservation: mapped values non-decreasing in input order
    val sortedPairs = r1.toSeq.sortBy(_._1)
    assert(sortedPairs.sliding(2).forall(p =>
      p.length < 2 || p(0)._2 <= p(1)._2))
  }
}
