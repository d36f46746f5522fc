package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sources.{Tables => T}

/** The sketch aggregates (q38's rows-only path) must track their exact
  * counterparts within the algorithms' published error bounds.
  */
class SketchAccuracySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)
  private val sf = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  test("approx_count_distinct within 5% of exact") {
    import spark.implicits._
    val ev = T.events(spark, sf)
    val exact = ev.select(countDistinct($"user_id")).as[Long].head()
    val approx = ev.select(approx_count_distinct($"user_id")).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx(accuracy=10000) within 1% of exact median") {
    import spark.implicits._
    val ev = T.events(spark, sf)
    val exact = ev.select(median($"value")).as[Double].head()
    val approx = ev.select(percentile_approx($"value", lit(0.5), lit(10000)))
      .as[Double].head()
    assert(math.abs(approx - exact) / math.max(exact, 1e-9) < 0.01,
      s"approx=$approx exact=$exact")
  }
}
