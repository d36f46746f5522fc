package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Sketch mergeability — the property that makes 100 TB incremental
  * pipelines work: per-partition (e.g. per-day) HLL sketches persisted
  * once can be unioned later into any rollup without rescanning the
  * data. Spark 3.5+ ships Apache DataSketches HLL as
  * `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`.
  */
class SketchMergeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  test("unioned per-group HLL sketches estimate the global distinct count") {
    import spark.implicits._
    val df = (1 to 50000).map(i => (i % 7, s"user_${i % 9173}")).toDF("day", "uid")

    // phase 1: one sketch per day (what a daily job would persist)
    val daily = df.groupBy($"day").agg(hll_sketch_agg($"uid").as("sk"))
    assert(daily.count() == 7)

    // phase 2: merge the persisted sketches — no rescan of raw data
    val merged = daily.agg(
      hll_sketch_estimate(hll_union_agg($"sk")).as("approx_distinct"))
      .head().getLong(0)

    val exact = df.select($"uid").distinct().count()
    val err = math.abs(merged.toDouble - exact) / exact
    // HLL with default lgK=12 is ~1.6% standard error; allow 5%
    assert(err < 0.05, s"merged=$merged exact=$exact err=$err")
  }

  test("sketch union equals sketching the union (associativity)") {
    import spark.implicits._
    val a = (1 to 3000).map(i => s"k$i").toDF("k")
    val b = (2000 to 5000).map(i => s"k$i").toDF("k")
    val viaUnion = a.union(b)
      .agg(hll_sketch_estimate(hll_sketch_agg($"k"))).head().getLong(0)
    val viaMerge = a.agg(hll_sketch_agg($"k").as("sk"))
      .union(b.agg(hll_sketch_agg($"k").as("sk")))
      .agg(hll_sketch_estimate(hll_union_agg($"sk"))).head().getLong(0)
    assert(viaUnion == viaMerge)
  }
}
