package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.{TDigest, TDigestAgg}

/** Quantitative accuracy pins for the t-digest sketch (the q228 gate —
  * the digest is approximate by design, so instead of a value oracle we
  * bound its RANK error: the fraction of data below the estimate must
  * sit within a few percent of the requested quantile, the guarantee
  * the k₁ scale function provides at δ=100). */
class TDigestAccuracySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  /** Rank of an estimate within sorted data, as a fraction. */
  private def rankOf(sorted: Array[Double], v: Double): Double =
    sorted.count(_ <= v).toDouble / sorted.length

  private val data: Array[Double] = {
    // log-normal-ish skew: the shape that breaks equi-width histograms
    val r = new scala.util.Random(42)
    Array.fill(50000)(math.exp(r.nextGaussian() * 1.5 + 6.0))
  }
  private lazy val sorted = data.sorted

  test("single-digest rank error stays within 1.5% at p50/p95/p99") {
    val d = new TDigest(100.0)
    data.foreach(d.add)
    for (q <- Seq(0.5, 0.95, 0.99)) {
      val est = d.quantile(q)
      val err = math.abs(rankOf(sorted, est) - q)
      assert(err <= 0.015, s"q=$q rank error $err")
    }
  }

  test("quantile(0) and quantile(1) clamp to observed min/max") {
    val d = new TDigest(100.0)
    data.take(5000).foreach(d.add)
    assert(d.quantile(0.0) == data.take(5000).min)
    assert(d.quantile(1.0) == data.take(5000).max)
  }

  test("merged partial digests keep the rank-error bound (shuffle path)") {
    val parts = data.grouped(7001).map { chunk =>
      val p = new TDigest(100.0); chunk.foreach(p.add); p.toBytes
    }.toSeq
    val merged = TDigest.fromBytes(TDigestAgg.mergeBytes(parts))
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val err = math.abs(rankOf(sorted, merged.quantile(q)) - q)
      assert(err <= 0.02, s"merged q=$q rank error $err")
    }
    assert(merged.totalWeight == data.length.toDouble)
  }

  test("centroid count stays O(compression), not O(n)") {
    val d = new TDigest(100.0)
    data.foreach(d.add)
    d.flush()
    assert(d.means.length < 300, s"centroids: ${d.means.length}")
  }

  test("the Spark aggregate path matches the local digest within tolerance") {
    import spark.implicits._
    val df = data.toSeq.toDF("v").repartition(13)
    val row = df.agg(TDigestAgg.sketch($"v").as("d")).collect()(0)
    val bytes = row.getAs[Array[Byte]](0)
    for (q <- Seq(0.5, 0.95, 0.99)) {
      val err = math.abs(rankOf(sorted, TDigestAgg.quantile(bytes, q)) - q)
      assert(err <= 0.02, s"spark-agg q=$q rank error $err")
    }
  }
}
