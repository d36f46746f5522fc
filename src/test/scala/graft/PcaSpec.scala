package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Pca

/** PCA: the Gram-aggregate + driver-Jacobi fit and the map-side
  * projection. Fixtures use integer-valued embeddings so every
  * floating-point sum is exact and the fit is bit-stable across
  * partitionings (the operator's documented determinism contract). */
class PcaSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private def planted(n: Int): Seq[(Long, Seq[Float])] =
    // rank-2 data in 6-dim space: axis e0 swings ±8, axis e3 swings ±2,
    // everything else constant — principal components must be e0 then e3
    (1 to n).map { i =>
      val a = if (i % 2 == 0) 8f else -8f
      val b = if (i % 4 < 2) 2f else -2f
      (i.toLong, Seq(a, 0f, 0f, b, 5f, 0f))
    }

  test("planted rank-2 data recovers the exact axes, variance-ordered") {
    import spark.implicits._
    val df = planted(40).toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding")
    assert(m.components(0).toSeq == Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    assert(m.components(1).toSeq == Seq(0.0, 0.0, 0.0, 1.0, 0.0, 0.0))
    assert(m.variances(0) == 64.0 && m.variances(1) == 4.0)
    assert(m.variances.drop(2).forall(_.abs < 1e-12))
    // canonical sign put the big loading positive on both components
    assert(m.mean.toSeq == Seq(0.0, 0.0, 0.0, 0.0, 5.0, 0.0))
  }

  test("components are orthonormal") {
    import spark.implicits._
    val df = (1 to 60).map { i =>
      (i.toLong, Seq((i % 7).toFloat, (i % 3).toFloat, ((i * i) % 5).toFloat,
        (i % 2).toFloat))
    }.toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding")
    val c = m.components
    for (i <- c.indices; j <- c.indices) {
      val dot = c(i).indices.map(k => c(i)(k) * c(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<c$i,c$j> = $dot")
    }
    assert(m.variances.sliding(2).forall(p => p(0) >= p(1) - 1e-12),
      s"variances not descending: ${m.variances.toSeq}")
  }

  test("projection is the centered dot product and reconstructs rank-2 data") {
    import spark.implicits._
    val df = planted(40).toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding")
    val rows = Pca.project(df, "embedding", m, k = 2)
      .select("vec_id", "p1", "p2").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // mean is 0 on both planted axes, so projections are the raw swings
    assert(rows(1L) == ((-8.0, 2.0)) && rows(2L) == ((8.0, -2.0)))
    assert(rows(3L) == ((-8.0, -2.0)) && rows(4L) == ((8.0, 2.0)))
  }

  test("whitened projections have exactly unit swing on planted data") {
    import spark.implicits._
    val df = planted(40).toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding")
    // planted variances are 64 and 4: whitening divides by 8 and 2
    val rows = Pca.project(df, "embedding", m, k = 2, whiten = true)
      .select("p1", "p2").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rows.forall { case (a, b) => math.abs(a) == 1.0 && math.abs(b) == 1.0 },
      s"got ${rows.take(4).toSeq}")
    // a zero-variance component refuses to whiten
    intercept[IllegalArgumentException](
      Pca.project(df, "embedding", m, k = 3, whiten = true))
  }

  test("fit is invariant to partitioning on integer-valued embeddings") {
    import spark.implicits._
    val base = (1 to 200).map { i =>
      (i.toLong, Seq((i % 11).toFloat, (i % 5).toFloat, ((i * 3) % 7).toFloat))
    }
    def comps(parts: Int) = {
      val m = Pca.fit(base.toDF("vec_id", "embedding").repartition(parts), "embedding")
      (m.mean.toSeq, m.components.map(_.toSeq).toSeq, m.variances.toSeq)
    }
    assert(comps(1) == comps(13))
  }

  test("degenerate inputs fail fast") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    intercept[IllegalArgumentException](Pca.fit(empty, "embedding"))
    val df = planted(8).toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding")
    intercept[IllegalArgumentException](Pca.project(df, "embedding", m, k = 0))
    intercept[IllegalArgumentException](Pca.project(df, "embedding", m, k = 99))
  }
}
