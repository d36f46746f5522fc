package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** PCA over an embedding column — the dimensionality-reduction step real
  * corpus pipelines run before semantic dedup / clustering (SemDeDup and
  * friends operate on PCA-reduced embeddings; whitening and visualization
  * consume the same projection).
  *
  * Spark-first shape: the only distributed work is ONE mergeable typed
  * [[Aggregator]] pass accumulating the Gram matrix — count, per-dim sums
  * and the upper-triangular ΣxᵢxⱼT — whose state is O(d²) regardless of
  * corpus size (d=64 → ~2 KB partials, map-side combined like any
  * sketch). The d×d covariance eigendecomposition happens driver-side
  * (cyclic Jacobi — deterministic, no library), and projection is a pure
  * map-side `zip_with`/`aggregate` dot product against broadcast literal
  * components. Nothing corpus-sized shuffles or collects at any scale.
  *
  * Determinism: Jacobi and the sign canonicalization are exact functions
  * of the covariance matrix. The Gram sums themselves are floating-point
  * adds whose partial-merge order Spark does not fix, so distinct
  * partitionings can differ in the last ulps (the same exposure as any
  * `avg`); on integer-valued embeddings the sums are exact and the whole
  * fit is bit-stable (PcaSpec pins that).
  */
object Pca {

  /** Fitted model: per-dim mean, orthonormal components (rows, variance-
    * descending), and the component variances (eigenvalues). */
  case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
      variances: Array[Double])

  /** Packed Gram buffer: [n, sum_1..sum_d, upper-tri prods row-major]. */
  private class GramAgg extends Aggregator[Seq[Float], Array[Double], Array[Double]] {
    override def zero: Array[Double] = Array.empty
    override def reduce(buf: Array[Double], v: Seq[Float]): Array[Double] = {
      if (v == null) return buf
      val d = v.length
      val b = if (buf.isEmpty) new Array[Double](1 + d + d * (d + 1) / 2) else buf
      require(b.length == 1 + d + d * (d + 1) / 2,
        s"embedding dim changed mid-aggregate: buffer for ${dimOf(b)} got $d")
      b(0) += 1
      val x = new Array[Double](d)
      var i = 0
      while (i < d) { x(i) = v(i).toDouble; b(1 + i) += x(i); i += 1 }
      var k = 1 + d
      i = 0
      while (i < d) {
        var j = i
        while (j < d) { b(k) += x(i) * x(j); k += 1; j += 1 }
        i += 1
      }
      b
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      require(a.length == b.length, "mismatched gram buffers")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Double]): Array[Double] = buf
    override def bufferEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
  }

  private def dimOf(packed: Array[Double]): Int = {
    // solve 1 + d + d(d+1)/2 = len
    var d = 0
    while (1 + d + d * (d + 1) / 2 < packed.length) d += 1
    d
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Returns
    * (eigenvalues, eigenvectors as columns) unordered; deterministic —
    * fixed sweep order, pure sequential FP. O(d³) per sweep, fine for
    * embedding dims (run driver-side on the d×d covariance only). */
  private[graft] def jacobiEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var p = 0
      while (p < d) { var q = p + 1; while (q < d) { s += a(p)(q) * a(p)(q); q += 1 }; p += 1 }
      s
    }
    var sweep = 0
    while (off() > 1e-18 && sweep < 64) {
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val apq = a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t = if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1))
                    else 1.0 / (theta - math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            val app = a(p)(p); val aqq = a(q)(q)
            var i = 0
            while (i < d) {
              if (i != p && i != q) {
                val aip = a(i)(p); val aiq = a(i)(q)
                a(i)(p) = c * aip - s * aiq; a(p)(i) = a(i)(p)
                a(i)(q) = s * aip + c * aiq; a(q)(i) = a(i)(q)
              }
              i += 1
            }
            a(p)(p) = app - t * apq
            a(q)(q) = aqq + t * apq
            a(p)(q) = 0.0; a(q)(p) = 0.0
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Fit PCA on `vecCol` (array<float>, fixed dim): one aggregate pass,
    * driver-side eigendecomposition of the d×d covariance. Components
    * are ordered variance-descending (ties by dimension index) with a
    * canonical sign — the largest-|loading| coordinate is positive — so
    * the fit is a pure function of the data, not the run. */
  def fit(df: DataFrame, vecCol: String): PcaModel = {
    val agg = udaf(new GramAgg, ExpressionEncoder[Seq[Float]]())
    val packed = df.select(col(vecCol)).na.drop()
      .agg(agg(col(vecCol)).as("g"))
      .head().getAs[scala.collection.Seq[Double]]("g").toArray
    require(packed.nonEmpty, s"PCA needs at least one non-null $vecCol vector")
    val d = dimOf(packed)
    val n = packed(0)
    val mean = Array.tabulate(d)(i => packed(1 + i) / n)
    val cov = Array.ofDim[Double](d, d)
    var k = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = packed(k) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        k += 1; j += 1
      }
      i += 1
    }
    val (evals, evecs) = jacobiEigen(cov)
    val order = (0 until d).sortBy(j => (-evals(j), j))
    val comps = order.map { j =>
      val w = Array.tabulate(d)(i => evecs(i)(j))
      // canonical sign: the first largest-|loading| coordinate is positive
      val pivot = w.indices.maxBy(i => (math.abs(w(i)), -i))
      if (w(pivot) < 0) w.map(-_) else w
    }.toArray
    PcaModel(mean, comps, order.map(evals).toArray)
  }

  /** Append the top-`k` centered projections as columns `p1..pk`: pure
    * map-side zip_with/aggregate dot products against literal component
    * arrays (the mean offset folds into one scalar per component), so
    * projection composes into any plan without a shuffle. With `whiten`
    * each projection is scaled by 1/sqrt(variance) — unit-variance
    * coordinates, the normalization cosine-based downstream stages
    * (SemDeDup-style clustering) expect after a PCA reduction. */
  def project(df: DataFrame, vecCol: String, model: PcaModel, k: Int,
      prefix: String = "p", whiten: Boolean = false): DataFrame = {
    require(k >= 1 && k <= model.components.length,
      s"k must be in [1, ${model.components.length}]: $k")
    if (whiten) (0 until k).foreach(j => require(model.variances(j) > 1e-12,
      s"cannot whiten component ${j + 1}: variance ${model.variances(j)} ~ 0"))
    val projCols: Seq[Column] = (0 until k).map { j =>
      val w = model.components(j)
      val meanDot = w.indices.map(i => w(i) * model.mean(i)).sum
      val scale = if (whiten) 1.0 / math.sqrt(model.variances(j)) else 1.0
      val dot = aggregate(
        zip_with(col(vecCol), typedLit(w.toSeq), (x, wv) => x.cast("double") * wv),
        lit(0.0), (acc, x) => acc + x)
      ((dot - lit(meanDot)) * lit(scale)).as(s"$prefix${j + 1}")
    }
    df.select(df.columns.map(col).toSeq ++ projCols: _*)
  }
}
