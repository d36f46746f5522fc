package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Merging t-digest (Dunning & Ertl 2019, "Computing extremely accurate
  * quantiles using t-digests") as a typed [[Aggregator]] — the mergeable
  * quantile sketch for 100 TB pipelines: O(δ) centroids per group
  * regardless of input size, partial digests combine associatively at
  * shuffle boundaries, and per-partition/per-day digest artifacts can be
  * folded later without rescanning data (the property exact quantiles
  * fundamentally lack — they need the full sort).
  *
  * Implementation is the buffered MERGING variant: points accumulate in
  * a flat buffer; at capacity (and at aggregate boundaries) the buffer
  * is sorted and folded into the centroid list under the k₁ scale
  * function `k(q) = (δ/2π)·asin(2q−1)`, which bounds each centroid's
  * k-size to 1 — tails get tiny centroids (high resolution where
  * quantile error is measured relatively), the middle gets wide ones.
  * Quantile reads interpolate linearly between centroid means with the
  * standard half-weight convention, clamped to the observed min/max.
  *
  * Accuracy is approximate BY DESIGN and the result depends mildly on
  * merge order (partitioning) — so queries built on this are rows-only
  * in the oracle gate and pinned instead by TDigestAccuracySpec's
  * error-bound checks against exact quantiles.
  */
final class TDigest(val compression: Double) extends Serializable {
  var means = new Array[Double](0)
  var weights = new Array[Double](0)
  private var bufMeans = new Array[Double](256)
  private var bufN = 0
  var totalWeight = 0.0
  var min = Double.PositiveInfinity
  var max = Double.NegativeInfinity

  def add(x: Double): Unit = {
    if (bufN == bufMeans.length) flush()
    bufMeans(bufN) = x
    bufN += 1
    if (x < min) min = x
    if (x > max) max = x
  }

  /** k₁ scale function position for quantile q. */
  private def k(q: Double): Double =
    compression / (2.0 * math.Pi) * math.asin(2.0 * q - 1.0)

  /** Fold the point buffer (and any foreign centroids) into a freshly
    * merged centroid list. */
  def flush(extraMeans: Array[Double] = Array.empty,
      extraWeights: Array[Double] = Array.empty): Unit = {
    val n = means.length + bufN + extraMeans.length
    if (n == 0) { bufN = 0; return }
    val ms = new Array[Double](n)
    val ws = new Array[Double](n)
    System.arraycopy(means, 0, ms, 0, means.length)
    System.arraycopy(weights, 0, ws, 0, means.length)
    var i = 0
    while (i < bufN) {
      ms(means.length + i) = bufMeans(i); ws(means.length + i) = 1.0; i += 1
    }
    System.arraycopy(extraMeans, 0, ms, means.length + bufN, extraMeans.length)
    System.arraycopy(extraWeights, 0, ws, means.length + bufN, extraWeights.length)
    // sort by mean (insertion via paired index sort)
    val idx = (0 until n).sortBy(ms)
    val sm = idx.map(ms).toArray
    val sw = idx.map(ws).toArray
    val tw = sw.sum
    val outM = Array.newBuilder[Double]
    val outW = Array.newBuilder[Double]
    var accM = sm(0); var accW = sw(0)
    var wSoFar = 0.0
    var kLo = k(0.0)
    i = 1
    while (i < n) {
      val qNext = (wSoFar + accW + sw(i)) / tw
      if (k(math.min(qNext, 1.0)) - kLo <= 1.0) {
        // merge into the running centroid (weighted mean)
        accM = (accM * accW + sm(i) * sw(i)) / (accW + sw(i))
        accW += sw(i)
      } else {
        outM += accM; outW += accW
        wSoFar += accW
        kLo = k(wSoFar / tw)
        accM = sm(i); accW = sw(i)
      }
      i += 1
    }
    outM += accM; outW += accW
    means = outM.result(); weights = outW.result()
    totalWeight = tw
    bufN = 0
  }

  def mergeWith(o: TDigest): TDigest = {
    o.flush()
    flush(o.means, o.weights)
    if (o.min < min) min = o.min
    if (o.max > max) max = o.max
    this
  }

  /** Interpolated quantile with the half-weight centroid convention. */
  def quantile(q: Double): Double = {
    flush()
    if (totalWeight == 0) return Double.NaN
    if (means.length == 1) return means(0)
    val target = q * totalWeight
    var cum = 0.0
    var i = 0
    while (i < means.length) {
      val half = weights(i) / 2.0
      if (cum + half >= target) {
        // interpolate between the previous centroid's mid and this one's
        val (loM, loC) =
          if (i == 0) (min, 0.0)
          else (means(i - 1), cum - weights(i - 1) / 2.0)
        val hiM = means(i); val hiC = cum + half
        val t = if (hiC == loC) 1.0 else (target - loC) / (hiC - loC)
        val v = loM + t * (hiM - loM)
        return math.max(min, math.min(max, v))
      }
      cum += weights(i)
      i += 1
    }
    max
  }

  def toBytes: Array[Byte] = {
    flush()
    val bb = ByteBuffer.allocate(8 * 3 + 4 + 16 * means.length)
    bb.putDouble(compression); bb.putDouble(min); bb.putDouble(max)
    bb.putInt(means.length)
    var i = 0
    while (i < means.length) {
      bb.putDouble(means(i)); bb.putDouble(weights(i)); i += 1
    }
    bb.array()
  }
}

object TDigest {
  def fromBytes(bytes: Array[Byte]): TDigest = {
    val bb = ByteBuffer.wrap(bytes)
    val d = new TDigest(bb.getDouble)
    d.min = bb.getDouble; d.max = bb.getDouble
    val n = bb.getInt
    d.means = new Array[Double](n)
    d.weights = new Array[Double](n)
    var i = 0
    while (i < n) { d.means(i) = bb.getDouble; d.weights(i) = bb.getDouble; i += 1 }
    d.totalWeight = d.weights.sum
    d
  }
}

/** t-digest as an `agg(...)`-ready typed aggregator over doubles. */
class TDigestAgg(compression: Double = 100.0)
    extends Aggregator[java.lang.Double, TDigest, Array[Byte]] {

  override def zero: TDigest = new TDigest(compression)

  override def reduce(buf: TDigest, x: java.lang.Double): TDigest = {
    if (x != null) buf.add(x.doubleValue())
    buf
  }

  override def merge(a: TDigest, b: TDigest): TDigest = a.mergeWith(b)

  override def finish(buf: TDigest): Array[Byte] = buf.toBytes

  override def bufferEncoder: Encoder[TDigest] =
    Encoders.javaSerialization[TDigest]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object TDigestAgg {
  /** Column form usable in `agg(...)` on a double column. */
  def sketch(col: Column, compression: Double = 100.0): Column =
    org.apache.spark.sql.functions
      .udaf(new TDigestAgg(compression),
        Encoders.DOUBLE.asInstanceOf[Encoder[java.lang.Double]])(col)

  /** Read an interpolated quantile out of a serialized digest. */
  def quantile(bytes: Array[Byte], q: Double): Double =
    if (bytes == null || bytes.isEmpty) Double.NaN
    else TDigest.fromBytes(bytes).quantile(q)

  /** Merge serialized digests (per-partition / per-day artifacts). */
  def mergeBytes(parts: Seq[Array[Byte]], compression: Double = 100.0): Array[Byte] =
    parts.filter(b => b != null && b.nonEmpty).map(TDigest.fromBytes)
      .foldLeft(new TDigest(compression))(_ mergeWith _).toBytes
}
