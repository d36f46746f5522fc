package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min heavy-hitter sketch as a typed [[Aggregator]] — the custom
  * mergeable-sketch path SURVEY §7.3 anticipated beyond the built-in
  * HLL++/quantile sketches.
  *
  * The buffer is Spark's own `org.apache.spark.util.sketch.CountMinSketch`
  * (the class backing DataFrameStatFunctions.countMinSketch), held as a
  * live object and mutated in place per row; serialization happens only
  * at partial/final shuffle boundaries. The aggregate is therefore
  * map-side-combinable like any sketch: size is O(depth·width) regardless
  * of input cardinality, and partial sketches persisted per partition can
  * be merged later without a rescan. Guarantees: estimate(x) >=
  * trueCount(x), and with probability 1−δ:
  * estimate(x) <= trueCount(x) + ε·N (ε = eps, δ = 1−confidence).
  */
class CountMinAgg(eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42)
    extends Aggregator[String, CountMinSketch, Array[Byte]] {

  override def zero: CountMinSketch = CountMinSketch.create(eps, confidence, seed)

  override def reduce(buf: CountMinSketch, item: String): CountMinSketch = {
    if (item != null) buf.add(item)
    buf
  }

  override def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch = {
    a.mergeInPlace(b)
    a
  }

  override def finish(buf: CountMinSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def bufferEncoder: Encoder[CountMinSketch] =
    Encoders.javaSerialization[CountMinSketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object CountMinAgg {
  /** Column form usable in `agg(...)`/`select(...)` on a string column. */
  def sketch(col: Column, eps: Double = 0.001, confidence: Double = 0.99): Column =
    org.apache.spark.sql.functions
      .udaf(new CountMinAgg(eps, confidence), Encoders.STRING)(col)

  /** Read an estimate out of a serialized sketch. */
  def estimate(bytes: Array[Byte], item: String): Long =
    if (bytes.isEmpty) 0L
    else CountMinSketch.readFrom(new ByteArrayInputStream(bytes)).estimateCount(item)

  /** Merge serialized sketches (e.g. per-partition/per-day artifacts). */
  def mergeAll(sketches: Seq[Array[Byte]]): Array[Byte] = {
    val nonEmpty = sketches.filter(_.nonEmpty)
    require(nonEmpty.nonEmpty, "no sketches to merge")
    val first = CountMinSketch.readFrom(new ByteArrayInputStream(nonEmpty.head))
    nonEmpty.tail.foreach(b =>
      first.mergeInPlace(CountMinSketch.readFrom(new ByteArrayInputStream(b))))
    val bos = new ByteArrayOutputStream()
    first.writeTo(bos)
    bos.toByteArray
  }
}
