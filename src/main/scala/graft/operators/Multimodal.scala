package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.3): media as opaque binary
  * columns plus typed metadata, with decode/feature-extraction as
  * partition-batched transforms.
  *
  * The Spark-side shape is real and scale-correct: binary payloads stay
  * columnar, decode runs once per partition batch via `mapPartitions`
  * (the Scala analog of `mapInPandas` batching), and metadata lands in a
  * typed struct usable by ordinary relational operators downstream. The
  * codec itself is STUBBED — this container has no image/audio libraries —
  * as a clearly-marked deterministic fake in [[FakeCodec.decode]]; a real
  * deployment swaps only that function.
  */
object Multimodal {

  /** Typed row produced by decoding one media payload. */
  case class MediaInfo(
      doc_id: Long, width: Int, height: Int, channels: Int,
      n_bytes: Long, feat_norm: Double)

  /** STUB codec: derives deterministic pseudo-metadata and a feature
    * sketch from the raw bytes. Replace with a real decoder (e.g. JPEG
    * header parse + model embedding) — signature and batching stay.
    * Accumulation is double, strictly in byte order, so the result is
    * reproducible bit-for-bit by any engine running the same loop. */
  object FakeCodec {
    def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Double]) = {
      val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
      val width = 64 + (bytes.length % 192).toInt
      val height = 64 + (b0 % 128)
      val feats = new Array[Double](8)
      var i = 0
      while (i < bytes.length) {
        feats(i % 8) += (bytes(i) & 0xff) / 255.0
        i += 1
      }
      (width, height, 3, feats)
    }
  }

  /** Attach a binary payload column (here: UTF-8 bytes of the text, since
    * the fixtures carry no real media; real tables read binary parquet
    * columns directly). */
  def withPayload(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** "Resize" + re-extract: stride-subsample the payload (every
    * `stride`-th byte, the stub analog of image downscaling) and run the
    * codec's feature extraction over the resized payload — the
    * decode → resize → feature-extract chain of a real multimodal
    * pipeline, partition-batched like [[decodeMeta]]. A real deployment
    * swaps the subsample for an image resize; the batching, schema and
    * deterministic byte-order arithmetic stay. */
  def resizeFeatures(spark: SparkSession, payloads: DataFrame, stride: Int,
      idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    require(stride >= 1, s"stride must be >= 1: $stride")
    payloads.select(col(idCol), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val resized = Array.tabulate((bytes.length + stride - 1) / stride)(
            k => bytes(k * stride))
          val (w, h, c, feats) = FakeCodec.decode(resized)
          var sq = 0.0
          var j = 0
          while (j < feats.length) { sq += feats(j) * feats(j); j += 1 }
          MediaInfo(id, w, h, c, resized.length.toLong, math.sqrt(sq))
        }
      }
      .toDF()
  }

  /** Decode payloads partition-batch-wise into typed metadata.
    * One codec invocation per row, but iterator-at-a-time per partition —
    * a real codec would amortize model/codec init across the partition
    * (the reason for mapPartitions over a per-row UDF). */
  def decodeMeta(spark: SparkSession, payloads: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    payloads.select(col(idCol), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { case (id, bytes) =>
          val (w, h, c, feats) = FakeCodec.decode(bytes)
          var sq = 0.0
          var j = 0
          while (j < feats.length) { sq += feats(j) * feats(j); j += 1 }
          MediaInfo(id, w, h, c, bytes.length.toLong, math.sqrt(sq))
        }
      }
      .toDF()
  }
}
