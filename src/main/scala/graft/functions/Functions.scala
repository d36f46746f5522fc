package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Shims

/** Column-level API over graft's custom Catalyst expressions. */
object Functions {

  /** Cosine similarity of two `array<float>` columns (codegen'd, double accumulation). */
  def cosine_similarity(a: Column, b: Column): Column =
    Shims.column(CosineSimilarity(Shims.expression(a), Shims.expression(b)))

  /** 64-bit SimHash of an `array<string>` token column. */
  def simhash64(tokens: Column): Column =
    Shims.column(SimHash64(Shims.expression(tokens)))

  /** Karp–Rabin polynomial hash of a string column. */
  def rolling_hash(text: Column): Column =
    Shims.column(RollingHash(Shims.expression(text)))

  /** Winnowing k-gram fingerprints of a string column. */
  def winnow_fingerprint(text: Column, k: Int = 7, w: Int = 4): Column =
    Shims.column(WinnowFingerprint(Shims.expression(text), k, w))

  /** Distinct word n-gram shingles of a string column (single tokenize). */
  def word_shingles(text: Column, n: Int = 3): Column =
    Shims.column(WordShingles(Shims.expression(text), n))

  /** Random-hyperplane LSH signature of an `array<float>` column. */
  def hyperplane_signature(vec: Column, bits: Int = 16): Column =
    Shims.column(HyperplaneSignature(Shims.expression(vec), bits))
}
