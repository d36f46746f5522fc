package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Shims

/** Column-level API over graft's custom Catalyst expressions. */
object Functions {

  /** Expression builders by SQL name (shared by [[registerAll]] and
    * [[graft.GraftExtensions]]). Literal-int options are read from the
    * call site with documented defaults. */
  private[graft] val sqlBuilders: Seq[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression)] = {
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    def litInt(e: Expression, what: String): Int = e match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
    }
    Seq(
      "cosine_similarity" -> ((es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
      "simhash64" -> ((es: Seq[Expression]) => SimHash64(es(0))),
      "rolling_hash" -> ((es: Seq[Expression]) => RollingHash(es(0))),
      "char_entropy" -> ((es: Seq[Expression]) => CharEntropy(es(0))),
      "word_shingles" -> ((es: Seq[Expression]) =>
        WordShingles(es(0), if (es.length > 1) litInt(es(1), "shingle size") else 3)),
      "token_window_hashes" -> ((es: Seq[Expression]) =>
        TokenWindowHashes(es(0), if (es.length > 1) litInt(es(1), "k") else 8)),
      "winnow_fingerprint" -> ((es: Seq[Expression]) =>
        WinnowFingerprint(es(0),
          if (es.length > 1) litInt(es(1), "k") else 7,
          if (es.length > 2) litInt(es(2), "w") else 4)),
      "hyperplane_signature" -> ((es: Seq[Expression]) =>
        HyperplaneSignature(es(0), if (es.length > 1) litInt(es(1), "bits") else 16)),
      "minhash_signature" -> ((es: Seq[Expression]) =>
        MinHashSignature(es(0), if (es.length > 1) litInt(es(1), "numHashes") else 64)),
      "jaro_winkler" -> ((es: Seq[Expression]) => JaroWinkler(es(0), es(1))),
      "bounded_levenshtein" -> ((es: Seq[Expression]) =>
        BoundedLevenshtein(es(0), es(1),
          if (es.length > 2) litInt(es(2), "k") else 2))
    )
  }

  /** Make all graft functions callable from `spark.sql` on this session. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlBuilders.foreach { case (name, b) => Shims.registerFunction(spark, name, b) }

  /** Cosine similarity of two `array<float>` columns (codegen'd, double accumulation). */
  def cosine_similarity(a: Column, b: Column): Column =
    Shims.column(CosineSimilarity(Shims.expression(a), Shims.expression(b)))

  /** 64-bit SimHash of an `array<string>` token column. */
  def simhash64(tokens: Column): Column =
    Shims.column(SimHash64(Shims.expression(tokens)))

  /** Karp–Rabin polynomial hash of a string column. */
  def rolling_hash(text: Column): Column =
    Shims.column(RollingHash(Shims.expression(text)))

  /** Shannon entropy (nats) of a string's character distribution. */
  def char_entropy(text: Column): Column =
    Shims.column(CharEntropy(Shims.expression(text)))

  /** Rolling hashes of every k-token window of a string column, in
    * position order (see [[TokenWindowHashes]]). */
  def token_window_hashes(text: Column, k: Int = 8): Column =
    Shims.column(TokenWindowHashes(Shims.expression(text), k))

  /** Winnowing k-gram fingerprints of a string column. */
  def winnow_fingerprint(text: Column, k: Int = 7, w: Int = 4): Column =
    Shims.column(WinnowFingerprint(Shims.expression(text), k, w))

  /** Distinct word n-gram shingles of a string column (single tokenize). */
  def word_shingles(text: Column, n: Int = 3): Column =
    Shims.column(WordShingles(Shims.expression(text), n))

  /** Random-hyperplane LSH signature of an `array<float>` column. */
  def hyperplane_signature(vec: Column, bits: Int = 16): Column =
    Shims.column(HyperplaneSignature(Shims.expression(vec), bits))

  /** MinHash signature of an `array<string>` shingle column (map-side, no shuffle). */
  def minhash_signature(shingles: Column, numHashes: Int = 64): Column =
    Shims.column(MinHashSignature(Shims.expression(shingles), numHashes))

  /** Jaro–Winkler similarity of two string columns (thresholded-boost
    * variant; see [[JaroWinkler]]). */
  def jaro_winkler(a: Column, b: Column): Column =
    Shims.column(JaroWinkler(Shims.expression(a), Shims.expression(b)))

  /** Banded early-exit edit distance: exact when ≤ k, else k+1 — the
    * O(k·n) verify primitive for fuzzy joins (see
    * [[BoundedLevenshtein]]). */
  def bounded_levenshtein(a: Column, b: Column, k: Int): Column =
    Shims.column(BoundedLevenshtein(Shims.expression(a),
      Shims.expression(b), k))

  /** BPE subword pieces of a string column under a trained merge table
    * (train with [[graft.operators.Bpe.train]]; not SQL-registered — the
    * merge table is a data-dependent artifact, not a literal). */
  def bpe_encode(text: Column, merges: Seq[(String, String)]): Column =
    Shims.column(BpeEncode(Shims.expression(text), merges))
}
