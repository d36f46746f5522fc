package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the document pipeline (SURVEY §2.3).
  *
  * Everything here is pure `org.apache.spark.sql.functions` composition —
  * codegen-friendly, no UDFs — so Catalyst can push filters around it and
  * the operators scale linearly with the corpus.
  */
object TextAnalysis {

  /** Function words used for stopword-ratio and language-ID heuristics. */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")

  /** Whitespace tokenization (trimmed so leading/trailing blanks don't
    * produce empty tokens). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word n-gram shingles: contiguous n-word windows joined by single
    * spaces; empty when the document has fewer than n words. */
  def wordShingles(words: Column, n: Int): Column = {
    val gram = (i: Column) =>
      concat_ws(" ", (0 until n).map(j => element_at(words, i + lit(j))): _*)
    when(size(words) >= n,
      transform(sequence(lit(1), size(words) - lit(n - 1)), gram))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct word n-gram shingle set of a raw text column.
    * Uses the native [[graft.functions.WordShingles]] expression: the
    * composed HOF form re-tokenizes inside every lambda invocation. */
  def shingleSet(text: Column, n: Int = 3): Column =
    graft.functions.Functions.word_shingles(text, n)

  /** |A ∩ B| / |A ∪ B| over two array columns (set semantics). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)) / size(array_union(a, b))

  /** Fraction of tokens that are function words. */
  def stopwordRatio(words: Column): Column =
    size(filter(words, w => w.isin(stopwords: _*))) / size(words)

  /** Heuristic language ID from function-word hits; mirrors the classic
    * profile approach with a tiny profile set so the logic is portable
    * to the SQL oracle verbatim. */
  def languageGuess(words: Column): Column = {
    def has(ws: String*) = size(filter(words, w => w.isin(ws: _*))) > 0
    when(has("the", "and", "of"), "en")
      .when(has("der", "und", "die"), "de")
      .when(has("el", "la", "los"), "es")
      .otherwise("unknown")
  }
}
