package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BpeEncode // EndOfWord marker

/** Byte-pair-encoding subword tokenization (Sennrich et al. 2016) — the
  * subword half of the text → tensor step ([[TextAnalysis.encodeVocabIds]]
  * is the word-level half). Training follows the quantizer pattern of
  * [[Similarity]]: the merge table is learned driver-side from a BOUNDED,
  * id-ORDERED sample (deterministic for the same data regardless of file
  * layout or partitioning — a bare limit() would make the learned
  * vocabulary run-dependent), then broadcast inside a native expression
  * for distributed encoding, so the corpus-sized pass is pure map-side
  * compute with no shuffle at any scale.
  *
  * Variant notes: word-internal merges with a `</w>` end-of-word marker
  * (the original paper's formulation, not GPT-2's byte-level alphabet);
  * pair-count ties break lexicographically so training is deterministic.
  */
object Bpe {

  /** Learn `numMerges` BPE merge rules from an ordered sample of the
    * corpus. Returns the merges in application order (rank 0 first);
    * training stops early when no symbol pair repeats. */
  def train(docs: DataFrame, idCol: String, textCol: String,
      numMerges: Int, maxTrainSample: Int = 10000): Seq[(String, String)] = {
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
    val sample = docs.select(col(idCol), col(textCol))
      .orderBy(col(idCol)).limit(maxTrainSample)
      .collect().map(r => Option(r.get(1)).map(_.toString).getOrElse(""))
    // word frequencies over the sample; each word type becomes a mutable
    // symbol sequence (chars + the end-of-word marker)
    val wordFreq = scala.collection.mutable.Map[String, Long]()
    sample.foreach { t =>
      t.trim.split("\\s+").iterator.filter(_.nonEmpty).foreach { w =>
        wordFreq(w) = wordFreq.getOrElse(w, 0L) + 1L
      }
    }
    var words: Array[(Array[String], Long)] = wordFreq.toArray.sortBy(_._1)
      .map { case (w, n) => (w.map(_.toString).toArray :+ BpeEncode.EndOfWord, n) }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, n) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          pairs(p) = pairs.getOrElse(p, 0L) + n
          i += 1
        }
      }
      // a pair occurring once buys nothing; lexicographic tiebreak keeps
      // training deterministic across runs and platforms
      val best = pairs.filter(_._2 >= 2).toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case None => exhausted = true
        case Some((pair, _)) =>
          merges += pair
          val joined = pair._1 + pair._2
          words = words.map { case (syms, n) =>
            if (syms.length < 2) (syms, n)
            else {
              val out = scala.collection.mutable.ArrayBuffer[String]()
              var i = 0
              while (i < syms.length) {
                if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
                  out += joined; i += 2
                } else { out += syms(i); i += 1 }
              }
              (out.toArray, n)
            }
          }
      }
      m += 1
    }
    merges.toSeq
  }

  /** Encode a text column into its subword token array with a trained
    * merge table — a native expression over the broadcast merges, so the
    * encode pass stays inside whole-stage codegen spans and shuffles
    * nothing. */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.Functions.bpe_encode(text, merges)

  /** Train on the corpus, then encode it: (idCol, pieces) per document —
    * the composed convenience the pipeline uses. */
  def trainAndEncode(docs: DataFrame, idCol: String, textCol: String,
      numMerges: Int, maxTrainSample: Int = 10000): DataFrame = {
    val merges = train(docs, idCol, textCol, numMerges, maxTrainSample)
    docs.select(col(idCol), encode(col(textCol), merges).as("pieces"))
  }
}
