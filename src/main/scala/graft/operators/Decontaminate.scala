package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find corpus documents that share word
  * n-grams with an evaluation/benchmark set, so training data can be
  * scrubbed of test-set leakage — a standard stage of LLM corpus prep.
  *
  * Scale shape: the eval side is benchmarks — tiny next to a 100 TB
  * corpus — so its distinct gram set is BROADCAST and the corpus is
  * scanned exactly once, map-side; the only corpus-sized movement is the
  * per-doc aggregate of matching grams. No corpus self-join anywhere.
  */
object Decontaminate {

  /** Per-document overlap stats: for each corpus doc, how many of its
    * distinct word n-grams appear anywhere in `eval`. Docs with zero
    * overlap are absent from the result (inner join semantics).
    *
    * @param corpus  documents to screen
    * @param eval    the benchmark/eval documents (small; broadcast)
    * @param idCol   corpus document id column
    * @param textCol raw text column (both sides)
    * @param n       shingle width in words
    */
  def contaminationStats(corpus: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val evalGrams = eval
      .select(explode(TextAnalysis.shingleSet(col(textCol), n)).as("gram"))
      .distinct()
    // shingleSet is already distinct per doc, so a plain count after the
    // inner join is the per-doc distinct overlap — no countDistinct Expand
    corpus
      .select(col(idCol), explode(TextAnalysis.shingleSet(col(textCol), n)).as("gram"))
      .join(broadcast(evalGrams), "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contaminated"))
  }

  /** Per-document contamination RATIO — the overlap as a fraction of
    * the document's own distinct grams, zero-overlap docs included:
    * the continuous score a filtering threshold or a contamination
    * report consumes, where [[contaminationStats]] is the raw hit list.
    * Returns (idCol, n_grams, n_contaminated, contamination) for every
    * doc with at least one gram; ratio rounded to 6 places. Same scale
    * shape as the stats: eval grams broadcast, corpus scanned once
    * map-side, only per-doc aggregates move. */
  def contaminationRatio(corpus: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val evalGrams = eval
      .select(explode(TextAnalysis.shingleSet(col(textCol), n)).as("gram"))
      .distinct()
    val totals = corpus.select(col(idCol),
        size(TextAnalysis.shingleSet(col(textCol), n)).cast("long").as("n_grams"))
      .filter(col("n_grams") > 0)
    val hits = corpus
      .select(col(idCol), explode(TextAnalysis.shingleSet(col(textCol), n)).as("gram"))
      .join(broadcast(evalGrams), "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contaminated"))
    totals.join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        round(coalesce(col("n_contaminated"), lit(0L)) / col("n_grams"), 6)
          .as("contamination"))
  }

  /** The decontaminated corpus: drops every doc whose eval-gram overlap
    * reaches `minHits` (anti-join against the flagged ids). */
  def removeContaminated(corpus: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3, minHits: Long = 1L): DataFrame = {
    val flagged = contaminationStats(corpus, eval, idCol, textCol, n)
      .filter(col("n_contaminated") >= minHits)
      .select(col(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }

  /** SEMANTIC decontamination — the embedding-space complement of the
    * n-gram overlap above: corpus vectors whose cosine similarity to
    * any eval-set vector reaches `threshold`, each with its closest
    * eval match (paraphrased eval leakage that exact-gram matching
    * misses). Returns `(<idCol>, eval_id, sim)` for flagged rows only.
    *
    * Scale shape: the eval set broadcasts (it is benchmark-sized by
    * definition) and the corpus scans ONCE map-side — never a corpus
    * self-join; the arg-max per corpus row is a window over its ≤|eval|
    * candidate matches. Ranking uses the 6-rounded similarity with the
    * eval id as tie-break (q32's engine-stable ordering). */
  def semanticContamination(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = evalSet.select(col(idCol).as("eval_id"),
      col(vecCol).as("__e_emb"))
    val scored = corpus.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(ev))
      .select(col(idCol), col("eval_id"),
        round(graft.functions.Functions.cosine_similarity(
          col(vecCol), col("__e_emb")), 6).as("sim"))
      .filter(col("sim") >= threshold)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("sim").desc, col("eval_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
