package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Functions._

/** Similarity search over embedding columns (SURVEY §2.3).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) probe
  * set against the full vector table, ranked per probe. This is the
  * correct-by-construction path and scales as O(|probes|·|vectors|) with
  * perfect data parallelism.
  *
  * Scale path: banded random-hyperplane LSH — vectors hash to signature
  * chunks, probes join only their buckets, exact cosine ranks within the
  * candidate set. Trades recall for a join that touches a small fraction
  * of the table; at 100 TB the bucket join replaces the full scan per
  * probe batch.
  */
object Similarity {

  /** Exact top-k neighbors per probe by cosine (probe set broadcast).
    * Ranking uses the rounded similarity with id tie-break so results are
    * reproducible across engines and runs. */
  def bruteForceTopK(vectors: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
    val scored = vectors.join(broadcast(p), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(cosine_similarity(col("p_emb"), col("embedding")), 6).as("sim"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** All pairs (a < b) with cosine ≥ threshold, restricted to ids below
    * `maxId` to bound the quadratic pair space. */
  def nearPairs(vectors: DataFrame, threshold: Double, maxId: Long): DataFrame = {
    val a = vectors.filter(col("vec_id") < maxId)
      .select(col("vec_id").as("a_id"), col("embedding").as("ea"))
    val b = vectors.filter(col("vec_id") < maxId)
      .select(col("vec_id").as("b_id"), col("embedding").as("eb"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(cosine_similarity(col("ea"), col("eb")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Approximate top-k via banded random-hyperplane LSH: 4 bands of
    * `bandBits` signature bits; a vector is a candidate if any band
    * matches the probe's. Exact cosine ranks candidates. */
  def annTopK(vectors: DataFrame, probes: DataFrame, k: Int,
      bandBits: Int = 4, bands: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val totalBits = bandBits * bands
    def banded(df: DataFrame, idAs: String, embAs: String): DataFrame =
      df.select(col("vec_id").as(idAs), col("embedding").as(embAs),
        posexplode(array((0 until bands).map(c =>
          shiftright(hyperplane_signature(col("embedding"), totalBits), c * bandBits)
            .bitwiseAND(lit((1L << bandBits) - 1))): _*)).as(Seq("band", "bucket")))
    val p = banded(probes, "probe_id", "p_emb")
    val v = banded(vectors, "vec_id", "v_emb")
    val cands = v.join(broadcast(p),
        v("band") === p("band") && v("bucket") === p("bucket") &&
          col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), col("p_emb"), col("v_emb"))
      .distinct()
    val scored = cands.select(col("probe_id"), col("vec_id"),
      round(cosine_similarity(col("p_emb"), col("v_emb")), 6).as("sim"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }
}
