package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain/source mixture rebalancing — the step that turns a raw crawl
  * into a training mixture with target per-domain weights (SURVEY §2.3
  * [extension]: corpus-prep operators).
  *
  * Admission is a deterministic Bernoulli draw per row: a multiplicative
  * hash of the id picks one of `buckets` slots, and domain `s` admits the
  * first `buckets · min(1, target / n_s)` slots. No RNG, no sort — the
  * same rows are admitted on every run and every engine, which makes the
  * operation reproducible and oracle-checkable. The per-domain counts are
  * one tiny aggregate broadcast back to the scan, so the corpus is read
  * once and never shuffled — at 100 TB the cost is a scan plus a
  * broadcast hash join against |domains| rows.
  */
object Mixing {

  /** Downsample each domain to an EXPECTED `targetPerDomain` rows
    * (domains already at or below the target keep ~everything; the draw
    * is per-row, so kept counts concentrate around `rate · n_s`).
    *
    * @param buckets admission-rate granularity (rate is quantized to
    *                1/buckets steps, floor-rounded)
    */
  def rebalanceDomains(df: DataFrame, domainCol: String, idCol: String,
      targetPerDomain: Long, buckets: Int = 1000): DataFrame = {
    require(targetPerDomain > 0, s"targetPerDomain must be positive: $targetPerDomain")
    require(buckets > 0, s"buckets must be positive: $buckets")
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("__n"))
    val admit = least(lit(buckets.toLong),
      floor(lit(buckets.toDouble) * lit(targetPerDomain.toDouble) / col("__n")))
    df.join(broadcast(counts), domainCol)
      .filter(pmod(col(idCol) * lit(2654435761L), lit(buckets.toLong)) < admit)
      .drop("__n")
  }
}
