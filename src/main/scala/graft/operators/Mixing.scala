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

  /** Deterministic bucket slot of a non-negative id: Knuth multiplicative
    * hash over the id's LOW 31 BITS. The mask keeps the product below
    * 2^31 · 2654435761 < 2^63, so the arithmetic never overflows a signed
    * long — an unmasked multiply throws ARITHMETIC_OVERFLOW under Spark's
    * default ANSI mode (and errors in DuckDB) at exactly the multi-billion
    * -row id ranges this operator targets. Elementary integer ops only, so
    * any engine reproduces the assignment bit-for-bit (the oracle SQL
    * spells the same `(id % 2^31) * 2654435761 % buckets`). */
  private[graft] def slotOf(id: org.apache.spark.sql.Column, buckets: Int) =
    pmod(pmod(id, lit(2147483648L)) * lit(2654435761L), lit(buckets.toLong))

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
      .filter(slotOf(col(idCol), buckets) < admit)
      .drop("__n")
  }

  /** Deterministic train/val/test split: each row lands in a named split
    * by the same multiplicative-hash slot as [[rebalanceDomains]], with
    * split boundaries at the cumulative weight fractions. Pure map-side
    * arithmetic — no RNG state, no shuffle, identical assignment on every
    * run, engine, and cluster size (the property a reproducible training
    * recipe needs). Appends the split name as `splitCol`. */
  def splitByHash(df: DataFrame, idCol: String, splitCol: String,
      splits: Seq[(String, Double)], buckets: Int = 1000): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 > 0), s"split weights must be positive: $splits")
    val total = splits.map(_._2).sum
    val cumBounds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.floor(buckets * c / total).toLong)
    val slot = slotOf(col(idCol), buckets)
    val assign = splits.init.map(_._1).zip(cumBounds.init)
      .foldRight(lit(splits.last._1)) { case ((name, bound), rest) =>
        when(slot < bound, name).otherwise(rest)
      }
    df.withColumn(splitCol, assign)
  }
}
