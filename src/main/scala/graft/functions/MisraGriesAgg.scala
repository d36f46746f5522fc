package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary as a typed mergeable
  * [[Aggregator]] — the deterministic-guarantee counterpart to
  * [[CountMinAgg]]'s probabilistic counts (SURVEY §7.3's mergeable-
  * sketch family: HLL++ cardinality, Count-Min counts, MG membership).
  *
  * Classic single-pass rule (Misra & Gries 1982) with k counters:
  * present → increment; room → insert at 1; full → decrement ALL
  * counters, drop zeros (the arriving item is absorbed by the
  * decrement). Merge per Agarwal et al., "Mergeable Summaries" (PODS
  * 2012): add counts item-wise, then subtract the (k+1)-th largest
  * count and drop non-positives — errors add, so ANY merge tree keeps
  * the bound `true − N/(k+1) ≤ est ≤ true`.
  *
  * The load-bearing guarantee is NO FALSE NEGATIVES: every item with
  * true count > N/(k+1) survives with est > 0, regardless of merge
  * order. Estimates themselves are partition-order-dependent (only the
  * bound is deterministic), so the production pattern — and the one
  * the q142 query pins — is sketch-for-candidates, then an exact
  * recount of the candidate set only: deterministic output, one
  * full-data pass, aggregate state O(k).
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k >= 1, s"k must be >= 1: $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] = {
    if (item == null) buf
    else buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < k => buf.updated(item, 1L)
      case None =>
        // decrement-all: O(k) but amortized O(1) — each pass pays for
        // the >= 1 slots it frees
        buf.collect { case (w, c) if c > 1 => w -> (c - 1) }
    }
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (w, c)) =>
      m.updated(w, m.getOrElse(w, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
      combined.collect { case (w, c) if c > cut => w -> (c - cut) }
    }
  }

  /** Sorted candidate items — the superset of every item with true
    * count above N/(k+1). */
  override def finish(buf: Map[String, Long]): Seq[String] = buf.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object MisraGriesAgg {
  /** Column form usable in `agg(...)` on a string column. */
  def candidates(col: Column, k: Int): Column =
    org.apache.spark.sql.functions.udaf(new MisraGriesAgg(k), Encoders.STRING)(col)
}
