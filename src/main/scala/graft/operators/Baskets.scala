package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining (the candidate-generation half of
  * frequent-itemset mining, A-Priori style).
  */
object Baskets {

  /** All item pairs co-occurring in at least `minPairSupport` baskets,
    * as `(item_a, item_b, support)` with `item_a < item_b`; support
    * counts DISTINCT baskets (an item repeated inside one basket counts
    * once).
    *
    * The quadratic hazard in pair mining is the per-basket explosion:
    * a basket of k items yields C(k,2) pairs, and one pathological
    * mega-basket dominates the whole job. The A-Priori downward-closure
    * prune is applied first — an item in fewer than `minItemSupport`
    * baskets cannot appear in any pair with support ≥ that bound
    * (pair support ≤ either item's support), so infrequent items are
    * dropped BEFORE pairing, shrinking every basket. Shape: distinct →
    * item-support aggregate → semi-join prune (AQE broadcasts the
    * frequent-item set when small) → per-basket self-join → pair
    * count. All shuffles are keyed on basket or pair; nothing collects.
    *
    * `minItemSupport` must be ≤ `minPairSupport` for an exact result
    * (downward closure guarantees no pair is lost at equality; a higher
    * item bound would drop qualifying pairs).
    */
  def frequentPairs(baskets: DataFrame, basketCol: String, itemCol: String,
      minItemSupport: Long, minPairSupport: Long): DataFrame = {
    require(minItemSupport >= 1 && minPairSupport >= 1,
      s"supports must be >= 1: $minItemSupport, $minPairSupport")
    require(minItemSupport <= minPairSupport,
      s"minItemSupport $minItemSupport > minPairSupport $minPairSupport " +
        "would drop qualifying pairs (downward closure only bounds item " +
        "support from below by pair support)")
    val bi = baskets
      .select(col(basketCol).as("__basket"), col(itemCol).as("__item"))
      .distinct()
    val frequent = bi.groupBy(col("__item"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minItemSupport)
      .select(col("__item"))
    val pruned = bi.join(frequent, Seq("__item"), "left_semi")
    val x = pruned.select(col("__basket"), col("__item").as("item_a"))
    val y = pruned.select(col("__basket"), col("__item").as("item_b"))
    x.join(y, "__basket")
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minPairSupport)
  }

  /** Item-item cosine similarity over basket co-occurrence (the
    * Sarwar et al. 2001 item-based collaborative-filtering weight):
    * `cos(a,b) = co(a,b) / √(n_a · n_b)` where `n_x` counts distinct
    * baskets containing `x` — co-occurrence normalized so two popular
    * items aren't "similar" merely for being everywhere.
    *
    * Built on [[frequentPairs]] (A-Priori pruned, so no mega-basket
    * pair explosion); the per-item support table is item-count-sized
    * and AQE-broadcasts into the two degree joins. All integer inputs
    * to one map-side double expression — deterministic everywhere.
    *
    * Returns `(item_a, item_b, support, n_a, n_b, cosine)` with
    * `item_a < item_b`, cosine rounded to 6. */
  def itemCosine(baskets: DataFrame, basketCol: String, itemCol: String,
      minItemSupport: Long, minPairSupport: Long): DataFrame = {
    val pairs = frequentPairs(baskets, basketCol, itemCol,
      minItemSupport, minPairSupport)
    val itemN = baskets
      .select(col(basketCol).as("__basket"), col(itemCol).as("__item"))
      .distinct()
      .groupBy(col("__item")).agg(count(lit(1)).as("__n"))
    pairs
      .join(itemN.select(col("__item").as("item_a"), col("__n").as("n_a")),
        "item_a")
      .join(itemN.select(col("__item").as("item_b"), col("__n").as("n_b")),
        "item_b")
      .select(col("item_a"), col("item_b"), col("support"),
        col("n_a"), col("n_b"),
        round(col("support") /
          sqrt((col("n_a") * col("n_b")).cast("double")), 6).as("cosine"))
  }
}
