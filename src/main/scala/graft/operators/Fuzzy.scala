package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) self-join — entity resolution's workhorse:
  * all pairs of rows whose strings are within Levenshtein distance k,
  * WITHOUT the quadratic cross join. Exact: candidates are a proven
  * superset, survivors get a `levenshtein` verify.
  *
  * Two candidate schemes, picked by k:
  *
  * - k <= 2 (the entity-matching regime): SYMMETRIC DELETION
  *   signatures (Mor & Fraenkel 1982, the SymSpell scheme): if
  *   ed(s,t) <= k, an optimal alignment's substituted/deleted
  *   positions can be deleted from s and its substituted/inserted
  *   chars from t to yield the SAME string — so s and t share a
  *   <=k-deletion variant, and joining on variants finds every true
  *   pair. Variants of distinct strings collide only when the strings
  *   really are close, so bucket sizes track the answer size, not the
  *   corpus's shared structure — unlike gram-based blocking, this
  *   survives low-entropy corpora (serial numbers, zero-padded ids)
  *   where every string shares most of its grams. Cost: ~len^k
  *   variants per string, right for short strings and small k.
  *
  * - k >= 3: Ed-Join-style q-gram PREFIX filtering (Xiao, Wang & Lin,
  *   PVLDB 2008): order each string's q-grams by global frequency and
  *   keep the rarest k·q+1; prefix-disjoint pairs have gram overlap
  *   below the max(|s|,|t|)−q+1−k·q lower bound, so ed > k. Joining
  *   on rare grams is self-limiting against skew (a popular gram is
  *   pushed out of every prefix), and per-string cost stays linear in
  *   length where the deletion scheme's len^k blows up.
  *
  * At scale both shapes are one bounded shuffle on signature values, a
  * distinct on candidate id pairs, and a verify join — no stage ever
  * touches O(n²) pairs.
  */
object Fuzzy {

  /** All unordered pairs `(id_a, id_b, dist)` with
    * `levenshtein(text_a, text_b) <= maxDist`, `id_a < id_b`.
    *
    * @param q gram size for the k >= 3 prefix-filter path (unused when
    *          maxDist <= 2)
    */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int, q: Int = 3): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    require(q >= 1, s"q must be >= 1: $q")
    val strings = df.select(col(idCol).as("__id"), col(textCol).as("__text"),
      length(col(textCol)).as("__len"))
    val cand = if (maxDist <= 2) deletionCandidates(strings, maxDist)
      else prefixCandidates(strings, maxDist, q)
    verify(strings, cand.distinct(), maxDist)
  }

  /** Candidate pairs via <=k-deletion variants, k <= 2. Variant rows
    * are built level by level with explode (never `sequence(1, 0)`,
    * which is DESCENDING, not empty), deduplicated per string —
    * repeated chars collapse ("aaaa" has one 1-deletion variant. */
  private def deletionCandidates(strings: DataFrame, k: Int): DataFrame = {
    val d0 = strings.select(col("__id"), col("__text").as("__v"),
      col("__len"))
    def deleteOne(level: DataFrame): DataFrame = level
      .filter(length(col("__v")) >= 1)
      .select(col("__id"),
        explode(expr("sequence(1, length(__v))")).as("__i"),
        col("__v"), col("__len"))
      .select(col("__id"),
        concat(expr("substring(__v, 1, __i - 1)"),
          expr("substring(__v, __i + 1, length(__v))")).as("__v"),
        col("__len"))
    val levels = Iterator.iterate(d0)(deleteOne).take(k + 1).toSeq
    val variants = levels.reduce(_ union _)
      .select(col("__id"), col("__v"), col("__len")).distinct()
    variants.as("a")
      .join(variants.as("b"), col("a.__v") === col("b.__v")
        && col("a.__id") < col("b.__id")
        && abs(col("a.__len") - col("b.__len")) <= k)
      .select(col("a.__id").as("__ida"), col("b.__id").as("__idb"))
  }

  /** Candidate pairs via the rarest k·q+1 grams per string. The gram
    * overlap lower bound max(|s|,|t|)−q+1−k·q is VACUOUS when both
    * strings are shorter than q·(k+1) — such a pair can sit within
    * distance k sharing zero grams — so pairs where both sides are
    * under that threshold go through a length-banded short pool
    * (all-pairs within ±k of length, among sub-threshold strings
    * only). Pairs with at least one side at or past the threshold are
    * provably caught by the prefix join. Pick q <= minLen/(k+1) to
    * keep the pool empty on corpora of uniformly short strings. */
  private def prefixCandidates(strings: DataFrame, k: Int, q: Int): DataFrame = {
    // sequence(1, 0) is descending, never empty, so short strings must
    // be excluded before the transform
    val grams = strings.filter(col("__len") >= q)
      .select(col("__id"),
        posexplode(expr(
          s"transform(sequence(1, __len - ${q - 1}), i -> substring(__text, i, $q))"))
          .as(Seq("__pos", "__gram")))
    val freq = grams.groupBy(col("__gram")).agg(count(lit(1)).as("__freq"))

    // the global order (freq, gram) is total per gram VALUE; __pos only
    // breaks ties among a string's duplicate grams, deterministically
    val prefix = grams.join(broadcast(freq), "__gram")
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("__id"))
          .orderBy(col("__freq"), col("__gram"), col("__pos"))))
      .filter(col("__rk") <= k * q + 1)
      .join(strings.select(col("__id"), col("__len")), "__id")
      .select(col("__id"), col("__gram"), col("__len"))

    // the length filter runs INSIDE the gram join, before the pair ever
    // materializes — same-gram different-length pairs cost nothing
    val longCand = prefix.as("a")
      .join(prefix.as("b"), col("a.__gram") === col("b.__gram")
        && col("a.__id") < col("b.__id")
        && abs(col("a.__len") - col("b.__len")) <= k)
      .select(col("a.__id").as("__ida"), col("b.__id").as("__idb"))

    // sub-threshold strings band against every sub-threshold length
    // within ±k (both-short pairs arise once per side, hence the
    // caller's distinct); short-vs-long pairs are prefix-covered
    val shortLen = q * (k + 1)
    val shorts = strings.filter(col("__len") < shortLen)
      .select(col("__id"), explode(expr(
        s"sequence(greatest(0L, __len - $k), __len + $k)")).as("__band"))
    val byLen = strings.filter(col("__len") < shortLen)
      .select(col("__id").as("__oid"), col("__len").as("__band"))
    val shortCand = shorts.join(byLen, "__band")
      .select(least(col("__id"), col("__oid")).as("__ida"),
        greatest(col("__id"), col("__oid")).as("__idb"))
      .filter(col("__ida") < col("__idb"))
    longCand.union(shortCand)
  }

  private def verify(strings: DataFrame, cand: DataFrame, k: Int): DataFrame = {
    val a = strings.select(col("__id").as("__ida"), col("__text").as("__ta"))
    val b = strings.select(col("__id").as("__idb"), col("__text").as("__tb"))
    // banded O(k·n) distance with early exit — exact for dist ≤ k,
    // sentinel k+1 above, so the filter semantics are identical to the
    // full-matrix levenshtein while non-matching candidates (the vast
    // majority) cost a length check plus a few band rows
    cand.join(a, "__ida").join(b, "__idb")
      .withColumn("__dist", graft.functions.Functions
        .bounded_levenshtein(col("__ta"), col("__tb"), k))
      .filter(col("__dist") <= k)
      .select(col("__ida").as("id_a"), col("__idb").as("id_b"),
        col("__dist").as("dist"))
  }

  /** Reciprocal (mutual) best match between two record sets within a
    * block — the symmetric-nearest-neighbor linkage rule: a pair links
    * only when the right record is the left's closest match AND the
    * left is the right's closest, which kills the asymmetric chains a
    * one-directional argmin produces. Distance is |leftKey − rightKey|
    * on integer keys (exact); ties break on the partner's id, so the
    * match set is deterministic under any partitioning.
    *
    * Spark shape: candidates come from ONE equi-join on the block key
    * (cost Σ |block_L|·|block_R| — the block choice bounds the
    * quadratic, as in all blocking schemes); both argmin directions are
    * row_number windows over that same pair set. Nothing global, no
    * driver round-trips. Returns `(block, left_id, right_id, dist)`. */
  def mutualBestMatch(left: DataFrame, lIdCol: String, lKeyCol: String,
      right: DataFrame, rIdCol: String, rKeyCol: String,
      blockCol: String): DataFrame = {
    val l = left.select(col(blockCol).as("block"), col(lIdCol).as("left_id"),
      col(lKeyCol).cast("long").as("__lk"))
    val r = right.select(col(blockCol).as("block"), col(rIdCol).as("right_id"),
      col(rKeyCol).cast("long").as("__rk"))
    val pairs = l.join(r, "block")
      .withColumn("dist", abs(col("__lk") - col("__rk")))
    val wl = Window.partitionBy(col("block"), col("left_id"))
      .orderBy(col("dist").asc, col("right_id").asc)
    val wr = Window.partitionBy(col("block"), col("right_id"))
      .orderBy(col("dist").asc, col("left_id").asc)
    pairs
      .withColumn("__bl", row_number().over(wl))
      .withColumn("__br", row_number().over(wr))
      .filter(col("__bl") === 1 && col("__br") === 1)
      .select(col("block"), col("left_id"), col("right_id"), col("dist"))
  }

  /** Blocked sorted-neighborhood candidate generation (Hernández &
    * Stolfo 1995) — the classic entity-resolution blocking method: sort
    * records by a discriminating key WITHIN a coarse block, slide a
    * window of `w`, and emit each record paired with its ≤w successors,
    * verified by edit distance ≤ `maxDist`. Linear candidate count
    * (≤ w·n) instead of the quadratic all-pairs.
    *
    * Spark shape: the "sorted" part is a PARTITIONED window (block →
    * in-partition sort), never a global ordering — blocks distribute
    * freely, so the method survives any corpus size as long as blocks
    * do (pick the block key accordingly; a skewed block degrades to
    * that block's w·|block|, still linear). One shuffle on the block
    * key; the w successor columns come from `lead`, so no self-join at
    * all. Ties in the sort key break on `idCol` — deterministic pairs
    * under any partitioning. */
  def sortedNeighborhood(df: DataFrame, blockCol: String, keyCol: String,
      idCol: String, textCol: String, w: Int, maxDist: Int): DataFrame = {
    require(w >= 1, s"w must be >= 1: $w")
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    val win = Window.partitionBy(col(blockCol))
      .orderBy(col(keyCol).asc, col(idCol).asc)
    val withLeads = df.select(col(blockCol), col(keyCol), col(idCol),
        col(textCol))
      .withColumn("__nbrs", array((1 to w).map(i =>
        struct(lead(col(idCol), i).over(win).as("nid"),
          lead(col(textCol), i).over(win).as("ntext"))): _*))
    withLeads
      .select(col(blockCol), col(idCol).as("id_a"),
        col(textCol).as("__ta"), explode(col("__nbrs")).as("__n"))
      .filter(col("__n.nid").isNotNull)
      .withColumn("dist", graft.functions.Functions
        .bounded_levenshtein(col("__ta"), col("__n.ntext"), maxDist))
      .filter(col("dist") <= maxDist)
      .select(col(blockCol), col("id_a"), col("__n.nid").as("id_b"),
        col("dist"))
  }
}
