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

  /** The ADMISSION-family draw (different multiplier — 2246822519, an
    * xxHash prime; the product still fits a signed long). Sampling
    * decisions (rebalance, stratified, temperature, upsample) compose
    * with SPLIT decisions ([[slotOf]]): if both families shared one
    * slot, the "independent" Bernoullis would be deterministically
    * coupled — e.g. a half-rate sample whose survivors are exactly the
    * train split, leaving val/test empty. One multiplier per decision
    * family keeps sample→split chains unbiased. */
  private[graft] def slotOf2(id: org.apache.spark.sql.Column, buckets: Int,
      salt: Int = 0) = {
    require(salt >= 0 && salt < 1000000, s"salt must be in [0, 1e6): $salt")
    // the salt scrambles MULTIPLICATIVELY before the draw multiplier (an
    // additive constant would only shift every slot by the same amount —
    // zero decorrelation). salt=0 is the identity round, so unsalted
    // behavior and its SQL oracles are unchanged. Decorrelation is
    // approximate (multiplicative permutations are not pairwise
    // independent): chained joint rates land within a few points of
    // r1·r2 — prefer salts >= 7
    val scrambled = pmod(pmod(id, lit(2147483648L)) * lit(2L * salt + 1L),
      lit(2147483648L))
    pmod(scrambled * lit(2246822519L), lit(buckets.toLong))
  }

  /** Downsample each domain to an EXPECTED `targetPerDomain` rows
    * (domains already at or below the target keep ~everything; the draw
    * is per-row, so kept counts concentrate around `rate · n_s`).
    *
    * @param buckets admission-rate granularity (rate is quantized to
    *                1/buckets steps, floor-rounded)
    */
  def rebalanceDomains(df: DataFrame, domainCol: String, idCol: String,
      targetPerDomain: Long, buckets: Int = 1000, salt: Int = 0): DataFrame = {
    require(targetPerDomain > 0, s"targetPerDomain must be positive: $targetPerDomain")
    require(buckets > 0, s"buckets must be positive: $buckets")
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("__n"))
    val admit = least(lit(buckets.toLong),
      floor(lit(buckets.toDouble) * lit(targetPerDomain.toDouble) / col("__n")))
    df.join(broadcast(counts), domainCol)
      .filter(slotOf2(col(idCol), buckets, salt) < admit)
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

  /** Per-stratum deterministic sampling: keep an expected `fraction` of
    * each stratum, by the same reproducible multiplicative-hash draw as
    * [[splitByHash]]. Unlike `df.stat.sampleBy` the draw is RNG-free —
    * the same rows survive on every run, engine and partitioning, so a
    * sampled corpus is a stable artifact, not a lottery. Strata absent
    * from `fractions` keep `defaultFraction`. Pure map-side filter: no
    * shuffle, no per-stratum pass — one scan at any scale. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      buckets: Int = 1000, salt: Int = 0): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      s"fractions must be in [0,1]: $fractions / $defaultFraction")
    val slot = slotOf2(col(idCol), buckets, salt)
    def bound(f: Double) = lit(math.floor(buckets * f).toLong)
    val admit = fractions.foldRight(bound(defaultFraction): org.apache.spark.sql.Column) {
      case ((name, f), rest) => when(col(strataCol) === name, bound(f)).otherwise(rest)
    }
    df.filter(slot < admit)
  }

  /** Temperature-scaled domain mixture rates — the multilingual/domain
    * data-mixing recipe (Conneau & Lample 2019; GPT-3's dataset weights):
    * domain d's target share of the mixture is n_d^tau / Σ_e n_e^tau,
    * so tau < 1 flattens the natural distribution toward low-resource
    * domains and tau = 1 keeps it. The per-row admission rate that hits
    * an EXPECTED `targetTotal` rows overall is min(1, targetTotal ·
    * share_d / n_d); a domain whose rate caps at 1 contributes all it
    * has, so the realized total can land below target (the standard
    * behavior — re-run with a higher tau or target to compensate).
    *
    * Returns (domainCol, n, rate) with rate rounded to 6 places so the
    * downstream draw threshold is engine-stable. One aggregate over the
    * corpus + arithmetic on |domains| rows — nothing corpus-sized moves.
    */
  def temperatureRates(df: DataFrame, domainCol: String, tau: Double,
      targetTotal: Long): DataFrame =
    tempRates(df, domainCol, tau, targetTotal, cap = true)

  private def tempRates(df: DataFrame, domainCol: String, tau: Double,
      targetTotal: Long, cap: Boolean): DataFrame = {
    require(tau > 0, s"tau must be positive: $tau")
    require(targetTotal > 0, s"targetTotal must be positive: $targetTotal")
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("n"))
      .withColumn("__w", pow(col("n").cast("double"), lit(tau)))
    // total weight via a broadcast 1-row cross join, not a window over
    // an empty partitioning (which would single-partition the frame —
    // harmless at |domains| rows but a bad habit to codify)
    val total = counts.agg(sum(col("__w")).as("__tw"))
    val raw = lit(targetTotal.toDouble) * col("__w") / col("__tw") / col("n")
    counts.crossJoin(broadcast(total))
      .select(col(domainCol), col("n"),
        round(if (cap) least(lit(1.0), raw) else raw, 6).as("rate"))
  }

  /** The temperature-sampled mixture itself: every row admitted by the
    * same reproducible multiplicative-hash draw as [[stratifiedSample]],
    * at its domain's [[temperatureRates]] rate. One corpus scan plus a
    * broadcast hash join against |domains| rows — map-side at any scale,
    * and RNG-free, so the sampled corpus is a stable artifact.
    *
    * Rows with a NULL domain are dropped (the inner rate join cannot
    * match them) — bucket them under a sentinel domain first if they
    * should participate. */
  def temperatureSample(df: DataFrame, domainCol: String, idCol: String,
      tau: Double, targetTotal: Long, buckets: Int = 1000,
      salt: Int = 0): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val admits = temperatureRates(df, domainCol, tau, targetTotal)
      .select(col(domainCol),
        floor(lit(buckets.toDouble) * col("rate")).as("__admit"))
    df.join(broadcast(admits), domainCol)
      .filter(slotOf2(col(idCol), buckets, salt) < col("__admit"))
      .drop("__admit")
  }

  /** Uncapped temperature mixture rates: like [[temperatureRates]] but a
    * low-resource domain's rate may exceed 1 — the standard recipe then
    * REPEATS its documents (multiple epochs over the small domain per
    * epoch over the large one) instead of capping its contribution.
    * Returns (domainCol, n, rate) with the same 6-place rounding. */
  def temperatureRatesUncapped(df: DataFrame, domainCol: String, tau: Double,
      targetTotal: Long): DataFrame =
    tempRates(df, domainCol, tau, targetTotal, cap = false)

  /** Repetition-based domain up/down-sampling — the full data-mixing
    * recipe: every row is emitted `floor(rate)` times plus one more when
    * the reproducible multiplicative-hash draw admits it at the rate's
    * fractional part, so a domain at rate 2.3 contributes each document
    * twice and ~30% of them a third time (expected emitted count =
    * rate · n exactly), while rate 0.4 downsamples as before. Output
    * rows carry a 1-based `copy` index — the training loader's dedup
    * handle within an epoch.
    *
    * Scale shape: one corpus aggregate for the rates, a broadcast join
    * against |domains| rows, then a pure map-side explode of a
    * `sequence(1, copies)` literal — nothing corpus-sized shuffles, and
    * the blowup factor is exactly the requested oversampling. RNG-free
    * like every sampler here: the same copies are emitted on every run,
    * engine, and partitioning. */
  def upsampleDomains(df: DataFrame, domainCol: String, idCol: String,
      tau: Double, targetTotal: Long, buckets: Int = 1000,
      salt: Int = 0): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val rates = temperatureRatesUncapped(df, domainCol, tau, targetTotal)
      .select(col(domainCol), floor(col("rate")).cast("int").as("__whole"),
        floor(lit(buckets.toDouble) * (col("rate") - floor(col("rate"))))
          .as("__fracAdmit"))
    val copies = (col("__whole") +
      when(slotOf2(col(idCol), buckets, salt) < col("__fracAdmit"), 1).otherwise(0))
      .cast("int")
    // Spark's sequence(1, 0) yields a DESCENDING [1, 0], not empty — the
    // zero-copy case must short-circuit to an empty array explicitly
    df.join(broadcast(rates), domainCol)
      .withColumn("copy", explode(when(copies >= 1,
        sequence(lit(1), copies)).otherwise(array().cast("array<int>"))))
      .drop("__whole", "__fracAdmit")
  }

  /** Concat-and-chunk sequence packing — the layout step that turns a
    * tokenized corpus into fixed-length training sequences (the GPT-style
    * "pack everything end to end, cut every seqLen tokens" recipe):
    * documents are laid out end-to-end in `orderCol` order and the token
    * stream is cut every `seqLen` tokens. Emits, per document, where it
    * landed: its global token offset, first/last training sequence index
    * and offset within the first sequence — the metadata a loader needs
    * to slice the actual token tensors, and what boundary-aware attention
    * masking consumes.
    *
    * The global token offset is an exact distributed prefix sum
    * ([[Scale.prefixSum]]: per-partition sums → driver scan of
    * #partitions longs → broadcast offsets), so there is no
    * single-partition exchange; the corpus is scanned, never collected.
    * `orderCol` must be unique (prefix-sum requirement).
    */
  /** Weighted sample WITHOUT replacement, k rows, exact Efraimidis–
    * Spirtakis (2006) semantics: each row draws a uniform u from the
    * deterministic multiplicative hash (the house draw — replayable in
    * plain SQL) and the k smallest `-ln(u)/weight` keys win, so a row's
    * inclusion probability is proportional to its weight at every step.
    * RNG-free: the same k rows survive on every run, engine, and
    * partitioning; distinct salts draw decorrelated samples. Rows with
    * non-positive weight are excluded. The global top-k is a bounded
    * TakeOrdered — no full sort. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: Int = 0): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(salt >= 0 && salt < 1000000, s"salt must be in [0, 1e6): $salt")
    // 20-bit uniform in (0, 1]: u = 1 exactly is legal (-ln(1) = 0 wins)
    val u = (pmod(pmod(pmod(col(idCol), lit(2147483648L)) * lit(2L * salt + 1L),
      lit(2147483648L)) * lit(2246822519L), lit(1048576L)) + lit(1L))
      .cast("double") / lit(1048576.0)
    df.filter(col(weightCol) > 0)
      .withColumn("__wkey", -log(u) / col(weightCol))
      .orderBy(col("__wkey"), col(idCol))
      .limit(k)
      .drop("__wkey")
  }

  /** EXACTLY-k-per-group uniform sample (or the whole group when it is
    * smaller) — the fixed-budget companion to [[stratifiedSample]]'s
    * fixed-RATE draw: rank each group's rows by `md5(salt ":" id)` and
    * keep the first k. The hash order is a deterministic uniform
    * permutation, so the same rows survive on every run, engine, and
    * partitioning; distinct salts draw decorrelated samples. The
    * single-key row_number shape is what [[graft.plans.TopKRewriteRule]]
    * fires on, so each scan partition reduces to ≤ k rows per group in
    * a bounded HEAP before the exchange — the shuffle moves
    * ~groups·k·partitions rows, never the corpus. (md5 collisions would
    * make the boundary tie arbitrary; on distinct ids they are
    * vanishingly improbable.) */
  def sampleKPerGroup(df: DataFrame, groupCol: String, idCol: String,
      k: Int, salt: Int = 0): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    // nulls-last so TopKRewriteRule's exactness precondition holds (the
    // hash is never null, but the rule can't know that); plain ASC
    // would fall through to the built-in sort-based WindowGroupLimit
    val rn = row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
        .orderBy(md5(concat_ws(":", lit(salt), col(idCol))).asc_nulls_last))
    df.withColumn("__rn", rn).filter(col("__rn") <= k).drop("__rn")
  }

  /** Deterministic negative sampling for contrastive training pairs:
    * for every anchor id, `k` pseudo-random other ids as
    * `(anchor, j, neg_id)`, j = 0..k-1. The draw is the repo's
    * replayable multiplicative hash (no RNG, same negatives every
    * run/engine/partitioning — the property that makes a training set
    * reproducible); self-collisions are dropped (standard slight
    * undersample), repeated negatives per anchor are kept
    * (with-replacement semantics).
    *
    * Requires DENSE ids 0..N−1 (`neg_id` must name an existing row —
    * doc_id/vec_id here are dense by construction; reindex through a
    * rank first otherwise). Shape: one 1-row count broadcast + a
    * map-side explode — no shuffle at all; the payload fetch is the
    * caller's join against the corpus on `neg_id`, one keyed shuffle
    * whose skew is bounded by the hash's uniformity.
    */
  def negativeSample(ids: DataFrame, idCol: String, k: Int,
      salt: Long = 0L): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(salt >= 0 && salt < (1L << 32), s"salt must fit 32 bits: $salt")
    val n = ids.agg(count(lit(1)).as("__N"))
    ids.select(col(idCol).as("anchor"))
      .crossJoin(broadcast(n))
      .select(col("anchor"),
        explode(sequence(lit(0), lit(k - 1))).as("j"), col("__N"))
      // (anchor mod 2^31)·2246822519 ≤ 4.9e18 — no long overflow; all
      // terms non-negative so % is already the positive residue
      .withColumn("neg_id",
        ((col("anchor") % lit(2147483648L)) * lit(2246822519L) +
          (col("j") + 1) * lit(40503L) + lit(salt)) % col("__N"))
      .filter(col("neg_id") =!= col("anchor"))
      .drop("__N")
  }

  def packSequences(df: DataFrame, orderCol: String, nTokensCol: String,
      seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    // `div` (not `/`): exact integer division at any token count — a
    // double-typed division would silently lose precision past 2^53
    // cumulative tokens, well within 100 TB range
    Scale.prefixSum(df, orderCol, nTokensCol, "__cum")
      .withColumn("start_token", col("__cum") - col(nTokensCol))
      .withColumn("first_seq", expr(s"`start_token` div $seqLen"))
      // empty docs occupy no sequence: last_seq degenerates to first_seq
      .withColumn("last_seq",
        greatest(expr(s"(`__cum` - 1) div $seqLen"), col("first_seq")))
      .withColumn("seq_offset", pmod(col("start_token"), lit(seqLen.toLong)))
      .drop("__cum")
  }

  /** Power-of-two length bucketing for padded batching: each row's
    * `lengthCol` maps to the smallest power of two ≥ it, and the report
    * gives per-bucket row/token counts plus the padding a batcher would
    * waste filling every sequence to the bucket size — the read-out
    * that decides bucket granularity for a training dataloader.
    *
    * The bucket id is INTEGER arithmetic: `2^bitlen(n-1)` via the
    * binary-string length of `n-1` (`length(bin(n-1))`), never
    * `2^ceil(log2 n)` — the float log misassigns exact powers of two.
    * Map-side projection + one ≤64-group aggregate; returns
    * `(bucket, n_rows, total_len, padding, waste_frac)`. */
  /** Neyman-optimal stratified sample allocation (Neyman 1934): a
    * fixed sample budget split across strata ∝ `n_h · σ_h` — big AND
    * variable strata get more samples, minimizing the variance of the
    * stratified mean estimate; the statistically-right alternative to
    * q105's proportional allocation when strata differ in spread.
    *
    * Determinism: `valueCol` must be integer-valued (cents-style), so
    * each stratum's sum-of-squares comes from EXACT long moments
    * (`n·Σx² − (Σx)²` assembled in double from exact longs); the
    * allocation share divides by the ordered fold of the per-stratum
    * weights (strata are metadata-sized, [[Profile.cramersV]]'s
    * trick), and the integer allocation is `floor(x + 0.5)` — no
    * engine-specific round-half rule anywhere.
    *
    * Returns `(stratumCol, n_rows, sigma, alloc)`; single-row strata
    * carry NULL sigma and allocate 0. */
  def neymanAllocation(df: DataFrame, stratumCol: String,
      valueCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    val x = col(valueCol).cast("long")
    // the square sum MUST be decimal: cents² ~ 3e15 per row crosses
    // Long.Max within ~3k rows per stratum — sf0.01 sat just under the
    // edge and sf0.1 overflowed (caught by the round-9 full bench)
    val m = df.groupBy(col(stratumCol)).agg(
      count(lit(1)).as("n_rows"), sum(x).as("__sx"),
      sum(x.cast("decimal(38,0)") * x).as("__sxx"))
    val nD = col("n_rows").cast("double")
    val sigma = when(col("n_rows") >= 2,
      sqrt(greatest(lit(0.0),
        (nD * col("__sxx").cast("double")
          - col("__sx").cast("double") * col("__sx").cast("double"))
          / (nD * (nD - 1)))))
    val withW = m.withColumn("__sigma", sigma)
      .withColumn("__w", coalesce(nD * col("__sigma"), lit(0.0)))
    val tot = withW.agg(
      collect_list(struct(col(stratumCol), col("__w"))).as("__ws"))
      .select(aggregate(array_sort(col("__ws")), lit(0.0),
        (acc, s) => acc + s.getField("__w")).as("__wtot"))
    withW.crossJoin(broadcast(tot))
      .select(col(stratumCol), col("n_rows"),
        round(col("__sigma"), 6).as("sigma"),
        floor(lit(budget.toDouble) * col("__w") / col("__wtot") + 0.5)
          .cast("long").as("alloc"))
  }

  /** Temporal train/test split with an EMBARGO gap (the leakage control
    * financial ML calls purging/embargoing, López de Prado 2018):
    * rows at or before `trainEnd` train, rows strictly after
    * `trainEnd + embargoDays` test, and the embargo window between them
    * is DROPPED — so labels that leak across the boundary through
    * lagged features or overlapping windows can't contaminate the test
    * fold. The date-threshold complement of [[splitByHash]] (which
    * protects against entity leakage, not temporal leakage).
    *
    * Pure map-side filter + tag — no shuffle, no state; composes with
    * any downstream aggregate on its own partitioning. Returns the
    * input rows with a `split` column ('train' | 'test'), embargoed
    * rows absent. */
  def embargoSplit(df: DataFrame, tsCol: String, trainEnd: String,
      embargoDays: Int): DataFrame = {
    require(embargoDays >= 0, s"embargoDays must be >= 0: $embargoDays")
    val day = to_date(col(tsCol))
    val end = to_date(lit(trainEnd))
    df.withColumn("split",
        when(day <= end, "train")
          .when(day > date_add(end, embargoDays), "test"))
      .filter(col("split").isNotNull)
  }

  def lengthBuckets(df: DataFrame, lengthCol: String): DataFrame = {
    df.select(col(lengthCol).cast("long").as("__n"))
      .withColumn("bucket", when(col("__n") <= 1, lit(1L))
        // SQL shiftleft accepts a column shift amount; the DSL overload
        // only takes a literal
        .otherwise(expr(
          "shiftleft(cast(1 as bigint), cast(length(bin(__n - 1)) as int))")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__n")).as("total_len"),
        sum(col("bucket") - col("__n")).as("padding"))
      .select(col("bucket"), col("n_rows"), col("total_len"), col("padding"),
        round(col("padding").cast("double") /
          (col("bucket") * col("n_rows")), 6).as("waste_frac"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score each
    * document by the log-likelihood ratio of a TARGET distribution vs
    * the RAW corpus distribution over hashed unigram features,
    *
    *   log w(doc) = Σ_tokens [ ln p̂_target(h(t)) − ln p̂_raw(h(t)) ]
    *
    * with both distributions add-α smoothed over `buckets` hash slots.
    * `targetPred` marks the rows whose text defines the target (e.g.
    * the high-quality or in-domain slice); the raw distribution is the
    * whole input. Documents whose feature profile looks more like the
    * target than the background get log w > 0 — the resampling keep
    * signal.
    *
    * The feature hash is engine-replayable integer arithmetic (no
    * engine-native string hash): a mod-2³¹ polynomial over the token's
    * code points, mixed by the Knuth multiplicative constant, reduced
    * mod `buckets` — evaluated once per DISTINCT term, so the per-token
    * work is a vocab-sized hash join, not per-occurrence arithmetic.
    *
    * Scale shape: one explode pass over the corpus (the only data-sized
    * shuffle, keyed on the high-cardinality term), a `buckets`-row
    * stats table and a 1-row total — both broadcast. The only float
    * reduction is the per-doc sum of log-ratios over doc-bounded
    * tokens. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      targetPred: org.apache.spark.sql.Column, buckets: Int = 1024,
      alpha: Double = 0.5): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    require(alpha > 0, s"alpha must be positive: $alpha")
    val toks = docs.select(col(idCol).as("__id"), targetPred.as("__tgt"),
      explode(TextAnalysis.tokens(col(textCol))).as("__term"))
    val vocabHash = toks.select(col("__term")).distinct()
      .withColumn("__b", expr(
        "aggregate(transform(sequence(1, length(__term)), " +
          "i -> CAST(ascii(substr(__term, i, 1)) AS BIGINT)), 0L, " +
          "(a, x) -> (a * 31 + x) % 2147483648L) " +
          s"* 1000003 % 2147483648 % $buckets"))
    val hashed = toks.join(vocabHash, "__term")
    val bstats = hashed.groupBy(col("__b")).agg(
      count(lit(1)).as("__cr"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__ct"))
    val totals = bstats.agg(sum(col("__cr")).as("__nr"),
      sum(col("__ct")).as("__nt"))
    val aB = alpha * buckets
    val logRatio =
      log((col("__ct") + lit(alpha)) / (col("__nt") + lit(aB))) -
      log((col("__cr") + lit(alpha)) / (col("__nr") + lit(aB)))
    hashed.join(broadcast(bstats), "__b")
      .crossJoin(broadcast(totals))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(logRatio), 6).as("log_w"))
      .withColumn("keep", col("log_w") > 0.0)
      .withColumnRenamed("__id", idCol)
  }
}
