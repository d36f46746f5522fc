package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset profiling and drift monitoring — the validation pass an
  * ingest pipeline runs on every new snapshot, and the comparison that
  * decides whether the new snapshot is safe to train on.
  */
object Profile {

  /** Per-column profile of numeric columns in ONE scan of the input
    * (q80's shape): stack-unpivot to (column, v), partial-aggregate by
    * value — map-side combine collapses repeated values before the
    * shuffle — then fold into
    * `(column, n_rows, n_nulls, n_distinct, min_v, max_v)`. Exact
    * distinct counts for every column without an Expand and without
    * one scan per column. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val stackArgs = cols.map(c => s"'$c', cast(`$c` as double)").mkString(", ")
    df.selectExpr(s"stack(${cols.length}, $stackArgs) AS (column, v)")
      .groupBy(col("column"), col("v")).agg(count(lit(1)).as("__c"))
      .groupBy(col("column")).agg(
        sum(col("__c")).as("n_rows"),
        coalesce(sum(when(col("v").isNull, col("__c"))), lit(0L)).as("n_nulls"),
        count(when(col("v").isNotNull, 1)).as("n_distinct"),
        round(min(col("v")), 6).as("min_v"),
        round(max(col("v")), 6).as("max_v"))
  }

  /** Drift report between two snapshots of the same schema: both
    * profiles joined per column with the drift signals monitoring
    * alerts on — null-fraction delta, distinct-cardinality ratio, and
    * range expansion/contraction. Two single-scan profiles + one
    * |columns|-row join; cost is two corpus scans at any scale, the
    * report itself is column-count-sized. Fractions and ratios are
    * computed to 6 places from the exact counts on both sides, so the
    * report is engine-replayable. */
  def profileDrift(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    val pa = columnProfile(a, cols)
    val pb = columnProfile(b, cols)
    val sides = Seq("a", "b")
    val renamed = Seq(pa, pb).zip(sides).map { case (p, s) =>
      p.select(col("column") +: Seq("n_rows", "n_nulls", "n_distinct",
        "min_v", "max_v").map(c => col(c).as(s"${c}_$s")): _*)
    }
    renamed.head.join(renamed.last, "column")
      .withColumn("null_frac_delta",
        round(col("n_nulls_b") / col("n_rows_b")
          - col("n_nulls_a") / col("n_rows_a"), 6))
      .withColumn("distinct_ratio",
        // all-null column on side a: ratio undefined, null (ANSI mode
        // makes an unguarded x/0 a task failure, not an Infinity)
        when(col("n_distinct_a") > 0,
          round(col("n_distinct_b") / col("n_distinct_a").cast("double"), 6)))
      .withColumn("range_delta",
        round((col("max_v_b") - col("min_v_b"))
          - (col("max_v_a") - col("min_v_a")), 6))
  }

  /** Per-stratum Welch two-sample t statistic — the unequal-variance
    * A/B read-out (Welch 1947): t = (m̄₁−m̄₂)/√(s₁²/n₁+s₂²/n₂) with
    * Welch–Satterthwaite degrees of freedom. `variantCol` must take
    * exactly two values per stratum; which is "1" vs "2" is fixed by
    * variant sort order, so the sign is deterministic. One hash
    * aggregate on (stratum, variant) — partial aggregation collapses
    * the corpus map-side, the t math runs on the variant-count-sized
    * result — then a |strata|-sized self-pair via conditional
    * re-aggregation (no join). Strata where either arm has n < 2 or
    * both variances are zero are dropped (t undefined). Returns
    * (stratum, n_1, n_2, mean_diff, t_stat, welch_df) rounded to 6. */
  def welchTTest(df: DataFrame, stratumCol: String, variantCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val stats = df.groupBy(col(stratumCol), col(variantCol).as("__var"))
      .agg(count(v).as("__n"), avg(v).as("__m"), var_samp(v).as("__s2"))
    // rank the two variants by label: rn 1 = lexicographically first
    val rn = row_number().over(Window.partitionBy(col(stratumCol))
      .orderBy(col("__var")))
    val two = stats.withColumn("__rn", rn)
    def side(i: Int, c: String) = max(when(col("__rn") === i, col(c)))
    val folded = two.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__variants"),
        side(1, "__n").as("n_1"), side(2, "__n").as("n_2"),
        side(1, "__m").as("__m1"), side(2, "__m").as("__m2"),
        side(1, "__s2").as("__s21"), side(2, "__s2").as("__s22"))
    val se1 = col("__s21") / col("n_1")
    val se2 = col("__s22") / col("n_2")
    val se = se1 + se2
    folded
      .filter(col("__variants") === 2 && col("n_1") >= 2 &&
        col("n_2") >= 2 && (col("__s21") + col("__s22")) > 0)
      .select(col(stratumCol), col("n_1"), col("n_2"),
        round(col("__m1") - col("__m2"), 6).as("mean_diff"),
        round((col("__m1") - col("__m2")) / sqrt(se), 6).as("t_stat"),
        round(se * se / (se1 * se1 / (col("n_1") - 1)
          + se2 * se2 / (col("n_2") - 1)), 6).as("welch_df"))
  }

  /** Pairwise Pearson correlation matrix over `cols`, as
    * `(col_a, col_b, n, corr)` rows for `col_a < col_b` — the
    * multicollinearity screen a feature pipeline runs before training.
    *
    * Two aggregate passes: means first, then CENTERED cross-products —
    * the one-pass Σxy−ΣxΣy/n closed form cancels catastrophically on
    * large-mean columns (same rationale as `TimeSeries.trendPerKey`).
    * Both aggregates are single-row folds with map-side partials; rows
    * with a null in ANY measured column are dropped once so every pair
    * sees the same n. Correlations rounded to 6. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.length >= 2, s"need >= 2 columns: $cols")
    val clean = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
      .na.drop(cols)
    val meanAggs = count(lit(1)).as("__n") +:
      cols.map(c => avg(col(c)).as(s"__m_$c"))
    val means = clean.agg(meanAggs.head, meanAggs.tail: _*)
    val centered = clean.crossJoin(broadcast(means))
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val sums = centered.agg(
      max(col("__n")).as("__n"),
      (pairs.map { case (a, b) =>
        sum((col(a) - col(s"__m_$a")) * (col(b) - col(s"__m_$b")))
          .as(s"__sxy_${a}_$b") } ++
        cols.map(c =>
          sum((col(c) - col(s"__m_$c")) * (col(c) - col(s"__m_$c")))
            .as(s"__sxx_$c"))): _*)
    val stacked = pairs.map { case (a, b) =>
      s"'$a', '$b', __sxy_${a}_$b / sqrt(__sxx_$a * __sxx_$b)"
    }.mkString(", ")
    sums.selectExpr("__n",
        s"stack(${pairs.length}, $stacked) AS (col_a, col_b, __r)")
      .select(col("col_a"), col("col_b"), col("__n").as("n"),
        round(col("__r"), 6).as("corr"))
  }

  /** Referential-integrity audit across a set of foreign-key relations:
    * one row per relation — `(relation, n_rows, n_null_fk, n_orphans,
    * orphan_rate)` — the ingest gate that catches a broken upstream
    * export before a join silently drops (inner) or null-pads (outer)
    * the mismatched rows. NULL FKs are counted separately, not as
    * orphans (SQL FK semantics). Each relation costs one left join of
    * the child against the parent's distinct keys (dimension-sized,
    * AQE-broadcastable) folded to one row; relations union. */
  def fkAudit(relations: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(relations.nonEmpty, "need at least one relation")
    relations.map { case (label, child, fkCol, parent, pkCol) =>
      child.select(col(fkCol).as("__fk"))
        .join(parent.select(col(pkCol).as("__pk")).distinct(),
          col("__fk") === col("__pk"), "left")
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("__fk").isNull, 1)).as("n_null_fk"),
          count(when(col("__fk").isNotNull && col("__pk").isNull, 1))
            .as("n_orphans"))
        .select(lit(label).as("relation"), col("n_rows"), col("n_null_fk"),
          col("n_orphans"),
          round(col("n_orphans").cast("double") / col("n_rows"), 6)
            .as("orphan_rate"))
    }.reduce(_ unionAll _)
  }

  /** Key-skew diagnostic for a prospective shuffle key, as ONE row:
    * `(n_rows, n_keys, max_count, top1_share, top10_share, gini)` —
    * the report that decides whether a join/aggregation on `keyCol`
    * needs salting ([[Scale.saltedJoin]]) or AQE skew handling before
    * it runs at full scale.
    *
    * Everything after the first aggregate operates on the |keys|-sized
    * count table. The Gini coefficient needs each key's RANK by count —
    * a global order — so ranks come from [[Scale.prefixSum]]'s
    * range-partition machinery, never a single-partition window over
    * the keys: `G = 2·Σ rank·c / (K·Σc) − (K+1)/K` with ranks over
    * `(count, key)` ascending (total order ⇒ deterministic), and the
    * rank-weighted sum is integer arithmetic — exact under any
    * partitioning. Top-10 share reads a bounded TakeOrdered head. */
  def skewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("__k"))
      .agg(count(lit(1)).as("__c"))
    val ranked = Scale.prefixSum(
      counts.withColumn("__ord", struct(col("__c"), col("__k")))
        .withColumn("__one", lit(1)),
      "__ord", "__one", "__rank")
    val folded = ranked.agg(
      sum(col("__c")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("__c")).as("max_count"),
      sum(col("__rank") * col("__c")).as("__rc"))
    // the 10 heaviest keys: orderBy+limit plans as TakeOrdered (bounded
    // heap per partition + driver merge of 10-row heads), not a sort
    val top10 = counts.orderBy(col("__c").desc, col("__k"))
      .limit(10).agg(sum(col("__c")).as("__top10"))
    folded.crossJoin(top10).select(
      col("n_rows"), col("n_keys"), col("max_count"),
      round(col("max_count").cast("double") / col("n_rows"), 6)
        .as("top1_share"),
      round(col("__top10").cast("double") / col("n_rows"), 6)
        .as("top10_share"),
      round(lit(2.0) * col("__rc") / (col("n_keys") * col("n_rows"))
        - (col("n_keys") + lit(1.0)) / col("n_keys"), 6).as("gini"))
  }

  /** Audience overlap matrix: for every pair of segments, the exact
    * member intersection and Jaccard — the dedup step before adding a
    * "new" audience that is 90% an existing one. One distinct pass,
    * one id-keyed self-join whose per-id fan-out is bounded by the
    * segment count (each id contributes ≤ C(|segs|,2) pairs — never
    * corpus-quadratic), and a |segments|²-sized result; the size table
    * AQE-broadcasts into the final joins.
    *
    * Returns `(seg_a, seg_b, n_a, n_b, n_both, jaccard)` with
    * `seg_a < seg_b`, Jaccard rounded to 6; disjoint pairs are absent
    * (their intersection is empty — readers treat missing as 0). */
  def segmentOverlap(df: DataFrame, segCol: String, idCol: String): DataFrame = {
    val us = df.select(col(segCol).as("__s"), col(idCol).as("__id"))
      .distinct()
    val sizes = us.groupBy(col("__s")).agg(count(lit(1)).as("__n"))
    val a = us.select(col("__s").as("seg_a"), col("__id"))
    val b = us.select(col("__s").as("seg_b"), col("__id"))
    val co = a.join(b, "__id").filter(col("seg_a") < col("seg_b"))
      .groupBy(col("seg_a"), col("seg_b")).agg(count(lit(1)).as("n_both"))
    co.join(sizes.select(col("__s").as("seg_a"), col("__n").as("n_a")),
        "seg_a")
      .join(sizes.select(col("__s").as("seg_b"), col("__n").as("n_b")),
        "seg_b")
      .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"),
        col("n_both"),
        round(col("n_both").cast("double")
          / (col("n_a") + col("n_b") - col("n_both")), 6).as("jaccard"))
  }

  /** Cramér's V association between two categorical columns — the
    * normalized chi-squared (in [0,1]) that says whether, e.g., brand
    * and type are independent dimensions or one determines the other.
    * Computed over the FULL r×c grid (absent cells contribute their
    * whole expectation, which a join on observed cells alone would
    * drop).
    *
    * Determinism: the contingency margins are exact longs; each cell's
    * `(o−e)²/e` is one fixed double expression; and the chi² total is
    * folded over the cells in SORTED (a, b) order via a collected
    * array — the grid is |a|·|b| metadata-sized, so the collect is
    * bounded, and the ordered fold removes the one remaining
    * partial-sum order hazard a plain `sum()` would keep.
    *
    * Returns one row `(n, r, c, chi2, cramers_v)`, rounded to 6. */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val t = df.select(col(aCol).cast("string").as("__a"),
      col(bCol).cast("string").as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
    val obs = t.groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__o"))
    val ra = t.groupBy(col("__a")).agg(count(lit(1)).as("__na"))
    val cb = t.groupBy(col("__b")).agg(count(lit(1)).as("__nb"))
    val nRow = t.agg(count(lit(1)).as("__nn"),
      countDistinct(col("__a")).as("r"), countDistinct(col("__b")).as("c"))
    val grid = ra.crossJoin(cb)
      .join(obs, Seq("__a", "__b"), "left")
      .crossJoin(broadcast(nRow))
      .withColumn("__e",
        (col("__na") * col("__nb")).cast("double") / col("__nn"))
      .withColumn("__contrib",
        pow(coalesce(col("__o"), lit(0L)) - col("__e"), 2) / col("__e"))
    grid.agg(
        max(col("__nn")).as("n"), max(col("r")).as("r"),
        max(col("c")).as("c"),
        collect_list(struct(col("__a"), col("__b"), col("__contrib")))
          .as("__cells"))
      .select(col("n"), col("r"), col("c"),
        aggregate(array_sort(col("__cells")), lit(0.0),
          (acc, x) => acc + x.getField("__contrib")).as("__chi2"))
      .select(col("n"), col("r"), col("c"),
        round(col("__chi2"), 6).as("chi2"),
        round(sqrt(col("__chi2") /
          (col("n") * least(col("r") - 1, col("c") - 1))), 6)
          .as("cramers_v"))
  }

  /** Population stability index between a baseline and a comparison
    * distribution — the model-monitoring drift gate (PSI < 0.1 stable,
    * > 0.25 shifted): baseline equi-depth bucket boundaries
    * ([[Quantiles.exactQuantiles]], ONE sort pass), branch-free
    * comparison-sum bucket assignment against the broadcast 1-row
    * boundary table (q152's no-bin-flip shape), per-bucket shares, and
    * `Σ (p_b − p_a)·ln(p_b/p_a)`. The total is folded in bucket order
    * over the collected ≤`buckets`-element array — deterministic, like
    * [[cramersV]]. Buckets empty on either side yield NULL
    * contributions and a NULL total (visible, never silently skipped).
    *
    * Returns `buckets` rows
    * `(bucket, n_a, n_b, p_a, p_b, contrib, psi)`, rounded to 6. */
  def psi(dfA: DataFrame, dfB: DataFrame, valueCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && buckets <= 100,
      s"buckets must be in [2, 100]: $buckets")
    val ps = (1 until buckets).map(_.toDouble / buckets)
    val names = ps.map(p => s"p${(p * 100).round}")
    val bounds = Quantiles.exactQuantiles(dfA, Seq(), valueCol, ps)
      .drop("__g")
    val v = col(valueCol).cast("double")
    val bucket = names
      .foldLeft(lit(1))((acc, b) => acc + (v > col(b)).cast("int"))
    def counts(df: DataFrame, out: String) = df.filter(v.isNotNull)
      .crossJoin(broadcast(bounds))
      .groupBy(bucket.as("bucket")).agg(count(lit(1)).as(out))
    val spine = dfA.sparkSession.range(1, buckets + 1)
      .select(col("id").cast("int").as("bucket"))
    val joined = spine
      .join(counts(dfA, "n_a"), Seq("bucket"), "left")
      .join(counts(dfB, "n_b"), Seq("bucket"), "left")
      .na.fill(0L, Seq("n_a", "n_b"))
    val tot = joined.agg(sum(col("n_a")).as("__ta"),
      sum(col("n_b")).as("__tb"))
    val withP = joined.crossJoin(broadcast(tot))
      .withColumn("p_a", col("n_a").cast("double") / col("__ta"))
      .withColumn("p_b", col("n_b").cast("double") / col("__tb"))
      .withColumn("__contrib", when(col("n_a") > 0 && col("n_b") > 0,
        (col("p_b") - col("p_a")) * log(col("p_b") / col("p_a"))))
    val total = withP.agg(
      collect_list(struct(col("bucket"), col("__contrib"))).as("__cs"),
      max(when(col("__contrib").isNull, 1).otherwise(0)).as("__anyNull"))
      .select(when(col("__anyNull") === 0,
        aggregate(array_sort(col("__cs")), lit(0.0),
          (acc, x) => acc + x.getField("__contrib"))).as("__psi"))
    withP.crossJoin(broadcast(total))
      .select(col("bucket"), col("n_a"), col("n_b"),
        round(col("p_a"), 6).as("p_a"), round(col("p_b"), 6).as("p_b"),
        round(col("__contrib"), 6).as("contrib"),
        round(col("__psi"), 6).as("psi"))
  }

  /** Data-contract audit ("expectations"): evaluate a set of named
    * row-level violation predicates in ONE scan — every rule is a
    * conditional count inside the same aggregate, so adding rules
    * costs nothing at 100 TB — and unpivot to a (rule, n_violations,
    * violation_rate) report. Uniqueness and referential rules need
    * their own shuffles; compose them via [[uniquenessViolations]] /
    * [[fkAudit]] and union the reports.
    */
  def expectations(df: DataFrame,
      rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = rules.map { case (n, viol) =>
      sum(when(viol, 1L).otherwise(0L)).as(s"__v_$n")
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map { case (n, _) =>
      s"'$n', `__v_$n`"
    }.mkString(", ")
    one.selectExpr(s"stack(${rules.length}, $stacked) AS (rule, n_violations)",
        "__n")
      .select(col("rule"), col("n_violations"),
        round(col("n_violations").cast("double") / col("__n"), 6)
          .as("violation_rate"))
  }

  /** Rows whose `keyCol` value occurs more than once — the uniqueness
    * half of a data contract (one keyed aggregate + broadcastable
    * semi-join of the duplicated-key set). Returns one row
    * `(rule, n_violations, violation_rate)` like [[expectations]]. */
  def uniquenessViolations(df: DataFrame, keyCol: String): DataFrame = {
    val dups = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
    val nViol = dups.agg(coalesce(sum(col("__c")), lit(0L)).as("__v"))
    val nAll = df.agg(count(lit(1)).as("__n"))
    nViol.crossJoin(nAll).select(
      lit(s"unique_$keyCol").as("rule"),
      col("__v").as("n_violations"),
      round(col("__v").cast("double") / col("__n"), 6)
        .as("violation_rate"))
  }

  /** Delete-one-group jackknife standard error for a RATIO metric
    * (Tukey 1958; the production standard for CTR-style metrics, where
    * the naive binomial SE is wrong because numerator and denominator
    * are both random): units (e.g. days) are deleted one at a time,
    * the ratio recomputed from the remaining totals, and
    * `SE² = (G−1)/G · Σ(r_g − r̄)²`. Complements
    * [[poissonBootstrapCI]] — the jackknife is deterministic with NO
    * hash draws at all.
    *
    * Everything reduces to the |units|-sized per-unit totals table
    * (exact long sums); the leave-one-out ratios are metadata-sized
    * and both folds run in sorted unit order over collected arrays
    * ([[cramersV]]'s trick) — squares as products, not `pow` (pow is
    * not guaranteed bit-identical across engines).
    *
    * Returns one row `(n_units, ratio, se, ci_lo, ci_hi)` (95% normal
    * CI), rounded to 6. */
  def jackknifeRatioSE(df: DataFrame, unitCol: String, numCol: String,
      denCol: String): DataFrame = {
    val per = df.groupBy(col(unitCol))
      .agg(sum(col(numCol).cast("long")).as("__n"),
        sum(col(denCol).cast("long")).as("__d"))
    val tot = per.agg(sum(col("__n")).as("__tn"),
      sum(col("__d")).as("__td"), count(lit(1)).as("__g"))
    val loo = per.crossJoin(broadcast(tot))
      .select(col(unitCol), col("__tn"), col("__td"), col("__g"),
        ((col("__tn") - col("__n")).cast("double")
          / (col("__td") - col("__d"))).as("__r"))
    val folded = loo.groupBy(col("__tn"), col("__td"), col("__g"))
      .agg(sort_array(collect_list(struct(col(unitCol).as("u"),
        col("__r").as("r")))).as("__rs"))
      .withColumn("__sum", aggregate(col("__rs"), lit(0.0),
        (acc, x) => acc + x.getField("r")))
      .withColumn("__mean", col("__sum") / col("__g"))
      .withColumn("__ssq", aggregate(col("__rs"), lit(0.0),
        (acc, x) => acc + (x.getField("r") - col("__mean"))
          * (x.getField("r") - col("__mean"))))
    val gD = col("__g").cast("double")
    folded.select(col("__g").as("n_units"),
        round(col("__tn").cast("double") / col("__td"), 6).as("ratio"),
        round(sqrt((gD - 1) / gD * col("__ssq")), 6).as("se"))
      .withColumn("ci_lo", round(col("ratio") - lit(1.96) * col("se"), 6))
      .withColumn("ci_hi", round(col("ratio") + lit(1.96) * col("se"), 6))
  }

  /** Poisson-bootstrap confidence interval for the per-group mean of an
    * exact integer measure — THE scale-out bootstrap (Chamandy et al.,
    * Google 2012): instead of materializing B resamples of N rows, each
    * row draws a Poisson(1) multiplicity per replicate, so the whole
    * B-replicate bootstrap is ONE map-side explode + one keyed
    * aggregate; nothing is ever sampled with global coordination.
    *
    * Determinism contract: the multiplicity comes from the house
    * multiplicative hash of `(id, replicate)` compared against FIXED
    * integer thresholds (the truncated-at-4 Poisson(1) inverse CDF,
    * `⌊cum·2³¹⌋` = 790015084, 1580030168, 1975037710, 2106706891) —
    * pure integer arithmetic, replayable bit-for-bit in any engine, no
    * float boundary anywhere in the draw. Replicate means divide two
    * exact longs; the CI bounds are exact interpolated quantiles
    * ([[Quantiles.exactQuantiles]], = SQL `quantile_cont`) over the B
    * replicate means. Replicates that draw an empty group (possible for
    * tiny groups) are dropped from that group's quantile set.
    *
    * Returns `(groupCol, n_rows, mean, ci_lo, ci_hi)` — mean and
    * bounds in the measure's units, unrounded (callers round). */
  def poissonBootstrapCI(df: DataFrame, groupCol: String, idCol: String,
      measureCol: String, b: Int = 100,
      loP: Double = 0.05, hiP: Double = 0.95): DataFrame = {
    require(b >= 10 && b <= 10000, s"b must be in [10, 10000]: $b")
    val rows = df.select(col(groupCol), col(idCol).as("__id"),
      col(measureCol).cast("long").as("__v"))
    val rep = rows.select(col(groupCol), col("__id"), col("__v"),
      explode(sequence(lit(0), lit(b - 1))).as("__r"))
    val mix = pmod(pmod(col("__id"), lit(2147483648L)) * lit(1000003L) +
      col("__r") * lit(999983L), lit(2147483648L))
    val h = pmod(mix * lit(2654435761L), lit(2147483648L))
    val m = when(h < 790015084L, 0L).when(h < 1580030168L, 1L)
      .when(h < 1975037710L, 2L).when(h < 2106706891L, 3L).otherwise(4L)
    val means = rep.withColumn("__m", m)
      .groupBy(col(groupCol), col("__r"))
      .agg(sum(col("__m") * col("__v")).as("__ws"),
        sum(col("__m")).as("__wn"))
      .filter(col("__wn") > 0)
      .select(col(groupCol),
        (col("__ws").cast("double") / col("__wn")).as("__mean"))
    val ci = Quantiles.exactQuantiles(means, Seq(groupCol), "__mean",
      Seq(loP, hiP))
    val pn = (p: Double) => s"p${(p * 100).round}"
    val actual = rows.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("__v")).cast("double") / count(lit(1))).as("mean"))
    actual.join(ci, groupCol)
      .select(col(groupCol), col("n_rows"), col("mean"),
        col(pn(loP)).as("ci_lo"), col(pn(hiP)).as("ci_hi"))
  }
}
