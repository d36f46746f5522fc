package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed hypothesis tests and sequential drift monitors.
  *
  * Complements [[Metrics]]' two-sample tests (Welch, Mann–Whitney, KS) with
  * the k-sample / paired / survival-comparison family and adds the
  * Page–Hinkley sequential drift detector and the Mann–Kendall trend test.
  *
  * Determinism discipline (the house parity contract): every data-sized
  * reduction happens on exact values — integer counts, decimal sums, or
  * half-integer midranks (exact in binary64 below 2^52) — and the only
  * floating-point accumulations are ordered window cumsums (sequential,
  * deterministic order in both engines) over calendar-bounded row counts.
  * Final statistics are computed in double from those exact moments and
  * rounded once, so results are bit-stable under any partitioning.
  */
object Hypothesis {

  /** Kruskal–Wallis H (rank-based one-way ANOVA) per `groupCol` across the
    * treatments in `treatCol`, with the standard tie correction.
    *
    * Midranks and the tie term Σ(t³−t) reuse [[Metrics.mannWhitney]]'s
    * exact per-row forms: a row in a tied run of size t contributes
    * (t²−1), so the run contributes t·(t²−1) = t³−t, with no distinct.
    * Per-treatment rank sums are exact half-integer sums; the one
    * fractional reduction Σ Rⱼ²/nⱼ runs as an ordered window cumsum over
    * the ≤k treatment rows so both engines add in the same order.
    * Everything shares one hash partitioning on `groupCol`.
    */
  def kruskalWallis(df: DataFrame, groupCol: String, treatCol: String,
      valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val pool = df.filter(x.isNotNull)
      .select(col(groupCol), col(treatCol).as("__treat"), x.as("__x"))
    // per-(group, value, treatment) counts, then pooled midranks over the
    // (group, value) spine via the range-partitioned grouped scan — no
    // low-cardinality window partition ever sees data-sized input
    // barrier (r11): byTreat feeds the spine aggregate AND the rank
    // join; ranked feeds the per-group and per-treatment folds — each
    // unmaterialized consumer re-ran the caller's (often multi-join)
    // upstream
    val byTreat = pool.groupBy(col(groupCol), col("__x"), col("__treat"))
      .agg(count(lit(1)).as("__ct"))
      .barrier()
    val spine = byTreat.groupBy(col(groupCol), col("__x"))
      .agg(sum(col("__ct")).as("__t"))
    val ranked = Scale.groupedPrefixSum(spine, Seq(groupCol), "__x",
        "__t", "__cum")
      // doubled midrank 2r = 2·cum − t + 1: an exact long
      .withColumn("__rank2", col("__cum") * 2 - col("__t") + 1)
      .join(byTreat, Seq(groupCol, "__x"))
      .barrier()
    val perGroup = ranked.groupBy(col(groupCol)).agg(
      sum(col("__ct")).as("__n"),
      // one spine row per tied run: weight the run term by __ct/__t to
      // count it exactly once — (t²−1)·t·(ct/t) = (t²−1)·ct, exact longs
      // t² in DECIMAL: a tied run past ~2.1M rows would overflow the
      // long square silently (Spark wraps) while the HUGEINT oracle
      // keeps going — exact to 38 digits instead
      sum((col("__t").cast("decimal(38,0)") * col("__t") - 1) *
        col("__ct")).as("__tsum"))
    val perTreat = ranked.groupBy(col(groupCol), col("__treat")).agg(
      sum(col("__ct")).as("__nj"),
      // __ct·__rank2 in DECIMAL for the same reason as __tsum: at ~2.1e9
      // rows per group the long product/sum wraps silently; decimal(38,0)
      // keeps the rank sum exact (same fix as dunnPostHoc's __r2)
      (sum(col("__ct").cast("decimal(38,0)") * col("__rank2"))
        .cast("double") / 2.0).as("__rj"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("__treat"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perTreat
      .withColumn("__term",
        col("__rj") * col("__rj") / col("__nj").cast("double"))
      .withColumn("__cum", sum(col("__term")).over(wCum))
    val srn = cum.groupBy(col(groupCol)).agg(
      count(lit(1)).as("__kk"),
      max_by(col("__cum"), col("__treat")).as("__srn"))
    // explicit broadcast (r12): both sides are ≤|groups|-row aggregates,
    // but they descend from barrier leaves whose size statistics are
    // gone (ExistingRDD defaults to "huge"), so the planner chose a
    // sort-merge join on answer-sized inputs — at scale that is two
    // needless exchanges of k-row tables
    val j = perGroup.join(broadcast(srn), groupCol)
    val n = col("__n").cast("double")
    val h = lit(12.0) / (n * (n + 1.0)) * col("__srn") - lit(3.0) * (n + 1.0)
    // Σ rows (t²−1) = Σ runs t³−t; correction C = 1 − Σ(t³−t)/(n³−n)
    val c = lit(1.0) - col("__tsum").cast("double") / (n * n * n - n)
    j.filter(col("__n") > col("__kk") && col("__kk") > 1 && c > 0)
      .select(col(groupCol), col("__n").as("n"), col("__kk").as("k"),
        round(h, 6).as("h"),
        round(h / c, 6).as("h_adj"),
        (col("__kk") - 1).as("df"))
  }

  /** Dunn's post-hoc test per `groupCol`: AFTER a significant
    * [[kruskalWallis]], WHICH treatment pairs differ? Pairwise z on the
    * pooled-midrank means with the tie correction (Dunn 1964):
    *
    *   z = (R̄ᵢ − R̄ⱼ) / √[ (n(n+1)/12 − Σ(t³−t)/(12(n−1))) (1/nᵢ + 1/nⱼ) ]
    *
    * Exactness: pooled midranks, per-treatment rank sums, and the tie
    * term reuse kruskalWallis' machinery verbatim — the (group, value)
    * spine through [[Scale.groupedPrefixSum]]'s grouped scan, doubled
    * ranks as exact integers (rank sums in DECIMAL), Σ(t³−t) as exact
    * longs. Pairs come from a self-join of the ≤k-row per-treatment
    * table (broadcast); each z is one double expression. Pairs are
    * emitted once with treat_a < treat_b (string order).
    *
    * Returns `(groupCol, treat_a, treat_b, n_a, n_b, z)`. */
  def dunnPostHoc(df: DataFrame, groupCol: String, treatCol: String,
      valueCol: String): DataFrame = {
    val x = col(valueCol).cast("long")
    val pool = df.filter(x.isNotNull)
      .select(col(groupCol).as("__g"), col(treatCol).as("__treat"),
        x.as("__x"))
    // barrier (r11): same two-artifact discipline as [[kruskalWallis]]
    val byTreat = pool.groupBy(col("__g"), col("__x"), col("__treat"))
      .agg(count(lit(1)).as("__ct"))
      .barrier()
    val spine = byTreat.groupBy(col("__g"), col("__x"))
      .agg(sum(col("__ct")).as("__t"))
    val ranked = Scale.groupedPrefixSum(spine, Seq("__g"), "__x",
        "__t", "__cum")
      .withColumn("__rank2", col("__cum") * 2 - col("__t") + 1)
      .join(byTreat, Seq("__g", "__x"))
      .barrier()
    val perGroup = ranked.groupBy(col("__g")).agg(
      sum(col("__ct")).as("__n"),
      // t² in DECIMAL: a tied run past ~2.1M rows would overflow the
      // long square silently (Spark wraps) while the HUGEINT oracle
      // keeps going — exact to 38 digits instead
      sum((col("__t").cast("decimal(38,0)") * col("__t") - 1) *
        col("__ct")).as("__tsum"))
    val perTreat = ranked.groupBy(col("__g"), col("__treat")).agg(
      sum(col("__ct")).as("__nj"),
      sum(col("__ct").cast("decimal(38,0)") * col("__rank2")).as("__r2"))
    val a = perTreat.select(col("__g"), col("__treat").as("treat_a"),
      col("__nj").as("__na"), col("__r2").as("__r2a"))
    val b = perTreat.select(col("__g").as("__g2"),
      col("__treat").as("treat_b"), col("__nj").as("__nb"),
      col("__r2").as("__r2b"))
    val pairs = a.join(broadcast(b),
      col("__g") === col("__g2") && col("treat_a") < col("treat_b"))
    val j = pairs.join(broadcast(perGroup), "__g")
    val nD = col("__n").cast("double")
    val naD = col("__na").cast("double"); val nbD = col("__nb").cast("double")
    val sigma2 = nD * (nD + 1.0) / 12.0 -
      col("__tsum").cast("double") / (lit(12.0) * (nD - 1.0))
    val z = (col("__r2a").cast("double") / naD
      - col("__r2b").cast("double") / nbD) / 2.0 /
      sqrt(sigma2 * (lit(1.0) / naD + lit(1.0) / nbD))
    j.filter(col("__n") > 1 && sigma2 > 0)
      .select(col("__g").as(groupCol), col("treat_a"), col("treat_b"),
        col("__na").as("n_a"), col("__nb").as("n_b"),
        round(z, 6).as("z"))
  }

  /** Two-sample log-rank test on right-censored durations: is cohort
    * `sideA`'s event hazard distinguishable from the rest of `sideCol`?
    *
    * Standard Mantel–Haenszel form over the distinct event times t:
    * O₁ = Σ d₁ₜ, E₁ = Σ dₜ·n₁ₜ/nₜ, V = Σ dₜ(n₁ₜ/nₜ)(1−n₁ₜ/nₜ)(nₜ−dₜ)/(nₜ−1),
    * z = (O₁−E₁)/√V. At-risk counts come from a reverse cumulative over
    * the per-duration reduce, so the whole test reads the data once.
    * The post-reduce spine follows the [[Quantiles]] probe-and-route
    * discipline: at or below [[Scale.maxOrderedFrameRows]] the
    * cumulatives are sequential single-task windows (double terms
    * accumulate in the exact ascending-t order an ordered-SQL oracle
    * replays); a corpus-sized spine (continuous-valued durations)
    * rides [[Scale.prefixSums]]' range-partitioned scan for the risk
    * sets, with the Σ terms as plain aggregates — the statistic only
    * needs totals.
    */
  def logRank(df: DataFrame, durCol: String, eventCol: String,
      sideCol: String, sideA: String,
      maxSpineRows: Long = Scale.maxOrderedFrameRows): DataFrame = {
    val byT = df
      .select(col(durCol).cast("long").as("__t"),
        col(eventCol).cast("long").as("__ev"),
        (col(sideCol) === sideA).cast("long").as("__a"))
      .groupBy(col("__t")).agg(
        sum(col("__ev") * col("__a")).as("__d_a"),
        sum(col("__ev")).as("__d"),
        count(lit(1)).as("__c"),
        sum(col("__a")).as("__c_a"))
      .barrierLazy()
    def statsOf(terms: DataFrame): DataFrame = {
      val nD = col("__n").cast("double")
      val naD = col("__n_a").cast("double")
      val dD = col("__d").cast("double")
      terms
        .withColumn("__e_a", dD * naD / nD)
        .withColumn("__v",
          when(col("__n") > 1,
            dD * (naD / nD) * (lit(1.0) - naD / nD)
              * (nD - dD) / (nD - 1.0)).otherwise(lit(0.0)))
    }
    val cum = if (byT.count() <= maxSpineRows) {
      val wRisk = Window.orderBy(col("__t"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val wCum = Window.orderBy(col("__t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      statsOf(byT
          .withColumn("__n", sum(col("__c")).over(wRisk))
          .withColumn("__n_a", sum(col("__c_a")).over(wRisk)))
        .withColumn("__o_cum", sum(col("__d_a")).over(wCum))
        .withColumn("__e_cum", sum(col("__e_a")).over(wCum))
        .withColumn("__v_cum", sum(col("__v")).over(wCum))
        .withColumn("__na_tot", sum(col("__c_a")).over(wCum))
        .withColumn("__n_tot", sum(col("__c")).over(wCum))
        .agg(
          max_by(col("__na_tot"), col("__t")).as("n_a"),
          (max_by(col("__n_tot"), col("__t"))
            - max_by(col("__na_tot"), col("__t"))).as("n_b"),
          max_by(col("__o_cum"), col("__t")).as("o_a"),
          round(max_by(col("__e_cum"), col("__t")), 6).as("e_a"),
          round(max_by(col("__v_cum"), col("__t")), 6).as("v"),
          round((max_by(col("__o_cum"), col("__t")).cast("double")
              - max_by(col("__e_cum"), col("__t")))
            / sqrt(max_by(col("__v_cum"), col("__t"))), 6).as("z"))
    } else {
      // distributed route: reverse cumulative n(t) = N − Σ_{t'<t} c
      // from one multi-column exclusive prefix pass; the five Σ totals
      // are plain aggregates (exact longs for O/n; double order noise
      // on E/V is unobservable past the probe bound)
      val totals = broadcast(byT.agg(sum(col("__c")).as("__nTot"),
        sum(col("__c_a")).as("__naTot")))
      statsOf(Scale
          .prefixSums(byT, "__t", Seq("__c", "__c_a"),
            suffix = "_b", inclusive = false)
          .crossJoin(totals)
          .withColumn("__n", col("__nTot") - col("__c_b"))
          .withColumn("__n_a", col("__naTot") - col("__c_a_b")))
        .agg(
          max(col("__naTot")).as("n_a"),
          (max(col("__nTot")) - max(col("__naTot"))).as("n_b"),
          sum(col("__d_a")).as("o_a"),
          round(sum(col("__e_a")), 6).as("e_a"),
          round(sum(col("__v")), 6).as("v"),
          round((sum(col("__d_a")).cast("double") - sum(col("__e_a")))
            / sqrt(sum(col("__v"))), 6).as("z"))
    }
    cum.filter(col("v").isNotNull && col("v") > 0)
  }

  /** Cohen's d and Hedges' g effect sizes per `groupCol` between the two
    * sides of `sideCol`, on exact decimal moments: Σx as DECIMAL(28,2),
    * Σx² as DECIMAL(38,4) (exact for 2-decimal inputs), with the pooled
    * variance and the small-sample g correction applied in double at the
    * end. One aggregate pass, one partitioning. */
  def cohensD(df: DataFrame, groupCol: String, sideCol: String,
      sideA: String, sideB: String, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("decimal(18,2)")
    val pool = df.filter(col(sideCol).isin(sideA, sideB) && x.isNotNull)
      .select(col(groupCol), col(sideCol).as("__side"), x.as("__x"),
        (x * x).cast("decimal(38,4)").as("__x2"))
    val z2 = lit(java.math.BigDecimal.ZERO).cast("decimal(18,2)")
    val z4 = lit(java.math.BigDecimal.ZERO).cast("decimal(38,4)")
    val agg = pool.groupBy(col(groupCol)).agg(
      sum(when(col("__side") === sideA, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__side") === sideB, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("__side") === sideA, col("__x")).otherwise(z2))
        .as("__sxa"),
      sum(when(col("__side") === sideB, col("__x")).otherwise(z2))
        .as("__sxb"),
      sum(when(col("__side") === sideA, col("__x2")).otherwise(z4))
        .as("__sxa2"),
      sum(when(col("__side") === sideB, col("__x2")).otherwise(z4))
        .as("__sxb2"))
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    val sxa = col("__sxa").cast("double")
    val sxb = col("__sxb").cast("double")
    val ssA = col("__sxa2").cast("double") - sxa * sxa / nA
    val ssB = col("__sxb2").cast("double") - sxb * sxb / nB
    val sp = sqrt((ssA + ssB) / (nA + nB - 2.0))
    val d = (sxa / nA - sxb / nB) / sp
    agg.filter(col("n_a") > 1 && col("n_b") > 1 && sp > 0)
      .select(col(groupCol), col("n_a"), col("n_b"),
        round(d, 6).as("cohens_d"),
        round(d * (lit(1.0) - lit(3.0) / (lit(4.0) * (nA + nB) - 9.0)), 6)
          .as("hedges_g"))
  }

  /** McNemar's test for paired binary outcomes per `groupCol`: `aCol` and
    * `bCol` are the two paired measurements (already one row per subject).
    * Reports the discordant counts b (a without b) and c (b without a),
    * the χ² statistic (b−c)²/(b+c) and its Edwards continuity-corrected
    * form (|b−c|−1)²/(b+c). All-integer until the final division. */
  def mcnemar(df: DataFrame, groupCol: String, aCol: String,
      bCol: String): DataFrame = {
    val agg = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_pairs"),
      sum((col(aCol) && !col(bCol)).cast("long")).as("b"),
      sum((!col(aCol) && col(bCol)).cast("long")).as("c"))
    val bD = col("b").cast("double")
    val cD = col("c").cast("double")
    val cc = greatest(abs(bD - cD) - 1.0, lit(0.0))
    agg.filter(col("b") + col("c") > 0)
      .select(col(groupCol), col("n_pairs"), col("b"), col("c"),
        round((bD - cD) * (bD - cD) / (bD + cD), 6).as("chi2"),
        round(cc * cc / (bD + cD), 6).as("chi2_cc"))
  }

  /** Mann–Kendall trend test with Kendall's τ_b per `keyCol` over the
    * (timeCol, valueCol) series. Values are compared as exact decimals, so
    * S = Σ sign(xⱼ−xᵢ) and the tie counts are exact integers; τ_b and the
    * continuity-corrected z are the only double steps.
    *
    * The pair join is per-key over an already-reduced calendar-bounded
    * series (one row per period), so the quadratic is bounded by
    * (periods)² — independent of the raw data volume. Tie-run sizes for
    * Var(S) come from a (key, value) reduce, not from the pairs. */
  def mannKendall(df: DataFrame, keyCol: String, timeCol: String,
      valueCol: String): DataFrame = {
    val base = df.select(col(keyCol).as("__k"),
      col(timeCol).as("__i"), col(valueCol).cast("decimal(18,2)").as("__x"))
    val pairs = base.as("l")
      .join(base.as("r"), col("l.__k") === col("r.__k")
        && col("l.__i") < col("r.__i"))
      .groupBy(col("l.__k").as("__k")).agg(
        sum(signum(col("r.__x") - col("l.__x")).cast("long")).as("s"),
        sum((col("l.__x") === col("r.__x")).cast("long")).as("__tpairs"))
    val ties = base.groupBy(col("__k"), col("__x"))
      .agg(count(lit(1)).as("__t"))
      .groupBy(col("__k")).agg(
        count(lit(1)).as("__nvals"),
        sum(col("__t")).as("n"),
        sum(col("__t") * (col("__t") - 1) * (col("__t") * 2 + 5))
          .as("__tvar"))
    val j = pairs.join(ties, "__k")
    val nD = col("n").cast("double")
    val n0 = nD * (nD - 1.0) / 2.0
    val sD = col("s").cast("double")
    val tau = sD / sqrt((n0 - col("__tpairs").cast("double")) * n0)
    val varS = (nD * (nD - 1.0) * (lit(2.0) * nD + 5.0)
      - col("__tvar").cast("double")) / 18.0
    val zRaw = (sD - signum(sD)) / sqrt(varS)
    j.filter(col("n") > 2 && col("__tpairs") < lit(1L) * col("n")
        * (col("n") - 1) / 2 && varS > 0)
      .select(col("__k").as(keyCol), col("n"), col("s"),
        round(tau, 6).as("tau_b"),
        round(when(col("s") === 0, lit(0.0)).otherwise(zRaw), 6).as("z"))
  }

  /** Page–Hinkley sequential drift detector per `keyCol` over the ordered
    * (timeCol, xCol) series: mₜ = Σᵢ (xᵢ − x̄ᵢ − δ) with x̄ᵢ the running
    * mean, PHₜ = mₜ − min_{i≤t} mᵢ, alarm when PHₜ > λ. Reports the final
    * and peak PH and the first alarm time per key.
    *
    * All accumulations are ordered window cumsums over the per-period
    * series (deterministic order), with the running mean derived from an
    * exact decimal cumulative sum. */
  def pageHinkley(df: DataFrame, keyCol: String, timeCol: String,
      xCol: String, delta: Double, lambda: Double): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = col(xCol).cast("decimal(18,4)")
    val stepped = df
      .select(col(keyCol), col(timeCol), x.as("__x"))
      .withColumn("__i", count(lit(1)).over(w))
      .withColumn("__cumx", sum(col("__x")).over(w))
      .withColumn("__term", col("__x").cast("double")
        - col("__cumx").cast("double") / col("__i").cast("double")
        - delta)
      .withColumn("__m", sum(col("__term")).over(w))
      .withColumn("__minm", min(col("__m")).over(w))
      .withColumn("__ph", col("__m") - col("__minm"))
    stepped.groupBy(col(keyCol)).agg(
      max(col("__i")).as("n_points"),
      round(max_by(col("__ph"), col(timeCol)), 6).as("ph_final"),
      round(max(col("__ph")), 6).as("ph_max"),
      min(when(col("__ph") > lambda, col(timeCol))).as("first_alarm"))
  }

  /** Ansari–Bradley two-sample scale test per `groupCol`: are the two
    * `treatCol` samples equally dispersed about a common center? Scores
    * fold the pooled midranks from both ends — a(r) = min(r, n+1−r) —
    * so extreme observations (either tail) score LOW and the rank-sum
    * of one sample detects a spread difference without assuming
    * normality (the nonparametric sibling of [[Metrics]]' variance
    * tests; Ansari & Bradley 1960).
    *
    * Exactness: pooled midranks come off the (group, value) spine via
    * [[Scale.groupedPrefixSum]] — never a data-sized sort through a
    * low-cardinality window partition — and the DOUBLED score
    * s2 = min(2r, 2(n+1)−2r) keeps every data-sized reduction in exact
    * integer arithmetic (Σ t·s2 as longs, Σ t·s2² as DECIMAL(38,0) /
    * HUGEINT). AB, its permutation-null mean/variance, and z are a
    * per-group scalar formula over those exact moments — computed in
    * double once, rounded once. The statistic is reported for the
    * alphabetically FIRST treatment (deterministic on both engines).
    * Requires exactly two treatments per group. */
  def ansariBradley(df: DataFrame, groupCol: String, treatCol: String,
      valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val pool = df.filter(x.isNotNull)
      .select(col(groupCol), col(treatCol).as("__treat"), x.as("__x"))
    val byTreat = pool.groupBy(col(groupCol), col("__x"), col("__treat"))
      .agg(count(lit(1)).as("__ct"))
    val spine = byTreat.groupBy(col(groupCol), col("__x"))
      .agg(sum(col("__ct")).as("__t"))
    val sizes = pool.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val ranked = Scale.groupedPrefixSum(spine, Seq(groupCol), "__x",
        "__t", "__cum")
      .withColumn("__rank2", col("__cum") * 2 - col("__t") + 1)
      .join(broadcast(sizes), Seq(groupCol))
      // doubled from-both-ends score: min(2r, 2(n+1) − 2r), exact long
      .withColumn("__s2",
        least(col("__rank2"), (col("__n") + 1) * 2 - col("__rank2")))
    val pooled = ranked.groupBy(col(groupCol)).agg(
      sum(col("__t") * col("__s2")).as("__su"),
      sum((col("__t") * col("__s2")).cast("decimal(38,0)") * col("__s2"))
        .as("__su2"))
    val perTreat = ranked.join(byTreat, Seq(groupCol, "__x"))
      .groupBy(col(groupCol), col("__treat")).agg(
        sum(col("__ct")).as("__nj"),
        sum(col("__ct") * col("__s2")).as("__abj2"))
    val first = perTreat.groupBy(col(groupCol)).agg(
      count(lit(1)).as("__k"),
      min(col("__treat")).as("treatment"),
      min_by(col("__nj"), col("__treat")).as("__n1"),
      max_by(col("__nj"), col("__treat")).as("__n2b"),
      min_by(col("__abj2"), col("__treat")).as("__ab2"))
    val nD = (col("__n1") + col("__n2b")).cast("double")
    val n1D = col("__n1").cast("double")
    val n2D = col("__n2b").cast("double")
    val suD = col("__su").cast("double")
    val su2D = col("__su2").cast("double")
    val ab = col("__ab2").cast("double") / 2.0
    val e = n1D * (suD / 2.0) / nD
    val v = (n1D * n2D / (nD - 1.0)) *
      ((nD * (su2D / 4.0) - (suD / 2.0) * (suD / 2.0)) / (nD * nD))
    first.join(broadcast(pooled), Seq(groupCol))
      .filter(col("__k") === 2)
      .select(col(groupCol), col("treatment"),
        col("__n1").as("n1"), col("__n2b").as("n2"),
        round(ab, 6).as("ab_stat"),
        round((ab - e) / sqrt(v), 6).as("z"))
  }

  /** Energy distance (Székely & Rizzo 2004) between the two `treatCol`
    * samples per `groupCol`:
    *
    *   E = 2·E|X−Y| − E|X−X′| − E|Y−Y′|
    *
    * the distribution-free two-sample statistic that is zero iff the
    * distributions coincide — sensitive to ANY difference (location,
    * scale, shape), where rank tests see only their own alternative.
    *
    * The naive form is quadratic. In 1-D every pairwise term linearizes
    * over the sorted value spine: with per-value counts a, b and
    * EXCLUSIVE prefix streams A⁻, B⁻, SA⁻, SB⁻ (counts and
    * count-weighted values of strictly-smaller rows),
    *
    *   Σᵢⱼ|xᵢ−yⱼ| = Σ_v [ a·(v·B⁻ − SB⁻) + b·(v·A⁻ − SA⁻) ]
    *
    * and the within-sample sums are the one-sided halves doubled. All
    * four prefix streams ride ONE [[Scale.groupedPrefixSums]] pass
    * (one range exchange, one offset collect); per-spine-row products
    * are exact longs escalated to DECIMAL(38,0) for the data-sized
    * sums; the statistic is one double formula per group. `valueCol`
    * must be integral (pass cents). The X sample is the
    * alphabetically first treatment, as in [[ansariBradley]];
    * requires exactly two treatments per group. */
  def energyDistance(df: DataFrame, groupCol: String, treatCol: String,
      valueCol: String): DataFrame = {
    val pool = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(treatCol).as("__treat"),
        col(valueCol).cast("long").as("__x"))
    val t1 = pool.groupBy(col(groupCol)).agg(min(col("__treat")).as("__t1"),
      countDistinct(col("__treat")).as("__k"))
    val spine = pool.join(t1, Seq(groupCol))
      .filter(col("__k") === 2)
      .groupBy(col(groupCol), col("__x"))
      .agg(sum(when(col("__treat") === col("__t1"), 1L).otherwise(0L)).as("__a"),
        sum(when(col("__treat") =!= col("__t1"), 1L).otherwise(0L)).as("__b"))
      .withColumn("__sa", col("__a") * col("__x"))
      .withColumn("__sb", col("__b") * col("__x"))
    val cums = Scale.groupedPrefixSums(spine, Seq(groupCol), "__x",
      Seq("__a", "__b", "__sa", "__sb"), suffix = "_lt", inclusive = false)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val terms = cums
      .withColumn("__cross",
        dec(col("__a")) * (col("__x") * col("__b_lt") - col("__sb_lt")) +
        dec(col("__b")) * (col("__x") * col("__a_lt") - col("__sa_lt")))
      .withColumn("__wx",
        dec(col("__a")) * (col("__x") * col("__a_lt") - col("__sa_lt")))
      .withColumn("__wy",
        dec(col("__b")) * (col("__x") * col("__b_lt") - col("__sb_lt")))
    val g = terms.groupBy(col(groupCol)).agg(
      sum(col("__a")).as("__n1"), sum(col("__b")).as("__n2"),
      sum(col("__cross")).as("__sxy"),
      sum(col("__wx")).as("__sxx2"), sum(col("__wy")).as("__syy2"))
    val n1D = col("__n1").cast("double")
    val n2D = col("__n2").cast("double")
    g.select(col(groupCol), col("__n1").as("n1"), col("__n2").as("n2"),
      round(lit(2.0) * col("__sxy").cast("double") / (n1D * n2D)
        - lit(2.0) * col("__sxx2").cast("double") / (n1D * n1D)
        - lit(2.0) * col("__syy2").cast("double") / (n2D * n2D), 6)
        .as("e_dist"))
  }

  /** Friedman test (blocked rank ANOVA; Friedman 1937) per `groupCol`:
    * do the `treatCol` treatments differ, controlling for the
    * `blockCol` blocks? The repeated-measures complement of
    * [[kruskalWallis]] — KW pools all rows into one ranking, Friedman
    * ranks WITHIN each block, so between-block level differences
    * cancel instead of drowning the treatment signal.
    *
    * Reported as Conover's F-form statistic, which absorbs midrank ties
    * without a separate correction:
    *
    *   T₁ = (k−1) · Σⱼ (Rⱼ − n(k+1)/2)² / (A₂ − C₂),
    *   A₂ = Σᵢⱼ r²ᵢⱼ,  C₂ = n·k·(k+1)²/4
    *
    * computed entirely from DOUBLED midranks d = 2r (exact longs, the
    * [[Metrics.mannWhitney]] discipline): 4·Σⱼ(Rⱼ−n(k+1)/2)² =
    * Σⱼ(R2ⱼ−n(k+1))² and 4(A₂−C₂) = Σd² − nk(k+1)², so the 4s cancel
    * and T₁ is one double division of two exact DECIMAL(38,0) moments.
    *
    * Only COMPLETE blocks — blocks containing every treatment observed
    * in their group — enter the test (the classical design; incomplete
    * blocks would need Durbin's variant). Requires at most one row per
    * (group, block, treatment): pre-aggregate replicates first. The
    * in-block ranking window is keyed on (group, block) — block count
    * grows with the data while each partition holds ≤ k rows, so no
    * data-sized single-task sort exists at any scale. Groups need
    * k ≥ 2 and at least one unequal in-block ranking (A₂ > C₂).
    *
    * Returns `(groupCol, n, k, t1, df1, df2)` with T₁ ~ F(df1, df2)
    * under H₀, df1 = k−1, df2 = (n−1)(k−1). */
  def friedman(df: DataFrame, groupCol: String, blockCol: String,
      treatCol: String, valueCol: String): DataFrame = {
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(blockCol).as("__blk"),
        col(treatCol).as("__treat"), col(valueCol).cast("double").as("__x"))
    // k treatments per group (bounded — one row per group, broadcast)
    val kPer = rows.groupBy(col("__g"))
      .agg(countDistinct(col("__treat")).as("__k"))
    val complete = rows.groupBy(col("__g"), col("__blk"))
      .agg(countDistinct(col("__treat")).as("__bt"))
      .join(broadcast(kPer), "__g")
      .filter(col("__bt") === col("__k"))
      .select(col("__g"), col("__blk"))
    val inBlocks = rows.join(complete, Seq("__g", "__blk"))
    // doubled in-block midrank 2r = 2·rank + t − 1: exact longs; the
    // window key (group, block) has data-growing cardinality with
    // ≤ k rows per partition — the scale-safe window shape
    val wR = Window.partitionBy(col("__g"), col("__blk"))
      .orderBy(col("__x"))
    val wT = Window.partitionBy(col("__g"), col("__blk"), col("__x"))
    val ranked = inBlocks.withColumn("__d",
      lit(2L) * rank().over(wR) + count(lit(1)).over(wT) - 1)
    val perGroup = ranked.groupBy(col("__g")).agg(
      countDistinct(col("__blk")).as("__n"),
      sum((col("__d").cast("decimal(38,0)") * col("__d"))).as("__a4"))
    val perTreat = ranked.groupBy(col("__g"), col("__treat"))
      .agg(sum(col("__d")).as("__r2"))
    val sdev = perTreat
      .join(broadcast(kPer), "__g")
      .join(perGroup.select(col("__g"), col("__n")), "__g")
      .withColumn("__dev", col("__r2").cast("decimal(38,0)")
        - col("__n").cast("decimal(38,0)") * (col("__k") + 1))
      .groupBy(col("__g")).agg(sum(col("__dev") * col("__dev")).as("__s"))
    val joined = perGroup.join(sdev, "__g").join(broadcast(kPer), "__g")
    val nD = col("__n").cast("double")
    val kD = col("__k").cast("double")
    val denom = col("__a4").cast("double") -
      nD * kD * (kD + 1.0) * (kD + 1.0)
    val t1 = (kD - 1.0) * col("__s").cast("double") / denom
    joined.filter(col("__k") > 1 && denom > 0)
      .select(col("__g").as(groupCol), col("__n").as("n"),
        col("__k").as("k"), round(t1, 6).as("t1"),
        (col("__k") - 1).as("df1"),
        ((col("__n") - 1) * (col("__k") - 1)).as("df2"))
  }

  /** Wilcoxon signed-rank test per `groupCol` over PAIRED differences
    * (one row per pair in `diffCol`, integral — pass cents): is the
    * within-pair shift symmetric about zero? The paired complement of
    * [[Metrics.mannWhitney]]'s independent-samples test — differencing
    * removes the between-pair variance that MW must carry.
    *
    * Standard normal approximation with the tie correction:
    *
    *   W⁺ = Σ_{d>0} rank(|d|),  z = (W⁺ − n(n+1)/4) /
    *        √(n(n+1)(2n+1)/24 − Σ(t³−t)/48)
    *
    * Zero differences are dropped (the classical Wilcoxon treatment).
    * |d|-midranks come off [[Scale.groupedMidranks]]' range-partitioned
    * grouped scan — `groupCol` is typically low-cardinality, and a
    * group-keyed ranking window would serialize each group into one
    * task at scale. Per-value positive counts join the spine, so W⁺ is
    * a doubled-midrank sum (2W⁺ = Σ rank2·pos, exact DECIMAL) and the
    * tie term Σ(t³−t) accumulates per spine run — nothing data-sized is
    * ever fractional.
    *
    * Returns `(groupCol, n, w_plus, z)`. */
  def wilcoxonSignedRank(df: DataFrame, groupCol: String,
      diffCol: String): DataFrame = {
    val rows = df
      .filter(col(diffCol).isNotNull && col(diffCol) =!= 0)
      .select(col(groupCol), col(diffCol).cast("long").as("__d"))
      .withColumn("__ad", abs(col("__d")))
    val byCell = rows.groupBy(col(groupCol), col("__ad"))
      .agg(count(lit(1)).as("__t"),
        sum(when(col("__d") > 0, 1L).otherwise(0L)).as("__pos"))
    val ranked = Scale.groupedPrefixSum(byCell, Seq(groupCol), "__ad",
        "__t", "__cum")
      .withColumn("__rank2", col("__cum") * 2 - col("__t") + 1)
    val g = ranked.groupBy(col(groupCol)).agg(
      sum(col("__t")).as("__n"),
      sum(col("__rank2").cast("decimal(38,0)") * col("__pos")).as("__w2"),
      // one spine row per tied run of size t contributes t³−t exactly
      sum(col("__t").cast("decimal(38,0)") * col("__t") * col("__t")
        - col("__t")).as("__ties"))
    val nD = col("__n").cast("double")
    val w = col("__w2").cast("double") / 2.0
    val mu = nD * (nD + 1.0) / 4.0
    val v = nD * (nD + 1.0) * (lit(2.0) * nD + 1.0) / 24.0 -
      col("__ties").cast("double") / 48.0
    g.filter(col("__n") > 0 && v > 0)
      .select(col(groupCol), col("__n").as("n"),
        round(w, 6).as("w_plus"),
        round((w - mu) / sqrt(v), 6).as("z"))
  }

  /** Kendall's τ-b rank correlation per `groupCol` between two
    * BOUNDED-CARDINALITY integral columns (grades, star ratings,
    * bucketed quantities — pass cents/codes). The concordance
    * complement of q310's Spearman: τ counts pairwise order agreement
    * directly, so it is interpretable as P(concordant) − P(discordant)
    * and more robust to extreme midrank gaps; τ-b's denominator
    * corrects both tie margins.
    *
    * The naive form is O(n²) over rows. Over the (x, y) CONTINGENCY
    * table it is exact and bounded: with cell counts n_xy,
    *
    *   C = Σ_cells n_xy · Σ_{x'>x, y'>y} n_x'y'  (D likewise, y'<y)
    *   τ-b = (C−D) / √((n₀−n₁)(n₀−n₂)),
    *   n₀ = n(n−1)/2, n₁ = Σₓ tₓ(tₓ−1)/2, n₂ = Σ_y t_y(t_y−1)/2
    *
    * The cell table is |X|·|Y|-bounded metadata, so the pair pass is a
    * broadcast nested-loop self-join over cells, never over rows; cell
    * products are exact DECIMAL(38,0) (row counts can make C ~ n²
    * overflow longs at scale). One double division at the end.
    *
    * Returns `(groupCol, n, n_cells, tau_b)`. */
  def kendallTauB(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val cells = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .agg(count(lit(1)).as("__c"))
    val b = cells.select(col("__g").as("__g2"), col("__x").as("__x2"),
      col("__y").as("__y2"), col("__c").as("__c2"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val pairs = cells.join(broadcast(b),
        col("__g") === col("__g2") && col("__x2") > col("__x"))
      .groupBy(col("__g")).agg(
        coalesce(sum(when(col("__y2") > col("__y"),
          dec(col("__c")) * col("__c2"))), lit(0).cast("decimal(38,0)"))
          .as("__conc"),
        coalesce(sum(when(col("__y2") < col("__y"),
          dec(col("__c")) * col("__c2"))), lit(0).cast("decimal(38,0)"))
          .as("__disco"))
    def margin(kc: String, out: String) = cells
      .groupBy(col("__g"), col(kc)).agg(sum(col("__c")).as("__t"))
      .groupBy(col("__g")).agg(sum(col("__t")).as(s"__n_$out"),
        sum(dec(col("__t")) * (col("__t") - 1)).as(s"__$out"))
    val xm = margin("__x", "tx2")
    val ym = margin("__y", "ty2").drop("__n_ty2")
    val j = pairs.join(xm, "__g").join(ym, "__g")
      .withColumnRenamed("__n_tx2", "__n")
    val nD = col("__n").cast("double")
    val tau = (col("__conc").cast("double") - col("__disco").cast("double")) /
      sqrt((nD * (nD - 1.0) - col("__tx2").cast("double"))
        * (nD * (nD - 1.0) - col("__ty2").cast("double")) / 4.0)
    val nCells = cells.groupBy(col("__g")).agg(count(lit(1)).as("n_cells"))
    j.join(nCells, "__g")
      .filter(col("__n") > 1
        && nD * (nD - 1.0) - col("__tx2").cast("double") > 0
        && nD * (nD - 1.0) - col("__ty2").cast("double") > 0)
      .select(col("__g").as(groupCol), col("__n").as("n"), col("n_cells"),
        round(tau, 6).as("tau_b"))
  }

  /** Pettitt changepoint test per `keyCol` over the ordered
    * (orderCol, valueCol) series: the rank-based (Mann–Whitney-flavored)
    * single-changepoint detector (Pettitt 1979). With midranks rᵢ of the
    * values within the series,
    *
    *   Uₜ = 2·Σ_{i≤t} rᵢ − t(n+1),   K = max_{1≤t<n} |Uₜ|,
    *   p ≈ 2·exp(−6K² / (n³ + n²))
    *
    * and the changepoint estimate is the FIRST index attaining K (ties
    * broken by `orderCol` ascending — deterministic on both engines).
    *
    * Exactness: Σ 2rᵢ is a doubled-midrank cumsum (exact longs), so Uₜ
    * is exactly integral and K is a plain integer max; only the p-value
    * approximation touches floating point, once, at the end.
    *
    * Input contract: one row per (key, order) — the PRE-AGGREGATED
    * series (e.g. a daily rollup), calendar-bounded per key, so the
    * per-key ranking window holds a bounded row count (the q401/Friedman
    * bounded-series window shape, not a data-sized sort).
    *
    * Returns `(keyCol, n, k_stat, changepoint orderCol value, p_approx)`. */
  def pettitt(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String): DataFrame = {
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(orderCol).as("__i"),
        col(valueCol).cast("long").as("__v"))
    val wRank = Window.partitionBy(col("__k")).orderBy(col("__v"))
    val wTies = Window.partitionBy(col("__k"), col("__v"))
    val wOrd = Window.partitionBy(col("__k")).orderBy(col("__i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("__k"))
    val stepped = rows
      // doubled midrank 2r = 2·rank + t − 1 (exact longs)
      .withColumn("__r2",
        lit(2L) * rank().over(wRank) + count(lit(1)).over(wTies) - 1)
      .withColumn("__t", row_number().over(
        Window.partitionBy(col("__k")).orderBy(col("__i"))))
      .withColumn("__s2", sum(col("__r2")).over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      // U_t = Σ_{i≤t} 2r_i − t(n+1): exactly integral
      .withColumn("__u", col("__s2") - col("__t") * (col("__n") + 1))
    val kMax = stepped.filter(col("__t") < col("__n"))
      .groupBy(col("__k")).agg(
        max(col("__n")).as("n"),
        max(abs(col("__u"))).as("k_stat"))
    val nD = col("n").cast("double")
    val kD = col("k_stat").cast("double")
    val km2 = kMax.select(col("__k").as("__kk"), col("n").as("__nn"),
      col("k_stat").as("__ks"))
    val cp = stepped.join(km2, col("__k") === col("__kk"))
      .filter(col("__t") < col("__nn") && abs(col("__u")) === col("__ks"))
      .groupBy(col("__k").as("__k2"))
      .agg(min(col("__i")).as("changepoint"))
    kMax.join(cp, col("__k") === col("__k2"))
      .filter(col("n") > 2)
      .select(col("__k").as(keyCol), col("n"), col("k_stat"),
        col("changepoint"),
        round(lit(2.0) * exp(lit(-6.0) * kD * kD
          / (nD * nD * nD + nD * nD)), 6).as("p_approx"))
  }

  /** Page's trend test per `groupCol` (Page 1963): in a complete blocked
    * design with ORDINALLY ORDERED treatments, is there a monotone trend
    * — the ordered-alternative sharpening of [[friedman]] (which only
    * asks "any difference?"). With in-block midranks rᵢⱼ and the
    * treatment's ordinal position cⱼ (1..k, ascending `treatCol` order),
    *
    *   L = Σⱼ cⱼ·Rⱼ,   z = (L − n·k(k+1)²/4) / √(n·k²(k+1)(k²−1)/144)
    *
    * Exactness: L is accumulated DOUBLED (L2 = Σ cⱼ·2rᵢⱼ — exact longs,
    * no distinct-then-sum), and the z formula uses the doubled moments
    * (μ·2, σ²·4) so only the final expression touches double. The
    * normal approximation assumes no in-block ties (the classical
    * treatment); ties make z conservative. Complete blocks only,
    * incomplete blocks dropped like [[friedman]]'s.
    *
    * The treatment ordinal comes from a per-group dense index over the
    * DISTINCT treatment spine (bounded — k rows per group), never a
    * data-sized window.
    *
    * Returns `(groupCol, n, k, l2, z)` — `l2` = 2L, exactly integral. */
  def pageTrend(df: DataFrame, groupCol: String, blockCol: String,
      treatCol: String, valueCol: String): DataFrame = {
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(blockCol).as("__blk"),
        col(treatCol).as("__treat"), col(valueCol).cast("double").as("__x"))
    val kPer = rows.groupBy(col("__g"))
      .agg(countDistinct(col("__treat")).as("k"))
    val complete = rows.groupBy(col("__g"), col("__blk"))
      .agg(countDistinct(col("__treat")).as("__bt"))
      .join(broadcast(kPer), "__g")
      .filter(col("__bt") === col("k"))
      .select(col("__g"), col("__blk"))
    val inBlocks = rows.join(complete, Seq("__g", "__blk"))
    val wR = Window.partitionBy(col("__g"), col("__blk"))
      .orderBy(col("__x"))
    val wT = Window.partitionBy(col("__g"), col("__blk"), col("__x"))
    val ranked = inBlocks.withColumn("__d",
      lit(2L) * rank().over(wR) + count(lit(1)).over(wT) - 1)
    // ordinal position of each treatment within its group: a dense
    // index over the (group × treatment) spine — k rows per group
    val ordinal = rows.select(col("__g"), col("__treat")).distinct()
      .withColumn("__j", row_number().over(
        Window.partitionBy(col("__g")).orderBy(col("__treat"))))
    val agg = ranked.join(broadcast(ordinal), Seq("__g", "__treat"))
      .groupBy(col("__g")).agg(
        sum(col("__j") * col("__d")).as("l2"),
        countDistinct(col("__blk")).as("n"))
      .join(broadcast(kPer), "__g")
    val nD = col("n").cast("double"); val kD = col("k").cast("double")
    val mu2 = nD * kD * (kD + 1.0) * (kD + 1.0) / 2.0
    val var2 = nD * kD * kD * (kD + 1.0) * (kD * kD - 1.0) / 36.0
    agg.filter(col("k") > 1 && col("n") > 0 && var2 > 0)
      .select(col("__g").as(groupCol), col("n"), col("k"), col("l2"),
        round((col("l2").cast("double") - mu2) / sqrt(var2), 6).as("z"))
  }

  /** Mood's median test per `groupCol`: do the `treatCol` samples share
    * a common median? Counts above/below the POOLED group median into a
    * 2×k table and reads the χ² — the quick-and-robust location test
    * that ignores everything about the distributions except which side
    * of the pooled median each row falls on (Mood 1950).
    *
    * Exactness: the pooled lower median is an exact count-based order
    * statistic off the (group, value) spine via
    * [[Scale.groupedPrefixSum]]'s grouped scan (first value whose
    * cumulative count reaches ⌈n/2⌉ — never a group-keyed sort); the
    * 2×k cell counts are exact longs; the χ² fractional reduction runs
    * as an ordered window cumsum over the ≤k per-treatment rows (the
    * [[kruskalWallis]] pattern). Rows equal to the median count as
    * "below or equal" (the SAS/classical convention). Groups where
    * either side is empty are dropped explicitly.
    *
    * Returns `(groupCol, n, k, median, chi2, df)`. */
  def moodMedianTest(df: DataFrame, groupCol: String, treatCol: String,
      valueCol: String): DataFrame = {
    // barrier the FIRST AGGREGATE, not the raw projection (r12, the
    // kruskalWallis byTreat discipline): all three consumers — the
    // (g, x) spine, the per-group sizes, and the cell-count join — fold
    // out of per-(g, treat, value) counts, so the materialized artifact
    // is aggregate-sized (distinct triples) instead of input-sized, and
    // its construction shuffle gets map-side partial aggregation. The
    // r11 form localCheckpointed the full input projection: an
    // input-sized executor-memory/disk footprint at scale for the same
    // downstream reads.
    val byTx = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(treatCol).as("__t"),
        col(valueCol).cast("long").as("__x"))
      .groupBy(col("__g"), col("__t"), col("__x"))
      .agg(count(lit(1)).as("__ct"))
      .barrier()
    val spine = byTx.groupBy(col("__g"), col("__x"))
      .agg(sum(col("__ct")).as("__ties"))
    val ranked = Scale.groupedPrefixSum(spine, Seq("__g"), "__x",
      "__ties", "__cum")
    val nPer = byTx.groupBy(col("__g")).agg(sum(col("__ct")).as("__n"))
    val med = ranked.join(broadcast(nPer), "__g")
      .filter(col("__cum") >= floor((col("__n") + 1) / 2).cast("long"))
      .groupBy(col("__g")).agg(min(col("__x")).as("__med"))
    val counts = byTx.join(broadcast(med), "__g")
      .groupBy(col("__g"), col("__t")).agg(
        sum(col("__ct")).as("__nt"),
        sum(when(col("__x") > col("__med"), col("__ct"))
          .otherwise(lit(0L))).as("__a"))
    val tot = counts.groupBy(col("__g")).agg(
      sum(col("__nt")).as("__n"), sum(col("__a")).as("__ab"),
      count(lit(1)).as("k"))
    val j = counts.join(broadcast(tot), "__g")
    val nD = col("__n").cast("double"); val ntD = col("__nt").cast("double")
    val aD = col("__a").cast("double")
    val bD = (col("__nt") - col("__a")).cast("double")
    val ea = ntD * col("__ab").cast("double") / nD
    val eb = ntD * (col("__n") - col("__ab")).cast("double") / nD
    val term = (aD - ea) * (aD - ea) / ea + (bD - eb) * (bD - eb) / eb
    val wCum = Window.partitionBy(col("__g")).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = j.withColumn("__term", term)
      .withColumn("__c2", sum(col("__term")).over(wCum))
    cum.groupBy(col("__g")).agg(
        max(col("__n")).as("n"), max(col("k")).as("k"),
        max(col("__ab")).as("__abm"),
        max_by(col("__c2"), col("__t")).as("__chi2"))
      // broadcast (r12): med is a ≤|groups|-row aggregate behind a
      // barrier leaf with no size stats — the planner sort-merged it
      .join(broadcast(med.select(col("__g"), col("__med"))), "__g")
      .filter(col("k") > 1 && col("__abm") > 0 && col("__abm") < col("n"))
      .select(col("__g").as(groupCol), col("n"), col("k"),
        col("__med").as("median"), round(col("__chi2"), 6).as("chi2"),
        (col("k") - 1).as("df"))
  }

  /** Cochran's Q test per `groupCol` over BINARY repeated measures: did
    * the success rate differ across the k treatments when every block
    * (subject) is its own control? The dichotomous sibling of q399's
    * Friedman (Cochran 1950):
    *
    *   Q = (k−1)·(k·ΣⱼCⱼ² − N²) / (k·N − ΣᵢRᵢ²),  Q ~ χ²(k−1) under H₀
    *
    * with Cⱼ the per-treatment success totals, Rᵢ the per-block totals,
    * N the grand total. All three moments are exact integer sums
    * (DECIMAL(38,0) for the squares); Q is one double expression per
    * group. Blocks must be complete (every treatment observed — build
    * the input that way); all-0/all-k blocks cancel in both numerator
    * and denominator, and groups where the denominator is ≤ 0 (every
    * block uninformative) are dropped explicitly.
    *
    * Returns `(groupCol, n_blocks, k, q_stat, df)`. */
  def cochranQ(df: DataFrame, groupCol: String, blockCol: String,
      treatCol: String, xCol: String): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val rows = df.select(col(groupCol).as("__g"), col(blockCol).as("__b"),
      col(treatCol).as("__t"), col(xCol).cast("long").as("__x"))
    val kPer = rows.groupBy(col("__g"))
      .agg(countDistinct(col("__t")).as("k"))
    val colTot = rows.groupBy(col("__g"), col("__t"))
      .agg(sum(col("__x")).as("__c"))
      .groupBy(col("__g")).agg(
        sum(col("__c")).as("__n"),
        sum(dec(col("__c")) * col("__c")).as("__sc2"))
    val rowTot = rows.groupBy(col("__g"), col("__b"))
      .agg(sum(col("__x")).as("__r"))
      .groupBy(col("__g")).agg(
        count(lit(1)).as("n_blocks"),
        sum(dec(col("__r")) * col("__r")).as("__sr2"))
    val j = colTot.join(rowTot, "__g").join(broadcast(kPer), "__g")
    val kD = col("k").cast("double")
    val nD = col("__n").cast("double")
    val q = (kD - 1.0) * (kD * col("__sc2").cast("double") - nD * nD) /
      (kD * nD - col("__sr2").cast("double"))
    j.filter(col("k") > 1
        && kD * nD - col("__sr2").cast("double") > 0.0)
      .select(col("__g").as(groupCol), col("n_blocks"), col("k"),
        round(q, 6).as("q_stat"), (col("k") - 1).as("df"))
  }

  /** Lag-1 Granger causality per `keyCol`: does yesterday's `xCol` add
    * predictive power for today's `yCol` beyond yesterday's `yCol`?
    * Fits the restricted AR(1) model  yₜ = a₀ + a₁·yₜ₋₁  and the
    * unrestricted  yₜ = b₀ + b₁·yₜ₋₁ + b₂·xₜ₋₁  in closed form from the
    * normal equations ([[Metrics.ols2]]'s Cramer solve), then
    *
    *   F = (RSS_r − RSS_u) / (RSS_u / (n − 3)),   F ~ F(1, n−3) under H₀
    *
    * with RSS computed from the same moments
    * (RSS = Σy² − b₀Σy − b₁Σx₁y − b₂Σx₂y).
    *
    * Determinism contract: `yCol`/`xCol` must be INTEGER-valued (pass
    * cents / counts) so all ten moment sums are exact (longs and
    * DECIMAL(38,0) for the squares/cross-products); the coefficients,
    * RSS, and F then combine those exact values in double with one
    * fixed expression shape, replayable verbatim in any engine.
    *
    * Input contract: one row per (key, order) — the pre-aggregated,
    * calendar-bounded series per key (the bounded-series lag-window
    * shape). Groups with a singular normal matrix, n ≤ 3, or RSS_u ≤ 0
    * are dropped explicitly.
    *
    * Returns `(keyCol, n, b_ylag, b_xlag, rss_r, rss_u, f_stat, df2)`. */
  def grangerLag1(df: DataFrame, keyCol: String, orderCol: String,
      yCol: String, xCol: String): DataFrame = {
    val wLag = Window.partitionBy(col("__k")).orderBy(col("__i"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val lagged = df
      .select(col(keyCol).as("__k"), col(orderCol).as("__i"),
        col(yCol).cast("long").as("__y"), col(xCol).cast("long").as("__x"))
      .withColumn("__a", lag(col("__y"), 1).over(wLag))
      .withColumn("__b", lag(col("__x"), 1).over(wLag))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
    val m = lagged.groupBy(col("__k")).agg(
      count(lit(1)).as("n"),
      sum(col("__a")).as("__p"), sum(col("__b")).as("__q"),
      sum(col("__y")).as("__sy"),
      sum(dec(col("__a")) * col("__a")).as("__saa"),
      sum(dec(col("__a")) * col("__b")).as("__sab"),
      sum(dec(col("__b")) * col("__b")).as("__sbb"),
      sum(dec(col("__a")) * col("__y")).as("__say"),
      sum(dec(col("__b")) * col("__y")).as("__sby"),
      sum(dec(col("__y")) * col("__y")).as("__syy"))
    def d(c: String) = col(c).cast("double")
    val nD = col("n").cast("double")
    val (p, q, sy) = (d("__p"), d("__q"), d("__sy"))
    val (a, b, c0) = (d("__saa"), d("__sab"), d("__sbb"))
    val (s1y, s2y, syy) = (d("__say"), d("__sby"), d("__syy"))
    // unrestricted: Cramer on the 3×3 moment matrix (ols2's shape)
    val det = nD * (a * c0 - b * b) - p * (p * c0 - b * q) +
      q * (p * b - a * q)
    val d0 = sy * (a * c0 - b * b) - p * (s1y * c0 - b * s2y) +
      q * (s1y * b - s2y * a)
    val d1 = nD * (s1y * c0 - b * s2y) - sy * (p * c0 - b * q) +
      q * (p * s2y - s1y * q)
    val d2 = nD * (a * s2y - s1y * b) - p * (p * s2y - s1y * q) +
      sy * (p * b - a * q)
    val b0u = d0 / det; val b1u = d1 / det; val b2u = d2 / det
    val rssU = syy - b0u * sy - b1u * s1y - b2u * s2y
    // restricted: one-regressor OLS in closed form
    val sxx = nD * a - p * p
    val b1r = (nD * s1y - p * sy) / sxx
    val b0r = (sy - b1r * p) / nD
    val rssR = syy - b0r * sy - b1r * s1y
    val f = (rssR - rssU) * (nD - 3.0) / rssU
    m.withColumn("__det", det).withColumn("__rssu", rssU)
      .filter(col("n") > 3 && col("__det") =!= 0.0 && sxx =!= 0.0
        && col("__rssu") > 0.0)
      .select(col("__k").as(keyCol), col("n"),
        round(b1u, 6).as("b_ylag"), round(b2u, 6).as("b_xlag"),
        // RSS stays unrounded: round(x, d) on a ~1e16 double resolves
        // the half-way case differently across engines (one-ulp skew);
        // the raw double is bit-identical and canonicalizes cleanly
        rssR.as("rss_r"), rssU.as("rss_u"),
        round(f, 6).as("f_stat"), (col("n") - 3).as("df2"))
  }
}
