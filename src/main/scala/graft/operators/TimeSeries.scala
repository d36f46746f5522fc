package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-series features over event streams. */
object TimeSeries {

  /** Regularize an event stream to one row per key per DAY with gaps
    * filled by the last observation carried forward (LOCF) — the
    * resample step every downstream daily-feature join assumes.
    * Returns `(keyCol, day, valueCol)` over each key's [first, last]
    * observed-day span.
    *
    * Per day the SURVIVING observation is the latest by
    * `(tsCol, tieCol)` — `tieCol` must make that pair unique per key
    * (an event id) so the choice is deterministic under any partition
    * order. The per-key calendar comes from an in-plan
    * `sequence(min_day, max_day)` explode — span-bounded, nothing
    * collects, keys never interact — and the fill is one
    * `last(ignoreNulls)` running window per key. Two shuffles (daily
    * reduce, key window); per-key cost ∝ span days, so a billion keys
    * distribute freely.
    */
  def gapFillDaily(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String): DataFrame = {
    val base = df.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
        col(tieCol).as("__tb"), col(valueCol).as("__v"))
      .withColumn("__day", to_date(col("__ts")))
    val daily = base
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__k"), col("__day"))
          .orderBy(col("__ts").desc, col("__tb").desc)))
      .filter(col("__rn") === 1)
      .select(col("__k"), col("__day"), col("__v"))
    val cal = daily.groupBy(col("__k"))
      .agg(min(col("__day")).as("__lo"), max(col("__day")).as("__hi"))
      .select(col("__k"), explode(sequence(col("__lo"), col("__hi"),
        expr("interval 1 day"))).as("__day"))
    cal.join(daily, Seq("__k", "__day"), "left")
      .select(col("__k").as(keyCol), col("__day").as("day"),
        last(col("__v"), ignoreNulls = true).over(
          Window.partitionBy(col("__k")).orderBy(col("__day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as(valueCol))
  }

  /** Explode each `[startCol, endCol]` date interval into the calendar
    * months it overlaps (one output row per interval × month, month as
    * its first day in a `bin` column) — the bin-expansion rewrite of an
    * interval-overlap join for aggregation. Instead of an inequality
    * join against a calendar table (a nested-loop at scale), every
    * interval emits its own ≤ span/month bins map-side and the overlap
    * aggregate becomes a plain hash `groupBy(bin)` — no join at all.
    * Cost is rows × avg months spanned; intervals must satisfy
    * start ≤ end (`sequence` throws on a negative range).
    */
  def explodeMonthBins(df: DataFrame, startCol: String, endCol: String): DataFrame =
    df.withColumn("bin", explode(sequence(
      trunc(col(startCol), "month"), trunc(col(endCol), "month"),
      expr("interval 1 month"))))

  /** First-order Markov transition matrix over each key's event
    * sequence: `(from_type, to_type, n, p)` where `n` counts adjacent
    * (by `tsCol` within `keyCol`) event-type pairs across the corpus
    * and `p` row-normalizes to the empirical transition probability —
    * the "what do users do next" estimate product analytics and
    * next-event models both start from. One key-partitioned window
    * (lead) + one hash aggregate over |types|² rows + a types-sized
    * normalization window. `tsCol` must be unique per key for a
    * deterministic successor. */
  def transitionMatrix(df: DataFrame, keyCol: String, tsCol: String,
      typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    df.select(col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n") /
        sum(col("n")).over(Window.partitionBy(col("from_type"))), 6))
  }

  /** Per-session ordered event-type paths ("signup>browse>purchase"),
    * sessionized by the native `session_window` (same ≥`gap` close rule
    * as q23): `(keyCol, session_start, path, n_events)`. The in-session
    * order is pinned by sorting the collected (ts, type) structs —
    * `collect_list` alone has NO order guarantee under retries or
    * partition order, the classic silent nondeterminism of path
    * mining — so `tsCol` must be unique per key. State is per-session
    * (bounded by session length), one keyed shuffle. */
  def sessionPaths(df: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, gap: String = "30 minutes"): DataFrame =
    df.groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(concat_ws(">", transform(
          sort_array(collect_list(struct(col(tsCol).as("__ts"),
            col(typeCol).cast("string").as("__ty")))),
          s => s.getField("__ty"))).as("path"),
        count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_window.start").as("session_start"),
        col("path"), col("n_events"))

  /** Final exponentially-weighted moving average per key:
    * `ewma_i = (1-α)·ewma_{i-1} + α·v_i` folded over each key's events
    * in `(orderCols)` order from a 0.0 start — the classic recency-
    * weighted feature a behavior profile ships. The recurrence is
    * inherently sequential, so it runs as an `aggregate` HOF fold over
    * the key's time-sorted value array — exact sequential semantics,
    * no `pow(1/(1-α), n)` overflow trick (that formulation blows past
    * double range around 2k events/key). State is O(events per key)
    * during the aggregate; keys are independent and distribute freely.
    * `orderCols` must be unique per key for a deterministic fold.
    * Returns (key, n_events, ewma). */
  def ewmaPerKey(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val sortKey = struct(
      orderCols.map(col) :+ col(valueCol).cast("double").as("__v"): _*)
    val values = transform(array_sort(collect_list(sortKey)),
      s => s.getField("__v"))
    val fold = aggregate(values, lit(0.0),
      (acc: Column, v: Column) => acc * lit(1.0 - alpha) + v * lit(alpha))
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), round(fold, 6).as("ewma"))
  }

  /** Per-key exponential time-decay score `Σ v·exp(−Δt/τ)` against the
    * corpus's latest timestamp — the recency-weighted engagement
    * number a ranking feature store keeps per user. Δt in exact
    * integer seconds (micros div 1e6) against a 1-row broadcast
    * reference; one keyed hash aggregate, no window. `tauSeconds` is
    * the e-folding time. Returns `(key, n_events, decayed_score)`
    * rounded to 6. */
  def decayScore(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tauSeconds: Double): DataFrame = {
    require(tauSeconds > 0, s"tauSeconds must be positive: $tauSeconds")
    val ref = df.agg(max(unix_micros(col(tsCol))).as("__ref"))
    df.select(col(keyCol).as("key"), unix_micros(col(tsCol)).as("__us"),
        col(valueCol).cast("double").as("__v"))
      .crossJoin(broadcast(ref))
      .select(col("key"),
        (col("__v") * exp(-(expr("(__ref - __us) div 1000000").cast("double"))
          / tauSeconds)).as("__term"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("__term")), 6).as("decayed_score"))
  }

  /** Per-key clamped running balance: fold `greatest(0, acc + delta)`
    * over each key's time-ordered deltas — inventory / prepaid-credit
    * semantics where the balance can never go negative, which NO window
    * frame expresses (the clamp makes every step depend on the folded
    * prior state, not a distributive sum). Same shape as [[ewmaPerKey]]:
    * per-key sorted-struct collect + sequential aggregate HOF — exact
    * semantics, deterministic under any partitioning, per-key cost
    * ∝ events. Returns `(key, n_events, final_balance, total_lost)`
    * where `total_lost` is the amount discarded by the zero clamps
    * (conservation: Σdeltas − lost = balance). */
  def clampedRunningBalance(df: DataFrame, keyCol: String,
      orderCols: Seq[String], deltaCol: String): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val sortKey = struct(
      orderCols.map(col) :+ col(deltaCol).cast("double").as("__d"): _*)
    val deltas = transform(array_sort(collect_list(sortKey)),
      s => s.getField("__d"))
    val fold = aggregate(deltas, lit(0.0),
      (acc: Column, d: Column) => greatest(lit(0.0), acc + d))
    df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_events"),
        round(fold, 6).as("final_balance"),
        round(fold - aggregate(deltas, lit(0.0), (acc, d) => acc + d), 6)
          .as("total_lost"))
  }

  /** Per-key least-squares trend line `y ≈ intercept + slope·x` — the
    * feature-engineering "is this user's metric rising" signal. The
    * CENTERED two-pass formula (per-key means first, then
    * Σ(x−x̄)(y−ȳ) / Σ(x−x̄)²) rather than the one-pass
    * n·Σxy−Σx·Σy closed form: with epoch-scale x the one-pass
    * numerator is a catastrophic cancellation of ~1e24 terms and loses
    * every significant digit. Two shuffles on the key (means, then the
    * centered aggregate via a broadcast-joinable means table). Keys
    * need >= 2 points and non-degenerate x spread; others are dropped.
    * Returns (key, n, slope, intercept) rounded to 6. */
  def trendPerKey(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val means = df.groupBy(col(keyCol))
      .agg(avg(col(xCol)).as("__ax"), avg(col(yCol)).as("__ay"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 2)
    val dx = col(xCol) - col("__ax")
    val dy = col(yCol) - col("__ay")
    // no forced broadcast: the means table is |keys|-sized and a
    // billion-key corpus must not be driver-collected — AQE broadcasts
    // it when it is actually small
    df.join(means, keyCol)
      .groupBy(col(keyCol))
      .agg(first(col("n")).as("n"), first(col("__ax")).as("__ax2"),
        first(col("__ay")).as("__ay2"),
        sum(dx * dy).as("__sxy"), sum(dx * dx).as("__sxx"))
      .filter(col("__sxx") > 0)
      .select(col(keyCol), col("n"),
        round(col("__sxy") / col("__sxx"), 6).as("slope"),
        round(col("__ay2") - col("__sxy") / col("__sxx") * col("__ax2"), 6)
          .as("intercept"))
  }

  /** Per-key CUSUM changepoint: the point where the running sum of
    * deviations from the key's mean peaks in magnitude — the standard
    * offline CUSUM estimate of a single level shift (Page 1954 shape,
    * batch form). Two keyed shuffles (mean, then one ordered window
    * doing the running sum); per-key state is one running double, so
    * keys of any length distribute. Ties on |cusum| break toward the
    * earliest `orderCol`, so the result is partition-order-free.
    * `orderCol` must be unique per key (a day/bucket id — aggregate
    * first if it is not). Returns
    * (key, n_points, changepoint = orderCol at the peak, peak_cusum). */
  def cusumChangepoint(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val mean = Window.partitionBy(col(keyCol))
    val run = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__n", count(lit(1)).over(mean))
      .withColumn("__cusum", sum(v - avg(v).over(mean)).over(run))
      .withColumn("__rk", row_number().over(Window.partitionBy(col(keyCol))
        .orderBy(abs(col("__cusum")).desc, col(orderCol))))
      .filter(col("__rk") === 1)
      .select(col(keyCol), col("__n").as("n_points"),
        col(orderCol).as("changepoint"),
        round(col("__cusum"), 6).as("peak_cusum"))
  }

  /** Per-key supervised-learning feature matrix: for every row, the
    * previous `lags` values of `valueCol` (lag_1 … lag_n) plus the
    * rolling mean over the `rollN` PRECEDING rows (current row
    * excluded — these are features for predicting the current value,
    * so the frame must not leak it). One keyed shuffle serves every
    * feature: all windows share the same (key, order) sort, so
    * Catalyst collapses them into a single WindowExec pass.
    * `orderCols` must be unique per key for deterministic lags.
    * Rolling mean is ordered-frame arithmetic — deterministic under
    * any partitioning. Appends lag_i (raw) and roll_mean (rounded 6);
    * rows without a full lag window carry nulls, as the downstream
    * trainer's null-handling expects. */
  def lagFeatures(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, lags: Int, rollN: Int): DataFrame = {
    require(lags >= 1, s"lags must be >= 1: $lags")
    require(rollN >= 1, s"rollN must be >= 1: $rollN")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val v = col(valueCol).cast("double")
    val lagCols = (1 to lags).map(i => lag(v, i).over(w).as(s"lag_$i"))
    val roll = round(
      avg(v).over(w.rowsBetween(-rollN, -1)), 6).as("roll_mean")
    df.select(df.columns.map(col) ++ lagCols :+ roll: _*)
  }

  /** Daily concurrency (backlog) curve: for each calendar day, how
    * many intervals cover it (orders opened but not yet shipped, jobs
    * in flight, rooms occupied) — WITHOUT the inequality join the
    * naive `day BETWEEN start AND end` formulation costs: each
    * interval explodes map-side into its covered days ([[gapFillDaily]]'s
    * span-bounded calendar trick; cost ∝ total covered days), then ONE
    * day-keyed count. Days covered by zero intervals are absent.
    * Inclusive on both ends. Returns `(day, n_open)`. */
  def dailyConcurrency(df: DataFrame, startCol: String,
      endCol: String): DataFrame = {
    df.select(to_date(col(startCol)).as("__s"),
        to_date(col(endCol)).as("__e"))
      .filter(col("__s").isNotNull && col("__e").isNotNull &&
        col("__s") <= col("__e"))
      .select(explode(sequence(col("__s"), col("__e"))).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_open"))
  }

  /** Theil–Sen robust slope per key (Theil 1950, Sen 1968): the MEDIAN
    * of all pairwise slopes `(y_j−y_i)/(x_j−x_i)` — up to ~29%
    * contaminated points leave the estimate unmoved, where one OLS
    * outlier drags the fit arbitrarily. Pairwise enumeration is the
    * operator's CONTRACT and cost: per-key C(n,2) slopes, so
    * `maxPoints` bounds each key (keys beyond it are dropped loudly —
    * a hub key would otherwise go quadratic; at 100 TB pre-aggregate
    * to daily/bucketed points first, which is what the q239 query
    * does). Slopes are enumerated MAP-SIDE from each key's collected
    * (x, y) array — no self-join, one keyed aggregate — and the
    * median is the exact interpolated middle of the sorted slope
    * array.
    *
    * Returns `(keyCol, n_points, n_pairs, slope)` (slope rounded to
    * 6) for keys with ≥ 2 distinct x. */
  def theilSen(df: DataFrame, keyCol: String, xCol: String,
      yCol: String, maxPoints: Int = 1000): DataFrame = {
    require(maxPoints >= 2 && maxPoints <= 10000,
      s"maxPoints must be in [2, 10000]: $maxPoints")
    val g = df.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y")))).as("__pts"))
      .filter(size(col("__pts")).between(2, maxPoints))
    // all i<j slopes with x_i != x_j, via a flattened double loop of
    // array HOFs; sort + exact interpolated median, all map-side
    val withSlopes = g.withColumn("__slopes", expr(
      """array_sort(flatten(transform(__pts, (p, i) ->
           filter(transform(__pts, (q, j) ->
             IF(j > i AND q.x != p.x,
                (q.y - p.y) / (q.x - p.x), NULL)),
           s -> s IS NOT NULL))))"""))
      .filter(size(col("__slopes")) >= 1)
    val n = size(col("__slopes"))
    val mid = ((n + 1) / 2).cast("int")
    val lo = (n / 2).cast("int")
    withSlopes.select(col(keyCol), size(col("__pts")).as("n_points"),
      n.cast("long").as("n_pairs"),
      round(when(n % 2 === 1, element_at(col("__slopes"), mid))
        .otherwise((element_at(col("__slopes"), lo)
          + element_at(col("__slopes"), lo + 1)) / 2.0), 6).as("slope"))
  }

  /** Lag-1 autocorrelation per key over an ordered integer series —
    * the "is today like yesterday" number that separates trending
    * series from noise. Computed from EXACT long moments of the
    * consecutive-pair set (`Σx`, `Σy`, `Σxy`, `Σx²`, `Σy²` over pairs
    * `(v_t, v_{t+1})`) combined in double at the end — the textbook
    * Pearson form over lagged pairs, deterministic under any
    * partitioning. One keyed window (the lead) + one hash aggregate.
    *
    * Returns `(keyCol, n_pairs, r1)` (rounded to 6) for keys with ≥ 2
    * pairs and non-degenerate variance. */
  def lag1Autocorr(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val paired = df
      .withColumn("__y", lead(col(valueCol).cast("long"), 1).over(w))
      .filter(col("__y").isNotNull)
      .select(col(keyCol), col(valueCol).cast("long").as("__x"),
        col("__y"))
    val m = paired.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__y") * col("__y")).as("__syy"))
    def d(c: String) = col(c).cast("double")
    val nD = col("n_pairs").cast("double")
    val cov = nD * d("__sxy") - d("__sx") * d("__sy")
    val vx = nD * d("__sxx") - d("__sx") * d("__sx")
    val vy = nD * d("__syy") - d("__sy") * d("__sy")
    m.filter(col("n_pairs") >= 2 && vx > 0 && vy > 0)
      .select(col(keyCol), col("n_pairs"),
        round(cov / sqrt(vx * vy), 6).as("r1"))
  }

  /** Autocorrelation function per key: Pearson r between the series
    * and its lag-k shift for every k in 1..maxLag — the periodicity
    * probe behind "is this signal weekly" questions; the multi-lag
    * generalization of [[lag1Autocorr]] with the same exactness
    * contract (integer moments summed exactly, doubles only in the
    * final closed form, identical under any partitioning — cast the
    * value to integer units before calling).
    *
    * Spark shape: the k shifted copies come from `lead` columns over
    * ONE keyed window (no self-join), stacked into `(lag, pair)` rows
    * by a map-side array explode; the moment aggregate then shares the
    * same hash partitioning on the key. Cost: rows × maxLag exploded
    * pairs — maxLag is a small constant, so linear. Degenerate lags
    * (< 2 pairs or zero variance on either side) are dropped. */
  def acf(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1: $maxLag")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val x = col(valueCol).cast("long")
    val pairs = df
      .select(col(keyCol), x.as("__x"),
        array((1 to maxLag).map(k =>
          struct(lit(k).as("lag"), lead(x, k).over(w).as("y"))): _*)
          .as("__ls"))
      .select(col(keyCol), col("__x"), explode(col("__ls")).as("__p"))
      .filter(col("__p.y").isNotNull)
      .select(col(keyCol), col("__p.lag").as("lag"), col("__x"),
        col("__p.y").as("__y"))
    val m = pairs.groupBy(col(keyCol), col("lag")).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__y") * col("__y")).as("__syy"))
    def d(c: String) = col(c).cast("double")
    val nD = col("n_pairs").cast("double")
    val cov = nD * d("__sxy") - d("__sx") * d("__sy")
    val vx = nD * d("__sxx") - d("__sx") * d("__sx")
    val vy = nD * d("__syy") - d("__sy") * d("__sy")
    m.filter(col("n_pairs") >= 2 && vx > 0 && vy > 0)
      .select(col(keyCol), col("lag"), col("n_pairs"),
        round(cov / sqrt(vx * vy), 6).as("acf"))
  }

  /** Nelson–Aalen cumulative hazard estimator — [[kaplanMeier]]'s
    * additive sibling: H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ over event times, the
    * hazard-scale view survival analysis reads alongside the survival
    * curve (H ≈ −ln S for small increments). Same right-censoring
    * convention, the same reduced per-t risk-set machinery, and the
    * same probe-and-route as [[kaplanMeier]]: a spine at or below
    * [[Scale.maxOrderedFrameRows]] runs the sequential single-task
    * windows (per-t double ratios accumulated in ascending-t frame
    * order — identical sequential order in any engine); a corpus-sized
    * spine rides the range-partitioned prefix scans instead. */
  def nelsonAalen(df: DataFrame, durationCol: String,
      observedCol: String,
      maxSpineRows: Long = Scale.maxOrderedFrameRows): DataFrame = {
    val perT = df.groupBy(col(durationCol).cast("long").as("t"))
      .agg(sum(col(observedCol).cast("long")).as("n_events"),
        sum(lit(1L) - col(observedCol).cast("long")).as("n_censored_at_t"))
      .barrierLazy()
    val total = broadcast(df.agg(count(lit(1)).as("__n")))
    if (perT.count() <= maxSpineRows) {
      val w = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wTot = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perT
        .withColumn("__gone",
          coalesce(sum(col("n_events") + col("n_censored_at_t")).over(w),
            lit(0L)))
        .crossJoin(total)
        .withColumn("n_risk", col("__n") - col("__gone"))
        .withColumn("cum_hazard",
          round(sum(col("n_events").cast("double") / col("n_risk"))
            .over(wTot), 6))
        .filter(col("n_events") > 0)
        .select(col("t"), col("n_risk"), col("n_events"), col("cum_hazard"))
    } else {
      val risk = Scale
        .prefixSum(perT.withColumn("__tot",
          col("n_events") + col("n_censored_at_t")), "t", "__tot", "__cum")
        .crossJoin(total)
        .withColumn("n_risk", col("__n") - col("__cum") + col("__tot"))
        .withColumn("__h",
          col("n_events").cast("double") / col("n_risk"))
      Scale.prefixSumD(risk, "t", "__h", "__hCum")
        .withColumn("cum_hazard", round(col("__hCum"), 6))
        .filter(col("n_events") > 0)
        .select(col("t"), col("n_risk"), col("n_events"), col("cum_hazard"))
    }
  }

  /** k-step absorption probability of a first-order Markov chain
    * estimated from event sequences: from each non-absorbing state s,
    * the probability of reaching `absorbState` within `steps`
    * transitions — q_k(s) = T[s,A] + Σ_{s'≠A} T[s,s']·q_{k−1}(s'),
    * q_0 ≡ 0 — the "how close is this state to converting" read-out
    * behind Markov funnel/attribution analyses.
    *
    * Spark shape: transition counts are ONE keyed reduce over
    * lead-paired events (deterministic order: `tsCol` then `tieCol`);
    * the k iterations run in-plan over the |states|²-sized probability
    * table ([[graft.operators.Graph.pageRank]]'s discipline — no
    * driver collect; with states in the dozens the per-iteration join
    * is trivially broadcast). Probabilities are exact-integer ratios
    * cast to double once; iteration sums follow q130's precedent
    * (rounded output absorbs ulp noise). Returns
    * `(state, n_out, p_absorb)` for non-absorbing states. */
  def markovAbsorption(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, stateCol: String, absorbState: String,
      steps: Int): DataFrame = {
    require(steps >= 1, s"steps must be >= 1: $steps")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val tr = df
      .withColumn("__next", lead(col(stateCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(stateCol).as("__from"), col("__next").as("__to"))
      .agg(count(lit(1)).as("__cnt"))
    val tot = tr.groupBy(col("__from")).agg(sum(col("__cnt")).as("__tc"))
    val t = tr.join(tot, "__from")
      .select(col("__from"), col("__to"),
        (col("__cnt").cast("double") / col("__tc").cast("double"))
          .as("__p"))
      .cache()
    val states = t.select(col("__from").as("state")).distinct()
      .filter(col("state") =!= absorbState)
    val direct = t.filter(col("__to") === absorbState)
      .select(col("__from").as("state"), col("__p").as("__pd"))
    var q = states.withColumn("__q", lit(0.0)).barrier()
    (1 to steps).foreach { _ =>
      val contrib = t.filter(col("__to") =!= absorbState)
        .join(q.withColumnRenamed("state", "__to"), "__to")
        .groupBy(col("__from"))
        .agg(sum(col("__p") * col("__q")).as("__c"))
        .withColumnRenamed("__from", "state")
      q = states
        .join(direct, Seq("state"), "left")
        .join(contrib, Seq("state"), "left")
        .select(col("state"),
          (coalesce(col("__pd"), lit(0.0))
            + coalesce(col("__c"), lit(0.0))).as("__q"))
        .barrier()
    }
    val out = q.join(tot.withColumnRenamed("__from", "state"), "state")
      .select(col("state"), col("__tc").as("n_out"),
        round(col("__q"), 6).as("p_absorb"))
    t.unpersist(blocking = false)
    out
  }

  /** Holt linear (double-exponential) smoothing per key with a
    * one-step-ahead forecast — the level+trend recursion
    * `l_t = α·x_t + (1−α)(l_{t−1}+b_{t−1})`,
    * `b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}` seeded at
    * `(l, b) = (x_1, 0)` — a sequential dependence no window frame
    * expresses ([[clampedRunningBalance]]'s class): per-key sorted
    * collect + ONE aggregate HOF fold with an `array(level, trend)`
    * accumulator, exact order from `orderCol`.
    *
    * The smoothing constants enter the expression as `(1.0 − α)`
    * SUBEXPRESSIONS (never pre-computed on the driver): each engine
    * constant-folds the same literals to the same double, so an oracle
    * spelling `(1.0 - 0.3)` replays bit-for-bit — a driver-side
    * `1 - 0.3` would interpolate `0.7000000000000001` and flap.
    *
    * Returns `(keyCol, n_points, level, trend, forecast)` (rounded to
    * 6) for keys with ≥ 2 points. */
  def holtForecast(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, alpha: Double = 0.3, beta: Double = 0.1): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    require(beta > 0 && beta < 1, s"beta must be in (0,1): $beta")
    val a = alpha.toString; val b = beta.toString
    df.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col(orderCol).as("o"),
        col(valueCol).cast("double").as("v")))).as("__s"))
      .withColumn("__vals", expr("transform(__s, x -> x.v)"))
      .filter(size(col("__vals")) >= 2)
      .withColumn("__st", expr(
        s"""aggregate(slice(__vals, 2, size(__vals) - 1),
           array(element_at(__vals, 1), cast(0.0 as double)),
           (acc, x) -> array(
             $a * x + (1.0 - $a) * (acc[0] + acc[1]),
             $b * ($a * x + (1.0 - $a) * (acc[0] + acc[1]) - acc[0])
               + (1.0 - $b) * acc[1]))"""))
      .select(col(keyCol), size(col("__vals")).as("n_points"),
        round(expr("__st[0]"), 6).as("level"),
        round(expr("__st[1]"), 6).as("trend"),
        round(expr("__st[0] + __st[1]"), 6).as("forecast"))
  }

  /** Additive Holt–Winters triple-exponential smoothing per key: level +
    * trend + a `period`-slot seasonal cycle, folded over the key's
    * ordered series as ONE aggregate HOF — [[holtForecast]] extended
    * with the seasonal recurrence (Winters 1960):
    *
    *   ℓₜ = α(xₜ − s_{t−m}) + (1−α)(ℓ_{t−1} + b_{t−1})
    *   bₜ = β(ℓₜ − ℓ_{t−1}) + (1−β)b_{t−1}
    *   sₜ = γ(xₜ − ℓₜ) + (1−γ)s_{t−m}
    *
    * The state vector is an array `[level, trend, s₁ … s_m]` with the
    * seasonal slots kept as a ROTATING QUEUE — s₁ is always the slot the
    * CURRENT step consumes, and each step drops it, shifts, and appends
    * the refreshed value. That makes the update a slice+concat (no
    * indexed in-place write, which array HOFs can't express) and keeps
    * the fold a single `aggregate(...)` the oracle can replay verbatim
    * with `list_reduce`. Zero-initialized: ℓ₀ = x₁, b₀ = 0, s = 0⃗ —
    * deterministic, no decomposition pre-pass. Smoothing constants
    * enter as `(1.0 − α)` SUBEXPRESSIONS so both engines constant-fold
    * the identical double (the [[holtForecast]] parity rule).
    *
    * Sequential by construction (the fold follows the sorted order), so
    * the doubles are bit-stable under any partitioning; per-key state is
    * `period + 2` doubles and the collected series is calendar-bounded
    * for daily keys. Keys need ≥ `period` + 2 points.
    *
    * Returns `(keyCol, n_points, level, trend, season_next, forecast)`
    * where `forecast = level + trend + season_next` is the one-step-
    * ahead prediction, rounded to 6. */
  def holtWinters(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, alpha: Double = 0.3, beta: Double = 0.1,
      gamma: Double = 0.2, period: Int = 7): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    require(beta > 0 && beta < 1, s"beta must be in (0,1): $beta")
    require(gamma > 0 && gamma < 1, s"gamma must be in (0,1): $gamma")
    require(period >= 2, s"period must be >= 2: $period")
    val a = alpha.toString; val b = beta.toString; val g = gamma.toString
    val zeros = Seq.fill(period)("cast(0.0 as double)").mkString(", ")
    // acc[2] is s₁, the seasonal slot consumed by the current step
    val nl = s"($a * (x - acc[2]) + (1.0 - $a) * (acc[0] + acc[1]))"
    val nt = s"($b * ($nl - acc[0]) + (1.0 - $b) * acc[1])"
    val ns = s"($g * (x - $nl) + (1.0 - $g) * acc[2])"
    df.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col(orderCol).as("o"),
        col(valueCol).cast("double").as("v")))).as("__s"))
      .withColumn("__vals", expr("transform(__s, x -> x.v)"))
      .filter(size(col("__vals")) >= period + 2)
      .withColumn("__st", expr(
        s"""aggregate(slice(__vals, 2, size(__vals) - 1),
           array(element_at(__vals, 1), cast(0.0 as double), $zeros),
           (acc, x) -> concat(array($nl, $nt),
             slice(acc, 4, ${period - 1}), array($ns)))"""))
      .select(col(keyCol), size(col("__vals")).as("n_points"),
        round(expr("__st[0]"), 6).as("level"),
        round(expr("__st[1]"), 6).as("trend"),
        round(expr("__st[2]"), 6).as("season_next"),
        round(expr("__st[0] + __st[1] + __st[2]"), 6).as("forecast"))
  }

  /** Per-key burstiness (Fano factor) of daily activity: variance of
    * the key's daily event count over the GLOBAL observed-day range
    * (zero days count — a key active once in a 30-day corpus is
    * bursty, which a per-active-day variance would hide), divided by
    * the mean. F ≈ 1 is Poisson-like, F ≫ 1 bursty — the signal that
    * decides per-key rate limits and skew salts. All moments are
    * exact integer sums (absent days add 0 to Σc and Σc²; the global
    * day count is a broadcast scalar), combined in double at the end.
    *
    * Returns `(keyCol, n_days, n_active_days, n_events, mean, fano)`
    * rounded to 6. */
  def burstiness(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = df.select(col(keyCol).as("__k"),
      to_date(col(tsCol)).as("__day"))
      .groupBy(col("__k"), col("__day")).agg(count(lit(1)).as("__c"))
    val nDays = daily.select(col("__day")).distinct()
      .agg(count(lit(1)).as("__nd"))
    daily.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_active_days"), sum(col("__c")).as("n_events"),
        sum(col("__c") * col("__c")).as("__sc2"))
      .crossJoin(broadcast(nDays))
      .select(col("__k").as(keyCol), col("__nd").as("n_days"),
        col("n_active_days"), col("n_events"),
        round(col("n_events").cast("double") / col("__nd"), 6).as("mean"),
        round(((col("__nd").cast("double") * col("__sc2").cast("double")
            - col("n_events").cast("double") * col("n_events").cast("double"))
          / (col("__nd").cast("double") * (col("__nd").cast("double") - 1)))
          / (col("n_events").cast("double") / col("__nd")), 6).as("fano"))
  }

  /** Kaplan–Meier survival estimator (Kaplan & Meier 1958) over
    * right-censored durations — the churn/retention curve done
    * correctly: subjects still active at observation end are CENSORED
    * (they leave the risk set without counting as an event), where the
    * naive "fraction churned by day t" silently treats them as
    * immortal. `S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ)` over distinct event
    * times.
    *
    * Shape: one hash aggregate to per-duration (events, censored)
    * counts, then the [[Quantiles]] probe-and-route discipline on the
    * DISTINCT-duration spine: at or below
    * [[Scale.maxOrderedFrameRows]] the risk-set and survival
    * recursions are sequential single-task windows (bit-exact vs an
    * ordered-SQL oracle — the product is `exp(Σ ln(1−d/n))` with the
    * cumulative sum sequential inside the window); past it — a
    * continuous-valued duration column whose spine is corpus-sized —
    * they ride [[Scale.prefixSum]]/[[Scale.prefixSumD]]'s
    * range-partitioned scans, so no data-sized frame ever serializes
    * through one window task.
    *
    * Returns one row per distinct duration with ≥1 EVENT:
    * `(t, n_risk, n_events, n_censored_at_t, survival)` (survival
    * rounded to 6, non-increasing in t). */
  def kaplanMeier(df: DataFrame, durationCol: String,
      observedCol: String,
      maxSpineRows: Long = Scale.maxOrderedFrameRows): DataFrame = {
    val perT = df.groupBy(col(durationCol).cast("long").as("t"))
      .agg(sum(col(observedCol).cast("long")).as("n_events"),
        sum(lit(1L) - col(observedCol).cast("long")).as("n_censored_at_t"))
      // pin the spine: the probe's count and the routed passes must
      // see one materialization (lazy checkpoint, freed with the result)
      .barrierLazy()
    val total = broadcast(df.agg(count(lit(1)).as("__n")))
    if (perT.count() <= maxSpineRows) {
      val w = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wTot = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perT
        .withColumn("__gone",
          coalesce(sum(col("n_events") + col("n_censored_at_t")).over(w),
            lit(0L)))
        .crossJoin(total)
        .withColumn("n_risk", col("__n") - col("__gone"))
        .withColumn("__f",
          lit(1.0) - col("n_events").cast("double") / col("n_risk"))
        // the terminal step where EVERYONE at risk has the event makes
        // the factor 0 — ln would blow up (DuckDB errors, Spark nulls);
        // survival is exactly 0 from that t on, so flag it instead
        .withColumn("__hitZero",
          max(when(col("__f") === 0.0, 1).otherwise(0)).over(wTot))
        .withColumn("__lnf", when(col("__f") > 0, log(col("__f")))
          .otherwise(lit(0.0)))
        .withColumn("survival", when(col("__hitZero") === 1, lit(0.0))
          .otherwise(round(exp(sum(col("__lnf")).over(wTot)), 6)))
        .filter(col("n_events") > 0)
        .select(col("t"), col("n_risk"), col("n_events"),
          col("n_censored_at_t"), col("survival"))
    } else {
      // distributed route: n_risk from an inclusive long prefix sum
      // (N − cum + own), survival from a double prefix of ln factors.
      // f = 0 (everyone at risk has the event) forces t = max t — no
      // row with a larger duration can exist — so the hitZero prefix
      // max reduces to the row's own factor test.
      val risk = Scale
        .prefixSum(perT.withColumn("__tot",
          col("n_events") + col("n_censored_at_t")), "t", "__tot", "__cum")
        .crossJoin(total)
        .withColumn("n_risk", col("__n") - col("__cum") + col("__tot"))
        .withColumn("__f",
          lit(1.0) - col("n_events").cast("double") / col("n_risk"))
        .withColumn("__lnf", when(col("__f") > 0, log(col("__f")))
          .otherwise(lit(0.0)))
      Scale.prefixSumD(risk, "t", "__lnf", "__lnCum")
        .withColumn("survival", when(col("__f") === 0.0, lit(0.0))
          .otherwise(round(exp(col("__lnCum")), 6)))
        .filter(col("n_events") > 0)
        .select(col("t"), col("n_risk"), col("n_events"),
          col("n_censored_at_t"), col("survival"))
    }
  }

  /** Rolling 7-day distinct actives per day ("WAU by day") — EXACTLY,
    * without a distinct-over-window (which Spark cannot express) or an
    * inequality self-join (which explodes): each distinct (key, day)
    * pair is exploded map-side to the `windowDays` days it contributes
    * to, then ONE distinct aggregate per target day counts it once.
    * Cost: `windowDays ×` the (already day-deduped) pair count — linear,
    * shuffle keyed on day. Days beyond the observed range are clipped
    * by a semi-join against the observed-day set.
    *
    * Returns `(day, active_1d, active_window)`. */
  def rollingDistinctDaily(df: DataFrame, keyCol: String, tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1: $windowDays")
    val pairs = df.select(col(keyCol).as("__k"),
      to_date(col(tsCol)).as("__day")).distinct()
    val observed = pairs.select(col("__day").as("day")).distinct()
    val contrib = pairs.select(col("__k"),
      explode(sequence(lit(0), lit(windowDays - 1))).as("__o"),
      col("__day"))
      .select(col("__k"), expr("date_add(__day, __o)").as("day"))
      .join(observed, Seq("day"), "left_semi")
    val win = contrib.groupBy(col("day"))
      .agg(countDistinct(col("__k")).as("active_window"))
    val one = pairs.groupBy(col("__day").as("day"))
      .agg(count(lit(1)).as("active_1d"))
    one.join(win, "day")
      .select(col("day"), col("active_1d"), col("active_window"))
  }

  /** Longest consecutive-day activity streak per key — the
    * gaps-and-islands classic (day minus dense row number is constant
    * within a run): one distinct day reduction, one keyed window, two
    * keyed aggregates. Returns `(keyCol, n_active_days,
    * longest_streak)`. */
  def longestDailyStreak(df: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val days = df.select(col(keyCol).as("__k"),
      to_date(col(tsCol)).as("__day")).distinct()
    val w = Window.partitionBy(col("__k")).orderBy(col("__day"))
    days.withColumn("__g", date_sub(col("__day"), row_number().over(w)))
      .groupBy(col("__k"), col("__g")).agg(count(lit(1)).as("__len"))
      .groupBy(col("__k"))
      .agg(sum(col("__len")).as("n_active_days"),
        max(col("__len")).as("longest_streak"))
      .withColumnRenamed("__k", keyCol)
  }

  /** Event-time disorder audit — the measurement that TUNES a
    * watermark: per key, compare each event's timestamp with the
    * running maximum over arrival order (`arrivalCols`); an event is
    * LATE when its timestamp is behind that high-water mark, and its
    * lateness in whole seconds is how much watermark delay would have
    * been needed to keep it. Aggregated per `sliceCol`, with the exact
    * interpolated `latenessP` quantile of the late events' lateness —
    * set the watermark at p95/p99 lateness instead of guessing.
    *
    * One keyed WindowExec pass (running max per key — never a global
    * window), one hash aggregate per slice, and [[Quantiles]]'
    * sort-rank pass over only the LATE rows. Lateness is integer
    * microsecond arithmetic floored to seconds — no float timestamps.
    *
    * Returns `(sliceCol, n_events, n_late, late_frac, max_late_s,
    * p<q>_late_s)` (quantile null for slices with no late events). */
  def disorderAudit(df: DataFrame, keyCol: String,
      arrivalCols: Seq[String], tsCol: String, sliceCol: String,
      latenessP: Double = 0.95): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(arrivalCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLate = df
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__hwm", max(col("__us")).over(w))
      // integral `div`, not float division: DuckDB's `//` and Spark's
      // `div` are both exact integer ops — no truncate-vs-round hazard
      .withColumn("__late_s",
        when(col("__hwm").isNotNull && col("__us") < col("__hwm"),
          expr("(__hwm - __us) div 1000000")))
    val perSlice = withLate.groupBy(col(sliceCol)).agg(
      count(lit(1)).as("n_events"),
      count(col("__late_s")).as("n_late"),
      max(col("__late_s")).as("max_late_s"))
    val pCol = s"p${(latenessP * 100).round}"
    val q = Quantiles.exactQuantiles(
      withLate.filter(col("__late_s").isNotNull), Seq(sliceCol),
      "__late_s", Seq(latenessP))
    perSlice.join(q, Seq(sliceCol), "left")
      .select(col(sliceCol), col("n_events"), col("n_late"),
        round(col("n_late").cast("double") / col("n_events"), 6)
          .as("late_frac"),
        col("max_late_s"),
        round(col(pCol), 6).as(s"${pCol}_late_s"))
  }

  /** Hampel outlier filter (Pearson et al. 2016): per row, the exact
    * median and MAD of the centered ±`half` window around it; a row is
    * an outlier when `|v − med| > nSigma · 1.4826 · MAD` (1.4826 scales
    * MAD to σ under normality). The robust despiking standard — a
    * rolling MEAN test lets one spike inflate its own threshold;
    * medians don't care.
    *
    * Spark shape: ONE keyed WindowExec pass `collect_list`s each
    * centered frame (frame order follows the window's (order, tie)
    * sort — deterministic), then median and MAD are pure map-side
    * array arithmetic over the ≤ (2·half+1)-element frames: sort,
    * interpolate middle, transform to |v−med|, sort again. No second
    * shuffle, no self-join; per-row cost O(w log w) for tiny w.
    * Returns the input plus `(med, mad, is_outlier)`, med/mad rounded
    * to 6. Even-length frames use the interpolated (mean-of-middles)
    * median, matching `quantile_cont(0.5)`. */
  def hampelFilter(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, half: Int = 3, nSigma: Double = 3.0): DataFrame = {
    require(half >= 1, s"half must be >= 1: $half")
    require(nSigma > 0, s"nSigma must be > 0: $nSigma")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
      .rowsBetween(-half, half)
    def medOf(arr: Column): Column = {
      val s = array_sort(arr)
      val n = size(s)
      // odd: middle; even: mean of the two middles (quantile_cont form)
      val mid = ((n + 1) / 2).cast("int")
      val lo = (n / 2).cast("int")
      when(n % 2 === 1, element_at(s, mid))
        .otherwise((element_at(s, lo) + element_at(s, lo + 1)) / 2.0)
    }
    val v = col(valueCol).cast("double")
    val withArr = df.withColumn("__w", collect_list(v).over(w))
    val med = medOf(col("__w"))
    val withMed = withArr.withColumn("__med", med)
    val mad = medOf(transform(col("__w"),
      x => abs(x - col("__med"))))
    withMed.withColumn("__mad", mad)
      .withColumn("is_outlier",
        abs(v - col("__med")) > lit(nSigma * 1.4826) * col("__mad"))
      .withColumn("med", round(col("__med"), 6))
      .withColumn("mad", round(col("__mad"), 6))
      .drop("__w", "__med", "__mad")
  }

  /** Per-key per-period OHLC resampling: open/high/low/close of
    * `valueCol` within each `date_trunc(unit)` bucket — the downsampling
    * step that turns an irregular event stream into a fixed-frequency
    * series. Open/close are `min_by`/`max_by` over the (ts, tie) struct:
    * deterministic under ties and retries, where a bare first/last
    * would depend on partition order. One keyed hash aggregate, no
    * window, no sort. Returns
    * `(key, period, open, high, low, close, n)`. */
  def resampleOhlc(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, unit: String = "week"): DataFrame = {
    val ord = struct(col(tsCol), col(tieCol))
    val v = col(valueCol).cast("double")
    df.groupBy(col(keyCol).as("key"),
        date_trunc(unit, col(tsCol)).as("period"))
      .agg(min_by(v, ord).as("open"), max(v).as("high"), min(v).as("low"),
        max_by(v, ord).as("close"), count(lit(1)).as("n"))
  }

  /** Per-key time-weighted average (TWAP): each value holds from its
    * timestamp until the key's next event; the average weights values
    * by that holding duration — the fair summary of an irregularly
    * sampled series (a plain mean over-counts burst periods). The last
    * event has no duration and contributes only to `n_events`; keys
    * with a single event have no defined TWAP and are dropped.
    * Durations are integer microseconds (exact); one keyed window +
    * one aggregate. Returns `(key, n_events, span_seconds, twap)`. */
  def twapPerKey(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("__us"))
    df.select(col(keyCol).as("key"), unix_micros(col(tsCol)).as("__us"),
        col(valueCol).cast("double").as("__v"))
      .withColumn("__dur", lead(col("__us"), 1).over(w) - col("__us"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_events"),
        (sum(col("__dur")).cast("double") / 1e6).as("span_seconds"),
        round(sum(col("__v") * col("__dur")) /
          sum(col("__dur")), 6).as("twap"))
      .filter(col("n_events") >= 2)
  }

  /** Merge each key's overlapping `[start, end]` date intervals
    * (inclusive; sharing at least one day — merely adjacent intervals
    * stay separate) into maximal islands: the gaps-and-islands pass
    * behind coverage/uptime/exposure accounting. Returns
    * `(key, island_start, island_end, n_intervals)`.
    *
    * One keyed shuffle + one WindowExec pass: an island opens where the
    * start exceeds the running max of all PRECEDING ends (frame ends at
    * -1 row, so the current interval never masks its own gap), and the
    * running count of opens numbers the islands. Rows tying on
    * `(start, end)` are interchangeable for island assignment, so the
    * order — and the output — is deterministic without a tie column. */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val byStart = Window.partitionBy(col("key"))
      .orderBy(col("__s"), col("__e"))
    val prevMax = max(col("__e"))
      .over(byStart.rowsBetween(Window.unboundedPreceding, -1))
    df.select(col(keyCol).as("key"), col(startCol).as("__s"),
        col(endCol).as("__e"))
      .withColumn("__open",
        when(prevMax.isNull || col("__s") > prevMax, 1).otherwise(0))
      .withColumn("__island", sum(col("__open")).over(
        byStart.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("key"), col("__island"))
      .agg(min(col("__s")).as("island_start"),
        max(col("__e")).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .drop("__island")
  }

  /** All pairs of SAME-KEY intervals `[start, end]` (dates, inclusive)
    * that overlap, with the overlap length in days. Returns
    * `(key, a_id, b_id, a_start, b_start, overlap_days)` with
    * `a_id < b_id` so each unordered pair appears once.
    *
    * Spark shape: one hash equi-join on the key plus a residual
    * overlap predicate — never an inequality-only join (a nested loop
    * at scale). Cost is Σ per-key C(n,2), bounded whenever the key
    * bounds its interval count (orders per customer, sessions per
    * user). For keyLESS interval overlap, bucket by coarse time bin
    * first ([[explodeMonthBins]]) and dedup pairs — same rewrite,
    * calendar as the synthetic key. */
  def overlappingIntervals(df: DataFrame, keyCol: String, idCol: String,
      startCol: String, endCol: String): DataFrame = {
    val a = df.select(col(keyCol).as("key"), col(idCol).as("a_id"),
      col(startCol).as("__as"), col(endCol).as("__ae"))
    val b = df.select(col(keyCol).as("key"), col(idCol).as("b_id"),
      col(startCol).as("__bs"), col(endCol).as("__be"))
    a.join(b, "key")
      .filter(col("a_id") < col("b_id") &&
        col("__as") <= col("__be") && col("__bs") <= col("__ae"))
      .select(col("key"), col("a_id"), col("b_id"),
        col("__as").as("a_start"), col("__bs").as("b_start"),
        (datediff(least(col("__ae"), col("__be")),
          greatest(col("__as"), col("__bs"))) + 1).as("overlap_days"))
  }

  /** Per-key daily series with LINEAR interpolation across the missing
    * days — the gap repair that [[gapFillDaily]]'s step fill is too
    * blunt for (a 10-day hole between 100 and 200 should read 110, 120,
    * … not ten 100s). Observed days keep their exact aggregated value;
    * a missing day `d` between bracketing observations (d₀,v₀), (d₁,v₁)
    * reads v₀ + (v₁−v₀)·(d−d₀)/(d₁−d₀).
    *
    * Spark shape: daily reduce is a decimal-exact hash aggregate; the
    * calendar is a span-bounded `sequence` explode per key (map-side,
    * no calendar join); bracketing observations come from two
    * `last/first(ignoreNulls)` running windows that SHARE one hash
    * partitioning on the key with the explode — so the whole operator
    * is two keyed shuffles, per-key cost ∝ span days, keys never
    * interact. The interpolation itself is scalar double math on two
    * decimal-exact endpoints, rounded — deterministic under any
    * partitioning. Rows outside the observed span don't exist (the
    * calendar spans min..max observed day), so both brackets are
    * always defined on interpolated rows. */
  /** Rolling OLS slope per key: over each trailing `n`-row window
    * (ordered by the integer `xCol`), the least-squares slope of
    * `valueCol` against `xCol` — the "is this series locally rising"
    * feature that a global [[trendPerKey]] fit smears out.
    *
    * Determinism: the closed form (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) is
    * evaluated ENTIRELY in integer arithmetic — x stays a long, the
    * value becomes integer cents — so every windowed sum is exact and
    * partitioning-independent; the single double division happens on
    * two exact longs, then rounds. Windows shorter than 2 rows or with
    * a degenerate x spread yield NULL. One keyed shuffle: all window
    * frames share the hash partitioning on `keyCol`. */
  def rollingSlope(df: DataFrame, keyCol: String, xCol: String,
      valueCol: String, n: Int): DataFrame = {
    require(n >= 2, s"n must be >= 2: $n")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__x"))
      .rowsBetween(-(n - 1), Window.currentRow)
    val x = col(xCol).cast("long")
    val yc = (col(valueCol).cast("decimal(18,2)") * 100).cast("long")
    df.select(col(keyCol), x.as("__x"), yc.as("__yc"))
      .withColumn("__cnt", count(lit(1)).over(w))
      .withColumn("__sx", sum(col("__x")).over(w))
      .withColumn("__sy", sum(col("__yc")).over(w))
      .withColumn("__sxy", sum(col("__x") * col("__yc")).over(w))
      .withColumn("__sxx", sum(col("__x") * col("__x")).over(w))
      .select(col(keyCol), col("__x").as(xCol), col("__cnt").as("n_window"),
        // UNROUNDED (the q405 discipline): every moment is an exact
        // long, so both engines compute the identical IEEE double with
        // the same two divisions — emitting it raw hash-matches, while
        // round(·, 6) resolved an exact ten-millionth-half slope
        // differently per engine (found at sf0.1: 8.2290625 → .063
        // Spark vs .062 DuckDB)
        when(col("__cnt") < 2 ||
            col("__cnt") * col("__sxx") === col("__sx") * col("__sx"),
          lit(null))
          .otherwise(
            (col("__cnt") * col("__sxy") - col("__sx") * col("__sy"))
              .cast("double")
              / (col("__cnt") * col("__sxx") - col("__sx") * col("__sx"))
                .cast("double") / 100.0)
          .as("slope"))
  }

  def interpolateDaily(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = df
      .select(col(keyCol).as("__k"), to_date(col(tsCol)).as("__day"),
        col(valueCol).cast("decimal(18,2)").as("__v"))
      .groupBy(col("__k"), col("__day"))
      .agg(sum(col("__v")).cast("decimal(18,2)").as("__v"))
    val cal = daily.groupBy(col("__k"))
      .agg(min(col("__day")).as("__lo"), max(col("__day")).as("__hi"))
      .select(col("__k"), explode(sequence(col("__lo"), col("__hi"),
        expr("interval 1 day"))).as("__day"))
    val wPrev = Window.partitionBy(col("__k")).orderBy(col("__day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("__k")).orderBy(col("__day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val joined = cal.join(daily, Seq("__k", "__day"), "left")
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(wPrev))
      .withColumn("__pd", last(when(col("__v").isNotNull, col("__day")),
        ignoreNulls = true).over(wPrev))
      .withColumn("__nv", first(col("__v"), ignoreNulls = true).over(wNext))
      .withColumn("__nd", first(when(col("__v").isNotNull, col("__day")),
        ignoreNulls = true).over(wNext))
    joined.select(col("__k").as(keyCol), col("__day").as("day"),
      col("__v").isNotNull.as("observed"),
      round(when(col("__v").isNotNull, col("__v").cast("double"))
        .otherwise(col("__pv").cast("double")
          + (col("__nv") - col("__pv")).cast("double")
            * datediff(col("__day"), col("__pd")).cast("double")
            / datediff(col("__nd"), col("__pd")).cast("double")),
        6).as("value"))
  }

  /** Cross-correlation function per `keyCol`: Pearson correlation between
    * `xCol` at time t and `yCol` at time t+k for every lead/lag
    * k ∈ −maxLag..maxLag — which side LEADS, and by how much
    * ([[acf]]'s two-series sibling; Granger's q405 F-test says "x-lag
    * helps", the CCF profile says WHERE the alignment peaks).
    *
    * Exactness: pairs come off one lead-window pass over the
    * pre-aggregated per-key series (bounded rows per key — the
    * bounded-series window shape) exploded over the 2·maxLag+1 lags;
    * all five moments per (key, lag) are exact (longs + DECIMAL(38,0)
    * products — pass integer cents/counts), and the one double formula
    * runs per (key, lag) row. Degenerate lags (either side constant)
    * are dropped explicitly.
    *
    * Returns `(keyCol, lag, n_pairs, ccf)`. */
  def ccf(df: DataFrame, keyCol: String, orderCol: String,
      xCol: String, yCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1: $maxLag")
    val w = Window.partitionBy(col("__k")).orderBy(col("__i"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val pairs = df
      .select(col(keyCol).as("__k"), col(orderCol).as("__i"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .select(col("__k"), col("__x"),
        array((-maxLag to maxLag).map(k =>
          struct(lit(k).as("lag"), lead(col("__y"), k).over(w).as("y"))): _*)
          .as("__ls"))
      .select(col("__k"), col("__x"), explode(col("__ls")).as("__p"))
      .filter(col("__p.y").isNotNull)
      .select(col("__k"), col("__p.lag").as("lag"), col("__x"),
        col("__p.y").as("__yy"))
    val m = pairs.groupBy(col("__k"), col("lag")).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("__x")).as("__sx"), sum(col("__yy")).as("__sy"),
      sum(dec(col("__x")) * col("__yy")).as("__sxy"),
      sum(dec(col("__x")) * col("__x")).as("__sxx"),
      sum(dec(col("__yy")) * col("__yy")).as("__syy"))
    def d(c: String) = col(c).cast("double")
    val nD = col("n_pairs").cast("double")
    val cov = nD * d("__sxy") - d("__sx") * d("__sy")
    val vx = nD * d("__sxx") - d("__sx") * d("__sx")
    val vy = nD * d("__syy") - d("__sy") * d("__sy")
    m.filter(col("n_pairs") >= 2 && vx > 0 && vy > 0)
      .select(col("__k").as(keyCol), col("lag").cast("long").as("lag"),
        col("n_pairs"), round(cov / sqrt(vx * vy), 6).as("ccf"))
  }

  /** Low-frequency periodogram per `keyCol`: spectral power of the
    * ordered (orderCol, valueCol) series at whole-series frequencies
    * k = 1..maxFreq —
    *
    *   P(k) = (C²ₖ + S²ₖ)/n,  Cₖ = Σₜ v′ₜ·cos(2πkt/n),  Sₖ = Σ v′ₜ·sin(·)
    *
    * with v′ₜ = (vₜ − v̄)·valueScale (mean-centered so P(0) mass doesn't
    * leak; scaled so powers stay O(1) and round(·,6) is exact on both
    * engines — the q405 huge-round lesson).
    *
    * Determinism: the trig sums run as ONE SEQUENTIAL FOLD per (key,
    * frequency) over the day-sorted bounded array — fixed order both
    * engines replay (`aggregate` here, seeded `list_reduce` in SQL); the
    * 2π literal is spelled as the same decimal in both so the cos/sin
    * arguments are bit-identical. (cos/sin themselves are the platform
    * libm's ≤1-ulp implementations — the same exposure class as the
    * suite's exp/ln usage, absorbed by the single terminal rounding.)
    *
    * Input contract: pre-aggregated bounded series per key; t is the
    * 0-based day index within the sorted series.
    *
    * Returns `(keyCol, k, n, power)`. */
  def periodogram(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, maxFreq: Int, valueScale: Double): DataFrame = {
    require(maxFreq >= 1, s"maxFreq must be >= 1: $maxFreq")
    val g = df
      .select(col(keyCol).as("__k"), col(orderCol).as("__i"),
        col(valueCol).cast("long").as("__v"))
      .groupBy(col("__k")).agg(
        count(lit(1)).as("n"), sum(col("__v")).as("__sv"),
        transform(array_sort(collect_list(struct(col("__i").as("__o"),
          col("__v").as("__val")))), p => p("__val").cast("double"))
          .as("__vs"))
      .filter(col("n") > 1)
      .withColumn("__mu", col("__sv").cast("double") / col("n").cast("double"))
      .withColumn("__kf", explode(array((1 to maxFreq).map(lit): _*)))
      .barrierLazy() // __mu/__kf must not re-inline per fold step
    val nD = col("n").cast("double")
    val ang = lit(6.283185307179586) * col("__kf").cast("double")
    val fold = aggregate(col("__vs"),
      array(lit(0.0), lit(0.0), lit(0.0)),
      (acc, v) => array(
        element_at(acc, 1) + (v - col("__mu")) * valueScale
          * cos(ang * element_at(acc, 3) / nD),
        element_at(acc, 2) + (v - col("__mu")) * valueScale
          * sin(ang * element_at(acc, 3) / nD),
        element_at(acc, 3) + 1.0))
    g.withColumn("__f", fold)
      .withColumn("__c", element_at(col("__f"), 1))
      .withColumn("__s", element_at(col("__f"), 2))
      .select(col("__k").as(keyCol), col("__kf").cast("long").as("k"),
        col("n"),
        round((col("__c") * col("__c") + col("__s") * col("__s")) / nD, 6)
          .as("power"))
  }

  /** Engle–Granger two-step cointegration test per `keyCol`: do the two
    * integrated series `yCol` and `xCol` share a long-run equilibrium?
    * Step 1 fits yₜ = α + β·xₜ by OLS (closed form from exact moments);
    * step 2 runs the Dickey–Fuller regression Δeₜ = γ·eₜ₋₁ on the
    * residuals and reports its t-statistic (compare against the
    * Engle–Granger critical values, ≈ −3.34 at 5%; no intercept, the
    * residuals are mean-zero by construction).
    *
    * Determinism: the OLS moments are exact (longs + DECIMAL(38,0) —
    * pass integer cents); the residual reductions Σe²ₜ₋₁, Σeₜ₋₁Δeₜ and
    * the SSR are floating-point but run as TWO SEQUENTIAL FOLDS over the
    * day-sorted residual array — a fixed order both engines replay
    * verbatim (`aggregate` here, seeded `list_reduce` in SQL), never an
    * unordered data-sized float sum.
    *
    * Input contract: one row per (key, order) — the pre-aggregated,
    * calendar-bounded series per key, so the per-key array is bounded.
    * Groups with n ≤ 3, a constant regressor, or degenerate residuals
    * are dropped explicitly.
    *
    * Returns `(keyCol, n, beta, alpha, gamma, adf_t)`. */
  def engleGranger(df: DataFrame, keyCol: String, orderCol: String,
      yCol: String, xCol: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val y = col(yCol).cast("long"); val x = col(xCol).cast("long")
    val g = df
      .select(col(keyCol).as("__k"), col(orderCol).as("__i"),
        y.as("__y"), x.as("__x"))
      .groupBy(col("__k")).agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(dec(col("__x")) * col("__x")).as("__sxx"),
        sum(dec(col("__x")) * col("__y")).as("__sxy"),
        array_sort(collect_list(struct(col("__i"), col("__y"), col("__x"))))
          .as("__lst"))
    def d(c: String) = col(c).cast("double")
    val nD = col("n").cast("double")
    val denom = nD * d("__sxx") - d("__sx") * d("__sx")
    val beta = (nD * d("__sxy") - d("__sx") * d("__sy")) / denom
    val alpha = (d("__sy") - beta * d("__sx")) / nD
    val fitted = g
      .filter(col("n") > 3 && denom =!= 0.0)
      .withColumn("__b", beta).withColumn("__a", alpha)
      .withColumn("__es", transform(col("__lst"), p =>
        p("__y").cast("double") - col("__a")
          - col("__b") * p("__x").cast("double")))
    // fold 1: s11 = Σ e²ₜ₋₁, s12 = Σ eₜ₋₁(eₜ − eₜ₋₁); state
    // [s11, s12, prev, seen] — float step shape mirrored by the oracle
    val f1 = aggregate(col("__es"),
      array(lit(0.0), lit(0.0), lit(0.0), lit(0.0)),
      (acc, e) => when(element_at(acc, 4) === 0.0,
        array(element_at(acc, 1), element_at(acc, 2), e, lit(1.0)))
        .otherwise(array(
          element_at(acc, 1) + element_at(acc, 3) * element_at(acc, 3),
          element_at(acc, 2)
            + element_at(acc, 3) * (e - element_at(acc, 3)),
          e, lit(1.0))))
    // materialization barrier: without it Catalyst collapses the
    // projections and fold 2's per-step reference to __g re-inlines the
    // ENTIRE fold-1 expression — one O(series) fold per DP step turns
    // the operator quadratic in the series length (405 s at sf0.01).
    // The checkpoint is |groups| rows, each one bounded array.
    val staged = fitted.withColumn("__f1", f1)
      .withColumn("__s11", element_at(col("__f1"), 1))
      .withColumn("__s12", element_at(col("__f1"), 2))
      .filter(col("__s11") > 0.0)
      .withColumn("__g", col("__s12") / col("__s11"))
      .barrierLazy()
    // fold 2: SSR of the DF regression; state [ssr, prev, seen]
    val f2 = aggregate(col("__es"),
      array(lit(0.0), lit(0.0), lit(0.0)),
      (acc, e) => when(element_at(acc, 3) === 0.0,
        array(element_at(acc, 1), e, lit(1.0)))
        .otherwise(array(
          element_at(acc, 1)
            + (e - element_at(acc, 2) - col("__g") * element_at(acc, 2))
              * (e - element_at(acc, 2) - col("__g") * element_at(acc, 2)),
          e, lit(1.0))))
    val nPairs = (col("n") - 1).cast("double")
    staged.withColumn("__ssr", element_at(f2, 1))
      .filter(col("__ssr") > 0.0 && col("n") > 3)
      .select(col("__k").as(keyCol), col("n"),
        round(col("__b"), 6).as("beta"), round(col("__a"), 6).as("alpha"),
        round(col("__g"), 6).as("gamma"),
        round(col("__g") / sqrt((col("__ssr") / (nPairs - 1.0))
          / col("__s11")), 6).as("adf_t"))
  }

  /** Dynamic-time-warping distance per `keyCol` between each key's
    * ordered series and ONE broadcast reference series — the alignment
    * distance Euclidean point-wise comparison can't see (shifted or
    * locally stretched trajectories still match).
    *
    * Full DP over the (n×m) grid as one nested fold: the outer
    * `aggregate` walks the key's day-sorted values carrying the previous
    * DP row (m+1 doubles); the inner fold builds the new row left to
    * right (dp[i][j] = min(dp[i−1][j−1], dp[i−1][j], dp[i][j−1]) +
    * |sᵢ − rⱼ|), with a large-sentinel boundary (1e300) instead of ∞ so
    * both engines stay in plain double arithmetic. With integer-valued
    * inputs (cents) every DP cell is exactly integral below 2⁵³, so the
    * distance is deterministic under any partitioning and is returned
    * as BIGINT; `dtw_norm` = dtw/(n+m) is the one float division.
    *
    * Scale shape: the reference is ONE bounded array row broadcast to
    * every group; per-group cost is the n·m fold over a calendar-bounded
    * array — groups never interact and distribute freely. Keys with
    * empty series produce no row; an empty reference yields none.
    *
    * Returns `(keyCol, n, m, dtw_cents, dtw_norm)`. */
  def dtwDistance(series: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, ref: DataFrame, refOrderCol: String,
      refValueCol: String): DataFrame = {
    val big = lit(1e300)
    val s = series.groupBy(col(keyCol)).agg(
      transform(array_sort(collect_list(struct(col(orderCol).as("__o"),
        col(valueCol).cast("long").as("__v")))), p =>
        p("__v").cast("double")).as("__s"))
    val r = ref.agg(
      transform(array_sort(collect_list(struct(col(refOrderCol).as("__o"),
        col(refValueCol).cast("long").as("__v")))), p =>
        p("__v").cast("double")).as("__r"))
    val withRef = s.join(broadcast(r))
      .filter(size(col("__s")) > 0 && size(col("__r")) > 0)
    val initRow = concat(array(lit(0.0)),
      transform(col("__r"), _ => big))
    val dp = aggregate(col("__s"), initRow,
      (prev, si) => aggregate(
        sequence(lit(1), size(col("__r"))),
        array(big),
        (rw, j) => concat(rw, array(
          least(element_at(prev, j.cast("int")),
            element_at(prev, (j + 1).cast("int")),
            element_at(rw, j.cast("int")))
            + abs(si - element_at(col("__r"), j.cast("int")))))))
    withRef.withColumn("__dp", dp)
      .withColumn("__dtw", element_at(col("__dp"), size(col("__r")) + 1))
      .filter(col("__dtw") < big)
      .select(col(keyCol), size(col("__s")).cast("long").as("n"),
        size(col("__r")).cast("long").as("m"),
        col("__dtw").cast("long").as("dtw_cents"),
        (col("__dtw") / (size(col("__s")) + size(col("__r")))
          .cast("double")).as("dtw_norm"))
  }
}
