package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline evaluation metrics — the read-outs a retrieval / ranking /
  * classification pipeline computes over its own outputs before a model
  * or index ships. All metrics are exact and per-group, so every window
  * below is PARTITIONED (never a global ordering): groups distribute
  * freely across executors and each group's state is its own row set.
  */
object Metrics {

  /** Per-query ranking metrics over a retrieval run: NDCG@k (graded,
    * Järvelin & Kekäläinen 2002), MRR, precision@k and the relevant
    * count. `runs` holds one row per (query, candidate) with a score
    * and a graded relevance; ties on score break by `docCol` so ranks
    * are deterministic under any partitioning.
    *
    * DCG uses the classic rel/log2(rank+1) form; IDCG re-ranks the
    * same candidates by relevance, so NDCG needs two sorts — but both
    * windows share the one hash partitioning on `queryCol`, so the
    * whole computation is ONE shuffle followed by two in-partition
    * sorts and a partial-aggregated reduce. Queries with no relevant
    * candidate get ndcg = mrr = precision = 0 (not dropped: a
    * retrieval eval must show the misses). */
  def rankingMetrics(runs: DataFrame, queryCol: String, docCol: String,
      scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val q = col(queryCol)
    val rel = col(relCol).cast("double")
    val byScore = Window.partitionBy(q).orderBy(col(scoreCol).desc, col(docCol))
    val byRel = Window.partitionBy(q).orderBy(rel.desc, col(docCol))
    val ranked = runs
      .withColumn("__r", row_number().over(byScore))
      .withColumn("__ir", row_number().over(byRel))
    val dcgAt = (rank: String) =>
      sum(when(col(rank) <= k, rel / log2(col(rank) + 1)).otherwise(0.0))
    ranked.groupBy(q)
      .agg(
        sum(when(rel > 0, 1L).otherwise(0L)).as("n_rel"),
        round(coalesce(
          max(when(rel > 0, lit(1.0) / col("__r"))), lit(0.0)), 6).as("mrr"),
        round(sum(when(col("__r") <= k && rel > 0, 1L).otherwise(0L))
          / lit(k.toDouble), 6).as("precision_k"),
        round(when(dcgAt("__ir") > 0, dcgAt("__r") / dcgAt("__ir"))
          .otherwise(0.0), 6).as("ndcg_k"))
  }

  /** Per-group exact ROC AUC via the Mann–Whitney rank-sum identity:
    * AUC = (Σ ranks of positives − n⁺(n⁺+1)/2) / (n⁺·n⁻), with tied
    * scores taking the average rank (so a tie between a positive and a
    * negative counts 1/2, the ROC convention). `labelCol` must be
    * 0/1.
    *
    * The rank window and the tie-count window are both partitioned by
    * `groupCol`, so AUC over G groups is one shuffle + one in-partition
    * sort — no global ordering, no driver collect; a group's cost is
    * |group| log |group| locally. Groups missing a class are dropped
    * (AUC undefined). Rows with a NULL score are excluded up front —
    * rank() would otherwise sort them first, silently treating missing
    * scores as the most-negative prediction. */
  def aucByGroup(df: DataFrame, groupCol: String, labelCol: String,
      scoreCol: String): DataFrame = {
    val g = col(groupCol)
    val y = col(labelCol).cast("int")
    val sc = col(scoreCol)
    // rank() gives tied scores the run-start rank; adding (ties-1)/2
    // turns it into the average rank without a second sort
    val r = rank().over(Window.partitionBy(g).orderBy(sc))
    val ties = count(lit(1)).over(Window.partitionBy(g, sc))
    val ranked = df
      .filter(sc.isNotNull)
      .withColumn("__ar", r + (ties - 1) / 2.0)
      .groupBy(g)
      .agg(sum(when(y === 1, 1L).otherwise(0L)).as("n_pos"),
        sum(when(y === 0, 1L).otherwise(0L)).as("n_neg"),
        sum(when(y === 1, col("__ar"))).as("__rs"))
    ranked
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
      .select(g, col("n_pos"), col("n_neg"),
        round((col("__rs") - col("n_pos") * (col("n_pos") + 1) / 2.0)
          / (col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** Per-class classification report from (truth, prediction) pairs:
    * support, true/false positives, false negatives, precision, recall
    * and F1 for every class observed in either column (one-vs-rest).
    *
    * Two |classes|-sized aggregates (per-truth and per-prediction
    * marginals) joined full-outer so a class that is only ever
    * predicted — or never predicted — still gets a row with the zeros
    * made explicit. The corpus shuffles once for the (truth, pred)
    * cells; everything downstream is |classes|²-at-worst and
    * broadcastable. Classes absent from predictions get precision 0,
    * classes absent from truth get recall 0 (scikit-learn's
    * zero_division=0 convention). */
  def classificationReport(df: DataFrame, truthCol: String,
      predCol: String): DataFrame = {
    val cells = df.groupBy(col(truthCol).as("__t"), col(predCol).as("__p"))
      .agg(count(lit(1)).as("__n"))
    val tp = when(col("__t") === col("__p"), col("__n")).otherwise(0L)
    val byTruth = cells.groupBy(col("__t").as("klass"))
      .agg(sum(col("__n")).as("support"), sum(tp).as("__tp_t"))
    val byPred = cells.groupBy(col("__p").as("klass"))
      .agg(sum(col("__n")).as("__pred_n"), sum(tp).as("__tp_p"))
    val j = byTruth.join(byPred, Seq("klass"), "full_outer")
      .select(col("klass"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("__tp_t"), col("__tp_p"), lit(0L)).as("tp"),
        (coalesce(col("__pred_n"), lit(0L))
          - coalesce(col("__tp_p"), lit(0L))).as("fp"),
        (coalesce(col("support"), lit(0L))
          - coalesce(col("__tp_t"), lit(0L))).as("fn"))
    val prec = when(col("tp") + col("fp") > 0,
      col("tp") / (col("tp") + col("fp"))).otherwise(0.0)
    val rec = when(col("support") > 0, col("tp") / col("support"))
      .otherwise(0.0)
    j.select(col("klass"), col("support"), col("tp"), col("fp"), col("fn"),
      round(prec, 6).as("precision"), round(rec, 6).as("recall"),
      round(when(prec + rec > 0, lit(2.0) * prec * rec / (prec + rec))
        .otherwise(0.0), 6).as("f1"))
  }

  /** Per-group regression error metrics against a prediction column:
    * RMSE, MAE and R² (1 − SS_res/SS_tot, the coefficient of
    * determination — negative when the predictor underperforms the
    * group mean). One hash aggregate; every term is an algebraic sum,
    * so partial aggregation collapses the data map-side and the R²
    * variance term comes from var_pop — Spark's Welford-style merging
    * aggregate — scaled by n, so a large-mean low-variance target
    * cannot cancel catastrophically (sum(y²)−sum(y)²/n can go negative
    * there and silently drop the group). Groups with zero target
    * variance are dropped (R² undefined). */
  def regressionMetrics(df: DataFrame, groupCol: String, yCol: String,
      predCol: String): DataFrame = {
    val y = col(yCol).cast("double")
    val p = col(predCol).cast("double")
    val e = y - p
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sqrt(avg(e * e)).as("__rmse"), avg(abs(e)).as("__mae"),
        sum(e * e).as("__ssr"),
        (var_pop(y) * count(lit(1))).as("__sst"))
      .filter(col("__sst") > 0)
      .select(col(groupCol), col("n"),
        round(col("__rmse"), 6).as("rmse"), round(col("__mae"), 6).as("mae"),
        round(lit(1.0) - col("__ssr") / col("__sst"), 6).as("r2"))
  }

  /** Reliability-diagram bins for a probabilistic classifier: scores
    * in [0,1] cut into `bins` equal-width bins, each reporting its
    * count, mean predicted probability and observed positive fraction
    * — the gap between the last two IS the calibration error (ECE's
    * per-bin term, Naeini et al. 2015). Scores exactly at 1.0 fold
    * into the top bin; out-of-range scores clamp into the edge bins
    * (a probability outside [0,1] is an upstream bug, but it must not
    * mint a nonsense negative bin id). One map-side bin assignment +
    * one hash aggregate over ≤ `bins` groups; empty bins are absent
    * (their ECE weight is zero). */
  def calibrationBins(df: DataFrame, labelCol: String, scoreCol: String,
      bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1: $bins")
    val sc = col(scoreCol).cast("double")
    val bin = greatest(lit(0), least(floor(sc * bins).cast("int"), lit(bins - 1)))
    df.withColumn("__bin", bin)
      .groupBy(col("__bin").as("bin"))
      .agg(count(lit(1)).as("n"),
        round(avg(sc), 6).as("mean_score"),
        round(avg(col(labelCol).cast("double")), 6).as("frac_pos"))
  }

  /** One-vs-rest chi-squared association between document tokens and a
    * document label — the classic feature-selection score (Yang &
    * Pedersen 1997): for each observed (token, label) cell, the 2×2
    * contingency chi² = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) where a =
    * docs with token and label, b = token without label, c = label
    * without token, d = neither. Presence is per-doc (tokens counted
    * once per document).
    *
    * One corpus explode feeds both the (token, label) cells and the
    * token document frequencies; label totals and the corpus size are
    * label-cardinality- and one-row aggregates. The only corpus-sized
    * shuffle is the cell aggregation; the three stat joins are
    * vocab- or label-sized, so AQE broadcasts them. `minDf` prunes the
    * long tail before the joins; tokens present in EVERY document and
    * labels covering every document are dropped — their 2×2 table has
    * a zero margin, so chi² is undefined (and the feature carries no
    * signal anyway). */
  def chiSquareTokens(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, minDf: Long): DataFrame = {
    val toks = docs.select(col(idCol), col(labelCol).as("label"),
      explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("token"))
    val cells = toks.groupBy(col("token"), col("label"))
      .agg(count(lit(1)).as("a"))
    val tokTot = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("tok_df"))
      .filter(col("tok_df") >= minDf)
    val labTot = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("lab_n"))
    val n = docs.agg(count(lit(1)).as("n"))
    val bb = col("tok_df") - col("a")
    val cc = col("lab_n") - col("a")
    val dd = col("n") - col("tok_df") - cc
    cells
      .join(tokTot, "token")
      .join(labTot, "label")
      .crossJoin(broadcast(n))
      .filter(col("tok_df") < col("n") && col("lab_n") < col("n"))
      .select(col("token"), col("label"), col("a").as("n_with"),
        col("tok_df"),
        round(col("n") * pow(col("a") * dd - bb * cc, 2)
          / (col("tok_df") * (col("n") - col("tok_df"))
             * col("lab_n") * (col("n") - col("lab_n"))), 6).as("chi2"))
  }

  /** Decile (or `buckets`-ile) lift/gains table for a binary-response
    * scorer: rows ranked by `(score desc, tie asc)`, split into
    * equal-count buckets, per bucket the response rate plus the
    * CUMULATIVE capture rate and lift — the campaign-targeting /
    * threshold-picking read-out.
    *
    * Scale shape: the global rank comes from [[graft.operators.Scale.prefixSum]]'s
    * range-partition + per-partition window (NO single-partition global
    * window over the data); bucket ids are integer arithmetic
    * `((rank-1)·buckets) div n` — exact, reproducible, and remainder
    * rows spread deterministically. Only the final `buckets`-row frame
    * sees an unpartitioned window (bounded metadata). `tieCol` must be
    * unique so the rank — and with it every bucket boundary — is a
    * total order. `labelCol` must be 0/1.
    *
    * Returns `(bucket, n_rows, n_pos, response_rate, cum_capture,
    * cum_lift)`, rates rounded to 6 places. */
  def liftTable(df: DataFrame, scoreCol: String, labelCol: String,
      tieCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val n = df.count()
    require(n >= buckets, s"need >= $buckets rows, got $n")
    val ranked = Scale.prefixSum(
      df.select(col(scoreCol).as("__score"),
          col(labelCol).cast("long").as("__y"), col(tieCol).as("__tie"))
        .withColumn("__ord", struct((-col("__score")).as("s"),
          col("__tie").as("t")))
        .withColumn("__one", lit(1)),
      "__ord", "__one", "__rn")
    // `div` keeps the bucket id integer-exact at any n (long/long `/`
    // would detour through double)
    val perBucket = ranked
      .withColumn("bucket",
        expr(s"((__rn - 1) * $buckets) div ${n}L") + 1)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__y")).as("n_pos"))
    // the remaining windows run over exactly `buckets` rows — metadata
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perBucket
      .withColumn("__cum_pos", sum(col("n_pos")).over(w))
      .withColumn("__cum_n", sum(col("n_rows")).over(w))
      .withColumn("__tot_pos", sum(col("n_pos")).over(wAll))
      .withColumn("__tot_n", sum(col("n_rows")).over(wAll))
      .select(col("bucket"), col("n_rows"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n_rows"), 6)
          .as("response_rate"),
        round(col("__cum_pos").cast("double") / col("__tot_pos"), 6)
          .as("cum_capture"),
        round((col("__cum_pos").cast("double") / col("__cum_n"))
          / (col("__tot_pos").cast("double") / col("__tot_n")), 6)
          .as("cum_lift"))
  }

  /** Isotonic calibration via pool-adjacent-violators (Ayer et al.
    * 1955; the calibration step behind isotonic-calibrated
    * classifiers): observed positive rates over score-ordered bins are
    * replaced by the closest monotone non-decreasing fit (weighted
    * least squares, which PAV solves exactly). The q168 reliability
    * bins say IF scores are calibrated; this REPAIRS them while
    * keeping the ranking.
    *
    * Scale shape: scores reduce to `bins` quantile bins per group
    * first, so the sequential PAV fold runs over ≤`bins` pooled points
    * per group, applied to the collected bin array post-aggregate —
    * bounded, never data-sized. Bin membership replicates `ntile`'s
    * remainder rule (first n mod bins buckets get one extra row) from
    * EXACT ranks on [[graft.operators.Scale.groupedPrefixSumOrd]]'s
    * range-partitioned scan, keyed on the composite (score, tieCols)
    * ordering — a keyed ntile window here would sort all rows of a
    * ≤7-value group through one task. `(scoreCol, tieCols)` must be
    * unique per row within a group (the usual tiebreaker-id contract)
    * or bin membership is not well defined in ANY engine.
    * Oracle contract: PAV's fit has a closed minimax form —
    * fit(i) = max over j≤i of min over k≥j of mean(pos/n over [j,k]) —
    * which IS SQL-expressible on exact integer rationals (compare
    * p₁·n₂ vs p₂·n₁, never divide), so q233 carries a full DuckDB
    * oracle; [[pavCounts]] performs its pooling on the same exact
    * rationals specifically so the two agree bit-for-bit after the
    * single final round. Round24OpsSpec additionally pins textbook
    * PAV hand cases + monotonicity/mean-preservation laws.
    *
    * Returns `(groupCol, bin, n, rate_raw, rate_iso)`, rates rounded
    * to 6; `rate_iso` is non-decreasing in `bin` within each group. */
  def isotonicCalibration(df: DataFrame, groupCol: String,
      scoreCol: String, labelCol: String, tieCols: Seq[String],
      bins: Int = 20): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2,1000]: $bins")
    val rows = df.select(col(groupCol) +: col(scoreCol) +:
      tieCols.map(col) :+ col(labelCol).cast("long").as("__y"): _*)
      .withColumn("__one", lit(1L))
    val sizes = rows.groupBy(col(groupCol)).agg(sum(col("__one")).as("__n"))
    val ranked = Scale.groupedPrefixSumOrd(rows, Seq(groupCol),
        scoreCol +: tieCols, "__one", "__rank")
      .join(broadcast(sizes), groupCol)
    // ntile(bins) over n rows: q = n div bins rows per bucket, the
    // first r = n mod bins buckets take one extra
    val binned = ranked
      .withColumn("__q", expr(s"__n div $bins"))
      .withColumn("__r", expr(s"__n % $bins"))
      .withColumn("__bin", when(
          col("__rank") <= col("__r") * (col("__q") + 1),
          expr("CAST((__rank - 1) div (__q + 1) + 1 AS INT)"))
        .otherwise(expr(
          "CAST(__r + (__rank - __r * (__q + 1) - 1) div __q + 1 AS INT)")))
      .groupBy(col(groupCol), col("__bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__y")).as("__pos"))
    val pavUdf = udf((ns: Seq[Long], ps: Seq[Long]) =>
      Metrics.pavCounts(ns.toArray, ps.toArray))
    binned.groupBy(col(groupCol))
      .agg(sort_array(collect_list(
        struct(col("__bin"), col("n"), col("__pos")))).as("__cells"))
      .withColumn("__iso", pavUdf(
        expr("transform(__cells, x -> x.n)"),
        expr("transform(__cells, x -> x.__pos)")))
      .select(col(groupCol),
        explode(arrays_zip(col("__cells"), col("__iso"))).as("__z"))
      .select(col(groupCol),
        col("__z.__cells.__bin").as("bin"),
        col("__z.__cells.n").as("n"),
        round(col("__z.__cells.__pos").cast("double")
          / col("__z.__cells.n"), 6).as("rate_raw"),
        round(col("__z.__iso"), 6).as("rate_iso"))
  }

  /** [[pav]] on exact integer (count, positives) cells — the binned-
    * calibration case. Pooling decisions compare block means as exact
    * cross-multiplied rationals (BigInt: no overflow, no fp drift) and
    * each block's mean is ONE double division of exact integer sums —
    * bit-identical to any engine computing `sum(pos)/sum(n)` over the
    * same pooled span, which is what lets an isotonic fit carry a SQL
    * oracle (the minimax form max_{j≤i} min_{k≥i} avg(j..k) evaluates
    * the same exact ratios). */
  private[graft] def pavCounts(ns: Array[Long], ps: Array[Long]): Array[Double] = {
    val bw = scala.collection.mutable.ArrayBuffer[Long]()
    val bp = scala.collection.mutable.ArrayBuffer[Long]()
    val bc = scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < ns.length) {
      var w = ns(i); var p = ps(i); var c = 1
      // pool while mean_last >= mean_new: bp/bw >= p/w <=> bp*w >= p*bw
      while (bw.nonEmpty && BigInt(bp.last) * w >= BigInt(p) * bw.last) {
        w += bw.last; p += bp.last; c += bc.last
        bw.remove(bw.size - 1); bp.remove(bp.size - 1); bc.remove(bc.size - 1)
      }
      bw += w; bp += p; bc += c
      i += 1
    }
    bw.indices.flatMap(b =>
      Seq.fill(bc(b))(bp(b).toDouble / bw(b).toDouble)).toArray
  }

  /** Sequential pool-adjacent-violators on (weight, value) pairs in
    * order; returns the monotone non-decreasing fit, one value per
    * input point. Exposed for the spec's law checks. */
  private[graft] def pav(ws: Array[Double], ys: Array[Double]): Array[Double] = {
    val bw = scala.collection.mutable.ArrayBuffer[Double]()
    val bm = scala.collection.mutable.ArrayBuffer[Double]()
    val bc = scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < ws.length) {
      var wgt = ws(i); var m = ys(i); var c = 1
      while (bm.nonEmpty && bm.last >= m) {
        m = (bm.last * bw.last + m * wgt) / (bw.last + wgt)
        wgt += bw.last; c += bc.last
        bw.remove(bw.size - 1); bm.remove(bm.size - 1); bc.remove(bc.size - 1)
      }
      bw += wgt; bm += m; bc += c
      i += 1
    }
    bm.zip(bc).flatMap { case (m, c) => Seq.fill(c)(m) }.toArray
  }

  /** Per-group two-regressor ordinary least squares
    * `y = b0 + b1·x1 + b2·x2`, solved in closed form from the normal
    * equations (Cramer's rule on the 3×3 moment matrix) — multiple
    * regression as ONE hash aggregate + a map-side solve, no iterative
    * fitting, no driver math.
    *
    * Determinism contract: inputs must be INTEGER-valued columns so all
    * nine moment sums (n, Σx1, Σx2, Σy, Σx1², Σx1x2, Σx2², Σx1y, Σx2y)
    * are exact longs under any partitioning; the determinants then
    * combine those exact values in double with one fixed expression
    * shape — replayable verbatim in any engine. Groups with a singular
    * normal matrix (constant regressors, collinearity) are dropped
    * explicitly rather than returning NaN coefficients.
    *
    * Returns `(groupCol, n, b0, b1, b2)`, coefficients rounded to 6. */
  def ols2(df: DataFrame, groupCol: String, x1Col: String, x2Col: String,
      yCol: String): DataFrame = {
    val x1 = col(x1Col).cast("long"); val x2 = col(x2Col).cast("long")
    val y = col(yCol).cast("long")
    val m = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(x1).as("__p"), sum(x2).as("__q"), sum(y).as("__sy"),
      sum(x1 * x1).as("__a"), sum(x1 * x2).as("__b"),
      sum(x2 * x2).as("__c"),
      sum(x1 * y).as("__s1y"), sum(x2 * y).as("__s2y"))
    def d(c: String) = col(c).cast("double")
    val nD = col("n").cast("double")
    val (p, q, sy, a, b, c) =
      (d("__p"), d("__q"), d("__sy"), d("__a"), d("__b"), d("__c"))
    val (s1y, s2y) = (d("__s1y"), d("__s2y"))
    val det = nD * (a * c - b * b) - p * (p * c - b * q) +
      q * (p * b - a * q)
    val d0 = sy * (a * c - b * b) - p * (s1y * c - b * s2y) +
      q * (s1y * b - s2y * a)
    val d1 = nD * (s1y * c - b * s2y) - sy * (p * c - b * q) +
      q * (p * s2y - s1y * q)
    val d2 = nD * (a * s2y - s1y * b) - p * (p * s2y - s1y * q) +
      sy * (p * b - a * q)
    m.withColumn("__det", det)
      .filter(col("__det") =!= 0.0)
      .select(col(groupCol), col("n"),
        round(d0 / col("__det"), 6).as("b0"),
        round(d1 / col("__det"), 6).as("b1"),
        round(d2 / col("__det"), 6).as("b2"))
  }

  /** Linear (uniform) multi-touch attribution: each conversion's value
    * splits evenly across ALL of the user's touches inside the
    * `lookbackDays` window ending at the conversion (last-touch — q173
    * — gives everything to the final click; linear is the other
    * standard read). Conversions with no in-window touch credit the
    * reserved `unattributed` channel in full.
    *
    * Determinism contract: per (conversion, channel) the credit is
    * `floor(value · n_channel / n_total · 10⁴ + 0.5) / 10⁴` — one
    * deterministic map-side double expression — then cast to
    * `decimal(18,4)` so the cross-partition SUM is exact and
    * associative (raw double credit sums would flap by partial-sum
    * order: the q141 lesson). The floor form, not `round(·, 4)`:
    * cents-valued credits divided by small touch counts land on TRUE
    * ten-thousandth halves (0.01/8 = 0.00125) where engines' round()
    * resolves half-way cases differently (Spark re-rounds the shortest
    * decimal repr, DuckDB scales-and-rounds the raw double — found as
    * a dozen per-credit flips at sf0.1; the q405 huge-round lesson's
    * small-value sibling). floor(x·10⁴ + 0.5) is a pure function of
    * the SAME IEEE double both engines compute, so the resolution is
    * identical everywhere (credits are non-negative, so floor(+0.5)
    * half-up needs no negative-half caveat). Rounding happens per
    * conversion-channel, so totals may differ from Σ value by
    * < 0.0001·|pairs| — that tolerance IS the contract, and the
    * oracle replays it.
    *
    * Shape: one equi-join on the user key with the time window as a
    * residual predicate (per-user touch×conversion pairs — bounded by
    * per-user activity, never corpus-quadratic), one aggregate to
    * per-conversion channel counts, one conversion-keyed window for
    * totals, one |channels|-sized final aggregate.
    *
    * Returns `(channel, credited, n_conversions)`. */
  def linearAttribution(touches: DataFrame, tUserCol: String,
      tTsCol: String, channelCol: String, conversions: DataFrame,
      cUserCol: String, cTsCol: String, cIdCol: String, valueCol: String,
      lookbackDays: Int): DataFrame = {
    require(lookbackDays >= 1, s"lookbackDays must be >= 1: $lookbackDays")
    val t = touches.select(col(tUserCol).as("__tu"),
      col(tTsCol).as("__tts"), col(channelCol).as("__ch"))
    val c = conversions.select(col(cUserCol).as("__cu"),
      col(cTsCol).as("__cts"), col(cIdCol).as("__cid"),
      col(valueCol).as("__v"))
    val joined = c.join(t,
      col("__tu") === col("__cu") &&
        col("__tts") <= col("__cts") &&
        col("__tts") >= col("__cts") - expr(s"INTERVAL $lookbackDays DAYS"),
      "left")
    val perConv = joined.groupBy(col("__cid"), col("__v"), col("__ch"))
      .agg(count(col("__ch")).as("__nch")) // 0 on the no-touch row
    val wc = Window.partitionBy(col("__cid"))
    perConv
      .withColumn("__ntot", sum(col("__nch")).over(wc))
      .select(coalesce(col("__ch"), lit("unattributed")).as("channel"),
        col("__cid"),
        (floor(when(col("__ntot") === 0, col("__v"))
            .otherwise(col("__v") * col("__nch") / col("__ntot"))
            * 10000 + 0.5) / 10000)
          .cast("decimal(18,4)").as("__credit"))
      .groupBy(col("channel"))
      .agg(sum(col("__credit")).cast("decimal(18,4)").as("credited"),
        countDistinct(col("__cid")).as("n_conversions"))
  }

  /** Per-group Gini coefficient of a non-negative measure — the
    * concentration read-out behind "how skewed is token/spend/traffic
    * mass across members" audits (a Gini of 0 = perfectly even, →1 =
    * one member holds everything). Uses the exact rank form over the
    * ascending-sorted values: G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n.
    *
    * Determinism: values are cast to decimal before any sum (the rank-
    * weighted sum and the total are both exact and order-independent),
    * and the only double math is the final per-group scalar division,
    * rounded. Because tied values contribute x·Σ(ranks of the run)
    * regardless of how the tie is ordered, the rank-weighted sum comes
    * off the (group, value) SPINE: a run of t equal values ending at
    * inclusive ECDF count c has rank sum t·c − t·(t−1)/2 — exact longs
    * while group sizes stay below ~3·10⁹ (t·c < 2⁶³); `tieCol` is
    * accepted for signature stability but no longer affects the result.
    *
    * Scale shape: the ECDF rides
    * [[graft.operators.Scale.groupedPrefixSum]]'s range-partitioned
    * scan — a `Window.partitionBy(groupCol).orderBy(value)` here plans
    * ONE task per group when the group key is a handful of segments. */
  def giniByGroup(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String): DataFrame = {
    val v = col(valueCol).cast("decimal(18,2)")
    val spine = df.select(col(groupCol), v.as("__x"))
      .groupBy(col(groupCol), col("__x"))
      .agg(count(lit(1)).as("__t"))
    Scale.groupedPrefixSum(spine, Seq(groupCol), "__x", "__t", "__cum")
      // Σ of ranks over the tied run [cum−t+1 .. cum]; t·(t−1) is even,
      // so integer div keeps the weight an exact long
      .withColumn("__w",
        expr("__t * __cum - (__t * (__t - 1)) div 2"))
      .groupBy(col(groupCol))
      .agg(sum(col("__t")).as("n"),
        sum(col("__x") * col("__t")).cast("decimal(28,2)").as("__sx"),
        sum(col("__x") * col("__w")).cast("decimal(28,2)").as("__six"))
      .filter(col("__sx") > 0)
      .select(col(groupCol), col("n"),
        round(
          lit(2.0) * col("__six").cast("double")
            / (col("n").cast("double") * col("__sx").cast("double"))
            - (col("n") + 1).cast("double") / col("n").cast("double"),
          6).as("gini"))
  }

  /** Lorenz decile curve per group — the distribution behind
    * [[giniByGroup]]'s scalar: members ascending by value are cut into
    * ten rank deciles and each decile reports the CUMULATIVE share of
    * total mass, the "bottom d/10 of members hold share s" table.
    *
    * Decile assignment uses the explicit `⌊(i−1)·10/n⌋+1` formula on
    * ascending ranks — NOT `ntile`, whose remainder-distribution rules
    * are a portability hazard — so membership is identical in any
    * engine. Mass accumulates in decimal (exact); the share is one
    * rounded double division per output row.
    *
    * Scale shape: decile membership only needs each value run's rank
    * INTERVAL, so everything derives from the (group, value) spine +
    * [[graft.operators.Scale.groupedPrefixSum]]'s range-partitioned
    * ECDF — a tied run of t values ending at inclusive count c spans
    * ranks [c−t+1, c] and splits across the ≤10 deciles it overlaps
    * (tie ordering never matters: tied rows carry equal mass). The
    * cumulative share then folds the ≤10 per-decile rows per group
    * inside a collected array — no group-keyed window anywhere, at any
    * group cardinality. `tieCol` is accepted for signature stability
    * but no longer affects the result. */
  def lorenzDeciles(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String): DataFrame = {
    val v = col(valueCol).cast("decimal(18,2)")
    val spine = df.select(col(groupCol), v.as("__x"))
      .groupBy(col(groupCol), col("__x"))
      .agg(count(lit(1)).as("__t"))
    val sizes = spine.groupBy(col(groupCol))
      .agg(sum(col("__t")).as("__n"))
    val perDec = Scale.groupedPrefixSum(spine, Seq(groupCol), "__x",
        "__t", "__cum")
      .join(broadcast(sizes), groupCol)
      .withColumn("__lo", col("__cum") - col("__t") + 1)
      // deciles overlapped by the run's rank interval [__lo, __cum]
      .withColumn("decile", explode(sequence(
        expr("CAST((__lo - 1) * 10 div __n + 1 AS INT)"),
        expr("CAST((__cum - 1) * 10 div __n + 1 AS INT)"))))
      // decile d covers ranks [ceil((d−1)n/10)+1, ceil(dn/10)]
      .withColumn("__dlo",
        expr("((decile - 1) * __n + 9) div 10 + 1"))
      .withColumn("__dhi", expr("(decile * __n + 9) div 10"))
      .withColumn("__ov",
        least(col("__cum"), col("__dhi"))
          - greatest(col("__lo"), col("__dlo")) + 1)
      .groupBy(col(groupCol), col("decile"))
      .agg(sum(col("__ov")).as("n_members"),
        sum(col("__x") * col("__ov")).cast("decimal(28,2)").as("__m"))
    // cumulative share over the ≤10 deciles per group: a bounded array
    // fold after the aggregate — never a data-sized ordered window
    perDec
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(
          struct(col("decile"), col("n_members"), col("__m")))).as("__cells"),
        sum(col("__m")).cast("decimal(28,2)").as("__tot"))
      .filter(col("__tot") > 0)
      .select(col(groupCol), col("__tot"), col("__cells"),
        posexplode(col("__cells")).as(Seq("__i", "__c")))
      .withColumn("__cum", expr(
        "aggregate(slice(__cells, 1, __i + 1), CAST(0 AS DECIMAL(28,2))," +
          " (acc, y) -> CAST(acc + y.__m AS DECIMAL(28,2)))"))
      .select(col(groupCol), col("__c.decile").as("decile"),
        col("__c.n_members").as("n_members"),
        round(col("__cum").cast("double") / col("__tot").cast("double"),
          6).as("cum_share"))
  }

  /** Mann–Whitney U rank-sum test (Mann & Whitney 1947) per group:
    * does sample A's distribution of `valueCol` stochastically dominate
    * sample B's? Returns per `groupCol` the two sample sizes, U for the
    * A side, and the tie-corrected normal-approximation z (no
    * continuity correction — documented, and mirrored by the oracle).
    *
    * Rank mechanics: midranks over the POOLED sample per group —
    * avg rank of a tied run = minRank + (ties−1)/2, computed from a
    * `rank()` window plus a per-value count, no global sort. Midranks
    * are multiples of 0.5, exactly representable in double, and their
    * sums stay exact below 2^52 — so the rank-sum is deterministic
    * under any partitioning without decimal help. Tie correction
    * Σ(t³−t) accumulates in long (exact). All windows/aggregates share
    * one hash partitioning on `groupCol`. */
  def mannWhitney(df: DataFrame, groupCol: String, sideCol: String,
      sideA: String, sideB: String, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val pool = df
      .filter(col(sideCol).isin(sideA, sideB) && x.isNotNull)
      .select(col(groupCol), col(sideCol).as("__side"), x.as("__x"))
    // value spine with per-side counts: one row per (group, value), so
    // the rank pass never sorts raw data through a low-cardinality
    // window partition — Scale.groupedPrefixSum range-partitions on
    // (group, value) jointly and stays parallel at any group cardinality
    val spine = pool.groupBy(col(groupCol), col("__x")).agg(
      sum(when(col("__side") === sideA, 1L).otherwise(0L)).as("__ca"),
      sum(when(col("__side") === sideB, 1L).otherwise(0L)).as("__cb"),
      count(lit(1)).as("__t"))
    val ranked = Scale.groupedPrefixSum(spine, Seq(groupCol), "__x",
        "__t", "__cum")
      // doubled midrank 2r = 2·cum − t + 1 stays an exact long
      .withColumn("__rank2", col("__cum") * 2 - col("__t") + 1)
    val agg = ranked.groupBy(col(groupCol)).agg(
      sum(col("__ca")).as("n_a"),
      sum(col("__cb")).as("n_b"),
      (sum(col("__ca") * col("__rank2")).cast("double") / 2.0).as("__r_a"),
      // each tied run of size t contributes t³−t = t·(t²−1), exactly
      sum((col("__t") * col("__t") - 1) * col("__t")).as("__tsum"))
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    val n = nA + nB
    val u = col("__r_a") - nA * (nA + 1.0) / 2.0
    // Σ over rows of (t²−1) = Σ over runs of t·(t²−1) = Σ(t³−t)
    val sigma = sqrt(nA * nB / 12.0
      * ((n + 1.0) - col("__tsum").cast("double") / (n * (n - 1.0))))
    agg.filter(col("n_a") > 0 && col("n_b") > 0 && sigma > 0)
      .select(col(groupCol), col("n_a"), col("n_b"),
        round(u, 1).as("u_a"),
        round((u - nA * nB / 2.0) / sigma, 6).as("z"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic per group: the maximum
    * vertical ECDF gap D = max |F_A(v) − F_B(v)| between the two
    * sides' empirical distributions — the distribution-shift read-out
    * that sees shape changes [[mannWhitney]]'s location test misses.
    *
    * Determinism: the gap is maximized in INTEGER form —
    * |cumA·n_B − cumB·n_A| over per-value cumulative counts — so the
    * argmax and the numerator are exact under any partitioning; the
    * single double division happens on two exact longs, then rounds.
    *
    * Scale shape: the ECDF cumulatives ride
    * [[graft.operators.Scale.groupedPrefixSums]]'s range-partitioned
    * scan — a `Window.partitionBy(groupCol)` here would sort the whole
    * value spine through ONE task per group when `groupCol` has a
    * handful of values (market segments). Group totals are a bounded
    * broadcast (one row per output group). */
  def ksTest(df: DataFrame, groupCol: String, sideCol: String,
      sideA: String, sideB: String, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val perVal = df
      .filter(col(sideCol).isin(sideA, sideB) && x.isNotNull)
      .select(col(groupCol), col(sideCol).as("__side"), x.as("__x"))
      .groupBy(col(groupCol), col("__x"))
      .agg(sum(when(col("__side") === sideA, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__side") === sideB, 1L).otherwise(0L)).as("__cb"))
    val totals = perVal.groupBy(col(groupCol))
      .agg(sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"))
    Scale.groupedPrefixSums(perVal, Seq(groupCol), "__x",
        Seq("__ca", "__cb"), suffix = "_cum")
      .join(broadcast(totals), groupCol)
      .groupBy(col(groupCol))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(abs(col("__ca_cum") * col("n_b")
          - col("__cb_cum") * col("n_a"))).as("__num"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .select(col(groupCol), col("n_a"), col("n_b"),
        round(col("__num").cast("double")
          / (col("n_a") * col("n_b")).cast("double"), 6).as("d"))
  }

  /** Decision-stump induction per group: the single threshold on an
    * integer feature that maximizes Gini gain for a binary label — the
    * 1-D split CART would pick, and the standard "is this feature
    * predictive at all" screen next to [[chiSquareTokens]].
    *
    * Exactness: with integer counts the weighted child impurity is the
    * rational score/(nL·nR·n) where score = (cL0²+cL1²)·nR +
    * (cR0²+cR1²)·nL stays in LONG arithmetic — exact while n³ < 2⁶³,
    * i.e. groups up to ~2M rows; beyond that pre-aggregate the feature
    * into quantile bins first (the CART practice anyway). Both engines
    * derive gains from identical exact integers through the identical
    * double expression, so the argmax ordering — gain desc, threshold
    * asc — is deterministic. The feature-spine cumulatives ride
    * [[graft.operators.Scale.groupedPrefixSums]]'s range-partitioned
    * scan (a group-keyed window would sort the spine through one task
    * per group) and the argmax is a partial-aggregated `max_by` — no
    * ordered window anywhere.
    *
    * `labelCol` must be 0/1. Returns per group the best `threshold`
    * (split: feature ≤ threshold), sizes and the rounded gain; groups
    * with a single distinct feature value produce nothing (no valid
    * split). */
  def decisionStump(df: DataFrame, groupCol: String, featureCol: String,
      labelCol: String): DataFrame = {
    val base = df.select(col(groupCol),
      col(featureCol).cast("long").as("__f"),
      col(labelCol).cast("long").as("__y"))
    val perVal = base.groupBy(col(groupCol), col("__f"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__p"))
    // cumulatives ride the range-partitioned grouped scan (a group-keyed
    // window would sort the whole feature spine through one task per
    // group); totals are a bounded broadcast, one row per group
    val totals = perVal.groupBy(col(groupCol))
      .agg(sum(col("__n")).as("__nt"), sum(col("__p")).as("__pt"))
    val cum = Scale.groupedPrefixSums(perVal, Seq(groupCol), "__f",
        Seq("__n", "__p"), suffix = "_cum")
      .withColumnRenamed("__n_cum", "__nl")
      .withColumnRenamed("__p_cum", "__pl")
      .join(broadcast(totals), groupCol)
      .filter(col("__nl") < col("__nt")) // right side must be non-empty
    val nl = col("__nl"); val nr = col("__nt") - col("__nl")
    val cl1 = col("__pl"); val cl0 = col("__nl") - col("__pl")
    val cr1 = col("__pt") - col("__pl")
    val cr0 = nr - cr1
    val score = (cl0 * cl0 + cl1 * cl1) * nr + (cr0 * cr0 + cr1 * cr1) * nl
    val c1 = col("__pt"); val c0 = col("__nt") - col("__pt")
    val gain = score.cast("double") /
      (nl.cast("double") * nr.cast("double") * col("__nt").cast("double")) -
      (c0 * c0 + c1 * c1).cast("double") /
        (col("__nt").cast("double") * col("__nt").cast("double"))
    // argmax (gain desc, threshold asc) as ONE partial-aggregated
    // max_by — no ordered window over the spine; the ordering struct
    // (gain, −f) is unique per group because __f is
    val best = cum.withColumn("__gain", gain)
      .groupBy(col(groupCol))
      .agg(max_by(
        struct(col("__nt"), col("__f"), col("__nl"), col("__gain")),
        struct(col("__gain"), (-col("__f")).as("__nf"))).as("__b"))
    best.select(col(groupCol), col("__b.__nt").as("n"),
      col("__b.__f").as("threshold"), col("__b.__nl").as("n_left"),
      round(col("__b.__gain"), 6).as("gain"))
  }

  /** Rank-biased overlap at depth d (Webber, Moffat & Zobel 2010)
    * between two per-group ranked ID lists: how similar are two
    * rankings, weighting agreement at the TOP geometrically heavier —
    * the ranking-comparison metric set intersection and Kendall τ both
    * miss (τ needs conjoint lists; RBO handles disjoint tails).
    *
    *   RBO@d = (1−p) Σ_{i=1..d} p^{i−1} · |A₁..ᵢ ∩ B₁..ᵢ| / i
    *
    * Inputs are two DataFrames of (group, rank position, id) — build
    * them with a bounded top-k (e.g. [[TopK.topKPerGroup]]) so the
    * per-group arrays are ≤ d elements. Prefix overlaps are exact
    * integer `array_intersect` counts over the bounded arrays (O(d²)
    * per group, d bounded); the weighted sum runs as ONE sequential
    * fold carrying the running power pᵢ multiplicatively — no
    * `pow()`, so both engines produce bit-identical weights. Rankings
    * of unequal depth compare at the COMMON depth d = min(|A|,|B|)
    * (sparse groups still get a row); groups missing from either side
    * or empty are dropped explicitly.
    *
    * Returns `(groupCol, d, rbo)`. */
  def rbo(listA: DataFrame, listB: DataFrame, groupCol: String,
      posCol: String, idCol: String, p: Double): DataFrame = {
    require(p > 0 && p < 1, s"p must be in (0,1): $p")
    def packed(df: DataFrame, out: String) = df.groupBy(col(groupCol))
      .agg(transform(array_sort(collect_list(struct(col(posCol).as("__p"),
        col(idCol).cast("long").as("__id")))), s => s("__id")).as(out))
    val j = packed(listA, "__a").join(packed(listB, "__b"), groupCol)
      .withColumn("__d", least(size(col("__a")), size(col("__b"))))
      .filter(col("__d") > 0)
    // fold state [acc, pw]: acc += pw·ov(i)/i, pw *= p — the running
    // power keeps both engines on identical doubles (no libm pow)
    val fold = aggregate(
      sequence(lit(1), col("__d")),
      array(lit(0.0), lit(1.0)),
      (st, i) => array(
        element_at(st, 1) + element_at(st, 2)
          * size(array_intersect(
              slice(col("__a"), lit(1), i.cast("int")),
              slice(col("__b"), lit(1), i.cast("int")))).cast("double")
          / i.cast("double"),
        element_at(st, 2) * p))
    j.select(col(groupCol), col("__d").cast("long").as("d"),
      round((lit(1.0) - p) * element_at(fold, 1), 6).as("rbo"))
  }

  /** Empirical tail-dependence coefficients per group — the copula
    * diagnostic correlation can't see: do `xCol` and `yCol` land in
    * their EXTREME deciles together?  With m = ⌊n/tailDenom⌋,
    *
    *   λ̂_U = #{xrank > n−m ∧ yrank > n−m} / m   (upper tail)
    *   λ̂_L = #{xrank ≤ m   ∧ yrank ≤ m}   / m   (lower tail)
    *
    * where a value's rank-count is the number of rows ≤ it (ties count
    * whole runs — a run straddling the cut is in the upper tail and out
    * of the lower one, deterministically on both engines; with
    * near-continuous inputs like cents the sets are within a run of
    * exactly m rows).
    *
    * Plan shape: per-variable rank-counts come off the (group, value)
    * spine via [[Scale.groupedMidranks]]' range-partitioned grouped scan
    * (groupCol is typically low-cardinality — a group-keyed cume window
    * would serialize each group into one task); rows join the two spines
    * on (group, value) — distinct-value-sized, never quadratic — and the
    * tail flags reduce in one exact integer aggregate. m uses INTEGER
    * division, exact on both engines.
    *
    * Returns `(groupCol, n, m, n_upper, lambda_u, n_lower, lambda_l)`. */
  def tailDependence(df: DataFrame, groupCol: String, xCol: String,
      yCol: String, tailDenom: Int = 10): DataFrame = {
    require(tailDenom >= 2, s"tailDenom must be >= 2: $tailDenom")
    val rows = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol).as("__g"), col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
    val xSpine = Scale.groupedMidranks(rows, Seq("__g"), "__x",
        tieCol = "__tx", cumCol = "__cx")
      .select(col("__g"), col("__x"), col("__cx"))
    val ySpine = Scale.groupedMidranks(rows, Seq("__g"), "__y",
        tieCol = "__ty", cumCol = "__cy")
      .select(col("__g"), col("__y"), col("__cy"))
    // floor, not a bare cast: Spark casts double→long by truncation but
    // DuckDB CAST rounds — floor() and `//` agree (the q391 lesson)
    val totals = rows.groupBy(col("__g")).agg(count(lit(1)).as("n"))
      .withColumn("m", floor(col("n") / tailDenom).cast("long"))
    val flagged = rows
      .join(xSpine, Seq("__g", "__x"))
      .join(ySpine, Seq("__g", "__y"))
      .join(broadcast(totals), "__g")
    val agg = flagged.groupBy(col("__g")).agg(
      max(col("n")).as("n"), max(col("m")).as("m"),
      sum((col("__cx") > col("n") - col("m")
        && col("__cy") > col("n") - col("m")).cast("long")).as("n_upper"),
      sum((col("__cx") <= col("m")
        && col("__cy") <= col("m")).cast("long")).as("n_lower"))
    agg.filter(col("m") > 0)
      .select(col("__g").as(groupCol), col("n"), col("m"),
        col("n_upper"),
        round(col("n_upper").cast("double") / col("m").cast("double"), 6)
          .as("lambda_u"),
        col("n_lower"),
        round(col("n_lower").cast("double") / col("m").cast("double"), 6)
          .as("lambda_l"))
  }
}
