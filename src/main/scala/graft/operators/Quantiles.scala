package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact distributed quantiles via sort-rank, not value-count maps.
  *
  * Spark's built-in exact `percentile` aggregate accumulates a
  * value→count map per partition and merges them on the reducer — memory
  * grows with the DISTINCT-VALUE cardinality, which is unbounded for
  * continuous measures at 100 TB (and it is several times slower than a
  * sort even at sf0.1).
  *
  * Plan shape (the sorted data is persisted once and walked twice,
  * parallelism bound by partition count — NOT by group count, which is
  * what a `row_number() OVER (PARTITION BY group)` window degrades to):
  *
  *  1. range-partition on (group, value) and sort within partitions —
  *     a parallel global sort, persisted for the later passes;
  *  2. pass 1: per partition, emit the ordered run-length histogram
  *     (group, count) — tiny, collected to the driver. The cardinality
  *     guard is fused into this job: partitions self-cap what they ship,
  *     and above `maxDriverHistogram` total entries the operator routes
  *     to [[quantilesByWindow]] (driver memory is O(partitions × groups)
  *     on the collect path, so a high-cardinality group key must not
  *     take it);
  *  3. driver: prefix-sum the histograms into per-(partition, group)
  *     start ranks and per-group totals; compute each quantile's two
  *     interpolation neighbor ranks;
  *  4. pass 2: walk the same persisted sorted partitions, emit ONLY rows
  *     whose within-group rank is an interpolation neighbor (≤ 2·|ps|
  *     rows per group);
  *  5. final: a trivial aggregate interpolates, matching SQL
  *     `quantile_cont`: pos = p·(n−1)+1, value = v_lo + frac·(v_hi−v_lo).
  */
object Quantiles {

  private def pName(p: Double): String = s"p${(p * 100).round}"

  /** @param df        input
    * @param groupCols grouping columns (empty = global)
    * @param valueCol  numeric column to take quantiles of (nulls dropped)
    * @param ps        quantile fractions in [0,1], each becomes column `p<frac·100>`
    * @param maxDriverHistogram cap on collected (partition, group) run
    *                  entries; beyond it the windowed distributed path runs
    */
  def exactQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[Double], maxDriverHistogram: Long = 2000000L): DataFrame = {
    require(ps.nonEmpty, "need at least one quantile fraction")
    require(ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile fractions must be in [0, 1]: ${ps.filterNot(p => p >= 0.0 && p <= 1.0)}")
    val spark = df.sparkSession
    val v = col(valueCol).cast("double")
    val keyCols = if (groupCols.isEmpty) Seq(lit(0).as("__g")) else groupCols.map(col)
    val keyNames = if (groupCols.isEmpty) Seq("__g") else groupCols
    val rows = df.filter(v.isNotNull).select(keyCols :+ v.as("__v"): _*)

    val nKey = keyNames.length
    val sorted = rows
      .repartitionByRange((keyNames :+ "__v").map(col): _*)
      .sortWithinPartitions((keyNames :+ "__v").map(col): _*)
    // persisted: pass 1, the histogram-size probe and pass 2 all read the
    // sorted rows once — without this every action would re-read the
    // shuffle AND re-run the within-partition sort
    val sortedRdd = sorted.queryExecution.toRdd
      .mapPartitions(it => it.map(_.copy()), preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val schema = sorted.schema
      val keyOf: org.apache.spark.sql.catalyst.InternalRow => Seq[Any] = r =>
        (0 until nKey).map(i => r.get(i, schema(i).dataType))

      // pass 1: ordered (group, count) run-length histogram per partition.
      // The cardinality guard is fused into the same job: a partition
      // whose run count exceeds its proportional share of the driver
      // budget stops STORING runs and just counts them (Left), so a
      // high-cardinality key ships at most ~4× the budget in total and
      // the driver routes to the distributed window path — no separate
      // counting job, no unbounded collect.
      // Driver-memory sizing on the HAPPY path: the probe itself holds
      // up to maxDriverHistogram (default 2M) run-length entries —
      // ~50-100 MB of small tuples — before deciding; size the budget
      // to the driver heap, not the data (it is the price of the
      // one-pass fused guard: a separate pre-count would read the
      // sorted data twice on every call to save memory the default
      // driver already has)
      val nPart = math.max(1, sortedRdd.getNumPartitions)
      val perPartCap = math.max(64L, 4L * maxDriverHistogram / nPart)
      val hist0: Array[(Int, Either[Long, Seq[(Seq[Any], Long)]])] = sortedRdd
        .mapPartitionsWithIndex { (pid, it) =>
          val runs = scala.collection.mutable.ArrayBuffer.empty[(Seq[Any], Long)]
          var nRuns = 0L
          var cur: Seq[Any] = null
          var n = 0L
          def endRun(): Unit = {
            nRuns += 1
            if (nRuns <= perPartCap) runs += ((cur, n)) else runs.clear()
          }
          it.foreach { r =>
            val k = keyOf(r)
            if (k == cur) n += 1
            else { if (cur != null) endRun(); cur = k; n = 1L }
          }
          if (cur != null) endRun()
          Iterator.single((pid,
            if (nRuns > perPartCap) Left(nRuns) else Right(runs.toSeq)))
        }.collect().sortBy(_._1)
      val histEntries = hist0.map(_._2.fold(identity, _.length.toLong)).sum
      if (histEntries > maxDriverHistogram || hist0.exists(_._2.isLeft))
        return quantilesByWindow(rows, keyNames, ps, groupCols.isEmpty)
      val hist: Array[(Int, Seq[(Seq[Any], Long)])] =
        hist0.map { case (pid, e) => (pid, e.toOption.get) }

      // driver: per-group totals and per-(partition, group) start ranks
      val totals = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Long]
      val startAt = scala.collection.mutable.HashMap.empty[(Int, Seq[Any]), Long]
      hist.foreach { case (pid, runs) =>
        runs.foreach { case (k, n) =>
          val sofar = totals.getOrElse(k, 0L)
          startAt((pid, k)) = sofar
          totals(k) = sofar + n
        }
      }
      // interpolation neighbor ranks (1-based) per group
      val wanted: Map[Seq[Any], Set[Long]] = totals.map { case (k, n) =>
        k -> ps.flatMap { p =>
          val pos = p * (n - 1) + 1
          Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
        }.toSet
      }.toMap
      val wantedB = spark.sparkContext.broadcast(wanted)
      val startB = spark.sparkContext.broadcast(startAt.toMap)

      // pass 2: emit only the neighbor rows, with their within-group rank
      val neighborRows: Seq[Row] = sortedRdd
        .mapPartitionsWithIndex { (pid, it) =>
          val want = wantedB.value
          val starts = startB.value
          var cur: Seq[Any] = null
          var rank = 0L
          it.flatMap { r =>
            val k = keyOf(r)
            if (k != cur) { cur = k; rank = starts.getOrElse((pid, k), 0L) }
            rank += 1
            if (want.getOrElse(k, Set.empty).contains(rank))
              Iterator.single(Row.fromSeq(k :+ rank :+ r.getDouble(nKey)))
            else Iterator.empty
          }
        }.collect().toSeq

      // driver-side interpolation over ≤ 2·|ps| rows per group
      val byKey = neighborRows.groupBy(r => (0 until nKey).map(r.get): Seq[Any])
      val toExternal = (0 until nKey).map(i =>
        org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToScalaConverter(schema(i).dataType))
      val out = totals.toSeq.map { case (k, n) =>
        val ranks = byKey.getOrElse(k, Seq.empty)
          .map(r => r.getLong(nKey) -> r.getDouble(nKey + 1)).toMap
        val qs = ps.map { p =>
          val pos = p * (n - 1) + 1
          val lo = math.floor(pos).toLong
          val hi = math.ceil(pos).toLong
          val vLo = ranks(lo)
          val vHi = ranks(hi)
          vLo + (pos - lo) * (vHi - vLo)
        }
        Row.fromSeq(k.zip(toExternal).map { case (value, conv) => conv(value) } ++ qs)
      }
      val outSchema = org.apache.spark.sql.types.StructType(
        keyNames.zipWithIndex.map { case (kn, i) => schema(i) } ++
          ps.map(p => org.apache.spark.sql.types.StructField(pName(p),
            org.apache.spark.sql.types.DoubleType)))
      val res = spark.createDataFrame(
        spark.sparkContext.parallelize(out.toList, 1), outSchema)
      if (groupCols.isEmpty) res.drop("__g") else res
    } finally sortedRdd.unpersist()
  }

  /** Fully distributed quantiles for HIGH-cardinality group keys: a
    * `row_number` window ranks within each group (parallelism = group
    * count, which is exactly the regime where that is plentiful), the
    * interpolation neighbors are picked by conditional aggregates, and
    * the final arithmetic mirrors the driver path bit-for-bit
    * (`v_lo + (pos − ⌊pos⌋)·(v_hi − v_lo)`). Nothing is ever collected.
    *
    * `rows` must already be projected to (group columns..., __v: double,
    * nulls dropped) — [[exactQuantiles]] routes here above its histogram
    * threshold; callers with a known-wide key can call it directly.
    */
  private[graft] def quantilesByWindow(rows: DataFrame, keyNames: Seq[String],
      ps: Seq[Double], dropKey: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyC = keyNames.map(col)
    val w = Window.partitionBy(keyC: _*).orderBy(col("__v"))
    val ranked = rows
      .withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(keyC: _*)))
    def pos(i: Int): Column = lit(ps(i)) * (col("__n").cast("double") - 1) + 1
    val aggs = ps.indices.flatMap { i =>
      Seq(
        max(when(col("__r") === floor(pos(i)).cast("long"), col("__v"))).as(s"__lo$i"),
        max(when(col("__r") === ceil(pos(i)).cast("long"), col("__v"))).as(s"__hi$i"),
        first(pos(i)).as(s"__pos$i"))
    }
    val agged = ranked.groupBy(keyC: _*).agg(aggs.head, aggs.tail: _*)
    val outs = keyC ++ ps.indices.map { i =>
      (col(s"__lo$i") +
        (col(s"__pos$i") - floor(col(s"__pos$i"))) *
          (col(s"__hi$i") - col(s"__lo$i"))).as(pName(ps(i)))
    }
    val res = agged.select(outs: _*)
    if (dropKey) res.drop("__g") else res
  }

  /** Quantiles over SEVERAL value columns from ONE global sort: the
    * columns are stack-unpivoted into (group..., __col, __v) so a single
    * range-partitioned sort ranks every column's values, then the long
    * result pivots back to `<col>_p<frac>` columns. n columns for the
    * price of one sort over n× the rows — beats n independent sorts
    * because the shuffle machinery, scan and persist are paid once. */
  def exactQuantilesMulti(df: DataFrame, groupCols: Seq[String],
      valueCols: Seq[String], ps: Seq[Double],
      maxDriverHistogram: Long = 2000000L): DataFrame = {
    require(valueCols.nonEmpty, "need at least one value column")
    val stackArgs = valueCols.map(c => s"'$c', cast(`$c` as double)").mkString(", ")
    val stacked = df.selectExpr(
      groupCols.map(c => s"`$c`") :+
        s"stack(${valueCols.length}, $stackArgs) AS (__col, __v)": _*)
    val long = exactQuantiles(stacked, groupCols :+ "__col", "__v", ps, maxDriverHistogram)
    val firstAggs = ps.map(p => first(col(pName(p))).as(pName(p)))
    val wide = long.groupBy(groupCols.map(col): _*)
      .pivot("__col", valueCols)
      .agg(firstAggs.head, firstAggs.tail: _*)
    // pivot names single-agg columns `<val>` and multi-agg `<val>_<agg>`;
    // normalize to `<col>_p<frac>` either way
    if (ps.length == 1) {
      val renamed = valueCols.foldLeft(wide) { (acc, c) =>
        acc.withColumnRenamed(c, s"${c}_${pName(ps.head)}")
      }
      renamed
    } else wide
  }

  /** Winsorization — clamp `valueCol` into each group's exact
    * `[lo, hi]` quantile band, the standard outlier-robust
    * normalization before statistics or model features. Composes
    * [[exactQuantiles]] (one sort-rank pass for both bounds) with a
    * per-row clamp joined back on the group key; the bounds table is
    * group-cardinality-sized and AQE-broadcastable. Adds
    * `<valueCol>_winsorized`; rows whose group is absent from the
    * bounds (all-null groups) keep their value un-clamped. */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo <= hi, s"need 0 <= lo <= hi <= 1: $lo, $hi")
    val loName = pName(lo); val hiName = pName(hi)
    require(loName != hiName, s"lo and hi round to the same band: $loName")
    val bounds = exactQuantiles(df, groupCols, valueCol, Seq(lo, hi))
      .withColumnRenamed(loName, "__lo").withColumnRenamed(hiName, "__hi")
    val joined = if (groupCols.isEmpty) df.crossJoin(bounds.drop("__g"))
      else df.join(bounds, groupCols, "left")
    joined
      .withColumn(s"${valueCol}_winsorized",
        when(col("__lo").isNull, col(valueCol).cast("double"))
          .otherwise(least(greatest(col(valueCol).cast("double"),
            col("__lo")), col("__hi"))))
      .drop("__lo", "__hi")
  }

  /** Per-group LOWER weighted median: the smallest value whose
    * cumulative weight reaches half the group's total — the
    * size-weighted "typical value" (median order line weighted by
    * revenue, median latency weighted by traffic) an unweighted median
    * misreads. Weights are cast to LONG (use integer units — cents,
    * counts) so every comparison `2·cumw ≥ W` is integer-exact: no
    * interpolation, no float boundary. One (group, value) pre-reduce,
    * one keyed window pass over distinct values, never a global sort.
    * Returns `(groupCols…, total_weight, weighted_median)`. */
  def weightedMedian(df: DataFrame, groupCols: Seq[String],
      valueCol: String, weightCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    import org.apache.spark.sql.expressions.Window
    val cells = df
      .select(groupCols.map(col) :+ col(valueCol).cast("double").as("__v")
        :+ col(weightCol).cast("long").as("__w"): _*)
      .filter(col("__w") > 0)
      .groupBy(groupCols.map(col) :+ col("__v"): _*)
      .agg(sum(col("__w")).as("__cw"))
    val byVal = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__v"))
    val full = Window.partitionBy(groupCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cells
      .withColumn("__cum", sum(col("__cw")).over(
        byVal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tot", sum(col("__cw")).over(full))
      .filter(col("__cum") * 2 >= col("__tot"))
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("__tot")).as("total_weight"),
        min(col("__v")).as("weighted_median"))
  }

  /** Per-group robust scaling `(x − median) / IQR` — the feature
    * normalization that survives the outliers a mean/stddev z-score is
    * dragged by. One [[exactQuantiles]] sort-rank pass computes all
    * three boundaries (p25/p50/p75); the group-sized stats join back
    * (AQE-broadcastable) and the scale is a map-side projection.
    * Zero-IQR groups (over half the mass on one value) get null — the
    * guard runs BEFORE the division, ANSI-safe. Appends
    * `<valueCol>_scaled`, rounded to 6 places. */
  def robustScale(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val stats = exactQuantiles(df, groupCols, valueCol,
        Seq(0.25, 0.5, 0.75))
      .withColumnRenamed("p25", "__lo").withColumnRenamed("p50", "__med")
      .withColumnRenamed("p75", "__hi")
    val joined = if (groupCols.isEmpty) df.crossJoin(stats.drop("__g"))
      else df.join(stats, groupCols, "left")
    joined
      .withColumn(s"${valueCol}_scaled",
        when(col("__hi") > col("__lo"),
          round((col(valueCol).cast("double") - col("__med"))
            / (col("__hi") - col("__lo")), 6)))
      .drop("__lo", "__med", "__hi")
  }

  /** Per-group z-score outliers: rows where
    * `|value − mean| / stddev > threshold`, with the score appended as
    * a `z` column. Groups with fewer than `minCount` rows (sample
    * stddev undefined or meaningless) are dropped entirely.
    *
    * The variance uses the CENTERED two-pass formula (per-group mean
    * first, then Σ(x−x̄)² — same rationale as `TimeSeries.trendPerKey`:
    * the one-pass Σx²−(Σx)²/n closed form catastrophically cancels for
    * large-mean/small-spread measures, exactly the regime anomaly
    * detection runs in). Three key-partitioned shuffles: mean
    * aggregate, centered second-moment aggregate, stats join back —
    * the stats tables are group-cardinality-sized and AQE-broadcastable,
    * nothing collects, so a billion groups distribute freely.
    * Zero-variance groups have no defined z — the guard nulls them out
    * BEFORE the division (ANSI mode turns 1/0 into a task failure, not
    * an Infinity to filter after the fact), and the threshold filter
    * drops the nulls.
    */
  /** Exact equi-depth histogram: `buckets` bins holding (up to ties)
    * equal row counts, as `(bucket, lo, hi, n)` with 1-based bucket
    * ids and interpolated quantile boundaries (`lo`/`hi` rounded to 6;
    * the optimizer-statistics histogram, and the binning equi-width
    * q63 can't give skewed data). One [[exactQuantiles]] sort-rank
    * pass computes all `buckets+1` boundaries; assignment is then a
    * map-side comparison sum against the broadcast 1-row bounds table
    * (`bucket = 1 + Σ (v > boundᵢ)` — branch-free, replayable), and
    * the histogram is one hash aggregate. Buckets emptied by heavy
    * ties (several boundaries equal) are absent from the output, which
    * is the honest answer. Comparisons use the UNROUNDED boundaries:
    * an interior boundary is either exactly a data value (integral or
    * tied rank — bit-equal in any engine) or ≥ fracmin·gap away from
    * the adjacent data values, so last-ulp interpolation differences
    * can never flip a bin assignment. */
  def equiDepthHistogram(df: DataFrame, valueCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= 100,
      s"buckets must be in [2, 100]: $buckets")
    val ps = (0 to buckets).map(_.toDouble / buckets)
    val names = ps.map(pName)
    require(names.distinct.size == names.size,
      s"bucket fractions collide after name rounding: $names")
    val bounds = exactQuantiles(df, Seq(), valueCol, ps).drop("__g")
    val v = col(valueCol).cast("double")
    val bucket = names.slice(1, buckets)
      .foldLeft(lit(1))((acc, b) => acc + (v > col(b)).cast("int"))
    val boundsArr = array(names.map(col): _*)
    df.filter(v.isNotNull)
      .crossJoin(broadcast(bounds))
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(bounds))
      .select(col("bucket"),
        round(element_at(boundsArr, col("bucket")), 6).as("lo"),
        round(element_at(boundsArr, col("bucket") + 1), 6).as("hi"),
        col("n"))
  }

  /** Quantile normalization: map every value of `dfB` onto the
    * DISTRIBUTION of `dfA` — each b-value's percent rank in B is
    * looked up in A's interpolated quantile function
    * (`mapped = Q_A((rank_B − 1)/(n_B − 1))`), so the transformed B
    * has A's shape exactly while preserving B's order. The batch-
    * effect / score-alignment standard (microarray normalization,
    * cross-model score calibration).
    *
    * Shape: B's dense percent rank comes from one keyed-free sort-rank
    * pass over the per-VALUE reduced table ([[Scale.prefixSum]]'s
    * range-partitioned machinery — no single-partition window);
    * A reduces to its sorted value ARRAY broadcast as one row (the
    * reference distribution — bounded by contract; at 100 TB pass a
    * quantile SKETCH of A, e.g. `buckets` equi-depth boundaries, which
    * is this same code over the reduced array). Interpolation is the
    * quantile_cont form. Ties in B share a rank (first-of-run), so
    * equal inputs map to equal outputs under any partitioning.
    *
    * Returns `(valueCol, n, mapped)` per DISTINCT B value, mapped
    * rounded to 6. */
  def quantileNormalize(dfA: DataFrame, dfB: DataFrame,
      valueCol: String): DataFrame = {
    val aArr = dfA.select(col(valueCol).cast("double").as("__bval"))
      .filter(col("__bval").isNotNull)
      .agg(sort_array(collect_list(col("__bval"))).as("__ref"))
    val bVals = dfB.select(col(valueCol).cast("double").as("__bval"))
      .filter(col("__bval").isNotNull)
      .groupBy(col("__bval")).agg(count(lit(1)).as("n"))
    // dense first-of-run rank over distinct values via range-partitioned
    // prefix counts; nTot = Σn (broadcast 1-row)
    val ranked = Scale.prefixSum(bVals.withColumn("__one", col("n")),
      "__bval", "__one", "__cum")
    val nTot = bVals.agg(sum(col("n")).as("__nb"))
    val withP = ranked.crossJoin(broadcast(nTot))
      .withColumn("__rank", col("__cum") - col("n") + 1) // first of run
      .withColumn("__p",
        when(col("__nb") > 1,
          (col("__rank") - 1).cast("double") / (col("__nb") - 1))
          .otherwise(lit(0.0)))
    withP.crossJoin(broadcast(aArr))
      .withColumn("__na", size(col("__ref")))
      .withColumn("__h", col("__p") * (col("__na") - 1))
      .withColumn("__lo", floor(col("__h")).cast("int"))
      .withColumn("__frac", col("__h") - col("__lo"))
      .select(col("__bval").as(valueCol), col("n"),
        round(
          element_at(col("__ref"), col("__lo") + 1) +
            col("__frac") *
              (element_at(col("__ref"),
                least(col("__lo") + 2, col("__na"))) -
                element_at(col("__ref"), col("__lo") + 1)), 6)
          .as("mapped"))
  }

  def zscoreOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      threshold: Double, minCount: Long = 2): DataFrame = {
    require(threshold > 0, s"threshold must be > 0: $threshold")
    require(minCount >= 2, s"sample stddev needs minCount >= 2: $minCount")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val x = col(valueCol).cast("double")
    val means = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), (sum(x) / count(lit(1))).as("__mean"))
      .filter(col("__n") >= minCount)
    val stats = df.join(means, groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(sum((x - col("__mean")) * (x - col("__mean"))).as("__ss"),
        max(col("__n")).as("__n"), max(col("__mean")).as("__mean"))
    val z = when(col("__ss") > 0,
      (x - col("__mean")) / sqrt(col("__ss") / (col("__n") - 1)))
    df.join(stats, groupCols)
      .withColumn("z", z)
      .filter(abs(col("z")) > threshold)
      .drop("__n", "__mean", "__ss")
  }

  /** Hill estimator of the Pareto tail index per group (Hill 1975): with
    * the k+1 largest POSITIVE values x₍₁₎ ≥ … ≥ x₍ₖ₊₁₎,
    *
    *   H = (1/k) Σ_{i=1..k} ln(x₍ᵢ₎ / x₍ₖ₊₁₎),   α̂ = 1/H
    *
    * — the standard heavy-tail diagnostic (α ≲ 2 means infinite
    * variance; small α = heavier tail).
    *
    * Plan shape: the top-(k+1) rows per group come off the bounded-heap
    * [[TopK.topKPerGroup]] physical operator — O(n log k) map-side work
    * and a shuffle of at most groups·(k+1)·partitions rows, never a
    * data-sized sort through a group-keyed window. The k+1 survivors per
    * group collapse to ONE bounded array row; the only floating-point
    * reduction is the fold of k log-ratio terms over that
    * descending-sorted bounded array — a fixed sequential order both
    * engines replay verbatim (`aggregate` here, `list_reduce` in SQL).
    *
    * Ties at the heap boundary are value-ties only: the estimator
    * consumes the VALUE multiset, which is deterministic even when the
    * bounded heap keeps an arbitrary row among boundary-tied rows.
    *
    * `valueCol` must be integer-valued (pass cents). Groups with fewer
    * than k+1 positive values, or with x₍ₖ₊₁₎ = x₍₁₎ (H = 0), are
    * dropped explicitly.
    *
    * Returns `(groupCols*, k, x_k BIGINT, hill, alpha)`. */
  def hillTailIndex(df: DataFrame, groupCols: Seq[String],
      valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val v = col(valueCol).cast("long")
    val top = TopK.topKPerGroup(
      df.filter(v > 0).select((groupCols.map(col) :+ v.as("__v")): _*),
      groupCols, col("__v"), k = k + 1, desc = true)
    val packed = top.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__cnt"),
        reverse(array_sort(collect_list(col("__v")))).as("__lst"))
      .filter(col("__cnt") === (k + 1))
      .withColumn("__xk", element_at(col("__lst"), k + 1))
    val hill = aggregate(
      slice(col("__lst"), 1, k), lit(0.0),
      (acc, x) => acc + log(x.cast("double") / col("__xk").cast("double"))
    ) / k.toDouble
    packed.withColumn("__h", hill)
      .filter(col("__h") > 0.0)
      .select(groupCols.map(col) ++ Seq(lit(k.toLong).as("k"),
        col("__xk").as("x_k"), round(col("__h"), 6).as("hill"),
        round(lit(1.0) / col("__h"), 6).as("alpha")): _*)
  }
}
