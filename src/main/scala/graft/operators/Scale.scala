package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 100 TB-scale helpers (SURVEY §4.2, §7.4): skew mitigation and layout.
  *
  * First line of defense is AQE (enabled by [[graft.Session]]): runtime
  * coalescing, skew-join splitting, and broadcast demotion. These helpers
  * cover the cases AQE can't see in advance:
  *
  *  - [[saltedJoin]]: explicit key salting for a join whose key histogram
  *    is known to be pathological (a handful of keys carrying most rows).
  *    The large side gets a deterministic salt in [0, salts); the small
  *    side is replicated once per salt, so each hot key spreads over
  *    `salts` shuffle partitions.
  *  - [[writePartitioned]]: directory-partitioned parquet layout so
  *    downstream scans prune partitions instead of listing 100 TB.
  *  - [[repartitionForJoin]]: pre-shuffle both sides of a repeated join
  *    key once, letting several downstream joins reuse the exchange.
  *  - [[prefixSum]] / [[prefixSums]] / [[prefixSumD]] / [[prefixMax]]
  *    and the grouped variants: distributed ordered scans replacing
  *    every `Window.orderBy`-without-partition-key (one task for the
  *    whole table at scale); operators over REDUCED spines probe the
  *    spine's count against [[maxOrderedFrameRows]] and route here
  *    when a continuous-valued key makes the spine corpus-sized.
  */
object Scale {

  /** Join `large` with `small` on `key`, salting the large side to spread
    * hot keys. Result equals `large.join(small, key)` for inner joins.
    * The salt derives from a hash of the whole large-side row, so it is
    * deterministic and needs no extra state. Caveat: BYTE-IDENTICAL
    * duplicate rows of a hot key hash to the same salt and stay in one
    * bucket — if the skew is duplicate-row skew rather than key skew,
    * dedup first (or add a distinguishing column) before salting. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val saltedLarge = large.withColumn("__salt",
      pmod(hash(large.columns.map(col): _*), lit(salts)))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Directory-partitioned parquet write — the scan-pruning layout for
    * very large fact tables (partition column should be low-cardinality,
    * e.g. a date). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Hash-partition by join key so several downstream joins/aggregations
    * on the same key reuse one exchange. */
  def repartitionForJoin(df: DataFrame, key: String, partitions: Int): DataFrame =
    df.repartition(partitions, col(key))

  /** Bloom-filter semi-join pruning: build a compact bloom sketch of the
    * small side's join keys (distributed aggregate, bounded-size result),
    * pre-filter the large side with `might_contain` BEFORE its shuffle,
    * then run the exact join. At 100 TB this is the difference between
    * shuffling the whole fact table and shuffling only rows that can
    * match — the same mechanism as Spark's own runtime bloom filters
    * (spark.sql.optimizer.runtime.bloomFilter), applied explicitly where
    * the optimizer's heuristics won't fire. The bloom has no false
    * negatives, so the result is exactly `large.join(small, key)`; false
    * positives are removed by the join itself.
    */
  def bloomPruneJoin(large: DataFrame, small: DataFrame, key: String,
      expectedItems: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.graft.Shims
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.types.BinaryType

    val bloomAgg = Shims.column(
      new BloomFilterAggregate(XxHash64(Seq(Shims.expression(col(key))), 42L), expectedItems)
        .toAggregateExpression())
    val bloom = small.select(bloomAgg.as("b")).head().getAs[Array[Byte]](0)

    val mightContain = Shims.column(new BloomFilterMightContain(
      Literal.create(bloom, BinaryType),
      XxHash64(Seq(Shims.expression(col(key))), 42L)))
    large.filter(mightContain).join(small, key)
  }

  /** Bloom-prefiltered ANTI join: `large` minus rows whose `keys` appear
    * in `small`. The bloom (built over `small`'s key hash, no false
    * negatives) splits `large` map-side: rows the filter has never seen
    * are DEFINITELY not in `small` and pass through with no shuffle at
    * all; only the might-contain sliver (true matches + fpp) takes the
    * exact anti-join. When `large` is a generated candidate set orders
    * of magnitude bigger than `small` (link-prediction pairs vs existing
    * edges), this removes the single largest shuffle of the plan.
    *
    * The two branches each evaluate `large` once: a parquet-backed
    * `large` pays two pushed-filter scans (map-side, no shuffle — the
    * intended trade), but a COMPUTED `large` re-runs its whole upstream
    * plan twice — cache or localCheckpoint it first, or fold the
    * subtraction into the producing aggregate as marker rows (the
    * q188 wedge pattern) instead of calling this at all. */
  def bloomPruneAntiJoin(large: DataFrame, small: DataFrame,
      keys: Seq[String], expectedItems: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.graft.Shims
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.types.BinaryType

    def hashOf(cols: Seq[String]) =
      XxHash64(cols.map(k => Shims.expression(col(k))), 42L)
    val bloomAgg = Shims.column(
      new BloomFilterAggregate(hashOf(keys), expectedItems)
        .toAggregateExpression())
    val bloom = small.select(bloomAgg.as("b")).head().getAs[Array[Byte]](0)
    // BloomFilterAggregate over zero rows is NULL, and might-contain on a
    // NULL bloom is NULL — both branches would drop every row. An anti
    // join against an empty right side keeps all of `large`.
    if (bloom == null) return large
    val mightContain = Shims.column(new BloomFilterMightContain(
      Literal.create(bloom, BinaryType), hashOf(keys)))
    large.filter(!mightContain)
      .unionAll(large.filter(mightContain).join(small, keys, "left_anti"))
  }

  /** Distributed inclusive prefix sum over a GLOBAL ordering — the
    * two-phase parallel scan, not a single-partition window (which is
    * what `Window.orderBy` without a partition key degrades to — the
    * whole table through one task):
    *
    *  1. range-partition by the order key, so partitions are globally
    *     ordered and each is locally sorted by the window below;
    *  2. one tiny aggregate collects per-partition sums (|partitions|
    *     rows), prefix-summed on the driver into per-partition offsets;
    *  3. a per-PARTITION running-sum window (parallelism = partition
    *     count) plus the broadcast offset gives the global scan.
    *
    * The order key must be unique (ties could straddle a partition
    * boundary and make the result partition-dependent). The value column
    * is summed as LONG — use integral inputs.
    *
    * Both passes MUST see the same physical partitioning: the offsets
    * are keyed by `spark_partition_id`, and a range exchange SAMPLES its
    * bounds with a seed derived from the (fresh, per-plan) RDD — two
    * independently planned actions can place boundary rows in different
    * partitions, silently corrupting every row after the first moved one.
    * (Small inputs hide this: when the sampler sees the whole population
    * the bounds are data-deterministic. At scale they are not.)
    * `localCheckpoint(eager=false)` pins the plan to ONE materialized
    * RDD — one exchange, one set of bounds: the offsets pass
    * materializes it, the window pass re-reads the same blocks, and the
    * blocks are freed by the ContextCleaner once the caller drops the
    * result (unlike `cache()`, whose CacheManager reference never dies).
    * Trade: checkpoint blocks are not fault-tolerant — an executor loss
    * mid-query fails the job instead of recomputing; for a multi-hour
    * 100 TB run prefer a reliable checkpoint dir. RDD `zipWithIndex`
    * makes the same single-partitioner choice for the same reason.
    */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String,
      resultCol: String = "cumsum", inclusive: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranged = df
      .repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", col(valueCol).cast("long"))
      .barrierLazy()
    // coalesce: sum() of an all-NULL partition is NULL, not 0
    val partSums = ranged.groupBy(col("__pid"))
      .agg(coalesce(sum(col("__v")), lit(0L)).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = partSums.scanLeft((0, 0L)) { case ((_, acc), (pid, s)) => (pid, acc + s) }
      .init.zip(partSums).map { case ((_, acc), (pid, _)) => pid -> acc }.toMap
    val offset = coalesce(
      element_at(typedLit(offsets), col("__pid")), lit(0L))
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding,
        if (inclusive) Window.currentRow else -1)
    ranged
      .withColumn(resultCol,
        coalesce(sum(col("__v")).over(w), lit(0L)) + offset)
      .drop("__pid", "__v")
  }

  /** Multi-column [[prefixSum]]: one range exchange + one window pass
    * computing the global running sum of SEVERAL long columns at once
    * (each lands in `<name><suffix>`) — what the survival/risk-set
    * spines need (events, censored, cohort membership cumulated over
    * the same distinct-duration ordering) without paying the exchange
    * per column. Same contract as [[prefixSum]]: unique order key,
    * values summed as LONG, one-materialization discipline. */
  def prefixSums(df: DataFrame, orderCol: String, valueCols: Seq[String],
      suffix: String = "_cum", inclusive: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    def vc(c: String) = s"__v_$c"
    val ranged = df
      .repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .select(col("*") +: valueCols.map(c =>
        col(c).cast("long").as(vc(c))): _*)
      .barrierLazy()
    val sumExprs = valueCols.map(c =>
      coalesce(sum(col(vc(c))), lit(0L)).as(vc(c)))
    val partSums = ranged.groupBy(col("__pid"))
      .agg(sumExprs.head, sumExprs.tail: _*)
      .collect().map(r => (r.getInt(0),
        valueCols.indices.map(i => r.getLong(1 + i)).toArray))
      .sortBy(_._1)
    val offsetMaps: Seq[Map[Int, Long]] = valueCols.indices.map { ci =>
      partSums.scanLeft((0, 0L)) { case ((_, acc), (pid, ss)) =>
        (pid, acc + ss(ci))
      }.init.zip(partSums).map { case ((_, acc), (pid, _)) => pid -> acc }
        .filter(_._2 != 0L).toMap
    }
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding,
        if (inclusive) Window.currentRow else -1)
    val withCums = valueCols.zipWithIndex.foldLeft(ranged) {
      case (acc, (c, ci)) =>
        val offset = if (offsetMaps(ci).isEmpty) lit(0L)
          else coalesce(
            element_at(typedLit(offsetMaps(ci)), col("__pid")), lit(0L))
        acc.withColumn(s"$c$suffix",
          coalesce(sum(col(vc(c))).over(w), lit(0L)) + offset)
    }
    withCums.drop("__pid" +: valueCols.map(vc): _*)
  }

  /** [[prefixSum]] over DOUBLE values — for running sums that are
    * intrinsically floating (cumulative hazards, log-survival factors)
    * on the large-spine route where no exact-integer form exists.
    *
    * Caveat vs the single-task `Window.orderBy` it replaces: each
    * partition's contribution to the carry-in is an aggregate sum
    * (associativity-order not the strict row order), so results can
    * differ from a strictly sequential scan in the last ulps at
    * partition boundaries. Callers keep the sequential single-task
    * window on oracle-checked small frames and route here only past
    * [[maxOrderedFrameRows]], where bit-exact sequential semantics are
    * unobservable anyway. */
  def prefixSumD(df: DataFrame, orderCol: String, valueCol: String,
      resultCol: String = "cumsum", inclusive: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranged = df
      .repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", col(valueCol).cast("double"))
      .barrierLazy()
    val partSums = ranged.groupBy(col("__pid"))
      .agg(coalesce(sum(col("__v")), lit(0.0)).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1)
    val offsets = partSums.scanLeft((0, 0.0)) { case ((_, acc), (pid, s)) => (pid, acc + s) }
      .init.zip(partSums).map { case ((_, acc), (pid, _)) => pid -> acc }.toMap
    val offset = coalesce(
      element_at(typedLit(offsets), col("__pid")), lit(0.0))
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding,
        if (inclusive) Window.currentRow else -1)
    ranged
      .withColumn(resultCol,
        coalesce(sum(col("__v")).over(w), lit(0.0)) + offset)
      .drop("__pid", "__v")
  }

  /** Distributed prefix MAX over a global ordering (ascending or
    * descending) — the running-maximum scan behind skyline dominance
    * tests, expressed without a single-partition window. Unlike the
    * floating sums, max is ASSOCIATIVE AND ORDER-INSENSITIVE, so this
    * is bit-identical to the sequential window at any partitioning —
    * callers can ride it unconditionally, no probe needed.
    *
    * The carry-in table is built IN Spark (a window over the
    * |partitions|-row per-partition-max aggregate — bounded metadata,
    * like [[prefixSum]]'s offset collect) and broadcast back, which
    * keeps `valueCol`'s NATIVE type: no driver-side casts, exact for
    * longs/decimals. Same unique-order-key contract and
    * one-materialization discipline as [[prefixSum]]; `resultCol` is
    * NULL where the (possibly exclusive) frame is empty, matching
    * `max().over(...)`. */
  def prefixMax(df: DataFrame, orderCol: String, valueCol: String,
      resultCol: String, descending: Boolean = false,
      inclusive: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = if (descending) col(orderCol).desc else col(orderCol).asc
    val ranged = df
      .repartitionByRange(ord)
      .withColumn("__pid", spark_partition_id())
      .barrierLazy()
    // exclusive running max across partitions in pid order; the window
    // input is |partitions| rows of metadata, never data-sized
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__pid"))
      .agg(max(col(valueCol)).as("__pm"))
      .withColumn("__carry", max(col("__pm")).over(wOff))
      .select(col("__pid"), col("__carry"))
    val w = Window.partitionBy(col("__pid")).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding,
        if (inclusive) Window.currentRow else -1)
    // greatest() skips NULLs: first row of the first partition has a
    // NULL frame and a NULL carry -> NULL, matching the plain window
    ranged.join(broadcast(offsets), Seq("__pid"))
      .withColumn(resultCol,
        greatest(max(col(valueCol)).over(w), col("__carry")))
      .drop("__pid", "__carry")
  }

  /** Row-count bound for letting an ordered frame run through ONE
    * window task (`Window.orderBy` with no partition key). Reduced
    * spines (distinct durations, distinct event times, per-x maxima)
    * are usually far below it; operators probe the spine's count and
    * route to the range-partitioned prefix machinery above when a
    * continuous-valued column makes the spine corpus-sized. 2M small
    * rows sort in well under a second in one task; past that the
    * single task becomes the stage's straggler. */
  val maxOrderedFrameRows: Long = 2L * 1000 * 1000

  /** Grouped distributed prefix sum: for each row, Σ `valueCol` over rows
    * of the SAME group whose `orderCol` is before it (inclusive of the
    * current row, or strictly before with `inclusive = false`) — the
    * primitive behind distributed midranks, grouped ECDFs, and grouped
    * medians when the group key has only a handful of distinct values.
    *
    * `Window.partitionBy(lowCardKey).orderBy(value)` plans ONE task per
    * group — a single-task sort of the biggest table at 100 TB. Here the
    * range exchange partitions on (groupCols, orderCol) jointly, so each
    * group's rows spread over many partitions in global order and the
    * per-partition windows stay task-sized; a tiny collected
    * (partition × group) count table (bounded metadata, like
    * [[prefixSum]]'s) supplies each partition its per-group offset.
    *
    * Requirements: at most one row per (groupCols, orderCol) — feed it a
    * value SPINE (`groupBy(group, value).count`), never raw rows — so
    * ties never straddle a partition boundary (the range partitioner
    * sends equal keys to one partition, and within a partition the
    * window order is total). `valueCol` is summed as LONG. Group columns
    * must be non-null (spines from groupBy keep NULL groups; those rows
    * pass through with a sentinel key). Same one-materialization
    * discipline as [[prefixSum]]: `localCheckpoint(false)` pins both
    * passes to one set of range bounds.
    */
  def groupedPrefixSum(df: DataFrame, groupCols: Seq[String],
      orderCol: String, valueCol: String, resultCol: String = "cumsum",
      inclusive: Boolean = true): DataFrame =
    groupedPrefixSumOrd(df, groupCols, Seq(orderCol), valueCol, resultCol,
      inclusive)

  /** [[groupedPrefixSum]] under a COMPOSITE ordering: the running sum
    * follows the lexicographic order of `orderCols` within each group —
    * what exact per-row ranks need when the value column alone has ties
    * broken by a tiebreaker column (isotonic binning's
    * (score, event_id)). Same spine contract, extended to the composite
    * key: at most one row per (groupCols, orderCols) — the range
    * partitioner keeps equal composite keys in one partition, so the
    * result stays partition-invariant. */
  def groupedPrefixSumOrd(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[String], valueCol: String,
      resultCol: String = "cumsum",
      inclusive: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val gCols = groupCols.map(col)
    // string-rendered group key for the driver-side offset map; 
    // separates columns,  marks NULL (distinct from any rendering)
    def gkey(pid: Column): Column = concat_ws("",
      pid.cast("string") +: gCols.map(c =>
        coalesce(c.cast("string"), lit(""))): _*)
    val ranged = df
      .repartitionByRange(gCols ++ orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", col(valueCol).cast("long"))
      .barrierLazy()
    val partSums = ranged
      .groupBy(col("__pid"), gkey(lit("")).as("__gk"))
      .agg(coalesce(sum(col("__v")), lit(0L)).as("s"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // per group, exclusive running total across partitions in pid order
    val offsets: Map[String, Long] = partSums
      .groupBy(_._2).iterator.flatMap { case (_, rows) =>
        val sorted = rows.sortBy(_._1)
        sorted.zip(sorted.scanLeft(0L)(_ + _._3)).map {
          case ((pid, gk, _), before) => s"$pid$gk" -> before
        }
      }.filter(_._2 != 0L).toMap
    val offset = if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(offsets), gkey(col("__pid"))), lit(0L))
    val w = Window.partitionBy(col("__pid") +: gCols: _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding,
        if (inclusive) Window.currentRow else -1)
    ranged
      .withColumn(resultCol, coalesce(sum(col("__v")).over(w), lit(0L)) + offset)
      .drop("__pid", "__v")
  }

  /** Multi-column [[groupedPrefixSum]]: one range exchange + one window
    * pass computing the grouped running sum of SEVERAL value columns at
    * once (each lands in `<name><suffix>`). The q384 energy-distance
    * shape needs four aligned prefix streams (counts and count-weighted
    * values for both samples) — four separate groupedPrefixSum calls
    * would pay the range exchange and the offset-map collect four
    * times over identical layouts. Same spine requirements as the
    * single-column form; values are summed as LONG. */
  def groupedPrefixSums(df: DataFrame, groupCols: Seq[String],
      orderCol: String, valueCols: Seq[String], suffix: String = "_cum",
      inclusive: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    val gCols = groupCols.map(col)
    def gkey(pid: Column): Column = concat_ws("",
      pid.cast("string") +: gCols.map(c =>
        coalesce(c.cast("string"), lit(""))): _*)
    def vc(c: String) = s"__v_$c"
    val ranged = df
      .repartitionByRange(gCols :+ col(orderCol): _*)
      .withColumn("__pid", spark_partition_id())
      .select(col("*") +: valueCols.map(c =>
        col(c).cast("long").as(vc(c))): _*)
      .barrierLazy()
    val sumExprs = valueCols.map(c =>
      coalesce(sum(col(vc(c))), lit(0L)).as(vc(c)))
    val partSums = ranged
      .groupBy(col("__pid"), gkey(lit("")).as("__gk"))
      .agg(sumExprs.head, sumExprs.tail: _*)
      .collect().map(r => (r.getInt(0), r.getString(1),
        valueCols.indices.map(i => r.getLong(2 + i)).toArray))
    // per group and column, exclusive running total across partitions
    val offsetMaps: Seq[Map[String, Long]] = valueCols.indices.map { ci =>
      partSums.groupBy(_._2).iterator.flatMap { case (_, rows) =>
        val sorted = rows.sortBy(_._1)
        sorted.zip(sorted.scanLeft(0L)(_ + _._3(ci))).map {
          case ((pid, gk, _), before) => s"$pid$gk" -> before
        }
      }.filter(_._2 != 0L).toMap
    }
    val w = Window.partitionBy(col("__pid") +: gCols: _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding,
        if (inclusive) Window.currentRow else -1)
    val withCums = valueCols.zipWithIndex.foldLeft(ranged) {
      case (acc, (c, ci)) =>
        val offset = if (offsetMaps(ci).isEmpty) lit(0L)
          else coalesce(
            element_at(typedLit(offsetMaps(ci)), gkey(col("__pid"))), lit(0L))
        acc.withColumn(s"$c$suffix",
          coalesce(sum(col(vc(c))).over(w), lit(0L)) + offset)
    }
    withCums.drop("__pid" +: valueCols.map(vc): _*)
  }

  /** Distributed midranks per group over a value spine: reduces `df` to
    * one row per (groupCols, valueCol) with
    *
    *  - `tieCol`: the number of input rows carrying this exact value,
    *  - `cumCol`: inclusive ECDF count (# rows with value ≤ this one),
    *  - `rank2Col`: the DOUBLED midrank 2·r = 2·cum − t + 1, an exact
    *    integer (midranks are half-integers; doubling keeps every
    *    data-sized reduction in exact long arithmetic).
    *
    * Join the spine back to the rows on (groupCols, valueCol) — a plain
    * hash shuffle on a high-cardinality key — to rank the raw data. This
    * replaces `rank().over(Window.partitionBy(group).orderBy(value))`,
    * which plans one task per group, with [[groupedPrefixSum]]'s
    * range-partitioned scan: correct and parallel at any group
    * cardinality.
    */
  def groupedMidranks(df: DataFrame, groupCols: Seq[String],
      valueCol: String, tieCol: String = "ties", cumCol: String = "cum",
      rank2Col: String = "rank2"): DataFrame = {
    val spine = df
      .filter(col(valueCol).isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as(tieCol))
    groupedPrefixSum(spine, groupCols, valueCol, tieCol, cumCol)
      .withColumn(rank2Col, col(cumCol) * 2 - col(tieCol) + 1)
  }

  /** Persist as a bucketed, sorted table: repeated joins/aggregations on
    * the bucket key then run shuffle-free (bucket-to-bucket sort-merge).
    * The canonical layout for a 100 TB fact table that's joined on the
    * same key by every pipeline run — the shuffle is paid once at write
    * time instead of per query. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    // a previous process may have left the managed location behind while
    // the in-memory catalog forgot the table — clear both
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = df.sparkSession.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val loc = new java.io.File(s"$warehouse/${table.toLowerCase}")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(loc)
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }

  /** Rendezvous (highest-random-weight, Thaler & Ravishankar 1998)
    * shard of a non-negative id: the shard whose keyed hash of the id
    * is largest. The property mod-hashing lacks: growing `k` shards to
    * `k+1` moves only ~1/(k+1) of the keys (each key moves only if the
    * NEW shard wins its rendezvous), where `id % k` → `id % (k+1)`
    * reshuffles ~k/(k+1) of them — the difference between topping up a
    * 100 TB layout and rewriting it.
    *
    * Pure integer arithmetic on the id's low 31 bits (the [[Mixing]]
    * overflow discipline), replayable bit-for-bit in any engine. The
    * per-shard weights are packed as `hash·64 + (63 − shard)` so the
    * arg-max is a plain `array_max` with a deterministic lowest-shard
    * tie-break — no struct compare to replay. `shards ≤ 64`. */
  def rendezvousShard(id: Column, shards: Int): Column = {
    require(shards >= 1 && shards <= 64, s"shards must be in [1,64]: $shards")
    val packed = transform(sequence(lit(0), lit(shards - 1)), s => {
      val mix = pmod(pmod(id, lit(2147483648L)) * lit(1000003L) +
        s * lit(999983L), lit(2147483648L))
      val h = pmod(mix * lit(2654435761L), lit(2147483648L))
      h * lit(64L) + (lit(63L) - s)
    })
    (lit(63L) - pmod(array_max(packed), lit(64L))).cast("int")
  }

  /** Z-order (Morton) value of two non-negative dimension columns: bit i
    * of `a` lands at position 2i, bit i of `b` at 2i+1, so sorting by the
    * result clusters rows that are close in BOTH dimensions. Inputs must
    * already be reduced to `bits` bits (e.g. `col % (1 << bits)` or a
    * rank); plain long arithmetic, codegen'd. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Z-ordered parquet layout: range-partition + sort by the interleaved
    * key before writing, so every file covers a small bounding box in
    * BOTH dimensions and min/max row-group stats skip files for
    * predicates on either column. A single-column sort gives perfect
    * clustering on one dimension and none on the other; Z-ordering is
    * the standard multi-dimensional compromise (Delta/Iceberg OPTIMIZE
    * ZORDER — here as a plain-parquet write). */
  def zOrderWrite(df: DataFrame, path: String, colA: String, colB: String,
      files: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetBytes`-sized files (by current on-disk size). Streaming
    * sinks and per-partition writers accrete thousands of small files
    * whose open/footer cost dominates scans at 100 TB; periodic
    * compaction is the standard fix. Returns the file count written. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    import org.apache.hadoop.fs.Path
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    // all listing and movement goes through the Hadoop FileSystem, so a
    // non-local layout (HDFS/S3A) works — or fails fast here, before any
    // data has moved — instead of silently no-opping through java.io.File
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val listing = fs.listStatus(dir)
    // a hive-partitioned layout must be compacted per partition directory
    // — rewriting the root would flatten the partition structure
    val partDirs = listing.filter(f => f.isDirectory && f.getPath.getName.contains("="))
    require(partDirs.isEmpty,
      s"compact expects a flat layout; $path is partitioned " +
        s"(${partDirs.take(3).map(_.getPath.getName).mkString(", ")}…) — " +
        "compact each partition directory individually")
    val bytes = listing
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    val files = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val base = path.stripSuffix("/")
    val tmp = new Path(base + ".compact_tmp")
    spark.read.parquet(path).repartition(files).write.mode("overwrite").parquet(tmp.toString)
    // crash-safe swap — at every step the full dataset exists under a
    // well-known name, never only in the tmp directory:
    //  1. original renamed aside          → data at .compact_old (and the
    //     committed rewrite at .compact_tmp); recovery: rename .compact_old back
    //  2. rewrite renamed into place      → data live at `path`
    //  3. the old copy is dropped         → done
    val old = new Path(base + ".compact_old")
    fs.delete(old, true) // leftover of a previous crash between 2 and 3
    require(fs.rename(dir, old), s"rename $path -> $old failed")
    require(fs.rename(tmp, dir), s"rename $tmp -> $path failed; original at $old")
    fs.delete(old, true)
    files
  }
}
