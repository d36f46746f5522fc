package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact distributed quantiles via sort-rank, not value-count maps.
  *
  * Spark's built-in exact `percentile` aggregate accumulates a
  * value→count map per partition and merges them on the reducer — memory
  * grows with the DISTINCT-VALUE cardinality, which is unbounded for
  * continuous measures at 100 TB (and it is several times slower than a
  * sort even at sf0.1).
  *
  * Plan shape (2 passes over the sorted data, parallelism bound by
  * partition count — NOT by group count, which is what a
  * `row_number() OVER (PARTITION BY group)` window degrades to):
  *
  *  1. range-partition on (group, value) and sort within partitions —
  *     a parallel global sort;
  *  2. pass 1: per partition, emit the ordered run-length histogram
  *     (group, count) — tiny, collected to the driver;
  *  3. driver: prefix-sum the histograms into per-(partition, group)
  *     start ranks and per-group totals; compute each quantile's two
  *     interpolation neighbor ranks;
  *  4. pass 2: walk the same sorted partitions, emit ONLY rows whose
  *     within-group rank is an interpolation neighbor (≤ 2·|ps| rows
  *     per group);
  *  5. final: a trivial aggregate interpolates, matching SQL
  *     `quantile_cont`: pos = p·(n−1)+1, value = v_lo + frac·(v_hi−v_lo).
  */
object Quantiles {

  /** @param df        input
    * @param groupCols grouping columns (empty = global)
    * @param valueCol  numeric column to take quantiles of (nulls dropped)
    * @param ps        quantile fractions in [0,1], each becomes column `p<frac·100>`
    */
  def exactQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty, "need at least one quantile fraction")
    val spark = df.sparkSession
    val v = col(valueCol).cast("double")
    val keyCols = if (groupCols.isEmpty) Seq(lit(0).as("__g")) else groupCols.map(col)
    val keyNames = if (groupCols.isEmpty) Seq("__g") else groupCols
    val rows = df.filter(v.isNotNull).select(keyCols :+ v.as("__v"): _*)

    val nKey = keyNames.length
    val sorted = rows
      .repartitionByRange((keyNames :+ "__v").map(col): _*)
      .sortWithinPartitions((keyNames :+ "__v").map(col): _*)
    // one compiled copy reused by both passes: same sort, same partitions
    val sortedRdd = sorted.queryExecution.toRdd
      .mapPartitions(it => it.map(_.copy()), preservesPartitioning = true)
    val schema = sorted.schema
    val keyOf: org.apache.spark.sql.catalyst.InternalRow => Seq[Any] = r =>
      (0 until nKey).map(i => r.get(i, schema(i).dataType))

    // pass 1: ordered (group, count) run-length histogram per partition
    val hist: Array[(Int, Seq[(Seq[Any], Long)])] = sortedRdd
      .mapPartitionsWithIndex { (pid, it) =>
        val runs = scala.collection.mutable.ArrayBuffer.empty[(Seq[Any], Long)]
        var cur: Seq[Any] = null
        var n = 0L
        it.foreach { r =>
          val k = keyOf(r)
          if (k == cur) n += 1
          else { if (cur != null) runs += ((cur, n)); cur = k; n = 1L }
        }
        if (cur != null) runs += ((cur, n))
        Iterator.single((pid, runs.toSeq))
      }.collect().sortBy(_._1)

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
        ps.map(p => org.apache.spark.sql.types.StructField(
          s"p${(p * 100).round}", org.apache.spark.sql.types.DoubleType)))
    val res = spark.createDataFrame(
      spark.sparkContext.parallelize(out.toList, 1), outSchema)
    if (groupCols.isEmpty) res.drop("__g") else res
  }
}
