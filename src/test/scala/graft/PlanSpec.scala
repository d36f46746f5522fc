package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Physical-plan guards: the properties that keep queries fast at scale
  * must survive refactors — filter/column pushdown to the parquet scan,
  * broadcast joins for dimensions, partial aggregation, and no accidental
  * cartesian products in the similarity pipeline.
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)
  private val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q01: filter pushed to parquet scan and columns pruned") {
    val p = plan("q01_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushdown in:\n$p")
    assert(!p.contains("l_orderkey"), "scan should prune unused columns")
  }

  test("q02: quantity filter reaches the scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity"))
  }

  test("q04: dimension joins broadcast, aggregation is partial+final") {
    val p = plan("q04_multi_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3)
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q29: inverted-index jaccard has no cartesian product") {
    val p = plan("q29_shingle_jaccard")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q42: outer join preserved (no inner-join rewrite)") {
    val p = plan("q42_left_outer_join")
    assert(p.contains("LeftOuter"))
  }

  test("q69: binned range join is a hash join, not a nested loop") {
    val p = plan("q69_range_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q71: bloom pre-filter sits on the fact side before the join") {
    val a = SparkEntry.queries("q71_bloom_join")(spark, sf)
      .queryExecution.analyzed.toString
    assert(a.contains("might_contain"), a)
  }

  test("q64: quantile sort is range-partitioned, not per-group") {
    val p = plan("q64_quantiles")
    assert(p.contains("rangepartitioning"), p)
  }

  test("q49: served IVF search scans only the probed cell partitions") {
    val df = SparkEntry.queries("q49_ann_ivf")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the layout read must carry a NON-EMPTY partition filter on the cell
    // column (every scan prints "PartitionFilters: []", so match content)
    // — full-corpus assignment per query is exactly what the layout avoids
    assert("""PartitionFilters: \[[^\]]*cell""".r.findFirstIn(p).isDefined,
      s"expected cell partition pruning in:\n$p")
    assert(df.count() > 0)
  }

  test("q80: the whole column profile reads the fact table exactly once") {
    val p = plan("q80_profile")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"profile must be a single fact scan:\n$p")
  }

  test("q87: domain rebalancing broadcasts the count side, one fact scan pipeline") {
    val p = plan("q87_domain_mix")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "counts must broadcast, not shuffle the corpus")
  }

  test("q89: shard packing never funnels the corpus through one task") {
    val p = plan("q89_pack_shards")
    // a naive global-window cumsum plans an Exchange SinglePartition;
    // the two-phase prefix sum must not
    assert(!p.contains("SinglePartition"), s"single-partition exchange in:\n$p")
    assert(p.contains("Window"), p)
  }

  test("q48: as-of join is one shuffle, no self-join back-probe") {
    val p = plan("q48_asof_join")
    // a single window over the union — no join operator anywhere
    assert(!p.contains("Join"), p)
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
  }

  test("q93: eval gram set broadcasts — the corpus is never shuffled for the probe") {
    val p = plan("q93_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "eval grams must broadcast, not sort-merge against the corpus")
  }

  test("q95: incremental verify touches corpus text via a broadcast semi-join") {
    val p = plan("q95_incremental_dedup")
    assert(p.contains("LeftSemi"), s"expected candidate-id semi-join in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q96: split assignment is map-side only — no exchange before the final agg") {
    val p = plan("q96_dataset_split")
    // one shuffle total: the (split, lang) aggregate's own exchange
    assert("Exchange".r.findAllIn(p).size <= 2, s"extra shuffles in:\n$p")
    assert(!p.contains("Join"), "split assignment must not join")
  }

  test("rank-based stats never window-sort data through a low-cardinality group key") {
    // the scale-killer shape: Window.partitionBy(region|returnflag|priority)
    // .orderBy(value) plans ONE task per group over the raw table. Every
    // rank/ECDF/median in the stats family must instead ride
    // Scale.groupedPrefixSum (windows keyed by __pid — task-sized range
    // partitions) or key its windows on a high-cardinality column; the
    // only group-keyed windows allowed are over inputs already reduced to
    // ≤ (groups × treatments) rows by an aggregate.
    def partSpecs(q: String): Seq[String] =
      """Window \[[^\]]*\], \[([^\]]*)\], \[""".r
        .findAllMatchIn(plan(q)).map(_.group(1)).toSeq
    // pure spine machinery: every window keyed by the range partition id
    for (q <- Seq("q255_mann_whitney", "q310_spearman", "q360_ecod_outliers")) {
      val specs = partSpecs(q)
      assert(specs.nonEmpty, s"$q should still use the grouped scan")
      assert(specs.forall(_.contains("__pid")),
        s"$q has a window not keyed by __pid: $specs")
    }
    // q360's top-5 runs on the bounded-heap operator, not a per-flag sort
    assert(plan("q360_ecod_outliers").contains("TopKPerGroup"))
    // kruskal–wallis: the one group-keyed window left combines the
    // per-treatment rank sums — its input is the (group × treatment)
    // aggregate (≤ k·groups rows), never raw data
    val kwNonPid = partSpecs("q308_kruskal_wallis").filterNot(_.contains("__pid"))
    assert(kwNonPid.forall(s => s.contains("r_name") && !s.contains("__x")),
      s"q308 non-pid windows must ride the bounded per-treatment table: $kwNonPid")
    // brown–forsythe: only the ≤5-row group-terms cumsum may be unkeyed
    val bfNonPid = partSpecs("q367_brown_forsythe").filterNot(_.contains("__pid"))
    assert(bfNonPid.forall(_.trim.isEmpty),
      s"q367 non-pid windows must be the bounded group-terms cumsum: $bfNonPid")
    // jonckheere: grid windows must key on the high-card value column
    val jtNonPid = partSpecs("q324_jonckheere").filterNot(_.contains("__pid"))
    assert(jtNonPid.nonEmpty && jtNonPid.forall(_.contains("x#")),
      s"q324 grid windows must partition on (region, value): $jtNonPid")
    // the round-9 rewrites: KS / Gini / Lorenz / isotonic / stump ride
    // the grouped scan — the ONLY windows left are groupedPrefixSum's
    // own __pid-keyed running sums; cumulative shares / argmaxes are
    // array folds or max_by aggregates, never group-keyed windows
    for (q <- Seq("q263_ks_test", "q254_gini", "q269_lorenz",
        "q233_isotonic", "q267_decision_stump")) {
      val specs = partSpecs(q)
      assert(specs.nonEmpty && specs.forall(_.contains("__pid")),
        s"$q has a window not keyed by __pid: $specs")
    }
    // wilcoxon signed-rank: |d|-midranks ride the grouped scan — no
    // window keyed solely on the 5-value segment column
    val wsrSpecs = partSpecs("q400_wilcoxon_signed_rank")
    assert(wsrSpecs.nonEmpty && wsrSpecs.forall(_.contains("__pid")),
      s"q400 has a window not keyed by __pid: $wsrSpecs")
    // friedman: in-block ranking windows key on (dow, user) — the block
    // column grows with the data while each partition holds ≤ k rows
    val frSpecs = partSpecs("q399_friedman")
    assert(frSpecs.nonEmpty && frSpecs.forall(_.contains("__blk")),
      s"q399 windows must be keyed on the data-growing block column: $frSpecs")
    // hill tail index: the top-(k+1) comes off the bounded-heap
    // operator — no window (and so no per-segment sort) anywhere
    val hillPlan = plan("q403_hill_tail")
    assert(hillPlan.contains("TopKPerGroup"), "q403 must use the bounded heap")
    assert(partSpecs("q403_hill_tail").isEmpty,
      s"q403 should have no windows: ${partSpecs("q403_hill_tail")}")
    // tail dependence: rank-counts ride the grouped scan — every window
    // __pid-keyed, never a segment-keyed cume over customer rows
    val tdSpecs = partSpecs("q404_tail_dependence")
    assert(tdSpecs.nonEmpty && tdSpecs.forall(_.contains("__pid")),
      s"q404 has a window not keyed by __pid: $tdSpecs")
    // page trend: ranking windows key on (group, block) — data-growing
    // blocks, ≤ k rows per partition (the q399 shape); the only other
    // window is the bounded treatment-spine ordinal
    val ptSpecs = partSpecs("q413_page_trend")
    assert(ptSpecs.nonEmpty && ptSpecs.forall(s =>
      s.contains("__blk") || s.contains("__g")),
      s"q413 windows must key on the block or bounded spine: $ptSpecs")
    assert(ptSpecs.exists(_.contains("__blk")),
      s"q413 must rank inside data-growing blocks: $ptSpecs")
    // mood median: the median comes off the __pid-keyed grouped scan;
    // the only group-keyed window is the ≤k-row chi-square cumsum
    val mmSpecs = partSpecs("q414_mood_median")
    assert(mmSpecs.exists(_.contains("__pid")),
      s"q414's median must ride the grouped scan: $mmSpecs")
  }

  test("survival/skyline routed paths window only on __pid or bounded carry frames") {
    // round-10 guards: skyline rides Scale.prefixMax unconditionally and
    // the survival trio routes past maxSpineRows — on those paths no
    // Window may sort a data-sized frame through one task. Visible
    // windows (localCheckpoint truncates lineage at each prefix pass)
    // must be keyed on __pid; the only unkeyed window allowed is
    // prefixMax's carry pass, whose input is the |partitions|-row
    // per-partition max aggregate (its exprs touch __pm).
    import spark.implicits._
    def windows(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
      """Window \[([^\]]*)\], \[([^\]]*)\], \[""".r
        .findAllMatchIn(df.queryExecution.executedPlan.toString)
        .map(m => (m.group(1), m.group(2))).toSeq
    def assertShape(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      windows(df).foreach { case (exprs, spec) =>
        assert(spec.contains("__pid") || exprs.contains("__pm"),
          s"$name has a window neither __pid-keyed nor the bounded carry: " +
            s"[$exprs], [$spec]")
      }
    val dur = (1 to 2000).map(i =>
      (((i * 97) % 997 + 1).toLong, if (i % 3 == 0) 0L else 1L,
        if (i % 2 == 0) "A" else "B")).toDF("dur", "obs", "side")
    val pts = (1 to 2000).map(i =>
      (((i * 37) % 1777).toLong, ((i * 53) % 911).toLong)).toDF("x", "y")
    assertShape("skyline2DMax", operators.TopK.skyline2DMax(pts, "x", "y"))
    assertShape("kaplanMeier routed",
      operators.TimeSeries.kaplanMeier(dur, "dur", "obs", maxSpineRows = 1L))
    assertShape("nelsonAalen routed",
      operators.TimeSeries.nelsonAalen(dur, "dur", "obs", maxSpineRows = 1L))
    assertShape("logRank routed",
      operators.Hypothesis.logRank(dur, "dur", "obs", "side", "A",
        maxSpineRows = 1L))
    // the skyline plan must actually CONTAIN the prefix windows (the
    // assertion above is vacuous if the regex matched nothing)
    assert(windows(operators.TopK.skyline2DMax(pts, "x", "y")).nonEmpty)
  }

  test("q101/q102: substring-dedup wide shuffles never carry token arrays") {
    // the repeat-test aggregate and its join must see only slim
    // (id, pos, hash) rows; token arrays stay map-side (the gram pass
    // reads them through a broadcast join of candidate positions)
    for (q <- Seq("q101_substring_dedup", "q102_duplication_ratio")) {
      val p = plan(q)
      val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
      assert(exchanges.nonEmpty, p)
      assert(!exchanges.exists(_.contains("__ws")),
        s"token-array column __ws crosses a shuffle in $q:\n${exchanges.mkString("\n")}")
      assert(p.contains("BroadcastHashJoin"), s"candidate positions must broadcast in $q")
    }
  }

  test("q103: sequence packing has no single-partition exchange") {
    val p = plan("q103_pack_sequences")
    assert(!p.contains("SinglePartition"), s"single-partition exchange in:\n$p")
    // the prefix sum pins its range partitioning by scanning ONE
    // checkpointed RDD in both passes (a re-planned range exchange
    // re-samples its bounds — boundary rows could move between the
    // offsets pass and the window pass, corrupting the cumsum at scale)
    assert(p.contains("ExistingRDD"), s"prefix sum must scan the pinned checkpoint:\n$p")
  }

  test("q105: stratified sampling filters on the scan — no join, no extra shuffle") {
    val p = plan("q105_stratified_sample")
    assert(!p.contains("Join"), "per-stratum rates must be inline, not joined")
    // only the final orderBy's range exchange
    assert("Exchange".r.findAllIn(p).size <= 1, s"extra shuffles in:\n$p")
  }

  test("q112: temperature mixing joins the corpus against broadcast domain rates") {
    val p = plan("q112_temperature_mix")
    // the admission join must broadcast the |domains|-row rate table;
    // the 1-row total-weight cross join is a broadcast nested loop by
    // construction and is fine — what must never appear is a
    // corpus-sized cartesian
    assert(p.contains("BroadcastHashJoin"), s"domain rates must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q113: contamination scoring broadcasts the eval grams like q93") {
    val p = plan("q113_contamination_ratio")
    assert(p.contains("BroadcastHashJoin"), s"eval grams must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q115: bigram LM joins counts by key — no corpus-sized nested loop") {
    val p = plan("q115_bigram_lm")
    // the only nested-loop join allowed is the broadcast of the 1-row
    // vocab-size aggregate; the bigram->count joins must be hash joins
    assert(!p.contains("CartesianProduct"), p)
    assert("HashJoin".r.findAllIn(p).nonEmpty, s"expected hash joins:\n$p")
  }

  test("q106: CDC merge is one keyed shuffle — union + window, no join") {
    val p = plan("q106_merge_upsert")
    assert(!p.contains("Join"), s"merge must not join:\n$p")
    assert(p.contains("Union"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"merge should shuffle once on the key (plus the final agg):\n$p")
  }

  test("q116: upsampling broadcasts the rate table and explodes map-side") {
    val p = plan("q116_upsample")
    assert(p.contains("BroadcastHashJoin"), s"domain rates must broadcast:\n$p")
    assert(p.contains("Generate explode"), s"copies must explode in-task:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // corpus side: scan -> broadcast join -> explode, never shuffled
    // (the one exchange allowed is the rate aggregate's, domain-sized)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q117: the Gopher gate is one scan with zero shuffles") {
    val q = SparkEntry.queries("q117_gopher_rules")(spark, sf)
    val p = q.queryExecution.executedPlan.toString
    // orderBy adds a range exchange for output; nothing else may shuffle
    assert("Exchange".r.findAllIn(p).size <= 1, s"gate must not shuffle:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q118: PCA is one aggregate pass plus a map-side projection") {
    val p = plan("q118_pca_project")
    // the projection plan (post-fit) must not join or shuffle beyond the
    // output sort — components are literals baked into the projection
    assert(!p.contains("Join"), s"projection must not join:\n$p")
    assert("Exchange".r.findAllIn(p).size <= 1, s"extra shuffles in:\n$p")
  }

  test("q124: schema evolution keeps the merge join-free") {
    val p = plan("q124_schema_evolution")
    // null-padding the base must stay a projection — union + window,
    // exactly the q106 shape, with no join introduced by the widening
    assert(!p.contains("Join"), s"evolved merge must not join:\n$p")
    assert(p.contains("Union"), p)
  }

  test("q144/q145: pair mining and the triangle join stay hash joins") {
    // the per-basket self-join and the degree-oriented wedge join are
    // both equi-joins; a nested loop here is quadratic in baskets/edges
    for (q <- Seq("q144_triangle_stats", "q145_basket_pairs")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      // q144's 1-row stat combines are broadcast nested loops by design;
      // the data-sized joins must not be
      if (q == "q145_basket_pairs")
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
    }
  }

  test("q146: bin expansion joins nothing — explode + hash aggregate only") {
    val p = plan("q146_interval_months")
    assert(!p.contains("Join"), s"no join of any kind expected:\n$p")
    assert(p.contains("Generate explode"), s"expected in-task explode:\n$p")
  }

  test("q149: gap fill has no exchange after the per-key window partitioning") {
    // daily reduce, calendar explode, LOCF window — all keyed on user:
    // one exchange tree on user-prefixed keys, no single-partition stage
    val p = plan("q149_gap_fill")
    assert(!p.contains("SinglePartition"), s"gap fill must distribute:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q119: an as-of read is a single multi-root file scan") {
    // plan the as-of reconstruction itself (the query's checksum side):
    // one FileScan whatever the bucket count, no union of per-bucket reads
    import spark.implicits._
    val path = s"/tmp/graft_tt_plan_${System.nanoTime()}"
    try {
      val base = (1L to 40L).map(k => (k, k)).toDF("k", "v")
      operators.Merge.writeBucketedSnapshot(base, path, Seq("k"), 4)
      val feed = base.filter($"k" % 2 === 0)
        .withColumn("v", $"v" + 1L)
        .withColumn("op", org.apache.spark.sql.functions.lit("U"))
        .withColumn("seq", org.apache.spark.sql.functions.lit(1L))
      operators.Merge.applyChangesBucketed(path, feed, Seq("k"), "op", "seq", 4,
        retainHistory = true)
      val p = operators.Merge.readSnapshotAsOf(spark, path, 0)
        .queryExecution.executedPlan.toString
      assert("Scan parquet".r.findAllIn(p).size == 1, s"expected ONE scan:\n$p")
      assert(!p.contains("Union"), s"as-of must not union per-bucket reads:\n$p")
    } finally {
      val pt = new org.apache.hadoop.fs.Path(path)
      pt.getFileSystem(spark.sessionState.newHadoopConf()).delete(pt, true)
    }
  }

  test("q130: pageRank iterations never re-shuffle the edge side") {
    // the edge artifact is hash-partitioned on the join key once at
    // build; in the final iteration's plan the cached edge scan must
    // feed the contrib join directly — an Exchange separated from the
    // edge cache only by partitioning-preserving nodes (project/filter/
    // sort/codegen) means the loop-invariant layout was lost and every
    // iteration would pay an edge-sized shuffle. The contrib AGGREGATE's
    // exchange legitimately moves join output (the walk stops at the
    // join). AQE + auto-broadcast off: the production shape at scale is
    // a shuffled join, which tiny test data would otherwise broadcast.
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val edges = (1L to 300L).map(i => (i % 30, (i * 11) % 30))
        .filter(e => e._1 != e._2).toDF("s", "t")
      // inspect the lazy plan builder directly — the public entry
      // localCheckpoints the result (hiding the tree) and unpersists
      // the cached artifacts; this IS the tree it materializes
      val (out, cached) = operators.Graph.pageRankPlan(edges, "s", "t",
        iterations = 2, damping = 0.85)
      val plan = out.queryExecution.executedPlan
      def cls(p: SparkPlan) = p.getClass.getSimpleName
      def isEdgeCacheScan(p: SparkPlan) =
        cls(p) == "InMemoryTableScanExec" &&
          Set("__src", "__dst", "__deg").subsetOf(p.output.map(_.name).toSet)
      val preserving = Set("ProjectExec", "FilterExec", "SortExec",
        "WholeStageCodegenExec", "InputAdapter", "ColumnarToRowExec")
      def reachesEdgeCache(p: SparkPlan): Boolean =
        isEdgeCacheScan(p) ||
          (preserving.contains(cls(p)) && p.children.exists(reachesEdgeCache))
      val offending = plan.collect {
        case ex if cls(ex) == "ShuffleExchangeExec" &&
          ex.children.exists(reachesEdgeCache) => ex
      }
      assert(plan.toString.contains("InMemoryTableScan"),
        s"edge artifact must serve from cache:\n$plan")
      assert(offending.isEmpty,
        s"edge cache re-shuffled beneath ${offending.size} Exchange(s):\n$plan")
      cached.foreach(_.unpersist(blocking = false))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("q411: katz walk rounds never re-shuffle the edge side") {
    // same loop-invariant-artifact contract as q130: the distinct edge
    // list is hash-partitioned on the per-round join key once and
    // cached — an Exchange whose input reaches the edge cache through
    // partitioning-preserving nodes means every walk round would pay
    // an edge-sized shuffle
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val edges = (1L to 300L).map(i => (i % 30, (i * 11) % 30))
        .filter(e => e._1 != e._2).toDF("s", "t")
      // inspect the lazy plan builder directly — the public entry
      // localCheckpoints the result (hiding the tree) and unpersists
      // the edge artifact; this IS the tree it materializes
      val (out, eCached) = operators.Graph.katzPlan(edges, "s", "t",
        iterations = 3, alpha = 0.2)
      val plan = out.queryExecution.executedPlan
      def cls(p: SparkPlan) = p.getClass.getSimpleName
      def isEdgeCacheScan(p: SparkPlan) =
        cls(p) == "InMemoryTableScanExec" &&
          Set("__src", "__dst").subsetOf(p.output.map(_.name).toSet)
      val preserving = Set("ProjectExec", "FilterExec", "SortExec",
        "WholeStageCodegenExec", "InputAdapter", "ColumnarToRowExec")
      def reachesEdgeCache(p: SparkPlan): Boolean =
        isEdgeCacheScan(p) ||
          (preserving.contains(cls(p)) && p.children.exists(reachesEdgeCache))
      val offending = plan.collect {
        case ex if cls(ex) == "ShuffleExchangeExec" &&
          ex.children.exists(reachesEdgeCache) => ex
      }
      assert(plan.toString.contains("InMemoryTableScan"),
        s"edge artifact must serve from cache:\n$plan")
      assert(offending.isEmpty,
        s"edge cache re-shuffled beneath ${offending.size} Exchange(s):\n$plan")
      eCached.foreach(_.unpersist(blocking = false))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("q182: co-occurrence pairs build map-side — no join, one explode") {
    val p = plan("q182_cooccurrence")
    assert(!p.contains("Join"), s"pairs must not come from a join:\n$p")
    assert(p.contains("Generate explode"), s"expected in-task explode:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-50 must be a bounded heap, not a global sort:\n$p")
  }

  test("q175/q176: the data-sized rank window is keyed on __pid, never global") {
    // prefixSum's range exchange sits behind its localCheckpoint (the
    // downstream plan reads the materialized RDD), so the visible
    // invariant is the WINDOW: partitioned by __pid — a global
    // (unpartitioned) window over the data would read SinglePartition
    for (q <- Seq("q175_skew_report", "q176_lift_table")) {
      val p = plan(q)
      assert(p.contains("windowspecdefinition(__pid"),
        s"$q: expected the per-partition rank window keyed on __pid:\n$p")
    }
  }

  test("q181: interval coverage stays keyed — no single-partition stage") {
    val p = plan("q181_interval_coverage")
    assert(!p.contains("SinglePartition"), s"must distribute:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q184/q188: graph moments and wedge joins never go cartesian") {
    // 1-row broadcast cross joins (the in-plan scalar pattern) are
    // expected; a CartesianProduct over data is not
    for (q <- Seq("q184_degree_mix", "q188_adamic_adar")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q: wedge/moment path must stay a hash join:\n$p")
    }
  }

  test("wedge-family edge subtraction rides markers, never a post-agg anti-join") {
    // existing edges fold into the wedge aggregate as zero-weight
    // marker rows; an anti-join of the candidate-pair set (orders of
    // magnitude larger than the edge list) against the edges would
    // re-shuffle the biggest intermediate of the plan
    for (q <- Seq("q188_adamic_adar", "q391_link_prediction",
        "q144_triangle_stats")) {
      val p = plan(q)
      assert(!p.contains("LeftAnti"),
        s"$q: edge subtraction must ride the wedge shuffle:\n$p")
    }
  }

  test("q205: the naive range join plans as a binned hash join, not a nested loop") {
    val p = plan("q205_range_join_auto")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"RangeJoinRewriteRule must have fired:\n$p")
    assert(p.contains("Generate explode"),
      s"expected the interval side's bin explode:\n$p")
  }

  test("q177: df-prune explodes in-task and joins the vocab by hash") {
    val p = plan("q177_df_prune")
    assert(p.toLowerCase.contains("posexplode"),
      s"expected posexplode:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q247: bucketed scans, and the join key is never re-shuffled") {
    // the query fn writes the bucketed tables, then plans the join;
    // the aggregate's own status-keyed exchange is legitimate — the
    // guard is that NO exchange partitions on the JOIN key (either the
    // join broadcasts, or it runs bucket-to-bucket)
    val p = plan("q247_bucketed_join")
    assert("Bucketed: true".r.findAllIn(p).size == 2,
      s"both scans must read the bucketed layout:\n$p")
    assert(!p.contains("Exchange hashpartitioning(o_orderkey"),
      s"join key must never shuffle over the bucketed layout:\n$p")
  }

  test("q248: the partitioned layout prunes to one event_type directory") {
    val p = plan("q248_partition_prune")
    assert(p.contains("PartitionFilters: [isnotnull(event_type"),
      s"expected a partition filter on the scan:\n$p")
    // the pruned value never needs a data filter — it's directory choice
    assert(p.contains("(event_type#") || p.contains("event_type = purchase")
      || p.contains("equals(event_type"), s"partition value missing:\n$p")
  }

  test("q256: sorted-neighborhood blocking is join-free (lead, not self-join)") {
    // the whole point of the method: ≤ w·n candidates from a window,
    // never a pair join — any join node means the rewrite regressed
    val p = plan("q256_sorted_neighborhood")
    assert(!p.contains("Join"), s"sorted-neighborhood must not join:\n$p")
    assert(!p.contains("SinglePartition"),
      s"blocked window must stay keyed:\n$p")
  }

  test("q254/q261/q263/q267: rank/coverage/ECDF windows all stay keyed") {
    // Gini ranks, top-p prefix sums, KS cumulative counts and the
    // stump's split scan are per-group windows — a SinglePartition
    // exchange would serialize the whole corpus through one task
    for (q <- Seq("q254_gini", "q261_top_p", "q263_ks_test",
        "q267_decision_stump")) {
      val p = plan(q)
      assert(!p.contains("SinglePartition"), s"$q must distribute:\n$p")
      assert(!p.contains("CartesianProduct")
        && !p.contains("BroadcastNestedLoopJoin"), s"$q went quadratic:\n$p")
    }
  }

  test("q262/q264: rolling slope and ACF build pairs from lead windows, no self-join") {
    for (q <- Seq("q262_rolling_slope", "q264_acf")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q must not self-join:\n$p")
      assert(!p.contains("SinglePartition"), s"$q must stay keyed:\n$p")
    }
  }

  test("q282/q275: prefix-filter and frame joins stay hash joins, never cartesian") {
    // PPJoin's candidate and verify joins key on prefix tokens / frame
    // fingerprints; a cartesian here means the blocking collapsed
    for (q <- Seq("q282_ppjoin", "q275_frame_dedup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct")
        && !p.contains("BroadcastNestedLoopJoin"), s"$q went quadratic:\n$p")
    }
  }

  test("q288: the span-dedup apply never shuffles token arrays") {
    // q101's contract extended to the apply: wide exchanges carry only
    // (id, pos, hash/gram) shapes; the rebuilt text appears only in the
    // final doc-keyed aggregate
    val p = plan("q288_span_dedup_apply")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SinglePartition"),
      s"apply must stay distributed:\n$p")
  }

  test("q296/q299: path mining and growth accounting are lead/lag windows, no self-join") {
    for (q <- Seq("q296_trigram_paths", "q299_growth_accounting")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct")
        && !p.contains("BroadcastNestedLoopJoin"), s"$q went quadratic:\n$p")
    }
  }

  test("q300: the corpus pipeline is one composed plan with keyed shuffles only") {
    val p = plan("q300_corpus_pipeline")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SinglePartition"),
      s"pipeline must stay distributed:\n$p")
  }

  test("q308: Kruskal-Wallis dims broadcast, rank pool never cartesians") {
    // r11: the dim-broadcast pool and the midrank join materialize
    // INSIDE the operator's eager barriers (byTreat/ranked — the final
    // plan reads them as Scan ExistingRDD leaves); the visible plan is
    // the per-group/per-treatment folds and must stay cartesian-free
    val p = plan("q308_kruskal_wallis")
    assert(p.contains("Scan ExistingRDD"),
      s"rank pool should read the barriered count table:\n$p")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q308: INTERIOR barrier plans stay cartesian-free, dims broadcast") {
    // The eager barriers turn the final plan into ExistingRDD stubs, so
    // the test above cannot see the rank-pool build anymore (r11 advice).
    // Capture every execution — the two barrier materializations plus the
    // final action — via a QueryExecutionListener and assert the strong
    // properties on the INTERIOR trees, where the caller's dimension
    // joins and the midrank join actually run.
    val captured = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        captured.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      SparkEntry.queries("q308_kruskal_wallis")(spark, sf)
        .write.format("noop").mode("overwrite").save()
      // the execution-listener bus is async — wait for the three
      // executions (byTreat barrier, ranked barrier, final save)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (captured.size() < 3 && System.nanoTime() < deadline)
        Thread.sleep(50)
    } finally spark.listenerManager.unregister(listener)
    import scala.jdk.CollectionConverters._
    val plans = captured.asScala.toList
    assert(plans.size >= 3,
      s"expected 2 barrier materializations + the final action, got ${plans.size}")
    plans.foreach { p =>
      assert(!p.contains("CartesianProduct")
        && !p.contains("BroadcastNestedLoopJoin"),
        s"interior plan went quadratic:\n$p")
    }
    assert(plans.exists(_.contains("BroadcastHashJoin")),
      "the dimension joins inside the byTreat barrier must broadcast")
  }

  test("q324: JT grid fan-out stays cartesian-free and rides the grouped scan") {
    // the deliberate crossJoin(broadcast(groups)) — a 5-row build side
    // fanning the value spine — now materializes INSIDE
    // Scale.groupedPrefixSum's one-exchange checkpoint (it shows as
    // Scan ExistingRDD here); the visible plan must stay free of
    // unbounded nested loops and key its data-sized windows on __pid
    val p = plan("q324_jonckheere")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("__pid"),
      s"strictly-less cumulative should use the range-partitioned scan:\n$p")
  }

  test("q327: JL sign table broadcasts; projection stays keyed") {
    val p = plan("q327_jl_projection")
    assert(p.contains("BroadcastHashJoin"),
      s"64x16 sign table must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q323: shingle novelty is keyed shuffles only — no cartesian, no funnel") {
    val p = plan("q323_shingle_novelty")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SinglePartition"),
      s"first-occurrence reduce must stay distributed:\n$p")
  }

  test("q265: zipf vocab selection is a bounded TakeOrdered, not a full sort") {
    // the only global stage allowed is the top-N selection itself —
    // TakeOrdered ships N rows per partition, a range-partitioned Sort
    // would shuffle the whole vocabulary
    val p = plan("q265_zipf")
    assert(p.contains("TakeOrdered"), s"expected TakeOrdered top-N:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"vocab selection must not range-shuffle:\n$p")
  }
}
