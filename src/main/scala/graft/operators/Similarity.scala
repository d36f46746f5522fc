package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.Functions._

/** Similarity search over embedding columns (SURVEY §2.3).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) probe
  * set against the full vector table, ranked per probe. This is the
  * correct-by-construction path and scales as O(|probes|·|vectors|) with
  * perfect data parallelism.
  *
  * Scale path: banded random-hyperplane LSH — vectors hash to signature
  * chunks, probes join only their buckets, exact cosine ranks within the
  * candidate set. Trades recall for a join that touches a small fraction
  * of the table; at 100 TB the bucket join replaces the full scan per
  * probe batch.
  */
object Similarity {

  /** Exact top-k neighbors per probe by cosine (probe set broadcast).
    * Ranking uses the rounded similarity with id tie-break so results are
    * reproducible across engines and runs. */
  def bruteForceTopK(vectors: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
    val scored = vectors.join(broadcast(p), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(cosine_similarity(col("p_emb"), col("embedding")), 6).as("sim"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of
    * pre-ranked candidate lists — the standard hybrid-retrieval
    * combiner for rankings whose raw scores are incomparable (keyword
    * hit counts vs embedding cosine). Each list contributes
    * `1 / (rrfK + rank)` per id; output is `(idCol, rrf, n_lists)`
    * where `n_lists` counts how many rankers surfaced the id.
    *
    * Ranking (and its engine-stable tie-breaking) is the CALLER's job —
    * each input must already be a bounded top-k candidate list with a
    * 1-based `rankCol`, the shape retrieval systems actually fuse.
    * Fusion itself is then a union + one hash aggregate over
    * Σ|candidates| rows total, independent of corpus size.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(rrfK >= 0, s"rrfK must be >= 0: $rrfK")
    rankings
      .map(_.select(col(idCol),
        (lit(1.0) / (lit(rrfK.toDouble) + col(rankCol).cast("double")))
          .as("__c")))
      .reduce(_.unionByName(_))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("rrf"), count(lit(1)).as("n_lists"))
  }

  /** All pairs (a < b) with cosine ≥ threshold, restricted to ids below
    * `maxId` to bound the quadratic pair space. */
  def nearPairs(vectors: DataFrame, threshold: Double, maxId: Long): DataFrame = {
    val a = vectors.filter(col("vec_id") < maxId)
      .select(col("vec_id").as("a_id"), col("embedding").as("ea"))
    val b = vectors.filter(col("vec_id") < maxId)
      .select(col("vec_id").as("b_id"), col("embedding").as("eb"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(cosine_similarity(col("ea"), col("eb")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** The bounded driver-side quantizer-training sample, shared by every
    * trained operator (IVF, PQ, SemDeDup). Ordered: a bare limit() takes
    * whatever rows the scan yields first, so trained centroids — and
    * hence serving layouts and rows-only result sets — would depend on
    * file layout/partitioning. TakeOrdered by id is deterministic for the
    * same data regardless of either, and stays a bounded driver-side
    * collect (≤ maxTrainSample rows) at any corpus size. */
  private[operators] def trainSample(vectors: DataFrame, maxTrainSample: Int): Array[Array[Double]] =
    vectors.select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(maxTrainSample)
      .collect().map(_.getSeq[Float](1).toArray.map(_.toDouble))

  /** Spherical k-means on a driver-side sample: the FAISS-style coarse
    * quantizer. At 100 TB you never run Lloyd iterations over the full
    * table — you train on a bounded sample (FAISS trains IVF on ~1M
    * vectors regardless of corpus size) and broadcast the tiny centroid
    * set for distributed assignment. Deterministic: strided init over the
    * collected sample, fixed iteration count, no RNG.
    */
  private[operators] def trainCentroids(
      sample: Array[Array[Double]], nlist: Int, iters: Int = 10): Array[Array[Double]] = {
    require(sample.nonEmpty, "cannot train a quantizer on an empty sample")
    val dim = sample.head.length
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val unit = sample.map(normalize)
    // strided init over the lexicographically sorted sample: spread,
    // deterministic, no seed dependence, dimension-count-safe
    import scala.math.Ordering.Implicits.seqOrdering
    val sorted = unit.sortBy(_.toSeq)
    var centroids = Array.tabulate(nlist)(i => sorted((i.toLong * sorted.length / nlist).toInt))
    var it = 0
    while (it < iters) {
      val sums = Array.fill(nlist, dim)(0.0)
      val counts = Array.fill(nlist)(0)
      unit.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity; var c = 0
        while (c < nlist) {
          var dot = 0.0; var i = 0
          while (i < dim) { dot += v(i) * centroids(c)(i); i += 1 }
          if (dot > bestDot) { bestDot = dot; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(nlist)(c =>
        if (counts(c) == 0) centroids(c) else normalize(sums(c)))
      it += 1
    }
    centroids
  }

  /** IVF-style ANN: a sample-trained spherical-kmeans coarse quantizer
    * assigns every vector to one of `nlist` cells; each probe searches
    * only its `nprobe` nearest cells, then exact cosine ranks the
    * candidates. This is the classic inverted-file index layout: at
    * 100 TB the vector table is partitioned by cell, so a probe batch
    * touches nprobe/nlist of the data instead of all of it. Cell
    * assignment is a pure codegen'd expression over broadcast centroid
    * literals — no shuffle, no join, no per-iteration Spark jobs.
    */
  def ivfTopK(vectors: DataFrame, probes: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, maxTrainSample: Int = 100000): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    val spark = vectors.sparkSession
    import spark.implicits._

    val sample = trainSample(vectors, maxTrainSample)
    val centers = trainCentroids(sample, nlist)

    // cell = argmax_c cos(embedding, centroid_c), evaluated inline:
    // greatest() over (sim, cell) structs compares lexicographically, so
    // ties break toward the higher cell id — deterministic either way
    def cellOf(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      greatest(centers.zipWithIndex.map { case (c, i) =>
        struct(cosine_similarity(emb, typedLit(c.map(_.toFloat))).as("s"),
          lit(i).as("c"))
      }: _*).getField("c")

    val assigned = vectors
      .select(col("vec_id"), col("embedding"), cellOf(col("embedding")).as("cell"))

    // (cell, centroid) — nlist rows, broadcast everywhere
    val centroids = centers.zipWithIndex
      .map { case (c, i) => (i, c.map(_.toFloat)) }
      .toSeq.toDF("cell", "centroid")

    // each probe's nprobe nearest cells by centroid similarity
    val probeCells = probes
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
      .join(broadcast(centroids))
      .select(col("probe_id"), col("p_emb"), col("cell"),
        cosine_similarity(col("p_emb"), col("centroid")).as("csim"))
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("csim").desc, col("cell"))))
      .filter(col("crnk") <= nprobe)
      .select(col("probe_id"), col("p_emb"), col("cell"))

    // search only the selected cells, exact-rank the candidates
    val scored = assigned.join(broadcast(probeCells),
        Seq("cell")).filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(cosine_similarity(col("p_emb"), col("embedding")), 6).as("sim"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** The 100 TB IVF serving layout: vectors written directory-partitioned
    * by their quantizer cell. A probe batch then reads ONLY its nprobe
    * cells via partition pruning — nprobe/nlist of the corpus — instead
    * of scanning everything. Returns the trained centroids so the search
    * side assigns probes with the same quantizer.
    */
  def writeIvfPartitioned(vectors: DataFrame, path: String,
      nlist: Int = 16, maxTrainSample: Int = 100000): Array[Array[Double]] = {
    val sample = trainSample(vectors, maxTrainSample)
    val centers = trainCentroids(sample, nlist)
    val cell = greatest(centers.zipWithIndex.map { case (c, i) =>
      struct(cosine_similarity(col("embedding"), typedLit(c.map(_.toFloat))).as("s"),
        lit(i).as("c"))
    }: _*).getField("c")
    vectors.withColumn("cell", cell)
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    centers
  }

  /** Product-quantization codebooks: the embedding space is split into
    * `m` subspaces and each gets its own tiny L2 k-means codebook —
    * trained on a bounded driver-side sample exactly like the IVF coarse
    * quantizer (FAISS trains PQ on a sample regardless of corpus size).
    * Deterministic: strided init over the sorted sample, fixed
    * iterations, no RNG. Returns `books(j)(c)` = centroid c of
    * subspace j. */
  private[operators] def trainPQ(sample: Array[Array[Double]], m: Int, k: Int,
      iters: Int = 10): Array[Array[Array[Double]]] = {
    require(sample.nonEmpty, "cannot train PQ codebooks on an empty sample")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    import scala.math.Ordering.Implicits.seqOrdering
    Array.tabulate(m) { j =>
      val vecs = sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      val sorted = vecs.sortBy(_.toSeq)
      var cents = Array.tabulate(k)(i => sorted((i.toLong * sorted.length / k).toInt))
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k, sub)(0.0)
        val counts = Array.fill(k)(0)
        vecs.foreach { v =>
          var best = 0; var bd = Double.MaxValue; var c = 0
          while (c < k) {
            var d = 0.0; var i = 0
            while (i < sub) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
            if (d < bd) { bd = d; best = c }
            c += 1
          }
          var i = 0
          while (i < sub) { sums(best)(i) += v(i); i += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(k)(c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c)))
        it += 1
      }
      cents
    }
  }

  /** PQ-compressed ANN: every vector is stored as `m` small codes
    * (64 floats → 8 codes ≈ 16–32× smaller — the storage layout that
    * makes 100 TB of embeddings greppable), encoding is a pure map-side
    * expression over broadcast codebook literals, and probes score
    * against the codebook RECONSTRUCTION of each candidate (asymmetric
    * scoring: the query side stays exact). Recall on genuinely-near
    * pairs is pinned by AnnRecallSpec. */
  def pqTopK(vectors: DataFrame, probes: DataFrame, topK: Int,
      m: Int = 8, codebookSize: Int = 16, maxTrainSample: Int = 100000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = vectors.sparkSession
    import spark.implicits._
    val sample = trainSample(vectors, maxTrainSample)
    val dim = sample.head.length
    val sub = dim / m
    val books = trainPQ(sample, m, codebookSize)
    // encode + reconstruct per partition batch (ladder rung (d): a
    // higher-order-function formulation re-evaluates the subvector slice
    // inside every one of the m×k interpreted lambdas — the tight loop
    // over the broadcast codebooks is both faster and clearer)
    val booksB = spark.sparkContext.broadcast(books)
    val encoded = vectors.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val bks = booksB.value
        it.map { case (id, emb) =>
          val code = new Array[Int](m)
          val recon = new Array[Float](emb.length)
          var j = 0
          while (j < m) {
            var best = 0
            var bd = Double.MaxValue
            var c = 0
            while (c < codebookSize) {
              var d = 0.0
              var i = 0
              while (i < sub) {
                val t = emb(j * sub + i) - bks(j)(c)(i)
                d += t * t
                i += 1
              }
              if (d < bd) { bd = d; best = c }
              c += 1
            }
            code(j) = best
            var i = 0
            while (i < sub) { recon(j * sub + i) = bks(j)(best)(i).toFloat; i += 1 }
            j += 1
          }
          (id, code, recon)
        }
      }.toDF("vec_id", "code", "recon")

    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
    val scored = encoded
      .join(broadcast(p), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(cosine_similarity(col("p_emb"), col("recon")), 6).as("sim"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= topK)
  }

  /** Query-time ANN against the pre-built serving layout of
    * [[writeIvfPartitioned]]: probes are assigned to their `nprobe`
    * nearest cells with the layout's own quantizer, the tiny distinct
    * probed-cell set (≤ nlist ints) is collected, and the corpus is read
    * with `cell IN (...)` — a static partition filter, so the scan
    * touches only the probed `cell=` directories instead of assigning
    * the full table per query. The layout (plus its centroids, stored
    * alongside under `<path>.centroids`) is built once on first use and
    * reused by every subsequent query — the build is the indexing job, the
    * per-query cost is the pruned read. */
  def ivfServedTopK(vectors: DataFrame, probes: DataFrame, k: Int,
      layoutPath: String, nlist: Int = 16, nprobe: Int = 4,
      maxTrainSample: Int = 100000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = vectors.sparkSession
    import spark.implicits._

    // the parameters that shape the LAYOUT are folded into its path, so a
    // caller reusing a path with a different nlist/sample budget can never
    // be served a stale index (nprobe is query-time only — it selects
    // cells, it doesn't change what's on disk); existence goes through the
    // Hadoop FileSystem so non-local layout paths work. The v2 tag marks
    // the ordered-training-sample quantizer — a layout built by the
    // pre-fix scan-order sampler must not be reused
    val paramPath = s"$layoutPath.nlist${nlist}_t${maxTrainSample}_v2"
    val centPath = paramPath + ".centroids"
    val fs = new org.apache.hadoop.fs.Path(paramPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(paramPath, "_SUCCESS"))) {
      val centers = writeIvfPartitioned(vectors, paramPath, nlist, maxTrainSample)
      centers.zipWithIndex.map { case (c, i) => (i, c) }.toSeq.toDF("cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(centPath)
    }
    val centroids = spark.read.parquet(centPath)
      .select(col("cell").cast("int").as("cell"),
        org.apache.spark.sql.functions.transform(col("centroid"), _.cast("float")).as("centroid"))

    val probeCells = probes
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
      .join(broadcast(centroids))
      .select(col("probe_id"), col("p_emb"), col("cell"),
        cosine_similarity(col("p_emb"), col("centroid")).as("csim"))
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("csim").desc, col("cell"))))
      .filter(col("crnk") <= nprobe)
      .select(col("probe_id"), col("p_emb"), col("cell"))

    // ≤ nlist distinct cells — the literal IN list that prunes the scan.
    // probeCells is deliberately NOT cached across this collect and the
    // scored join: recomputing it costs one broadcast join over the small
    // probe set, where a cache would leak pinned blocks past this call
    // (nothing can unpersist after the caller materializes the result)
    val cells = probeCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val pruned = spark.read.parquet(paramPath)
      .filter(col("cell").isin(cells: _*))

    val scored = pruned.join(broadcast(probeCells), Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(cosine_similarity(col("p_emb"), col("embedding")), 6).as("sim"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Approximate near-duplicate PAIRS by banded hyperplane LSH — the
    * embedding-side analog of MinHash near-dup: vectors sharing any
    * signature band become candidates, exact cosine verifies, so
    * precision is exact and only recall is approximate (pinned by
    * AnnRecallSpec against the brute-force pair set). `maxBucket` drops
    * degenerate buckets (a boilerplate-heavy corpus can funnel a large
    * vector mass into one bucket whose pair space is quadratic) — the
    * standard stop-bucket guard; dropped buckets trade recall for a
    * bounded candidate join and are the knob to widen at 100 TB. */
  def lshNearPairs(vectors: DataFrame, threshold: Double,
      bandBits: Int = 8, bands: Int = 8, maxBucket: Int = 10000): DataFrame = {
    val totalBits = bandBits * bands
    val banded = vectors.select(col("vec_id"), col("embedding"),
      posexplode(array((0 until bands).map(c =>
        shiftright(hyperplane_signature(col("embedding"), totalBits), c * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1))): _*)).as(Seq("band", "bucket")))
    val counts = banded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("__bn"))
    val pruned = banded.join(counts, Seq("band", "bucket"))
      .filter(col("__bn") <= maxBucket)
    val a = pruned.select(col("band"), col("bucket"),
      col("vec_id").as("a_id"), col("embedding").as("ea"))
    val b = pruned.select(col("band"), col("bucket"),
      col("vec_id").as("b_id"), col("embedding").as("eb"))
    a.join(b, Seq("band", "bucket")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(cosine_similarity(col("ea"), col("eb")), 6).as("sim"))
      .filter(col("sim") >= threshold)
      .distinct()
  }

  /** Approximate top-k via banded random-hyperplane LSH: 4 bands of
    * `bandBits` signature bits; a vector is a candidate if any band
    * matches the probe's. Exact cosine ranks candidates. */
  def annTopK(vectors: DataFrame, probes: DataFrame, k: Int,
      bandBits: Int = 4, bands: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val totalBits = bandBits * bands
    def banded(df: DataFrame, idAs: String, embAs: String): DataFrame =
      df.select(col("vec_id").as(idAs), col("embedding").as(embAs),
        posexplode(array((0 until bands).map(c =>
          shiftright(hyperplane_signature(col("embedding"), totalBits), c * bandBits)
            .bitwiseAND(lit((1L << bandBits) - 1))): _*)).as(Seq("band", "bucket")))
    val p = banded(probes, "probe_id", "p_emb")
    val v = banded(vectors, "vec_id", "v_emb")
    val cands = v.join(broadcast(p),
        v("band") === p("band") && v("bucket") === p("bucket") &&
          col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), col("p_emb"), col("v_emb"))
      .distinct()
    val scored = cands.select(col("probe_id"), col("vec_id"),
      round(cosine_similarity(col("p_emb"), col("v_emb")), 6).as("sim"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Semantic (embedding-space) deduplication — the SemDeDup recipe
    * (Abbas et al. 2023): cluster the embeddings with the sample-trained
    * spherical k-means quantizer, then within each cluster drop every
    * vector that has a LOWER-id cluster-mate with cosine ≥ `threshold`.
    * The drop rule is deterministic (no RNG, engine-stable tie-break by
    * id), so repeated runs keep exactly the same corpus.
    *
    * The cluster pass is what makes this tractable: the quadratic
    * pairwise check runs per cell, O(Σ cell²) instead of O(n²) — the
    * paper's design point. Near-dup pairs split across cells are the
    * (accepted, measured) recall loss of the method; exact duplicates
    * can never split, since identical vectors get identical argmax
    * cells. `maxCellPairs` is the stop-cell guard: a degenerate cell
    * whose pair space exceeds it fails fast instead of running a
    * quadratic join nobody sized for — repartition or raise nlist.
    *
    * Returns surviving (vec_id, cell). Deterministic but not
    * SQL-expressible (the quantizer is trained), so correctness is
    * pinned by SemanticDedupSpec: planted exact duplicates collapse to
    * one survivor, well-separated vectors all survive.
    */
  def semanticDedup(vectors: DataFrame, threshold: Double,
      nlist: Int = 16, maxTrainSample: Int = 100000,
      maxCellPairs: Long = 100000000L): DataFrame = {
    val sample = trainSample(vectors, maxTrainSample)
    val centers = trainCentroids(sample, nlist)
    def cellOf(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      greatest(centers.zipWithIndex.map { case (c, i) =>
        struct(cosine_similarity(emb, typedLit(c.map(_.toFloat))).as("s"),
          lit(i).as("c"))
      }: _*).getField("c")
    // deliberately not cached (the ivfServedTopK trade): assignment is a
    // pure map-side codegen expression, so re-evaluating it per consumer
    // costs extra scans, where a persist would pin the whole table and
    // leak past this call (nothing can unpersist after the caller
    // materializes the lazily-returned result)
    val assigned = vectors
      .select(col("vec_id"), col("embedding"), cellOf(col("embedding")).as("cell"))
    val worst = assigned.groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .agg(coalesce(max(expr("n * (n - 1) div 2")), lit(0L)).as("p"))
      .collect()(0).getLong(0)
    require(worst <= maxCellPairs,
      s"largest cell generates $worst pairs > maxCellPairs=$maxCellPairs; raise nlist")
    val dropped = assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(cosine_similarity(col("a.embedding"), col("b.embedding")) >= threshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
    assigned.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell"))
  }

  /** Per-label centroid vectors and their pairwise cosine similarity —
    * the class-geometry read-out (which labels' embeddings overlap,
    * which are separable) run before a classifier or a SemDeDup-style
    * pass trusts the space. Returns `(label_a, label_b, dim, cos)` for
    * `label_a < label_b`, cosine rounded to 6.
    *
    * Scale shape: centroids come from ONE posexplode + (label, pos)
    * aggregate — |labels|·d rows however big the corpus — re-assembled
    * by sorted-struct collect (plain `collect_list` has no order
    * guarantee); the pairwise step is a |labels|² self-join of
    * d-length arrays, metadata-sized. Cosine is explicit double HOF
    * arithmetic (ascending-index folds, the replayable order) — the
    * float-typed native expression would silently downcast the
    * centroids. */
  def centroidSimilarity(vectors: DataFrame, labelCol: String,
      vecCol: String): DataFrame = {
    val cents = vectors
      .select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("__pos", "__v")))
      .groupBy(col("label"), col("__pos"))
      .agg(avg(col("__v").cast("double")).as("__m"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("__pos"),
          col("__m")))), s => s.getField("__m")).as("c"))
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val a = cents.select(col("label").as("label_a"), col("c").as("__ca"))
    val b = cents.select(col("label").as("label_b"), col("c").as("__cb"))
    a.join(b, col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        size(col("__ca")).as("dim"),
        round(dot(col("__ca"), col("__cb")) /
          (sqrt(dot(col("__ca"), col("__ca"))) *
            sqrt(dot(col("__cb"), col("__cb")))), 6).as("cos"))
  }

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein 1998):
    * greedily pick `k` of each probe's candidates maximizing
    * `λ·relevance − (1−λ)·max-sim-to-already-selected` — the standard
    * diversity pass that stops a retrieval page being five copies of
    * the same near-duplicate.
    *
    * The greedy recursion is inherently sequential over each probe's
    * candidate list, so it runs as a per-probe Scala fold over the
    * COLLECTED candidate array — bounded by the upstream top-N (pass
    * the output of [[bruteForceTopK]] or an ANN variant; N ≤ ~100),
    * never the corpus; the pairwise candidate–candidate cosines are
    * O(N²) per probe, also bounded. Selection ties break on
    * (score desc, vec_id) so the result is deterministic — and the
    * greedy trace IS SQL-expressible as a recursive CTE carrying the
    * selected-id list (one row per probe per rank; argmax = windowed
    * row_number over the joined candidate × selected max-cosine), so
    * q243 carries a full DuckDB oracle. Parity contract: relevance is
    * the ROUNDED upstream sim; the only unrounded doubles in the
    * greedy comparison are the candidate–candidate cosines, summed in
    * index order on both engines (same basis as the q32/q33 oracles).
    *
    * Input needs `(probe_id, vec_id, sim, embedding)`; returns
    * `(probe_id, rank, vec_id, sim, mmr_score)` — sim rounded to 6,
    * mmr_score unrounded (a short dot of 6-decimal rationals; rounding
    * it would land on decimal halves for every odd-final-digit sim). */
  def mmrRerank(candidates: DataFrame, k: Int,
      lambda: Double = 0.7): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(lambda > 0 && lambda <= 1, s"lambda must be in (0,1]: $lambda")
    val sel = udf((cands: Seq[Row]) => {
      // cands: (vec_id, sim, embedding)
      val ids = cands.map(_.getLong(0)).toArray
      val rel = cands.map(_.getDouble(1)).toArray
      val embs = cands.map(_.getSeq[Float](2).toArray).toArray
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        val n = math.min(a.length, b.length)
        while (i < n) {
          d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
          nb += b(i).toDouble * b(i); i += 1
        }
        // round to 6 like every cosine final in the suite (Spark Round
        // semantics: HALF_UP on the shortest decimal repr) — the greedy
        // then runs entirely on 6-decimal rationals + double constants,
        // so its comparisons are bit-reproducible in any engine; raw
        // cosines essentially never land on decimal halves, unlike the
        // λ·(rounded sim) products the score itself produces
        val raw = d / (math.sqrt(na) * math.sqrt(nb))
        if (raw.isNaN || raw.isInfinite) raw
        else java.math.BigDecimal.valueOf(raw)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
      }
      val selected = scala.collection.mutable.ArrayBuffer[Int]()
      // rank as Long: finals ship under the BIGINT hash-safe contract
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Double, Double)]()
      while (selected.size < math.min(k, ids.length)) {
        var bestI = -1; var bestScore = Double.NegativeInfinity
        var i = 0
        while (i < ids.length) {
          if (!selected.contains(i)) {
            val maxSim = if (selected.isEmpty) 0.0
              else selected.map(j => cos(embs(i), embs(j))).max
            val score = lambda * rel(i) - (1.0 - lambda) * maxSim
            if (score > bestScore ||
                (score == bestScore && bestI >= 0 && ids(i) < ids(bestI))) {
              bestI = i; bestScore = score
            }
          }
          i += 1
        }
        selected += bestI
        out += ((selected.size.toLong, ids(bestI), rel(bestI), bestScore))
      }
      out.toSeq
    })
    candidates
      .groupBy(col("probe_id"))
      .agg(sort_array(collect_list(struct(
        (-col("sim")).as("negSim"), col("vec_id"), col("sim"),
        col("embedding")))).as("__sorted"))
      .withColumn("__cands", expr(
        "transform(__sorted, x -> struct(x.vec_id, x.sim, x.embedding))"))
      .withColumn("__picks", sel(col("__cands")))
      .select(col("probe_id"), explode(col("__picks")).as("__p"))
      .select(col("probe_id"), col("__p._1").as("rank"),
        col("__p._2").as("vec_id"), round(col("__p._3"), 6).as("sim"),
        // UNROUNDED: the score is a short dot of 6-decimal rationals and
        // double constants — bit-identical across engines as-is, while a
        // round(·, 6) would sit on a decimal half whenever λ·sim's 7th
        // digit is 5 (i.e. for every odd-final-digit sim), exactly the
        // q405 huge-double trap class
        col("__p._4").as("mmr_score"))
  }
}
