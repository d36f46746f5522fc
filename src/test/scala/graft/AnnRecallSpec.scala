package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Similarity
import graft.sources.Tables

/** The approximate-NN paths trade recall for touching a fraction of the
  * table; this spec pins how much recall survives on the fixture
  * embeddings so a regression in bucketing/quantization is caught. */
class AnnRecallSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH near-pair mining keeps recall against brute-force pairs, precision exact") {
    import org.apache.spark.sql.functions._
    // the fixture vectors are near-orthogonal, so near-dups are planted:
    // slightly perturbed copies (cosine ≈ 0.99 to their originals)
    val base = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") < 300).select(col("vec_id"), col("embedding"))
    val corpus = base.unionByName(base.select((col("vec_id") + 1000L).as("vec_id"),
      transform(col("embedding"), x => x + lit(0.02f)).as("embedding")))
    val exact = Similarity.nearPairs(corpus, 0.9, maxId = Long.MaxValue)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshNearPairs(corpus, 0.9)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((lsh -- exact).isEmpty, s"LSH invented pairs: ${(lsh -- exact).take(5)}")
    assert(exact.nonEmpty, "fixture produced no near pairs — test is vacuous")
    val recall = (lsh & exact).size.toDouble / exact.size
    info(f"LSH pair recall = $recall%.2f (|exact|=${exact.size})")
    assert(recall >= 0.8, s"LSH pair recall collapsed: $recall")
  }

  test("PQ compression still surfaces each probe's planted near-dup in top-5") {
    import org.apache.spark.sql.functions._
    val base = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val corpus = base.unionByName(base.filter(col("vec_id") < 50)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.02f)).as("embedding")))
    val top = Similarity.pqTopK(corpus, base.filter(col("vec_id") < 20), topK = 5)
      .select("probe_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (p, rs) => p -> rs.map(_.getLong(1)).toSet }
    val hits = (0L until 20L).count(p => top.getOrElse(p, Set.empty).contains(p + 1000L))
    info(s"PQ planted-twin hits: $hits/20")
    assert(hits >= 16, s"PQ lost too many planted near-dups: $hits/20")
  }

  test("IVF (nprobe=4/16 cells) keeps high recall@5 against brute force") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    val exact = pairs(Similarity.bruteForceTopK(emb, probes, 5))
    val ivf = pairs(Similarity.ivfTopK(emb, probes, 5))
    val recall = (ivf & exact).size.toDouble / exact.size
    info(f"IVF recall@5 = $recall%.2f")
    assert(recall >= 0.5, s"IVF recall collapsed: $recall")
  }

  test("IVF partitioned layout prunes the scan to the probed cells") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    val centers = Similarity.writeIvfPartitioned(emb, dir, nlist = 8)
    assert(centers.length == 8)
    val cells = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("cell=")).toSet
    assert(cells.nonEmpty && cells.subsetOf((0 until 8).map(i => s"cell=$i").toSet))
    // probing 2 cells must read 2 partitions, not the whole corpus
    val pruned = spark.read.parquet(dir).filter(col("cell").isin(0, 1))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    val total = spark.read.parquet(dir).count()
    assert(pruned.count() < total)
  }

  test("trained quantizers are layout-invariant: identical results on any partitioning") {
    // regression pin for the ordered training sample: a bare limit()
    // feeds the k-means whatever rows the scan yields first, so the
    // trained centroids — and these result sets — would vary with the
    // input's partitioning
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    assert(pairs(Similarity.ivfTopK(emb.coalesce(1), probes, 5)) ==
      pairs(Similarity.ivfTopK(emb.repartition(13), probes, 5)))
    assert(pairs(Similarity.pqTopK(emb.coalesce(1), probes, 5)) ==
      pairs(Similarity.pqTopK(emb.repartition(13), probes, 5)))
  }

  test("hyperplane-LSH candidates keep nonzero recall@5 and never invent ids") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    val exact = pairs(Similarity.bruteForceTopK(emb, probes, 5))
    val lsh = pairs(Similarity.annTopK(emb, probes, 5))
    val recall = (lsh & exact).size.toDouble / exact.size
    info(f"LSH recall@5 = $recall%.2f")
    assert(recall >= 0.2, s"LSH recall collapsed: $recall")
    val validIds = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(lsh.forall { case (p, v) => validIds(p) && validIds(v) && p != v })
  }
}
