package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Similarity

/** SemDeDup accuracy contract (the operator is deterministic but
  * quantizer-trained, so q107 is rows-only — this spec is its
  * correctness gate): planted exact duplicates collapse to exactly one
  * survivor (identical vectors can never split across cells), planted
  * near-duplicates above threshold collapse when co-located,
  * well-separated vectors all survive, and the survivor set is
  * identical across runs and partitionings.
  */
class SemanticDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private val dim = 16

  // well-separated base vectors: one-hot-ish, pairwise cosine == 0
  private def oneHot(i: Int): Array[Float] =
    Array.tabulate(dim)(j => if (j == i % dim) 1.0f else 0.0f)

  private def df(rows: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("planted exact duplicates collapse to the min-id survivor") {
    // 8 distinct directions; ids 100+ are exact copies of ids 0..7
    val uniques = (0 until 8).map(i => (i.toLong, oneHot(i)))
    val copies = (0 until 8).map(i => (100L + i, oneHot(i)))
    val survivors = Similarity.semanticDedup(df(uniques ++ copies),
        threshold = 0.95, nlist = 4, maxTrainSample = 1000)
      .collect().map(_.getLong(0)).toSet
    assert(survivors == (0 until 8).map(_.toLong).toSet)
  }

  test("orthogonal vectors all survive any threshold above zero") {
    val rows = (0 until dim).map(i => (i.toLong, oneHot(i)))
    val survivors = Similarity.semanticDedup(df(rows),
        threshold = 0.5, nlist = 4, maxTrainSample = 1000)
      .collect().map(_.getLong(0)).toSet
    assert(survivors == (0 until dim).map(_.toLong).toSet)
  }

  test("near-duplicates above threshold collapse when co-located") {
    // id 50 = id 0 with a tiny orthogonal perturbation: cosine ~ 0.995;
    // identical dominant direction -> same argmax cell by construction
    val base = oneHot(0)
    val near = base.clone(); near(1) = 0.1f
    val rows = Seq((0L, base), (50L, near)) ++ (1 until 6).map(i => (i.toLong, oneHot(i)))
    val survivors = Similarity.semanticDedup(df(rows),
        threshold = 0.95, nlist = 3, maxTrainSample = 1000)
      .collect().map(_.getLong(0)).toSet
    assert(!survivors.contains(50L) && survivors.contains(0L))
  }

  test("survivor set is stable across runs and partitionings") {
    val rows = (0 until 40).map(i => (i.toLong, oneHot(i))) ++
      (0 until 10).map(i => (200L + i, oneHot(i)))
    val a = Similarity.semanticDedup(df(rows), 0.95, nlist = 4)
      .collect().map(_.getLong(0)).toSet
    val b = Similarity.semanticDedup(df(rows).repartition(7), 0.95, nlist = 4)
      .collect().map(_.getLong(0)).toSet
    assert(a == b && (200 until 210).forall(i => !a.contains(i.toLong)))
  }

  test("drops are a subset of exact all-pairs dedup, with bounded recall") {
    // the quantitative contract vs brute force: SemDeDup's drop rule
    // ("has a lower-id mate at cosine ≥ t") only ever fires on a REAL
    // in-cell pair, so its drop set must be an exact subset of the
    // all-pairs drop set (precision 1.0); pairs split across cells are
    // the method's accepted recall loss, bounded here on a planted
    // fixture (perturbed copies of near-orthogonal vectors)
    import org.apache.spark.sql.functions._
    import graft.sources.Tables
    val base = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") < 200).select(col("vec_id"), col("embedding"))
    val corpus = base.unionByName(base.filter(col("vec_id") < 60)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.02f)).as("embedding")))
    val t = 0.9
    val exactDrops = Similarity.nearPairs(corpus, t, maxId = Long.MaxValue)
      .select("b_id").distinct().collect().map(_.getLong(0)).toSet
    val survivors = Similarity.semanticDedup(corpus, t, nlist = 8)
      .collect().map(_.getLong(0)).toSet
    val all = corpus.select("vec_id").collect().map(_.getLong(0)).toSet
    val semDrops = all -- survivors
    assert((semDrops -- exactDrops).isEmpty,
      s"SemDeDup dropped non-duplicates: ${(semDrops -- exactDrops).take(5)}")
    assert(exactDrops.nonEmpty, "fixture planted no exact drops — test is vacuous")
    val recall = (semDrops & exactDrops).size.toDouble / exactDrops.size
    info(f"SemDeDup drop recall = $recall%.2f (|exact|=${exactDrops.size})")
    assert(recall >= 0.5, s"cross-cell drop recall collapsed: $recall")
  }

  test("the stop-cell guard rejects a degenerate pair space") {
    val rows = (0 until 100).map(i => (i.toLong, oneHot(0))) // all one cell
    val e = intercept[IllegalArgumentException] {
      Similarity.semanticDedup(df(rows), 0.95, nlist = 2, maxCellPairs = 10L)
    }
    assert(e.getMessage.contains("maxCellPairs"))
  }
}
