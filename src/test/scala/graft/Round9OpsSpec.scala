package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Graph, Metrics, Mixing, Profile, TextAnalysis, TimeSeries}

/** Round-6 wave operators: HITS, interval-overlap pairs, skew report,
  * lift table. */
class Round9OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  // ---- Graph.hits ----------------------------------------------------------

  test("hits matches the hand-computed scores on a 3-node chain") {
    import spark.implicits._
    // a->b, a->c, b->c. Hand-run one iteration:
    //   auth raw: b=1, c=2  -> L1 3 -> auth: a=0, b=1/3, c=2/3
    //   hub  raw: a=1/3+2/3=1, b=2/3 -> L1 5/3 -> hub: a=3/5, b=2/5, c=0
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("s", "d")
    val m = Graph.hits(edges, "s", "d", iterations = 1)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(math.abs(m("a")._1 - 0.6) < 1e-12)
    assert(math.abs(m("b")._1 - 0.4) < 1e-12)
    assert(m("c")._1 == 0.0)
    assert(m("a")._2 == 0.0)
    assert(math.abs(m("b")._2 - 1.0 / 3) < 1e-12)
    assert(math.abs(m("c")._2 - 2.0 / 3) < 1e-12)
  }

  test("hits L1 norms stay 1 per side and are partitioning-invariant") {
    import spark.implicits._
    val edges = (1 to 40).map(i => (i % 7, i % 11)).toDF("s", "d")
    val a = Graph.hits(edges, "s", "d", iterations = 3).collect()
      .map(r => (r.get(0).toString, r.getDouble(1), r.getDouble(2)))
    assert(math.abs(a.map(_._2).sum - 1.0) < 1e-9)
    assert(math.abs(a.map(_._3).sum - 1.0) < 1e-9)
    val b = Graph.hits(edges.repartition(13), "s", "d", iterations = 3)
      .collect().map(r => (r.get(0).toString, r.getDouble(1), r.getDouble(2)))
    assert(a.map(t => (t._1, math.round(t._2 * 1e9), math.round(t._3 * 1e9)))
      .toSet ==
      b.map(t => (t._1, math.round(t._2 * 1e9), math.round(t._3 * 1e9))).toSet)
  }

  // ---- TimeSeries.overlappingIntervals -------------------------------------

  test("overlappingIntervals finds exactly the overlapping same-key pairs") {
    import spark.implicits._
    val iv = Seq(
      // k1: [1..5], [5..9] touch at day 5 (inclusive => overlap 1 day);
      //     [20..25] is clear of both
      ("k1", 1L, "2024-01-01", "2024-01-05"),
      ("k1", 2L, "2024-01-05", "2024-01-09"),
      ("k1", 3L, "2024-01-20", "2024-01-25"),
      // k2: same dates as k1's overlap but a different key — no pair
      ("k2", 4L, "2024-01-01", "2024-01-05")
    ).toDF("k", "id", "s", "e")
      .selectExpr("k", "id", "CAST(s AS DATE) AS s", "CAST(e AS DATE) AS e")
    val out = TimeSeries.overlappingIntervals(iv, "k", "id", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(5)))
    assert(out.toSeq == Seq(("k1", 1L, 2L, 1)))
  }

  test("overlappingIntervals contained interval reports its own length") {
    import spark.implicits._
    val iv = Seq(("k", 1L, "2024-03-01", "2024-03-31"),
        ("k", 2L, "2024-03-10", "2024-03-12"))
      .toDF("k", "id", "s", "e")
      .selectExpr("k", "id", "CAST(s AS DATE) AS s", "CAST(e AS DATE) AS e")
    val out = TimeSeries.overlappingIntervals(iv, "k", "id", "s", "e")
      .collect()
    assert(out.length == 1 && out(0).getInt(5) == 3)
  }

  // ---- Profile.skewReport --------------------------------------------------

  test("skewReport matches hand-computed shares and Gini") {
    import spark.implicits._
    // counts: a=1, b=2, c=3 -> ranks (count,key asc): a=1,b=2,c=3
    // G = 2*(1*1+2*2+3*3)/(3*6) - 4/3 = 28/18 - 4/3 = 2/9
    val df = (Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(3)("c"))
      .toDF("k")
    val r = Profile.skewReport(df, "k").collect()(0)
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 0.5)      // top1 3/6
    assert(r.getDouble(4) == 1.0)      // top10 covers all 3 keys
    assert(math.abs(r.getDouble(5) - BigDecimal(2.0 / 9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("skewReport uniform keys give Gini 0 and is partitioning-invariant") {
    import spark.implicits._
    val df = (1 to 100).map(i => s"k${i % 10}").toDF("k")
    val a = Profile.skewReport(df, "k").collect()(0)
    assert(a.getDouble(5) == 0.0)
    assert(a.getDouble(3) == 0.1)
    val b = Profile.skewReport(df.repartition(17), "k").collect()(0)
    assert(a.toSeq == b.toSeq)
  }

  // ---- Metrics.liftTable ---------------------------------------------------

  test("liftTable matches the hand-computed 2-bucket table") {
    import spark.implicits._
    // scores 4,3,2,1 with responders at scores 4 and 3: top bucket
    // captures both -> rate 1.0, capture 1.0, lift 2.0; bottom 0
    val df = Seq((1L, 4.0, 1L), (2L, 3.0, 1L), (3L, 2.0, 0L),
      (4L, 1.0, 0L)).toDF("id", "score", "y")
    val out = Metrics.liftTable(df, "score", "y", "id", buckets = 2)
      .orderBy("bucket").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getLong(1) == 2 && out(0).getLong(2) == 2)
    assert(out(0).getDouble(3) == 1.0)
    assert(out(0).getDouble(4) == 1.0)
    assert(out(0).getDouble(5) == 2.0)
    assert(out(1).getLong(2) == 0 && out(1).getDouble(5) == 1.0)
  }

  // ---- TextAnalysis.pruneByDocFreq -----------------------------------------

  test("pruneByDocFreq drops high-df glue and low-df noise, keeps order") {
    import spark.implicits._
    // 'the' in 3/3 docs (> 2/3 share -> hi); 'zq' df 1 (< 2 -> lo);
    // 'cat'/'dog' df 2 survive
    val docs = Seq((1L, "the cat dog zq"), (2L, "cat the dog"),
      (3L, "the")).toDF("id", "text")
    val out = TextAnalysis.pruneByDocFreq(docs, "id", "text", 0.67, 2L)
      .orderBy("id").collect()
    assert(out(0).getString(5) == "cat dog")
    assert(out(0).getLong(1) == 4 && out(0).getLong(2) == 2 &&
      out(0).getLong(3) == 1 && out(0).getLong(4) == 1)
    assert(out(1).getString(5) == "cat dog") // order preserved per doc
    assert(out(2).getString(5) == "" && out(2).getLong(2) == 0)
  }

  test("pruneByDocFreq is partitioning-invariant") {
    import spark.implicits._
    val docs = (1 to 50)
      .map(i => (i.toLong, s"tok${i % 3} tok${i % 7} tok$i always"))
      .toDF("id", "text")
    val a = TextAnalysis.pruneByDocFreq(docs, "id", "text", 0.5, 2L)
      .collect().map(_.toSeq).toSet
    val b = TextAnalysis.pruneByDocFreq(docs.repartition(11), "id", "text",
      0.5, 2L).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  // ---- TextAnalysis.unigramKlByDomain --------------------------------------

  test("unigramKlByDomain matches the hand-computed divergence") {
    import spark.implicits._
    // corpus: a x3, b x1 -> P_c(a)=3/4, P_c(b)=1/4
    // d1 = "a a" -> P(a)=1 -> KL = 1*ln(1/(3/4)) = ln(4/3)
    // d2 = "a b" -> KL = .5 ln(.5/.75) + .5 ln(.5/.25)
    val docs = Seq(("d1", "a a"), ("d2", "a b")).toDF("src", "text")
    val m = TextAnalysis.unigramKlByDomain(docs, "src", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3)))
      .toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m("d1")._1 == 2L)
    assert(m("d1")._2 == r6(math.log(4.0 / 3)))
    assert(m("d2")._2 ==
      r6(0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)))
  }

  test("unigramKlByDomain is zero for a domain matching the corpus") {
    import spark.implicits._
    val docs = Seq(("d1", "a b"), ("d2", "a b")).toDF("src", "text")
    val out = TextAnalysis.unigramKlByDomain(docs, "src", "text").collect()
    assert(out.forall(_.getDouble(3) == 0.0))
  }

  // ---- Mixing.lengthBuckets ------------------------------------------------

  test("lengthBuckets assigns exact power-of-two buckets") {
    import spark.implicits._
    // 1->1, 2->2, 3->4, 4->4, 5->8, 8->8, 9->16, 1024->1024, 1025->2048
    val df = Seq(1, 2, 3, 4, 5, 8, 9, 1024, 1025).toDF("n")
    val m = Mixing.lengthBuckets(df, "n").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(m(1L)._1 == 1 && m(2L)._1 == 1 && m(4L)._1 == 2)
    assert(m(8L)._1 == 2 && m(8L)._2 == (8 - 5) + 0)
    assert(m(16L)._1 == 1 && m(16L)._2 == 7)
    assert(m(1024L)._1 == 1 && m(1024L)._2 == 0)
    assert(m(2048L)._1 == 1 && m(2048L)._2 == 1023)
  }

  test("lengthBuckets waste fraction is padding over bucket capacity") {
    import spark.implicits._
    val df = Seq(5, 6).toDF("n") // bucket 8: padding 3+2=5, cap 16
    val r = Mixing.lengthBuckets(df, "n").collect()(0)
    assert(r.getLong(0) == 8 && r.getDouble(4) == 0.3125)
  }

  test("liftTable buckets split remainders deterministically and cover all rows") {
    import spark.implicits._
    val df = (1 to 23).map(i => (i.toLong, (i * 7 % 23).toDouble,
      (i % 3 == 0).compare(false).toLong)).toDF("id", "score", "y")
    val out = Metrics.liftTable(df, "score", "y", "id", buckets = 5)
      .orderBy("bucket").collect()
    assert(out.map(_.getLong(1)).sum == 23L)
    // floor((rn-1)*5/23) spreads 23 = 5+5+4+5+4 (deterministic)
    assert(out.map(_.getLong(1)).toSeq == Seq(5L, 5L, 4L, 5L, 4L))
    val again = Metrics.liftTable(df.repartition(7), "score", "y", "id", 5)
      .orderBy("bucket").collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
