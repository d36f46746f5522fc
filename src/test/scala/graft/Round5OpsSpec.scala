package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Decontaminate, Fuzzy, Graph, Mixing}

/** Round-5 operators: temperature-scaled domain mixing and document
  * contamination scoring. */
class Round5OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  // ---- temperature mixing --------------------------------------------------

  test("tau=1 keeps the natural mixture: every domain gets the same rate") {
    import spark.implicits._
    // 3000 + 1000 rows, target 2000 of 4000 total -> rate 0.5 everywhere
    val df = ((1L to 3000L).map(i => (i, "big")) ++
      (3001L to 4000L).map(i => (i, "small"))).toDF("id", "dom")
    val rates = Mixing.temperatureRates(df, "dom", tau = 1.0, targetTotal = 2000L)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rates == Map("big" -> 0.5, "small" -> 0.5))
  }

  test("tau<1 flattens toward low-resource domains; capped rates stay at 1") {
    import spark.implicits._
    // n = 6400 vs 100: natural share 98.5/1.5; tau=0.5 shares 80/10 -> 8:1.
    // small domain's uncapped rate = 2000*(10/90)/100 = 2.2 -> caps at 1
    val df = ((1L to 6400L).map(i => (i, "big")) ++
      (10001L to 10100L).map(i => (i, "small"))).toDF("id", "dom")
    val rates = Mixing.temperatureRates(df, "dom", tau = 0.5, targetTotal = 2000L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rates("small") == ((100L, 1.0)), s"got $rates")
    // big: 2000 * (80/90) / 6400 = 0.277778
    assert(math.abs(rates("big")._2 - 0.277778) < 1e-6, s"got $rates")
  }

  test("temperature sample is deterministic and concentrates near expectation") {
    import spark.implicits._
    val df = ((1L to 6400L).map(i => (i, "big")) ++
      (10001L to 10100L).map(i => (i, "small"))).toDF("id", "dom")
    val kept = Mixing.temperatureSample(df, "dom", "id", 0.5, 2000L)
    val again = Mixing.temperatureSample(df.repartition(7), "dom", "id", 0.5, 2000L)
    assert(kept.select("id").collect().map(_.getLong(0)).toSet ==
      again.select("id").collect().map(_.getLong(0)).toSet)
    val byDom = kept.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom("small") == 100L, s"capped domain must keep everything: $byDom")
    // expected 6400 * 0.277 = 1777; hash-slot draw concentrates within ±15%
    assert(math.abs(byDom("big") - 1777L) < 270, s"big=${byDom("big")}")
  }

  // ---- repetition-based upsampling ------------------------------------------

  test("upsample emits floor(rate) copies plus a hash-admitted fractional one") {
    import spark.implicits._
    // 100 big + 10 small, tau=1, target 220 -> rate 2.0 everywhere:
    // exactly 2 copies per row, no fractional draw at all
    val df = ((1L to 100L).map(i => (i, "big")) ++
      (201L to 210L).map(i => (i, "small"))).toDF("id", "dom")
    val out = Mixing.upsampleDomains(df, "dom", "id", tau = 1.0, targetTotal = 220L)
    assert(out.count() == 220L)
    val copies = out.groupBy("id").count().collect().map(_.getLong(1)).toSet
    assert(copies == Set(2L), "rate 2.0 must mean exactly two copies each")
    assert(out.select("copy").distinct().collect().map(_.getInt(0)).toSet == Set(1, 2))
  }

  test("fractional rates concentrate near expectation and downsampling still works") {
    import spark.implicits._
    // one domain, 1000 rows, target 2500 -> rate 2.5: expected 2500 ± draw
    val df = (1L to 1000L).map(i => (i, "d")).toDF("id", "dom")
    val n = Mixing.upsampleDomains(df, "dom", "id", 1.0, 2500L).count()
    assert(math.abs(n - 2500L) < 120, s"rate 2.5 over 1000 rows emitted $n")
    // rate 0.4: pure downsample, no row repeated
    val down = Mixing.upsampleDomains(df, "dom", "id", 1.0, 400L)
    assert(math.abs(down.count() - 400L) < 80)
    assert(down.select("copy").distinct().collect().map(_.getInt(0)).toSet == Set(1))
  }

  test("upsample is deterministic across partitionings") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "dom")
    def run(d: org.apache.spark.sql.DataFrame) =
      Mixing.upsampleDomains(d, "dom", "id", 0.7, 900L)
        .select("id", "copy").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(run(df) == run(df.repartition(7)))
  }

  test("chained samplers decorrelate through distinct salts") {
    import spark.implicits._
    val df = (1L to 4000L).map(i => (i, "d")).toDF("id", "dom")
    val half = Map("d" -> 0.5)
    val once = Mixing.stratifiedSample(df, "dom", "id", half)
    // same salt: the second filter admits exactly the first's survivors
    val coupled = Mixing.stratifiedSample(once, "dom", "id", half)
    assert(coupled.count() == once.count(), "same-salt chain must be idempotent")
    // distinct salt: joint rate approaches r1*r2 = 0.25
    val indep = Mixing.stratifiedSample(once, "dom", "id", half, salt = 7)
    val joint = indep.count().toDouble / 4000
    assert(math.abs(joint - 0.25) < 0.08, s"joint rate $joint, want ~0.25")
  }

  // ---- weighted sampling -----------------------------------------------------

  test("weightedSample: determinism, weight exclusion, weight bias") {
    import spark.implicits._
    // half the rows carry 50x the weight: they must dominate the sample
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) 50L else 1L))
      .toDF("id", "w")
    def run(d: org.apache.spark.sql.DataFrame, salt: Int = 0) =
      Mixing.weightedSample(d, "id", "w", k = 200, salt = salt)
        .select("id").collect().map(_.getLong(0)).toSet
    val a = run(df)
    assert(a.size == 200 && a == run(df.repartition(7)), "deterministic")
    val heavy = a.count(_ % 2 == 0)
    assert(heavy > 170, s"heavy rows should dominate: $heavy/200")
    assert(run(df, salt = 7) != a, "distinct salts draw distinct samples")
    // zero/negative weights never survive
    val z = Mixing.weightedSample(
      Seq((1L, 0L), (2L, -5L), (3L, 1L)).toDF("id", "w"), "id", "w", 3)
    assert(z.select("id").collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  // ---- EWMA ------------------------------------------------------------------

  test("ewmaPerKey folds the recurrence in event order") {
    import spark.implicits._
    import graft.operators.TimeSeries
    // key 1: values 10, 20, 30 at t=1,2,3 with alpha 0.5:
    // 0 -> 5 -> 12.5 -> 21.25; rows arrive shuffled
    val df = Seq((1L, 3L, 30.0), (1L, 1L, 10.0), (1L, 2L, 20.0),
      (2L, 1L, 7.0)).toDF("k", "t", "v")
    val out = TimeSeries.ewmaPerKey(df, "k", Seq("t"), "v", alpha = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((3L, 21.25)), s"got $out")
    assert(out(2L) == ((1L, 3.5)), s"got $out")
    val rep = TimeSeries.ewmaPerKey(df.repartition(5), "k", Seq("t"), "v", 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rep == out.map { case (k, v) => k -> v._2 })
  }

  // ---- heavy hitters ---------------------------------------------------------

  test("Misra-Gries never drops an item above N/(k+1), any partitioning") {
    import spark.implicits._
    import graft.functions.MisraGriesAgg
    // adversarial: 3 planted heavies drowned in 5000 near-distinct fillers
    val heavies = Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++
      Seq.fill(250)("gamma")
    val noise = (1 to 5000).map(i => s"noise${i % 2500}")
    val n = heavies.size + noise.size
    val k = 30 // N/(k+1) ~ 192 < 250: all three heavies guaranteed
    for (parts <- Seq(1, 7, 32)) {
      val df = scala.util.Random.shuffle(heavies ++ noise).toDF("w")
        .repartition(parts)
      val cands = df.agg(MisraGriesAgg.candidates($"w", k).as("cs"))
        .head().getSeq[String](0).toSet
      assert(Set("alpha", "beta", "gamma").subsetOf(cands),
        s"parts=$parts lost a guaranteed heavy: $cands")
      assert(cands.size <= k, s"summary exceeded k: ${cands.size}")
    }
  }

  // ---- incremental aggregate maintenance -------------------------------------

  test("mergeAggregates folds partials to the full-recompute result") {
    import spark.implicits._
    import graft.operators.Merge
    val rows = (1L to 900L).map(i => (i % 37, i, i * 3 % 101))
      .toDF("k", "v", "w")
    def partial(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"k").agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"v").as("sv"),
        org.apache.spark.sql.functions.min($"w").as("mw"))
    // three arbitrary disjoint slices
    val parts = Seq(rows.filter($"v" % 3 === 0), rows.filter($"v" % 3 === 1),
      rows.filter($"v" % 3 === 2)).map(partial)
    val folded = Merge.mergeAggregates(parts, Seq("k"),
        Map("n" -> "sum", "sv" -> "sum", "mw" -> "min"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val full = partial(rows)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(folded == full)
    intercept[IllegalArgumentException] {
      Merge.mergeAggregates(parts, Seq("k"), Map("n" -> "avg"))
    }
  }

  // ---- per-key trend ---------------------------------------------------------

  test("trendPerKey recovers exact lines; drops degenerate keys") {
    import spark.implicits._
    import graft.operators.TimeSeries
    val df = Seq(
      (1L, 0.0, 1.0), (1L, 1.0, 3.0), (1L, 2.0, 5.0),   // y = 2x + 1
      (2L, 5.0, 7.0), (2L, 5.0, 9.0),                   // zero x-spread
      (3L, 4.0, 4.0)                                    // single point
    ).toDF("k", "x", "y")
    val out = TimeSeries.trendPerKey(df, "k", "x", "y")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out == Map(1L -> ((3L, 2.0, 1.0))), s"got $out")
  }

  // ---- fixed-budget group sample ---------------------------------------------

  test("sampleKPerGroup: exact k, stability, salt decorrelation, heap plan") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, if (i <= 450) "big" else "small"))
      .toDF("id", "dom")
    val out = Mixing.sampleKPerGroup(df, "dom", "id", k = 30)
    val sizes = out.groupBy($"dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("big" -> 30L, "small" -> 30L), s"got $sizes")
    // a group under k keeps everything
    val tiny = Mixing.sampleKPerGroup(df.filter($"id" > 480), "dom", "id", 30)
    assert(tiny.count() == 20)
    // deterministic across partitionings
    def ids(d: org.apache.spark.sql.DataFrame) =
      Mixing.sampleKPerGroup(d, "dom", "id", 30).select("id")
        .collect().map(_.getLong(0)).toSet
    assert(ids(df) == ids(df.repartition(7)))
    // distinct salts draw different (decorrelated) samples
    val s7 = Mixing.sampleKPerGroup(df, "dom", "id", 30, salt = 7)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids(df) != s7)
    // (the bounded-heap plan shape is pinned in TopKRewriteSpec, whose
    // session owns the GraftExtensions registration)
  }

  // ---- canonical selection ---------------------------------------------------

  test("canonicalize keeps best-score reps, ties to min id, singletons self") {
    import spark.implicits._
    import graft.operators.Dedup
    // cluster {1,2,3} (3 longest), cluster {4,5} tied score -> min id 4,
    // 6 is a singleton
    val docs = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 7L), (5L, 7L), (6L, 1L))
      .toDF("id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val out = Dedup.canonicalize(docs, "id", "score", pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
    assert(out(1L) == ((1L, 3L, 0)) && out(2L) == ((1L, 3L, 0))
      && out(3L) == ((1L, 3L, 1)), s"got $out")
    assert(out(4L) == ((4L, 4L, 1)) && out(5L) == ((4L, 4L, 0)), s"tie: $out")
    assert(out(6L) == ((6L, 6L, 1)), s"singleton: $out")
  }

  // ---- PageRank --------------------------------------------------------------

  test("pageRank matches hand-computed values with a dangling node") {
    import spark.implicits._
    // A -> B -> C, C dangling: after one iteration from uniform 1/3,
    // dm = 1/3 so every node gets 0.85·(in + 1/9) + 0.05
    val edges = Seq(("A", "B"), ("B", "C")).toDF("s", "t")
    val r1 = Graph.pageRank(edges, "s", "t", iterations = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val third = 1.0 / 3
    assert(math.abs(r1("A") - (0.05 + 0.85 * (third / 3))) < 1e-12)
    assert(math.abs(r1("B") - (0.05 + 0.85 * (third + third / 3))) < 1e-12)
    assert(r1("B") == r1("C"), "B and C receive identical mass")
  }

  test("pageRank conserves total mass and is partitioning-invariant") {
    import spark.implicits._
    val edges = (1L to 400L).map(i => (i % 40, (i * 7) % 40)).filter(e => e._1 != e._2)
      .toDF("s", "t")
    val out = Graph.pageRank(edges, "s", "t", iterations = 3)
    val total = out.agg(org.apache.spark.sql.functions.sum($"rank"))
      .head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9, s"mass $total")
    val a = out.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = Graph.pageRank(edges.repartition(7), "s", "t", iterations = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a.keySet == b.keySet &&
      a.forall { case (k, v) => math.abs(v - b(k)) < 1e-12 })
  }

  test("pageRank at depth (iterations=10, localCheckpoint path) matches driver-side power iteration") {
    import spark.implicits._
    // small dense-ish digraph with a dangling node (6 has no out-edges)
    val edgeSeq = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L),
      (4L, 6L), (5L, 4L), (5L, 6L), (2L, 6L))
    val out = Graph.pageRank(edgeSeq.toDF("s", "t"), "s", "t", iterations = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // reference: dense power iteration on the driver, same semantics
    val nodes = edgeSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val outAdj = edgeSeq.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 10) {
      val dm = nodes.filterNot(outAdj.contains).map(r).sum
      val in = nodes.map { v =>
        v -> outAdj.toSeq.collect {
          case (s, ds) if ds.contains(v) => r(s) / ds.size
        }.sum
      }.toMap
      r = nodes.map(v => v -> (0.15 / n + 0.85 * (in(v) + dm / n))).toMap
    }
    assert(out.keySet == r.keySet)
    r.foreach { case (k, v) =>
      assert(math.abs(out(k) - v) < 1e-10, s"node $k: ${out(k)} vs $v") }
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
  }

  // ---- fuzzy edit-distance join ---------------------------------------------

  test("fuzzy join equals brute force, including shorts and repeated grams") {
    import spark.implicits._
    // adversarial mix: empty + 1-char strings (no q-grams), a string of
    // one repeated gram ("aaaa"), transposition-ish pairs, and ties
    val rows = Seq(
      (1L, "kitten"), (2L, "sitten"), (3L, "sittin"), (4L, "kitchen"),
      (5L, "aaaa"), (6L, "aaab"), (7L, "aaba"), (8L, ""), (9L, "a"),
      (10L, "b"), (11L, "ab"), (12L, "xyxyxy"), (13L, "yxyxyx")
    ).toDF("id", "t")
    def brute(k: Int): Set[(Long, Long, Int)] = {
      val all = rows.collect().map(r => (r.getLong(0), r.getString(1)))
      def ed(s: String, t: String): Int = {
        val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) =>
          if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to s.length; j <- 1 to t.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j), d(i)(j - 1)) + 1,
            d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
        d(s.length)(t.length)
      }
      (for (a <- all; b <- all if a._1 < b._1; dist = ed(a._2, b._2)
            if dist <= k) yield (a._1, b._1, dist)).toSet
    }
    // k <= 2 exercises the deletion-signature path, k >= 3 the q-gram
    // prefix path — both must equal brute force
    for (k <- Seq(0, 1, 2, 3, 4)) {
      val got = Fuzzy.editDistancePairs(rows, "id", "t", maxDist = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == brute(k), s"k=$k")
    }
  }

  test("fuzzy prefix path (k>=3) equals brute force on long strings") {
    import spark.implicits._
    // 20-char strings past the q(k+1)=12 vacuous-bound threshold, with
    // planted 1/2/3-edit neighbors and shared low-entropy structure
    val base = "Document-00000000-AA"
    val rows = Seq(
      (1L, base), (2L, "Document-00000001-AA"), (3L, "Document-00010001-AA"),
      (4L, "Document-10010001-AA"), (5L, "Document-99999999-ZZ"),
      (6L, "Dossier-000000000-AA"), (7L, "Document-00000000-AAX")
    ).toDF("id", "t")
    val all = rows.collect().map(r => (r.getLong(0), r.getString(1)))
    def ed(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j), d(i)(j - 1)) + 1,
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    val brute = (for (a <- all; b <- all if a._1 < b._1; dist = ed(a._2, b._2)
      if dist <= 3) yield (a._1, b._1, dist)).toSet
    val got = Fuzzy.editDistancePairs(rows, "id", "t", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute && brute.nonEmpty, s"got $got want $brute")
  }

  test("fuzzy join is partitioning-invariant") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (i, f"Item#${i % 97}%03d")).toDF("id", "t")
    def run(df: org.apache.spark.sql.DataFrame) =
      Fuzzy.editDistancePairs(df, "id", "t", maxDist = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(run(rows) == run(rows.repartition(7)) && run(rows).nonEmpty)
  }

  // ---- Gopher rule gate ------------------------------------------------------

  test("gopher gate computes exact signals and the composite keep bit") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "the cat sat on the mat and it is fine"), // 10 words, keeps
      (2L, "a b"),                                   // too short
      (3L, "the the the the the the the the of x")   // top-word frac 0.8
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherQuality(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getInt(3), r.getDouble(4), r.getInt(5)))).toMap
    // doc 1: 10 words, 28 chars -> 2.8 mean, stopwords {the,on,and,it,is} = 5
    // distinct hits, top word "the" 2/10
    assert(got(1L) == ((10, 2.8, 5, 0.2, 1)), s"got ${got(1L)}")
    assert(got(2L)._5 == 0, "2-word doc must fail the word-count floor")
    assert(got(3L) == ((10, 2.7, 2, 0.8, 0)), s"got ${got(3L)}")
  }

  test("char entropy matches the hand-computed distribution") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "aab"), (2L, "aaaa"), (3L, "ab")).toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val h1 = r6(-(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3)))
    assert(got(1L) == ((3, h1)), s"got ${got(1L)}")
    assert(got(2L)._1 == 4 && got(2L)._2 == 0.0,
      s"single-char doc has zero entropy: ${got(2L)}")
    assert(got(3L) == ((2, r6(math.log(2)))), s"got ${got(3L)}")
  }

  test("bigram log-prob matches the hand-computed smoothed model") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // corpus: "a b a b" + "a b" + "x" -> c2(a,b)=3, c2(b,a)=1; contexts
    // c1(a)=3, c1(b)=1; vocabulary {a,b,x} so V=3 (the bigram-less doc
    // still contributes its token). With alpha=0.5 (exact in binary):
    // P(b|a) = 3.5/4.5, P(a|b) = 1.5/2.5
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProb(docs, "doc_id", "text", alpha = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val pba = 3.5 / 4.5
    val pab = 1.5 / 2.5
    val d1 = r6((math.log(pba) + math.log(pab) + math.log(pba)) / 3)
    val d2 = r6(math.log(pba))
    assert(got(1L) == ((3L, d1)) && got(2L) == ((1L, d2)))
    assert(!got.contains(3L), "single-token doc has no bigrams")
  }

  // ---- contamination ratio -------------------------------------------------

  test("contamination ratio is exact, zero-overlap docs included") {
    import spark.implicits._
    // doc 1: 6 tokens = 4 distinct 3-grams, of which the 2 inside the
    // eval run overlap; doc 2: no overlap at all; eval doc has 4 tokens
    // = 2 grams
    val corpus = Seq(
      (1L, "e1 e2 e3 e4 a b"),   // grams: e1e2e3, e2e3e4 (hits), e3e4a, e4ab
      (2L, "x y z w")).toDF("doc_id", "text")
    val eval = Seq((100L, "e1 e2 e3 e4")).toDF("doc_id", "text")
    val got = Decontaminate.contaminationRatio(corpus, eval, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set((1L, 4L, 2L, 0.5), (2L, 2L, 0L, 0.0)))
  }
}
