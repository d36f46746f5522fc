package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.{Graph, Hierarchy, TimeSeries}

/** Randomized laws for the round-6 graph/hierarchy/interval operators:
  * each distributed implementation is replayed against a direct in-JVM
  * computation on arbitrary small instances — the class of bug a
  * hand-picked fixture can miss (orientation, tie, and boundary cases
  * the generator finds on its own).
  */
object GraphLawsSpec extends Properties("graft.graph") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = Session.local(4)
  import spark.implicits._

  private val edgeList: Gen[List[(Int, Int)]] =
    Gen.listOfN(25, for {
      a <- Gen.chooseNum(0, 9); b <- Gen.chooseNum(0, 9)
    } yield (a, b))

  property("adamicAdar equals in-JVM brute force (uncapped centers)") =
    forAll(edgeList) { es =>
      val canon = es.filter(e => e._1 != e._2)
        .map(e => (e._1 min e._2, e._1 max e._2)).distinct
      if (canon.isEmpty) true
      else {
        val adj = (canon ++ canon.map(_.swap))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val deg = adj.view.mapValues(_.size).toMap
        val nodes = adj.keySet.toSeq.sorted
        val expected = (for {
          u <- nodes; v <- nodes if u < v
          if !canon.contains((u, v))
          common = adj(u) & adj(v) if common.nonEmpty
        } yield {
          val aa = common.toSeq.sorted.map(w => 1.0 / math.log(deg(w))).sum
          (u, v) -> (common.size.toLong,
            BigDecimal(aa).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble)
        }).toMap
        val got = Graph.adamicAdar(canon.toDF("s", "d"), "s", "d", 100)
          .collect()
          .map(r => (r.getInt(0), r.getInt(1)) ->
            (r.getLong(2), r.getDouble(3))).toMap
        // fp sums may differ in order by <1e-9; compare keys exactly and
        // scores to 1e-9
        got.keySet == expected.keySet &&
          got.forall { case (k, (c, s)) =>
            expected(k)._1 == c && math.abs(expected(k)._2 - s) < 1e-9 }
      }
    }

  property("hits equals in-JVM power iteration") = forAll(edgeList) { es =>
    val e = es.filter(x => x._1 != x._2).distinct
    if (e.isEmpty) true
    else {
      val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
      var hub = nodes.map(_ -> 1.0).toMap
      var auth = Map.empty[Int, Double]
      for (_ <- 1 to 2) {
        val aRaw = nodes.map(n =>
          n -> e.filter(_._2 == n).map(x => hub(x._1)).sum).toMap
        val aS = aRaw.values.sum
        auth = aRaw.view.mapValues(_ / aS).toMap
        val hRaw = nodes.map(n =>
          n -> e.filter(_._1 == n).map(x => auth(x._2)).sum).toMap
        val hS = hRaw.values.sum
        hub = hRaw.view.mapValues(_ / hS).toMap
      }
      val got = Graph.hits(e.toDF("s", "d"), "s", "d", iterations = 2)
        .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
        .toMap
      nodes.forall { n =>
        math.abs(got(n)._1 - hub(n)) < 1e-9 &&
          math.abs(got(n)._2 - auth(n)) < 1e-9
      }
    }
  }

  property("resolveRoots equals an in-JVM parent walk on random forests") =
    forAll(Gen.chooseNum(2, 40), Gen.chooseNum(1L, 99999L)) { (n, seed) =>
      // random forest: each node i>0 gets a parent < i (acyclic by
      // construction); node 0 is a self-parent root
      val rnd = new scala.util.Random(seed)
      val parents = (0 until n).map(i =>
        i -> (if (i == 0) 0 else rnd.nextInt(i))).toMap
      def walk(i: Int, d: Int = 0): (Int, Int) =
        if (parents(i) == i) (i, d) else walk(parents(i), d + 1)
      val expected = (0 until n).map(i => i -> walk(i)).toMap
      val got = Hierarchy
        .resolveRoots(parents.toSeq.toDF("c", "p"), "c", "p", maxDepth = 64)
        .collect().map(r => r.getInt(0) -> (r.getInt(1), r.getLong(2).toInt))
        .toMap
      (0 until n).forall(i => got(i) == expected(i))
    }

  property("mergeIntervals covered days equal the brute-force day union") =
    forAll(Gen.listOfN(8, for {
      s <- Gen.chooseNum(0, 60); len <- Gen.chooseNum(0, 10)
    } yield (s, s + len))) { iv =>
      if (iv.isEmpty) true
      else {
        val base = java.time.LocalDate.of(2024, 1, 1)
        val df = iv.zipWithIndex.map { case ((s, e), i) =>
          ("k", base.plusDays(s).toString, base.plusDays(e).toString)
        }.toDF("k", "s", "e")
          .selectExpr("k", "CAST(s AS DATE) AS s", "CAST(e AS DATE) AS e")
        val islands = TimeSeries.mergeIntervals(df, "k", "s", "e").collect()
        val covered = islands.map(r =>
          r.getDate(2).toLocalDate.toEpochDay -
            r.getDate(1).toLocalDate.toEpochDay + 1).sum
        val expected = iv.flatMap { case (s, e) => s to e }.distinct.size
        // island day-spans must tile the union exactly, and islands
        // must not overlap each other
        covered == expected.toLong &&
          islands.map(_.getLong(3)).sum == iv.size.toLong
      }
    }
}
