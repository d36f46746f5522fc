package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Scale

/** Randomized laws for the round-10 distributed prefix primitives:
  * each is replayed against a direct in-JVM sequential model on
  * arbitrary small spines under arbitrary input partitioning — the
  * generators hunt the boundary shapes (empty, single row, negative
  * values, adjacent equal maxima) that fixed fixtures miss.
  */
object ScaleLawsSpec extends Properties("graft.scale") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = Session.local(4)
  import spark.implicits._

  // unique order keys (the spine contract), values signed
  private val spine: Gen[List[(Int, Int, Int)]] = for {
    n <- Gen.chooseNum(0, 60)
    ks <- Gen.listOfN(n, Gen.chooseNum(-500, 500))
    vs <- Gen.listOfN(n, Gen.chooseNum(-50, 50))
    ws <- Gen.listOfN(n, Gen.chooseNum(-50, 50))
  } yield ks.distinct.zip(vs).zip(ws).map { case ((k, v), w) => (k, v, w) }

  private val parts: Gen[Int] = Gen.chooseNum(1, 13)

  property("prefixSums equals in-JVM running sums under any partitioning") =
    forAll(spine, parts) { (rows, p) =>
      val df = rows.toDF("k", "a", "b").repartition(p)
      val got = Scale.prefixSums(df, "k", Seq("a", "b"))
        .select($"k", $"a_cum", $"b_cum").collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val sorted = rows.sortBy(_._1)
      var (ca, cb) = (0L, 0L)
      val exp = sorted.map { case (k, a, b) =>
        ca += a; cb += b; k -> ((ca, cb))
      }.toMap
      got.size == rows.size && rows.forall { case (k, _, _) => got(k) == exp(k) }
    }

  property("prefixSum exclusive = inclusive minus own value") =
    forAll(spine, parts) { (rows, p) =>
      val df = rows.toDF("k", "a", "b").repartition(p)
      val inc = Scale.prefixSum(df, "k", "a", "c").select($"k", $"a", $"c")
        .collect().map(r => (r.getInt(0), r.getInt(1).toLong, r.getLong(2)))
      val exc = Scale.prefixSum(df, "k", "a", "c", inclusive = false)
        .select($"k", $"c").collect()
        .map(r => (r.getInt(0), r.getLong(1))).toMap
      inc.forall { case (k, a, c) => exc(k) == c - a }
    }

  property("prefixMax equals in-JVM running max, asc/desc, incl/excl") =
    forAll(spine, parts, Gen.oneOf(true, false), Gen.oneOf(true, false)) {
      (rows, p, desc, inc) =>
        val df = rows.map(r => (r._1, r._2.toLong)).toDF("k", "v")
          .repartition(p)
        val got = Scale.prefixMax(df, "k", "v", "m", descending = desc,
            inclusive = inc)
          .select($"k", $"m").collect()
          .map(r => (r.getInt(0),
            if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
        val ordered = if (desc) rows.sortBy(-_._1) else rows.sortBy(_._1)
        var run: Option[Long] = None
        val exp = ordered.map { case (k, v, _) =>
          val before = run
          run = Some(run.fold(v.toLong)(math.max(_, v.toLong)))
          k -> (if (inc) run else before)
        }.toMap
        got.size == rows.size && rows.forall { case (k, _, _) => got(k) == exp(k) }
    }

  property("prefixSumD matches the in-JVM sequential cumsum within 1e-9") =
    forAll(spine, parts) { (rows, p) =>
      val df = rows.map(r => (r._1, r._2 / 7.0)).toDF("k", "v").repartition(p)
      val got = Scale.prefixSumD(df, "k", "v", "c").select($"k", $"c")
        .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
      var acc = 0.0
      val exp = rows.sortBy(_._1).map { case (k, v, _) =>
        acc += v / 7.0; k -> acc
      }.toMap
      rows.forall { case (k, _, _) => math.abs(got(k) - exp(k)) < 1e-9 }
    }
}
