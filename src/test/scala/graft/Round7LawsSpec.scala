package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Mathematical invariants of the round-7 late-wave queries (q331–q354)
  * on the smallest fixture — bounds the DuckDB oracle can't express
  * (range laws, non-negativity, internal consistency across queries).
  */
class Round7LawsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(8)
  private val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def rows(name: String): Seq[Row] =
    SparkEntry.queries(name)(spark, sf).collect().toSeq

  private def doubles(df: Seq[Row], col: String): Seq[Double] =
    df.map(r => r.getDouble(r.fieldIndex(col)))

  test("q334 t-closeness EMD lands in [0, 1]") {
    val t = doubles(rows("q334_t_closeness"), "t_emd")
    assert(t.nonEmpty && t.forall(v => v >= 0.0 && v <= 1.0), t.take(5))
  }

  test("q335 eccentricity is within the BFS depth cap") {
    val r = rows("q335_eccentricity")
    assert(r.nonEmpty)
    r.foreach { x =>
      val ecc = x.getLong(x.fieldIndex("ecc"))
      assert(ecc >= 1 && ecc <= 4, s"ecc out of range: $x")
      assert(x.getLong(x.fieldIndex("n_reached")) >= ecc,
        s"fewer nodes than levels: $x")
    }
  }

  test("q336 confidence in (0,1], lift positive") {
    val r = rows("q336_assoc_rules")
    assert(r.nonEmpty)
    assert(doubles(r, "confidence").forall(c => c > 0.0 && c <= 1.0))
    assert(doubles(r, "lift").forall(_ > 0.0))
  }

  test("q337/q339 correlations bounded by 1 in magnitude") {
    val pc = rows("q337_partial_corr")
    assert(doubles(pc, "r_xy").forall(v => math.abs(v) <= 1.0))
    assert(doubles(pc, "r_xy_given_z").forall(v => math.abs(v) <= 1.0))
    val kt = rows("q339_kendall_tau")
    assert(kt.nonEmpty &&
      doubles(kt, "tau_b").forall(v => math.abs(v) <= 1.0))
  }

  test("q338 Cronbach alpha never exceeds k/(k-1)") {
    val a = doubles(rows("q338_cronbach"), "alpha")
    assert(a.nonEmpty && a.forall(_ <= 1.5))
  }

  test("q340 per-brand MI contributions are conditional KLs >= 0") {
    val mi = doubles(rows("q340_mutual_info"), "mi_contrib")
    assert(mi.nonEmpty && mi.forall(_ >= -1e-9), mi.min)
  }

  test("q341 propensity strictly inside (0,1)") {
    val p = doubles(rows("q341_stratified_ate"), "propensity")
    assert(p.nonEmpty && p.forall(v => v > 0.0 && v < 1.0))
  }

  test("q342 RMST is positive and capped by tau, and equals the " +
      "area recomputed from q235's survival curve") {
    val r = rows("q342_rmst")
    assert(r.size == 1)
    val rmst = r.head.getDouble(r.head.fieldIndex("rmst_days"))
    assert(rmst > 0.0 && rmst <= 60.0, rmst)
    // independent exact recomputation from the km table
    val km = rows("q235_kaplan_meier").map { x =>
      (x.getLong(x.fieldIndex("t")),
        x.getDouble(x.fieldIndex("survival")))
    }.sortBy(_._1)
    val tau = 60L
    var area = math.min(km.head._1, tau) * 1000000L
    km.indices.foreach { i =>
      val (t, s) = km(i)
      val tn = if (i + 1 < km.size) km(i + 1)._1 else tau
      val s6 = math.round(s * 1e6)
      area += s6 * (math.min(tn, tau) - math.min(t, tau))
    }
    assert(math.abs(area / 1e6 - rmst) < 1e-6, s"$rmst vs ${area / 1e6}")
  }

  test("q343 Hellinger and q351 JSD respect their range bounds") {
    val h = doubles(rows("q343_hellinger"), "hellinger")
    assert(h.nonEmpty && h.forall(v => v >= 0.0 && v <= 1.0))
    val j = doubles(rows("q351_jsd"), "jsd")
    assert(j.nonEmpty &&
      j.forall(v => v >= -1e-9 && v <= math.log(2.0) + 1e-9))
  }

  test("q344 within-region Theil is non-negative") {
    val t = doubles(rows("q344_theil_decomp"), "theil_within")
    assert(t.nonEmpty && t.forall(_ >= -1e-9))
  }

  test("q345 CvM statistic is non-negative") {
    val t = doubles(rows("q345_cvm"), "t_cvm")
    assert(t.nonEmpty && t.forall(_ >= 0.0))
  }

  test("q346 Brier decomposition contributions are non-negative, " +
      "forecasts are probabilities") {
    val r = rows("q346_brier_decomp")
    assert(r.nonEmpty)
    assert(doubles(r, "forecast_mean").forall(v => v >= 0.0 && v <= 1.0))
    assert(doubles(r, "outcome_rate").forall(v => v >= 0.0 && v <= 1.0))
    assert(doubles(r, "reliability_contrib").forall(_ >= 0.0))
    assert(doubles(r, "resolution_contrib").forall(_ >= 0.0))
  }

  test("q347 drawdown non-negative, q352 Atkinson in [0,1)") {
    assert(doubles(rows("q347_drawdown"), "max_drawdown").forall(_ >= 0.0))
    val a = doubles(rows("q352_atkinson"), "atkinson2")
    assert(a.nonEmpty && a.forall(v => v >= -1e-9 && v < 1.0))
  }

  test("q349 blocking audit counts are mutually consistent") {
    val r = rows("q349_blocking_quality").head
    def l(c: String) = r.getLong(r.fieldIndex(c))
    assert(l("n_caught") <= l("n_true"))
    assert(l("n_caught") <= l("n_candidates"))
    assert(l("n_candidates") <= l("n_pairs"))
    assert(l("n_true") >= 1, "sample should contain near-dup pairs")
    val pc = r.getDouble(r.fieldIndex("pairs_completeness"))
    assert(pc >= 0.0 && pc <= 1.0)
  }

  test("q353 turnover Jaccard bounded, common size capped at k") {
    val r = rows("q353_topk_turnover")
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getLong(x.fieldIndex("n_common")) <= 10)
      val j = x.getDouble(x.fieldIndex("jaccard"))
      assert(j >= 0.0 && j <= 1.0)
    }
  }

  test("q354 Burrows' Delta is symmetric-complete over source pairs") {
    val r = rows("q354_burrows_delta")
    val srcs = r.flatMap(x => Seq(x.getString(0), x.getString(1))).distinct
    val n = srcs.size.toLong
    assert(r.size == n * (n - 1) / 2, s"${r.size} pairs for $n sources")
    assert(doubles(r, "delta").forall(_ >= 0.0))
  }

  test("q362 Deming slope lies between the two OLS extreme slopes") {
    // with δ=1 the errors-in-variables slope is bracketed by the
    // OLS(y|x) slope and the inverse OLS(x|y) slope
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag").as("f"),
        col("l_quantity").cast("double").as("x"),
        col("l_extendedprice").cast("double").as("y"))
    val moments = li.groupBy("f").agg(
        count(lit(1)).cast("double").as("n"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"), sum("y").as("sy"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .collect().map { r =>
        def d(c: String) = r.getDouble(r.fieldIndex(c))
        val (n, sx, sy) = (d("n"), d("sx"), d("sy"))
        val sxxC = n * d("sxx") - sx * sx
        val syyC = n * d("syy") - sy * sy
        val sxyC = n * d("sxy") - sx * sy
        r.getString(0) -> (sxyC / sxxC, syyC / sxyC)
      }.toMap
    val r = rows("q362_deming")
    assert(r.size == 3)
    r.foreach { x =>
      val sl = x.getDouble(x.fieldIndex("slope"))
      val (bYx, bInv) = moments(x.getString(0))
      val (lo, hi) = (math.min(bYx, bInv), math.max(bYx, bInv))
      assert(sl >= lo - 1e-6 * math.abs(lo) - 1e-9 &&
        sl <= hi + 1e-6 * math.abs(hi) + 1e-9,
        s"slope $sl outside OLS bracket [$lo, $hi] for ${x.getString(0)}")
    }
  }

  test("q363 Durbin-Watson lands in [0, 4]") {
    val r = rows("q363_durbin_watson")
    assert(r.size == 5)
    assert(doubles(r, "dw").forall(v => v >= 0.0 && v <= 4.0))
  }

  test("q364 Ljung-Box Q non-negative, r1 bounded by 1") {
    val r = rows("q364_ljung_box")
    assert(r.size == 5)
    assert(doubles(r, "q_lb").forall(_ >= 0.0))
    assert(doubles(r, "r1").forall(v => math.abs(v) <= 1.0))
  }

  test("q366 recursive schedule compounds monotonically over 25 rows/nation") {
    val r = rows("q366_recursive_schedule")
    val byNation = r.groupBy(_.getString(0))
    assert(byNation.forall(_._2.size == 25), "each nation gets months 0..24")
    byNation.foreach { case (nation, rs) =>
      val sorted = rs.map(x => (x.getLong(x.fieldIndex("month")),
        x.getLong(x.fieldIndex("balance_cents")))).sortBy(_._1).map(_._2)
      if (sorted.head > 0)
        assert(sorted.sliding(2).forall(p => p(1) >= p(0)),
          s"positive balance must not shrink: $nation")
      // 41bp compounding: each step adds exactly (bal*41) div 10000
      sorted.sliding(2).foreach { p =>
        assert(p(1) - p(0) == Math.floorDiv(p(0) * 41, 10000)
          + (if (p(0) < 0 && (p(0) * 41) % 10000 != 0) 1 else 0),
          s"step mismatch for $nation: ${p(0)} -> ${p(1)}")
      }
    }
  }

  test("q367 Brown-Forsythe F is positive with full group roster") {
    val r = rows("q367_brown_forsythe")
    assert(r.size == 1)
    assert(r.head.getLong(r.head.fieldIndex("k")) == 5)
    assert(r.head.getDouble(r.head.fieldIndex("f_bf")) > 0.0)
  }

  test("q368/q369 G-test and Theil U are mutually consistent") {
    val g = rows("q368_g_test").head
    val u = rows("q369_theils_u").head
    val n = g.getLong(g.fieldIndex("n")).toDouble
    val gStat = g.getDouble(g.fieldIndex("g_stat"))
    val mi = u.getDouble(u.fieldIndex("mi"))
    // G = 2·N·I up to the two queries' independent roundings
    assert(math.abs(gStat - 2.0 * n * mi) <= 2.0 * n * 1e-9 + 1e-6,
      s"G=$gStat vs 2nI=${2.0 * n * mi}")
    val hb = u.getDouble(u.fieldIndex("h_brand"))
    val hf = u.getDouble(u.fieldIndex("h_flag"))
    assert(mi >= 0.0 && mi <= math.min(hb, hf) + 1e-9)
    Seq("u_flag_given_brand", "u_brand_given_flag", "u_sym").foreach { c =>
      val v = u.getDouble(u.fieldIndex(c))
      assert(v >= 0.0 && v <= 1.0, s"$c=$v")
    }
  }

  test("q365 Grubbs G obeys the (n-1)/sqrt(n) sup bound") {
    val r = rows("q365_grubbs")
    assert(r.size == 5)
    r.foreach { x =>
      val n = x.getLong(x.fieldIndex("n")).toDouble
      val g = x.getDouble(x.fieldIndex("g"))
      assert(g > 0.0 && g <= (n - 1.0) / math.sqrt(n), s"G out of bound: $x")
    }
  }
}
