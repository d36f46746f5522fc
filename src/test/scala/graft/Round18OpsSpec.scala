package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.JaroWinkler
import graft.operators.{Merge, Profile}

/** Round-6 tenth-wave operators: Jaro–Winkler, delta-join view
  * maintenance, Poisson bootstrap. */
class Round18OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private def r6(x: Double) = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("JaroWinkler reproduces the textbook record-linkage values") {
    // Winkler's published examples (boost over the 0.7 threshold)
    assert(r6(JaroWinkler.similarity("MARTHA", "MARHTA")) == 0.961111)
    assert(r6(JaroWinkler.similarity("DIXON", "DICKSONX")) == 0.813333)
    assert(r6(JaroWinkler.similarity("DWAYNE", "DUANE")) == 0.84)
    // no common prefix -> pure Jaro survives
    assert(r6(JaroWinkler.similarity("JELLYFISH", "SMELLYFISH")) == 0.896296)
    // CRATE/TRACE: jaro 0.733… > 0.7 but prefix length 0 -> unboosted
    assert(r6(JaroWinkler.similarity("CRATE", "TRACE")) == 0.733333)
  }

  test("JaroWinkler edge cases: identical, empty, disjoint") {
    assert(JaroWinkler.similarity("abc", "abc") == 1.0)
    assert(JaroWinkler.similarity("", "abc") == 0.0)
    assert(JaroWinkler.similarity("abc", "") == 0.0)
    assert(JaroWinkler.similarity("a", "b") == 0.0)
  }

  test("jaro_winkler is SQL-callable and codegen survives a projection") {
    import spark.implicits._
    graft.functions.Functions.registerAll(spark)
    val r = spark.sql(
      "SELECT round(jaro_winkler('MARTHA', 'MARHTA'), 6) AS jw").collect()
    assert(r(0).getDouble(0) == 0.961111)
    // column API inside a multi-column projection (whole-stage codegen)
    val df = Seq(("small ring", "small ping")).toDF("a", "b")
      .select(length($"a").as("la"),
        graft.functions.Functions.jaro_winkler($"a", $"b").as("jw"))
    assert(df.collect()(0).getDouble(1) > 0.9)
  }

  test("deltaJoinView equals the from-scratch view for any 2x2 split") {
    import spark.implicits._
    val a = Seq((1L, "x", 10), (2L, "x", 20), (3L, "y", 30), (4L, "y", 40))
      .toDF("ak", "g", "unused")
    val b = Seq((1L, 100L), (1L, 200L), (2L, 300L), (3L, 400L), (5L, 900L))
      .toDF("bk", "v")
    val full = a.join(b, $"ak" === $"bk").groupBy($"g")
      .agg(sum($"v").as("total"), count(lit(1)).as("n_rows"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val inc = Merge.deltaJoinView(
        a.filter($"ak" <= 2), a.filter($"ak" > 2),
        b.filter($"bk" % 2 === 1), b.filter($"bk" % 2 === 0),
        "ak", "bk", "g", $"v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(inc == full)
    assert(full("x") == ((600L, 3L))) // 100+200+300
  }

  test("poissonBootstrapCI is deterministic and brackets the mean") {
    import spark.implicits._
    val df = (1L to 400L).map(i => ("g", i, 1000L + (i % 17) * 10))
      .toDF("grp", "id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Profile.poissonBootstrapCI(d, "grp", "id", "v", b = 50)
        .collect()(0)
    val r1 = run(df)
    val r2 = run(df.repartition(7)) // partitioning must not matter
    assert(r1.getLong(1) == 400)
    assert(r1.getDouble(2) == r2.getDouble(2))
    assert(r1.getDouble(3) == r2.getDouble(3) &&
      r1.getDouble(4) == r2.getDouble(4))
    // CI is a real interval around the mean for a well-behaved sample
    assert(r1.getDouble(3) < r1.getDouble(2) &&
      r1.getDouble(2) < r1.getDouble(4))
    // and it's tight at n=400 (σ/√n scale, not data scale)
    assert(r1.getDouble(4) - r1.getDouble(3) < 30.0)
  }
}
