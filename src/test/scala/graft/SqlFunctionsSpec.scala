package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.Functions

/** Custom expressions must be reachable from plain SQL once registered. */
class SqlFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = { val s = Session.local(4); Functions.registerAll(s); s }

  override def afterAll(): Unit = spark.stop()

  test("cosine_similarity in SQL") {
    val v = spark.sql(
      "SELECT cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("word_shingles with explicit n in SQL") {
    val v = spark.sql("SELECT word_shingles('a b c d', 2) AS s")
      .collect()(0).getSeq[String](0)
    assert(v == Seq("a b", "b c", "c d"))
  }

  test("rolling_hash and simhash64 in SQL are deterministic") {
    val r1 = spark.sql(
      "SELECT rolling_hash('abc') AS rh, simhash64(array('x','y')) AS sh").collect()(0)
    val r2 = spark.sql(
      "SELECT rolling_hash('abc') AS rh, simhash64(array('x','y')) AS sh").collect()(0)
    assert(r1.getLong(0) == r2.getLong(0) && r1.getLong(1) == r2.getLong(1))
  }

  test("char_entropy in SQL matches the closed form and handles edges") {
    val r = spark.sql(
      "SELECT char_entropy('aab') AS h, char_entropy('aaaa') AS z, " +
        "char_entropy('') AS e, char_entropy(CAST(NULL AS STRING)) AS n")
      .collect()(0)
    val want = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(r.getDouble(0) - want) < 1e-12)
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
    assert(r.isNullAt(3), "null input must stay null")
  }

  test("hyperplane_signature and winnow_fingerprint in SQL") {
    val r = spark.sql("""
      SELECT hyperplane_signature(array(1.0F, -1.0F, 0.5F), 8) AS hs,
             size(winnow_fingerprint('abcdefghij', 3, 2)) AS nw""").collect()(0)
    assert(r.getLong(0) >= 0 && r.getLong(0) < 256)
    assert(r.getInt(1) > 0)
  }
}
