package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Hash-safe output-type contract (round-6 verdict task #1): the driver's
  * result hasher canonicalizes HUGEINT / DECIMAL / narrow-int cells
  * differently between DuckDB and Spark, so every registered query's final
  * schema must use only the hash-stable types below — SparkEntry.hashSafe
  * widens the engine side and OracleTypes.casts widens the oracle side.
  * This spec pins the engine half for EVERY query (analysis only, no
  * execution for batch plans), and pins the wrapper mechanics.
  */
class SchemaParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)
  private val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def allowed(dt: DataType): Boolean = dt match {
    case LongType | DoubleType | StringType | DateType | BooleanType => true
    case TimestampType | TimestampNTZType                            => true
    case _                                                           => false
  }

  test("every query's final schema uses only hash-stable types") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val offending =
          try fn(spark, sf).schema.fields.toSeq
            .filterNot(f => allowed(f.dataType))
            .map(f => s"$name.${f.name}: ${f.dataType.simpleString}")
          catch { case e: Throwable => Seq(s"$name: build failed: ${e.getMessage}") }
        offending
    }
    assert(bad.isEmpty, s"non-hash-safe final columns:\n${bad.mkString("\n")}")
  }

  test("oracle SQL is wrapped for every OracleTypes entry, and only those") {
    val oracles = SparkEntry.oracleSql
    graft.queries.OracleTypes.casts.foreach { case (name, cs) =>
      assert(oracles.contains(name), s"$name has casts but no oracle")
      val sql = oracles(name)
      assert(sql.startsWith("SELECT * REPLACE"), s"$name oracle not wrapped")
      cs.foreach { case (c, t) =>
        assert(sql.contains(s"CAST($c AS $t) AS $c"), s"$name missing cast $c->$t")
      }
    }
  }

  test("cast map targets only hash-stable oracle types") {
    val ok = Set("BIGINT", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN")
    graft.queries.OracleTypes.casts.foreach { case (name, cs) =>
      cs.foreach { case (c, t) => assert(ok.contains(t), s"$name.$c -> $t") }
    }
  }
}
