package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every registered query suite; add new suites here. */
  private def suites: Seq[Q] =
    Relational.all ++ Text.all ++ Events.all ++ Vectors.all ++ Extras.all ++
      Round2.all ++ Round3.all ++ Round4.all ++ Round5.all ++ Round6.all ++
      Round7.all ++ Round8.all ++ Round9.all ++ Round10.all ++ Round11.all ++ Round12.all ++ Round13.all ++ Round14.all ++ Round15.all ++
      Round16.all ++ Round17.all ++ Round18.all ++ Round19.all ++
      Round20.all ++ Round21.all ++ Round22.all ++ Round23.all ++
      Round24.all ++ Round25.all ++ Round26.all ++ Round27.all ++
      Round28.all ++ Round29.all ++ Round30.all ++ Round31.all ++
      Round32.all ++ Round33.all ++ Round34.all ++ Round35.all ++
      Round36.all ++ Round37.all ++ Round38.all ++ Round39.all ++
      Round40.all ++ Round41.all ++ Round42.all ++ Round43.all ++ Round44.all ++ Round45.all ++ Round46.all ++ Round47.all ++ Round48.all ++ Round49.all ++ Round50.all ++ Round51.all ++ Round52.all ++ Round53.all ++ Round54.all ++ Round55.all ++ Round56.all ++ Round57.all ++ Round58.all ++ Round59.all ++ Round60.all ++ Round61.all ++ Round62.all ++ Round63.all ++ Round64.all ++ Round65.all ++ Round66.all ++ Round67.all ++ Round68.all ++ Round69.all ++ Round70.all ++ Round71.all ++ Round72.all ++ Round73.all ++ Round74.all ++ Round75.all ++ Round76.all ++ Round77.all ++ Round78.all ++ Round79.all ++ Round80.all ++ Round81.all ++ Round82.all ++ Round83.all ++ Round84.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg")(spark, "/root/testdata/sf0.001")

  /** Hash-safe output-type contract: the driver's result hasher
    * canonicalizes wide/narrow numerics differently per engine (DuckDB
    * HUGEINT/DECIMAL finals went hash-red while value-identical), so every
    * query's FINAL projection uses only BIGINT / DOUBLE / VARCHAR / DATE /
    * TIMESTAMP / BOOLEAN. Internal arithmetic stays decimal-exact; only
    * the last projection widens. The oracle SQL carries the same casts so
    * both engines emit type-identical schemas. SchemaParitySpec pins this
    * allowlist for every registered query.
    */
  private def hashSafe(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val needs = df.schema.fields.exists(f => f.dataType match {
      case IntegerType | ShortType | ByteType | FloatType | _: DecimalType => true
      case _ => false
    })
    if (!needs) df
    else df.select(df.schema.fields.map { f =>
      f.dataType match {
        case IntegerType | ShortType | ByteType => df(f.name).cast("long").as(f.name)
        case FloatType | (_: DecimalType)       => df(f.name).cast("double").as(f.name)
        case _                                  => df(f.name)
      }
    }: _*)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    suites.map(q => q.name ->
      ((s: SparkSession, d: String) => hashSafe(q.fn(s, d)))).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check.
    * OracleTypes.casts columns are wrapped so the oracle's result schema
    * is type-identical to the engine's hashSafe projection. */
  def oracleSql: Map[String, String] =
    suites.flatMap(q => q.oracle.map { o =>
      val sql = OracleTypes.casts.get(q.name) match {
        case None => o.trim
        case Some(cs) =>
          val repl = cs.map { case (c, t) => s"CAST($c AS $t) AS $c" }
            .mkString(", ")
          s"SELECT * REPLACE ($repl) FROM (\n${o.trim}\n) __hashsafe"
      }
      q.name -> sql
    }).toMap
}
