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
      Round40.all ++ Round41.all ++ Round42.all ++ Round43.all ++ Round44.all ++ Round45.all ++ Round46.all ++ Round47.all ++ Round48.all ++ Round49.all ++ Round50.all ++ Round51.all ++ Round52.all ++ Round53.all ++ Round54.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    suites.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    suites.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
