package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** A named engine query with its optional DuckDB oracle SQL.
    *
    * `fn` runs the Spark-native implementation against a scale-factor
    * directory; `oracle` is ANSI SQL producing the same result (same column
    * names — the driver sorts columns by name before hashing). Queries with
    * no SQL-expressible oracle (sketches, LSH, custom expressions) leave
    * `oracle` empty and get a rows-only check.
    */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])
}
