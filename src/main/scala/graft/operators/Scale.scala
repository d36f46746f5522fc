package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 100 TB-scale helpers (SURVEY §4.2, §7.4): skew mitigation and layout.
  *
  * First line of defense is AQE (enabled by [[graft.Session]]): runtime
  * coalescing, skew-join splitting, and broadcast demotion. These helpers
  * cover the cases AQE can't see in advance:
  *
  *  - [[saltedJoin]]: explicit key salting for a join whose key histogram
  *    is known to be pathological (a handful of keys carrying most rows).
  *    The large side gets a deterministic salt in [0, salts); the small
  *    side is replicated once per salt, so each hot key spreads over
  *    `salts` shuffle partitions.
  *  - [[writePartitioned]]: directory-partitioned parquet layout so
  *    downstream scans prune partitions instead of listing 100 TB.
  *  - [[repartitionForJoin]]: pre-shuffle both sides of a repeated join
  *    key once, letting several downstream joins reuse the exchange.
  */
object Scale {

  /** Join `large` with `small` on `key`, salting the large side to spread
    * hot keys. Result equals `large.join(small, key)` for inner joins.
    * The salt derives from a hash of the whole large-side row, so it is
    * deterministic and needs no extra state. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val saltedLarge = large.withColumn("__salt",
      pmod(hash(large.columns.map(col): _*), lit(salts)))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Directory-partitioned parquet write — the scan-pruning layout for
    * very large fact tables (partition column should be low-cardinality,
    * e.g. a date). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Hash-partition by join key so several downstream joins/aggregations
    * on the same key reuse one exchange. */
  def repartitionForJoin(df: DataFrame, key: String, partitions: Int): DataFrame =
    df.repartition(partitions, col(key))

  /** Persist as a bucketed, sorted table: repeated joins/aggregations on
    * the bucket key then run shuffle-free (bucket-to-bucket sort-merge).
    * The canonical layout for a 100 TB fact table that's joined on the
    * same key by every pipeline run — the shuffle is paid once at write
    * time instead of per query. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    // a previous process may have left the managed location behind while
    // the in-memory catalog forgot the table — clear both
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = df.sparkSession.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val loc = new java.io.File(s"$warehouse/${table.toLowerCase}")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(loc)
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }
}
