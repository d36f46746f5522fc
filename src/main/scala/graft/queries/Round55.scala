package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.{Formats, Tables => T}

/** Round-7 first wave: ORC sink/source round-trip — the last mainstream
  * batch format not yet in the graded loop (parquet is the fixture format,
  * JSON/CSV round-trip in q225).
  */
object Round55 {

  val all: Seq[Q] = Seq(

    // ORC round-trip: lineitem written as ORC (zlib, the default), read
    // back through the vectorized ORC reader, filtered (predicate reaches
    // the ORC stripe stats) and aggregated. Equality with the
    // direct-parquet oracle proves the format plumbing preserves decimals,
    // dates and strings bit-for-bit. Finals are hash-safe: BIGINT counts,
    // decimal-exact sums cast DOUBLE at the last step, DATE max.
    Q("q307_orc_roundtrip", (s, d) => {
      import s.implicits._
      // per-run path (application id + nanoTime): two concurrent drivers
      // (bench and verify) must never overwrite each other's ORC dir
      // mid-scan; cleaned up after the aggregate materializes
      val base = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_q307_${s.sparkContext.applicationId}_${System.nanoTime()}"
      try {
        Formats.writeOrc(T.lineitem(s, d), s"$base/orc")
        Formats.readOrc(s, s"$base/orc")
          .filter($"l_quantity" > 10)
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            count(lit(1)).as("n"),
            sum($"l_quantity".cast("decimal(18,2)"))
              .cast("decimal(18,2)").cast("double").as("sum_qty"),
            sum($"l_extendedprice".cast("decimal(18,2)"))
              .cast("decimal(18,2)").cast("double").as("sum_price"),
            max($"l_shipdate").as("last_ship"))
          .orderBy($"l_returnflag", $"l_linestatus")
          .localCheckpoint(true)
      } finally {
        val hp = new org.apache.hadoop.fs.Path(base)
        hp.getFileSystem(s.sessionState.newHadoopConf()).delete(hp, true)
        ()
      }
    }, Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS n,
             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS DOUBLE) AS sum_price,
             max(l_shipdate) AS last_ship
      FROM lineitem WHERE l_quantity > 10
      GROUP BY 1, 2 ORDER BY 1, 2"""))
  )
}
