package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.{Formats, Tables => T}

/** Round-8 first wave: the Avro interchange round-trip — the last
  * mainstream batch format next to parquet (native), ORC (q307), JSON and
  * CSV (q225). Spark's `format("avro")` connector isn't on this
  * classpath, so [[Formats.writeAvro]]/[[Formats.readAvro]] speak the
  * standard Avro object-container format directly through avro-mapred's
  * AvroKeyInput/OutputFormat: a map-only write on the existing
  * partitioning, a splittable block-aligned read. Equality with the
  * direct-parquet oracle proves timestamps (micros logical type), longs,
  * doubles and strings survive the trip bit-for-bit.
  */
object Round71 {

  val all: Seq[Q] = Seq(

    Q("q370_avro_roundtrip", (s, d) => {
      import s.implicits._
      val base = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_q370_${s.sparkContext.applicationId}_${System.nanoTime()}"
      try {
        val orders = T.orders(s, d)
        Formats.writeAvro(orders, s"$base/avro")
        Formats.readAvro(s, s"$base/avro", orders.schema)
          .filter($"o_totalprice" > 1000)
          .groupBy(year($"o_orderdate").cast("long").as("o_year"),
            $"o_orderstatus")
          .agg(
            count(lit(1)).as("n"),
            // exact cents (2-dp doubles), one double division at the end
            (sum(round($"o_totalprice" * 100).cast("long")).cast("double")
              / 100.0).as("total"),
            max($"o_orderdate").as("last_order"))
          .orderBy($"o_year", $"o_orderstatus")
          .localCheckpoint(true)
      } finally {
        val hp = new org.apache.hadoop.fs.Path(base)
        hp.getFileSystem(s.sessionState.newHadoopConf()).delete(hp, true)
        ()
      }
    }, Some("""
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, o_orderstatus,
             count(*) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS total,
             max(o_orderdate) AS last_order
      FROM orders WHERE o_totalprice > 1000
      GROUP BY 1, 2 ORDER BY 1, 2"""))
  )
}
