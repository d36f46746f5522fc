package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Batch source/sink format coverage (SURVEY §2.2 "Scans / sources" and
  * "Sinks"): parquet, ORC, CSV, and JSON lines, with explicit schemas on
  * the text formats so reads are deterministic (no inference pass over
  * 100 TB) and pushdown-friendly where the format supports it (parquet
  * and ORC carry min/max stats; CSV/JSON only prune columns).
  */
object Formats {

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  // ---- Avro container files over avro-mapred's Hadoop IO ----------------
  //
  // Spark's `format("avro")` connector is an external module that isn't on
  // this classpath; the Avro CORE + mapred jars are. The round-trip below
  // speaks the standard Avro object-container format through
  // AvroKeyInput/OutputFormat, so files interoperate with any Avro reader:
  // write is a map-only job on the existing partitioning (one container
  // file per partition, no shuffle), read is a splittable Hadoop scan
  // (Avro blocks carry sync markers, so a 100 TB layout still assigns
  // block-aligned splits to many tasks). Schema mapping: Spark primitives
  // → Avro primitives, nullable → union["null", T], TimestampType →
  // long/timestamp-micros, DateType → int/date. Column pruning/pushdown
  // don't reach a row-oriented container; use parquet/ORC for scan-heavy
  // tables and Avro for interchange — which is how the big pipelines
  // split their formats anyway.

  /** Avro schema JSON for a flat Spark schema (primitives only). */
  private[sources] def avroSchemaJson(schema: StructType, name: String): String = {
    def prim(dt: DataType): String = dt match {
      case LongType => "\"long\""
      case IntegerType | ShortType | ByteType => "\"int\""
      case DoubleType => "\"double\""
      case FloatType => "\"float\""
      case BooleanType => "\"boolean\""
      case StringType => "\"string\""
      case BinaryType => "\"bytes\""
      case TimestampType => "{\"type\":\"long\",\"logicalType\":\"timestamp-micros\"}"
      case TimestampNTZType => "{\"type\":\"long\",\"logicalType\":\"local-timestamp-micros\"}"
      case DateType => "{\"type\":\"int\",\"logicalType\":\"date\"}"
      case other => throw new IllegalArgumentException(
        s"avro round-trip supports flat primitive schemas; got $other")
    }
    val fields = schema.fields.map { f =>
      val t = if (f.nullable) s"""["null",${prim(f.dataType)}]""" else prim(f.dataType)
      s"""{"name":"${f.name}","type":$t}"""
    }.mkString(",")
    s"""{"type":"record","name":"$name","fields":[$fields]}"""
  }

  def writeAvro(df: DataFrame, path: String): Unit = {
    import org.apache.avro.generic.{GenericData, GenericRecord}
    import org.apache.avro.mapred.AvroKey
    import org.apache.avro.mapreduce.{AvroJob, AvroKeyOutputFormat}
    import org.apache.hadoop.io.NullWritable
    val spark = df.sparkSession
    val schema = df.schema
    val json = avroSchemaJson(schema, "graft_row")
    val hp = new org.apache.hadoop.fs.Path(path)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    val job = org.apache.hadoop.mapreduce.Job
      .getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new org.apache.avro.Schema.Parser().parse(json))
    val n = schema.length
    val types = schema.fields.map(_.dataType)
    // Catalyst physical values ARE Avro logical values (epoch micros,
    // epoch days, UTF8String is a CharSequence): read InternalRows off
    // the executed plan and skip the Row converter pass entirely
    df.queryExecution.toRdd.mapPartitions { it =>
      // Schema isn't reliably serializable across Avro versions: parse the
      // JSON inside the task
      val avroSchema = new org.apache.avro.Schema.Parser().parse(json)
      it.map { row =>
        val rec: GenericRecord = new GenericData.Record(avroSchema)
        var i = 0
        while (i < n) {
          val v: AnyRef =
            if (row.isNullAt(i)) null
            else types(i) match {
              case LongType | TimestampType | TimestampNTZType =>
                java.lang.Long.valueOf(row.getLong(i))
              case IntegerType | DateType => java.lang.Integer.valueOf(row.getInt(i))
              case ShortType => java.lang.Integer.valueOf(row.getShort(i).toInt)
              case ByteType => java.lang.Integer.valueOf(row.getByte(i).toInt)
              case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
              case FloatType => java.lang.Float.valueOf(row.getFloat(i))
              case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
              // ReflectDatumWriter's union resolution only recognizes
              // String/Utf8, not arbitrary CharSequences — materialize
              // (also decouples from the scan's reused UTF8String buffer)
              case StringType => row.getUTF8String(i).toString
              case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
              case other => throw new IllegalArgumentException(s"unsupported: $other")
            }
          rec.put(i, v)
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path, classOf[AvroKey[GenericRecord]],
      classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  def readAvro(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    import org.apache.avro.generic.GenericRecord
    import org.apache.avro.mapred.AvroKey
    import org.apache.avro.mapreduce.AvroKeyInputFormat
    import org.apache.hadoop.io.NullWritable
    val n = schema.length
    val types = schema.fields.map(_.dataType)
    val rows = spark.sparkContext.newAPIHadoopFile(
        path, classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable],
        spark.sparkContext.hadoopConfiguration)
      .mapPartitions { it =>
        // the record reader REUSES the datum buffer — copy each field into
        // a fresh InternalRow (already in Catalyst physical form: micros,
        // days, UTF8String) before pulling the next record
        it.map { case (k, _) =>
          val rec = k.datum()
          val vals = new Array[Any](n)
          var i = 0
          while (i < n) {
            val raw = rec.get(i)
            vals(i) =
              if (raw == null) null
              else types(i) match {
                case StringType =>
                  org.apache.spark.unsafe.types.UTF8String.fromString(raw.toString)
                case LongType | TimestampType | TimestampNTZType =>
                  raw.asInstanceOf[java.lang.Long].longValue()
                case IntegerType | DateType =>
                  raw.asInstanceOf[java.lang.Integer].intValue()
                case ShortType =>
                  raw.asInstanceOf[java.lang.Integer].shortValue()
                case ByteType =>
                  raw.asInstanceOf[java.lang.Integer].byteValue()
                case DoubleType => raw.asInstanceOf[java.lang.Double].doubleValue()
                case FloatType => raw.asInstanceOf[java.lang.Float].floatValue()
                case BooleanType => raw.asInstanceOf[java.lang.Boolean].booleanValue()
                case BinaryType =>
                  val bb = raw.asInstanceOf[java.nio.ByteBuffer]
                  val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
                case other => throw new IllegalArgumentException(s"unsupported: $other")
              }
            i += 1
          }
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
            : org.apache.spark.sql.catalyst.InternalRow
        }
      }
    org.apache.spark.sql.graft.Shims.internalCreateDataFrame(spark, rows, schema)
  }
}
