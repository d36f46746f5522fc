package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for tests and ad-hoc runs.
  *
  * UTC timezone (oracle parity with DuckDB), AQE on, shuffle partitions
  * sized to local cores rather than the 200 default. On a real cluster the
  * same settings apply, with shuffle partitions sized to total cores and
  * AQE coalescing handling the rest.
  */
object Session {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
