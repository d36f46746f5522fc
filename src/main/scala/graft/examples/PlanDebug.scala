package graft.examples

import graft.{Session, SparkEntry}

/** Ad-hoc plan/timing inspector: runMain graft.examples.PlanDebug <query> <sfDir> [explain] */
object PlanDebug {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Session.local(32)
    names.foreach { name =>
      if (args.contains("explain"))
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      var i = 0
      while (i < 3) {
        val t0 = System.nanoTime()
        // re-invoke the query fn per iteration: work done at DataFrame
        // construction (drains, collects, quantizer training) must be
        // measured too, like the Bench does. noop sink, not count():
        // count() lets Catalyst prune computed columns and understates
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[plandebug] $name run$i time=${(System.nanoTime() - t0) / 1e9}%.2fs")
        spark.catalog.clearCache()
        i += 1
      }
    }
    spark.stop()
  }
}
