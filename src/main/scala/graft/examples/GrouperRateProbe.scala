package graft.examples

import scala.concurrent.Await
import scala.concurrent.duration._

/** Standalone micro-probe for the Grouper façade's end-to-end item
  * throughput — the same trial Bench.scala folds into the round bench
  * line, runnable in isolation so a lane-path change (e.g. the round-10
  * wakeable parked poll) can be measured without the 418-query suite.
  *
  * Usage: `sbt "runMain graft.examples.GrouperRateProbe [trials]"`. */
object GrouperRateProbe {
  def main(args: Array[String]): Unit = {
    val trials = if (args.nonEmpty) args(0).toInt else 3
    val spark = graft.Session.local()
    implicit val enc = org.apache.spark.sql.Encoders.scalaLong
    def trial(): Double = {
      val g = graft.streaming.Grouper.start[Long, Long](spark,
        ds => ds.collect().toSeq.map(_ + 1), capacity = 10000,
        intervalMs = Some(10L))
      val n = 5000
      val t0 = System.nanoTime()
      val fs = (1L to n).map(g.submit(_))
      fs.foreach(Await.result(_, 120.seconds))
      val rate = n / ((System.nanoTime() - t0) / 1e9)
      g.close()
      rate
    }
    val rates = (1 to trials).map(_ => trial())
    println(f"""{"grouper_items_per_sec_trials":[${rates.map(r => f"$r%.1f").mkString(",")}],"best":${rates.max}%.1f}""")
    spark.stop()
  }
}
