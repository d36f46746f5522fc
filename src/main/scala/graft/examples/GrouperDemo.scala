package graft.examples

import scala.concurrent.Await
import scala.concurrent.duration._

import graft.Session
import graft.streaming.Grouper

/** Usage example mirroring the reference README's flow
  * (`/root/reference/README.md:85-131`): start a grouper, submit
  * individual items, observe batched per-item results, drain on close.
  */
object GrouperDemo {
  def main(args: Array[String]): Unit = {
    val spark = Session.local(4)
    implicit val enc = org.apache.spark.sql.Encoders.scalaInt

    // batch-level processor: one Spark job per micro-batch, results
    // aligned per item (the reference's proc-fn returning a collection)
    val g = Grouper.start[Int, Int](spark,
      batch => batch.collect().toSeq.map(_ * 10),
      capacity = 1000, intervalMs = Some(100L))

    val futures = (1 to 20).map(i => g.submit(i, callback =
      r => println(s"callback: $i -> $r")))
    val results = futures.map(Await.result(_, 60.seconds))
    println(s"results: ${results.mkString(",")}")
    g.close()
    println(s"running after close: ${g.isRunning}")
    spark.stop()
  }
}
