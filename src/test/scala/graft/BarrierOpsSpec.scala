package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators._

/** Pins the barrier fault-tolerance switch: default barriers are local
  * checkpoints (non-replicated, CacheManager-free), and
  * `spark.graft.checkpoint.reliable=true` + a checkpoint dir reroutes
  * them to reliable checkpoints with identical results. The flag
  * WITHOUT a dir must fall back to local (reliable would throw deep
  * inside an operator). Test order matters: the no-dir fallback runs
  * BEFORE any test sets a checkpoint dir on the shared context, because
  * a SparkContext's checkpoint dir cannot be unset.
  */
class BarrierOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  test("default barrier is a local checkpoint and pins nothing in the CacheManager") {
    import spark.implicits._
    val df = (1L to 100L).toDF("v").barrier()
    assert(df.count() == 100)
    assert(org.apache.spark.sql.graft.Shims.cacheManagerEmpty(spark))
  }

  test("reliable=true WITHOUT a checkpoint dir falls back to local, not an error") {
    import spark.implicits._
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "precondition: this test must run before any checkpoint dir is set")
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    try {
      val df = (1L to 10L).toDF("v").barrierLazy()
      assert(df.count() == 10)
      val eager = (1L to 10L).toDF("v").barrier()
      assert(eager.count() == 10)
    } finally spark.conf.unset("spark.graft.checkpoint.reliable")
  }

  test("reliable=true with a checkpoint dir routes to a reliable checkpoint") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    try {
      val df = (1L to 50L).toDF("v")
        .withColumn("w", org.apache.spark.sql.functions.col("v") * 2)
      val out = df.barrier()
      assert(out.collect().map(_.getLong(1)).sum == 2550L)
      // the reliable checkpoint materialized RDD files under the dir
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, "reliable checkpoint wrote no files under the checkpoint dir")
      assert(org.apache.spark.sql.graft.Shims.cacheManagerEmpty(spark))
    } finally spark.conf.unset("spark.graft.checkpoint.reliable")
  }
}
