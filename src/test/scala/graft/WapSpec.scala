package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Merge

/** Write–audit–publish: a clean batch lands, a dirty batch is quarantined
  * and the published snapshot is untouched. */
class WapSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Session.local(4)

  override def afterAll(): Unit = spark.stop()

  private def freshPath(): String =
    s"${System.getProperty("java.io.tmpdir")}/wap_spec_${System.nanoTime()}"

  test("clean batch audits green and publishes") {
    import spark.implicits._
    val path = freshPath()
    Merge.writeBucketedSnapshot(
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "v", "x"),
      path, Seq("k"), buckets = 4)
    val batch = Seq((2L, "b2", 25.0), (3L, "c", 30.0))
      .toDF("k", "v", "x")
      .withColumn("__op", lit("U")).withColumn("__seq", lit(1L))
    val report = Merge.writeAuditPublish(path, batch, Seq("k"),
      "__op", "__seq", 4,
      Seq("key_not_null" -> col("k").isNotNull,
        "positive_x" -> (col("x") > 0))).collect()
    assert(report.length == 3)
    assert(report.forall(_.getAs[Long]("n_violations") == 0L))
    assert(report.forall(_.getAs[Boolean]("published")))
    val out = Merge.readBucketedSnapshot(spark, path)
      .select("k", "v").orderBy("k").collect().map(r =>
        (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
  }

  test("violating batch is rejected and the snapshot is untouched") {
    import spark.implicits._
    val path = freshPath()
    Merge.writeBucketedSnapshot(
      Seq((1L, "a", 10.0)).toDF("k", "v", "x"), path, Seq("k"), 4)
    val before = Merge.readBucketedSnapshot(spark, path)
      .orderBy("k").collect().toSeq
    // two violations: a duplicate key pair and one nonpositive x
    val batch = Seq((5L, "d", -1.0), (6L, "e", 5.0), (6L, "e2", 6.0))
      .toDF("k", "v", "x")
      .withColumn("__op", lit("U")).withColumn("__seq", lit(1L))
    val byName = Merge.writeAuditPublish(path, batch, Seq("k"),
      "__op", "__seq", 4,
      Seq("key_not_null" -> col("k").isNotNull,
        "positive_x" -> (col("x") > 0)))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_violations"), r.getAs[Boolean]("published"))))
      .toMap
    assert(byName("positive_x") == ((1L, false)))
    assert(byName("unique_key") == ((1L, false)))
    assert(byName("key_not_null") == ((0L, false)))
    val after = Merge.readBucketedSnapshot(spark, path)
      .orderBy("k").collect().toSeq
    assert(after == before)
    // the rejected batch stays inspectable in the staging quarantine
    assert(spark.read.parquet(path + ".staging").count() == 3L)
  }

  test("multiple sequenced ops for one key publish (seqCol resolves them); staging cleared") {
    import spark.implicits._
    val path = freshPath()
    Merge.writeBucketedSnapshot(
      Seq((1L, "a", 10.0)).toDF("k", "v", "x"), path, Seq("k"), 4)
    // same key twice at DIFFERENT seq — exactly what the publish's
    // seqCol resolves; must NOT trip unique_key
    val batch = Seq((2L, "first", 1.0, "U", 1L), (2L, "second", 2.0, "U", 2L))
      .toDF("k", "v", "x", "__op", "__seq")
    val report = Merge.writeAuditPublish(path, batch, Seq("k"),
      "__op", "__seq", 4, Seq("positive_x" -> (col("x") > 0))).collect()
    assert(report.forall(_.getAs[Long]("n_violations") == 0L))
    assert(report.forall(_.getAs[Boolean]("published")))
    val out = Merge.readBucketedSnapshot(spark, path)
      .filter(col("k") === 2L).select("v").collect().map(_.getString(0))
    assert(out.toSeq == Seq("second"), "highest seq must win")
    // a published batch leaves no staging quarantine behind
    assert(!new java.io.File(path + ".staging").exists())
  }

  test("audit is one staged-batch scan: adding checks adds no Spark jobs") {
    import spark.implicits._
    val path = freshPath()
    Merge.writeBucketedSnapshot(
      Seq((1L, "a", 10.0)).toDF("k", "v", "x"), path, Seq("k"), 4)
    // rejected batches isolate the audit cost (no publish jobs)
    def rejected(n: Int) = Seq((9L, "z", -1.0, "U", n.toLong))
      .toDF("k", "v", "x", "__op", "__seq")
    def jobsFor(checks: Seq[(String, org.apache.spark.sql.Column)], seq: Int): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          counter.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        Merge.writeAuditPublish(path, rejected(seq), Seq("k"),
          "__op", "__seq", 4, checks).collect()
        // listener events are async; give the bus a beat to drain
        Thread.sleep(500)
      } finally spark.sparkContext.removeSparkListener(listener)
      counter.get()
    }
    val oneCheck = jobsFor(Seq("c1" -> (col("x") > 0)), 1)
    val fourChecks = jobsFor(Seq(
      "c1" -> (col("x") > 0), "c2" -> col("k").isNotNull,
      "c3" -> (col("v") =!= ""), "c4" -> (col("x") < 1e9)), 2)
    assert(fourChecks == oneCheck,
      s"audit jobs grew with check count: $oneCheck -> $fourChecks")
  }

  test("null predicate result counts as a violation, not a pass") {
    import spark.implicits._
    val path = freshPath()
    Merge.writeBucketedSnapshot(
      Seq((1L, "a", 10.0)).toDF("k", "v", "x"), path, Seq("k"), 4)
    val batch = Seq((2L, "b", null.asInstanceOf[java.lang.Double]))
      .toDF("k", "v", "x")
      .withColumn("__op", lit("U")).withColumn("__seq", lit(1L))
    val report = Merge.writeAuditPublish(path, batch, Seq("k"),
      "__op", "__seq", 4, Seq("positive_x" -> (col("x") > 0)))
      .collect()
    val row = report.find(_.getString(0) == "positive_x").get
    assert(row.getAs[Long]("n_violations") == 1L)
    assert(!row.getAs[Boolean]("published"))
  }
}
