package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graft.Shims

import graft.plans.{TopKPerGroup, TopKStrategy}

/** User-facing API over the custom [[graft.plans.TopKPerGroup]] operator. */
object TopK {

  /** Top-k rows per group by `orderCol` (descending by default), planned
    * as partial bounded heaps → exchange on the group keys → final heaps.
    * Output row order is unspecified, like any aggregate — sort downstream
    * if needed. Supply a unique ordering expression for deterministic
    * results under ties. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: Column,
      k: Int, desc: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    Shims.addStrategy(spark, TopKStrategy)
    val withOrd = df.withColumn("__ord", orderCol)
    val analyzed = withOrd.queryExecution.analyzed
    val out = analyzed.output
    val groupAttrs = groupCols.map(c => out.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(s"no such column: $c")))
    val ordAttr = out.find(_.name == "__ord").get
    Shims.ofRows(spark, TopKPerGroup(groupAttrs, ordAttr, k, desc, analyzed))
      .drop("__ord")
  }
}
