package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Decontaminate, Hierarchy}
import graft.sources.{Tables => T}

/** Round-6 fifth wave: hierarchy resolution (the recursive-CTE shape
  * Spark lacks, as pointer doubling), unpivot/melt, and semantic
  * decontamination.
  */
object Round13 {

  val all: Seq[Q] = Seq(

    // parent-pointer hierarchy (node -> node div 10) resolved to roots
    // with depths by POINTER DOUBLING: ceil(log2 depth)+1 self-joins
    // instead of one join per level — the recursive-CTE workload on an
    // engine without recursive CTEs
    Q("q196_hierarchy", (s, d) => {
      import s.implicits._
      val edges = T.customer(s, d)
        .select($"c_custkey", expr("c_custkey div 10").as("parent"))
      Hierarchy.resolveRoots(edges, "c_custkey", "parent", maxDepth = 16)
        .select($"node".as("c_custkey"), $"root", $"depth")
        .orderBy($"c_custkey")
    }, Some("""
      WITH RECURSIVE r AS (
        SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth
        FROM customer
        UNION ALL
        SELECT node, cur // 10, depth + 1 FROM r
        WHERE cur // 10 != cur
          AND cur // 10 IN (SELECT c_custkey FROM customer)
      )
      SELECT node AS c_custkey, arg_max(cur, depth) AS root,
             CAST(max(depth) AS BIGINT) AS depth
      FROM r GROUP BY 1 ORDER BY c_custkey""")),

    // unpivot/melt: the four lineitem measures stacked to long form and
    // re-aggregated — wide->long is the other half of q46's pivot
    Q("q197_unpivot", (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .unpivot(Array($"l_returnflag"),
          Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
          "measure", "value")
        .groupBy($"l_returnflag", $"measure")
        .agg(count(lit(1)).as("n"),
          round(sum($"value".cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .orderBy($"l_returnflag", $"measure")
    }, Some("""
      WITH long AS (
        SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS value
        FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
      SELECT l_returnflag, measure, count(*) AS n,
             round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total
      FROM long GROUP BY 1, 2 ORDER BY l_returnflag, measure""")),

    // semantic decontamination: corpus vectors suspiciously close to an
    // eval vector (paraphrase leakage n-gram matching misses) — eval
    // set broadcast, corpus scanned once, per-row argmax eval match
    Q("q198_semantic_decontam", (s, d) => {
      import s.implicits._
      val emb = T.embeddings(s, d)
      Decontaminate.semanticContamination(
          emb.filter($"vec_id" >= 20), emb.filter($"vec_id" < 20),
          "vec_id", "embedding", threshold = 0.4)
        .orderBy($"vec_id")
    }, Some("""
      WITH e AS (SELECT vec_id AS eval_id, embedding FROM embeddings
                 WHERE vec_id < 20),
      c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 20),
      s AS (SELECT c.vec_id, e.eval_id,
                   round(list_cosine_similarity(c.embedding::DOUBLE[],
                     e.embedding::DOUBLE[]), 6) AS sim
            FROM c CROSS JOIN e),
      f AS (SELECT vec_id, eval_id, sim,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY sim DESC, eval_id) AS rn
            FROM s WHERE sim >= 0.4)
      SELECT vec_id, eval_id, sim FROM f WHERE rn = 1 ORDER BY vec_id"""))
  )
}
