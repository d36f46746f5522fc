package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Decontaminate, Hierarchy, Quantiles}
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
      SELECT vec_id, eval_id, sim FROM f WHERE rn = 1 ORDER BY vec_id""")),

    // RFM customer segmentation: recency/frequency/monetary quintile
    // scores from ONE multi-column exact-quantile sort pass (stack-
    // unpivot, q84's machinery), assigned by q152's branch-free
    // comparison sums against the broadcast 1-row boundary table
    Q("q199_rfm", (s, d) => {
      import s.implicits._
      val orders = T.orders(s, d)
      val refDate = orders.agg(max(to_date($"o_orderdate")).as("__ref"))
      val base = orders
        .groupBy($"o_custkey")
        .agg(max(to_date($"o_orderdate")).as("__last"),
          count(lit(1)).as("frequency"),
          sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
            .as("monetary"))
        .crossJoin(broadcast(refDate))
        .withColumn("recency", datediff($"__ref", $"__last"))
        .select($"o_custkey", $"recency", $"frequency", $"monetary")
      val bounds = Quantiles.exactQuantilesMulti(base, Seq(),
        Seq("recency", "frequency", "monetary"), Seq(0.2, 0.4, 0.6, 0.8))
      def scoreUp(c: String, pre: String) =
        lit(1) + Seq(20, 40, 60, 80).map(p =>
          (col(c) > col(s"${pre}_p$p")).cast("int")).reduce(_ + _)
      val scored = base.crossJoin(broadcast(bounds))
        .select($"o_custkey", $"recency", $"frequency", $"monetary",
          (lit(6) - scoreUp("recency", "recency")).as("r_score"),
          scoreUp("frequency", "frequency").as("f_score"),
          scoreUp("monetary", "monetary").as("m_score"))
      scored.withColumn("segment",
          when($"r_score" >= 4 && $"f_score" >= 4, "champion")
            .when($"r_score" >= 4, "recent")
            .when($"f_score" >= 4, "loyal")
            .when($"r_score" <= 2 && $"f_score" <= 2, "at_risk")
            .otherwise("regular"))
        .orderBy($"o_custkey")
    }, Some("""
      WITH base AS (
        SELECT o_custkey,
               date_diff('day', max(CAST(o_orderdate AS DATE)),
                 (SELECT max(CAST(o_orderdate AS DATE)) FROM orders))
                 AS recency,
               count(*) AS frequency,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS monetary
        FROM orders GROUP BY 1),
      b AS (SELECT quantile_cont(recency, [0.2, 0.4, 0.6, 0.8]) AS rq,
                   quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS fq,
                   quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mq
            FROM base),
      s AS (SELECT o_custkey, recency, frequency, monetary,
                   6 - (1 + (CASE WHEN recency > rq[1] THEN 1 ELSE 0 END)
                          + (CASE WHEN recency > rq[2] THEN 1 ELSE 0 END)
                          + (CASE WHEN recency > rq[3] THEN 1 ELSE 0 END)
                          + (CASE WHEN recency > rq[4] THEN 1 ELSE 0 END))
                     AS r_score,
                   1 + (CASE WHEN frequency > fq[1] THEN 1 ELSE 0 END)
                     + (CASE WHEN frequency > fq[2] THEN 1 ELSE 0 END)
                     + (CASE WHEN frequency > fq[3] THEN 1 ELSE 0 END)
                     + (CASE WHEN frequency > fq[4] THEN 1 ELSE 0 END)
                     AS f_score,
                   1 + (CASE WHEN monetary > mq[1] THEN 1 ELSE 0 END)
                     + (CASE WHEN monetary > mq[2] THEN 1 ELSE 0 END)
                     + (CASE WHEN monetary > mq[3] THEN 1 ELSE 0 END)
                     + (CASE WHEN monetary > mq[4] THEN 1 ELSE 0 END)
                     AS m_score
            FROM base, b)
      SELECT o_custkey, recency, frequency, monetary, r_score, f_score,
             m_score,
             CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
                  WHEN r_score >= 4 THEN 'recent'
                  WHEN f_score >= 4 THEN 'loyal'
                  WHEN r_score <= 2 AND f_score <= 2 THEN 'at_risk'
                  ELSE 'regular' END AS segment
      FROM s ORDER BY o_custkey""")),

    // cohort LTV: customers grouped by first-order month, cumulative
    // revenue per cohort user across month offsets — integer month
    // arithmetic, decimal-exact revenue, cohort-keyed windows
    Q("q200_cohort_ltv", (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val orders = T.orders(s, d).select($"o_custkey",
        (year(to_date($"o_orderdate")) * 12 +
          month(to_date($"o_orderdate"))).as("__ym"),
        $"o_totalprice")
      val cohorts = orders.groupBy($"o_custkey")
        .agg(min($"__ym").as("cohort_ym"))
      val sizes = cohorts.groupBy($"cohort_ym")
        .agg(countDistinct($"o_custkey").as("cohort_users"))
      val cells = orders.join(cohorts, "o_custkey")
        .groupBy($"cohort_ym", ($"__ym" - $"cohort_ym").as("month_offset"))
        .agg(sum($"o_totalprice".cast("decimal(18,2)")).as("__rev"))
      val w = Window.partitionBy($"cohort_ym").orderBy($"month_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells.join(sizes, "cohort_ym")
        .withColumn("__cum", sum($"__rev").over(w))
        // cents-per-user quotients routinely land EXACTLY on a
        // half-boundary (terminating decimals), where Spark rounds the
        // double's binary expansion and DuckDB its decimal rendering —
        // so the 4-place half-up round is done in INTEGER arithmetic:
        // round_half_up(a/b) = (2a + b) div (2b) on exact 10^-4 units.
        // (Long capacity: ~9e14 currency units; a planetary-scale sum
        // would switch these two lines to decimal accumulators.)
        .withColumn("__a", ($"__cum" * 10000).cast("long"))
        .select($"cohort_ym", $"month_offset", $"cohort_users",
          round($"__rev".cast("double"), 2).as("revenue"),
          (expr("(2 * __a + cohort_users) div (2 * cohort_users)")
            / lit(10000.0)).as("cum_ltv_per_user"))
        .orderBy($"cohort_ym", $"month_offset")
    }, Some("""
      WITH o AS (SELECT o_custkey,
                        year(CAST(o_orderdate AS DATE)) * 12 +
                          month(CAST(o_orderdate AS DATE)) AS ym,
                        o_totalprice
                 FROM orders),
      c AS (SELECT o_custkey, min(ym) AS cohort_ym FROM o GROUP BY 1),
      sz AS (SELECT cohort_ym, count(DISTINCT o_custkey) AS cohort_users
             FROM c GROUP BY 1),
      cell AS (SELECT cohort_ym, ym - cohort_ym AS month_offset,
                      sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
               FROM o JOIN c USING (o_custkey) GROUP BY 1, 2),
      cum AS (SELECT cohort_ym, month_offset, rev,
                     sum(rev) OVER (PARTITION BY cohort_ym
                       ORDER BY month_offset) AS cum_rev
              FROM cell)
      SELECT cohort_ym, month_offset, cohort_users,
             round(CAST(rev AS DOUBLE), 2) AS revenue,
             ((2 * CAST(cum_rev * 10000 AS BIGINT) + cohort_users)
               // (2 * cohort_users)) / 10000.0 AS cum_ltv_per_user
      FROM cum JOIN sz USING (cohort_ym)
      ORDER BY cohort_ym, month_offset""")),

    // Benford first-digit audit of extended prices — the data-quality /
    // fraud screen: observed digit shares vs ln(1+1/d)/ln(10) with
    // per-digit chi-squared contributions; digit extraction through
    // integer cents so no float log10 sits near a power-of-ten boundary
    Q("q201_benford", (s, d) => {
      import s.implicits._
      val digits = T.lineitem(s, d).select(
        substring(($"l_extendedprice" * 100).cast("long").cast("string"),
          1, 1).cast("int").as("digit"))
      val total = digits.agg(count(lit(1)).as("__n"))
      digits.groupBy($"digit").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(total))
        .select($"digit", $"n",
          round($"n".cast("double") / $"__n", 6).as("share"),
          round(log(lit(1.0) + lit(1.0) / $"digit") / log(lit(10.0)), 6)
            .as("expected"),
          round(pow($"n" - $"__n" * (log(lit(1.0) + lit(1.0) / $"digit")
              / log(lit(10.0))), 2)
            / ($"__n" * (log(lit(1.0) + lit(1.0) / $"digit")
              / log(lit(10.0)))), 6).as("chi2_part"))
        .orderBy($"digit")
    }, Some("""
      WITH dg AS (SELECT CAST(substring(CAST(CAST(l_extendedprice * 100
                    AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
                  FROM lineitem),
      t AS (SELECT count(*) AS tot FROM dg),
      c AS (SELECT digit, count(*) AS n FROM dg GROUP BY 1)
      SELECT digit, n, round(n * 1.0 / tot, 6) AS share,
             round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS expected,
             round(pow(n - tot * (ln(1.0 + 1.0 / digit) / ln(10.0)), 2)
               / (tot * (ln(1.0 + 1.0 / digit) / ln(10.0))), 6)
               AS chi2_part
      FROM c, t ORDER BY digit"""))
  )
}
