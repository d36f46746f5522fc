package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{Tables => T}

/** Round-7 tenth wave: max drawdown, frequent triples, blocking-quality
  * evaluation, and quantile treatment effects. Order statistics are
  * picked at integer-arithmetic ranks, pair/triple counts stay exact,
  * and the blocking audit computes its quadratic ground truth on a
  * bounded deterministic sample — the metric layer over q256/q325's
  * linear-at-scale candidate generation.
  */
object Round64 {

  val all: Seq[Q] = Seq(

    // maximum drawdown of each nation's monthly revenue series: running
    // peak minus current value, maximized — every comparison on exact
    // decimal sums, one keyed window pass, a single final cast.
    Q("q347_drawdown", (s, d) => {
      import s.implicits._
      val monthly = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(T.nation(s, d), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name", trunc(to_date($"o_orderdate"), "month").as("mo"))
        .agg(sum($"o_totalprice".cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("rev"))
      val w = Window.partitionBy($"n_name").orderBy($"mo")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      monthly
        .withColumn("__peak", max($"rev").over(w))
        .groupBy($"n_name").agg(
          count(lit(1)).as("n_months"),
          max($"__peak" - $"rev").cast("double").as("max_drawdown"))
        .orderBy($"n_name")
    }, Some("""
      WITH monthly AS (SELECT n_name,
              date_trunc('month', CAST(o_orderdate AS DATE)) AS mo,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS rev
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2),
      pk AS (SELECT n_name, rev,
               max(rev) OVER (PARTITION BY n_name ORDER BY mo
                 ROWS UNBOUNDED PRECEDING) AS peak
             FROM monthly)
      SELECT n_name, count(*) AS n_months,
             CAST(max(peak - rev) AS DOUBLE) AS max_drawdown
      FROM pk GROUP BY 1 ORDER BY 1""")),

    // frequent brand triples with third-order lift: the A-Priori step
    // past q145/q336 — three-way self-join on distinct (order, brand)
    // baskets, a < b < c, exact integer supports, lift₃ = n²·s_abc /
    // (s_a·s_b·s_c) as one double division of exact long products.
    Q("q348_basket_triples", (s, d) => {
      import s.implicits._
      val op = T.lineitem(s, d)
        .join(T.part(s, d), $"l_partkey" === $"p_partkey")
        .select($"l_orderkey", $"p_brand").distinct()
      val nb = op.select(countDistinct($"l_orderkey").as("__n"))
      val cnt = op.groupBy($"p_brand").agg(count(lit(1)).as("__c"))
      val tri = op.as("x").join(op.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey")
            && col("x.p_brand") < col("y.p_brand"))
        .join(op.as("z"),
          col("x.l_orderkey") === col("z.l_orderkey")
            && col("y.p_brand") < col("z.p_brand"))
        .groupBy(col("x.p_brand").as("brand_a"),
          col("y.p_brand").as("brand_b"),
          col("z.p_brand").as("brand_c"))
        .agg(count(lit(1)).as("support"))
        .filter($"support" >= 3)
      tri.join(cnt.select($"p_brand".as("brand_a"), $"__c".as("__ca")),
          "brand_a")
        .join(cnt.select($"p_brand".as("brand_b"), $"__c".as("__cb")),
          "brand_b")
        .join(cnt.select($"p_brand".as("brand_c"), $"__c".as("__cc")),
          "brand_c")
        .crossJoin(broadcast(nb))
        .select($"brand_a", $"brand_b", $"brand_c", $"support",
          round(($"__n" * $"__n" * $"support").cast("double")
            / ($"__ca" * $"__cb" * $"__cc").cast("double"), 6)
            .as("lift3"))
        .orderBy($"brand_a", $"brand_b", $"brand_c")
    }, Some("""
      WITH op AS (SELECT DISTINCT l_orderkey, p_brand
                  FROM lineitem JOIN part ON l_partkey = p_partkey),
      nb AS (SELECT count(DISTINCT l_orderkey) AS n FROM op),
      cnt AS (SELECT p_brand, count(*) AS c FROM op GROUP BY 1),
      tri AS (SELECT x.p_brand AS brand_a, y.p_brand AS brand_b,
                z.p_brand AS brand_c, count(*) AS support
              FROM op x
              JOIN op y ON x.l_orderkey = y.l_orderkey
                AND x.p_brand < y.p_brand
              JOIN op z ON x.l_orderkey = z.l_orderkey
                AND y.p_brand < z.p_brand
              GROUP BY 1, 2, 3 HAVING count(*) >= 3)
      SELECT brand_a, brand_b, brand_c,
             CAST(support AS BIGINT) AS support,
             round(CAST(nb.n * nb.n * support AS DOUBLE)
                   / CAST(ca.c * cb.c * cc.c AS DOUBLE), 6) AS lift3
      FROM tri
      JOIN cnt ca ON ca.p_brand = brand_a
      JOIN cnt cb ON cb.p_brand = brand_b
      JOIN cnt cc ON cc.p_brand = brand_c
      CROSS JOIN nb
      ORDER BY brand_a, brand_b, brand_c""")),

    // blocking-quality audit on a bounded deterministic sample: ground
    // truth = token-Jaccard ≥ 0.4 pairs, candidates = pairs sharing the
    // (length-bucket, 8-char-prefix) block. Reduction ratio and pairs
    // completeness from exact integer counts — the evaluation layer for
    // the q256/q325 linear blocking pipelines; the quadratic truth pass
    // exists ONLY inside the ≤500-doc sample.
    Q("q349_blocking_quality", (s, d) => {
      import s.implicits._
      val docs = T.documents(s, d)
        .filter($"doc_id" % 10 < 5).orderBy($"doc_id").limit(500)
        .select($"doc_id", $"text",
          array_distinct(split($"text", " ")).as("toks"),
          concat((length($"text") / 50).cast("long").cast("string"),
            lit("|"), substring($"text", 1, 8)).as("blk"))
      val pairs = docs.as("a").join(docs.as("b"),
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"),
          (size(array_intersect(col("a.toks"), col("b.toks"))) * 10
            >= size(array_union(col("a.toks"), col("b.toks"))) * 4)
            .as("is_dup"),
          (col("a.blk") === col("b.blk")).as("in_block"))
      pairs.agg(
          count(lit(1)).as("n_pairs"),
          sum($"is_dup".cast("long")).as("n_true"),
          sum($"in_block".cast("long")).as("n_candidates"),
          sum(($"is_dup" && $"in_block").cast("long")).as("n_caught"))
        .select($"n_pairs", $"n_true", $"n_candidates", $"n_caught",
          round(lit(1.0) - $"n_candidates".cast("double")
            / $"n_pairs".cast("double"), 6).as("reduction_ratio"),
          round($"n_caught".cast("double") / $"n_true".cast("double"), 6)
            .as("pairs_completeness"))
    }, Some("""
      WITH docs AS (SELECT doc_id, text,
              list_distinct(string_split(text, ' ')) AS toks,
              CAST(CAST(length(text) // 50 AS BIGINT) AS VARCHAR)
                || '|' || substr(text, 1, 8) AS blk
            FROM (SELECT * FROM documents WHERE doc_id % 10 < 5
                  ORDER BY doc_id LIMIT 500)),
      pairs AS (SELECT
              len(list_intersect(a.toks, b.toks)) * 10
                >= len(list_distinct(list_concat(a.toks, b.toks))) * 4
                AS is_dup,
              a.blk = b.blk AS in_block
            FROM docs a JOIN docs b ON a.doc_id < b.doc_id)
      SELECT count(*) AS n_pairs,
             CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
               AS n_true,
             CAST(sum(CASE WHEN in_block THEN 1 ELSE 0 END) AS BIGINT)
               AS n_candidates,
             CAST(sum(CASE WHEN is_dup AND in_block THEN 1 ELSE 0 END)
               AS BIGINT) AS n_caught,
             round(1.0 - CAST(sum(CASE WHEN in_block THEN 1 ELSE 0 END)
                     AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
               AS reduction_ratio,
             round(CAST(sum(CASE WHEN is_dup AND in_block THEN 1 ELSE 0
                     END) AS DOUBLE)
                   / CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END)
                     AS DOUBLE), 6) AS pairs_completeness
      FROM pairs""")),

    // quantile treatment effects: the q341 priority treatment at the
    // median and 90th percentile per segment — order statistics picked
    // at integer-arithmetic ranks (ceil(pn) = (pn+den−1)//den, no
    // double rank arithmetic to flap an edge), values exact decimals,
    // differences one final double.
    Q("q350_qte", (s, d) => {
      import s.implicits._
      val rows = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment",
          ($"o_orderpriority".isin("1-URGENT", "2-HIGH")).cast("long")
            .as("t"),
          $"o_totalprice".cast("decimal(18,2)").as("y"))
      val w = Window.partitionBy($"c_mktsegment", $"t").orderBy($"y")
      val wn = Window.partitionBy($"c_mktsegment", $"t")
      val ranked = rows
        .withColumn("__rk", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(wn))
      val q = ranked.groupBy($"c_mktsegment", $"t").agg(
        max($"__n").as("n"),
        max(when($"__rk" === expr("(__n + 1) div 2"), $"y")).as("q50"),
        max(when($"__rk" === expr("(9 * __n + 9) div 10"), $"y"))
          .as("q90"))
      val tr = q.filter($"t" === 1).select($"c_mktsegment",
        $"n".as("n_treated"), $"q50".as("__t50"), $"q90".as("__t90"))
      val ct = q.filter($"t" === 0).select($"c_mktsegment".as("__s"),
        $"n".as("n_control"), $"q50".as("__c50"), $"q90".as("__c90"))
      tr.join(ct, $"c_mktsegment" === $"__s")
        .select($"c_mktsegment", $"n_treated", $"n_control",
          ($"__t50" - $"__c50").cast("double").as("qte50"),
          ($"__t90" - $"__c90").cast("double").as("qte90"))
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH rows_ AS (SELECT c_mktsegment,
              CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 1 ELSE 0 END AS t,
              CAST(o_totalprice AS DECIMAL(18,2)) AS y
            FROM orders JOIN customer ON o_custkey = c_custkey),
      ranked AS (SELECT c_mktsegment, t, y,
                   row_number() OVER (PARTITION BY c_mktsegment, t
                     ORDER BY y) AS rk,
                   count(*) OVER (PARTITION BY c_mktsegment, t) AS n
                 FROM rows_),
      q AS (SELECT c_mktsegment, t, max(n) AS n,
              max(CASE WHEN rk = (n + 1) // 2 THEN y END) AS q50,
              max(CASE WHEN rk = (9 * n + 9) // 10 THEN y END) AS q90
            FROM ranked GROUP BY 1, 2)
      SELECT tr.c_mktsegment,
             CAST(tr.n AS BIGINT) AS n_treated,
             CAST(ct.n AS BIGINT) AS n_control,
             CAST(tr.q50 - ct.q50 AS DOUBLE) AS qte50,
             CAST(tr.q90 - ct.q90 AS DOUBLE) AS qte90
      FROM q tr JOIN q ct ON tr.c_mktsegment = ct.c_mktsegment
        AND tr.t = 1 AND ct.t = 0
      ORDER BY tr.c_mktsegment"""))
  )
}
