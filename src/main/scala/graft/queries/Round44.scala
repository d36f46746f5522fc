package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Scale
import graft.sources.{Tables => T}

/** Round-6 thirty-sixth wave: layout skipping audit, two-proportion
  * z-test.
  */
object Round44 {

  val all: Seq[Q] = Seq(

    // WHY z-order: simulate 64 range-bucketed "files" under a linear
    // (partkey) layout vs a z-ordered (partkey ⊗ suppkey) layout and
    // count how many buckets a suppkey-range predicate must scan from
    // their min/max stats — pure hash aggregates over integer bucket
    // ids (no global sort: bucket = key-range, like real file bounds
    // under range partitioning); the read-out behind Scale.zOrderWrite
    Q("q286_layout_skip", (s, d) => {
      import s.implicits._
      val base = T.lineitem(s, d)
        .select($"l_partkey".as("a"), $"l_suppkey".as("b"))
        .withColumn("z", Scale.zValue($"a", $"b", 16))
      val maxes = base.agg(max($"a").as("__ma"), max($"b").as("__mb"),
        max($"z").as("__mz"))
      val bucketed = base.crossJoin(broadcast(maxes))
        .select(explode(array(
          struct(lit("linear_a").as("layout"),
            expr("a * 64 div (__ma + 1)").as("bucket"), $"a", $"b",
            $"__ma", $"__mb"),
          struct(lit("linear_b").as("layout"),
            expr("b * 64 div (__mb + 1)").as("bucket"), $"a", $"b",
            $"__ma", $"__mb"),
          struct(lit("zorder_ab").as("layout"),
            expr("z * 64 div (__mz + 1)").as("bucket"), $"a", $"b",
            $"__ma", $"__mb"))).as("e"))
        .select($"e.*")
      val stats = bucketed.groupBy($"layout", $"bucket")
        .agg(min($"a").as("__alo"), max($"a").as("__ahi"),
          min($"b").as("__blo"), max($"b").as("__bhi"),
          max($"__ma").as("__ma"), max($"__mb").as("__mb"))
      val preds = stats.select($"layout", $"bucket",
        explode(array(
          struct(lit("a_range").as("predicate"),
            expr("__ma div 4").as("lo"), expr("__ma div 3").as("hi"),
            $"__alo".as("dlo"), $"__ahi".as("dhi")),
          struct(lit("b_range").as("predicate"),
            expr("__mb div 4").as("lo"), expr("__mb div 3").as("hi"),
            $"__blo".as("dlo"), $"__bhi".as("dhi")))).as("p"))
        .select($"layout", $"p.*")
      preds.groupBy($"layout", $"predicate")
        .agg(count(lit(1)).as("n_buckets"),
          sum(when($"dlo" <= $"hi" && $"dhi" >= $"lo", 1L).otherwise(0L))
            .as("buckets_scanned"))
        .select($"layout", $"predicate", $"n_buckets", $"buckets_scanned",
          round($"buckets_scanned".cast("double")
            / $"n_buckets".cast("double"), 6).as("scan_share"))
        .orderBy($"layout", $"predicate")
    }, Some("""
      WITH base AS (SELECT l_partkey AS a, l_suppkey AS b,
                      list_sum(list_transform(range(0, 16), i ->
                        (((l_partkey >> i) & 1) << (2 * i)) +
                        (((l_suppkey >> i) & 1) << (2 * i + 1)))) AS z
                    FROM lineitem),
      m AS (SELECT max(a) AS ma, max(b) AS mb, max(z) AS mz FROM base),
      bk AS (SELECT 'linear_a' AS layout, a * 64 // (ma + 1) AS bucket,
                    a, b
             FROM base, m
             UNION ALL
             SELECT 'linear_b', b * 64 // (mb + 1), a, b FROM base, m
             UNION ALL
             SELECT 'zorder_ab', z * 64 // (mz + 1), a, b FROM base, m),
      st AS (SELECT layout, bucket,
                    min(a) AS alo, max(a) AS ahi,
                    min(b) AS blo, max(b) AS bhi
             FROM bk GROUP BY 1, 2),
      pr AS (SELECT 'a_range' AS predicate, ma // 4 AS lo, ma // 3 AS hi,
                    'a' AS dim
             FROM m
             UNION ALL SELECT 'b_range', mb // 4, mb // 3, 'b' FROM m),
      agg AS (SELECT layout, predicate, count(*) AS n_buckets,
                CAST(sum(CASE WHEN (dim = 'a' AND alo <= hi
                                    AND ahi >= lo)
                                OR (dim = 'b' AND blo <= hi
                                    AND bhi >= lo)
                              THEN 1 ELSE 0 END) AS BIGINT)
                  AS buckets_scanned
              FROM st, pr GROUP BY 1, 2)
      SELECT layout, predicate, n_buckets, buckets_scanned,
             round(CAST(buckets_scanned AS DOUBLE)
                   / CAST(n_buckets AS DOUBLE), 6) AS scan_share
      FROM agg ORDER BY layout, predicate""")),

    // experiment read-out: two-proportion z-test of each segment's
    // fulfilled-order rate against all other segments — integer counts
    // to the end, one scalar pooled-variance z per segment
    Q("q287_prop_ztest", (s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment",
          when($"o_orderstatus" === "F", 1L).otherwise(0L).as("__f"))
      val per = o.groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n1"), sum($"__f").as("x1"))
      val tot = o.agg(count(lit(1)).as("__n"), sum($"__f").as("__x"))
      val j = per.crossJoin(broadcast(tot))
        .withColumn("n2", $"__n" - $"n1")
        .withColumn("x2", $"__x" - $"x1")
      val p1 = $"x1".cast("double") / $"n1".cast("double")
      val p2 = $"x2".cast("double") / $"n2".cast("double")
      val pp = $"__x".cast("double") / $"__n".cast("double")
      val z = (p1 - p2) / sqrt(pp * (lit(1.0) - pp)
        * (lit(1.0) / $"n1".cast("double") + lit(1.0) / $"n2".cast("double")))
      j.filter($"n1" > 0 && $"n2" > 0)
        .select($"c_mktsegment", $"n1", $"x1", $"n2", $"x2",
          round(p1, 6).as("rate"), round(p2, 6).as("rate_rest"),
          round(z, 6).as("z"))
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH o AS (SELECT c_mktsegment,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS f
                 FROM orders JOIN customer ON o_custkey = c_custkey),
      per AS (SELECT c_mktsegment, count(*) AS n1,
                CAST(sum(f) AS BIGINT) AS x1
              FROM o GROUP BY 1),
      tot AS (SELECT count(*) AS n, CAST(sum(f) AS BIGINT) AS x FROM o),
      j AS (SELECT c_mktsegment, n1, x1, n - n1 AS n2, x - x1 AS x2,
                   n, x
            FROM per, tot)
      SELECT c_mktsegment, n1, x1, n2, x2,
             round(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS rate,
             round(CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6)
               AS rate_rest,
             round((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                   / sqrt((CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                          * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                          * (1.0 / CAST(n1 AS DOUBLE)
                             + 1.0 / CAST(n2 AS DOUBLE))), 6) AS z
      FROM j WHERE n1 > 0 AND n2 > 0
      ORDER BY c_mktsegment"""))
  )
}
