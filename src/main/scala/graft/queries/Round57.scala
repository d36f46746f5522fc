package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Merge, Multimodal}
import graft.sources.{Tables => T}

/** Round-7 third wave: the remaining nonparametric-family tests (Cochran's
  * Q, Friedman, Kendall's W — all exact-integer/midrank arithmetic), a
  * multimodal shot-boundary detector over the stub codec, the
  * write–audit–publish lakehouse pattern, and first-occurrence shingle
  * novelty attribution for corpus curation.
  */
object Round57 {

  val all: Seq[Q] = Seq(

    // Cochran's Q per segment: did the set of customers ordering change
    // across 1998/1999/2000? k=3 paired binary treatments; Q =
    // (k−1)(kΣGⱼ² − N²)/(kΣLᵢ − ΣLᵢ²) — every moment an exact integer,
    // one double division at the end. All-zero and all-one subjects
    // cancel in the denominator, so the full customer roster participates
    // without special-casing.
    Q("q318_cochran_q", (s, d) => {
      import s.implicits._
      val years = Seq(1998, 1999, 2000)
      val flags = T.orders(s, d)
        .select($"o_custkey", year($"o_orderdate").as("__y"))
        .filter($"__y".isin(years: _*)).distinct()
      val perCust = T.customer(s, d)
        .join(flags, $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_mktsegment", $"c_custkey")
        .agg(count($"__y").as("__l"))
      val rows = perCust.groupBy($"c_mktsegment").agg(
        count(lit(1)).as("n_subjects"),
        sum($"__l").as("__sl"),
        sum($"__l" * $"__l").as("__sl2"))
      val cols = flags
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment", $"__y").agg(count(lit(1)).as("__g"))
        .groupBy($"c_mktsegment").agg(sum($"__g" * $"__g").as("__sg2"))
      val j = rows.join(cols, "c_mktsegment")
      val k = lit(3.0)
      val num = (k - 1.0) * (k * $"__sg2".cast("double")
        - $"__sl".cast("double") * $"__sl".cast("double"))
      val den = k * $"__sl".cast("double") - $"__sl2".cast("double")
      j.filter(den > 0)
        .select($"c_mktsegment", $"n_subjects", $"__sl".as("n_total"),
          round(num / den, 6).as("q"), lit(2L).as("df"))
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH flags AS (SELECT DISTINCT o_custkey, year(o_orderdate) AS y
                     FROM orders
                     WHERE year(o_orderdate) IN (1998, 1999, 2000)),
      percust AS (SELECT c_mktsegment, c_custkey,
                    CAST(count(y) AS BIGINT) AS l
                  FROM customer LEFT JOIN flags ON c_custkey = o_custkey
                  GROUP BY 1, 2),
      rows_ AS (SELECT c_mktsegment, count(*) AS n_subjects,
                  CAST(sum(l) AS BIGINT) AS sl,
                  CAST(sum(l * l) AS BIGINT) AS sl2
                FROM percust GROUP BY 1),
      pery AS (SELECT c_mktsegment, y, count(*) AS g
               FROM flags JOIN customer ON o_custkey = c_custkey
               GROUP BY 1, 2),
      cols_ AS (SELECT c_mktsegment, CAST(sum(g * g) AS BIGINT) AS sg2
                FROM pery GROUP BY 1)
      SELECT rows_.c_mktsegment, n_subjects, sl AS n_total,
             round((3.0 - 1.0) * (3.0 * CAST(sg2 AS DOUBLE)
                     - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE))
                   / (3.0 * CAST(sl AS DOUBLE) - CAST(sl2 AS DOUBLE)), 6)
               AS q,
             CAST(2 AS BIGINT) AS df
      FROM rows_ JOIN cols_ USING (c_mktsegment)
      WHERE 3.0 * CAST(sl AS DOUBLE) - CAST(sl2 AS DOUBLE) > 0
      ORDER BY c_mktsegment""")),

    // Friedman test: blocks = regions, treatments = order priorities,
    // value = lifetime revenue per cell. Within-block midranks over the
    // k=5 cells are exact halves, so ΣRⱼ² is exact quarter-integer
    // arithmetic — order-independent without any window tricks. Only
    // complete blocks (all k treatments present) enter, making the test
    // well-formed at every scale factor.
    Q("q319_friedman", (s, d) => {
      import s.implicits._
      val cell = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(T.nation(s, d), $"c_nationkey" === $"n_nationkey")
        .join(T.region(s, d), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"o_orderpriority")
        .agg(sum($"o_totalprice".cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("__rev"))
      val full = cell.groupBy($"r_name").agg(count(lit(1)).as("__kc"))
        .filter($"__kc" === 5).select($"r_name")
      val wR = Window.partitionBy($"r_name").orderBy($"__rev")
      val wT = Window.partitionBy($"r_name", $"__rev")
      val ranked = cell.join(full, "r_name")
        .withColumn("__mid", rank().over(wR).cast("double")
          + (count(lit(1)).over(wT) - 1).cast("double") / 2.0)
        .withColumn("__t", count(lit(1)).over(wT))
      val b = ranked.select($"r_name").distinct().count()
      val perTreat = ranked.groupBy($"o_orderpriority")
        .agg(sum($"__mid").as("__rj"))
      val ties = ranked.agg(
        sum(($"__t" * $"__t" - 1).cast("long")).as("__tsum"))
      val kD = lit(5.0); val bD = lit(b.toDouble)
      val chi = perTreat
        .agg(sum($"__rj" * $"__rj").as("__srj2"))
        .crossJoin(ties)
        .select(
          (lit(12.0) / (bD * kD * (kD + 1.0)) * $"__srj2"
            - lit(3.0) * bD * (kD + 1.0)).as("__chi2"),
          (lit(1.0) - $"__tsum".cast("double")
            / (bD * (kD * kD * kD - kD))).as("__c"))
      chi.filter($"__c" > 0)
        .select(lit(b).as("b"), lit(5L).as("k"),
          round($"__chi2", 6).as("chi2"),
          round($"__chi2" / $"__c", 6).as("chi2_adj"),
          lit(4L).as("df"))
    }, Some("""
      WITH cell AS (SELECT r_name, o_orderpriority,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS rev
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1, 2),
      full_ AS (SELECT r_name FROM cell GROUP BY 1 HAVING count(*) = 5),
      ranked AS (SELECT c.r_name, o_orderpriority,
              CAST(rank() OVER (PARTITION BY c.r_name ORDER BY rev)
                AS DOUBLE)
                + (count(*) OVER (PARTITION BY c.r_name, rev) - 1) / 2.0
                AS mid,
              count(*) OVER (PARTITION BY c.r_name, rev) AS t
            FROM cell c JOIN full_ USING (r_name)),
      b_ AS (SELECT count(DISTINCT r_name) AS b FROM ranked),
      rj AS (SELECT o_orderpriority, sum(mid) AS rj
             FROM ranked GROUP BY 1),
      s_ AS (SELECT sum(rj * rj) AS srj2 FROM rj),
      ties AS (SELECT CAST(sum(t * t - 1) AS BIGINT) AS tsum FROM ranked)
      SELECT CAST(b AS BIGINT) AS b, CAST(5 AS BIGINT) AS k,
             round(12.0 / (b * 5.0 * (5.0 + 1.0)) * srj2
                   - 3.0 * b * (5.0 + 1.0), 6) AS chi2,
             round((12.0 / (b * 5.0 * (5.0 + 1.0)) * srj2
                    - 3.0 * b * (5.0 + 1.0))
                   / (1.0 - CAST(tsum AS DOUBLE)
                      / (b * (5.0 * 5.0 * 5.0 - 5.0))), 6) AS chi2_adj,
             CAST(4 AS BIGINT) AS df
      FROM b_, s_, ties
      WHERE 1.0 - CAST(tsum AS DOUBLE)
                  / (b * (5.0 * 5.0 * 5.0 - 5.0)) > 0""")),

    // Kendall's W concordance: do the five market segments agree on how
    // the 25 nations rank by revenue? The rating grid is completed by a
    // broadcastable 125-row cross join (absent cells rate 0), midrank
    // sums and squared deviations are exact quarter-integers, and the
    // tie term reuses the per-row (t²−1) trick per rater.
    Q("q320_kendall_w", (s, d) => {
      import s.implicits._
      val rev = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(T.nation(s, d), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_mktsegment", $"n_name")
        .agg(sum($"o_totalprice".cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("__rev"))
      val grid = T.customer(s, d).select($"c_mktsegment").distinct()
        .crossJoin(T.nation(s, d).select($"n_name"))
        .join(rev, Seq("c_mktsegment", "n_name"), "left")
        .withColumn("__x", coalesce($"__rev",
          lit(java.math.BigDecimal.ZERO).cast("decimal(18,2)")))
      val wR = Window.partitionBy($"c_mktsegment").orderBy($"__x")
      val wT = Window.partitionBy($"c_mktsegment", $"__x")
      val ranked = grid
        .withColumn("__mid", rank().over(wR).cast("double")
          + (count(lit(1)).over(wT) - 1).cast("double") / 2.0)
        .withColumn("__t", count(lit(1)).over(wT))
      val m = lit(5.0); val n = lit(25.0)
      val ri = ranked.groupBy($"n_name").agg(sum($"__mid").as("__ri"))
      val sAgg = ri.agg(sum(($"__ri" - m * (n + 1.0) / 2.0)
        * ($"__ri" - m * (n + 1.0) / 2.0)).as("__s"))
      val tAgg = ranked.agg(
        sum(($"__t" * $"__t" - 1).cast("long")).as("__tsum"))
      sAgg.crossJoin(tAgg)
        .select(lit(5L).as("m"), lit(25L).as("n"),
          round(lit(12.0) * $"__s"
            / (m * m * (n * n * n - n) - m * $"__tsum".cast("double")), 6)
            .as("w"),
          round(m * (n - 1.0) * (lit(12.0) * $"__s"
            / (m * m * (n * n * n - n)
               - m * $"__tsum".cast("double"))), 6).as("chi2"))
    }, Some("""
      WITH rev AS (SELECT c_mktsegment, n_name,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS rev
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2),
      grid AS (SELECT s.c_mktsegment, nn.n_name,
                 coalesce(rev, CAST(0 AS DECIMAL(18,2))) AS x
               FROM (SELECT DISTINCT c_mktsegment FROM customer) s
               CROSS JOIN (SELECT n_name FROM nation) nn
               LEFT JOIN rev ON s.c_mktsegment = rev.c_mktsegment
                 AND nn.n_name = rev.n_name),
      ranked AS (SELECT c_mktsegment, n_name,
              CAST(rank() OVER (PARTITION BY c_mktsegment ORDER BY x)
                AS DOUBLE)
                + (count(*) OVER (PARTITION BY c_mktsegment, x) - 1) / 2.0
                AS mid,
              count(*) OVER (PARTITION BY c_mktsegment, x) AS t
            FROM grid),
      ri AS (SELECT n_name, sum(mid) AS ri FROM ranked GROUP BY 1),
      s_ AS (SELECT sum((ri - 5.0 * (25.0 + 1.0) / 2.0)
                        * (ri - 5.0 * (25.0 + 1.0) / 2.0)) AS s
             FROM ri),
      ties AS (SELECT CAST(sum(t * t - 1) AS BIGINT) AS tsum FROM ranked)
      SELECT CAST(5 AS BIGINT) AS m, CAST(25 AS BIGINT) AS n,
             round(12.0 * s
                   / (5.0 * 5.0 * (25.0 * 25.0 * 25.0 - 25.0)
                      - 5.0 * CAST(tsum AS DOUBLE)), 6) AS w,
             round(5.0 * (25.0 - 1.0) * (12.0 * s
                   / (5.0 * 5.0 * (25.0 * 25.0 * 25.0 - 25.0)
                      - 5.0 * CAST(tsum AS DOUBLE))), 6) AS chi2
      FROM s_, ties""")),

    // shot-boundary detection on the stub codec: 64-byte frame energies
    // (Σ byte codes — exact longs), a boundary wherever the energy jumps
    // more than 2% frame-to-frame (|Δe|·50 > e_prev keeps the comparison
    // all-integer), shots as boundary-cumsum islands. Map-side explode +
    // one doc-keyed window pass, like q298's audio lane.
    Q("q321_shot_boundary", (s, d) => {
      import s.implicits._
      val chars = Multimodal.withPayload(T.documents(s, d), "text")
        .select($"doc_id",
          transform(split($"text", ""), c => ascii(c)).as("__cs"))
        .withColumn("__nf", expr("size(__cs) div 64"))
        .filter($"__nf" > 0)
      val frames = chars
        .withColumn("fi", explode(sequence(lit(0L), $"__nf" - 1)))
        .select($"doc_id", $"fi",
          aggregate(expr("slice(__cs, cast(fi * 64 + 1 as int), 64)"),
            lit(0L), (acc, x) => acc + x.cast("long")).as("e"))
      val w = Window.partitionBy($"doc_id").orderBy($"fi")
      val wCum = Window.partitionBy($"doc_id").orderBy($"fi")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val marked = frames
        .withColumn("__pe", lag($"e", 1).over(w))
        .withColumn("__cut", ($"__pe".isNotNull
          && abs($"e" - $"__pe") * 50 > $"__pe").cast("long"))
        .withColumn("__shot", sum($"__cut").over(wCum))
      val shots = marked.groupBy($"doc_id", $"__shot")
        .agg(count(lit(1)).as("__len"))
        .groupBy($"doc_id").agg(max($"__len").as("longest_shot"))
      marked.groupBy($"doc_id").agg(
          count(lit(1)).as("n_frames"),
          (sum($"__cut") + 1).as("n_shots"),
          coalesce(max(abs($"e" - $"__pe")), lit(0L)).as("max_delta"))
        .join(shots, "doc_id")
        .select($"doc_id", $"n_frames", $"n_shots", $"longest_shot",
          $"max_delta")
        .orderBy($"doc_id")
    }, Some("""
      WITH cs AS (SELECT doc_id,
                    list_transform(regexp_split_to_array(text, ''),
                      c -> ascii(c)) AS codes
                  FROM documents),
      nf AS (SELECT doc_id, codes, len(codes) // 64 AS n
             FROM cs WHERE len(codes) // 64 > 0),
      fr AS (SELECT doc_id, fi,
               CAST(list_sum(list_slice(codes, fi * 64 + 1, fi * 64 + 64))
                 AS BIGINT) AS e
             FROM (SELECT doc_id, codes, unnest(range(0, n)) AS fi
                   FROM nf)),
      mk AS (SELECT doc_id, fi, e,
               lag(e) OVER (PARTITION BY doc_id ORDER BY fi) AS pe
             FROM fr),
      cut AS (SELECT doc_id, fi, e, pe,
                CASE WHEN pe IS NOT NULL AND abs(e - pe) * 50 > pe
                     THEN 1 ELSE 0 END AS c
              FROM mk),
      sh AS (SELECT doc_id, fi, c, pe, e,
               sum(c) OVER (PARTITION BY doc_id ORDER BY fi
                 ROWS UNBOUNDED PRECEDING) AS shot
             FROM cut),
      runs AS (SELECT doc_id, shot, count(*) AS len
               FROM sh GROUP BY 1, 2),
      longest AS (SELECT doc_id, CAST(max(len) AS BIGINT) AS longest_shot
                  FROM runs GROUP BY 1),
      agg AS (SELECT doc_id, count(*) AS n_frames,
                CAST(sum(c) + 1 AS BIGINT) AS n_shots,
                CAST(coalesce(max(abs(e - pe)), 0) AS BIGINT) AS max_delta
              FROM sh GROUP BY 1)
      SELECT agg.doc_id AS doc_id, n_frames, n_shots, longest_shot,
             max_delta
      FROM agg JOIN longest ON agg.doc_id = longest.doc_id
      ORDER BY agg.doc_id""")),

    // write–audit–publish: the 2000 batch passes its audit (null keys,
    // nonpositive prices, duplicate keys) and lands in the snapshot; the
    // 2001 batch is staged with injected duplicates, fails the audit, and
    // never touches the published table — the final per-year report
    // proves both the publish and the rejection. Audit cost ∝ batch;
    // publish cost ∝ touched buckets.
    Q("q322_wap_publish", (s, d) => {
      import s.implicits._
      val path = s"/tmp/graft_wap_${System.nanoTime()}"
      val orders = T.orders(s, d)
      val yr = year($"o_orderdate")
      try {
        Merge.writeBucketedSnapshot(orders.filter(yr <= 1999), path,
          Seq("o_orderkey"), buckets = 8)
        val good = orders.filter(yr === 2000)
          .withColumn("__op", lit("U")).withColumn("__seq", lit(1L))
        val bad = orders.filter(yr === 2001)
        val badDup = bad.unionAll(bad)
          .withColumn("__op", lit("U")).withColumn("__seq", lit(2L))
        val checks = Seq(
          "key_not_null" -> $"o_orderkey".isNotNull,
          "positive_price" -> ($"o_totalprice" > 0))
        Merge.writeAuditPublish(path, good, Seq("o_orderkey"),
          "__op", "__seq", buckets = 8, checks).count()
        Merge.writeAuditPublish(path, badDup, Seq("o_orderkey"),
          "__op", "__seq", buckets = 8, checks).count()
        Merge.readBucketedSnapshot(s, path)
          .groupBy(year($"o_orderdate").cast("long").as("o_year"))
          .agg(count(lit(1)).as("n_orders"),
            sum($"o_totalprice".cast("decimal(18,2)"))
              .cast("decimal(18,2)").cast("double").as("total"))
          .orderBy($"o_year")
          .localCheckpoint(true)
      } finally {
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        fs.delete(new org.apache.hadoop.fs.Path(path + ".staging"), true)
      }
    }, Some("""
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             count(*) AS n_orders,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS DOUBLE) AS total
      FROM orders WHERE year(o_orderdate) <= 2000
      GROUP BY 1 ORDER BY 1""")),

    // first-occurrence shingle novelty: per document (in doc_id order
    // within its source), the share of its 8-gram shingles never seen in
    // an earlier document of the same source — the marginal-content curve
    // curators read before adding a source. One (source, shingle) reduce
    // attributes first occurrences; nothing is quadratic.
    Q("q323_shingle_novelty", (s, d) => {
      import s.implicits._
      val sh = T.documents(s, d)
        .select($"source", $"doc_id",
          split(trim($"text"), "\\s+").as("__ws"))
        .select($"source", $"doc_id",
          // guard short docs: Spark's sequence(1, 0) DESCENDS ([1, 0] —
          // step defaults to -1) and slice(ws, 0, 8) is a runtime error,
          // while DuckDB's generate_series(1, 0) is empty — a <8-token
          // doc must yield zero shingles on BOTH engines
          explode(array_distinct(transform(
            when(size($"__ws") >= 8,
              sequence(lit(1), size($"__ws") - 7))
              .otherwise(array().cast("array<int>")),
            i => array_join(slice($"__ws", i, lit(8)), " ")))).as("__sh"))
      val first = sh.groupBy($"source", $"__sh")
        .agg(min($"doc_id").as("__first"))
      sh.join(first, Seq("source", "__sh"))
        .groupBy($"source", $"doc_id").agg(
          count(lit(1)).as("n_shingles"),
          sum(($"doc_id" === $"__first").cast("long")).as("n_novel"))
        .select($"source", $"doc_id", $"n_shingles", $"n_novel",
          round($"n_novel".cast("double") / $"n_shingles".cast("double"),
            6).as("novelty"))
        .orderBy($"doc_id")
    }, Some("""
      WITH w AS (SELECT source, doc_id,
                   regexp_split_to_array(trim(text), '\s+') AS ws
                 FROM documents),
      sh AS (SELECT source, doc_id,
               unnest(list_distinct(list_transform(
                 generate_series(1, greatest(len(ws) - 7, 0)),
                 i -> array_to_string(list_slice(ws, i, i + 7), ' '))))
                 AS shingle
             FROM w),
      first_ AS (SELECT source, shingle, min(doc_id) AS fst
                 FROM sh GROUP BY 1, 2)
      SELECT sh.source, doc_id, count(*) AS n_shingles,
             CAST(sum(CASE WHEN doc_id = fst THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel,
             round(CAST(sum(CASE WHEN doc_id = fst THEN 1 ELSE 0 END)
                     AS DOUBLE) / count(*), 6) AS novelty
      FROM sh JOIN first_ ON sh.source = first_.source
        AND sh.shingle = first_.shingle
      GROUP BY 1, 2 ORDER BY doc_id"""))
  )
}
