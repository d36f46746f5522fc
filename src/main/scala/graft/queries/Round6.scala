package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Baskets, Graph, Mixing, Profile, Quantiles, Similarity, TimeSeries}
import graft.sources.{Tables => T}

/** Round-5 second-wave additions: graph structure metrics (triangles /
  * clustering coefficient), market-basket pair mining, the bin-expansion
  * interval-overlap rewrite, per-group anomaly scoring, hybrid-retrieval
  * rank fusion, and time-series gap filling.
  */
object Round6 {

  val all: Seq[Q] = Seq(

    // triangle count + global clustering coefficient of the co-supplier
    // graph (suppliers appearing in >= 5 common orders). The edge list
    // comes from the same frequent-pair miner as q145 (downward closure
    // makes the item prefilter invisible in the result, so the oracle
    // can state the edge set as a plain pair-support HAVING); the
    // triangle join runs degree-oriented — out-degree capped at O(sqrt m)
    Q("q144_triangle_stats", (s, d) => {
      import s.implicits._
      val edges = Baskets.frequentPairs(
        T.lineitem(s, d).select($"l_orderkey", $"l_suppkey"),
        "l_orderkey", "l_suppkey", minItemSupport = 5, minPairSupport = 5)
      Graph.triangleStats(edges, "item_a", "item_b")
    }, Some("""
      WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
      e AS (SELECT x.l_suppkey AS a, y.l_suppkey AS b
            FROM os x JOIN os y
              ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
            GROUP BY 1, 2 HAVING count(*) >= 5),
      deg AS (SELECT node, count(*) AS deg
              FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
              GROUP BY node),
      tri AS (SELECT count(*) AS t
              FROM e e1 JOIN e e2 ON e1.b = e2.a
              JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      agg AS (SELECT count(*) AS n_nodes,
                     sum(deg * (deg - 1)) // 2 AS n_wedges FROM deg),
      ec AS (SELECT count(*) AS n_edges FROM e)
      SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
             CAST(n_edges AS BIGINT) AS n_edges,
             CAST(n_wedges AS BIGINT) AS n_wedges,
             CAST(t AS BIGINT) AS n_triangles,
             round(3.0 * t / CAST(n_wedges AS BIGINT), 6) AS gcc
      FROM agg, ec, tri""")),

    // market-basket mining: part pairs co-ordered in >= 2 orders, with
    // the A-Priori frequent-item prune ahead of the per-basket pair
    // explosion (invisible in the result by downward closure — the
    // oracle needs only the pair HAVING)
    Q("q145_basket_pairs", (s, d) => {
      import s.implicits._
      Baskets.frequentPairs(T.lineitem(s, d), "l_orderkey", "l_partkey",
          minItemSupport = 2, minPairSupport = 2)
        .select($"item_a".as("part_a"), $"item_b".as("part_b"), $"support")
        .orderBy($"support".desc, $"part_a", $"part_b")
    }, Some("""
      WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
             count(*) AS support
      FROM op x JOIN op y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
      ORDER BY support DESC, part_a, part_b""")),

    // interval-overlap aggregation by bin expansion: each lineitem's
    // [ship, ship + qty%30+1 days] service interval explodes into the
    // months it overlaps MAP-SIDE (no calendar join, no inequality
    // nested loop) and the per-month load is a plain hash aggregate
    Q("q146_interval_months", (s, d) => {
      import s.implicits._
      val iv = T.lineitem(s, d).select($"l_orderkey",
        to_date($"l_shipdate").as("s"),
        date_add(to_date($"l_shipdate"),
          ($"l_quantity".cast("int") % 30) + 1).as("e"))
      TimeSeries.explodeMonthBins(iv, "s", "e")
        .groupBy($"bin")
        .agg(count(lit(1)).as("n_items"),
          countDistinct($"l_orderkey").as("n_orders"))
        .withColumnRenamed("bin", "month")
        .orderBy($"month")
    }, Some("""
      WITH iv AS (SELECT l_orderkey, CAST(l_shipdate AS DATE) AS s,
                         CAST(l_shipdate AS DATE)
                           + (CAST(l_quantity AS INT) % 30 + 1) * INTERVAL 1 DAY AS e
                  FROM lineitem),
      x AS (SELECT l_orderkey,
                   CAST(unnest(generate_series(date_trunc('month', s),
                     date_trunc('month', e), INTERVAL 1 MONTH)) AS DATE) AS month
            FROM iv)
      SELECT month, count(*) AS n_items,
             count(DISTINCT l_orderkey) AS n_orders
      FROM x GROUP BY month ORDER BY month""")),

    // per-customer anomaly detection: orders whose total is > 2 sample
    // standard deviations from the customer's mean. The oracle replays
    // the operator's centered two-pass arithmetic op for op (mean =
    // sum/count, then sum((x-mean)^2)), so the z values agree to the
    // 6-place round; threshold margins are >= 1e-4 at both SFs, so the
    // |z| > 2 cut can never flap on a last-ulp sum difference
    Q("q147_zscore_outliers", (s, d) => {
      import s.implicits._
      Quantiles.zscoreOutliers(T.orders(s, d), Seq("o_custkey"),
          "o_totalprice", threshold = 2.0)
        .select($"o_orderkey", $"o_custkey", round($"z", 6).as("z"))
        .orderBy($"o_orderkey")
    }, Some("""
      WITH m AS (SELECT o_custkey, count(*) AS n,
                        sum(o_totalprice) / count(*) AS mean
                 FROM orders GROUP BY 1 HAVING count(*) >= 2),
      v AS (SELECT o.o_custkey,
                   sum((o_totalprice - mean) * (o_totalprice - mean)) AS ss,
                   max(n) AS n, max(mean) AS mean
            FROM orders o JOIN m USING (o_custkey) GROUP BY 1),
      z AS (SELECT o_orderkey, o.o_custkey,
                   (o_totalprice - mean) / sqrt(ss / (n - 1)) AS z
            FROM orders o JOIN v USING (o_custkey) WHERE ss > 0)
      SELECT o_orderkey, o_custkey, round(z, 6) AS z
      FROM z WHERE abs(z) > 2 ORDER BY o_orderkey""")),

    // hybrid retrieval: top-100 keyword candidates (occurrences of
    // "data") and top-100 embedding candidates (cosine vs doc 0's
    // vector, ranked on the 6-place-rounded similarity so rank order is
    // engine-stable — q32's trick) fused by reciprocal rank, top 20.
    // Both candidate windows run over <= 100 rows after a bounded
    // TakeOrdered (q111's vocab-rank pattern)
    Q("q148_rrf_hybrid", (s, d) => {
      import s.implicits._
      val kwTop = T.documents(s, d)
        .select($"doc_id",
          size(filter(split(lower($"text"), " "), t => t === lit("data")))
            .as("score"))
        .orderBy($"score".desc, $"doc_id").limit(100)
        .withColumn("r",
          row_number().over(Window.orderBy($"score".desc, $"doc_id")))
        .select($"doc_id", $"r")
      val emb = T.embeddings(s, d)
      val cosTop = Similarity
        .bruteForceTopK(emb, emb.filter($"vec_id" === 0), 100)
        .select($"vec_id".as("doc_id"), $"rnk".as("r"))
      Similarity.rrfFuse(Seq(kwTop, cosTop), "doc_id", "r")
        .select($"doc_id", round($"rrf", 6).as("rrf"), $"n_lists")
        .orderBy($"rrf".desc, $"doc_id")
        .limit(20)
    }, Some("""
      WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
      kw AS (SELECT doc_id,
                    len(list_filter(string_split(lower(text), ' '),
                      t -> t = 'data')) AS score
             FROM documents),
      kr AS (SELECT doc_id,
                    row_number() OVER (ORDER BY score DESC, doc_id) AS r
             FROM kw QUALIFY r <= 100),
      cs AS (SELECT vec_id AS doc_id,
                    round(list_cosine_similarity(e.embedding::DOUBLE[],
                      q.embedding::DOUBLE[]), 6) AS sim
             FROM embeddings e, q WHERE vec_id <> 0),
      cr AS (SELECT doc_id,
                    row_number() OVER (ORDER BY sim DESC, doc_id) AS r
             FROM cs QUALIFY r <= 100),
      u AS (SELECT doc_id, CAST(1.0 AS DOUBLE) / (60 + r) AS c FROM kr
            UNION ALL
            SELECT doc_id, CAST(1.0 AS DOUBLE) / (60 + r) FROM cr)
      SELECT doc_id, round(sum(c), 6) AS rrf, count(*) AS n_lists
      FROM u GROUP BY doc_id ORDER BY rrf DESC, doc_id LIMIT 20""")),

    // time-series regularization: one row per user per day over each
    // user's observed span, gaps filled by the last observation carried
    // forward. Values pass through untouched (no arithmetic), so no
    // rounding is needed for parity
    Q("q149_gap_fill", (s, d) => {
      import s.implicits._
      TimeSeries.gapFillDaily(T.events(s, d), "user_id", "ts",
          "event_id", "value")
        .orderBy($"user_id", $"day")
    }, Some("""
      WITH ranked AS (SELECT user_id, ts, event_id, value,
                             row_number() OVER (
                               PARTITION BY user_id, CAST(date_trunc('day', ts) AS DATE)
                               ORDER BY ts DESC, event_id DESC) AS rn
                      FROM events),
      daily AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                       value
                FROM ranked WHERE rn = 1),
      span AS (SELECT user_id, min(day) AS lo, max(day) AS hi
               FROM daily GROUP BY 1),
      cal AS (SELECT user_id,
                     CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
              FROM span),
      j AS (SELECT c.user_id, c.day, d.value
            FROM cal c LEFT JOIN daily d
              ON c.user_id = d.user_id AND c.day = d.day)
      SELECT user_id, day,
             last_value(value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
      FROM j ORDER BY user_id, day""")),

    // contrastive negative sampling: 4 replayable pseudo-random
    // negatives per anchor vector (dense vec_id space), payload fetched
    // by one keyed join; the oracle replays the multiplicative-hash
    // draw exactly, so the sampled training pairs are engine-portable
    Q("q150_negative_sample", (s, d) => {
      import s.implicits._
      val emb = T.embeddings(s, d)
      Mixing.negativeSample(emb, "vec_id", k = 4, salt = 7L)
        .join(emb.select($"vec_id".as("neg_id"), $"label".as("neg_label")),
          "neg_id")
        .select($"anchor", $"j", $"neg_id", $"neg_label")
        .orderBy($"anchor", $"j")
    }, Some("""
      WITH nn AS (SELECT count(*) AS n FROM embeddings),
      js AS (SELECT CAST(unnest(generate_series(0, 3)) AS INT) AS j),
      cand AS (SELECT e.vec_id AS anchor, js.j,
                      ((e.vec_id % 2147483648) * 2246822519
                        + (js.j + 1) * 40503 + 7) % nn.n AS neg_id
               FROM embeddings e CROSS JOIN js CROSS JOIN nn)
      SELECT c.anchor, c.j, c.neg_id, b.label AS neg_label
      FROM cand c JOIN embeddings b ON c.neg_id = b.vec_id
      WHERE c.neg_id <> c.anchor
      ORDER BY anchor, j""")),

    // dataset drift report: the numeric-column profiles of the
    // pre-1998 and 1998+ shipment slices joined per column with the
    // monitoring signals (null-fraction delta, distinct-cardinality
    // ratio, range shift) — the snapshot-acceptance check between
    // dataset versions, two single-scan profiles at any scale
    Q("q151_profile_drift", (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d)
      Profile.profileDrift(
          li.filter(year($"l_shipdate") <= 1997),
          li.filter(year($"l_shipdate") >= 1998),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy($"column")
    }, Some("""
      WITH pa AS (
        SELECT 'l_quantity' AS "column", count(*) AS n_rows_a,
               count(*) FILTER (l_quantity IS NULL) AS n_nulls_a,
               count(DISTINCT l_quantity) AS n_distinct_a,
               round(min(l_quantity), 6) AS min_v_a,
               round(max(l_quantity), 6) AS max_v_a
        FROM lineitem WHERE year(l_shipdate) <= 1997
        UNION ALL
        SELECT 'l_extendedprice', count(*),
               count(*) FILTER (l_extendedprice IS NULL),
               count(DISTINCT l_extendedprice),
               round(min(l_extendedprice), 6), round(max(l_extendedprice), 6)
        FROM lineitem WHERE year(l_shipdate) <= 1997
        UNION ALL
        SELECT 'l_discount', count(*),
               count(*) FILTER (l_discount IS NULL),
               count(DISTINCT l_discount),
               round(min(l_discount), 6), round(max(l_discount), 6)
        FROM lineitem WHERE year(l_shipdate) <= 1997
        UNION ALL
        SELECT 'l_tax', count(*),
               count(*) FILTER (l_tax IS NULL),
               count(DISTINCT l_tax),
               round(min(l_tax), 6), round(max(l_tax), 6)
        FROM lineitem WHERE year(l_shipdate) <= 1997),
      pb AS (
        SELECT 'l_quantity' AS "column", count(*) AS n_rows_b,
               count(*) FILTER (l_quantity IS NULL) AS n_nulls_b,
               count(DISTINCT l_quantity) AS n_distinct_b,
               round(min(l_quantity), 6) AS min_v_b,
               round(max(l_quantity), 6) AS max_v_b
        FROM lineitem WHERE year(l_shipdate) >= 1998
        UNION ALL
        SELECT 'l_extendedprice', count(*),
               count(*) FILTER (l_extendedprice IS NULL),
               count(DISTINCT l_extendedprice),
               round(min(l_extendedprice), 6), round(max(l_extendedprice), 6)
        FROM lineitem WHERE year(l_shipdate) >= 1998
        UNION ALL
        SELECT 'l_discount', count(*),
               count(*) FILTER (l_discount IS NULL),
               count(DISTINCT l_discount),
               round(min(l_discount), 6), round(max(l_discount), 6)
        FROM lineitem WHERE year(l_shipdate) >= 1998
        UNION ALL
        SELECT 'l_tax', count(*),
               count(*) FILTER (l_tax IS NULL),
               count(DISTINCT l_tax),
               round(min(l_tax), 6), round(max(l_tax), 6)
        FROM lineitem WHERE year(l_shipdate) >= 1998)
      SELECT pa."column", n_rows_a, n_nulls_a, n_distinct_a, min_v_a, max_v_a,
             n_rows_b, n_nulls_b, n_distinct_b, min_v_b, max_v_b,
             round(n_nulls_b / n_rows_b - n_nulls_a / n_rows_a, 6) AS null_frac_delta,
             CASE WHEN n_distinct_a > 0
                  THEN round(n_distinct_b / CAST(n_distinct_a AS DOUBLE), 6)
             END AS distinct_ratio,
             round((max_v_b - min_v_b) - (max_v_a - min_v_a), 6) AS range_delta
      FROM pa JOIN pb ON pa."column" = pb."column"
      ORDER BY pa."column" """)),

    // exact equi-depth histogram of extended price: 8 equal-count bins
    // with interpolated quantile boundaries — one sort-rank pass for
    // all 9 boundaries, then a branch-free map-side comparison sum
    // assigns bins; the oracle replays the identical arithmetic
    Q("q152_equidepth_hist", (s, d) => {
      import s.implicits._
      Quantiles.equiDepthHistogram(T.lineitem(s, d), "l_extendedprice", 8)
        .orderBy($"bucket")
    }, Some("""
      WITH b AS (SELECT quantile_cont(l_extendedprice, 0.000) AS q0,
                        quantile_cont(l_extendedprice, 0.125) AS q1,
                        quantile_cont(l_extendedprice, 0.250) AS q2,
                        quantile_cont(l_extendedprice, 0.375) AS q3,
                        quantile_cont(l_extendedprice, 0.500) AS q4,
                        quantile_cont(l_extendedprice, 0.625) AS q5,
                        quantile_cont(l_extendedprice, 0.750) AS q6,
                        quantile_cont(l_extendedprice, 0.875) AS q7,
                        quantile_cont(l_extendedprice, 1.000) AS q8
                 FROM lineitem),
      x AS (SELECT 1 + (l_extendedprice > q1)::INT + (l_extendedprice > q2)::INT
                     + (l_extendedprice > q3)::INT + (l_extendedprice > q4)::INT
                     + (l_extendedprice > q5)::INT + (l_extendedprice > q6)::INT
                     + (l_extendedprice > q7)::INT AS bucket
            FROM lineitem CROSS JOIN b
            WHERE l_extendedprice IS NOT NULL)
      SELECT bucket,
             round(list_value(q0, q1, q2, q3, q4, q5, q6, q7, q8)[bucket], 6) AS lo,
             round(list_value(q0, q1, q2, q3, q4, q5, q6, q7, q8)[bucket + 1], 6) AS hi,
             count(*) AS n
      FROM x CROSS JOIN b
      GROUP BY 1, 2, 3 ORDER BY bucket""")),

    // first-order Markov transition matrix over per-user event
    // sequences — counts of adjacent event-type pairs and the
    // row-normalized next-event probabilities
    Q("q153_transitions", (s, d) => {
      import s.implicits._
      TimeSeries.transitionMatrix(T.events(s, d), "user_id", "ts",
          "event_type")
        .orderBy($"from_type", $"to_type")
    }, Some("""
      WITH tr AS (SELECT event_type AS from_type,
                         lead(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts) AS to_type
                  FROM events),
      c AS (SELECT from_type, to_type, count(*) AS n
            FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n,
             round(n / (sum(n) OVER (PARTITION BY from_type)), 6) AS p
      FROM c ORDER BY from_type, to_type""")),

    // session path mining: the 15 most common in-session event-type
    // journeys under q23's 30-minute session rule; in-session order is
    // pinned by sorted (ts, type) structs, never bare collect_list
    Q("q154_top_paths", (s, d) => {
      import s.implicits._
      TimeSeries.sessionPaths(T.events(s, d), "user_id", "ts",
          "event_type")
        .groupBy($"path").agg(count(lit(1)).as("n_sessions"))
        .orderBy($"n_sessions".desc, $"path")
        .limit(15)
    }, Some("""
      WITH flags AS (
        SELECT user_id, ts, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sess AS (
        SELECT user_id, ts, event_type,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flags),
      paths AS (SELECT user_id, sid,
                       string_agg(event_type, '>' ORDER BY ts) AS path
                FROM sess GROUP BY user_id, sid)
      SELECT path, count(*) AS n_sessions
      FROM paths GROUP BY path
      ORDER BY n_sessions DESC, path LIMIT 15"""))
  )
}
