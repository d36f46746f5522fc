package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Baskets, Merge, Profile, TextAnalysis, TimeSeries}
import graft.sources.{Tables => T}

/** Round-5 third wave: warehouse history modeling (SCD2), offline
  * changepoint detection, supervised-learning lag features, A/B
  * statistics, source-level corpus filtering, token-association mining
  * (PMI), and inverted-index construction.
  */
object Round7 {

  val all: Seq[Q] = Seq(

    // SCD Type 2 dimension build: per-customer order-status history
    // compressed into validity intervals (run starts flagged by a
    // null-safe lag compare, runs numbered by a running sum, intervals
    // closed by lead). One keyed shuffle; see Merge.scd2
    Q("q155_scd2", (s, d) => {
      import s.implicits._
      Merge.scd2(
          T.orders(s, d).select($"o_custkey", $"o_orderstatus",
            $"o_orderdate", $"o_orderkey"),
          keyCols = Seq("o_custkey"), attrCols = Seq("o_orderstatus"),
          tsCol = "o_orderdate", tieCols = Seq("o_orderkey"))
        .select($"o_custkey", $"o_orderstatus",
          to_date($"valid_from").as("valid_from"),
          to_date($"valid_to").as("valid_to"), $"is_current")
        .orderBy($"o_custkey", $"valid_from", $"o_orderstatus")
    }, Some("""
      WITH lagged AS (
        SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
               CASE WHEN o_orderstatus IS NOT DISTINCT FROM
                         lag(o_orderstatus) OVER w
                    THEN 0 ELSE 1 END AS chg
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)),
      runs AS (
        SELECT *, sum(chg) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey
                                 ROWS UNBOUNDED PRECEDING) AS run
        FROM lagged),
      seg AS (
        SELECT o_custkey, o_orderstatus, run, min(o_orderdate) AS vf
        FROM runs GROUP BY 1, 2, 3)
      SELECT o_custkey, o_orderstatus,
             CAST(vf AS DATE) AS valid_from,
             CAST(lead(vf) OVER wk AS DATE) AS valid_to,
             lead(vf) OVER wk IS NULL AS is_current
      FROM seg
      WINDOW wk AS (PARTITION BY o_custkey ORDER BY run)
      ORDER BY o_custkey, run""")),

    // offline CUSUM changepoint per event type over the daily value
    // series: where the running sum of deviations from the series mean
    // peaks. Daily reduce first, then one window pass over 30-row keys
    Q("q156_cusum", (s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(sum($"value".cast("decimal(18,2)")).cast("double").as("daily"))
      TimeSeries.cusumChangepoint(daily, "event_type", "day", "daily")
    }, Some("""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS daily
        FROM events GROUP BY 1, 2),
      m AS (
        SELECT event_type, avg(daily) AS mu, count(*) AS n_points
        FROM daily GROUP BY 1),
      dev AS (
        SELECT daily.event_type, day, n_points,
               sum(daily - mu)
                 OVER (PARTITION BY daily.event_type ORDER BY day
                       ROWS UNBOUNDED PRECEDING) AS cusum
        FROM daily JOIN m ON daily.event_type = m.event_type),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY abs(cusum) DESC, day) AS rk
        FROM dev)
      SELECT event_type, n_points, day AS changepoint,
             round(cusum, 6) AS peak_cusum
      FROM ranked WHERE rk = 1""")),

    // lag-feature matrix for next-order-value prediction: previous two
    // order totals and the rolling mean of the preceding three, per
    // customer — one WindowExec pass serves all three features
    Q("q157_lag_features", (s, d) => {
      import s.implicits._
      TimeSeries.lagFeatures(
          T.orders(s, d).select($"o_orderkey", $"o_custkey",
            $"o_orderdate", $"o_totalprice"),
          keyCol = "o_custkey", orderCols = Seq("o_orderdate", "o_orderkey"),
          valueCol = "o_totalprice", lags = 2, rollN = 3)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice",
          $"lag_1", $"lag_2", $"roll_mean")
        .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
    }, Some("""
      SELECT o_orderkey, o_custkey, o_totalprice,
             lag(o_totalprice, 1) OVER w AS lag_1,
             lag(o_totalprice, 2) OVER w AS lag_2,
             round(avg(o_totalprice) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 6) AS roll_mean
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderdate, o_orderkey""")),

    // Welch two-sample t per market segment: customers split into two
    // arms by key parity, order value as the metric — the
    // unequal-variance A/B read-out, one hash aggregate + a
    // |strata|-sized fold (see Profile.welchTTest)
    Q("q158_ab_welch", (s, d) => {
      import s.implicits._
      val df = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment", ($"o_custkey" % 2).as("variant"),
          $"o_totalprice")
      Profile.welchTTest(df, "c_mktsegment", "variant", "o_totalprice")
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH stats AS (
        SELECT c_mktsegment, o_custkey % 2 AS variant,
               count(*) AS n, avg(o_totalprice) AS m,
               var_samp(o_totalprice) AS s2
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2),
      folded AS (
        SELECT c_mktsegment,
               max(CASE WHEN variant = 0 THEN n END) AS n_1,
               max(CASE WHEN variant = 1 THEN n END) AS n_2,
               max(CASE WHEN variant = 0 THEN m END) AS m1,
               max(CASE WHEN variant = 1 THEN m END) AS m2,
               max(CASE WHEN variant = 0 THEN s2 END) AS s21,
               max(CASE WHEN variant = 1 THEN s2 END) AS s22,
               count(*) AS variants
        FROM stats GROUP BY 1)
      SELECT c_mktsegment, n_1, n_2,
             round(m1 - m2, 6) AS mean_diff,
             round((m1 - m2) / sqrt(s21 / n_1 + s22 / n_2), 6) AS t_stat,
             round(pow(s21 / n_1 + s22 / n_2, 2)
               / (pow(s21 / n_1, 2) / (n_1 - 1)
                  + pow(s22 / n_2, 2) / (n_2 - 1)), 6) AS welch_df
      FROM folded
      WHERE variants = 2 AND n_1 >= 2 AND n_2 >= 2 AND s21 + s22 > 0
      ORDER BY c_mktsegment""")),

    // source-level corpus filtering (the domain-blocklist pass of a
    // web-scale pipeline, with the blocklist derived from source
    // quality): drop every document from sources whose mean length
    // falls below the bar. The per-source table is |sources|-sized, so
    // AQE broadcasts the semi-join — the corpus scans once
    Q("q159_source_filter", (s, d) => {
      import s.implicits._
      val docs = T.documents(s, d)
      val good = docs.groupBy($"source")
        .agg(avg($"n_chars").as("avg_chars"))
        .filter($"avg_chars" >= 295.0)
        .select($"source")
      docs.join(good, Seq("source"), "left_semi")
        .select($"doc_id", $"source")
        .orderBy($"doc_id")
    }, Some("""
      WITH good AS (
        SELECT source FROM documents
        GROUP BY source HAVING avg(n_chars) >= 295.0)
      SELECT doc_id, source
      FROM documents WHERE source IN (SELECT source FROM good)
      ORDER BY doc_id""")),

    // token-pair PMI over document co-occurrence: association mining
    // on the corpus vocabulary. Pair supports come from the A-Priori
    // miner (distinct tokens per doc = baskets); the PMI join adds two
    // |vocab|-sized unigram lookups — AQE broadcasts both
    Q("q160_token_pmi", (s, d) => {
      import s.implicits._
      val tok = T.documents(s, d)
        .select($"doc_id", explode(TextAnalysis.tokens($"text")).as("tok"))
      val pairs = Baskets.frequentPairs(tok, "doc_id", "tok",
        minItemSupport = 25, minPairSupport = 25)
      val df = tok.select($"doc_id", $"tok").distinct()
        .groupBy($"tok").agg(count(lit(1)).as("df"))
      val nDocs = T.documents(s, d).agg(countDistinct($"doc_id").as("n_docs"))
      pairs
        .join(df.select($"tok".as("item_a"), $"df".as("df_a")), "item_a")
        .join(df.select($"tok".as("item_b"), $"df".as("df_b")), "item_b")
        .crossJoin(broadcast(nDocs))
        .select($"item_a".as("token_a"), $"item_b".as("token_b"),
          $"support", $"df_a", $"df_b",
          round(log($"support" * $"n_docs" / ($"df_a" * $"df_b")), 6)
            .as("pmi"))
        .orderBy($"token_a", $"token_b")
    }, Some("""
      WITH tok AS (
        SELECT DISTINCT doc_id, unnest(
          regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents),
      df AS (SELECT tok, count(*) AS df FROM tok GROUP BY 1),
      pairs AS (
        SELECT x.tok AS token_a, y.tok AS token_b, count(*) AS support
        FROM tok x JOIN tok y
          ON x.doc_id = y.doc_id AND x.tok < y.tok
        GROUP BY 1, 2 HAVING count(*) >= 25),
      n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
      SELECT token_a, token_b, support, a.df AS df_a, b.df AS df_b,
             round(ln(support * n_docs / (1.0 * a.df * b.df)), 6) AS pmi
      FROM pairs JOIN df a ON a.tok = token_a
                 JOIN df b ON b.tok = token_b, n
      ORDER BY token_a, token_b""")),

    // inverted-index build: per term, document frequency and the
    // sorted posting list (serialized — the driver's oracle compare
    // cannot sort array cells). One distinct + one aggregate; posting
    // lists are per-term and never cross the driver
    Q("q161_postings", (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .select($"doc_id", explode(TextAnalysis.tokens($"text")).as("term"))
        .distinct()
        .groupBy($"term")
        .agg(count(lit(1)).as("df"),
          array_join(transform(sort_array(collect_list($"doc_id")),
            _.cast("string")), ",").as("postings"))
        .orderBy($"df".desc, $"term")
    }, Some("""
      WITH tok AS (
        SELECT DISTINCT doc_id, unnest(
          regexp_split_to_array(trim(text), '\s+')) AS term
        FROM documents)
      SELECT term, count(*) AS df,
             string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
               AS postings
      FROM tok GROUP BY term
      ORDER BY df DESC, term"""))
  )
}
