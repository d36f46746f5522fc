package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{AsOf, Graph, Metrics, Mixing, Profile, TextAnalysis, TimeSeries}
import graft.sources.{Tables => T}

/** Round-6 wave: graph authority scoring (HITS), marketing attribution,
  * interval-overlap pairs, shuffle-key skew diagnostics, and the
  * decile lift table — each with an exact DuckDB oracle.
  */
object Round9 {

  val all: Seq[Q] = Seq(

    // HITS hubs/authorities over the directed customer→supplier trade
    // graph (bipartite: customers act as hubs, suppliers as
    // authorities). 2 mutual-reinforcement iterations, L1-normalized
    // half-steps; the oracle replays every double op unrolled
    Q("q172_hits", (s, d) => {
      import s.implicits._
      val edges = T.orders(s, d)
        .join(T.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .select(($"o_custkey" * 2).as("src"),
          ($"l_suppkey" * 2 + 1).as("dst"))
      Graph.hits(edges, "src", "dst", iterations = 2)
        .select(
          when($"node" % 2 === 0,
            concat(lit("c"), ($"node" / 2).cast("long")))
            .otherwise(concat(lit("s"), (($"node" - 1) / 2).cast("long")))
            .as("node"),
          round($"hub", 9).as("hub"), round($"auth", 9).as("auth"))
        .orderBy($"node")
    }, Some("""
      WITH e AS (SELECT DISTINCT o_custkey * 2 AS src,
                        l_suppkey * 2 + 1 AS dst
                 FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      a1r AS (SELECT dst AS node, sum(1.0) AS v FROM e GROUP BY 1),
      a1s AS (SELECT sum(v) AS s FROM a1r),
      a1 AS (SELECT n.node, coalesce(a1r.v, 0) / s AS a
             FROM nodes n LEFT JOIN a1r USING (node), a1s),
      h1r AS (SELECT e.src AS node, sum(a1.a) AS v
              FROM e JOIN a1 ON a1.node = e.dst GROUP BY 1),
      h1s AS (SELECT sum(v) AS s FROM h1r),
      h1 AS (SELECT n.node, coalesce(h1r.v, 0) / s AS h
             FROM nodes n LEFT JOIN h1r USING (node), h1s),
      a2r AS (SELECT e.dst AS node, sum(h1.h) AS v
              FROM e JOIN h1 ON h1.node = e.src GROUP BY 1),
      a2s AS (SELECT sum(v) AS s FROM a2r),
      a2 AS (SELECT n.node, coalesce(a2r.v, 0) / s AS a
             FROM nodes n LEFT JOIN a2r USING (node), a2s),
      h2r AS (SELECT e.src AS node, sum(a2.a) AS v
              FROM e JOIN a2 ON a2.node = e.dst GROUP BY 1),
      h2s AS (SELECT sum(v) AS s FROM h2r),
      h2 AS (SELECT n.node, coalesce(h2r.v, 0) / s AS h
             FROM nodes n LEFT JOIN h2r USING (node), h2s)
      SELECT CASE WHEN h2.node % 2 = 0
               THEN concat('c', CAST(h2.node / 2 AS BIGINT))
               ELSE concat('s', CAST((h2.node - 1) / 2 AS BIGINT)) END AS node,
             round(h2.h, 9) AS hub, round(a2.a, 9) AS auth
      FROM h2 JOIN a2 ON a2.node = h2.node
      ORDER BY node""")),

    // last-touch marketing attribution: each purchase credits the
    // user's most recent click/view at-or-before it, but only within a
    // 7-day lookback — the as-of join (one keyed union + running-last
    // window) with a post-hoc window gate, never an inequality join
    Q("q173_attribution", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val touches = ev.filter($"event_type".isin("click", "view"))
        .select($"user_id", $"ts", $"event_id", $"event_type")
      val joined = AsOf.asofJoin(purchases, touches, "user_id", "ts", "ts",
        Seq("event_id", "event_type", "ts"))
      val inWindow = $"asof_ts" >= $"ts" - expr("INTERVAL 7 DAYS")
      joined.select($"event_id", $"user_id", $"ts",
          when(inWindow, $"asof_event_id").as("touch_id"),
          when(inWindow, $"asof_event_type").as("touch_type"),
          when(inWindow, $"asof_ts").as("touch_ts"))
        .orderBy($"event_id")
    }, Some("""
      SELECT p.event_id, p.user_id, p.ts,
             CASE WHEN t.ts >= p.ts - INTERVAL 7 DAY THEN t.event_id END
               AS touch_id,
             CASE WHEN t.ts >= p.ts - INTERVAL 7 DAY THEN t.event_type END
               AS touch_type,
             CASE WHEN t.ts >= p.ts - INTERVAL 7 DAY THEN t.ts END
               AS touch_ts
      FROM (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT user_id, ts, event_id, event_type FROM events
                      WHERE event_type IN ('click', 'view')) t
        ON p.user_id = t.user_id AND t.ts <= p.ts
      ORDER BY p.event_id""")),

    // overlapping fulfillment windows per customer: order intervals
    // [o_orderdate, +14d] that overlap another order of the SAME
    // customer — keyed equi-join + residual predicate (the scale-safe
    // interval-overlap shape; per-key pair count bounds the output)
    Q("q174_overlap_pairs", (s, d) => {
      import s.implicits._
      val iv = T.orders(s, d).select($"o_custkey", $"o_orderkey",
        to_date($"o_orderdate").as("start_d"),
        date_add(to_date($"o_orderdate"), 14).as("end_d"))
      TimeSeries.overlappingIntervals(iv, "o_custkey", "o_orderkey",
          "start_d", "end_d")
        .select($"key".as("o_custkey"), $"a_id", $"b_id", $"overlap_days")
        .orderBy($"o_custkey", $"a_id", $"b_id")
    }, Some("""
      WITH iv AS (SELECT o_custkey, o_orderkey,
                         CAST(o_orderdate AS DATE) AS s,
                         CAST(o_orderdate AS DATE) + 14 AS e
                  FROM orders)
      SELECT a.o_custkey, a.o_orderkey AS a_id, b.o_orderkey AS b_id,
             CAST(date_diff('day', greatest(a.s, b.s),
               least(a.e, b.e)) + 1 AS INT) AS overlap_days
      FROM iv a JOIN iv b
        ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
       AND a.s <= b.e AND b.s <= a.e
      ORDER BY a.o_custkey, a_id, b_id""")),

    // shuffle-key skew report for lineitem.l_partkey: the one-row
    // diagnostic (max/top-k shares + Gini over per-key counts) that
    // decides salting/AQE-skew handling before a join runs at scale;
    // ranks for the Gini come from the distributed prefix-sum, not a
    // single-partition window
    Q("q175_skew_report", (s, d) => {
      import s.implicits._
      Profile.skewReport(T.lineitem(s, d), "l_partkey")
    }, Some("""
      WITH c AS (SELECT l_partkey AS k, count(*) AS c FROM lineitem
                 GROUP BY 1),
      r AS (SELECT c, k, row_number() OVER (ORDER BY c, k) AS rnk FROM c),
      f AS (SELECT sum(c) AS n_rows, count(*) AS n_keys,
                   max(c) AS max_count, sum(rnk * c) AS rc
            FROM r),
      t AS (SELECT sum(c) AS top10 FROM
              (SELECT c FROM c ORDER BY c DESC, k LIMIT 10))
      SELECT n_rows, n_keys, max_count,
             round(max_count * 1.0 / n_rows, 6) AS top1_share,
             round(top10 * 1.0 / n_rows, 6) AS top10_share,
             round(2.0 * rc / (n_keys * n_rows)
               - (n_keys + 1.0) / n_keys, 6) AS gini
      FROM f, t""")),

    // decile lift table for a price-scored urgency predictor: global
    // rank by (o_totalprice desc, key) via the range-partitioned prefix
    // sum, integer-exact bucket split, cumulative capture + lift
    Q("q176_lift_table", (s, d) => {
      import s.implicits._
      val scored = T.orders(s, d).select($"o_orderkey", $"o_totalprice",
        when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L).as("y"))
      Metrics.liftTable(scored, "o_totalprice", "y", "o_orderkey", 10)
        .orderBy($"bucket")
    }, Some("""
      WITH s AS (SELECT o_orderkey,
                        CASE WHEN o_orderpriority = '1-URGENT'
                          THEN 1 ELSE 0 END AS y,
                        row_number() OVER
                          (ORDER BY o_totalprice DESC, o_orderkey) AS rn,
                        count(*) OVER () AS n
                 FROM orders),
      b AS (SELECT ((rn - 1) * 10) // n + 1 AS bucket,
                   count(*) AS n_rows, sum(y) AS n_pos
            FROM s GROUP BY 1),
      w AS (SELECT bucket, n_rows, n_pos,
                   sum(n_pos) OVER (ORDER BY bucket) AS cum_pos,
                   sum(n_rows) OVER (ORDER BY bucket) AS cum_n,
                   sum(n_pos) OVER () AS tot_pos,
                   sum(n_rows) OVER () AS tot_n
            FROM b)
      SELECT bucket, n_rows, n_pos,
             round(n_pos * 1.0 / n_rows, 6) AS response_rate,
             round(cum_pos * 1.0 / tot_pos, 6) AS cum_capture,
             round((cum_pos * 1.0 / cum_n)
               / (tot_pos * 1.0 / tot_n), 6) AS cum_lift
      FROM w ORDER BY bucket""")),

    // document-frequency vocabulary pruning: corpus-glue tokens (df >
    // 50% of docs) and rare noise (df < 3) removed from every doc,
    // surviving tokens kept in exact order — only the pruned vocab
    // joins back against the corpus (AQE-broadcastable)
    Q("q177_df_prune", (s, d) => {
      import s.implicits._
      TextAnalysis.pruneByDocFreq(T.documents(s, d), "doc_id", "text",
          maxShare = 0.5, minDf = 3L)
        .orderBy($"id")
    }, Some("""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                 FROM documents),
      tk AS (SELECT doc_id, ws,
                    unnest(generate_series(1, len(ws))) AS pos
             FROM w),
      t AS (SELECT doc_id, CAST(pos AS INT) AS pos, ws[pos] AS tok FROM tk),
      df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
      nd AS (SELECT count(*) AS nd FROM documents),
      pr AS (SELECT tok, CASE WHEN df > nd * 0.5 THEN 'hi'
                              WHEN df < 3 THEN 'lo' END AS why
             FROM df, nd WHERE df > nd * 0.5 OR df < 3)
      SELECT t.doc_id AS id, count(*) AS n_tokens,
             count(CASE WHEN why IS NULL THEN 1 END) AS n_kept,
             count(CASE WHEN why = 'hi' THEN 1 END) AS n_dropped_hi,
             count(CASE WHEN why = 'lo' THEN 1 END) AS n_dropped_lo,
             coalesce(string_agg(CASE WHEN why IS NULL THEN tok END,
               ' ' ORDER BY pos), '') AS kept_text
      FROM t LEFT JOIN pr USING (tok)
      GROUP BY 1 ORDER BY id""")),

    // per-source unigram KL divergence from the corpus distribution —
    // the mixture-drift monitor; cells join vocab-sized corpus counts,
    // folded to |sources| rows
    Q("q178_kl_drift", (s, d) => {
      import s.implicits._
      TextAnalysis.unigramKlByDomain(T.documents(s, d), "source", "text")
        .orderBy($"domain")
    }, Some("""
      WITH t AS (SELECT source AS domain,
                        unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
                 FROM documents),
      cells AS (SELECT domain, tok, count(*) AS c FROM t GROUP BY 1, 2),
      corpus AS (SELECT tok, sum(c) AS cw FROM cells GROUP BY 1),
      dt AS (SELECT domain, sum(c) AS ts FROM cells GROUP BY 1),
      tt AS (SELECT sum(cw) AS t FROM corpus)
      SELECT cells.domain AS domain, max(ts) AS n_tokens,
             count(*) AS n_terms,
             round(sum((c * 1.0 / ts) *
               ln((c * 1.0 / ts) / (cw * 1.0 / t))), 6) AS kl
      FROM cells JOIN corpus USING (tok) JOIN dt ON dt.domain = cells.domain,
           tt
      GROUP BY 1 ORDER BY cells.domain""")),

    // power-of-two length bucketing with padding-waste accounting — the
    // batching-efficiency read-out; integer bit arithmetic (never float
    // log2), map-side projection + a <=64-group aggregate
    Q("q179_length_buckets", (s, d) => {
      import s.implicits._
      val lens = T.documents(s, d).select(
        TextAnalysis.tokenCount($"text").as("n_tok"))
      Mixing.lengthBuckets(lens, "n_tok").orderBy($"bucket")
    }, Some("""
      WITH t AS (SELECT len(regexp_split_to_array(trim(text), '\s+')) AS n
                 FROM documents),
      b AS (SELECT n, CASE WHEN n <= 1 THEN 1
                           ELSE (1::BIGINT << length(bin(n - 1))) END AS bucket
            FROM t)
      SELECT bucket, count(*) AS n_rows, sum(n) AS total_len,
             sum(bucket - n) AS padding,
             round(sum(bucket - n) * 1.0 / (bucket * count(*)), 6)
               AS waste_frac
      FROM b GROUP BY 1 ORDER BY bucket"""))
  )
}
