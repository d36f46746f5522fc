package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Baskets, Metrics, Scale}
import graft.sources.{Tables => T}

/** Round-6 ninth wave: linear attribution, item-item collaborative
  * similarity, rendezvous shard routing.
  */
object Round17 {

  val all: Seq[Q] = Seq(

    // marketing read-out #2 (q173 is last-touch): each purchase's value
    // split evenly over the user's view/click touches in the prior 7
    // days; per-pair credit rounded to 4 then summed as decimal — exact
    // under any partitioning
    Q("q212_linear_attribution", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val touches = ev.filter($"event_type".isin("view", "click"))
      val convs = ev.filter($"event_type" === "purchase")
      Metrics.linearAttribution(
          touches, "user_id", "ts", "event_type",
          convs, "user_id", "ts", "event_id", "value",
          lookbackDays = 7)
        .orderBy($"channel")
    }, Some("""
      WITH c AS (SELECT event_id AS cid, user_id, ts, value
                 FROM events WHERE event_type = 'purchase'),
      t AS (SELECT user_id, ts, event_type AS ch
            FROM events WHERE event_type IN ('view', 'click')),
      j AS (SELECT c.cid, c.value, t.ch
            FROM c LEFT JOIN t ON t.user_id = c.user_id
              AND t.ts <= c.ts AND t.ts >= c.ts - INTERVAL 7 DAY),
      pc AS (SELECT cid, value, ch, count(ch) AS n_ch FROM j GROUP BY 1, 2, 3),
      w AS (SELECT cid, value, ch, n_ch,
                   sum(n_ch) OVER (PARTITION BY cid) AS n_tot FROM pc),
      cr AS (SELECT coalesce(ch, 'unattributed') AS channel, cid,
                    CAST(floor((CASE WHEN n_tot = 0 THEN value
                                ELSE value * n_ch / n_tot END)
                               * 10000 + 0.5) / 10000
                      AS DECIMAL(18,4)) AS credit
             FROM w)
      SELECT channel, CAST(sum(credit) AS DECIMAL(18,4)) AS credited,
             count(DISTINCT cid) AS n_conversions
      FROM cr GROUP BY 1 ORDER BY channel""")),

    // item-based collaborative filtering weights: parts bought together,
    // cosine-normalized so ubiquitous parts don't dominate (Sarwar et
    // al. 2001); A-Priori pruned pair mining underneath
    Q("q213_item_cosine", (s, d) => {
      import s.implicits._
      Baskets.itemCosine(
          T.lineitem(s, d).select($"l_orderkey", $"l_partkey"),
          "l_orderkey", "l_partkey",
          minItemSupport = 2, minPairSupport = 2)
        .orderBy($"cosine".desc, $"item_a", $"item_b")
        .limit(50)
    }, Some("""
      WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
                  FROM lineitem),
      sup AS (SELECT i, count(*) AS n FROM bi GROUP BY 1),
      freq AS (SELECT i, n FROM sup WHERE n >= 2),
      fb AS (SELECT bi.b, bi.i FROM bi JOIN freq USING (i)),
      pairs AS (SELECT x.i AS item_a, y.i AS item_b, count(*) AS support
                FROM fb x JOIN fb y ON x.b = y.b AND x.i < y.i
                GROUP BY 1, 2 HAVING count(*) >= 2),
      sc AS (SELECT item_a, item_b, support, a.n AS n_a, b.n AS n_b,
                    round(support / sqrt(CAST(a.n * b.n AS DOUBLE)), 6)
                      AS cosine
             FROM pairs
             JOIN sup a ON a.i = item_a
             JOIN sup b ON b.i = item_b)
      SELECT * FROM sc
      ORDER BY cosine DESC, item_a, item_b LIMIT 50""")),

    // shard-routing stability audit: rendezvous hashing vs modulo when
    // the shard count grows 10 -> 11 — HRW moves only the keys whose
    // NEW shard wins, modulo reshuffles nearly everything; the metric
    // that decides whether a layout change is a top-up or a rewrite
    Q("q214_rendezvous_shards", (s, d) => {
      import s.implicits._
      val ids = T.documents(s, d).select($"doc_id")
        .withColumn("s10", Scale.rendezvousShard($"doc_id", 10))
        .withColumn("s11", Scale.rendezvousShard($"doc_id", 11))
        .withColumn("m10", pmod($"doc_id", lit(10L)))
        .withColumn("m11", pmod($"doc_id", lit(11L)))
      val hrw = ids.agg(count(lit(1)).as("n_docs"),
        sum(when($"s10" =!= $"s11", 1L).otherwise(0L)).as("n_moved"))
        .select(lit("rendezvous").as("strategy"), $"n_docs", $"n_moved",
          round($"n_moved".cast("double") / $"n_docs", 6).as("moved_frac"))
      val mod = ids.agg(count(lit(1)).as("n_docs"),
        sum(when($"m10" =!= $"m11", 1L).otherwise(0L)).as("n_moved"))
        .select(lit("modulo").as("strategy"), $"n_docs", $"n_moved",
          round($"n_moved".cast("double") / $"n_docs", 6).as("moved_frac"))
      hrw.unionAll(mod).orderBy($"strategy")
    }, Some("""
      WITH s AS (
        SELECT doc_id,
          63 - list_max([(((doc_id % 2147483648) * 1000003 + s * 999983)
            % 2147483648 * 2654435761 % 2147483648) * 64 + (63 - s)
            for s in range(10)]) % 64 AS s10,
          63 - list_max([(((doc_id % 2147483648) * 1000003 + s * 999983)
            % 2147483648 * 2654435761 % 2147483648) * 64 + (63 - s)
            for s in range(11)]) % 64 AS s11
        FROM documents)
      SELECT * FROM (
        SELECT 'rendezvous' AS strategy, count(*) AS n_docs,
               sum(CASE WHEN s10 <> s11 THEN 1 ELSE 0 END) AS n_moved,
               round(sum(CASE WHEN s10 <> s11 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS moved_frac
        FROM s
        UNION ALL
        SELECT 'modulo', count(*),
               sum(CASE WHEN doc_id % 10 <> doc_id % 11 THEN 1 ELSE 0 END),
               round(sum(CASE WHEN doc_id % 10 <> doc_id % 11
                 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6)
        FROM s)
      ORDER BY strategy"""))
  )
}
