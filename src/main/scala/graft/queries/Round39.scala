package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{Graph, Multimodal, TimeSeries}
import graft.sources.{Tables => T}

/** Round-6 thirty-first wave: frame-level payload dedup, Nelson–Aalen
  * hazard, community modularity.
  */
object Round39 {

  val all: Seq[Q] = Seq(

    // frame-level near-dup across binary payloads: each "video" is cut
    // into aligned 64-byte frames, frames fingerprinted (md5), payload
    // pairs scored by frame-set Jaccard through an inverted index on
    // the fingerprint — the video-dedup shape (shared-frame join, never
    // all-pairs); the stub payload is the UTF-8 text, so the oracle
    // replays the framing exactly (ASCII: byte == char)
    Q("q275_frame_dedup", (s, d) => {
      import s.implicits._
      val pay = Multimodal.withPayload(T.documents(s, d), "text")
      val frames = pay
        .withColumn("__nf", floor(octet_length($"payload") / lit(64))
          .cast("long"))
        .filter($"__nf" > 0)
        .withColumn("fi", explode(sequence(lit(1L), $"__nf")))
        .select($"doc_id", expr(
          "md5(substring(payload, cast((fi - 1) * 64 + 1 as int), 64))")
          .as("fh"))
        .distinct()
      val sizes = frames.groupBy($"doc_id").agg(count(lit(1)).as("nf"))
      val shared = frames.select($"doc_id".as("a_id"), $"fh")
        .join(frames.select($"doc_id".as("b_id"), $"fh"), "fh")
        .filter($"a_id" < $"b_id")
        .groupBy($"a_id", $"b_id").agg(count(lit(1)).as("shared"))
      shared
        .join(sizes.select($"doc_id".as("a_id"), $"nf".as("__na")), "a_id")
        .join(sizes.select($"doc_id".as("b_id"), $"nf".as("__nb")), "b_id")
        .select($"a_id", $"b_id", $"shared",
          round($"shared".cast("double")
            / ($"__na" + $"__nb" - $"shared").cast("double"), 6)
            .as("jacc"))
        .filter($"jacc" >= 0.2)
        .orderBy($"a_id", $"b_id")
    }, Some("""
      WITH f0 AS (SELECT doc_id, text, length(text) // 64 AS nf
                  FROM documents),
      fr AS (SELECT DISTINCT doc_id,
               md5(substring(text, CAST((i - 1) * 64 + 1 AS INTEGER),
                 64)) AS fh
             FROM (SELECT doc_id, text, unnest(range(1, nf + 1)) AS i
                   FROM f0 WHERE nf > 0)),
      sz AS (SELECT doc_id, count(*) AS nf FROM fr GROUP BY 1),
      p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   count(*) AS shared
            FROM fr a JOIN fr b ON a.fh = b.fh AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
      j AS (SELECT a_id, b_id, shared,
              round(CAST(shared AS DOUBLE)
                    / CAST(sa.nf + sb.nf - shared AS DOUBLE), 6) AS jacc
            FROM p JOIN sz sa ON sa.doc_id = a_id
            JOIN sz sb ON sb.doc_id = b_id)
      SELECT a_id, b_id, shared, jacc FROM j
      WHERE jacc >= 0.2 ORDER BY a_id, b_id""")),

    // cumulative hazard of purchase repetition: Nelson–Aalen over the
    // same censored inter-purchase durations as q235's Kaplan–Meier —
    // the additive hazard-scale view; running sum in ascending-t frame
    // order (identical sequential order in both engines)
    Q("q276_nelson_aalen", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val p = ev.filter($"event_type" === "purchase")
        .select($"user_id", to_date($"ts").as("day"), $"event_id")
      val w = Window.partitionBy($"user_id").orderBy($"day", $"event_id")
      val lastDay = ev.groupBy($"user_id")
        .agg(max(to_date($"ts")).as("__last"))
      val obs = p.withColumn("__next", lead($"day", 1).over(w))
        .join(lastDay, "user_id")
        .select(
          when($"__next".isNotNull, datediff($"__next", $"day"))
            .otherwise(datediff($"__last", $"day")).cast("long").as("dur"),
          $"__next".isNotNull.cast("long").as("observed"))
      TimeSeries.nelsonAalen(obs, "dur", "observed").orderBy($"t")
    }, Some("""
      WITH pur AS (SELECT user_id, CAST(ts AS DATE) AS day, event_id
                   FROM events WHERE event_type = 'purchase'),
      ld AS (SELECT user_id, max(CAST(ts AS DATE)) AS lastd
             FROM events GROUP BY 1),
      nx AS (SELECT pur.user_id, pur.day,
                    lead(day) OVER (PARTITION BY pur.user_id
                                    ORDER BY day, event_id) AS nxt
             FROM pur),
      o AS (SELECT CASE WHEN nxt IS NOT NULL
                        THEN CAST(nxt - day AS BIGINT)
                        ELSE CAST(lastd - day AS BIGINT) END AS t,
                   CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev
            FROM nx JOIN ld USING (user_id)),
      p AS (SELECT t, sum(ev) AS n_events,
                   sum(1 - ev) AS n_censored_at_t
            FROM o GROUP BY 1),
      n AS (SELECT count(*) AS nn FROM o),
      r AS (SELECT t, n_events,
                   nn - coalesce(sum(n_events + n_censored_at_t)
                     OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS n_risk
            FROM p, n),
      h AS (SELECT t, n_risk, n_events,
                   round(sum(CAST(n_events AS DOUBLE) / n_risk)
                     OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW), 6) AS cum_hazard
            FROM r)
      SELECT t, n_risk, n_events, cum_hazard
      FROM h WHERE n_events > 0 ORDER BY t""")),

    // how good are q259's communities? Newman–Girvan modularity of the
    // 2-round label-propagation partition on the trade graph — exact
    // integer terms over the common denominator 4m², one double
    // combination at the end
    Q("q277_modularity", (s, d) => {
      import s.implicits._
      import graft.operators.BarrierOps
      // barrier (r11): both operators consume the same orders⋈lineitem
      // edge expression — materialize it once instead of re-running the
      // join for label propagation AND for the modularity score
      val edges = T.orders(s, d)
        .join(T.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .select(($"o_custkey" * 2).as("a"), ($"l_suppkey" * 2 + 1).as("b"))
        .barrier()
      val labels = Graph.labelPropagation(edges, "a", "b", rounds = 2)
      Graph.modularity(edges, "a", "b", labels, "node", "label")
    }, Some("""
      WITH ed AS (SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1
                    AS b
                  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      canon AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
                FROM ed),
      sym AS (SELECT a AS src, b AS dst FROM canon
              UNION SELECT b, a FROM canon),
      l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
      r1 AS (SELECT node, label FROM (
               SELECT c.node, c.label,
                      row_number() OVER (PARTITION BY c.node
                        ORDER BY c.cnt DESC, c.label) AS rn
               FROM (SELECT s.dst AS node, l.label, count(*) AS cnt
                     FROM sym s JOIN l0 l ON s.src = l.node
                     GROUP BY 1, 2) c) WHERE rn = 1),
      r2 AS (SELECT node, label FROM (
               SELECT c.node, c.label,
                      row_number() OVER (PARTITION BY c.node
                        ORDER BY c.cnt DESC, c.label) AS rn
               FROM (SELECT s.dst AS node, l.label, count(*) AS cnt
                     FROM sym s JOIN r1 l ON s.src = l.node
                     GROUP BY 1, 2) c) WHERE rn = 1),
      m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM canon),
      e AS (SELECT CAST(sum(CASE WHEN la.label = lb.label THEN 1 ELSE 0
                     END) AS BIGINT) AS e
            FROM canon JOIN r2 la ON la.node = canon.a
            JOIN r2 lb ON lb.node = canon.b),
      deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
              FROM sym GROUP BY 1),
      dc AS (SELECT label, CAST(sum(d) AS BIGINT) AS dcv
             FROM deg JOIN r2 ON deg.node = r2.node GROUP BY 1),
      f AS (SELECT count(*) AS n_communities,
              sum(CAST(dcv AS DECIMAL(18,0)) * CAST(dcv AS DECIMAL(18,0)))
                AS sd2
            FROM dc)
      SELECT m.m, f.n_communities, e.e AS intra_edges,
             round((4.0 * CAST(m.m AS DOUBLE) * CAST(e.e AS DOUBLE)
                    - CAST(sd2 AS DOUBLE))
                   / (4.0 * CAST(m.m AS DOUBLE) * CAST(m.m AS DOUBLE)),
                   6) AS modularity
      FROM f, m, e"""))
  )
}
