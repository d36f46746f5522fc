package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Profile
import graft.sources.{Tables => T}

/** Round-6 twelfth wave: audience overlap, categorical association,
  * population stability.
  */
object Round20 {

  val all: Seq[Q] = Seq(

    // which behavioral audiences are really the same users? exact
    // pairwise intersection + Jaccard over the five event-type segments
    Q("q221_segment_overlap", (s, d) => {
      import s.implicits._
      Profile.segmentOverlap(T.events(s, d), "event_type", "user_id")
        .orderBy($"seg_a", $"seg_b")
    }, Some("""
      WITH us AS (SELECT DISTINCT event_type AS s, user_id AS id
                  FROM events),
      sz AS (SELECT s, count(*) AS n FROM us GROUP BY 1),
      co AS (SELECT a.s AS seg_a, b.s AS seg_b, count(*) AS n_both
             FROM us a JOIN us b ON a.id = b.id AND a.s < b.s
             GROUP BY 1, 2)
      SELECT seg_a, seg_b, sa.n AS n_a, sb.n AS n_b, n_both,
             round(CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both), 6)
               AS jaccard
      FROM co JOIN sz sa ON sa.s = seg_a JOIN sz sb ON sb.s = seg_b
      ORDER BY seg_a, seg_b""")),

    // are brand and type independent dimensions of the part catalog?
    // full-grid chi-squared, total folded in sorted cell order (no
    // partial-sum order hazard), normalized to Cramér's V
    Q("q222_cramers_v", (s, d) => {
      import s.implicits._
      Profile.cramersV(T.part(s, d), "p_brand", "p_type")
    }, Some("""
      WITH t AS (SELECT CAST(p_brand AS VARCHAR) AS a,
                        CAST(p_type AS VARCHAR) AS b FROM part
                 WHERE p_brand IS NOT NULL AND p_type IS NOT NULL),
      obs AS (SELECT a, b, count(*) AS o FROM t GROUP BY 1, 2),
      ra AS (SELECT a, count(*) AS na FROM t GROUP BY 1),
      cb AS (SELECT b, count(*) AS nb FROM t GROUP BY 1),
      nn AS (SELECT count(*) AS n, count(DISTINCT a) AS r,
                    count(DISTINCT b) AS c FROM t),
      grid AS (SELECT ra.a, cb.b, ra.na, cb.nb, coalesce(obs.o, 0) AS o
               FROM ra CROSS JOIN cb
               LEFT JOIN obs ON obs.a = ra.a AND obs.b = cb.b),
      cells AS (SELECT g.a, g.b,
                       pow(o - CAST(na * nb AS DOUBLE) / n, 2)
                         / (CAST(na * nb AS DOUBLE) / n) AS contrib
                FROM grid g, nn),
      f AS (SELECT list(contrib ORDER BY a, b) AS l FROM cells)
      SELECT n, r, c,
             round(list_reduce(list_prepend(0.0, l),
               (acc, x) -> acc + x), 6) AS chi2,
             round(sqrt(list_reduce(list_prepend(0.0, l),
                 (acc, x) -> acc + x)
               / (n * least(r - 1, c - 1))), 6) AS cramers_v
      FROM f, nn""")),

    // did the order-value distribution drift across the 1999 boundary?
    // PSI over baseline deciles — the model-monitoring stability gate
    Q("q223_psi", (s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
      val cutoff = lit("1999-01-01").cast("timestamp")
      Profile.psi(o.filter($"o_orderdate" < cutoff),
          o.filter($"o_orderdate" >= cutoff), "o_totalprice", buckets = 10)
        .orderBy($"bucket")
    }, Some("""
      WITH a AS (SELECT o_totalprice AS v FROM orders
                 WHERE o_orderdate < TIMESTAMP '1999-01-01'),
      b AS (SELECT o_totalprice AS v FROM orders
            WHERE o_orderdate >= TIMESTAMP '1999-01-01'),
      bd AS (SELECT quantile_cont(v, 0.1) AS q1, quantile_cont(v, 0.2) AS q2,
                    quantile_cont(v, 0.3) AS q3, quantile_cont(v, 0.4) AS q4,
                    quantile_cont(v, 0.5) AS q5, quantile_cont(v, 0.6) AS q6,
                    quantile_cont(v, 0.7) AS q7, quantile_cont(v, 0.8) AS q8,
                    quantile_cont(v, 0.9) AS q9
             FROM a),
      ca AS (SELECT 1 + (v > q1)::INT + (v > q2)::INT + (v > q3)::INT
                      + (v > q4)::INT + (v > q5)::INT + (v > q6)::INT
                      + (v > q7)::INT + (v > q8)::INT + (v > q9)::INT
                      AS bucket, count(*) AS n_a
             FROM a, bd GROUP BY 1),
      cb AS (SELECT 1 + (v > q1)::INT + (v > q2)::INT + (v > q3)::INT
                      + (v > q4)::INT + (v > q5)::INT + (v > q6)::INT
                      + (v > q7)::INT + (v > q8)::INT + (v > q9)::INT
                      AS bucket, count(*) AS n_b
             FROM b, bd GROUP BY 1),
      sp AS (SELECT unnest(generate_series(1, 10)) AS bucket),
      j AS (SELECT sp.bucket, coalesce(ca.n_a, 0) AS n_a,
                   coalesce(cb.n_b, 0) AS n_b
            FROM sp LEFT JOIN ca ON ca.bucket = sp.bucket
                    LEFT JOIN cb ON cb.bucket = sp.bucket),
      tt AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM j),
      wp AS (SELECT bucket, n_a, n_b,
                    CAST(n_a AS DOUBLE) / ta AS p_a,
                    CAST(n_b AS DOUBLE) / tb AS p_b,
                    CASE WHEN n_a > 0 AND n_b > 0 THEN
                      (CAST(n_b AS DOUBLE) / tb - CAST(n_a AS DOUBLE) / ta)
                      * ln((CAST(n_b AS DOUBLE) / tb)
                           / (CAST(n_a AS DOUBLE) / ta)) END AS contrib
             FROM j, tt),
      ft AS (SELECT CASE WHEN sum(CASE WHEN contrib IS NULL THEN 1
                                       ELSE 0 END) = 0
                    THEN list_reduce(
                      list_prepend(0.0, list(contrib ORDER BY bucket)),
                      (acc, x) -> acc + x) END AS psi
             FROM wp)
      SELECT bucket, n_a, n_b, round(p_a, 6) AS p_a, round(p_b, 6) AS p_b,
             round(contrib, 6) AS contrib, round(psi, 6) AS psi
      FROM wp, ft ORDER BY bucket"""))
  )
}
