package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Metrics, TextAnalysis, TimeSeries}
import graft.sources.{Tables => T}

/** Round-6 twenty-seventh wave: KS distribution shift, autocorrelation
  * spectrum, Zipf-law corpus fit.
  */
object Round35 {

  val all: Seq[Q] = Seq(

    // distribution-shift gate per market segment: two-sample KS D
    // between open and fulfilled order values — the ECDF gap maximized
    // in INTEGER form (|cumA·nB − cumB·nA|), one double division at
    // the end; complements q255's location-only rank test
    Q("q263_ks_test", (s, d) => {
      import s.implicits._
      val df = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment", $"o_orderstatus", $"o_totalprice")
      Metrics.ksTest(df, "c_mktsegment", "o_orderstatus", "O", "F",
          "o_totalprice")
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH pool AS (SELECT c_mktsegment AS seg, o_orderstatus AS side,
                           CAST(o_totalprice AS DOUBLE) AS x
                    FROM orders JOIN customer ON o_custkey = c_custkey
                    WHERE o_orderstatus IN ('O', 'F')
                      AND o_totalprice IS NOT NULL),
      pv AS (SELECT seg, x,
               CAST(sum(CASE WHEN side = 'O' THEN 1 ELSE 0 END)
                 AS BIGINT) AS ca,
               CAST(sum(CASE WHEN side = 'F' THEN 1 ELSE 0 END)
                 AS BIGINT) AS cb
             FROM pool GROUP BY 1, 2),
      cum AS (SELECT seg,
                sum(ca) OVER (PARTITION BY seg ORDER BY x
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS cuma,
                sum(cb) OVER (PARTITION BY seg ORDER BY x
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS cumb,
                sum(ca) OVER (PARTITION BY seg) AS na,
                sum(cb) OVER (PARTITION BY seg) AS nb
              FROM pv)
      SELECT seg AS c_mktsegment,
             CAST(max(na) AS BIGINT) AS n_a,
             CAST(max(nb) AS BIGINT) AS n_b,
             round(CAST(max(abs(cuma * nb - cumb * na)) AS DOUBLE)
                   / CAST(max(na) * max(nb) AS DOUBLE), 6) AS d
      FROM cum GROUP BY 1
      HAVING max(na) > 0 AND max(nb) > 0
      ORDER BY 1""")),

    // periodicity probe: autocorrelation of each event type's daily
    // value series at lags 1..7 — integer moments (cents) summed
    // exactly, lead columns over one keyed window (no self-join)
    Q("q264_acf", (s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg((sum($"value".cast("decimal(18,2)")).cast("decimal(18,2)")
          * 100).cast("long").as("yc"))
      TimeSeries.acf(daily, "event_type", "day", "yc", maxLag = 7)
        .orderBy($"event_type", $"lag")
    }, Some("""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                       CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
                              AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
                     FROM events GROUP BY 1, 2),
      idx AS (SELECT event_type, yc,
                row_number() OVER (PARTITION BY event_type
                  ORDER BY day) AS i
              FROM daily),
      p AS (SELECT a.event_type, k.lag, a.yc AS x, b.yc AS y
            FROM idx a
            JOIN (SELECT unnest(range(1, 8)) AS lag) k ON true
            JOIN idx b ON b.event_type = a.event_type
              AND b.i = a.i + k.lag),
      m AS (SELECT event_type, lag, count(*) AS n_pairs,
              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              CAST(sum(x * y) AS BIGINT) AS sxy,
              CAST(sum(x * x) AS BIGINT) AS sxx,
              CAST(sum(y * y) AS BIGINT) AS syy
            FROM p GROUP BY 1, 2)
      SELECT event_type, CAST(lag AS INTEGER) AS lag, n_pairs,
             round((n_pairs * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / sqrt((n_pairs * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * (n_pairs * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                   6) AS acf
      FROM m
      WHERE n_pairs >= 2
        AND n_pairs * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        AND n_pairs * CAST(syy AS DOUBLE)
            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
      ORDER BY event_type, lag""")),

    // corpus-naturalness audit: Zipf exponent over the top-200 tokens
    // — logs snapped to a 10⁻⁹ integer grid before any sum, so every
    // moment is exact and partitioning-independent (natural corpora
    // fit slope ≈ −1; boilerplate and synthetic text do not)
    Q("q265_zipf", (s, d) => {
      TextAnalysis.zipfFit(T.documents(s, d), "text", topN = 200)
    }, Some("""
      WITH tok AS (SELECT unnest(regexp_split_to_array(trim(text),
                     '\s+')) AS t
                   FROM documents),
      c AS (SELECT t, count(*) AS cnt FROM tok
            WHERE t <> '' GROUP BY 1),
      top AS (SELECT t, cnt FROM c ORDER BY cnt DESC, t LIMIT 200),
      r AS (SELECT row_number() OVER (ORDER BY cnt DESC, t) AS rank,
                   cnt
            FROM top),
      g AS (SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000000)
                     AS BIGINT) AS lx,
                   CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000000000)
                     AS BIGINT) AS ly
            FROM r),
      f AS (SELECT count(*) AS n_tokens,
              CAST(sum(lx) AS BIGINT) AS sx,
              CAST(sum(ly) AS BIGINT) AS sy,
              sum(CAST(lx AS DECIMAL(38,0)) * CAST(ly AS DECIMAL(38,0)))
                AS sxy,
              sum(CAST(lx AS DECIMAL(38,0)) * CAST(lx AS DECIMAL(38,0)))
                AS sxx
            FROM g)
      SELECT n_tokens,
             round((n_tokens * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (n_tokens * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                   6) AS slope,
             round((CAST(sy AS DOUBLE) / 1000000000.0
                    - ((n_tokens * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (n_tokens * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                      * (CAST(sx AS DOUBLE) / 1000000000.0))
                   / n_tokens, 6) AS intercept
      FROM f"""))
  )
}
