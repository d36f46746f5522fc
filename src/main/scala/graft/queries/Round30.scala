package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Quantiles
import graft.sources.{Tables => T}

/** Round-6 twenty-second wave: distribution alignment. */
object Round30 {

  val all: Seq[Q] = Seq(

    // align the post-1999 order-value distribution onto the pre-1999
    // shape: quantile normalization (rank in B -> interpolated quantile
    // of A) — the batch-effect / cross-model score alignment standard
    Q("q249_quantile_norm", (s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
      val cutoff = lit("1999-01-01").cast("timestamp")
      Quantiles.quantileNormalize(
          o.filter($"o_orderdate" < cutoff),
          o.filter($"o_orderdate" >= cutoff), "o_totalprice")
        .orderBy($"o_totalprice")
    }, Some("""
      WITH av AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
                  WHERE o_orderdate < TIMESTAMP '1999-01-01'
                    AND o_totalprice IS NOT NULL),
      aref AS (SELECT list(v ORDER BY v) AS ref FROM av),
      bv AS (SELECT CAST(o_totalprice AS DOUBLE) AS v, count(*) AS n
             FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
               AND o_totalprice IS NOT NULL
             GROUP BY 1),
      r AS (SELECT v, n,
                   sum(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                     AS cum,
                   sum(n) OVER () AS nb
            FROM bv),
      p AS (SELECT v, n,
                   CASE WHEN nb > 1
                        THEN CAST(cum - n AS DOUBLE) / (nb - 1)
                        ELSE 0.0 END AS pr
            FROM r),
      m AS (SELECT v, n, pr, len(ref) AS na,
                   pr * (len(ref) - 1) AS h
            FROM p, aref),
      x AS (SELECT v, n, h,
                   ref[CAST(floor(h) AS INT) + 1] AS lo_v,
                   ref[least(CAST(floor(h) AS INT) + 2, na)] AS hi_v,
                   h - floor(h) AS frac
            FROM m, aref)
      SELECT v AS o_totalprice, n,
             round(lo_v + frac * (hi_v - lo_v), 6) AS mapped
      FROM x ORDER BY o_totalprice"""))
  )
}
