package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.Mixing
import graft.sources.{Tables => T}

/** Round-6 forty-fourth wave: Horvitz–Thompson estimation audit,
  * SPRT sequential monitor.
  */
object Round52 {

  val all: Seq[Q] = Seq(

    // does the deterministic sample ESTIMATE correctly? Horvitz–
    // Thompson totals from the q105-style stratified sample: per lang,
    // sampled char mass divided by the EXACT admission rate
    // (⌊1000·f⌋/1000 — the rate the hash filter actually applies, not
    // the nominal fraction), against the true total — estimate and
    // ratio in exact integer/decimal arithmetic to the final division
    Q("q302_horvitz_thompson", (s, d) => {
      import s.implicits._
      val sampled = Mixing.stratifiedSample(T.documents(s, d), "lang",
          "doc_id", Map("en" -> 0.5, "de" -> 0.2), defaultFraction = 0.1)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_sampled"),
          sum($"n_chars").as("__sc"))
      val truth = T.documents(s, d).groupBy($"lang")
        .agg(count(lit(1)).as("n_true"), sum($"n_chars").as("__tc"))
      val bound = when($"lang" === "en", 500L)
        .when($"lang" === "de", 200L).otherwise(100L)
      sampled.join(truth, "lang")
        .withColumn("__b", bound)
        .select($"lang", $"n_sampled", $"n_true",
          round($"__sc".cast("double") * 1000.0 / $"__b".cast("double"),
            2).as("ht_estimate"),
          $"__tc".as("true_chars"))
        .withColumn("ratio",
          round($"ht_estimate" / $"true_chars".cast("double"), 6))
        .orderBy($"lang")
    }, Some("""
      WITH sm AS (SELECT lang, count(*) AS n_sampled,
                    CAST(sum(n_chars) AS BIGINT) AS sc
                  FROM documents
                  WHERE ((doc_id % 2147483648) * 2246822519) % 1000 <
                        CASE WHEN lang = 'en' THEN 500
                             WHEN lang = 'de' THEN 200 ELSE 100 END
                  GROUP BY 1),
      tr AS (SELECT lang, count(*) AS n_true,
               CAST(sum(n_chars) AS BIGINT) AS tc
             FROM documents GROUP BY 1),
      j AS (SELECT sm.lang, n_sampled, n_true,
              round(CAST(sc AS DOUBLE) * 1000.0 /
                CAST(CASE WHEN sm.lang = 'en' THEN 500
                          WHEN sm.lang = 'de' THEN 200
                          ELSE 100 END AS DOUBLE), 2) AS ht_estimate,
              tc AS true_chars
            FROM sm JOIN tr ON sm.lang = tr.lang)
      SELECT lang, n_sampled, n_true, ht_estimate, true_chars,
             round(ht_estimate / CAST(true_chars AS DOUBLE), 6) AS ratio
      FROM j ORDER BY lang""")),

    // Wald's sequential probability ratio test as a daily monitor: is
    // the purchase share drifting from p0=0.2 toward p1=0.25? Per-day
    // exact counts feed a cumulative log-likelihood ratio — the ln
    // coefficients stay SUBEXPRESSIONS (each engine constant-folds the
    // same literals; holtForecast's discipline), the running sum runs
    // in day order, decision thresholds ±ln(19) ≙ α=β=0.05
    Q("q303_sprt", (s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .groupBy(to_date($"ts").as("day"))
        .agg(sum(when($"event_type" === "purchase", 1L).otherwise(0L))
          .as("x"),
          count(lit(1)).as("n"))
      val llrDay = $"x".cast("double") * log(lit(0.25) / lit(0.2)) +
        ($"n" - $"x").cast("double") * log(lit(0.75) / lit(0.8))
      daily
        .withColumn("__llr", llrDay)
        .withColumn("cum_llr", round(sum($"__llr").over(
          Window.orderBy($"day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)),
          6))
        .select($"day", $"x", $"n", $"cum_llr",
          when($"cum_llr" >= log(lit(19.0)), "accept_h1")
            .when($"cum_llr" <= -log(lit(19.0)), "accept_h0")
            .otherwise("continue").as("decision"))
        .orderBy($"day")
    }, Some("""
      WITH daily AS (SELECT CAST(ts AS DATE) AS day,
                       CAST(sum(CASE WHEN event_type = 'purchase'
                                     THEN 1 ELSE 0 END) AS BIGINT) AS x,
                       count(*) AS n
                     FROM events GROUP BY 1),
      l AS (SELECT day, x, n,
              CAST(x AS DOUBLE) * ln(0.25 / 0.2)
                + CAST(n - x AS DOUBLE) * ln(0.75 / 0.8) AS llr
            FROM daily),
      c AS (SELECT day, x, n,
              round(sum(llr) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                AS cum_llr
            FROM l)
      SELECT day, x, n, cum_llr,
             CASE WHEN cum_llr >= ln(19.0) THEN 'accept_h1'
                  WHEN cum_llr <= -ln(19.0) THEN 'accept_h0'
                  ELSE 'continue' END AS decision
      FROM c ORDER BY day"""))
  )
}
