package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Mixing, Quantiles, TextAnalysis}
import graft.sources.{Tables => T}

/** Round-6 thirtieth wave: effective sample size, split-conformal
  * coverage, language-ID self-evaluation.
  */
object Round38 {

  val all: Seq[Q] = Seq(

    // importance-weighting health check per segment: Kish effective
    // sample size (Σw)²/Σw² of the order-value weights — ESS/n near 1
    // means weighting is benign, near 1/n means one record dominates;
    // sums exact (long / decimal), two scalar divisions at the end
    Q("q272_ess", (s, d) => {
      import s.implicits._
      val w = ($"o_totalprice".cast("decimal(18,2)") * 100)
        .cast("long")
      val agg = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment", w.as("__w"))
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum($"__w").as("__sw"),
          sum($"__w".cast("decimal(18,0)") * $"__w".cast("decimal(18,0)"))
            .as("__sww"))
      agg.select($"c_mktsegment", $"n",
          round(($"__sw".cast("double") * $"__sw".cast("double"))
            / $"__sww".cast("double"), 4).as("ess"))
        .withColumn("ess_ratio",
          round($"ess" / $"n".cast("double"), 6))
        .orderBy($"c_mktsegment")
    }, Some("""
      WITH w AS (SELECT c_mktsegment,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                     AS BIGINT) AS w
                 FROM orders JOIN customer ON o_custkey = c_custkey),
      a AS (SELECT c_mktsegment, count(*) AS n,
              CAST(sum(w) AS BIGINT) AS sw,
              sum(CAST(w AS DECIMAL(18,0)) * CAST(w AS DECIMAL(18,0)))
                AS sww
            FROM w GROUP BY 1),
      e AS (SELECT c_mktsegment, n,
              round((CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE))
                    / CAST(sww AS DOUBLE), 4) AS ess
            FROM a)
      SELECT c_mktsegment, n, ess,
             round(ess / CAST(n AS DOUBLE), 6) AS ess_ratio
      FROM e ORDER BY c_mktsegment""")),

    // split-conformal interval audit: per event type, the [p05, p95]
    // band fit on the embargoed TRAIN fold and its empirical coverage
    // on the TEST fold — quantiles via the exact sort-rank machinery
    // (= quantile_cont), bounds rounded in BOTH engines before the
    // containment test so the coverage count is deterministic
    Q("q273_conformal", (s, d) => {
      import s.implicits._
      val split = Mixing.embargoSplit(T.events(s, d), "ts",
        "2024-01-18", embargoDays = 4)
      val train = split.filter($"split" === "train")
        .select($"event_type", $"value")
      val test = split.filter($"split" === "test")
        .select($"event_type", $"value")
      val band = Quantiles.exactQuantiles(train, Seq("event_type"),
          "value", Seq(0.05, 0.95))
        .select($"event_type", round($"p5", 6).as("lo"),
          round($"p95", 6).as("hi"))
      test.join(band, "event_type")
        .groupBy($"event_type", $"lo", $"hi")
        .agg(count(lit(1)).as("n_test"),
          sum(when($"value" >= $"lo" && $"value" <= $"hi", 1L)
            .otherwise(0L)).as("__cov"))
        .select($"event_type", $"lo", $"hi", $"n_test",
          round($"__cov".cast("double") / $"n_test".cast("double"), 6)
            .as("coverage"))
        .orderBy($"event_type")
    }, Some("""
      WITH tagged AS (SELECT event_type, value,
                        CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-18'
                             THEN 'train'
                             WHEN CAST(ts AS DATE) >
                                  DATE '2024-01-18' + INTERVAL 4 DAY
                             THEN 'test' END AS split
                      FROM events),
      q AS (SELECT event_type,
              round(quantile_cont(value, 0.05), 6) AS lo,
              round(quantile_cont(value, 0.95), 6) AS hi
            FROM tagged WHERE split = 'train' GROUP BY 1),
      te AS (SELECT event_type, value FROM tagged WHERE split = 'test')
      SELECT te.event_type, lo, hi, count(*) AS n_test,
             round(CAST(sum(CASE WHEN value >= lo AND value <= hi
                                 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE), 6) AS coverage
      FROM te JOIN q ON te.event_type = q.event_type
      GROUP BY 1, 2, 3 ORDER BY te.event_type""")),

    // the engine evaluating its own operator: confusion matrix of the
    // q28 language-ID heuristic against the labeled lang column, with
    // each cell's share of its truth row — one scan, one hash agg,
    // one truth-keyed window
    Q("q274_langid_eval", (s, d) => {
      import s.implicits._
      val guess = T.documents(s, d).select($"lang",
        TextAnalysis.languageGuess(TextAnalysis.tokens($"text"))
          .as("lang_guess"))
      val cell = guess.groupBy($"lang", $"lang_guess")
        .agg(count(lit(1)).as("n"))
      cell
        .withColumn("share", round($"n".cast("double")
          / sum($"n").over(org.apache.spark.sql.expressions.Window
            .partitionBy($"lang")).cast("double"), 6))
        .orderBy($"lang", $"lang_guess")
    }, Some("""
      WITH t AS (SELECT lang,
                   regexp_split_to_array(trim(text), '\s+') AS ws
                 FROM documents),
      g AS (SELECT lang,
              CASE WHEN len(list_filter(ws,
                     x -> x IN ('the','and','of'))) > 0 THEN 'en'
                   WHEN len(list_filter(ws,
                     x -> x IN ('der','und','die'))) > 0 THEN 'de'
                   WHEN len(list_filter(ws,
                     x -> x IN ('el','la','los'))) > 0 THEN 'es'
                   ELSE 'unknown' END AS lang_guess
            FROM t),
      c AS (SELECT lang, lang_guess, count(*) AS n
            FROM g GROUP BY 1, 2)
      SELECT lang, lang_guess, n,
             round(CAST(n AS DOUBLE)
                   / CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE), 6)
               AS share
      FROM c ORDER BY lang, lang_guess"""))
  )
}
