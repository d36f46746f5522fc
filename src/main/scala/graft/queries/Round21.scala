package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis, TimeSeries}
import graft.sources.{Formats, Tables => T}

/** Round-6 thirteenth wave: readability scoring, format round-trips,
  * activity streaks.
  */
object Round21 {

  val all: Seq[Q] = Seq(

    // corpus readability gate: Flesch reading ease from sentence/word/
    // vowel-group counts — pure map-side HOF arithmetic, zero shuffles
    Q("q224_readability", (s, d) => {
      import s.implicits._
      TextAnalysis.fleschReadingEase(T.documents(s, d), "doc_id", "text")
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id,
                        list_filter(list_transform(
                          regexp_split_to_array(text, '[.!?]+'),
                          x -> trim(x)), x -> length(x) > 0) AS sent,
                        list_filter(regexp_split_to_array(text, '\s+'),
                          x -> length(x) > 0) AS words
                 FROM documents),
      c AS (SELECT doc_id,
                   CAST(len(sent) AS INT) AS n_sentences,
                   CAST(len(words) AS INT) AS n_words,
                   CAST(coalesce(list_sum(list_transform(words,
                     w -> greatest(1, len(regexp_extract_all(lower(w),
                       '[aeiouy]+'))))), 0) AS BIGINT) AS n_syllables
            FROM t)
      SELECT doc_id, n_sentences, n_words, n_syllables,
             CASE WHEN n_words > 0 THEN
               round(206.835
                 - 1.015 * (CAST(n_words AS DOUBLE)
                            / greatest(n_sentences, 1))
                 - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6)
             END AS flesch
      FROM c ORDER BY doc_id""")),

    // sink/source round-trip in the graded loop: the same orders table
    // written as JSON and CSV, read back through the schema'd readers,
    // and aggregated — equality with the direct-parquet oracle proves
    // the format plumbing loses nothing (values, timestamps, doubles)
    Q("q225_format_roundtrip", (s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_q225"
      Formats.writeJson(o, s"$base/json")
      Formats.writeCsv(o, s"$base/csv")
      val fromJson = Formats.readJson(s, s"$base/json", o.schema)
        .withColumn("format", lit("json"))
      val fromCsv = Formats.readCsv(s, s"$base/csv", o.schema)
        .withColumn("format", lit("csv"))
      fromJson.unionByName(fromCsv)
        .groupBy($"format", $"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum($"o_totalprice".cast("decimal(18,2)"))
            .cast("decimal(18,2)").as("total"))
        .orderBy($"format", $"o_orderstatus")
    }, Some("""
      SELECT f.format, o_orderstatus, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS total
      FROM orders CROSS JOIN (VALUES ('json'), ('csv')) f(format)
      GROUP BY 1, 2 ORDER BY format, o_orderstatus""")),

    // engagement staying power: longest run of consecutive active days
    // per user — gaps-and-islands on the distinct-day reduction
    Q("q226_streaks", (s, d) => {
      import s.implicits._
      TimeSeries.longestDailyStreak(T.events(s, d), "user_id", "ts")
        .orderBy($"user_id")
    }, Some("""
      WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                    FROM events),
      r AS (SELECT user_id, day,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY day) AS rn
            FROM days),
      g AS (SELECT user_id, day - CAST(rn AS INTEGER) AS grp FROM r),
      l AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
      SELECT user_id, sum(len) AS n_active_days,
             max(len) AS longest_streak
      FROM l GROUP BY 1 ORDER BY user_id"""))
  )
}
