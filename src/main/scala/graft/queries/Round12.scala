package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TimeSeries}
import graft.sources.{Tables => T}

/** Round-6 fourth wave: OHLC resampling, label-centroid geometry, and
  * time-weighted averages.
  */
object Round12 {

  val all: Seq[Q] = Seq(

    // weekly OHLC per user: the irregular event stream downsampled to a
    // fixed-frequency series in ONE keyed hash aggregate (min_by/max_by
    // over the (ts, tie) struct — no window, no sort, deterministic
    // under ties and retries)
    Q("q190_ohlc", (s, d) => {
      import s.implicits._
      TimeSeries.resampleOhlc(T.events(s, d), "user_id", "ts", "event_id",
          "value", unit = "week")
        .select($"key".as("user_id"), $"period", $"open", $"high",
          $"low", $"close", $"n")
        .orderBy($"user_id", $"period")
    }, Some("""
      SELECT user_id, date_trunc('week', ts) AS period,
             arg_min(value, ts) AS open, max(value) AS high,
             min(value) AS low, arg_max(value, ts) AS close,
             count(*) AS n
      FROM events GROUP BY 1, 2 ORDER BY user_id, period""")),

    // label-centroid cosine matrix: which classes' embeddings overlap —
    // centroids from one posexplode + (label, pos) aggregate, pairwise
    // step over the |labels|^2 metadata-sized frame
    Q("q191_centroid_sim", (s, d) => {
      import s.implicits._
      Similarity.centroidSimilarity(T.embeddings(s, d), "label",
          "embedding")
        .orderBy($"label_a", $"label_b")
    }, Some("""
      WITH c AS (SELECT label, i, avg(embedding[CAST(i AS INT)]::DOUBLE) AS m
                 FROM embeddings,
                      (SELECT unnest(generate_series(1, 64)) AS i) s
                 GROUP BY 1, 2),
      v AS (SELECT label, list(m ORDER BY i) AS c FROM c GROUP BY 1)
      SELECT a.label AS label_a, b.label AS label_b, CAST(64 AS INT) AS dim,
             round(
               list_sum(list_transform(generate_series(1, 64),
                 i -> a.c[i] * b.c[i]))
               / (sqrt(list_sum(list_transform(generate_series(1, 64),
                    i -> a.c[i] * a.c[i])))
                  * sqrt(list_sum(list_transform(generate_series(1, 64),
                      i -> b.c[i] * b.c[i])))), 6) AS cos
      FROM v a JOIN v b ON a.label < b.label
      ORDER BY label_a, label_b""")),

    // time-weighted average value per user: each value weighted by its
    // holding duration (integer microseconds, exact) — the fair summary
    // of an irregular series; one keyed window + one aggregate
    Q("q192_twap", (s, d) => {
      import s.implicits._
      TimeSeries.twapPerKey(T.events(s, d), "user_id", "ts", "value")
        .orderBy($"key")
    }, Some("""
      WITH x AS (SELECT user_id AS key, epoch_us(ts) AS us, value AS v
                 FROM events),
      d AS (SELECT key, v,
                   lead(us) OVER (PARTITION BY key ORDER BY us) - us AS dur
            FROM x)
      SELECT key, count(*) AS n_events,
             CAST(sum(dur) AS DOUBLE) / 1e6 AS span_seconds,
             round(sum(v * dur) / sum(dur), 6) AS twap
      FROM d GROUP BY 1 HAVING count(*) >= 2 ORDER BY key"""))
  )
}
