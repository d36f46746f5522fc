package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.{Tables => T}

/** Round-6 forty-first wave: audio-stub energy windows, growth
  * accounting.
  */
object Round49 {

  val all: Seq[Q] = Seq(

    // audio-shaped multimodal pass: the stub payload read as PCM (char
    // codes as samples), cut into 50-sample windows with Σcode² energy
    // — silence detection plus the LONGEST silent run via
    // gaps-and-islands over window indices; everything integer-exact,
    // windows explode map-side (cost ∝ samples), islands stay doc-keyed
    Q("q298_audio_energy", (s, d) => {
      import s.implicits._
      val chars = T.documents(s, d)
        .select($"doc_id",
          transform(split($"text", ""), c => ascii(c)).as("__cs"))
        .withColumn("__nw", expr("size(__cs) div 50"))
        .filter($"__nw" > 0)
      val wins = chars
        .withColumn("w", explode(sequence(lit(0L), $"__nw" - 1)))
        .select($"doc_id", $"w",
          aggregate(expr("slice(__cs, cast(w * 50 + 1 as int), 50)"),
            lit(0L), (acc, x) =>
              acc + x.cast("long") * x.cast("long")).as("e"))
        .withColumn("silent", $"e" < 450000L)
      val isl = wins.filter($"silent")
        .withColumn("__grp", $"w" - row_number().over(
          Window.partitionBy($"doc_id").orderBy($"w")))
        .groupBy($"doc_id", $"__grp").agg(count(lit(1)).as("__run"))
        .groupBy($"doc_id").agg(max($"__run").as("longest_silent"))
      wins.groupBy($"doc_id")
        .agg(count(lit(1)).as("n_windows"),
          sum(when($"silent", 1L).otherwise(0L)).as("n_silent"))
        .join(isl, Seq("doc_id"), "left")
        .select($"doc_id", $"n_windows", $"n_silent",
          coalesce($"longest_silent", lit(0L)).as("longest_silent"))
        .orderBy($"doc_id")
    }, Some("""
      WITH cs AS (SELECT doc_id,
                    list_transform(regexp_split_to_array(text, ''),
                      c -> ascii(c)) AS codes
                  FROM documents),
      nw AS (SELECT doc_id, codes, len(codes) // 50 AS n
             FROM cs WHERE len(codes) // 50 > 0),
      wins AS (SELECT doc_id, w,
                 CAST(list_sum(list_transform(
                   list_slice(codes, w * 50 + 1, w * 50 + 50),
                   x -> x * x)) AS BIGINT) AS e
               FROM (SELECT doc_id, codes,
                       unnest(range(0, n)) AS w
                     FROM nw)),
      sil AS (SELECT doc_id, w, e < 450000 AS silent FROM wins),
      grp AS (SELECT doc_id,
                w - row_number() OVER (PARTITION BY doc_id ORDER BY w)
                  AS g
              FROM sil WHERE silent),
      runs AS (SELECT doc_id, g, count(*) AS run
               FROM grp GROUP BY 1, 2),
      isl AS (SELECT doc_id, max(run) AS longest_silent
              FROM runs GROUP BY 1),
      agg AS (SELECT doc_id, count(*) AS n_windows,
                CAST(sum(CASE WHEN silent THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_silent
              FROM sil GROUP BY 1)
      SELECT agg.doc_id, n_windows, n_silent,
             coalesce(longest_silent, 0) AS longest_silent
      FROM agg LEFT JOIN isl ON agg.doc_id = isl.doc_id
      ORDER BY agg.doc_id""")),

    // the growth-accounting board slide: per day, users split into
    // new / retained (active yesterday) / resurrected (active before,
    // not yesterday), plus churned = yesterday's actives who went dark
    // — one user-keyed lag window + one day-keyed tally, integer-exact
    Q("q299_growth_accounting", (s, d) => {
      import s.implicits._
      val act = T.events(s, d)
        .select($"user_id", to_date($"ts").as("day")).distinct()
      val w = Window.partitionBy($"user_id").orderBy($"day")
      val tagged = act
        .withColumn("__prev", lag($"day", 1).over(w))
        .withColumn("state",
          when($"__prev".isNull, "new")
            .when(datediff($"day", $"__prev") === 1, "retained")
            .otherwise("resurrected"))
      val daily = tagged.groupBy($"day")
        .agg(sum(when($"state" === "new", 1L).otherwise(0L)).as("n_new"),
          sum(when($"state" === "retained", 1L).otherwise(0L))
            .as("n_retained"),
          sum(when($"state" === "resurrected", 1L).otherwise(0L))
            .as("n_resurrected"),
          count(lit(1)).as("n_active"))
      daily
        .withColumn("__prev_active",
          lag($"n_active", 1).over(Window.orderBy($"day")))
        .withColumn("__prev_day", lag($"day", 1).over(Window.orderBy($"day")))
        .select($"day", $"n_new", $"n_retained", $"n_resurrected",
          $"n_active",
          when($"__prev_day".isNotNull &&
              datediff($"day", $"__prev_day") === 1,
            $"__prev_active" - $"n_retained").otherwise(
            coalesce($"__prev_active", lit(0L))).as("n_churned"))
        .orderBy($"day")
    }, Some("""
      WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                   FROM events),
      tagged AS (SELECT user_id, day,
                   lag(day) OVER (PARTITION BY user_id ORDER BY day)
                     AS prev
                 FROM act),
      st AS (SELECT day,
               CASE WHEN prev IS NULL THEN 'new'
                    WHEN date_diff('day', prev, day) = 1 THEN 'retained'
                    ELSE 'resurrected' END AS state
             FROM tagged),
      daily AS (SELECT day,
                  CAST(sum(CASE WHEN state = 'new' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new,
                  CAST(sum(CASE WHEN state = 'retained' THEN 1 ELSE 0
                    END) AS BIGINT) AS n_retained,
                  CAST(sum(CASE WHEN state = 'resurrected' THEN 1
                    ELSE 0 END) AS BIGINT) AS n_resurrected,
                  count(*) AS n_active
                FROM st GROUP BY 1)
      SELECT day, n_new, n_retained, n_resurrected, n_active,
             CASE WHEN lag(day) OVER (ORDER BY day) IS NOT NULL
                   AND date_diff('day', lag(day) OVER (ORDER BY day),
                         day) = 1
                  THEN lag(n_active) OVER (ORDER BY day) - n_retained
                  ELSE coalesce(lag(n_active) OVER (ORDER BY day), 0)
             END AS n_churned
      FROM daily ORDER BY day"""))
  )
}
