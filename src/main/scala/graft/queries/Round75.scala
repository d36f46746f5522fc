package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Graph, TextAnalysis}
import graft.sources.{Tables => T}

/** Round-8 fifth wave: corpus governance and curation readouts — RAKE
  * keyphrase extraction, a k-anonymity/l-diversity privacy audit,
  * DoReMi-style domain reweighting from held-out LM loss, and the
  * classical link-prediction score suite on the capped wedge machinery.
  */
object Round75 {

  val all: Seq[Q] = Seq(

    // RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    // are maximal stopword-free token runs; word score = deg/freq over
    // phrase co-occurrence; phrase score = sum of member word scores.
    // Phrase ids are a per-doc running stopword count (doc-bounded
    // window); word stats are exact counts; the only float work is the
    // per-phrase bounded score sum, computed once per DISTINCT phrase
    // so no duplicate-occurrence float drift can leak into goldens.
    Q("q388_rake_keyphrases", (s, d) => {
      import s.implicits._
      val toks = T.documents(s, d).filter($"lang" === "en")
        .select($"doc_id", posexplode(TextAnalysis.tokens($"text")))
        .withColumnRenamed("col", "w")
      val pw = toks
        .withColumn("stop", $"w".isin(TextAnalysis.stopwords: _*))
        .withColumn("pid", sum(when($"stop", 1L).otherwise(0L)).over(
          Window.partitionBy($"doc_id").orderBy($"pos")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(!$"stop")
        .select($"doc_id", $"pid", $"pos", $"w")
      val phr = pw.groupBy($"doc_id", $"pid").agg(
        array_join(transform(array_sort(collect_list(struct($"pos", $"w"))),
          x => x("w")), " ").as("phrase"),
        count(lit(1)).as("len"))
      val wst = pw.join(phr.select($"doc_id", $"pid", $"len"),
          Seq("doc_id", "pid"))
        .groupBy($"w").agg(count(lit(1)).as("freq"), sum($"len").as("deg"))
      val dp = phr.groupBy($"phrase").agg(
        count(lit(1)).as("n_occurrences"), max($"len").as("n_words"))
      dp.select($"phrase", $"n_occurrences", $"n_words",
          explode(split($"phrase", " ")).as("w"))
        .join(wst, "w")
        .groupBy($"phrase", $"n_occurrences", $"n_words")
        .agg(round(sum($"deg".cast("double") / $"freq"), 6).as("score"))
        .select($"phrase", $"n_words", $"n_occurrences", $"score")
        .orderBy($"score".desc, $"phrase").limit(25)
    }, Some("""
      WITH wd AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                  FROM documents WHERE lang = 'en'),
      tok AS (SELECT doc_id, u.pos AS pos, u.w AS w
              FROM (SELECT doc_id,
                      unnest(list_transform(generate_series(1, len(ws)),
                        i -> {'pos': i, 'w': ws[i]})) AS u
                    FROM wd) t),
      pidc AS (SELECT doc_id, pos, w,
                 w IN ('the','a','of','and','to','in','is','it','on','for')
                   AS stop,
                 sum(CASE WHEN w IN ('the','a','of','and','to','in','is',
                   'it','on','for') THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS UNBOUNDED PRECEDING) AS pid
               FROM tok),
      pw AS (SELECT doc_id, pid, pos, w FROM pidc WHERE NOT stop),
      phr AS (SELECT doc_id, pid, string_agg(w, ' ' ORDER BY pos) AS phrase,
                count(*) AS len
              FROM pw GROUP BY 1, 2),
      wst AS (SELECT pw.w, count(*) AS freq, sum(len) AS deg
              FROM pw JOIN phr USING (doc_id, pid) GROUP BY 1),
      dp AS (SELECT phrase, count(*) AS n_occurrences, max(len) AS n_words
             FROM phr GROUP BY 1),
      psc AS (SELECT phrase, n_occurrences, n_words,
                round(sum(CAST(deg AS DOUBLE) / freq), 6) AS score
              FROM dp, unnest(string_split(phrase, ' ')) AS u(w)
              JOIN wst USING (w)
              GROUP BY 1, 2, 3)
      SELECT phrase, CAST(n_words AS BIGINT) AS n_words,
             CAST(n_occurrences AS BIGINT) AS n_occurrences, score
      FROM psc ORDER BY score DESC, phrase LIMIT 25""")),

    // k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    // 2007) of the customer table under the (nation, segment)
    // quasi-identifier with a bucketed balance as the sensitive
    // attribute — the privacy gate a training-data release runs before
    // shipping user-derived rows. Pure exact counts: group sizes, the
    // k = 10 exposure fraction, and the minimum sensitive diversity.
    Q("q389_k_anonymity", (s, d) => {
      import s.implicits._
      val qig = T.customer(s, d)
        .select($"c_nationkey", $"c_mktsegment",
          when($"c_acctbal" < 0, "neg").when($"c_acctbal" < 5000, "mid")
            .otherwise("high").as("sens"))
        .groupBy($"c_nationkey", $"c_mktsegment")
        .agg(count(lit(1)).as("n"), countDistinct($"sens").as("l"))
      qig.groupBy($"c_nationkey")
        .agg(sum($"n").as("n_rows"), count(lit(1)).as("n_groups"),
          min($"n").as("min_k"),
          sum(when($"n" < 10, $"n").otherwise(0L)).as("rows_lt10"),
          min($"l").as("min_l"))
        .select($"c_nationkey".cast("long").as("c_nationkey"),
          $"n_rows", $"n_groups", $"min_k",
          round($"rows_lt10".cast("double") / $"n_rows".cast("double"), 6)
            .as("frac_below_k10"),
          $"min_l")
        .orderBy($"c_nationkey")
    }, Some("""
      WITH qig AS (SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
              c_mktsegment, count(*) AS n,
              count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END) AS l
            FROM customer GROUP BY 1, 2)
      SELECT c_nationkey, CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(min(n) AS BIGINT) AS min_k,
             round(CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS DOUBLE)
               / CAST(sum(n) AS DOUBLE), 6) AS frac_below_k10,
             CAST(min(l) AS BIGINT) AS min_l
      FROM qig GROUP BY 1 ORDER BY c_nationkey""")),

    // DoReMi-style domain reweighting (Xie et al. 2023, one exponential
    // update): per-source held-out bigram-LM loss (the q185 train/test
    // split and add-alpha floor) becomes an excess-loss signal, and the
    // mixture weight is a softmax over exp(eta * loss) — sources the
    // current model explains worst get upweighted. The ≤|sources|
    // softmax denominator accumulates through an ordered cumsum;
    // everything else is the one held-out scoring pass.
    Q("q390_doremi_weights", (s, d) => {
      import s.implicits._
      val docs = T.documents(s, d)
      val train = docs.filter($"doc_id" % 5 =!= 0)
      val test = docs.filter($"doc_id" % 5 === 0)
      val scored = TextAnalysis.bigramLogProbHeldOut(train, test,
          "doc_id", "text", alpha = 0.5)
        .join(docs.select($"doc_id".as("id"), $"source"), "id")
      // avg_logp arrives rounded to 6 dp, so n_bigrams·avg_logp·10⁶ is
      // an exact integer (up to fp noise round() snaps away): the
      // data-sized reduction sums exact longs — order-independent under
      // any partitioning — and only the per-source scalar math is float
      val perSource = scored.groupBy($"source").agg(
        count(lit(1)).as("n_docs"),
        sum($"n_bigrams").as("nb"),
        sum(round($"n_bigrams" * $"avg_logp" * lit(1000000.0))
          .cast("long")).as("slp6"))
        .withColumn("mean_logp",
          $"slp6".cast("double") / lit(1000000.0) / $"nb".cast("double"))
        .withColumn("term", exp(lit(0.1) * -$"mean_logp"))
      val wCum = Window.orderBy($"source")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perSource
        .withColumn("cum", sum($"term").over(wCum))
        .withColumn("denom", max($"cum").over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .select($"source", $"n_docs", round($"mean_logp", 6).as("mean_logp"),
          round($"term" / $"denom", 6).as("weight"))
        .orderBy($"source")
    }, Some("""
      WITH tr AS (SELECT regexp_split_to_array(trim(text), '\s+') AS ws
                  FROM documents WHERE doc_id % 5 != 0),
      te AS (SELECT doc_id, source,
               regexp_split_to_array(trim(text), '\s+') AS ws
             FROM documents WHERE doc_id % 5 = 0),
      bi_tr AS (SELECT unnest(ws[1:len(ws)-1]) AS a,
                       unnest(ws[2:len(ws)]) AS b
                FROM tr WHERE len(ws) >= 2),
      c2 AS (SELECT a, b, count(*) AS c2 FROM bi_tr GROUP BY a, b),
      c1 AS (SELECT a, sum(c2) AS c1 FROM c2 GROUP BY a),
      v AS (SELECT count(DISTINCT w) AS v
            FROM (SELECT unnest(ws) AS w FROM tr) t),
      bi AS (SELECT doc_id, source, unnest(ws[1:len(ws)-1]) AS a,
                    unnest(ws[2:len(ws)]) AS b
             FROM te WHERE len(ws) >= 2),
      sc AS (SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(ln((coalesce(c2.c2, 0) + 0.5)
                 / (coalesce(c1.c1, 0) + 0.5 * v.v))), 6) AS avg_logp
             FROM bi LEFT JOIN c2 USING (a, b) LEFT JOIN c1 USING (a)
             CROSS JOIN v
             GROUP BY doc_id, source),
      ps AS (SELECT source, count(*) AS n_docs, sum(n_bigrams) AS nb,
               sum(CAST(round(n_bigrams * avg_logp * 1000000) AS BIGINT))
                 AS slp6
             FROM sc GROUP BY source),
      tm AS (SELECT source, n_docs,
               CAST(slp6 AS DOUBLE) / 1000000.0 / CAST(nb AS DOUBLE)
                 AS mean_logp,
               exp(0.1 * -(CAST(slp6 AS DOUBLE) / 1000000.0
                 / CAST(nb AS DOUBLE))) AS term
             FROM ps),
      cm AS (SELECT source, n_docs, mean_logp, term,
               sum(term) OVER (ORDER BY source
                 ROWS UNBOUNDED PRECEDING) AS cum
             FROM tm)
      SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
             round(mean_logp, 6) AS mean_logp,
             round(term / max(cum) OVER (), 6) AS weight
      FROM cm ORDER BY source""")),

    // The classical link-prediction score suite on the trade graph —
    // resource allocation, Jaccard, preferential attachment, and the
    // capped common-neighbor count from the SAME wedge pass as q188's
    // Adamic-Adar (edge markers ride the wedge shuffle; endpoint
    // degrees join the already-aggregated pair set). See
    // Graph.linkPredictionScores
    Q("q391_link_prediction", (s, d) => {
      import s.implicits._
      val edges = T.orders(s, d)
        .join(T.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .select(($"o_custkey" * 2).as("src"),
          ($"l_suppkey" * 2 + 1).as("dst"))
      // exact integer decode: u div 2 maps both parities to their key
      // (2k -> k, 2k+1 -> k); float `/` + cast truncates 2k to k-1 while
      // DuckDB's CAST rounds — the engines would diverge on even ids
      Graph.linkPredictionScores(edges, "src", "dst", maxHubDegree = 100)
        .select(expr("u div 2").as("s1"),
          expr("v div 2").as("s2"),
          $"common_neighbors", $"ra", $"jaccard", $"pa")
        .orderBy($"ra".desc, $"s1", $"s2").limit(25)
    }, Some("""
      WITH canon AS (SELECT DISTINCT
                       least(o_custkey * 2, l_suppkey * 2 + 1) AS a,
                       greatest(o_custkey * 2, l_suppkey * 2 + 1) AS b
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      adj AS (SELECT a AS w, b AS n FROM canon
              UNION ALL SELECT b, a FROM canon),
      deg AS (SELECT w, count(*) AS deg FROM adj GROUP BY 1),
      ctr AS (SELECT adj.w, adj.n, deg.deg FROM adj JOIN deg USING (w)
              WHERE deg BETWEEN 2 AND 100),
      scored AS (SELECT x.n AS u, y.n AS v, count(*) AS common_neighbors,
                        round(sum(1.0 / x.deg), 6) AS ra
                 FROM ctr x JOIN ctr y ON x.w = y.w AND x.n < y.n
                 GROUP BY 1, 2),
      nk AS (SELECT u, v, common_neighbors, ra FROM scored
             WHERE NOT EXISTS (SELECT 1 FROM canon
                               WHERE canon.a = scored.u
                                 AND canon.b = scored.v))
      SELECT CAST(u // 2 AS BIGINT) AS s1,
             CAST(v // 2 AS BIGINT) AS s2, common_neighbors, ra,
             round(CAST(common_neighbors AS DOUBLE)
               / (du.deg + dv.deg - common_neighbors), 6) AS jaccard,
             CAST(du.deg * dv.deg AS BIGINT) AS pa
      FROM nk JOIN deg du ON du.w = nk.u JOIN deg dv ON dv.w = nk.v
      ORDER BY ra DESC, s1, s2 LIMIT 25"""))
  )
}
