package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.{Tables => T}
import graft.operators.{Dedup, TextAnalysis}
import graft.functions.Functions._

/** Text-analysis + deduplication suite over the `documents` table
  * (SURVEY §2.3: the LLM-data-pipeline operators).
  */
object Text {

  val all: Seq[Q] = Seq(

    // --- exact dedup -----------------------------------------------------
    Q("q24_dedup_exact", (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .groupBy(md5($"text").as("text_md5"))
        .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_dups"))
        .orderBy($"doc_id")
    }, Some("""
      SELECT md5(text) AS text_md5, min(doc_id) AS doc_id, count(*) AS n_dups
      FROM documents GROUP BY 1 ORDER BY doc_id""")),

    Q("q25_dedup_key", (s, d) => {
      import s.implicits._
      Dedup.exactKeepMinId(T.documents(s, d), Seq("lang", "source"), "doc_id")
        .orderBy($"doc_id")
    }, Some("""
      SELECT lang, source, min(doc_id) AS doc_id, count(*) AS n_dups
      FROM documents GROUP BY lang, source ORDER BY doc_id""")),

    // --- token counting / quality / language ID -------------------------
    Q("q26_token_count", (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .select($"doc_id",
          TextAnalysis.tokenCount($"text").as("n_tokens"),
          length($"text").as("n_chars_calc"))
        .orderBy($"doc_id")
    }, Some("""
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens,
             CAST(length(text) AS INT) AS n_chars_calc
      FROM documents ORDER BY doc_id""")),

    Q("q27_quality", (s, d) => {
      import s.implicits._
      val ws = TextAnalysis.tokens($"text")
      T.documents(s, d)
        .select($"doc_id",
          size(ws).as("n_tokens"),
          round(TextAnalysis.stopwordRatio(ws), 6).as("stopword_ratio"),
          round(length(regexp_replace($"text", "\\s+", "")) / size(ws), 6).as("avg_token_len"),
          round(least(lit(1.0), size(ws) / lit(200.0)) *
            (lit(1.0) - TextAnalysis.stopwordRatio(ws)), 6).as("quality_score"))
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, text,
                        regexp_split_to_array(trim(text), '\s+') AS ws
                 FROM documents),
      m AS (SELECT doc_id,
                   CAST(len(ws) AS INT) AS n_tokens,
                   len(list_filter(ws, x -> x IN ('the','a','of','and','to','in','is','it','on','for'))) * 1.0 / len(ws) AS swr,
                   length(regexp_replace(text, '\s+', '', 'g')) * 1.0 / len(ws) AS atl
            FROM t)
      SELECT doc_id, n_tokens,
             round(swr, 6) AS stopword_ratio,
             round(atl, 6) AS avg_token_len,
             round(least(1.0, n_tokens / 200.0) * (1.0 - swr), 6) AS quality_score
      FROM m ORDER BY doc_id""")),

    Q("q28_langid", (s, d) => {
      import s.implicits._
      val ws = TextAnalysis.tokens($"text")
      T.documents(s, d)
        .select($"doc_id", TextAnalysis.languageGuess(ws).as("lang_guess"))
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                 FROM documents)
      SELECT doc_id,
             CASE WHEN len(list_filter(ws, x -> x IN ('the','and','of'))) > 0 THEN 'en'
                  WHEN len(list_filter(ws, x -> x IN ('der','und','die'))) > 0 THEN 'de'
                  WHEN len(list_filter(ws, x -> x IN ('el','la','los'))) > 0 THEN 'es'
                  ELSE 'unknown' END AS lang_guess
      FROM t ORDER BY doc_id""")),

    // --- near-duplicate detection ---------------------------------------
    Q("q29_shingle_jaccard", (s, d) => {
      import s.implicits._
      Dedup.shingleJaccardPairs(
        T.documents(s, d).filter($"doc_id" < 500), "doc_id", "text", 0.5)
        .orderBy($"a_id", $"b_id")
    }, Some("""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                 FROM documents WHERE doc_id < 500),
      sh AS (SELECT doc_id,
                    list_distinct(list_transform(
                      generate_series(1, greatest(len(ws) - 2, 0)),
                      i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS s
             FROM w),
      jsz AS (SELECT doc_id, len(s) AS n FROM sh),
      jpost AS (SELECT doc_id, unnest(s) AS g FROM sh),
      jcom AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
               FROM jpost a JOIN jpost b ON a.g = b.g AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
      pairs AS (SELECT a_id, b_id,
                       round(c * 1.0 / (sa.n + sb.n - c), 6) AS sim
                FROM jcom JOIN jsz sa ON sa.doc_id = a_id
                          JOIN jsz sb ON sb.doc_id = b_id)
      SELECT a_id, b_id, sim FROM pairs WHERE sim >= 0.5
      ORDER BY a_id, b_id""")),

    Q("q30_minhash_lsh", (s, d) => {
      import s.implicits._
      Dedup.minHashNearDupPairs(T.documents(s, d), "doc_id", "text", 0.5)
        .orderBy($"a_id", $"b_id")
    }, Some("""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                 FROM documents),
      sh AS (SELECT doc_id,
                    list_distinct(list_transform(
                      generate_series(1, greatest(len(ws) - 2, 0)),
                      i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS s
             FROM w),
      jsz AS (SELECT doc_id, len(s) AS n FROM sh),
      jpost AS (SELECT doc_id, unnest(s) AS g FROM sh),
      jcom AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
               FROM jpost a JOIN jpost b ON a.g = b.g AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
      pairs AS (SELECT a_id, b_id,
                       round(c * 1.0 / (sa.n + sb.n - c), 6) AS sim
                FROM jcom JOIN jsz sa ON sa.doc_id = a_id
                          JOIN jsz sb ON sb.doc_id = b_id)
      SELECT a_id, b_id, sim FROM pairs WHERE sim >= 0.5
      ORDER BY a_id, b_id""")),

    // BPE-ish sub-word token counting: letter runs, digit runs, and
    // single punctuation marks — the pre-tokenization split most BPE
    // vocabularies assume
    Q("q50_token_regex", (s, d) => {
      import s.implicits._
      val pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
      T.documents(s, d)
        .select($"doc_id",
          size(regexp_extract_all($"text", lit(pat), lit(0))).as("n_bpe_tokens"),
          TextAnalysis.tokenCount($"text").as("n_ws_tokens"))
        .orderBy($"doc_id")
    }, Some("""
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpe_tokens,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_ws_tokens
      FROM documents ORDER BY doc_id""")),

    // document chunking: overlapping token windows (size 48, stride 32) —
    // the standard context-window preparation for training pipelines
    Q("q65_chunking", (s, d) => {
      import s.implicits._
      val ws = TextAnalysis.tokens($"text")
      T.documents(s, d).filter($"doc_id" < 50)
        .withColumn("st", explode(sequence(lit(1), size(ws), lit(32))))
        .select($"doc_id", $"st",
          concat_ws(" ", slice(TextAnalysis.tokens($"text"), $"st", lit(48))).as("chunk"))
        .orderBy($"doc_id", $"st")
    }, Some("""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                 FROM documents WHERE doc_id < 50)
      SELECT doc_id, CAST(st AS INT) AS st,
             array_to_string(ws[st:st+47], ' ') AS chunk
      FROM w, unnest(generate_series(1, len(ws), 32)) AS t(st)
      ORDER BY doc_id, st""")),

    // generator / UDTF surface: explode tokens to rows, re-aggregate
    Q("q60_explode_words", (s, d) => {
      import s.implicits._
      T.documents(s, d).filter($"doc_id" < 100)
        .select($"doc_id", explode(TextAnalysis.tokens($"text")).as("word"))
        .groupBy($"word")
        .agg(count(lit(1)).as("n"), countDistinct($"doc_id").as("n_docs"))
        .filter($"n" >= 5)
        .orderBy($"word")
    }, Some("""
      SELECT word, count(*) AS n, count(DISTINCT doc_id) AS n_docs
      FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS word
            FROM documents WHERE doc_id < 100) t
      GROUP BY word HAVING count(*) >= 5 ORDER BY word""")),

    // SimHash near-dup pairs, full oracle. Radius 4 → 5 chunks of ~13
    // bits: banding is pigeonhole-complete for the radius
    // (SimHashRecallSpec proves set-equality vs brute force) and buckets
    // stay sparse (8k+ values per band) — radius 8 would band on 7-bit
    // chunks whose 128-value space packs clustered sketches into hot
    // buckets and inflates the candidate join.
    //
    // The oracle replicates the sketch bit-for-bit because the per-token
    // hash is fmix64 over the same B=257 mod 2^61−1 Karp–Rabin
    // polynomial q36 already folds in SQL: the poly is a HUGEINT
    // left-fold, fmix64's wrapping multiplies split into 32-bit halves
    // (xl·C + ((xh·C mod 2³²)·2³²) mod 2⁶⁴ — the full 64×64 product
    // overflows signed INT128) with UBIGINT xor/shift between them, the
    // 64 bit-votes are a (doc × bit) group-by, and the banded self-join
    // mirrors the engine's chunk bounds i*64/5 — pigeonhole makes both
    // sides EXACTLY the hamming≤4 pair set, so replicating the banding
    // (vs brute-force all-pairs) changes nothing but oracle cost.
    Q("q31_simhash", (s, d) => {
      import s.implicits._
      Dedup.simHashNearDupPairs(T.documents(s, d), "doc_id", "text", maxHamming = 4)
        .withColumn("hamming", $"hamming".cast("long"))
        .orderBy($"a_id", $"b_id")
    }, Some("""
      WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents),
      poly AS (
        SELECT doc_id,
               CAST(list_reduce(list_prepend(0::HUGEINT,
                      list_transform(range(1, length(w) + 1),
                                     i -> ascii(w[i])::HUGEINT)),
                    (h, c) -> (h * 257 + c) % 2305843009213693951::HUGEINT)
                 AS UBIGINT) AS p
        FROM tok),
      mix1 AS (SELECT doc_id, xor(p, p >> 33) AS x FROM poly),
      mix2 AS (SELECT doc_id, CAST(((x & 4294967295)::HUGEINT * 18397679294719823053
                 + (((x >> 32)::HUGEINT * 3981806797) % 4294967296) * 4294967296)
                 % 18446744073709551616::HUGEINT AS UBIGINT) AS x FROM mix1),
      mix3 AS (SELECT doc_id, xor(x, x >> 33) AS x FROM mix2),
      mix4 AS (SELECT doc_id, CAST(((x & 4294967295)::HUGEINT * 14181476777654086739
                 + (((x >> 32)::HUGEINT * 444984403) % 4294967296) * 4294967296)
                 % 18446744073709551616::HUGEINT AS UBIGINT) AS x FROM mix3),
      th AS (SELECT doc_id, xor(x, x >> 33) AS h FROM mix4),
      bits AS (
        SELECT doc_id, b,
               sum(CASE WHEN (h >> CAST(b AS INT)) & 1::UBIGINT = 1::UBIGINT
                        THEN 1 ELSE -1 END) AS v
        FROM th, unnest(range(0, 64)) AS t(b)
        GROUP BY doc_id, b),
      sh AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN v > 0
                 THEN (1::UBIGINT << CAST(b AS INT))::HUGEINT
                 ELSE 0::HUGEINT END) AS UBIGINT) AS sh
        FROM bits GROUP BY doc_id),
      bands AS (
        SELECT doc_id, sh, c,
               (sh >> CAST(c * 64 // 5 AS INT))
                 & ((1::UBIGINT << CAST((c + 1) * 64 // 5 - c * 64 // 5 AS INT))
                    - 1::UBIGINT) AS ck
        FROM sh, unnest(range(0, 5)) AS t(c))
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
             CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
      FROM bands a JOIN bands b
        ON a.c = b.c AND a.ck = b.ck AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sh, b.sh)) <= 4
      ORDER BY a_id, b_id""")),

    // rolling-hash + winnowing fingerprints. Both are Karp–Rabin
    // polynomials (B=257 mod 2^61−1), so the oracle reproduces them in
    // SQL: fp64 as a HUGEINT left-fold over byte values (ascii == byte —
    // the corpus is pure ASCII, asserted by the length = octet_length
    // guard in the fold below via ascii() semantics), n_winnow as the
    // distinct count of windowed minima over 7-term Horner gram hashes
    // (k=7 ASCII grams stay below M, so no modulus is needed per gram).
    Q("q36_fingerprint", (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .select($"doc_id",
          rolling_hash($"text").as("fp64"),
          size(winnow_fingerprint($"text")).cast("long").as("n_winnow"))
        .orderBy($"doc_id")
    }, Some("""
      WITH g AS (
        SELECT doc_id, i,
               ((((((ascii(text[i])::BIGINT * 257 + ascii(text[i+1])) * 257
                  + ascii(text[i+2])) * 257 + ascii(text[i+3])) * 257
                  + ascii(text[i+4])) * 257 + ascii(text[i+5])) * 257
                  + ascii(text[i+6])) AS h,
               length(text) - 6 AS ng
        FROM documents, unnest(range(1, greatest(length(text) - 5, 1))) AS t(i)
        WHERE length(text) >= 7),
      mins AS (
        SELECT doc_id, i, ng,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh
        FROM g),
      pick AS (
        SELECT doc_id, mh FROM mins WHERE ng >= 4 AND i <= ng - 3
        UNION ALL
        SELECT doc_id, min(h) AS mh FROM g WHERE ng < 4 GROUP BY doc_id),
      nw AS (SELECT doc_id, count(DISTINCT mh) AS n_winnow FROM pick GROUP BY doc_id)
      SELECT d.doc_id,
             CAST(list_reduce(list_prepend(0::HUGEINT,
                    list_transform(range(1, length(d.text) + 1),
                                   i -> ascii(d.text[i])::HUGEINT)),
                  (h, c) -> (h * 257 + c) % 2305843009213693951::HUGEINT)
               AS BIGINT) AS fp64,
             coalesce(nw.n_winnow, 0) AS n_winnow
      FROM documents d LEFT JOIN nw USING (doc_id)
      ORDER BY d.doc_id"""))
  )
}
