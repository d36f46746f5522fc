package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Hypothesis, Mixing, Retrieval, TextAnalysis}
import graft.sources.{Tables => T}

/** Round-8 third wave: LM-grade text scoring and leakage-free model
  * selection — interpolated Kneser–Ney bigram quality, DSIR hashed
  * importance weighting, the Ansari–Bradley scale test on the grouped
  * prefix-sum machinery, a closed-form ridge regularization path,
  * hash-fold cross-validation from one moment scan, and
  * query-likelihood Dirichlet retrieval beside q162's BM25. House
  * determinism rules throughout: exact integer/decimal moments for
  * every data-sized reduction; floats only in per-doc/per-query bounded
  * sums and final scalar formulas, rounded once; hash-safe finals.
  */
object Round73 {

  val all: Seq[Q] = Seq(

    // Interpolated Kneser-Ney bigram LM quality per doc: the absolute-
    // discount smoothing (D = 3/4, exact in binary) that backs off to
    // the CONTINUATION distribution - distinct-left-context counts, not
    // raw unigram frequency. Count tables are bigram-type-sized; the
    // corpus is scanned once; per-doc mean ln P is the only float sum
    // (the q115 precedent). See TextAnalysis.kneserNeyLogProb
    Q("q376_kneser_ney", (s, d) => {
      import s.implicits._
      TextAnalysis.kneserNeyLogProb(T.documents(s, d), "doc_id", "text")
        .select($"id".as("doc_id"), $"n_bigrams", $"avg_logp")
        .orderBy($"doc_id")
    }, Some("""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                 FROM documents),
      bi AS (SELECT doc_id, unnest(ws[1:len(ws)-1]) AS a, unnest(ws[2:len(ws)]) AS b
             FROM w WHERE len(ws) >= 2),
      c2 AS (SELECT a, b, count(*) AS c2 FROM bi GROUP BY a, b),
      c1 AS (SELECT a, sum(c2) AS c1, count(*) AS n1f FROM c2 GROUP BY a),
      cont AS (SELECT b, count(*) AS n1r FROM c2 GROUP BY b),
      tt AS (SELECT count(*) AS tt FROM c2)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             round(avg(ln((c2.c2 - 0.75) / c1.c1
               + (0.75 * c1.n1f / c1.c1)
                 * (CAST(cont.n1r AS DOUBLE) / tt.tt))), 6) AS avg_logp
      FROM bi JOIN c2 USING (a, b) JOIN c1 USING (a) JOIN cont USING (b)
      CROSS JOIN tt
      GROUP BY doc_id ORDER BY doc_id""")),

    // DSIR importance weights: log-likelihood ratio of the English
    // slice's hashed-unigram distribution vs the whole corpus, add-1/2
    // smoothed over 1024 buckets. The feature hash is engine-replayable
    // integer arithmetic evaluated once per DISTINCT term (vocab-sized);
    // the corpus explodes once; per-doc log-ratio sums are doc-bounded.
    // See Mixing.importanceWeights
    Q("q377_dsir_importance", (s, d) => {
      import s.implicits._
      Mixing.importanceWeights(T.documents(s, d), "doc_id", "text",
          col("lang") === "en")
        .orderBy($"doc_id")
    }, Some("""
      WITH tok AS (SELECT doc_id, lang = 'en' AS tgt,
              unnest(regexp_split_to_array(trim(text), '\s+')) AS term
            FROM documents),
      vh AS (SELECT term,
               list_reduce(list_prepend(0::BIGINT,
                   list_transform(generate_series(1, length(term)),
                     i -> ascii(substr(term, i, 1))::BIGINT)),
                 (a, x) -> (a * 31 + x) % 2147483648)
                 * 1000003 % 2147483648 % 1024 AS b
             FROM (SELECT DISTINCT term FROM tok) t),
      h AS (SELECT doc_id, tgt, b FROM tok JOIN vh USING (term)),
      bs AS (SELECT b, count(*) AS cr,
               sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct
             FROM h GROUP BY b),
      tt AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM bs),
      perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   round(sum(ln((ct + 0.5) / (nt + 512.0))
                     - ln((cr + 0.5) / (nr + 512.0))), 6) AS log_w
                 FROM h JOIN bs USING (b) CROSS JOIN tt
                 GROUP BY doc_id)
      SELECT doc_id, n_tokens, log_w, log_w > 0 AS keep
      FROM perdoc ORDER BY doc_id""")),

    // Ansari-Bradley scale test per ISO week: are click and view
    // event values equally dispersed? Pooled from-both-ends scores off
    // the grouped prefix-sum spine (never a data-sized sort through a
    // week-cardinality window); doubled scores keep Sigma t*s2 /
    // Sigma t*s2^2 exact to one final double formula. See
    // Hypothesis.ansariBradley
    Q("q378_ansari_bradley", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .filter($"event_type".isin("click", "view"))
        .select(date_trunc("week", $"ts").cast("date").as("week"),
          $"event_type", $"value")
      Hypothesis.ansariBradley(ev, "week", "event_type", "value")
        .orderBy($"week")
    }, Some("""
      WITH p AS (SELECT date_trunc('week', ts)::DATE AS week,
              event_type AS treat, value AS x
            FROM events
            WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
      r AS (SELECT week, treat, x,
              2 * rank() OVER (PARTITION BY week ORDER BY x)
                + count(*) OVER (PARTITION BY week, x) - 1 AS rank2,
              count(*) OVER (PARTITION BY week) AS n
            FROM p),
      sc AS (SELECT week, treat,
               least(rank2, 2 * (n + 1) - rank2) AS s2
             FROM r),
      pool AS (SELECT week, sum(s2) AS su,
                 sum(CAST(s2 AS HUGEINT) * s2) AS su2
               FROM sc GROUP BY week),
      pt AS (SELECT week, treat, count(*) AS nj, sum(s2) AS ab2
             FROM sc GROUP BY week, treat),
      f AS (SELECT week, count(*) AS k, min(treat) AS treatment,
              min_by(nj, treat) AS n1, max_by(nj, treat) AS n2,
              min_by(ab2, treat) AS ab2
            FROM pt GROUP BY week)
      SELECT week, treatment, CAST(n1 AS BIGINT) AS n1,
             CAST(n2 AS BIGINT) AS n2,
             round(CAST(ab2 AS DOUBLE) / 2.0, 6) AS ab_stat,
             round((CAST(ab2 AS DOUBLE) / 2.0
                 - CAST(n1 AS DOUBLE) * (CAST(su AS DOUBLE) / 2.0)
                   / CAST(n1 + n2 AS DOUBLE))
               / sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                   / (CAST(n1 + n2 AS DOUBLE) - 1.0))
                 * ((CAST(n1 + n2 AS DOUBLE) * (CAST(su2 AS DOUBLE) / 4.0)
                     - (CAST(su AS DOUBLE) / 2.0) * (CAST(su AS DOUBLE) / 2.0))
                   / (CAST(n1 + n2 AS DOUBLE)
                     * CAST(n1 + n2 AS DOUBLE)))), 6) AS z
      FROM f JOIN pool USING (week) WHERE k = 2 ORDER BY week""")),

    // Ridge regularization path in closed form: standardized 2-predictor
    // ridge (quantity, discount -> extendedprice) needs only the 2x2
    // correlation structure, so the WHOLE path is one exact-moment scan
    // (integer units / hundredths / cents, products summed as
    // DECIMAL(38,0)) crossed with a broadcast lambda grid - adding grid
    // points is free at 100 TB. Explicit products, no pow.
    Q("q379_ridge_path", (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d).select(
        expr("CAST(l_quantity AS BIGINT)").as("x1"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("x2"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("y"))
      val m = li.agg(count(lit(1)).as("n"),
        sum($"x1").as("s1"), sum($"x2").as("s2"), sum($"y").as("sy"),
        sum(($"x1" * $"x1").cast("decimal(38,0)")).as("s11"),
        sum(($"x2" * $"x2").cast("decimal(38,0)")).as("s22"),
        sum(($"x1" * $"x2").cast("decimal(38,0)")).as("s12"),
        sum(($"x1" * $"y").cast("decimal(38,0)")).as("s1y"),
        sum(($"x2" * $"y").cast("decimal(38,0)")).as("s2y"),
        sum(($"y" * $"y").cast("decimal(38,0)")).as("syy"))
      val nD = $"n".cast("double")
      def dd(c: String) = col(c).cast("double")
      val d1 = nD * dd("s11") - dd("s1") * dd("s1")
      val d2 = nD * dd("s22") - dd("s2") * dd("s2")
      val dy = nD * dd("syy") - dd("sy") * dd("sy")
      val r12 = (nD * dd("s12") - dd("s1") * dd("s2")) /
        (sqrt(d1) * sqrt(d2))
      val r1y = (nD * dd("s1y") - dd("s1") * dd("sy")) /
        (sqrt(d1) * sqrt(dy))
      val r2y = (nD * dd("s2y") - dd("s2") * dd("sy")) /
        (sqrt(d2) * sqrt(dy))
      val grid = Seq(0.0, 0.1, 1.0, 10.0, 100.0).toDF("lambda")
      val det = (lit(1.0) + $"lambda") * (lit(1.0) + $"lambda") - $"r12" * $"r12"
      m.select(round(r12, 6).as("r12"), round(r1y, 6).as("r1y"),
          round(r2y, 6).as("r2y"))
        .crossJoin(broadcast(grid))
        .select($"lambda",
          round(((lit(1.0) + $"lambda") * $"r1y" - $"r12" * $"r2y") / det, 6)
            .as("beta_qty"),
          round(((lit(1.0) + $"lambda") * $"r2y" - $"r12" * $"r1y") / det, 6)
            .as("beta_disc"))
        .orderBy($"lambda")
    }, Some("""
      WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS x1,
              CAST(round(l_discount * 100) AS BIGINT) AS x2,
              CAST(round(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem),
      m AS (SELECT count(*) AS n, sum(x1) AS s1, sum(x2) AS s2,
              sum(y) AS sy,
              sum(CAST(x1 * x1 AS HUGEINT)) AS s11,
              sum(CAST(x2 * x2 AS HUGEINT)) AS s22,
              sum(CAST(x1 * x2 AS HUGEINT)) AS s12,
              sum(CAST(x1 * y AS HUGEINT)) AS s1y,
              sum(CAST(x2 * y AS HUGEINT)) AS s2y,
              sum(CAST(y * y AS HUGEINT)) AS syy
            FROM li),
      r AS (SELECT
              round((CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
                  - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE))
                / (sqrt(CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
                    - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))), 6) AS r12,
              round((CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE)
                  - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE))
                / (sqrt(CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r1y,
              round((CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE)
                  - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE))
                / (sqrt(CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
                    - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2y
            FROM m)
      SELECT lambda,
             round(((1.0 + lambda) * r1y - r12 * r2y)
               / ((1.0 + lambda) * (1.0 + lambda) - r12 * r12), 6)
               AS beta_qty,
             round(((1.0 + lambda) * r2y - r12 * r1y)
               / ((1.0 + lambda) * (1.0 + lambda) - r12 * r12), 6)
               AS beta_disc
      FROM r CROSS JOIN (VALUES (0.0e0), (0.1e0), (1.0e0), (10.0e0),
        (100.0e0)) v(lambda)
      ORDER BY lambda""")),

    // 5-fold cross-validated regression from ONE moment scan: folds are
    // the house Knuth hash of l_orderkey (entity-level - all lines of
    // an order share a fold, the leakage control), per-fold exact
    // moments subtract from the totals to give each fold's
    // train-on-the-rest OLS fit, and the held-out RMSE expands
    // algebraically from the fold's own moments - no second data pass,
    // no per-fold job. Adding folds is free at 100 TB.
    Q("q380_cv_folds", (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d).select(
        expr("CAST(l_orderkey % 2147483648 * 2654435761 % 2147483648 % 5 AS BIGINT)")
          .as("fold"),
        expr("CAST(l_quantity AS BIGINT)").as("x"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("y"))
      val perFold = li.groupBy($"fold").agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum(($"x" * $"x").cast("decimal(38,0)")).as("sxx"),
        sum(($"x" * $"y").cast("decimal(38,0)")).as("sxy"),
        sum(($"y" * $"y").cast("decimal(38,0)")).as("syy"))
      val tot = perFold.agg(sum($"n").as("tn"), sum($"sx").as("tsx"),
        sum($"sy").as("tsy"), sum($"sxx").as("tsxx"),
        sum($"sxy").as("tsxy"))
      def dd(c: String) = col(c).cast("double")
      val ntD = (col("tn") - col("n")).cast("double")
      val stx = (col("tsx") - col("sx")).cast("double")
      val sty = (col("tsy") - col("sy")).cast("double")
      val stxx = (col("tsxx") - col("sxx")).cast("double")
      val stxy = (col("tsxy") - col("sxy")).cast("double")
      val b = (ntD * stxy - stx * sty) / (ntD * stxx - stx * stx)
      val a = (sty - b * stx) / ntD
      val sse = dd("syy") - lit(2.0) * a * dd("sy") - lit(2.0) * b * dd("sxy") +
        lit(2.0) * a * b * dd("sx") + a * a * dd("n") + b * b * dd("sxx")
      perFold.crossJoin(broadcast(tot))
        .select($"fold", $"n".as("n_test"),
          round(b / 100.0, 6).as("slope"),
          round(a / 100.0, 6).as("intercept"),
          round(sqrt(sse / dd("n")) / 100.0, 6).as("test_rmse"))
        .orderBy($"fold")
    }, Some("""
      WITH li AS (SELECT
              CAST(l_orderkey % 2147483648 * 2654435761 % 2147483648 % 5
                AS BIGINT) AS fold,
              CAST(l_quantity AS BIGINT) AS x,
              CAST(round(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem),
      f AS (SELECT fold, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
              sum(CAST(x * x AS HUGEINT)) AS sxx,
              sum(CAST(x * y AS HUGEINT)) AS sxy,
              sum(CAST(y * y AS HUGEINT)) AS syy
            FROM li GROUP BY fold),
      t AS (SELECT sum(n) AS tn, sum(sx) AS tsx, sum(sy) AS tsy,
              sum(sxx) AS tsxx, sum(sxy) AS tsxy
            FROM f),
      kb AS (SELECT fold, n, sx, sy, sxx, sxy, syy,
               CAST(tn - n AS DOUBLE) AS ntd,
               CAST(tsx - sx AS DOUBLE) AS stx,
               CAST(tsy - sy AS DOUBLE) AS sty,
               CAST(tsxx - sxx AS DOUBLE) AS stxx,
               CAST(tsxy - sxy AS DOUBLE) AS stxy
             FROM f CROSS JOIN t),
      ab AS (SELECT fold, n, sx, sy, sxx, sxy, syy,
               (ntd * stxy - stx * sty) / (ntd * stxx - stx * stx) AS b,
               (sty - (ntd * stxy - stx * sty) / (ntd * stxx - stx * stx)
                 * stx) / ntd AS a
             FROM kb)
      SELECT fold, CAST(n AS BIGINT) AS n_test,
             round(b / 100.0, 6) AS slope,
             round(a / 100.0, 6) AS intercept,
             round(sqrt((CAST(syy AS DOUBLE) - 2.0 * a * CAST(sy AS DOUBLE)
                 - 2.0 * b * CAST(sxy AS DOUBLE)
                 + 2.0 * a * b * CAST(sx AS DOUBLE)
                 + a * a * CAST(n AS DOUBLE)
                 + b * b * CAST(sxx AS DOUBLE))
               / CAST(n AS DOUBLE)) / 100.0, 6) AS test_rmse
      FROM ab ORDER BY fold""")),

    // Query-likelihood retrieval with Dirichlet smoothing (mu = 200)
    // for q162's three bag-of-terms queries - the language-modeling
    // scorer beside BM25's probabilistic one, in the same inverted-
    // index join shape (sparse matching-terms sum + one per-doc length
    // term). See Retrieval.queryLikelihoodDirichlet
    Q("q381_ql_dirichlet", (s, d) => {
      import s.implicits._
      val queries = Seq((1L, "hash"), (1L, "join"), (2L, "stream"),
        (2L, "window"), (2L, "batch"), (3L, "vector"), (3L, "query"))
        .toDF("qid", "term")
      Retrieval.queryLikelihoodDirichlet(T.documents(s, d), "doc_id",
          "text", queries, "qid", "term")
        .orderBy($"qid", $"doc_id")
    }, Some("""
      WITH q(qid, term) AS (VALUES (1, 'hash'), (1, 'join'),
        (2, 'stream'), (2, 'window'), (2, 'batch'),
        (3, 'vector'), (3, 'query')),
      tok AS (SELECT doc_id,
                unnest(regexp_split_to_array(trim(text), '\s+')) AS term
              FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      cf AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY 1),
      cc AS (SELECT CAST(sum(tf) AS DOUBLE) AS cc FROM tf),
      dl AS (SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+'))
                 AS DOUBLE) AS dl
             FROM documents),
      nq AS (SELECT qid, count(DISTINCT term) AS nq FROM q GROUP BY 1),
      m AS (SELECT qid, doc_id, count(*) AS n_match,
              sum(ln(1.0 + CAST(tf AS DOUBLE) * cc / (200.0 * cf))) AS s1
            FROM tf JOIN q USING (term) JOIN cf USING (term) CROSS JOIN cc
            GROUP BY 1, 2)
      SELECT CAST(qid AS BIGINT) AS qid, doc_id,
             CAST(n_match AS BIGINT) AS n_match,
             round(s1 + nq * ln(200.0 / (dl + 200.0)), 6) AS ql_score
      FROM m JOIN dl USING (doc_id) JOIN nq USING (qid)
      ORDER BY qid, doc_id"""))
  )
}
