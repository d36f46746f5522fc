package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the document pipeline (SURVEY §2.3).
  *
  * Everything here is pure `org.apache.spark.sql.functions` composition —
  * codegen-friendly, no UDFs — so Catalyst can push filters around it and
  * the operators scale linearly with the corpus.
  */
object TextAnalysis {

  /** Function words used for stopword-ratio and language-ID heuristics. */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")

  /** Whitespace tokenization (trimmed so leading/trailing blanks don't
    * produce empty tokens). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word n-gram shingles: contiguous n-word windows joined by single
    * spaces; empty when the document has fewer than n words.
    *
    * PERF: pass a BOUND COLUMN, not a raw `tokens(...)` expression —
    * higher-order functions evaluate interpreted, and the window lambda
    * references `words` n+1 times per element, so an unbound split()
    * re-tokenizes the document on every access (~10× slowdown, see
    * q123). For the distinct-set form use [[shingleSet]] (native). */
  def wordShingles(words: Column, n: Int): Column = {
    val gram = (i: Column) =>
      concat_ws(" ", (0 until n).map(j => element_at(words, i + lit(j))): _*)
    when(size(words) >= n,
      transform(sequence(lit(1), size(words) - lit(n - 1)), gram))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct word n-gram shingle set of a raw text column.
    * Uses the native [[graft.functions.WordShingles]] expression: the
    * composed HOF form re-tokenizes inside every lambda invocation. */
  def shingleSet(text: Column, n: Int = 3): Column =
    graft.functions.Functions.word_shingles(text, n)

  /** |A ∩ B| / |A ∪ B| over two array columns (set semantics). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)) / size(array_union(a, b))

  /** Fraction of tokens that are function words. */
  def stopwordRatio(words: Column): Column =
    size(filter(words, w => w.isin(stopwords: _*))) / size(words)

  /** Heuristic language ID from function-word hits; mirrors the classic
    * profile approach with a tiny profile set so the logic is portable
    * to the SQL oracle verbatim. */
  def languageGuess(words: Column): Column = {
    def has(ws: String*) = size(filter(words, w => w.isin(ws: _*))) > 0
    when(has("the", "and", "of"), "en")
      .when(has("der", "und", "die"), "de")
      .when(has("el", "la", "los"), "es")
      .otherwise("unknown")
  }

  /** PII patterns for the scrubbing pass. Kept to character classes +
    * bounded repetition so Java regex (Spark) and RE2 (most other
    * engines) agree on every match. */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern: String = "[0-9]{2,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Occurrences of a PII pattern in the text (regexp_extract_all is
    * codegen'd; counting before redaction gives the audit trail). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Redact emails and phone numbers with typed placeholders — the
    * map-side scrub every shared-corpus release runs. regexp_replace
    * replaces ALL occurrences. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  /** Gopher-style rule-based quality gate (Rae et al. 2021 §A1.1: the
    * published composite of word-count bounds, mean-word-length bounds,
    * a stopword-presence floor, and a repetition ceiling) — the cheap
    * rule filter a pipeline runs BEFORE any model-based scoring. Emits
    * the per-document signals plus the composite `keep` decision
    * (1/0), so a threshold sweep reads the signals without recomputing.
    *
    * `top_word_frac` (the most frequent word's share) is computed with
    * array HOFs over the doc's own tokens — O(distinct·n) per document
    * but entirely map-side, so the whole gate is ONE corpus scan with
    * ZERO shuffles at any scale (an exploded groupBy would shuffle
    * corpus-sized token rows to compute the same number). The quadratic
    * term is bounded by document length; route pathological mega-docs
    * through chunking (q65) first. `keep` compares the same 6-place-
    * rounded signals the output carries, so the decision is engine-
    * reproducible. */
  def gopherQuality(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minWords: Int = 5, maxWords: Int = 1000,
      minMeanLen: Double = 2.0, maxMeanLen: Double = 12.0,
      minStopHits: Int = 2, maxTopWordFrac: Double = 0.2): org.apache.spark.sql.DataFrame = {
    val n = size(col("__ws"))
    docs.select(col(idCol).as("id"), tokens(col(textCol)).as("__ws"))
      .select(col("id"), n.as("n_words"),
        round(aggregate(col("__ws"), lit(0L), (a, w) => a + length(w))
          .cast("double") / n, 6).as("mean_word_len"),
        size(array_intersect(col("__ws"), typedLit(stopwords))).as("stop_hits"),
        round(array_max(transform(array_distinct(col("__ws")),
          w => size(filter(col("__ws"), x => x === w))))
          .cast("double") / n, 6).as("top_word_frac"))
      .withColumn("keep",
        (col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(minMeanLen, maxMeanLen) &&
          col("stop_hits") >= minStopHits &&
          col("top_word_frac") <= maxTopWordFrac).cast("int"))
  }

  /** Per-document Shannon entropy of the character distribution (nats)
    * — the classic gibberish/boilerplate detector: natural text sits in
    * a mid band, key-mash and single-char repetition score low, uniform
    * random bytes score high. The score is the native
    * [[graft.functions.CharEntropy]] expression — ONE sorted-run pass
    * per document, zero shuffles at any corpus size (the array-HOF
    * composition of the same formula pays an interpreted lambda per
    * distinct-char × char and re-allocates per filter: ~10× slower).
    * Returns (id, n_chars, entropy) rounded to 6 places (ln parity). */
  def charEntropy(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("id"),
      length(col(textCol)).as("n_chars"),
      round(graft.functions.Functions.char_entropy(col(textCol)), 6)
        .as("entropy"))

  /** Statistical language-model quality score — the CCNet recipe
    * (Wenzek et al. 2020 rank crawled text by LM perplexity; here the LM
    * is the corpus's own unigram distribution, trained and applied in
    * the same plan): per document, the mean log-probability of its
    * tokens under corpus unigram frequencies. Low scores flag
    * gibberish/rare-token documents, high scores flag boilerplate — the
    * standard statistical quality signal when no external model ships.
    *
    * Three shuffles at any scale: the corpus-wide term-count aggregate,
    * the token→frequency join (vocab-keyed; AQE broadcasts it when the
    * vocabulary is small), and the per-doc aggregate. The 1-row total
    * broadcasts. Returns (id, n_tokens, avg_logp). */
  def unigramLogProb(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("__w"))
    val freqs = toks.groupBy(col("__w")).agg(count(lit(1)).as("__c"))
    // total from the vocab aggregate, not a third corpus scan
    val total = freqs.agg(sum(col("__c")).as("__t"))
    toks.join(freqs, "__w").crossJoin(broadcast(total))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("__c") * lit(1.0) / col("__t"))), 6).as("avg_logp"))
  }

  /** Bigram LM quality score — one step up from [[unigramLogProb]]
    * toward CCNet's n-gram-LM signal: per-doc mean ln P(w_i | w_{i-1})
    * under corpus bigram statistics with add-alpha smoothing,
    * P(b|a) = (c(a,b) + α) / (c1(a) + α·V), where c1(a) counts bigram
    * CONTEXTS (occurrences of `a` with a successor — derived from the
    * bigram table, not a rescan) and V is the corpus vocabulary size,
    * so each context's probabilities sum to 1 and unseen continuations
    * get mass. Documents with fewer than 2 tokens have no bigrams and
    * are absent from the result.
    *
    * Scale shape: the bigram-count aggregate, the bigram→count join
    * (AQE-broadcastable — the bigram vocabulary is Zipf-small next to
    * the corpus), a 1-row vocab-size broadcast, and the per-doc
    * aggregate; the context counts reduce the bigram table. The
    * documents scan twice (bigram pass + vocab-size pass) — both
    * map-side. Returns (id, n_bigrams, avg_logp). */
  /** `(id, __a, __b)` bigram stream of a corpus — shared by the
    * self-scoring and held-out LM paths. */
  private def bigramPairs(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("id"), tokens(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) >= 2).select(col("id"),
        explode(zip_with(
          slice(col("__ws"), lit(1), size(col("__ws")) - 1),
          slice(col("__ws"), lit(2), size(col("__ws")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("__p"))
      .select(col("id"), col("__p.a").as("__a"), col("__p.b").as("__b"))

  def bigramLogProb(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, alpha: Double = 0.5): org.apache.spark.sql.DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    val bi = bigramPairs(docs, idCol, textCol)
    val c2 = bi.groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__c2"))
    val c1 = c2.groupBy(col("__a")).agg(sum(col("__c2")).as("__c1"))
    val vocab = docs.select(explode(tokens(col(textCol))).as("__w"))
      .agg(countDistinct(col("__w")).as("__v"))
    bi.join(c2, Seq("__a", "__b")).join(c1, Seq("__a"))
      .crossJoin(broadcast(vocab))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log((col("__c2") + lit(alpha)) /
          (col("__c1") + lit(alpha) * col("__v")))), 6).as("avg_logp"))
  }

  /** Held-out bigram LM scoring — [[bigramLogProb]] with the model
    * trained on `train` and applied to `test`: the actual LM-quality
    * eval shape (a model scored on its own training text overstates
    * itself). Unseen test bigrams and unseen contexts fall back to the
    * add-α floor ((0+α)/(0+α·V)) via LEFT joins — the self-scoring
    * path's inner joins would silently drop exactly the novel text the
    * held-out split exists to measure. Vocabulary is the TRAIN vocab.
    * Same scale shape as [[bigramLogProb]]: count tables are
    * vocab-sized and AQE-broadcastable; test scans once. */
  def bigramLogProbHeldOut(train: org.apache.spark.sql.DataFrame,
      test: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      alpha: Double = 0.5): org.apache.spark.sql.DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    val bi = bigramPairs(test, idCol, textCol)
    val c2 = bigramPairs(train, idCol, textCol)
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__c2"))
    val c1 = c2.groupBy(col("__a")).agg(sum(col("__c2")).as("__c1"))
    val vocab = train.select(explode(tokens(col(textCol))).as("__w"))
      .agg(countDistinct(col("__w")).as("__v"))
    bi.join(c2, Seq("__a", "__b"), "left").join(c1, Seq("__a"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log((coalesce(col("__c2"), lit(0L)) + lit(alpha)) /
          (coalesce(col("__c1"), lit(0L)) + lit(alpha) * col("__v")))), 6)
          .as("avg_logp"))
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; the
    * smoothing every serious n-gram LM quality filter uses in place of
    * [[bigramLogProb]]'s add-α):
    *
    *   P(b|a) = (c(a,b) − D)/c(a) + (D·N₁₊(a,·)/c(a)) · N₁₊(·,b)/T
    *
    * with absolute discount D (default 0.75 = 3/4, exact in binary),
    * N₁₊(a,·) the number of distinct continuations of context `a`,
    * N₁₊(·,b) the number of distinct left-contexts of word `b`, and T
    * the number of distinct bigram types. The lower-order model is the
    * CONTINUATION distribution — "how many contexts precede b" — not
    * raw unigram frequency; that is the whole point of KN (frequent but
    * context-locked words like the second half of a collocation stop
    * inflating backoff mass).
    *
    * Self-scored over its own corpus, so every scored bigram has
    * c(a,b) ≥ 1 > D and the discounted term stays positive. Count
    * tables are vocab-/bigram-type-sized; the corpus is scanned once
    * for pairs; the only float reduction is the per-doc mean of ln P
    * over doc-bounded bigrams (the [[bigramLogProb]] precedent). */
  def kneserNeyLogProb(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, discount: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1): $discount")
    val bi = bigramPairs(docs, idCol, textCol)
    val c2 = bi.groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__c2"))
    val c1 = c2.groupBy(col("__a")).agg(sum(col("__c2")).as("__c1"),
      count(lit(1)).as("__n1f"))
    val cont = c2.groupBy(col("__b")).agg(count(lit(1)).as("__n1r"))
    val types = c2.agg(count(lit(1)).as("__tt"))
    bi.join(c2, Seq("__a", "__b")).join(c1, Seq("__a"))
      .join(cont, Seq("__b"))
      .crossJoin(broadcast(types))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log((col("__c2") - lit(discount)) / col("__c1")
          + (lit(discount) * col("__n1f") / col("__c1"))
            * (col("__n1r").cast("double") / col("__tt")))), 6)
          .as("avg_logp"))
  }

  /** One-row corpus report — the data card a corpus release ships with:
    * document/token/vocabulary counts, exact-duplicate count, token-
    * length mean/median, mean stopword ratio, and the English share
    * (per [[languageGuess]]). Three aggregates total — one over the
    * documents (with an exact `percentile` median), one over the
    * exploded token stream for the vocabulary, one over distinct
    * content hashes — joined as 1-row broadcasts; the corpus is scanned
    * twice (doc stats + tokens), never collected. */
  def corpusReport(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val ws = tokens(col(textCol))
    val docStats = docs.select(size(ws).as("__nt"),
        stopwordRatio(ws).as("__swr"),
        (languageGuess(ws) === "en").cast("int").as("__en"),
        md5(col(textCol)).as("__h"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nt").cast("long")).as("total_tokens"),
        round(avg(col("__nt")), 6).as("mean_doc_tokens"),
        round(expr("percentile(__nt, 0.5)"), 6).as("median_doc_tokens"),
        round(avg(col("__swr")), 6).as("mean_stopword_ratio"),
        round(avg(col("__en")), 6).as("english_share"),
        countDistinct(col("__h")).as("__distinct"))
      .withColumn("exact_dup_docs", col("n_docs") - col("__distinct"))
      .drop("__distinct")
    val vocab = docs.select(explode(tokens(col(textCol))).as("__w"))
      .agg(countDistinct(col("__w")).as("vocab_size"))
    docStats.crossJoin(broadcast(vocab))
  }

  /** Vocabulary-id encoding — the final text→tensor step of a training
    * pipeline: build the top-`vocabSize` vocabulary (by count desc, word
    * asc — a total, engine-stable order), assign ids 1..N in rank order
    * (0 = UNK), and encode every document as its id sequence in token
    * order.
    *
    * Scale shape: the vocabulary is an aggregate (corpus-wide term
    * counts) reduced to `vocabSize` rows by a bounded TakeOrdered — the
    * full vocab is never globally sorted; the id assignment window runs
    * over vocabSize rows, not the corpus. Encoding is a vocab join on
    * the exploded tokens (broadcast: the vocab is small by
    * construction) re-assembled per document via sort-by-position, so
    * token order survives the shuffle. Returns (id, token_ids). */
  def encodeVocabIds(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, vocabSize: Int): org.apache.spark.sql.DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "__w")))
    val vocab = toks.groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w")).limit(vocabSize)
      .withColumn("__tid",
        row_number().over(Window.orderBy(col("__c").desc, col("__w"))))
    toks.join(broadcast(vocab.select(col("__w"), col("__tid"))), Seq("__w"), "left")
      .select(col("id"), col("pos"), coalesce(col("__tid"), lit(0)).as("__tid"))
      .groupBy(col("id"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("__tid")))),
        s => s.getField("__tid")).as("token_ids"))
  }

  /** Per-document out-of-vocabulary rate against the corpus's own
    * top-`vocabSize` vocabulary (count desc, word asc — the same
    * engine-stable order as [[encodeVocabIds]]) — the coverage signal
    * that sizes a tokenizer's vocab and flags documents a fixed vocab
    * would shred into UNKs. Scale shape: corpus term counts reduced by
    * a bounded TakeOrdered, then one broadcast join on the exploded
    * tokens and a per-doc aggregate — the vocabulary never shuffles the
    * corpus. Returns (id, n_tokens, n_oov, oov_rate). */
  def oovRate(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, vocabSize: Int): org.apache.spark.sql.DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    val toks = docs.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("__w"))
    val vocab = toks.groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w")).limit(vocabSize)
      .select(col("__w"), lit(1).as("__in"))
    toks.join(broadcast(vocab), Seq("__w"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", round(col("n_oov") / col("n_tokens"), 6))
  }

  /** Overlapping token-window chunking — the retrieval-prep operator
    * that turns documents into fixed-budget passages (RAG indexing,
    * context-window packing). One chunk starts at every `stride`-grid
    * token position below the doc's token count, covering up to
    * `window` tokens (trailing chunks are shorter). Pure map-side
    * explode — zero shuffles, chunk count ∝ corpus tokens / stride —
    * so the operator scales with a plain scan. Returns
    * `(id, chunk_idx, start_tok, chunk_len, first_tok, last_tok)`;
    * first/last token stand in for the chunk text so the full token
    * slice never needs to materialize twice. */
  def passageChunks(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, window: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(window > 0, s"window must be positive: $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window]: $stride")
    docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("__ws"))
      .withColumn("__n", size(col("__ws")))
      .select(col("id"), col("__ws"), col("__n"),
        explode(sequence(lit(0), greatest(col("__n") - 1, lit(0)),
          lit(stride))).as("start_tok"))
      .select(col("id"),
        (col("start_tok") / stride).cast("int").as("chunk_idx"),
        col("start_tok"),
        least(lit(window), col("__n") - col("start_tok")).as("chunk_len"),
        element_at(col("__ws"), col("start_tok") + 1).as("first_tok"),
        element_at(col("__ws"),
          least(col("__n"), col("start_tok") + lit(window))).as("last_tok"))
  }

  /** Document-frequency vocabulary pruning — the TF-IDF / embedding-prep
    * preprocessing step: tokens appearing in MORE than
    * `maxShare`·|docs| documents (corpus-wide glue with no signal) or in
    * FEWER than `minDf` documents (noise/typos that bloat the vocab)
    * are removed from every document; the rest keep their exact order.
    *
    * Returns `(id, n_tokens, n_kept, n_dropped_hi, n_dropped_lo,
    * kept_text)`.
    *
    * Scale shape: one token explode feeds the vocab-sized df aggregate;
    * only the PRUNED vocabulary (out-of-band tokens — vocab-sized at
    * worst, typically far smaller) joins back against the exploded
    * corpus, AQE-broadcastable; reassembly sorts each doc's surviving
    * `(pos, token)` structs in-aggregate — `collect_list` alone has no
    * order guarantee under retries. */
  def pruneByDocFreq(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, maxShare: Double, minDf: Long): org.apache.spark.sql.DataFrame = {
    require(maxShare > 0 && maxShare <= 1, s"maxShare in (0,1]: $maxShare")
    require(minDf >= 0, s"minDf must be >= 0: $minDf")
    val toks = docs
      .select(col(idCol).as("id"), posexplode(tokens(col(textCol)))
        .as(Seq("__pos", "__tok")))
    val nDocs = docs.agg(count(lit(1)).as("__nd"))
    val df = toks.select(col("id"), col("__tok")).distinct()
      .groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
    val pruned = df.crossJoin(broadcast(nDocs))
      .select(col("__tok"),
        when(col("__df") > col("__nd") * maxShare, lit("hi"))
          .when(col("__df") < minDf, lit("lo")).as("__why"))
      .filter(col("__why").isNotNull)
    toks.join(pruned, Seq("__tok"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__why").isNull, 1)).as("n_kept"),
        count(when(col("__why") === "hi", 1)).as("n_dropped_hi"),
        count(when(col("__why") === "lo", 1)).as("n_dropped_lo"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("__why").isNull,
            struct(col("__pos"), col("__tok"))))),
          s => s.getField("__tok"))).as("kept_text"))
  }

  /** Corpus-wide ORDERED token co-occurrence counts within a ±`window`
    * token span: every `(w_i, w_{i+j})` pair for `j = 1..window`,
    * counted across all documents — the collocation statistic behind
    * skip-gram training data and phrase mining (q160's PMI uses
    * doc-level baskets; this is the positional variant).
    *
    * Scale shape: pairs materialize MAP-SIDE inside one array HOF chain
    * over the bound token array (never a positional self-join, which
    * would shuffle the exploded corpus twice), so the only shuffle is
    * the final pair aggregate: cost ∝ corpus tokens × window. Returns
    * `(w1, w2, n)`. */
  def cooccurrencePairs(docs: org.apache.spark.sql.DataFrame,
      textCol: String, window: Int): org.apache.spark.sql.DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    val pairs = flatten(transform(
      sequence(lit(1), size(col("__ws")) - 1),
      i => transform(sequence(lit(1), lit(window)),
        j => when(i + j <= size(col("__ws")),
          struct(element_at(col("__ws"), i).as("w1"),
            element_at(col("__ws"), i + j).as("w2"))))))
    docs
      .select(tokens(col(textCol)).as("__ws"))
      // guard BEFORE building the range: sequence(1, 0) counts DOWN in
      // Spark, so a 1-token doc must never reach the pair HOF
      .filter(size(col("__ws")) >= 2)
      .select(explode(pairs).as("p"))
      .filter(col("p").isNotNull)
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-domain unigram-distribution drift: KL(P_domain ‖ P_corpus)
    * over word frequencies — the mixture-monitoring read-out that flags
    * a source whose token distribution wanders from the corpus it
    * feeds. No smoothing needed: every domain token is by construction
    * in the corpus support. Returns `(domain, n_tokens, n_terms, kl)`.
    *
    * One token explode serves both aggregates; the per-(domain, token)
    * cell table joins the vocab-sized corpus counts (AQE-broadcastable)
    * and folds to |domains| rows. KL sums are order-sensitive doubles —
    * rounded to 6 places, the same contract as every LM score here. */
  def unigramKlByDomain(docs: org.apache.spark.sql.DataFrame,
      domainCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(domainCol).as("domain"),
      explode(tokens(col(textCol))).as("__tok"))
    val cells = toks.groupBy(col("domain"), col("__tok"))
      .agg(count(lit(1)).as("__c"))
    val corpus = cells.groupBy(col("__tok"))
      .agg(sum(col("__c")).as("__cw"))
    val domTot = cells.groupBy(col("domain")).agg(sum(col("__c")).as("__ts"))
    val tot = corpus.agg(sum(col("__cw")).as("__t"))
    cells
      .join(corpus, "__tok")
      .join(domTot, "domain")
      .crossJoin(broadcast(tot))
      .select(col("domain"), col("__ts"), col("__c"),
        ((col("__c").cast("double") / col("__ts")) *
          log((col("__c").cast("double") / col("__ts")) /
            (col("__cw").cast("double") / col("__t")))).as("__term"))
      .groupBy(col("domain"))
      .agg(max(col("__ts")).as("n_tokens"), count(lit(1)).as("n_terms"),
        round(sum(col("__term")), 6).as("kl"))
  }

  /** Cross-document boilerplate detection: the fraction of each doc's
    * sentences that also appear in at least `minDocs` OTHER documents —
    * navigation chrome, license headers, and template text score high
    * and are what corpus-cleaning pipelines strip before training
    * (span dedup finds long literal repeats; this finds short
    * sentence-granular chrome). Sentences follow the `[.!?]+` + trim
    * convention of the q75 family.
    *
    * Shape: one map-side sentence explode (per-doc DISTINCT sentences),
    * one sentence-keyed doc-frequency aggregate, one broadcast-friendly
    * join back, one per-doc fold. Nothing quadratic; the sentence df
    * table is vocabulary-sized. Returns
    * `(idCol, n_sentences, n_boilerplate, boilerplate_ratio)` over
    * docs that have at least one sentence. */
  def boilerplateRatio(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minDocs: Int = 3): org.apache.spark.sql.DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    val sent = filter(
      transform(split(col(textCol), "[.!?]+"), x => trim(x)),
      x => length(x) > 0)
    val ds = docs.select(col(idCol), explode(sent).as("__sent")).distinct()
    val df = ds.groupBy(col("__sent"))
      .agg(countDistinct(col(idCol)).as("__df"))
    ds.join(df, "__sent")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_sentences"),
        sum(when(col("__df") > minDocs, 1L).otherwise(0L))
          .as("n_boilerplate"))
      .withColumn("boilerplate_ratio",
        round(col("n_boilerplate").cast("double") / col("n_sentences"), 6))
  }

  /** Flesch reading ease per document (Flesch 1948; the readability
    * gate several published corpus-quality pipelines apply):
    * `206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)`,
    * with sentences split on `[.!?]+` (the [[passageChunks]]-family
    * convention), words on whitespace, and syllables counted as vowel
    * groups per word floored at 1 (the standard heuristic — exact
    * syllabification needs a dictionary no engine ships).
    *
    * Pure map-side array-HOF arithmetic — one projection, zero
    * shuffles, fully codegen'd; every count is an integer so the final
    * double expression is deterministic everywhere. Returns the input
    * id plus `(n_sentences, n_words, n_syllables, flesch)` (flesch
    * rounded to 6; 0-word docs get NULL flesch rather than a division
    * error). */
  def fleschReadingEase(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val sent = filter(
      transform(split(col(textCol), "[.!?]+"), x => trim(x)),
      x => length(x) > 0)
    val words = filter(split(col(textCol), "\\s+"), x => length(x) > 0)
    val syll = aggregate(words, lit(0L), (acc, w) =>
      acc + greatest(lit(1),
        size(regexp_extract_all(lower(w), lit("[aeiouy]+"), lit(0)))))
    docs.select(col(idCol),
        size(sent).as("n_sentences"), size(words).as("n_words"),
        syll.as("n_syllables"))
      .withColumn("flesch", when(col("n_words") > 0,
        round(lit(206.835)
          - lit(1.015) * (col("n_words").cast("double")
            / greatest(col("n_sentences"), lit(1)))
          - lit(84.6) * (col("n_syllables").cast("double")
            / col("n_words")), 6)))
  }

  /** Zipf-law exponent fit over the corpus vocabulary: OLS slope of
    * ln(frequency) against ln(rank) for the top-N tokens — natural
    * corpora sit near slope −1 (Zipf 1949), and a corpus that doesn't
    * is usually templated, scraped boilerplate, or synthetic.
    *
    * Determinism without an ordered fold: each logarithm is SNAPPED TO
    * AN INTEGER GRID (round(ln·10⁹) as long) before any sum. Both
    * engines' ln agree to ~1 ulp (≈10⁻¹⁶), far inside the 10⁻⁹ grid,
    * so the snapped integers are identical; every moment is then an
    * exact integer/decimal sum — order- and partitioning-independent —
    * and the closed-form slope divides two exact quantities once, in
    * double. The 10⁹ scale cancels exactly in the slope ratio; the
    * intercept rescales by one multiplication.
    *
    * Spark shape: one token-count aggregate (the only corpus-sized
    * shuffle), a bounded TakeOrdered top-N (orderBy+limit — never a
    * full sort at 100 TB), rank via a window over N rows, one 1-row
    * moment fold. Returns `(n_tokens, slope, intercept)` (rounded). */
  def zipfFit(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    require(topN >= 3, s"topN must be >= 3: $topN")
    val counts = docs
      .select(explode(tokens(col(textCol))).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col("__t")).agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__cnt").desc, col("__t").asc).limit(topN)
    val ranked = counts.withColumn("__rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("__cnt").desc, col("__t").asc)).cast("long"))
    val grid = lit(1000000000L)
    val lx = round(log(col("__rank").cast("double")) * grid).cast("long")
    val ly = round(log(col("__cnt").cast("double")) * grid).cast("long")
    val folded = ranked
      .select(lx.as("__lx"), ly.as("__ly"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__lx")).as("__sx"), sum(col("__ly")).as("__sy"),
        sum(col("__lx").cast("decimal(38,0)")
          * col("__ly").cast("decimal(38,0)")).as("__sxy"),
        sum(col("__lx").cast("decimal(38,0)")
          * col("__lx").cast("decimal(38,0)")).as("__sxx"))
    val nD = col("n_tokens").cast("double")
    val slope = (nD * col("__sxy").cast("double")
        - col("__sx").cast("double") * col("__sy").cast("double")) /
      (nD * col("__sxx").cast("double")
        - col("__sx").cast("double") * col("__sx").cast("double"))
    folded.select(col("n_tokens"),
      round(slope, 6).as("slope"),
      round((col("__sy").cast("double") / 1.0e9
        - slope * (col("__sx").cast("double") / 1.0e9)) / nD, 6)
        .as("intercept"))
  }

  /** Chao1 vocabulary-richness estimate per group (Chao 1984,
    * bias-corrected form): how many word TYPES does the corpus slice
    * really have, including the ones not yet seen?
    *
    *   Chao1 = D + f₁(f₁−1) / (2(f₂+1)),   Ĉ = 1 − f₁/N  (Good's coverage)
    *
    * with D observed types, f₁/f₂ the singleton/doubleton counts, N the
    * token count. The "is this slice's vocabulary saturated?" readout a
    * crawl-scheduling pipeline reads before deciding it has enough of a
    * source. The bias-corrected denominator (f₂+1) keeps the estimator
    * defined when no doubletons exist.
    *
    * Exactness: one (group, word) count aggregate → one frequency
    * reduce; D, f₁, f₂, N are exact longs and both formulas are one
    * double expression each. Token split is whitespace on the raw text
    * (`split(text, " ")`, empties dropped — the suite's q345 TTR
    * convention).
    *
    * Returns `(groupCol, n_tokens, n_types, f1, f2, chao1, coverage)`. */
  def chao1(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val wc = docs
      .select(col(groupCol).as("__g"),
        explode(split(col(textCol), " ")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("__g"), col("__w")).agg(count(lit(1)).as("__c"))
    val agg = wc.groupBy(col("__g")).agg(
      sum(col("__c")).as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum((col("__c") === 1).cast("long")).as("f1"),
      sum((col("__c") === 2).cast("long")).as("f2"))
    val (f1D, f2D) = (col("f1").cast("double"), col("f2").cast("double"))
    val nD = col("n_tokens").cast("double")
    agg.filter(col("n_tokens") > 0)
      .select(col("__g").as(groupCol), col("n_tokens"), col("n_types"),
        col("f1"), col("f2"),
        round(col("n_types").cast("double")
          + f1D * (f1D - 1.0) / (lit(2.0) * (f2D + 1.0)), 6).as("chao1"),
        round(lit(1.0) - f1D / nD, 6).as("coverage"))
  }

  /** Good–Turing frequency smoothing per group (Good 1953): the unseen
    * probability mass p₀ = f₁/N and the adjusted counts
    * r* = (r+1)·f_{r+1}/f_r for the low frequencies r = 1..maxR — what a
    * language model should ACTUALLY charge for rare words, and the
    * standard "how much of this source is still unseen" readout.
    *
    * Exactness: the frequency-of-frequencies table is one exact
    * aggregate over the (group, word) counts; each r* row is one double
    * division of exact longs. Rows where f_r = 0 are absent by
    * construction; f_{r+1} defaults to 0 (r* = 0 — the classical
    * smoothed count when nothing was seen r+1 times).
    *
    * Returns `(groupCol, r, f_r, f_r1, r_star, p0)`. */
  def goodTuring(docs: DataFrame, groupCol: String, textCol: String,
      maxR: Int = 4): DataFrame = {
    require(maxR >= 1, s"maxR must be >= 1: $maxR")
    val wc = docs
      .select(col(groupCol).as("__g"),
        explode(split(col(textCol), " ")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("__g"), col("__w")).agg(count(lit(1)).as("__c"))
    val ff = wc.groupBy(col("__g"), col("__c").as("r"))
      .agg(count(lit(1)).as("f_r"))
    val totals = wc.groupBy(col("__g"))
      .agg(sum(col("__c")).as("__n"),
        sum((col("__c") === 1).cast("long")).as("__f1"))
    val nxt = ff.select(col("__g").as("__g2"), (col("r") - 1).as("__r0"),
      col("f_r").as("f_r1"))
    val j = ff.filter(col("r") <= maxR)
      .join(nxt, col("__g") === col("__g2") && col("r") === col("__r0"),
        "left")
      .join(broadcast(totals), "__g")
    j.select(col("__g").as(groupCol), col("r").cast("long").as("r"),
        col("f_r"), coalesce(col("f_r1"), lit(0L)).as("f_r1"),
        round((col("r").cast("double") + 1.0)
          * coalesce(col("f_r1"), lit(0L)).cast("double")
          / col("f_r").cast("double"), 6).as("r_star"),
        round(col("__f1").cast("double") / col("__n").cast("double"), 6)
          .as("p0"))
  }
}
