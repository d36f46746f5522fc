package graft.examples

import org.apache.spark.sql.functions._

import graft.Session
import graft.operators.{Decontaminate, Dedup, Mixing, Scale, TextAnalysis}
import graft.sources.{Tables => T}

/** End-to-end training-data pipeline over the fixtures: exact dedup →
  * near-dup removal (MinHash+LSH) → rule gates (Gopher composite +
  * character entropy + repetition) → substring-duplication drop score →
  * LM quality cut → contamination scoring + benchmark decontamination →
  * PII redaction → temperature-scaled domain mixing with repetition
  * upsampling → train/val/test split → chunking → token-budget shard
  * packing → sequence-packing layout. Every stage is a DataFrame
  * transform; nothing touches the driver except the final counts.
  * Usage: runMain graft.examples.PipelineDemo [sfDir]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Session.local()
    import spark.implicits._

    val docs = T.documents(spark, sfDir)
    println(s"[pipeline] input docs: ${docs.count()}")

    // 1. exact dedup on content hash, keeping the smallest doc_id
    val exact = docs.groupBy(md5($"text").as("h"))
      .agg(min($"doc_id").as("doc_id"))
      .join(docs, "doc_id")
      .drop("h")
    println(s"[pipeline] after exact dedup: ${exact.count()}")

    // 2. near-dup removal: drop the higher doc_id of every verified pair
    val nearDupLosers = Dedup.minHashNearDupPairs(exact, "doc_id", "text", 0.5)
      .select($"b_id".as("doc_id")).distinct()
    // persist at the expensive cut points: every staged count would
    // otherwise recompute the whole upstream lineage (pair mining,
    // duplication ratios, quantiles) once per stage
    val deduped = exact.join(nearDupLosers, Seq("doc_id"), "left_anti").persist()
    println(s"[pipeline] after near-dup removal: ${deduped.count()}")

    // 3. quality gate, rule tier: the Gopher composite (word-count and
    //    mean-word-length bounds, stopword floor, repetition ceiling)
    //    plus a character-entropy floor — both zero-shuffle scans —
    //    then the duplicate-3-gram boilerplate signal
    val ws = TextAnalysis.tokens($"text")
    val gopherKeep = TextAnalysis.gopherQuality(deduped, "doc_id", "text",
        minWords = 20, maxTopWordFrac = 0.3)
      .filter($"keep" === 1).select($"id".as("doc_id"))
    val entropyKeep = TextAnalysis.charEntropy(deduped, "doc_id", "text")
      .filter($"entropy" >= 2.0).select($"id".as("doc_id"))
    val total3 = greatest(size(ws) - 2, lit(0)).cast("double")
    val dupFrac = when(total3 > 0,
      lit(1.0) - size(TextAnalysis.shingleSet($"text", 3)) / total3).otherwise(lit(0.0))
    val quality = deduped.join(gopherKeep, Seq("doc_id"))
      .join(entropyKeep, Seq("doc_id"))
      .filter(TextAnalysis.stopwordRatio(ws) < 0.5 && dupFrac <= 0.8)
    println(s"[pipeline] after rule gates (gopher+entropy+repetition): ${quality.count()}")

    // 3b. substring-duplication drop score: discard docs whose content
    //     is mostly corpus-duplicated text (exact k-token window test)
    val dupScores = Dedup.duplicationRatio(quality, "doc_id", "text", k = 8)
      .filter($"dup_ratio" > 0.8).select($"id".as("doc_id"))
    val spanClean = quality.join(dupScores, Seq("doc_id"), "left_anti")
    println(s"[pipeline] after substring-dup drop score: ${spanClean.count()}")

    // 3c. statistical LM quality cut: drop the lowest-scoring 5% by
    //     corpus-unigram log-probability (threshold from exact quantiles
    //     — two operators composing, nothing hardcoded)
    val lm = TextAnalysis.unigramLogProb(spanClean, "doc_id", "text")
    val cut = graft.operators.Quantiles.exactQuantiles(
        lm, Seq.empty, "avg_logp", Seq(0.05))
      .collect().headOption.map(_.getDouble(0)).getOrElse(Double.NegativeInfinity)
    val fluent = spanClean.join(
      lm.filter($"avg_logp" >= cut).select($"id".as("doc_id")), Seq("doc_id"))
      .persist()
    println(f"[pipeline] after LM quality cut (p05=$cut%.3f): ${fluent.count()}")

    // 4. benchmark decontamination: score every doc's eval-gram overlap
    //    fraction, then drop by threshold (>= 3 shared 3-grams)
    val eval = docs.filter($"doc_id" % 25 === 0)
    val contamMax = Decontaminate.contaminationRatio(
        fluent.filter($"doc_id" % 25 =!= 0), eval, "doc_id", "text")
      .agg(max($"contamination")).collect()(0).getDouble(0)
    val clean = Decontaminate.removeContaminated(
      fluent.filter($"doc_id" % 25 =!= 0), eval, "doc_id", "text", minHits = 3L)
    println(f"[pipeline] after decontamination (max overlap $contamMax%.3f): ${clean.count()}")

    // 5. PII scrub: map-side regexp redaction of emails/phones
    val scrubbed = clean.withColumn("text", TextAnalysis.redactPii($"text"))

    // 6. temperature-scaled source mixture with REPETITION: uncapped
    //    rates, so scarce sources are upsampled by repeating documents
    //    (copy index in `copy`) instead of capping their contribution
    val mixed = Mixing.upsampleDomains(scrubbed, "source", "doc_id",
      tau = 0.5, targetTotal = 300L)
    println(s"[pipeline] after temperature mixing (with repetition): ${mixed.count()}")

    // 7. deterministic train/val/test split (hash slots, RNG-free; all
    //    copies of a document land in the same split by construction).
    //    `uid` makes each emitted copy unique for the packing stages
    val split = Mixing.splitByHash(mixed, "doc_id", "split",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .withColumn("uid", $"doc_id" * 100 + $"copy")
    split.groupBy($"split").count().orderBy($"split").collect()
      .foreach(r => println(s"[pipeline] split ${r.getString(0)}: ${r.getLong(1)}"))
    val train = split.filter($"split" === "train").persist()

    // 8. chunk into overlapping token windows for training
    val chunks = train
      .withColumn("st", explode(sequence(lit(1), size(ws), lit(32))))
      .select($"uid", $"st",
        concat_ws(" ", slice(TextAnalysis.tokens($"text"), $"st", lit(48))).as("chunk"))
    println(s"[pipeline] chunks produced: ${chunks.count()}")

    // 9. pack chunks into ~2k-token shards in stable order (two-phase
    //    distributed prefix sum — no single-task global window)
    val withTokens = chunks.select(
      (($"uid" * 100000) + $"st").as("seq"),
      size(TextAnalysis.tokens($"chunk")).as("n_tokens"))
    val shards = Scale.prefixSum(withTokens, "seq", "n_tokens", "cum")
      .select((($"cum" - $"n_tokens") / lit(2000L)).cast("long").as("shard"))
      .groupBy($"shard").count()
    println(s"[pipeline] training shards: ${shards.count()}")

    // 10. loader metadata: concat-and-chunk the deterministically
    //     shuffled corpus into fixed 512-token training sequences
    val packed = Mixing.packSequences(
      train.select($"uid", md5($"uid".cast("string")).as("h"),
        size(TextAnalysis.tokens($"text")).as("nt")),
      "h", "nt", seqLen = 512)
    val nSeqs = packed.agg(max($"last_seq")).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long] + 1))
      .getOrElse(0L)
    println(s"[pipeline] training sequences: $nSeqs")

    spark.stop()
  }
}
