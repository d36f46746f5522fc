package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Merge, Mixing, Similarity, TextAnalysis}
import graft.sources.{Tables => T}

/** Round-4 surface additions: exact substring (repeated-span) dedup and
  * its per-document drop score, sequence packing (ordered and
  * deterministically shuffled), stratified sampling, CDC merge, and
  * SemDeDup-style semantic dedup — the remaining published
  * training-data-pipeline operators the earlier families don't cover.
  */
object Round4 {

  val all: Seq[Q] = Seq(

    // maximal EXACT repeated token spans (k = 8 token windows): every
    // window occurring at >= 2 corpus positions is duplicated; runs of
    // consecutive duplicated positions merge into one maximal span per
    // document. Hash-candidates + exact-text verify make the result
    // exact, so the full span table hash-matches a plain SQL oracle
    Q("q101_substring_dedup", (s, d) => {
      import s.implicits._
      Dedup.duplicatedSpans(T.documents(s, d), "doc_id", "text", k = 8)
        .select($"id".as("doc_id"), $"start_pos", $"span_tokens", $"n_windows")
        .orderBy($"doc_id", $"start_pos")
    }, Some("""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                 FROM documents),
      g AS (SELECT doc_id,
                   CAST(unnest(generate_series(1, greatest(len(ws) - 7, 0))) - 1 AS INT) AS pos,
                   unnest(list_transform(generate_series(1, greatest(len(ws) - 7, 0)),
                     i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3],
                                         ws[i+4], ws[i+5], ws[i+6], ws[i+7]))) AS gram
            FROM w),
      dup AS (SELECT doc_id, pos FROM (
                SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS gn FROM g) t
              WHERE gn >= 2),
      isl AS (SELECT doc_id, pos,
                     pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
              FROM dup)
      SELECT doc_id, CAST(min(pos) AS INT) AS start_pos,
             CAST(max(pos) - min(pos) + 8 AS INT) AS span_tokens,
             CAST(count(*) AS INT) AS n_windows
      FROM isl GROUP BY doc_id, grp ORDER BY doc_id, start_pos""")),

    // per-document duplication ratio — the document-level drop score of
    // substring dedup (discard docs that are mostly corpus-duplicated
    // text): exact fraction of each doc's 8-token windows that occur at
    // >= 2 corpus positions
    Q("q102_duplication_ratio", (s, d) => {
      import s.implicits._
      Dedup.duplicationRatio(T.documents(s, d), "doc_id", "text", k = 8)
        .select($"id".as("doc_id"), $"n_windows", $"dup_windows", $"dup_ratio")
        .orderBy($"doc_id")
    }, Some("""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                 FROM documents),
      g AS (SELECT doc_id,
                   CAST(unnest(generate_series(1, greatest(len(ws) - 7, 0))) - 1 AS INT) AS pos,
                   unnest(list_transform(generate_series(1, greatest(len(ws) - 7, 0)),
                     i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3],
                                         ws[i+4], ws[i+5], ws[i+6], ws[i+7]))) AS gram
            FROM w),
      dup AS (SELECT doc_id, count(*) AS dw FROM (
                SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS gn FROM g) t
              WHERE gn >= 2 GROUP BY doc_id),
      tot AS (SELECT doc_id, greatest(len(ws) - 7, 0) AS nw FROM w)
      SELECT t.doc_id, CAST(nw AS BIGINT) AS n_windows,
             CAST(coalesce(dw, 0) AS BIGINT) AS dup_windows,
             round(coalesce(dw, 0) * 1.0 / nw, 6) AS dup_ratio
      FROM tot t LEFT JOIN dup USING (doc_id)
      WHERE nw > 0 ORDER BY t.doc_id""")),

    // concat-and-chunk sequence packing in doc_id order: where each doc
    // lands in the fixed 512-token training sequences (global offset via
    // distributed prefix sum — no single-partition exchange)
    Q("q103_pack_sequences", (s, d) => {
      import s.implicits._
      val docs = T.documents(s, d)
        .select($"doc_id", size(TextAnalysis.tokens($"text")).as("nt"))
      Mixing.packSequences(docs, "doc_id", "nt", seqLen = 512)
        .select($"doc_id", $"nt".cast("long").as("n_tokens"), $"start_token",
          $"first_seq", $"last_seq", $"seq_offset")
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id,
                        len(regexp_split_to_array(trim(text), '\s+')) AS n
                 FROM documents),
      c AS (SELECT doc_id, n,
                   CAST(sum(n) OVER (ORDER BY doc_id) AS BIGINT) AS cum
            FROM t)
      SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
             cum - n AS start_token,
             (cum - n) // 512 AS first_seq,
             greatest((cum - 1) // 512, (cum - n) // 512) AS last_seq,
             (cum - n) % 512 AS seq_offset
      FROM c ORDER BY doc_id""")),

    // the same packing after a DETERMINISTIC corpus shuffle (order by
    // md5 of the id): the reproducible global permutation a training run
    // needs — same layout every run, every engine, every partitioning
    Q("q104_shuffled_pack", (s, d) => {
      import s.implicits._
      val docs = T.documents(s, d)
        .select($"doc_id", md5($"doc_id".cast("string")).as("h"),
          size(TextAnalysis.tokens($"text")).as("nt"))
      Mixing.packSequences(docs, "h", "nt", seqLen = 512)
        .select($"doc_id", $"h", $"nt".cast("long").as("n_tokens"),
          $"start_token", $"first_seq", $"last_seq", $"seq_offset")
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
                        len(regexp_split_to_array(trim(text), '\s+')) AS n
                 FROM documents),
      c AS (SELECT doc_id, h, n,
                   CAST(sum(n) OVER (ORDER BY h) AS BIGINT) AS cum
            FROM t)
      SELECT doc_id, h, CAST(n AS BIGINT) AS n_tokens,
             cum - n AS start_token,
             (cum - n) // 512 AS first_seq,
             greatest((cum - 1) // 512, (cum - n) // 512) AS last_seq,
             (cum - n) % 512 AS seq_offset
      FROM c ORDER BY doc_id""")),

    // per-stratum deterministic sampling: keep 50% of English, 20% of
    // German, 10% of everything else — RNG-free multiplicative-hash
    // draw, so the sampled corpus is identical on every run and engine
    Q("q105_stratified_sample", (s, d) => {
      import s.implicits._
      Mixing.stratifiedSample(T.documents(s, d), "lang", "doc_id",
          Map("en" -> 0.5, "de" -> 0.2), defaultFraction = 0.1)
        .select($"doc_id", $"lang", $"source")
        .orderBy($"doc_id")
    }, Some("""
      SELECT doc_id, lang, source FROM documents
      WHERE ((doc_id % 2147483648) * 2246822519) % 1000 <
            CASE WHEN lang = 'en' THEN 500
                 WHEN lang = 'de' THEN 200 ELSE 100 END
      ORDER BY doc_id""")),

    // CDC apply / MERGE INTO: upserts (keys % 7), deletes (keys % 11,
    // winning by higher seq), inserts (fresh keys) applied to the orders
    // snapshot in ONE keyed shuffle — no join; exact-decimal checksum
    Q("q106_merge_upsert", (s, d) => {
      import s.implicits._
      val base = T.orders(s, d)
      val upd = base.filter($"o_orderkey" % 7 === 0)
        .withColumn("o_totalprice", $"o_totalprice" + 1000.0)
        .withColumn("__op", lit("U")).withColumn("__seq", lit(1L))
      val del = base.filter($"o_orderkey" % 11 === 0)
        .withColumn("__op", lit("D")).withColumn("__seq", lit(2L))
      val ins = base.filter($"o_orderkey" % 13 === 0)
        .withColumn("o_orderkey", $"o_orderkey" + 100000000L)
        .withColumn("__op", lit("U")).withColumn("__seq", lit(1L))
      Merge.applyChanges(base, upd.unionByName(del).unionByName(ins),
          Seq("o_orderkey"), "__op", "__seq")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum($"o_totalprice".cast("decimal(15,2)")).as("total"))
        .orderBy($"o_orderstatus")
    }, Some("""
      WITH upd AS (SELECT * REPLACE (o_totalprice + 1000.0 AS o_totalprice)
                   FROM orders WHERE o_orderkey % 7 = 0),
      merged AS (
        SELECT * FROM (
          SELECT * FROM orders
          WHERE o_orderkey % 7 != 0
          UNION ALL SELECT * FROM upd) b
        WHERE o_orderkey % 11 != 0
        UNION ALL
        SELECT * REPLACE (o_orderkey + 100000000 AS o_orderkey)
        FROM orders WHERE o_orderkey % 13 = 0)
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) AS DECIMAL(15,2)) AS total
      FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // SemDeDup-style semantic dedup over the embeddings table: cluster
    // with the sample-trained spherical-kmeans quantizer, drop vectors
    // with a lower-id cluster-mate at cosine >= 0.9. Deterministic but
    // quantizer-trained, so not SQL-expressible: rows-only here;
    // SemanticDedupSpec pins planted-duplicate collapse + unique survival
    Q("q107_semantic_dedup", (s, d) => {
      import s.implicits._
      Similarity.semanticDedup(T.embeddings(s, d), threshold = 0.9, nlist = 8)
        .orderBy($"vec_id")
    }, None),

    // STREAMING CDC: a change feed arrives on a stream and each
    // micro-batch MERGEs into a key-hash-bucketed parquet snapshot,
    // rewriting only the touched buckets (the Delta MERGE access pattern
    // on plain parquet). One op per key in the feed, so the final
    // snapshot is batching-invariant; checksum of the drained snapshot
    Q("q108_stream_cdc", (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.streaming.Trigger
      val path = s"/tmp/graft_cdc_${System.nanoTime()}"
      val base = T.orders(s, d)
      Merge.writeBucketedSnapshot(base, path, Seq("o_orderkey"), buckets = 16)
      val k = $"o_orderkey"
      val schema = T.table(s, d, "orders").schema
      // exact filename, not `orders.*`: a wildcard silently admits any
      // sidecar the driver environment might leave next to the fixture
      // (crc, tmp), which would duplicate change rows there and nowhere
      // else — determinism-audit hardening, round 6. The brace glob
      // matches ONLY this file while keeping the source's basePath a
      // directory (a bare file path is rejected by the file source)
      val changes = s.readStream.schema(schema).parquet(s"$d/{orders.parquet}")
        .filter(k % 7 === 0 || k % 11 === 0 || k % 13 === 0)
        .withColumn("__op", when(k % 11 === 0, "D").otherwise("U"))
        .withColumn("o_totalprice",
          when(k % 7 === 0 && k % 11 =!= 0, $"o_totalprice" + 1000.0)
            .otherwise($"o_totalprice"))
        .withColumn("o_orderkey",
          when(k % 11 =!= 0 && k % 7 =!= 0 && k % 13 === 0, k + 100000000L)
            .otherwise(k))
        .withColumn("__seq", lit(1L))
      // the checksum is 3 rows: materialize it, then drop the snapshot
      // dir (in finally — a failed run must not accrete orders-sized
      // copies in /tmp either). The DURABLE checkpoint (under the same
      // temp root) matters for crash safety: applyChangesBucketed's
      // mid-swap recovery loses the interrupted batch and relies on the
      // stream replaying it — a temporary checkpoint would drop it
      try {
        val query = changes.writeStream
          .option("checkpointLocation", path + ".ckpt")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            Merge.applyChangesBucketed(path, b, Seq("o_orderkey"), "__op", "__seq", 16)
          }
          .trigger(Trigger.AvailableNow()).start()
        query.awaitTermination()
        // flake forensics (round-4 driver run had one unreproducible red
        // hash here; a 20-iteration fresh-JVM Verify->DuckDB loop at the
        // driver's exact config passed 20/20 with BIT-IDENTICAL
        // per-bucket checksums every run — tools/q108_loop.sh): the
        // manifest's per-bucket rows+checksums go to stderr so a future
        // mismatch names the diverging bucket
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sessionState.newHadoopConf())
        Merge.readManifest(fs, path).foreach { case (seq, bs) =>
          System.err.println(s"[q108] apply_seq=$seq buckets=" +
            bs.toSeq.sortBy(_._1).map { case (b, st) =>
              s"$b:${st.rows}:${st.checksum}" }.mkString(","))
        }
        val result = Merge.readBucketedSnapshot(s, path)
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum($"o_totalprice".cast("decimal(15,2)")).as("total"))
          .orderBy($"o_orderstatus")
        val rows = result.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), result.schema)
          .orderBy($"o_orderstatus")
      } finally {
        val fsPath = new org.apache.hadoop.fs.Path(path)
        val fs = fsPath.getFileSystem(s.sessionState.newHadoopConf())
        fs.delete(fsPath, true)
        fs.delete(new org.apache.hadoop.fs.Path(path + ".merge_tmp"), true)
        fs.delete(new org.apache.hadoop.fs.Path(path + ".ckpt"), true)
      }
    }, Some("""
      WITH m AS (
        SELECT * REPLACE (CASE WHEN o_orderkey % 7 = 0
                               THEN o_totalprice + 1000.0
                               ELSE o_totalprice END AS o_totalprice)
        FROM orders WHERE o_orderkey % 11 != 0
        UNION ALL
        SELECT * REPLACE (o_orderkey + 100000000 AS o_orderkey)
        FROM orders
        WHERE o_orderkey % 11 != 0 AND o_orderkey % 7 != 0 AND o_orderkey % 13 = 0)
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) AS DECIMAL(15,2)) AS total
      FROM m GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // vocabulary-id encoding: top-100 vocab by (count desc, word asc),
    // ids 1..100 in rank order, 0 = UNK; every doc becomes its token-id
    // sequence in exact token order — the text -> tensor step
    Q("q111_tokenize_ids", (s, d) => {
      import s.implicits._
      // the operator's artifact is the per-doc id ARRAY; the check emits
      // the exploded (doc_id, pos, tid) form — same information, scalar
      // cells the hash compare can order
      TextAnalysis.encodeVocabIds(T.documents(s, d), "doc_id", "text", vocabSize = 100)
        .select($"id".as("doc_id"),
          posexplode($"token_ids").as(Seq("pos", "tid")))
        .orderBy($"doc_id", $"pos")
    }, Some("""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                 FROM documents),
      toks AS (SELECT doc_id,
                      CAST(unnest(generate_series(1, len(ws))) AS INT) - 1 AS pos,
                      unnest(ws) AS tok
               FROM w),
      f AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
      v AS (SELECT tok, CAST(row_number() OVER (ORDER BY c DESC, tok) AS INT) AS tid
            FROM f ORDER BY c DESC, tok LIMIT 100),
      e AS (SELECT t.doc_id, t.pos, coalesce(v.tid, 0) AS tid
            FROM toks t LEFT JOIN v USING (tok))
      SELECT doc_id, pos, tid FROM e ORDER BY doc_id, pos""")),

    // statistical LM quality score (the CCNet signal, self-trained):
    // mean log-probability of each doc's tokens under the corpus's own
    // unigram distribution — low = rare-token gibberish, high =
    // boilerplate; the LM trains and applies inside one plan
    Q("q109_lm_quality", (s, d) => {
      import s.implicits._
      TextAnalysis.unigramLogProb(T.documents(s, d), "doc_id", "text")
        .select($"id".as("doc_id"), $"n_tokens", $"avg_logp")
        .orderBy($"doc_id")
    }, Some("""
      WITH toks AS (SELECT doc_id,
                           unnest(regexp_split_to_array(trim(text), '\s+')) AS w
                    FROM documents),
      f AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
      t AS (SELECT count(*) AS t FROM toks)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             round(avg(ln(f.c * 1.0 / t.t)), 6) AS avg_logp
      FROM toks JOIN f USING (w) CROSS JOIN t
      GROUP BY doc_id ORDER BY doc_id""")),

    // snapshot diff: what the q106 change feed actually did to the
    // orders snapshot, recovered by comparing the two versions — the
    // audit/validation step of dataset versioning. One full-outer join
    Q("q110_snapshot_diff", (s, d) => {
      import s.implicits._
      val base = T.orders(s, d)
      val upd = base.filter($"o_orderkey" % 7 === 0)
        .withColumn("o_totalprice", $"o_totalprice" + 1000.0)
        .withColumn("__op", lit("U")).withColumn("__seq", lit(1L))
      val del = base.filter($"o_orderkey" % 11 === 0)
        .withColumn("__op", lit("D")).withColumn("__seq", lit(2L))
      val ins = base.filter($"o_orderkey" % 13 === 0)
        .withColumn("o_orderkey", $"o_orderkey" + 100000000L)
        .withColumn("__op", lit("U")).withColumn("__seq", lit(1L))
      val next = Merge.applyChanges(base, upd.unionByName(del).unionByName(ins),
        Seq("o_orderkey"), "__op", "__seq")
      Merge.snapshotDiff(base, next, Seq("o_orderkey"))
        .groupBy($"change").agg(count(lit(1)).as("n"))
        .orderBy($"change")
    }, Some("""
      WITH merged AS (
        SELECT * FROM (
          SELECT * REPLACE (CASE WHEN o_orderkey % 7 = 0
                                 THEN o_totalprice + 1000.0
                                 ELSE o_totalprice END AS o_totalprice)
          FROM orders) b
        WHERE o_orderkey % 11 != 0
        UNION ALL
        SELECT * REPLACE (o_orderkey + 100000000 AS o_orderkey)
        FROM orders WHERE o_orderkey % 13 = 0),
      d AS (SELECT CASE
              WHEN b.o_orderkey IS NULL THEN 'removed'
              WHEN a.o_orderkey IS NULL THEN 'added'
              WHEN (a.o_custkey      IS DISTINCT FROM b.o_custkey)
                OR (a.o_orderstatus  IS DISTINCT FROM b.o_orderstatus)
                OR (a.o_totalprice   IS DISTINCT FROM b.o_totalprice)
                OR (a.o_orderdate    IS DISTINCT FROM b.o_orderdate)
                OR (a.o_orderpriority IS DISTINCT FROM b.o_orderpriority)
              THEN 'changed' ELSE 'unchanged' END AS change
            FROM orders a FULL OUTER JOIN merged b USING (o_orderkey))
      SELECT change, count(*) AS n FROM d GROUP BY change ORDER BY change"""))
  )
}
