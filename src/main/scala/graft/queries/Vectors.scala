package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.{Tables => T}
import graft.operators.{Multimodal, Similarity}

/** Similarity-search + multimodal suite over `embeddings`/`documents`
  * (SURVEY §2.3). Cosine similarity is a custom codegen'd Catalyst
  * expression; ranking always uses the rounded similarity with id
  * tie-break so results are stable across engines.
  */
object Vectors {

  val all: Seq[Q] = Seq(

    Q("q32_cosine_topk", (s, d) => {
      import s.implicits._
      val emb = T.embeddings(s, d)
      Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 10), 5)
        .select($"probe_id", $"vec_id", $"sim", $"rnk")
        .orderBy($"probe_id", $"rnk")
    }, Some("""
      SELECT probe_id, vec_id, sim, CAST(rnk AS INT) AS rnk FROM (
        SELECT a.vec_id AS probe_id, b.vec_id AS vec_id,
               round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) DESC,
                          b.vec_id) AS rnk
        FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id
        WHERE a.vec_id < 10) t
      WHERE rnk <= 5 ORDER BY probe_id, rnk""")),

    Q("q33_near_pairs", (s, d) => {
      import s.implicits._
      Similarity.nearPairs(T.embeddings(s, d), 0.3, 300)
        .orderBy($"a_id", $"b_id")
    }, Some("""
      SELECT a_id, b_id, sim FROM (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
        FROM embeddings a JOIN embeddings b
          ON a.vec_id < b.vec_id AND a.vec_id < 300 AND b.vec_id < 300) t
      WHERE sim >= 0.3 ORDER BY a_id, b_id""")),

    // rows-only: approximate NN via banded random-hyperplane LSH
    Q("q34_ann_lsh", (s, d) => {
      import s.implicits._
      val emb = T.embeddings(s, d)
      Similarity.annTopK(emb, emb.filter($"vec_id" < 10), 5)
        .select($"probe_id", $"vec_id", $"sim", $"rnk")
        .orderBy($"probe_id", $"rnk")
    }, None),

    // rows-only: IVF ANN (KMeans coarse quantizer + nprobe cell search)
    Q("q49_ann_ivf", (s, d) => {
      import s.implicits._
      val emb = T.embeddings(s, d)
      // serving shape: the cell-partitioned layout is built once (first
      // call pays the indexing job), then every query reads ONLY its
      // nprobe cells via a static partition filter — at 100 TB the scan
      // touches nprobe/nlist of the corpus, not all of it
      // keyed by source path, size AND mtime so a regenerated fixture —
      // even one of identical size — can never be served a stale layout;
      // the quantizer parameters are folded into the path by
      // ivfServedTopK itself
      val src = new java.io.File(s"$d/embeddings.parquet")
      val layout = new java.io.File(
        sys.props("java.io.tmpdir"),
        s"graft_ivf_layout_v2_${src.length()}_${src.lastModified()}_" +
          d.replaceAll("[^A-Za-z0-9]", "_")).toString
      Similarity.ivfServedTopK(emb, emb.filter($"vec_id" < 10), 5, layout)
        .select($"probe_id", $"vec_id", $"sim", $"rnk")
        .orderBy($"probe_id", $"rnk")
    }, None),

    Q("q35_vector_stats", (s, d) => {
      import s.implicits._
      val sq = aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))
      val sm = aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x.cast("double"))
      T.embeddings(s, d)
        .select($"vec_id",
          round(sqrt(sq), 6).as("l2norm"),
          round(sm / size($"embedding"), 6).as("mean_val"),
          array_min($"embedding").as("min_val"),
          array_max($"embedding").as("max_val"))
        .orderBy($"vec_id")
    }, Some("""
      SELECT vec_id,
             round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6) AS l2norm,
             round(list_sum(embedding::DOUBLE[]) / len(embedding), 6) AS mean_val,
             list_min(embedding) AS min_val,
             list_max(embedding) AS max_val
      FROM embeddings ORDER BY vec_id""")),

    // unit-normalization: the preprocessing step before cosine/IVF search
    Q("q62_normalize", (s, d) => {
      import s.implicits._
      val sq = aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))
      val norm = sqrt(sq)
      T.embeddings(s, d)
        .select($"vec_id",
          round(element_at($"embedding", 1) / norm, 6).as("e1"),
          round(element_at($"embedding", 2) / norm, 6).as("e2"),
          round(element_at($"embedding", 3) / norm, 6).as("e3"),
          round(norm, 6).as("l2"))
        .orderBy($"vec_id")
    }, Some("""
      WITH t AS (SELECT vec_id, embedding,
                        sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
                 FROM embeddings)
      SELECT vec_id,
             round(embedding[1] / nrm, 6) AS e1,
             round(embedding[2] / nrm, 6) AS e2,
             round(embedding[3] / nrm, 6) AS e3,
             round(nrm, 6) AS l2
      FROM t ORDER BY vec_id""")),

    // --- multimodal binary plumbing --------------------------------------
    Q("q40_multimodal_meta", (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .select($"doc_id",
          octet_length(encode($"text", "UTF-8")).as("n_bytes"),
          ascii(substring($"text", 1, 1)).as("first_code"))
        .select($"doc_id", $"n_bytes", $"first_code",
          (lit(64) + pmod($"n_bytes", lit(192))).as("width"),
          (lit(64) + pmod($"first_code", lit(128))).as("height"),
          lit(3).as("channels"))
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id,
                        CAST(octet_length(encode(text)) AS INT) AS n_bytes,
                        ascii(substring(text, 1, 1)) AS first_code
                 FROM documents)
      SELECT doc_id, n_bytes, first_code,
             64 + (n_bytes % 192) AS width,
             64 + (first_code % 128) AS height,
             3 AS channels
      FROM t ORDER BY doc_id""")),

    // partition-batched decode through the stub codec; the stub is
    // deterministic double arithmetic in byte order, so the oracle can
    // replay it exactly (fixture texts are pure ASCII: byte == char)
    Q("q41_multimodal_decode", (s, d) => {
      import s.implicits._
      Multimodal.decodeMeta(s, Multimodal.withPayload(T.documents(s, d), "text"))
        .select($"doc_id", $"width", $"height", $"channels", $"n_bytes",
          round($"feat_norm", 6).as("feat_norm"))
        .orderBy($"doc_id")
    }, Some("""
      WITH d AS (SELECT doc_id, text,
                        CAST(octet_length(encode(text)) AS BIGINT) AS n
                 FROM documents),
      f AS (SELECT doc_id, n,
                   CAST(64 + (n % 192) AS INT) AS width,
                   CAST(64 + (ascii(substring(text, 1, 1)) % 128) AS INT) AS height,
                   list_transform(range(0, 8), j ->
                     coalesce(list_sum(list_transform(
                       list_filter(range(1, CAST(n AS INT) + 1), i -> (i - 1) % 8 = j),
                       i -> ascii(substring(text, CAST(i AS INT), 1)) / 255.0)), 0.0)) AS feats
            FROM d)
      SELECT doc_id, width, height, 3 AS channels, n AS n_bytes,
             round(sqrt(list_sum(list_transform(feats, x -> x * x))), 6) AS feat_norm
      FROM f ORDER BY doc_id"""))
  )
}
