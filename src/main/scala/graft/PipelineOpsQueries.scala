package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{DedupOps, MultimodalOps, SimilarityOps, TextOps}

/** Training-data pipeline operators over the `documents` / `embeddings`
  * tables (dedup, similarity search, text analysis, multimodal plumbing).
  * Integer/string-valued outputs carry exact DuckDB oracles; hash-seeded
  * ops (minhash/simhash/LSH — engine-specific hash functions) are gated by
  * unit tests + the rows-only driver check instead.
  */
object PipelineOpsQueries {
  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_dedup_exact" -> ((s, dir) => DedupOps.exact(docs(s, dir))),
    "p02_token_counts" -> ((s, dir) => TextOps.tokenCounts(docs(s, dir))),
    "p03_quality_counts" -> ((s, dir) => TextOps.qualityCounts(docs(s, dir))),
    "p04_langid" -> ((s, dir) => TextOps.langId(docs(s, dir))),
    "p05_minhash_neardup" -> ((s, dir) => DedupOps.minhashLsh(docs(s, dir))),
    "p06_simhash" -> ((s, dir) => DedupOps.simhash(docs(s, dir))),
    "p07_ann_brute_topk" -> ((s, dir) => SimilarityOps.bruteTopK(emb(s, dir))),
    "p08_ann_lsh_topk" -> ((s, dir) => SimilarityOps.lshTopK(emb(s, dir))),
    "p09_fingerprints" -> ((s, dir) => TextOps.fingerprints(docs(s, dir))),
    "p10_media_stats" -> ((s, dir) =>
      MultimodalOps.mediaStats(SparkEntry.docTable(s, dir))),
    "p12_embedding_neardup" -> ((s, dir) =>
      SimilarityOps.embeddingNearDups(emb(s, dir), minCosine = 0.8)
        .select(org.apache.spark.sql.functions.col("vec_a"),
                org.apache.spark.sql.functions.col("vec_b"))),
    "p11_shingle_counts" -> ((s, dir) => DedupOps.shingleCounts(docs(s, dir)))
  )

  val oracleSql: Map[String, String] = Map(
    "p01_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keeper_doc_id,
         count(*) AS n_docs
         FROM documents GROUP BY md5(text) ORDER BY text_hash""",
    "p02_token_counts" ->
      """SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpeish_tokens,
         length(text) AS n_chars
         FROM documents ORDER BY doc_id""",
    "p03_quality_counts" ->
      """SELECT doc_id, length(text) AS n_chars,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
         len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             t -> t IN ('the','a','of','and','to','in','is'))) AS n_stopwords,
         length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper
         FROM documents ORDER BY doc_id""",
    "p04_langid" ->
      """WITH hits AS (SELECT doc_id,
         len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             t -> t IN ('the','a','of','and','is'))) AS en_hits,
         len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             t -> t IN ('le','la','et','les','des'))) AS fr_hits,
         len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             t -> t IN ('el','los','y','las','una'))) AS es_hits,
         len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             t -> t IN ('der','die','und','das','ein'))) AS de_hits
         FROM documents)
         SELECT doc_id, en_hits, fr_hits, es_hits, de_hits,
         CASE
           WHEN en_hits > 0 AND en_hits >= fr_hits AND en_hits >= es_hits AND en_hits >= de_hits THEN 'en'
           WHEN fr_hits > 0 AND fr_hits >= en_hits AND fr_hits >= es_hits AND fr_hits >= de_hits THEN 'fr'
           WHEN es_hits > 0 AND es_hits >= en_hits AND es_hits >= fr_hits AND es_hits >= de_hits THEN 'es'
           WHEN de_hits > 0 AND de_hits >= en_hits AND de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
           ELSE 'und' END AS lang_pred
         FROM hits ORDER BY doc_id""",
    "p07_ann_brute_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
                    FROM embeddings ORDER BY vec_id LIMIT 10),
         scored AS (
           SELECT q.query_id, e.vec_id AS neighbor_id,
                  list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_emb) AS score
           FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
         ranked AS (
           SELECT query_id, neighbor_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, neighbor_id ASC) AS rank
           FROM scored)
         SELECT query_id, rank, neighbor_id FROM ranked
         WHERE rank <= 10 ORDER BY query_id, rank""",
    "p11_shingle_counts" ->
      """SELECT doc_id,
         len(list_distinct(list_transform(
           range(1, greatest(len(regexp_split_to_array(trim(text),'\s+')) - 2, 1) + 1),
           i -> array_to_string(regexp_split_to_array(trim(text),'\s+')[i:i+2], ' ')
         ))) AS n_shingles
         FROM documents ORDER BY doc_id"""
  )
}
