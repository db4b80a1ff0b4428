package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (embedding: array<float>). Brute-force cosine top-k as the exactness
  * baseline; a signed-random-projection (LSH) bucketed variant as the scale
  * path — at 10^12 rows the bucket join prunes the candidate set by ~2^bits
  * while the brute path stays for verification. Dot products are Catalyst
  * `zip_with`+`aggregate` expressions (codegen), not UDFs.
  */
object SimilarityOps {

  /** Cosine similarity between two array<float/double> columns, computed in
    * double. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  /** Brute-force cosine top-k: the first `numQueries` vectors (by vec_id)
    * are the query set (broadcast — small side), ranked against the whole
    * table. Output is integer-only (query, rank, neighbor) so the oracle is
    * float-free; ties break by neighbor id. */
  def bruteTopK(emb: DataFrame, numQueries: Int = 10, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val queries = emb.orderBy(col("vec_id")).limit(numQueries)
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("q_emb"))
    val scored = emb
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("n_emb"))
      .crossJoin(broadcast(queries))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_emb"), col("n_emb")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Deterministic random hyperplanes for sign-LSH. */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rng = new graft.io.Corpus.Rng(seed)
    Array.fill(bits)(Array.fill(dim)(rng.nextDouble() * 2 - 1))
  }

  /** Sign-random-projection bucket id per vector (the IVF/LSH scale path):
    * vectors in the same bucket are ANN candidates; search cost drops from
    * O(N) to O(N / 2^bits) per query at the cost of recall. */
  def lshBuckets(emb: DataFrame, bits: Int = 8): DataFrame = {
    val planes = hyperplanes(64, bits)
    val bucket = (0 until bits).map { b =>
      val dot = aggregate(
        zip_with(col("embedding").cast("array<double>"),
          lit(planes(b)), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, c) => a + c)
    emb.select(col("vec_id"), bucket.as("bucket"))
  }

  /** Bucketed ANN top-k: same ranking as bruteTopK but candidates are
    * restricted to the query's LSH bucket. */
  def lshTopK(emb: DataFrame, numQueries: Int = 10, k: Int = 10,
              bits: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withBucket = emb.join(lshBuckets(emb, bits), "vec_id")
    val queries = withBucket.orderBy(col("vec_id")).limit(numQueries)
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("q_emb"),
        col("bucket").as("q_bucket"))
    val scored = withBucket
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("n_emb"), col("bucket"))
      .join(broadcast(queries), col("bucket") === col("q_bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_emb"), col("n_emb")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets: pairs in the
    * same bucket whose cosine ≥ threshold. */
  def embeddingNearDups(emb: DataFrame, bits: Int = 8,
                        minCosine: Double = 0.95): DataFrame = {
    val withBucket = emb.join(lshBuckets(emb, bits), "vec_id")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"),
        col("bucket"))
    withBucket.as("l").join(withBucket.as("r"),
        col("l.bucket") === col("r.bucket") &&
        col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"),
        cosine(col("l.e"), col("r.e")).as("score"))
      .where(col("score") >= minCosine)
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
