package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import java.util.regex.Pattern

/** Deduplication operators over the `documents` table: exact (hash
  * group-by), MinHash+LSH near-dup (shingle → minhash signature → banded
  * bucket join → exact-Jaccard verify), SimHash hamming near-dup, and
  * n-gram Jaccard. Built on Catalyst higher-order functions + xxhash64 —
  * no UDFs on the hot path, all shuffles are keyed group-bys over small
  * derived keys (bands/buckets), which is what survives a 100× scale-up.
  */
object DedupOps {
  private val wsPat = Pattern.compile("\\s+")

  /** Exact dedup: md5(text) → keeper = min(doc_id), duplicate count. */
  def exact(df: DataFrame): DataFrame =
    df.select(col("doc_id"), md5(col("text").cast("binary")).as("text_hash"))
      .groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("keeper_doc_id"),
           count(lit(1)).as("n_docs"))
      .orderBy(col("text_hash"))

  /** Distinct word w-shingle count per doc — typed map: the Column
    * formulation re-inlines the tokenizer per array element (O(tokens²),
    * measured 30×+ slowdowns). */
  def shingleCounts(df: DataFrame, w: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val toks = wsPat.split(text.trim)
        val n =
          if (toks.length < w) 1
          else Array.tabulate(toks.length - w + 1)(i =>
            toks.slice(i, i + w).mkString(" ")).distinct.length
        (id, n)
      }
      .toDF("doc_id", "n_shingles")
      .orderBy(col("doc_id"))
  }

  /** Word w-shingles of the text as an array column. */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = split(trim(text), "\\s+")
    when(size(toks) < w, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - w),
        i => concat_ws(" ", slice(toks, i + 1, lit(w)))))
  }

  /** splitmix64 finalizer — cheap per-seed derived hashes so each shingle
    * is hashed ONCE and the `numHashes` minhash lanes reuse the base hash. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature + band keys in ONE pass per row (typed map).
    * A pure-Catalyst formulation re-inlines the 64-min signature expression
    * into every band key (measured 30× blowup), so the per-row loop runs as
    * a typed map instead: O(shingles × numHashes) exactly once. */
  def minhashBands(df: DataFrame, w: Int, bands: Int,
                   rowsPerBand: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val numHashes = bands * rowsPerBand
    df.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val toks = wsPat.split(text.trim)
        val sh: Array[String] =
          if (toks.length < w) Array(toks.mkString(" "))
          else Array.tabulate(toks.length - w + 1)(i =>
            toks.slice(i, i + w).mkString(" ")).distinct
        val sig = Array.fill(numHashes)(Long.MaxValue)
        sh.foreach { s =>
          val base = Corpus64.hash(s)
          var i = 0
          while (i < numHashes) {
            val h = mix64(base ^ (i * 0x632be59bd9b4e019L))
            if (h < sig(i)) sig(i) = h
            i += 1
          }
        }
        val bandKeys = Array.tabulate(bands) { b =>
          var h = b.toLong
          var r = 0
          while (r < rowsPerBand) { h = mix64(h ^ sig(b * rowsPerBand + r)); r += 1 }
          h
        }
        (id, sh.toSeq, bandKeys.toSeq)
      }
      .toDF("doc_id", "sh", "band_keys")
  }

  /** MinHash + LSH near-duplicate candidate pairs with exact-Jaccard
    * verification. bands×rowsPerBand = signature length; docs sharing any
    * band bucket become candidates; candidates are verified with the exact
    * shingle-set Jaccard (integer intersection/union sizes).
    */
  def minhashLsh(df: DataFrame, w: Int = 3, bands: Int = 16,
                 rowsPerBand: Int = 4, minJaccardPct: Int = 60): DataFrame = {
    val banded = minhashBands(df, w, bands, rowsPerBand)
      .select(col("doc_id"), col("sh"),
        posexplode(col("band_keys")).as(Seq("band_id", "band_key")))

    // bucket join → unordered candidate pairs (a < b), deduped across bands
    val candidates = banded.as("l").join(banded.as("r"),
        col("l.band_id") === col("r.band_id") &&
        col("l.band_key") === col("r.band_key") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        col("l.sh").as("sh_a"), col("r.sh").as("sh_b"))
      .dropDuplicates("doc_a", "doc_b")

    // exact verify: Jaccard as integer intersection/union sizes
    candidates
      .withColumn("n_inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("n_union", size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("n_inter") * 100 >= col("n_union") * minJaccardPct)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_union"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 64-bit SimHash per document (token-hash bit voting), plus 16-bit band
    * keys for hamming-distance bucketing at scale. Typed map: the bit-vote
    * loop is per-row sequential, parallel across rows. */
  def simhash(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val votes = new Array[Int](64)
        wsPat.split(text).foreach { tok =>
          val h = Corpus64.hash(tok)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        var sig = 0L
        var b = 0
        while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
        (id, sig,
          (sig & 0xffffL), ((sig >>> 16) & 0xffffL),
          ((sig >>> 32) & 0xffffL), ((sig >>> 48) & 0xffffL))
      }
      .toDF("doc_id", "simhash", "band0", "band1", "band2", "band3")
      .orderBy(col("doc_id"))
  }

  /** SimHash near-dup pairs: docs sharing any 16-bit band (≤3 differing
    * bands ⇐ hamming ≤ 3 guaranteed candidates), verified by exact hamming
    * distance ≤ maxHamming. */
  def simhashPairs(df: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(df)
    val bandCols = (0 to 3).map(i => s"band$i")
    val exploded = sh.select(col("doc_id"), col("simhash"),
      posexplode(array(bandCols.map(col): _*)).as(Seq("band_id", "band_key")))
    exploded.as("l").join(exploded.as("r"),
        col("l.band_id") === col("r.band_id") &&
        col("l.band_key") === col("r.band_key") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .where(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }
}

/** FNV-1a 64 for simhash token hashing (stable across JVMs, unlike
  * String.hashCode which is 32-bit). */
object Corpus64 {
  def hash(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }
}
