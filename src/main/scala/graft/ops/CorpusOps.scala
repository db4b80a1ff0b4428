package graft.ops

import java.util.regex.Pattern
import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Corpus-statistics operators a training-data pipeline runs ahead of
  * filtering/mixing: vocabulary document-frequency (IDF tables), PII
  * scrubbing, repetition-based quality signals (Gopher-style), and
  * source/language mixture rollups. All outputs are integer/string-exact
  * so the DuckDB oracles hash-match. */
object CorpusOps {
  private val wsPat = Pattern.compile("\\s+")

  /** Vocabulary stats: per token, the number of documents containing it
    * (doc_freq — the IDF numerator) and its total term frequency. One
    * typed pass per doc (per-doc counts in a hash map), then one keyed
    * partial+final aggregation — the vocabulary table this produces is
    * what tokenizer training / IDF weighting consumes. Scale shape:
    * explode-free map + single shuffle keyed by token. */
  def tokenDf(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .flatMap { case (_, text) =>
        val counts = new java.util.HashMap[String, Long]()
        wsPat.split(text.trim).foreach { t =>
          counts.merge(t, 1L, (a, b) => a + b)
        }
        import scala.jdk.CollectionConverters._
        counts.asScala.iterator.map { case (t, n) => (t, n) }
      }
      .toDF("token", "n")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("doc_freq"), sum(col("n")).as("term_freq"))
  }

  // RE2-compatible patterns (the oracle runs them in DuckDB): no
  // lookaround, no backrefs.
  val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val longDigitPat = "[0-9]{10,}"

  /** PII scrub: emails → <EMAIL>, 10+-digit runs → <PHONE>. Output is the
    * scrubbed text's md5 (exact equality gate without shipping full text
    * through the compare) plus the match counts. Pure codegen'd column
    * expressions — regexp_replace/regexp_count run inside whole-stage
    * codegen, no UDF. */
  def piiScrub(df: DataFrame, textCol: Column = col("text")): DataFrame =
    df.select(
      col("doc_id"),
      size(regexp_extract_all(textCol, lit(emailPat), lit(0))).as("n_emails"),
      size(regexp_extract_all(
        regexp_replace(textCol, emailPat, "<EMAIL>"),
        lit(longDigitPat), lit(0))).as("n_phones"),
      md5(regexp_replace(
        regexp_replace(textCol, emailPat, "<EMAIL>"),
        longDigitPat, "<PHONE>").cast("binary")).as("scrubbed_md5"))

  /** Repetition/diversity quality signals (Gopher-style filters): token
    * count, distinct-token count, and the highest bigram repetition count.
    * Typed single pass per doc. */
  def repetitionStats(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val toks = wsPat.split(text.trim)
        val distinct = new java.util.HashSet[String]()
        toks.foreach(distinct.add)
        val bigrams = new java.util.HashMap[String, Int]()
        var top = 0
        var i = 0
        while (i < toks.length - 1) {
          val b = toks(i) + " " + toks(i + 1)
          val n = bigrams.merge(b, 1, (a, x) => a + x)
          if (n > top) top = n
          i += 1
        }
        (id, toks.length, distinct.size, top)
      }
      .toDF("doc_id", "n_tokens", "n_distinct_tokens", "top_bigram_count")
  }

  /** Source/language mixture rollup — the sampling-weights table a corpus
    * mixer consumes. Plain partial+final hash aggregation. */
  def sourceRollup(df: DataFrame): DataFrame =
    df.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        max(col("n_chars")).as("max_chars"))

  /** Count-Min Sketch of token frequencies (Cormode & Muthukrishnan '05):
    * `depth` hash rows × `width` buckets; every token occurrence increments
    * one bucket per row, and a point estimate is the min over rows. The
    * sketch is THE mergeable fixed-size summary for heavy-hitter detection
    * on unbounded vocabularies: per-partition sub-sketches merge by cell
    * addition (here: the same partial+final hash aggregation), so at 100 TB
    * the shuffle is depth×width cells per partition regardless of corpus
    * size. Row hashes are salted md5-low63 (= DuckDB `md5_number_lower`
    * masked), so the cell table is exactly replicable in SQL. Output:
    * nonzero cells (row, bucket, count). */
  def countMinSketch(df: DataFrame, depth: Int = 4, width: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("text")).as[String]
      .flatMap { text =>
        // pre-aggregate per doc: emit each cell once with its local count
        val cells = new java.util.HashMap[Long, Long]() // (row<<32|bucket) -> n
        wsPat.split(text.trim).foreach { t =>
          var r = 0
          while (r < depth) {
            val b = (TextOps.md5Low63(t + "#" + r) % width).toInt
            cells.merge((r.toLong << 32) | b, 1L, (a, x) => a + x)
            r += 1
          }
        }
        import scala.jdk.CollectionConverters._
        cells.asScala.iterator.map { case (k, n) =>
          ((k >>> 32).toInt, (k & 0xffffffffL).toInt, n)
        }
      }
      .toDF("row", "bucket", "n")
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("n")).as("count"))
  }
}
