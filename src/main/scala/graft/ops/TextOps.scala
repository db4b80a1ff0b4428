package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token counting, quality scoring, language ID,
  * document fingerprinting. All but the fingerprint are pure Catalyst
  * column expressions (whole-stage codegen, no UDFs); counts are integers
  * so DuckDB oracles hash-match exactly.
  */
object TextOps {

  /** Whitespace tokens. */
  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish subword unit count: alpha runs, digit runs, single symbols. */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  def tokenCounts(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"),
      size(wsTokens(col("text"))).as("n_ws_tokens"),
      bpeishCount(col("text")).as("n_bpeish_tokens"),
      length(col("text")).as("n_chars"))
      .orderBy(col("doc_id"))

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Quality signals as exact integer counts (ratios derive downstream —
    * keeping ints makes the oracle float-free). */
  def qualityCounts(df: DataFrame): DataFrame = {
    val toks = wsTokens(col("text"))
    df.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(toks).as("n_tokens"),
      length(regexp_replace(col("text"), "[^.,;:!?]", "")).as("n_punct"),
      size(filter(toks, t => t.isin(stopwords.map(lit(_)): _*))).as("n_stopwords"),
      length(regexp_replace(col("text"), "[^A-Z]", "")).as("n_upper"))
      .orderBy(col("doc_id"))
  }

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "y", "las", "una"),
    "de" -> Seq("der", "die", "und", "das", "ein"))

  /** N-gram/stopword-marker language ID: hit counts per language plus an
    * argmax with fixed precedence (en > fr > es > de on ties). */
  def langId(df: DataFrame): DataFrame = {
    val toks = wsTokens(col("text"))
    val hitCols = langMarkers.map { case (lang, words) =>
      size(filter(toks, t => t.isin(words.map(lit(_)): _*))).as(s"${lang}_hits")
    }
    val withHits = df.select((col("doc_id") +: hitCols): _*)
    // first lang (in declared order) whose hits are > 0 and >= all others;
    // the when-chain order gives earlier languages tie precedence
    val langs = langMarkers.map(_._1)
    val pred = langs.foldRight(lit("und")) { (lang, els) =>
      val c = col(s"${lang}_hits")
      val geAll = langs.filter(_ != lang).map(l => c >= col(s"${l}_hits")).reduce(_ && _)
      when(c > lit(0) && geAll, lit(lang)).otherwise(els)
    }
    withHits.select((col("doc_id") +: langMarkers.map(m => col(s"${m._1}_hits"))
      :+ pred.as("lang_pred")): _*)
      .orderBy(col("doc_id"))
  }

  /** Winnowing fingerprint (Schleimer et al., SIGMOD'03): k-gram rolling
    * hashes, minimum per sliding window, distinct mins = the fingerprint.
    * Implemented as a typed map (sequential per doc, parallel across docs).
    */
  def fingerprints(df: DataFrame, k: Int = 5, window: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val hs = rollingHashes(text, k)
        val fp =
          if (hs.isEmpty) Array.empty[Long]
          else if (hs.length <= window) Array(hs.min)
          else hs.sliding(window).map(_.min).toArray.distinct
        (id, fp.sorted)
      }
      .toDF("doc_id", "fingerprint")
      .orderBy(col("doc_id"))
  }

  def rollingHashes(text: String, k: Int): Array[Long] = {
    val s = text
    if (s.length < k) return Array.empty
    val B = 1000003L
    var pow = 1L
    (1 until k).foreach(_ => pow *= B)
    var h = 0L
    val out = new Array[Long](s.length - k + 1)
    var i = 0
    while (i < s.length) {
      h = h * B + s.charAt(i)
      if (i >= k) h -= pow * B * s.charAt(i - k)
      if (i >= k - 1) out(i - k + 1) = h
      i += 1
    }
    out
  }
}
