package graft.classify

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-oracled classifier query (x06): runs the REAL
  * `DocTypeClassifier.extractWithRouting` (the reference's
  * `cleaner.py:404-424` primary chain + `extractor.py:53-94` secondary
  * DL/Passport routing) over the driver's `documents.parquet`.
  *
  * The driver corpus is trigger-free word salad (verified: its vocabulary
  * contains none of the chain's marker words/patterns), so trigger markers
  * are planted deterministically by `doc_id % 8` — one suffix per branch of
  * the precedence chain, including a both-triggers suffix (FEMALE + a PAN
  * number) that exercises Aadhaar-before-PAN precedence. Every extractor
  * sets `document_type` unconditionally (truthy), so the chain decision is a
  * pure function of the predicates and the DuckDB oracle can replicate it
  * order-exactly as a CASE over the same augmented text.
  */
object ClassifyQuery {

  /** Planted suffix per `doc_id % 8` — one per chain branch. */
  val suffixes: Array[String] = Array(
    " enrollment id 1234 5678 9012",          // 0: Aadhaar via number regex
    " FEMALE holder ABCDE1234F",              // 1: Aadhaar (MALE⊂FEMALE) beats PAN
    " income tax pan ABCDE1234F",             // 2: PAN regex
    " issued by the state UNIVERSITY board",  // 3: Marksheet (UNIVERSITY)
    " DL No issued by rto",                   // 4: primary DL ("DL No", case-sensitive)
    " vehicle class mcwg only",               // 5: secondary DL routing (\bmcwg\b)
    " republic of india passport office",     // 6: secondary passport routing
    "")                                       // 7: no trigger → Unknown

  def augmented(s: SparkSession, dir: String): DataFrame = {
    val suffix = suffixes.zipWithIndex.foldRight(lit(""): org.apache.spark.sql.Column) {
      case ((suf, i), els) => when(pmod(col("doc_id"), lit(8)) === i, lit(suf)).otherwise(els)
    }
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), concat(col("text"), suffix).as("text"))
  }

  def run(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    augmented(s, dir).as[(Long, String)]
      .map { case (id, text) =>
        val d = DocTypeClassifier.extractWithRouting(text, Seq(text))
        (id, d("document_type").asInstanceOf[String])
      }
      .toDF("doc_id", "document_type") // per-doc output: no global sort
  }

  /** x07 planted suffixes (doc_id % 4) — full field payloads so the
    * Aadhaar/PAN EXTRACTORS (not just the classifier) are driver-verified:
    * number reformat (cleaner.py:27-29), dob slash→dash (cleaner.py:31),
    * Year-of-Birth fallback (cleaner.py:34-35), gender word-boundary
    * precedence (cleaner.py:37-38), PAN number + dob (cleaner.py:43-44). */
  val fieldSuffixes: Array[String] = Array(
    " Year of Birth: 1984 FEMALE 1234 5678 9012", // Aadhaar: yob fallback + gender
    " MALE dob 21/07/1991 5678 1234 0000",        // Aadhaar: slash dob + reformat
    " income tax FGHIJ5678K 01-02-1983",          // PAN: number + dash dob
    "")                                           // Unknown: all fields null

  def augmentedFields(s: SparkSession, dir: String): DataFrame = {
    val suffix = fieldSuffixes.zipWithIndex.foldRight(lit(""): org.apache.spark.sql.Column) {
      case ((suf, i), els) => when(pmod(col("doc_id"), lit(4)) === i, lit(suf)).otherwise(els)
    }
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), concat(col("text"), suffix).as("text"))
  }

  def runFields(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    augmentedFields(s, dir).as[(Long, String)]
      .map { case (id, text) =>
        val d = DocTypeClassifier.extractWithRouting(text, Seq(text))
        def f(k: String): String = d.get(k).map(_.toString).orNull
        (id, f("document_type"), f("aadhaar_number"), f("pan_number"),
          f("dob"), f("gender"))
      }
      .toDF("doc_id", "document_type", "aadhaar_number", "pan_number",
        "dob", "gender") // per-doc output: no global sort
  }

  /** SQL CASE for the planted suffix (mirrors `augmented`). */
  private val suffixSql: String = {
    val whens = suffixes.zipWithIndex.map { case (suf, i) =>
      s"WHEN doc_id % 8 = $i THEN '$suf'"
    }.mkString(" ")
    s"(text || CASE $whens END)"
  }

  private val fieldSuffixSql: String = {
    val whens = fieldSuffixes.zipWithIndex.map { case (suf, i) =>
      s"WHEN doc_id % 4 = $i THEN '$suf'"
    }.mkString(" ")
    s"(text || CASE $whens END)"
  }

  /** Order-exact SQL replica of the classification chain:
    * cleaner.py:404-424 primary branches (each extractor sets its type
    * unconditionally, so branch ⇒ type), then extractor.py:53-94 secondary
    * routing on the lowered (and space-stripped, for passport) text. */
  val oracleSql: Map[String, String] = Map(
    "x06_classify_driver_docs" ->
      s"""WITH aug AS (SELECT doc_id, $suffixSql AS t2 FROM documents)
         SELECT doc_id, CASE
           WHEN regexp_matches(t2, '\\b\\d{4}\\s?\\d{4}\\s?\\d{4}\\b')
                OR contains(upper(t2), 'MALE') OR contains(upper(t2), 'FEMALE')
                OR contains(upper(t2), 'DOB')
             THEN 'Aadhaar Card'
           WHEN regexp_matches(t2, '[A-Z]{5}\\d{4}[A-Z]') THEN 'PAN Card'
           WHEN contains(upper(t2), 'UNIVERSITY') OR contains(upper(t2), 'MARKS')
                OR contains(upper(t2), 'RESULT')
             THEN 'Marksheet'
           WHEN contains(t2, 'DL No') OR contains(t2, 'DLNo')
                OR contains(upper(t2), 'DRIVING LICENCE')
                OR contains(upper(t2), 'THROUGHOUT INDIA')
                OR contains(upper(t2), 'LICENCING AUTHORITY')
             THEN 'driving_license'
           WHEN regexp_matches(lower(t2), 'dl\\sno|driving\\slicence|driving\\slicense|valid\\sthroughout\\sindia|\\bmcwg\\b|\\blmv\\b|\\bform\\s7\\b')
             THEN 'Driving License'
           WHEN regexp_matches(lower(t2), 'passport|p<ind|republic\\s*of\\s*india|/nationality|/placeofssue|x[0-9]{7}|\\bp<')
                OR regexp_matches(replace(lower(t2), ' ', ''), 'passport|p<ind|republic\\s*of\\s*india|/nationality|/placeofssue|x[0-9]{7}|\\bp<')
             THEN 'passport'
           ELSE 'Unknown' END AS document_type
         FROM aug ORDER BY doc_id""",
    // field-extraction replica: the Aadhaar branch predicate (cleaner.py:
    // 404-409), then each field exactly as the extractor computes it —
    // 12-digit reformat, dob slash→dash with Year-of-Birth fallback, gender
    // word-boundary test (MALE before FEMALE), PAN number + dob. The
    // planted x07 payloads make every field path non-vacuous.
    "x07_extract_fields" ->
      s"""WITH aug AS (SELECT doc_id, $fieldSuffixSql AS t2 FROM documents),
         cls AS (SELECT doc_id, t2,
           regexp_matches(t2, '\\b\\d{4}\\s?\\d{4}\\s?\\d{4}\\b')
             OR contains(upper(t2), 'MALE') OR contains(upper(t2), 'FEMALE')
             OR contains(upper(t2), 'DOB') AS is_aadhaar,
           regexp_matches(t2, '[A-Z]{5}\\d{4}[A-Z]') AS has_pan
           FROM aug)
         SELECT doc_id,
           CASE WHEN is_aadhaar THEN 'Aadhaar Card'
                WHEN has_pan THEN 'PAN Card'
                ELSE 'Unknown' END AS document_type,
           CASE WHEN is_aadhaar
                 AND regexp_matches(t2, '\\b\\d{4}\\s?\\d{4}\\s?\\d{4}\\b')
             THEN substr(replace(regexp_extract(t2,
                    '\\b(\\d{4}\\s?\\d{4}\\s?\\d{4})\\b', 1), ' ', ''), 1, 4)
                  || ' ' ||
                  substr(replace(regexp_extract(t2,
                    '\\b(\\d{4}\\s?\\d{4}\\s?\\d{4})\\b', 1), ' ', ''), 5, 4)
                  || ' ' ||
                  substr(replace(regexp_extract(t2,
                    '\\b(\\d{4}\\s?\\d{4}\\s?\\d{4})\\b', 1), ' ', ''), 9)
             END AS aadhaar_number,
           CASE WHEN NOT is_aadhaar AND has_pan
             THEN regexp_extract(t2, '[A-Z]{5}\\d{4}[A-Z]')
             END AS pan_number,
           CASE WHEN is_aadhaar OR (NOT is_aadhaar AND has_pan) THEN
             CASE WHEN regexp_matches(t2, '\\b\\d{2}[/\\-]\\d{2}[/\\-]\\d{4}\\b')
               THEN replace(regexp_extract(t2,
                      '\\b(\\d{2}[/\\-]\\d{2}[/\\-]\\d{4})\\b', 1), '/', '-')
               WHEN is_aadhaar
                    AND regexp_matches(t2, '(?i)year of birth\\s*[:\\-]?\\s*\\d{4}')
               THEN regexp_extract(t2,
                      '(?i)year of birth\\s*[:\\-]?\\s*(\\d{4})', 1) || '-01-01'
               END
             END AS dob,
           CASE WHEN is_aadhaar THEN
             CASE WHEN regexp_matches(t2, '\\b(Male|MALE)\\b') THEN 'Male'
                  WHEN regexp_matches(t2, '\\b(Female|FEMALE)\\b') THEN 'Female'
                  END
             END AS gender
         FROM cls ORDER BY doc_id""")
}
