package graft.extract

import java.util.regex.Pattern
import graft.model.PyDict
import graft.text.PyText._

/** Aadhaar card field extraction — semantics of
  * reference `pipeline/cleaner.py:5-36` (`RegexCleaner.parse_aadhaar`).
  * Pure function over the OCR IR: (raw_text, lines) => ordered dict.
  */
object AadhaarExtractor {
  private val numPat  = Pattern.compile("\\b(\\d{4}\\s?\\d{4}\\s?\\d{4})\\b")
  private val dobPat  = Pattern.compile("\\b(\\d{2}[/\\-]\\d{2}[/\\-]\\d{4})\\b")
  private val yobPat  = Pattern.compile("Year of Birth\\s*[:\\-]?\\s*(\\d{4})", Pattern.CASE_INSENSITIVE)
  private val malePat   = Pattern.compile("\\b(Male|MALE)\\b")
  private val femalePat = Pattern.compile("\\b(Female|FEMALE)\\b")
  // cleaner.py:32 — re.match with trailing $ means anchored full-line match
  private val titleName = Pattern.compile("^[A-Z][a-z]+(\\s[A-Z][a-z]+)+$")
  private val capsName  = Pattern.compile("^[A-Z\\s]+$")
  private val vetoWords = Seq("govt", "india", "unique", "authorit", "enrollment",
    "help", "www", "dob", "year", "male", "female")

  def extract(text: String, fullTextLines: Seq[String]): PyDict = {
    val data = PyDict("document_type" -> "Aadhaar Card")

    reSearch(numPat, text).foreach { m =>
      val rawNum = m.group(1).replace(" ", "")
      data("aadhaar_number") =
        s"${rawNum.substring(0, 4)} ${rawNum.substring(4, 8)} ${rawNum.substring(8)}"
    }

    reSearch(dobPat, text).foreach(m => data("dob") = m.group(1).replace("/", "-"))

    if (!data.contains("dob"))
      reSearch(yobPat, text).foreach(m => data("dob") = s"${m.group(1)}-01-01")

    if (reTest(malePat, text)) data("gender") = "Male"
    else if (reTest(femalePat, text)) data("gender") = "Female"

    val lines = fullTextLines.map(strip).filter(_.nonEmpty)
    val it = lines.iterator
    var done = false
    while (it.hasNext && !done) {
      val line = it.next()
      val lower = line.toLowerCase
      if (!vetoWords.exists(lower.contains)) {
        if (reMatch(titleName, line).isDefined || reMatch(capsName, line).isDefined) {
          if (splitWs(line).length >= 2) {
            data("name") = title(line)
            done = true
          }
        }
      }
    }
    data
  }
}
