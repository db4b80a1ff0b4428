package graft.extract

import java.util.regex.Pattern
import graft.model.PyDict
import graft.text.PyText._

/** PAN card field extraction — semantics of
  * reference `pipeline/cleaner.py:38-98` (`RegexCleaner.parse_pan`):
  * label-based name/father (value on line i+1 with stop-word veto) plus the
  * positional fallback (father = dob−1 line, name = dob−2 line).
  */
object PanExtractor {
  private val panPat = Pattern.compile("[A-Z]{5}[0-9]{4}[A-Z]")
  private val dobPat = Pattern.compile("\\b(\\d{2}[/-]\\d{2}[/-]\\d{4})\\b")
  private val anyDate = Pattern.compile("\\b\\d{2}[/-]\\d{2}[/-]\\d{4}\\b")
  private val fnameVeto = Seq("Number", "Card", "Signature", "Date", "DOB")
  private val nameVeto  = Seq("Number", "Card", "Father", "Mother")
  private val posVeto   = Seq("GOVT", "TAX", "DEPARTMENT", "INDIA", "INCOME")

  def extract(text: String, fullTextLines: Seq[String]): PyDict = {
    val data = PyDict("document_type" -> "PAN Card")

    reSearch(panPat, text).foreach(m => data("pan_number") = m.group(0))
    reSearch(dobPat, text).foreach(m => data("dob") = m.group(1).replace("/", "-"))

    val lines = fullTextLines.map(strip).filter(_.nonEmpty)
    var foundName = false
    var foundFname = false

    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      if (line.contains("Father") || line.contains("Mother")) {
        if (i + 1 < lines.length) {
          val candidate = lines(i + 1)
          if (!fnameVeto.exists(candidate.contains)) {
            data("father_name") = candidate
            foundFname = true
          }
        }
        // cleaner.py:63 `continue` — the Name branch is skipped for this line
      } else if (line.contains("Name")) {
        // "Father"/"Mother" already excluded by the branch above
        if (i + 1 < lines.length) {
          val candidate = lines(i + 1)
          if (!nameVeto.exists(candidate.contains)) {
            data("name") = candidate
            foundName = true
          }
        }
      }
      i += 1
    }

    // Positional heuristic — cleaner.py:73-96
    if (data.contains("dob") && (!foundName || !foundFname)) {
      val dob = data("dob").asInstanceOf[String]
      val dobStr = dob.replace("-", "/")
      var dobIndex = -1
      var j = 0
      while (j < lines.length && dobIndex == -1) {
        val line = lines(j)
        if (line.contains(dobStr) || line.contains(dob) || reTest(anyDate, line))
          dobIndex = j
        j += 1
      }
      if (dobIndex >= 2) {
        if (!foundFname) {
          val fnameCandidate = lines(dobIndex - 1)
          if (!posVeto.exists(fnameCandidate.toUpperCase.contains))
            data("father_name") = fnameCandidate
        }
        if (!foundName) {
          val nameCandidate = lines(dobIndex - 2)
          if (!posVeto.exists(nameCandidate.toUpperCase.contains))
            data("name") = nameCandidate
        }
      }
    }
    data
  }
}
