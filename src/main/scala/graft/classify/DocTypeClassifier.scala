package graft.classify

import java.util.regex.Pattern
import graft.model.{JObj, PyDict}
import graft.extract._
import graft.text.PyText._

/** Document-type classification + extraction dispatch.
  *
  * Primary ordered predicate chain — reference `pipeline/cleaner.py:404-424`
  * (`extract_document`, first match wins); secondary DL/Passport routing on
  * the LOWERCASED text — reference `pipeline/extractor.py:53-94`. Order is
  * semantics: a text containing both MALE and a PAN number classifies
  * Aadhaar-first.
  */
object DocTypeClassifier {
  private val aadhaarNumPat = Pattern.compile("\\b\\d{4}\\s?\\d{4}\\s?\\d{4}\\b")
  private val panPat = Pattern.compile("[A-Z]{5}\\d{4}[A-Z]")

  // extractor.py:60-73 — searched against raw_text.lower()
  private val dlPatterns = Seq(
    "dl\\sno", "driving\\slicence", "driving\\slicense",
    "valid\\sthroughout\\sindia", "\\bmcwg\\b", "\\blmv\\b", "\\bform\\s7\\b"
  ).map(Pattern.compile(_))

  // extractor.py:75-89 — searched against lowered text AND its space-stripped
  // variant (the uppercase-only patterns are dead on the lowered input; the
  // reference keeps them, so we do too)
  private val passportPatterns = Seq(
    "passport", "p<ind", "republic\\s*of\\s*india", "/nationality",
    "/placeofssue", "x[0-9]{7}", "\\bp<"
  ).map(Pattern.compile(_))

  def isDrivingLicense(textLower: String): Boolean =
    dlPatterns.exists(p => reTest(p, textLower))

  def isPassport(textLower: String): Boolean = {
    val textClean = textLower.replace(" ", "")
    passportPatterns.exists(p => reTest(p, textLower) || reTest(p, textClean))
  }

  /** Primary chain — cleaner.py:404-424. */
  def extractDocument(rawText: String, lines: Seq[String]): PyDict = {
    val upper = rawText.toUpperCase
    var baseData = new PyDict

    if (reTest(aadhaarNumPat, rawText) || upper.contains("MALE") ||
        upper.contains("FEMALE") || upper.contains("DOB"))
      baseData = AadhaarExtractor.extract(rawText, lines)

    if (!baseData.truthy("document_type") && reTest(panPat, rawText))
      baseData = PanExtractor.extract(rawText, lines)

    if (!baseData.truthy("document_type") &&
        (upper.contains("UNIVERSITY") || upper.contains("MARKS") || upper.contains("RESULT")))
      baseData = MarksheetExtractor.extract(rawText, lines)

    if (!baseData.truthy("document_type") &&
        (rawText.contains("DL No") || rawText.contains("DLNo") ||
         upper.contains("DRIVING LICENCE") || upper.contains("THROUGHOUT INDIA") ||
         upper.contains("LICENCING AUTHORITY")))
      baseData = DlExtractor.extract(rawText, lines)

    if (!baseData.truthy("document_type"))
      baseData("document_type") = "Unknown"

    baseData
  }

  /** Full regex-extraction stage incl. the secondary routing —
    * extractor.py:50-94. */
  def extractWithRouting(rawText: String, lines: Seq[String]): PyDict = {
    var extracted = extractDocument(rawText, lines)
    if (extracted.get("document_type").contains("Unknown")) {
      val textLower = rawText.toLowerCase
      if (isDrivingLicense(textLower))
        extracted = DrivingLicenseExtractor.extract(rawText, lines)
      else if (isPassport(textLower))
        extracted = PassportExtractor.extract(rawText, lines)
    }
    extracted
  }

  /** Donut fill-missing merge — extractor.py:102-107: only keys that are
    * absent or falsy in the target are copied, and only when the donut dict
    * contains a document_type key. Note document_type itself is "Unknown"
    * (truthy) at this point, so the type is never overridden. */
  def mergeDonut(extracted: PyDict, donut: Option[JObj]): Unit = donut match {
    case Some(d) if d.contains("document_type") =>
      d.fields.foreach { case (k, v) =>
        if (!extracted.contains(k) || PyDict.isFalsy(extracted(k)))
          extracted(k) = v
      }
    case _ =>
  }
}
