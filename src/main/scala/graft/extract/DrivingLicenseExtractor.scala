package graft.extract

import java.util.regex.Pattern
import graft.model.PyDict
import graft.text.PyText._

/** Driving-license (strict, doc_type "Driving License") extraction —
  * semantics of reference `pipeline/driving_license_processor.py:7-63`:
  * label regexes on the UPPERCASED full text, with a raw ≥11-char DL-number
  * fallback and a DOTALL address block up to SIGN/HOLDER.
  */
object DrivingLicenseExtractor {
  private val dlLabelPat = Pattern.compile("DL\\s*NO\\.?\\s*[:\\-]?\\s*([A-Z0-9 ]+)")
  private val dlRawPat   = Pattern.compile("\\b([A-Z]{2}[0-9]{2}[0-9\\s-]{7,15})\\b")
  private val nonAlnum   = Pattern.compile("[^A-Z0-9]")
  private val dlStrictPat = Pattern.compile("^[A-Z]{2}[0-9]{2}[0-9]{7,}$")
  private val namePat = Pattern.compile("NAME\\s*[:\\-]?\\s*([A-Za-z\\s]+?)(?=\\s+D\\.?O\\.?B|\\s+S/W/D|\\s+DOB|$)")
  private val nonUpperSpace = Pattern.compile("[^A-Z\\s]")
  private val dobPat = Pattern.compile("D\\.?O\\.?B\\.?\\s*[:\\-]?\\s*(\\d{2}-\\d{2}-\\d{4})")
  private val validPat = Pattern.compile("VALID\\s*TILL\\s*[:\\-]?\\s*(\\d{2}-\\d{2}-\\d{4})")
  private val addrPat = Pattern.compile(
    "ADDRESS\\s*[:\\-]?\\s*(.*?)\\s*(SIGN\\.|SIGN\\s+LICENCING|SIGN|HOLDER|$)", Pattern.DOTALL)
  private val wsRun = Pattern.compile("\\s+")
  private val nameVeto = Seq("HOLDER", "SIGN", "AUTHORITY")

  def extract(rawText: String, lines: Seq[String]): PyDict = {
    val data = PyDict("document_type" -> "Driving License")
    val textUpper = rawText.toUpperCase

    // 1. DL number — driving_license_processor.py:17-30
    reSearch(dlLabelPat, textUpper) match {
      case Some(m) =>
        val dlNumber = reSubLit(nonAlnum, "", m.group(1))
        if (reMatch(dlStrictPat, dlNumber).isDefined) data("dl_number") = dlNumber
      case None =>
        reSearch(dlRawPat, textUpper).foreach { m =>
          val dlNumber = reSubLit(nonAlnum, "", m.group(1))
          if (dlNumber.length >= 11) data("dl_number") = dlNumber
        }
    }

    // 2. Name — :34-39
    reSearch(namePat, textUpper).foreach { m =>
      val nameStr = strip(reSubLit(nonUpperSpace, "", strip(m.group(1))))
      if (nameStr.length > 3 && !nameVeto.exists(nameStr.contains))
        data("name") = nameStr
    }

    // 3. DOB — :42-44
    reSearch(dobPat, textUpper).foreach(m => data("dob") = m.group(1))

    // 4. Valid till — :47-49
    reSearch(validPat, textUpper).foreach(m => data("valid_till") = m.group(1))

    // 5. Address block — :52-61
    reSearch(addrPat, textUpper).foreach { m =>
      var rawAddress = m.group(1).replace("\n", " ").replace("\r", " ")
      rawAddress = reSubLit(wsRun, " ", rawAddress)
      data("address") = strip(rawAddress)
    }

    data
  }
}
