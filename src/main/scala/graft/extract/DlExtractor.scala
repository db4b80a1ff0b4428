package graft.extract

import java.util.regex.Pattern
import scala.collection.mutable
import graft.model.PyDict
import graft.text.PyText._

/** Driving-license (heuristic, doc_type "driving_license") extraction —
  * semantics of reference `pipeline/cleaner.py:257-402` (`parse_dl`):
  * per-line label matching with i±1 lookahead/lookbehind, vehicle-class
  * harvesting with nearest-date association + dedup-by-class, a 4-line
  * ADDRESS block scan with TOWN/STREET splitting, pincode and RTO lines.
  */
object DlExtractor {
  private val formPat = Pattern.compile("FORM\\s*-\\s*\\d+", Pattern.CASE_INSENSITIVE)
  private val datePat = Pattern.compile("\\d{2}-\\d{2}-\\d{4}")
  private val pinPat  = Pattern.compile("\\b\\d{6}\\b")
  private val addrSplitPat = Pattern.compile("[,|]")
  private val townSplitPat = Pattern.compile("(?i)(TOWN\\b)")

  def extract(text: String, fullTextLines: Seq[String]): PyDict = {
    val address = new PyDict
    val vehicleClasses = mutable.Buffer.empty[Any]
    val data = PyDict(
      "document_type" -> "driving_license",
      "vehicle_classes" -> vehicleClasses,
      "address" -> address
    )

    val lines = fullTextLines.map(strip).filter(_.nonEmpty).toVector

    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      val upper = line.toUpperCase

      if (upper.contains("FORM"))
        reSearch(formPat, line).foreach(m => data("form_number") = m.group(0).toUpperCase)

      if (line.contains("DL No") || line.contains("DLNo") || line.startsWith("DL")) {
        if (line.contains(":") && splitLit(line, ":").length > 1)
          data("dl_number") = strip(splitLit(line, ":")(1))
        else if (i + 1 < lines.length)
          data("dl_number") = strip(lines(i + 1).replace(":", ""))
      }

      if (upper.contains("DOI") && !upper.contains("CDOI"))
        reSearch(datePat, line).foreach(m => data("date_of_issue") = m.group(0))

      if (upper == "NAME") {
        if (i + 1 < lines.length)
          data("name") = strip(lines(i + 1).replace(":", ""))
      }

      if (upper.contains("D.O.B") || upper.contains("DOB")) {
        if (i + 1 < lines.length && reMatch(datePat, lines(i + 1)).isDefined)
          data("date_of_birth") = lines(i + 1)
        else
          reSearch(datePat, line).foreach(m => data("date_of_birth") = m.group(0))
      }

      if (upper.contains("VALIDTILL") || upper.contains("VALID TILL"))
        reSearch(datePat, line).foreach(m => data("valid_till") = m.group(0))

      if (upper.contains("THROUGHOUT INDIA"))
        data("national_validity") = strip(line)

      if (upper == "S/O" || upper == "SLO" || upper == "D/O" || upper == "W/O" ||
          upper.contains("S/O") || upper.contains("SLO")) {
        if (line.contains(":") && splitLit(line, ":").length > 1)
          data("father_name") = strip(splitLit(line, ":")(1))
        else if (i + 1 < lines.length)
          data("father_name") = strip(lines(i + 1).replace(":", ""))
      }

      // Vehicle classes — cleaner.py:314-336
      if (upper.contains("MCWG") || upper.contains("LMV") || upper.contains("HMV") ||
          upper.contains("MCWOG")) {
        var vclass = ""
        if (upper.contains("MCWG")) vclass = "MCWG"
        else if (upper.contains("LMV")) vclass = "LMV"
        else if (upper.contains("HMV")) vclass = "HMV"
        else if (upper.contains("MCWOG")) vclass = "MCWOG"

        var issueDt = ""
        if (i + 1 < lines.length && reMatch(datePat, lines(i + 1)).isDefined)
          issueDt = lines(i + 1)
        else if (i - 1 >= 0 && reMatch(datePat, lines(i - 1)).isDefined)
          issueDt = lines(i - 1)
        else if (upper.contains("DOI"))
          reSearch(datePat, line).foreach(m => issueDt = m.group(0))
        else
          reSearch(datePat, line).foreach(m => issueDt = m.group(0))

        val already = vehicleClasses.exists {
          case vc: PyDict => vc.get("class").contains(vclass)
          case _          => false
        }
        if (vclass.nonEmpty && !already)
          vehicleClasses.append(PyDict("class" -> vclass, "issue_date" -> issueDt))
      }

      // Address block — cleaner.py:339-396
      if (upper.contains("ADDRESS")) {
        var fullAddress = ""
        if (line.contains(":"))
          fullAddress += strip(splitLit(line, ":")(1)) + " "
        var j = i + 1
        var broke = false
        while (j < math.min(i + 5, lines.length) && !broke) {
          val addrLine = lines(j)
          if (addrLine.contains("Sign") || addrLine.contains("Authority") ||
              addrLine.contains("RTO")) broke = true
          else { fullAddress += addrLine + " "; j += 1 }
        }
        fullAddress = strip(fullAddress)

        if (fullAddress.nonEmpty) {
          address("full_raw_address") = fullAddress
          val parts = addrSplitPat.split(fullAddress, -1).toVector.map(strip).filter(_.nonEmpty)

          if (parts.nonEmpty) {
            val streetVal = parts(0)
            // re.split with a capturing group includes the delimiter text
            val streetParts = reSplitWithGroups(townSplitPat, streetVal)
              .map(strip).filter(_.nonEmpty)

            if (streetParts.length > 1) {
              address("street") = strip(streetParts(0).replace("TOWN", ""))
              val ws = splitWs(streetParts(0))
              address("area") = (if (ws.nonEmpty) ws.last else "") + " TOWN"
            } else if (streetVal.toUpperCase.contains("STREET") && streetVal.length > 20) {
              val idx = streetVal.toUpperCase.indexOf("STREET") + 6
              address("street") = strip(streetVal.substring(0, idx))
              address("area") = strip(streetVal.substring(idx))
              // cleaner.py:375 — literal `.split(" ")` (keeps empties)
              val areaParts = splitLit(address("area").asInstanceOf[String], " ")
              if (areaParts.length > 2 &&
                  areaParts.last.toUpperCase == areaParts(areaParts.length - 2).toUpperCase) {
                address("city") = title(areaParts.last)
                address("area") = strip(areaParts.dropRight(1).mkString(" "))
              } else if (areaParts.nonEmpty) {
                address("city") = title(areaParts.last)
              }
            } else {
              address("street") = streetVal
            }
          }

          if (parts.length > 1) {
            val distState = splitWs(parts(1))
            if (distState.nonEmpty) address("district") = distState(0)
            if (distState.length > 1) address("state") = distState(1)
          }

          reSearch(pinPat, fullAddress).foreach(m => address("postal_code") = m.group(0))
        }
      }

      if (upper.contains("RTO"))
        data("issuing_authority") = strip(line)

      i += 1
    }
    data
  }
}
