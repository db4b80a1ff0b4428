package graft.extract

import java.util.regex.Pattern
import scala.collection.mutable
import graft.model.PyDict
import graft.text.PyText._

/** Marksheet extraction — semantics of
  * reference `pipeline/cleaner.py:100-255` (`extract_marksheet_details`):
  * a four-state line FSM (LOOKING_FOR_CODE → BUILDING_NAME →
  * LOOKING_FOR_MARKS → LOOKING_FOR_RESULT), per-semester subject map,
  * force-push of stuck subjects, orphan-name append (which mutates subjects
  * already pushed — replicated via shared mutable maps), latest-semester
  * selection and sem1/sem2 backlog copies.
  */
object MarksheetExtractor {
  private val uniPat = Pattern.compile(
    "(Visvesvaraya\\s+Technological\\s+University|VTU|Anna\\s+University)",
    Pattern.CASE_INSENSITIVE)
  private val usnPat = Pattern.compile("\\b([1-4][A-Z]{2}\\d{2}[A-Z]{2,6}\\d{1,3})\\b")
  private val semHeaderPat = Pattern.compile("Semester\\s*[:\\-]?\\s*(\\d+)", Pattern.CASE_INSENSITIVE)
  private val codePatA = Pattern.compile("^\\d{2}[A-Z]{2,3}\\d{2,4}$")
  private val codePatB = Pattern.compile("^[A-Z]{2,3}\\d{2,4}$")
  private val datePat  = Pattern.compile("\\d{4}-\\d{2}-\\d{2}")
  private val digitsPat = Pattern.compile("^\\d+$")
  private val resultLetterPat = Pattern.compile("^[PFAWX]$")
  private val orphanSkipLower = Set("internal", "external", "total", "result", "grade",
    "marks", "announced", "/updated", "on", "fail", "pass", "p", "f", "a", "w", "x", "ne->")
  private val nameSkipLower = Set("internal", "external", "total", "result", "grade")
  private val nameVetoLower = Seq("usn", "semester", "result")

  def extract(text: String, rawLines: Seq[String]): PyDict = {
    val data = PyDict(
      "document_type" -> "Marksheet",
      "university_name" -> "Unknown",
      "college_name" -> "Unknown",
      "student_name" -> "Unknown",
      "university_seat_number" -> "Unknown",
      "semester" -> "Unknown",
      "subjects" -> mutable.Buffer.empty[Any],
      "semester_2" -> mutable.Buffer.empty[Any],
      "semester_1" -> mutable.Buffer.empty[Any],
      "remarks" -> PyDict("P" -> "Pass", "F" -> "Fail", "A" -> "Absent",
        "W" -> "Withheld", "X" -> "Not Eligible")
    )

    reSearch(uniPat, text).foreach(m => data("university_name") = title(m.group(1)))
    reSearch(usnPat, text).foreach(m => data("university_seat_number") = m.group(1).toUpperCase)

    // Student name scan — cleaner.py:122-137 (breaks at first hit)
    val lines = rawLines
    var i = 0
    var nameDone = false
    while (i < lines.length && !nameDone) {
      val line = lines(i)
      if (line.contains("Name") && line.contains(":")) {
        val parts = splitLit(line, ":")
        if (parts.length > 1) {
          val cleanName = strip(parts(1))
          if (cleanName.nonEmpty && !nameVetoLower.exists(cleanName.toLowerCase.contains)) {
            data("student_name") = title(cleanName)
            nameDone = true
          }
        }
      } else if (line.contains("Name") || line.contains("NAME")) {
        if (i + 1 < lines.length) {
          val nextLine = lines(i + 1)
          if (nextLine.startsWith(":")) {
            val cleanName = strip(nextLine.replace(":", ""))
            if (cleanName.nonEmpty && !nameVetoLower.exists(cleanName.toLowerCase.contains)) {
              data("student_name") = title(cleanName)
              nameDone = true
            }
          }
        }
      }
      i += 1
    }

    // FSM — cleaner.py:139-245
    type Subject = mutable.LinkedHashMap[String, Any]
    val allSemestersMap: Map[String, mutable.Buffer[Any]] =
      (1 to 8).map(n => n.toString -> mutable.Buffer.empty[Any]).toMap
    var latestSem = 0
    var currentSemester: String = null
    var state = "LOOKING_FOR_CODE"
    var currentSubject: Subject = mutable.LinkedHashMap.empty
    var nameBuffer = mutable.Buffer.empty[String]
    var marksBuffer = mutable.Buffer.empty[String]

    def pushToSem(subj: Subject): Unit =
      // cleaner.py:181/229 — `.get(sem, []).append(...)` appends only when
      // the semester key is one of "1".."8"; otherwise the append is lost.
      if (currentSemester != null)
        allSemestersMap.get(currentSemester).foreach(_.append(subj))

    for (line <- lines) {
      val cleanLine = strip(line)
      if (cleanLine.nonEmpty) {
        val semMatch = reSearch(semHeaderPat, cleanLine)
        if (semMatch.isDefined) {
          val semVal = semMatch.get.group(1)
          currentSemester = semVal
          if (semVal.toInt > latestSem) latestSem = semVal.toInt
          state = "LOOKING_FOR_CODE"
          currentSubject = mutable.LinkedHashMap.empty
          nameBuffer = mutable.Buffer.empty
          marksBuffer = mutable.Buffer.empty
        } else {
          // New subject code? — cleaner.py:167-171
          var isNewCode = false
          var codeParts: Vector[String] = Vector.empty
          if (!cleanLine.contains("Code") && !cleanLine.contains("Subject")) {
            codeParts = splitWs(cleanLine)
            if (codeParts.length == 1 &&
                (reMatch(codePatA, codeParts(0)).isDefined ||
                 reMatch(codePatB, codeParts(0)).isDefined))
              isNewCode = true
          }

          if (isNewCode) {
            // Force-push stuck subject — cleaner.py:175-181
            if (currentSubject.nonEmpty && currentSubject.contains("subject_code") &&
                !currentSubject.contains("result")) {
              if (marksBuffer.length >= 3) {
                currentSubject("internal_marks") = marksBuffer(marksBuffer.length - 3)
                currentSubject("external_marks") = marksBuffer(marksBuffer.length - 2)
                currentSubject("total") = marksBuffer(marksBuffer.length - 1)
                currentSubject("result") = "Unknown"
                pushToSem(currentSubject)
              }
            }
            currentSubject = mutable.LinkedHashMap("subject_code" -> codeParts(0))
            state = "BUILDING_NAME"
            nameBuffer = mutable.Buffer.empty
            marksBuffer = mutable.Buffer.empty
          } else if (state == "LOOKING_FOR_CODE") {
            // Orphan text appended to the last completed subject's name —
            // cleaner.py:190-198 (mutates the already-pushed subject)
            if (currentSubject.nonEmpty && currentSubject.contains("result")) {
              val skip =
                reMatch(datePat, cleanLine).isDefined ||
                Seq("OF", "NA", "N/A").contains(cleanLine.toUpperCase) ||
                orphanSkipLower.contains(cleanLine.toLowerCase) ||
                cleanLine.contains("Nomenclature") || cleanLine.contains("->") ||
                cleanLine.toUpperCase.contains("ELIGIBLE")
              if (!skip) {
                nameBuffer.append(cleanLine)
                currentSubject("subject_name") = strip(nameBuffer.mkString(" "))
              }
            }
          } else if (state == "BUILDING_NAME") {
            if (isDigit(cleanLine) || reMatch(digitsPat, cleanLine).isDefined) {
              marksBuffer = mutable.Buffer(cleanLine)
              currentSubject("subject_name") = strip(nameBuffer.mkString(" "))
              state = "LOOKING_FOR_MARKS"
            } else if (!nameSkipLower.contains(cleanLine.toLowerCase)) {
              nameBuffer.append(cleanLine)
            }
          } else if (state == "LOOKING_FOR_MARKS") {
            if (isDigit(cleanLine)) {
              marksBuffer.append(cleanLine)
            } else if (Seq("A", "X", "-").contains(cleanLine.toUpperCase)) {
              // cleaner.py:217 — appends the ORIGINAL line text (not upper)
              marksBuffer.append(if (cleanLine == "-") "0" else cleanLine)
            } else if (reMatch(resultLetterPat, cleanLine.toUpperCase).isDefined ||
                       Seq("PASS", "FAIL", "OF", "0F", "NA").contains(cleanLine.toUpperCase)) {
              state = "LOOKING_FOR_RESULT"
              var res = cleanLine.toUpperCase
              if (res == "PASS" || res == "FAIL") res = res.substring(0, 1)
              if (res == "OF" || res == "0F") res = "F"
              if (marksBuffer.length >= 3) {
                currentSubject("internal_marks") = marksBuffer(marksBuffer.length - 3)
                currentSubject("external_marks") = marksBuffer(marksBuffer.length - 2)
                currentSubject("total") = marksBuffer(marksBuffer.length - 1)
                currentSubject("result") = res
                pushToSem(currentSubject)
                state = "LOOKING_FOR_CODE"
                marksBuffer = mutable.Buffer.empty
              }
            }
          } else if (state == "LOOKING_FOR_RESULT") {
            var res = cleanLine.toUpperCase
            if (Seq("P", "F", "A", "W", "X", "PASS", "FAIL", "OF", "0F", "NA").contains(res)) {
              if (res == "PASS" || res == "FAIL") res = res.substring(0, 1)
              if (res == "OF" || res == "0F") res = "F"
              if (marksBuffer.length >= 3) {
                currentSubject("internal_marks") = marksBuffer(marksBuffer.length - 3)
                currentSubject("external_marks") = marksBuffer(marksBuffer.length - 2)
                currentSubject("total") = marksBuffer(marksBuffer.length - 1)
                currentSubject("result") = res
                pushToSem(currentSubject)
              }
              state = "LOOKING_FOR_CODE"
              marksBuffer = mutable.Buffer.empty
            }
          }
        }
      }
    }

    data("semester") = if (latestSem > 0) latestSem.toString else "Unknown"
    if (latestSem > 0) {
      // cleaner.py:249 `.get(str(latest_sem), [])` — a header like
      // "Semester: 9" selects an empty list, not a crash
      data("subjects") = allSemestersMap.getOrElse(latestSem.toString, mutable.Buffer.empty[Any])
      if (latestSem > 1) {
        val sem2 = allSemestersMap("2")
        if (sem2.nonEmpty) data("semester_2") = sem2
        val sem1 = allSemestersMap("1")
        if (sem1.nonEmpty) data("semester_1") = sem1
      }
    }
    data
  }
}
