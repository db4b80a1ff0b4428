package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Synthesizer
import graft.kernel.DeterministicOcrBackend
import graft.pipe.ExtractionPipeline

/** The correctness gate's core: byte-level parity with the REFERENCE CODE.
  *
  * src/test/resources/fixtures/expected*.json was produced by running the
  * reference repo's own modules (pipeline/cleaner.py, passport/DL
  * processors, pydantic schemas + validator) over the synthesized OCR IR —
  * see tools/ref_oracle.py. This spec runs the Scala engine over the same
  * 500 docs and requires exact equality of document_type, validity, error,
  * record JSON (dict order included) and the full output span sequence
  * (kind, text, media_ref, offset).
  */
class ReferenceParitySpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def loadExpected(name: String): Vector[JsonNode] = {
    val url = getClass.getClassLoader.getResource(s"fixtures/$name")
    assert(url != null, s"missing fixture $name — run DumpCorpus + tools/ref_oracle.py")
    val root = mapper.readTree(url)
    (0 until root.size()).map(root.get).toVector
  }

  private def checkAll(expectedFile: String, useDonut: Boolean): Unit = {
    val expected = loadExpected(expectedFile)
    val backend = new DeterministicOcrBackend
    val donut = () => graft.kernel.Backends.donut("deterministic")
    var mismatches = 0
    expected.zipWithIndex.foreach { case (exp, n) =>
      val doc = Synthesizer.genDoc(42L, n.toLong)
      val o = ExtractionPipeline.ocrDoc(doc, backend)
      val r = ExtractionPipeline.extractDoc(o, useDonut, donut)
      def fail(field: String, got: Any, want: Any): Unit = {
        mismatches += 1
        if (mismatches <= 5)
          info(s"doc $n [$field]\n  got:  $got\n  want: $want")
      }
      if (r.doc_id != exp.get("doc_id").asText()) fail("doc_id", r.doc_id, exp.get("doc_id"))
      if (r.document_type != exp.get("document_type").asText())
        fail("document_type", r.document_type, exp.get("document_type").asText())
      if (r.doc_type_dir != exp.get("doc_type_dir").asText())
        fail("doc_type_dir", r.doc_type_dir, exp.get("doc_type_dir").asText())
      if (r.is_valid != exp.get("is_valid").asBoolean())
        fail("is_valid", r.is_valid, exp.get("is_valid").asBoolean())
      if (r.validation_error != exp.get("validation_error").asText())
        fail("validation_error", r.validation_error, exp.get("validation_error").asText())
      if (math.abs(r.ocr_accuracy_score - exp.get("ocr_accuracy_score").asDouble()) > 0)
        fail("score", r.ocr_accuracy_score, exp.get("ocr_accuracy_score").asDouble())
      if (r.record_json != mapperCanonical(exp.get("record_json").asText()))
        fail("record_json", r.record_json, exp.get("record_json").asText())
      val expSpans = exp.get("spans")
      if (r.spans.length != expSpans.size()) fail("span_count", r.spans.length, expSpans.size())
      else r.spans.zipWithIndex.foreach { case (s, i) =>
        val es = expSpans.get(i)
        val eRef = if (es.get("media_ref").isNull) null else es.get("media_ref").asText()
        if (s.kind != es.get("kind").asText() || s.text != es.get("text").asText() ||
            s.media_ref != eRef || s.offset != es.get("offset").asInt())
          fail(s"span[$i]", s, es)
      }
    }
    assert(mismatches == 0, s"$mismatches field mismatches vs reference oracle")
  }

  /** Both sides already emit `json.dumps`-style compact JSON with identical
    * separators and float repr; compare the raw strings. */
  private def mapperCanonical(s: String): String = s

  test("engine output matches the reference code on 500 synthesized docs (donut off)") {
    checkAll("expected.json", useDonut = false)
  }

  test("engine output matches the reference code with donut fallback enabled") {
    checkAll("expected_donut.json", useDonut = true)
  }
}
