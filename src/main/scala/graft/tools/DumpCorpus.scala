package graft.tools

import java.nio.file.{Files, Paths}
import graft.io.Synthesizer
import graft.kernel.DeterministicOcrBackend
import graft.model.{JArr, JNum, JObj, JStr, JValue, JNull}
import graft.pipe.ExtractionPipeline

/** Fixture-input dump: synthesizes N docs (pure, no Spark), runs the OCR
  * stage, and writes each doc's post-OCR IR (raw_text, lines, avg_conf,
  * face, donut dict of the first media ref) as JSON. The reference-code
  * harness (tools/ref_oracle.py) consumes this to produce the expected
  * extraction outputs committed under src/test/resources/fixtures/.
  */
object DumpCorpus {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "src/test/resources/fixtures/ocr_ir.json"
    val count = if (args.length > 1) args(1).toInt else 500
    val seed = 42L
    val backend = new DeterministicOcrBackend

    val docs = (0L until count.toLong).map { n =>
      val doc = Synthesizer.genDoc(seed, n)
      val o = ExtractionPipeline.ocrDoc(doc, backend)
      val donut = if (o.media_refs.nonEmpty)
        graft.io.Corpus.render(o.media_refs.head).donut else JObj(Vector.empty)
      JObj(Vector(
        "doc_id" -> JStr(o.doc_id),
        "raw_text" -> JStr(o.raw_text),
        "lines" -> JArr(o.lines.iterator.map(JStr(_)).toVector),
        "avg_conf" -> JNum(o.avg_conf),
        "face_b64" -> (if (o.face_b64 == null) JNull else JStr(o.face_b64)),
        "face_ref" -> (if (o.face_ref == null) JNull else JStr(o.face_ref)),
        "donut" -> donut))
    }
    val json = "[" + docs.map(JValue.toJson).mkString(",\n") + "]"
    Files.createDirectories(Paths.get(out).getParent)
    Files.writeString(Paths.get(out), json)
    println(s"wrote $count docs to $out")
  }
}
