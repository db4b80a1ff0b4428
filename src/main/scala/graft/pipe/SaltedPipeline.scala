package graft.pipe

import org.apache.spark.sql.Dataset
import graft.kernel.Backends
import graft.model.{Doc, DocResult, Span}

/** Skew handling for media-heavy documents (SURVEY.md §4 "salting").
  *
  * A document with 50 media spans costs ~50× the median in the OCR kernel;
  * at coarse partition granularity a few such docs can straggle a task.
  * This path splits each heavy doc into salted span groups (`doc_id × salt`)
  * so the kernel cost spreads across tasks, then re-merges by doc_id — the
  * ONLY shuffle in the whole extraction pipeline, applied ONLY to the heavy
  * slice (light docs stay on the fused zero-shuffle path).
  *
  * Equality with the fused path is proven by SaltedPipelineSpec.
  */
object SaltedPipeline {

  /** Partial OCR result of one salted span group. */
  final case class OcrPiece(
      doc_id: String,
      first_offset: Int,
      lines: Seq[String],
      confs: Seq[Double],
      face_offset: Int, // offset of the first face-carrying media span, or -1
      face_ref: String,
      face_b64: String,
      media_refs: Seq[String],
      failures: Long,
      oversize: Boolean = false)

  /** Salted run: heavy docs (≥ heavyThreshold spans) are exploded into span
    * groups of `groupSize`, OCR'd in parallel, re-merged by doc_id; light
    * docs take the fused path. */
  def run(docs: Dataset[Doc], heavyThreshold: Int = 8, groupSize: Int = 4,
          useDonut: Boolean = false,
          backendName: String = "deterministic"): Dataset[DocResult] = {
    val spark = docs.sparkSession
    import spark.implicits._

    val light = docs.filter(d => d.spans.length < heavyThreshold)
    val heavy = docs.filter(d => d.spans.length >= heavyThreshold)

    // explode heavy docs into salted groups of contiguous spans; oversize
    // docs (16 MB ingestion cap) emit a single empty marker group instead —
    // same rejection semantics as the fused path's in-kernel guard
    val pieces = heavy.flatMap { d =>
      if (ExtractionPipeline.docBytes(d) > ExtractionPipeline.MaxInputBytes)
        Iterator((d.doc_id, Seq.empty[Span]))
      else d.spans.sortBy(_.offset).grouped(groupSize).map(g => (d.doc_id, g))
    }.mapPartitions { it =>
      val backend = Backends.ocr(backendName)
      it.map { case (docId, spans) =>
        if (spans.isEmpty)
          OcrPiece(docId, 0, Vector.empty, Vector.empty, -1, null, null,
            Vector.empty, 0L, oversize = true)
        else {
        val (o, confs) = ExtractionPipeline.ocrDocFull(Doc(docId, spans), backend)
        val faceOff =
          if (o.face_ref == null) -1
          else spans.filter(_.kind == "media")
            .find(s => s"face:${s.media_ref}" == o.face_ref)
            .map(_.offset).getOrElse(-1)
        OcrPiece(docId, spans.map(_.offset).min, o.lines, confs,
          faceOff, o.face_ref, o.face_b64, o.media_refs, o.failures)
        }
      }
    }

    // re-merge by doc_id (the single shuffle, heavy slice only).
    // Confs concatenate in offset order, so the mean is the SAME float
    // operation sequence as the fused single-pass — bit-identical scores.
    val heavyOcr = pieces.groupByKey(_.doc_id).mapGroups { (docId, it) =>
      val ps = it.toVector.sortBy(_.first_offset)
      if (ps.exists(_.oversize))
        DocOcr(docId, "", Vector.empty, 0.0, null, null, Vector.empty, 0L,
          oversize = true)
      else {
        val lines = ps.flatMap(_.lines)
        val confs = ps.flatMap(_.confs)
        val faces = ps.filter(_.face_offset >= 0).sortBy(_.face_offset)
        val face = faces.headOption
        DocOcr(docId, lines.mkString(" "), lines,
          if (confs.nonEmpty) confs.sum / confs.length else 0.0,
          face.map(_.face_ref).orNull, face.map(_.face_b64).orNull,
          ps.flatMap(_.media_refs), ps.map(_.failures).sum)
      }
    }

    val lightResults = ExtractionPipeline.run(light, useDonut, backendName)
    val heavyResults = ExtractionPipeline.extractStage(heavyOcr, useDonut, backendName)
    lightResults.union(heavyResults)
  }
}
