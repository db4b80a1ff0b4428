package graft.tools
// scratch profiling main (not part of the library surface)
object Profile {
  def main(args: Array[String]): Unit = {
    val n = 20000
    val docs = (0L until n.toLong).map(graft.io.Synthesizer.genDoc(42L, _))
    val backend = graft.kernel.Backends.ocr("deterministic")
    val donut = () => graft.kernel.Backends.donut("deterministic")
    def time(label: String)(f: => Unit): Unit = {
      (1 to 2).foreach(_ => f) // warm
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e6}%.1f ms / $n docs")
    }
    time("ocrDocFull (strip+render+drop)") {
      docs.foreach(d => graft.pipe.ExtractionPipeline.ocrDoc(d, backend))
    }
    val ocrs = docs.map(d => graft.pipe.ExtractionPipeline.ocrDoc(d, backend))
    time("extractDoc (classify+extract+validate+spans)") {
      ocrs.foreach(o => graft.pipe.ExtractionPipeline.extractDoc(o, false, donut))
    }
    // inner pieces
    val texts = docs.flatMap(_.spans.filter(_.kind == "text").map(_.text))
    time(s"BoilerplateStrip over ${texts.length} text spans") {
      texts.foreach(graft.html.BoilerplateStrip.lines)
    }
    val medias = docs.flatMap(_.spans.filter(_.kind == "media").map(_.media_ref))
    time(s"Corpus.render over ${medias.length} media spans") {
      medias.foreach(graft.io.Corpus.render)
    }
    time("classify+extract only") {
      ocrs.foreach(o => graft.classify.DocTypeClassifier.extractWithRouting(o.raw_text, o.lines))
    }
    val dicts = ocrs.map(o => graft.classify.DocTypeClassifier.extractWithRouting(o.raw_text, o.lines))
    time("validate only") {
      dicts.foreach(d => graft.validate.Validator.validateDocument(d.toJ))
    }
    // finer splits (r6): where inside classify/strip the time goes
    time("  classify: extractDocument only") {
      ocrs.foreach(o => graft.classify.DocTypeClassifier.extractDocument(o.raw_text, o.lines))
    }
    val unknowns = ocrs.filter(o => graft.classify.DocTypeClassifier
      .extractDocument(o.raw_text, o.lines).get("document_type").contains("Unknown"))
    println(s"  (${unknowns.length} Unknown docs of ${ocrs.length})")
    time("  classify: DL+passport routing on Unknowns") {
      unknowns.foreach { o =>
        val tl = o.raw_text.toLowerCase
        if (!graft.classify.DocTypeClassifier.isDrivingLicense(tl))
          graft.classify.DocTypeClassifier.isPassport(tl)
      }
    }
    time("  extractDoc tail (spans+json+validate) minus classify") {
      dicts.foreach { d =>
        val (_, record, _) = graft.validate.Validator.validateDocument(d.toJ)
        graft.model.JValue.toJson(record)
      }
    }
  }
}
