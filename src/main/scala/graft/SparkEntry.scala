package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Synthesizer
import graft.pipe.ExtractionPipeline

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Extraction-pipeline queries (x*) run over the deterministic synthesized
  * interleaved doc table (seed 42; doc count scales with the sf dir name).
  * Their ground truth is the reference's own Python (executed by
  * tools/ref_oracle.py over the dumped OCR IR): ReferenceParitySpec gates
  * byte-level parity, and the committed golden parquets derived from those
  * fixtures (tools/make_golden.py) give x01/x04/x05 full DuckDB oracles
  * too. SQL-expressible queries (q* and p*) run over the driver's parquet
  * tables in `sfDir` and each has an exact DuckDB oracle.
  */
object SparkEntry {

  /** sf dir name → synthesized doc count (sf0.001→200 … sf0.1→20k). */
  def docCountFor(sfDir: String): Long = {
    val m = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
    val scale = m.map(_.group(1).toDouble).getOrElse(0.01)
    // CAUTION: this count also keys every /tmp dump path — a dir WITHOUT
    // an sf token falls back to 0.01's count and its dumps would clobber
    // the driver's sf0.01 dumps. Tests that run dump-writing queries must
    // embed a unique sf token in their temp dir (see the x13 spec).
    math.max((scale * 200000).toLong, 200L)
  }

  def docTable(s: SparkSession, sfDir: String) =
    Synthesizer.docs(s, docCountFor(sfDir), seed = 42L)

  /** Flagship: end-to-end extraction over the interleaved doc table. */
  def entry(spark: SparkSession): DataFrame =
    ExtractionPipeline.run(docTable(spark, "sf0.001")).toDF()

  /** Driver-facing projection of DocResult, hash-compatible with the
    * committed reference-Python goldens (fixtures/golden_extract_*.parquet,
    * produced by tools/ref_oracle.py executing the reference's own modules,
    * then tools/make_golden.py): scalar columns only — the driver's pandas
    * compare sorts every output and throws on array columns. `spans_md5`
    * hashes the canonical span serialization (U+0001-joined
    * "kind U+0002 text U+0002 media_ref U+0002 offset", null media_ref → ""),
    * which is order-sensitive, so the span-sequence-equality invariant
    * (kind, text, media_ref, order) is driver-checked against an oracle the
    * REFERENCE code computed. md5 (not xxhash64) because DuckDB shares it;
    * ocr_cents = floor(score·100 + 0.5) — identical float64 arithmetic on
    * the parity-equal stored double, no second rounding divergence. */
  def goldenResult(df: DataFrame): DataFrame = {
    val spanStr = array_join(
      transform(col("spans"), s =>
        concat_ws("\u0002", s.getField("kind"),
          coalesce(s.getField("text"), lit("")),
          coalesce(s.getField("media_ref"), lit("")),
          s.getField("offset").cast("string"))),
      "\u0001")
    df.select(col("doc_id"), col("document_type"), col("is_valid"),
      col("validation_error"),
      floor(col("ocr_accuracy_score") * 100 + 0.5).cast("long").as("ocr_cents"),
      md5(col("record_json").cast("binary")).as("record_md5"),
      md5(spanStr.cast("binary")).as("spans_md5"))
  }

  def goldenPath(dir: String, donut: Boolean): String = {
    val suffix = if (donut) "_donut" else ""
    s"/root/repo/fixtures/golden_extract${suffix}_${docCountFor(dir)}.parquet"
  }

  def extractDumpPath(dir: String): String =
    s"/tmp/graft_extract_dump_${docCountFor(dir)}"

  def spansDumpPath(dir: String): String =
    s"/tmp/graft_spans_dump_${docCountFor(dir)}"

  def mmCostDumpPath(dir: String): String =
    s"/tmp/graft_mm_cost_dump_${docCountFor(dir)}"

  def spanAuditDumpPath(dir: String): String =
    s"/tmp/graft_span_audit_${docCountFor(dir)}"

  def renderDumpPath(dir: String): String =
    s"/tmp/graft_render_dump_${docCountFor(dir)}"

  def htmlStripDumpPath(dir: String): String =
    s"/tmp/graft_html_strip_dump_${docCountFor(dir)}"

  def mediaRefsDumpPath(dir: String): String =
    s"/tmp/graft_media_refs_dump_${docCountFor(dir)}"

  def mmCurationStatsPath(dir: String): String =
    s"/tmp/graft_mm_curation_stats_${docCountFor(dir)}"

  def mmCurationCostPath(dir: String): String =
    s"/tmp/graft_mm_curation_cost_${docCountFor(dir)}"

  def mediaCatalogDumpPath(dir: String): String =
    s"/tmp/graft_media_catalog_dump_${docCountFor(dir)}"

  def observedDumpPath(dir: String): String =
    s"/tmp/graft_observed_dump_${docCountFor(dir)}"
  def captionDumpPath(dir: String): String =
    s"/tmp/graft_caption_dump_${docCountFor(dir)}"
  def lineageRunPath(dir: String): String =
    s"/tmp/graft_lineage_run_${docCountFor(dir)}"
  def lineageDumpPath(dir: String): String =
    s"/tmp/graft_lineage_dump_${docCountFor(dir)}"

  /** ONE shared mode-tagged extraction dump per sf feeding the whole
    * mode-A/B query family (x21 flip census, x25 rescue pivot, x32 CER) —
    * round-3 VERDICT "What's wrong #2": each of those queries needs BOTH
    * pipeline modes' per-doc scalars, and without sharing, one
    * Verify/Bench sweep executed six full extraction runs where two
    * suffice. Memoized PER JVM (never reused across processes, so a code
    * change cannot serve a stale dump), and any one query run alone still
    * computes exactly what it needs — per-query oracle isolation is
    * preserved because the oracle re-reads the same dumped bytes. */
  def modeDumpPath(dir: String): String =
    s"/tmp/graft_mode_dump_${docCountFor(dir)}"
  private val modeDumpsWritten = scala.collection.mutable.Set.empty[String]
  def modeDump(s: SparkSession, dir: String): DataFrame = {
    val p = modeDumpPath(dir)
    modeDumpsWritten.synchronized {
      if (!modeDumpsWritten.contains(p)) {
        def proj(m: String, useDonut: Boolean): DataFrame =
          ExtractionPipeline.run(docTable(s, dir), useDonut = useDonut)
            .toDF()
            .select(col("doc_id"), col("document_type"),
              when(col("is_valid"), 1L).otherwise(0L).as("valid"),
              size(col("spans")).cast("long").as("n_spans"),
              col("record_json"), lit(m).as("mode"))
        proj("plain", useDonut = false)
          .unionByName(proj("donut", useDonut = true))
          .write.mode("overwrite").parquet(p)
        modeDumpsWritten += p
      }
    }
    s.read.parquet(p)
  }
  def kindDumpPath(dir: String): String =
    s"/tmp/graft_kind_dump_${docCountFor(dir)}"
  def mediaSkewDumpPath(dir: String): String =
    s"/tmp/graft_media_skew_dump_${docCountFor(dir)}"
  def costTopkDumpPath(dir: String): String =
    s"/tmp/graft_cost_topk_dump_${docCountFor(dir)}"
  def spanLenDumpPath(dir: String): String =
    s"/tmp/graft_span_len_dump_${docCountFor(dir)}"
  def errorParetoDumpPath(dir: String): String =
    s"/tmp/graft_error_pareto_dump_${docCountFor(dir)}"
  def typeKindDumpPath(dir: String): String =
    s"/tmp/graft_type_kind_dump_${docCountFor(dir)}"
  def offsetGapDumpPath(dir: String): String =
    s"/tmp/graft_offset_gap_dump_${docCountFor(dir)}"
  def recordDumpPath(dir: String): String =
    s"/tmp/graft_record_dump_${docCountFor(dir)}"
  def recordValsDumpPath(dir: String): String =
    s"/tmp/graft_record_vals_dump_${docCountFor(dir)}"

  /** x31's probe list: record fields that are scalar STRINGS in every
    * extractor that emits them (nested subjects/result excluded — engines
    * render non-scalar JSON text differently, which is a serialization
    * choice, not extraction semantics). */
  val scalarRecordFields: Seq[String] = Seq(
    "document_type", "name", "dob", "sex", "father_name", "dl_number",
    "passport_number", "surname", "given_names", "date_of_birth",
    "date_of_issue", "student_name")

  /** Per-doc extraction scalars materialized to parquet: x02/x03 aggregate
    * over this dump and their DuckDB oracles re-aggregate it — the
    * extraction itself stays parity-gated (ReferenceParitySpec), the
    * relational rollup logic becomes driver-oracled. */
  private def dumpedResults(s: SparkSession, dir: String): DataFrame = {
    val path = extractDumpPath(dir)
    ExtractionPipeline.run(docTable(s, dir)).toDF()
      .select(col("doc_id"), col("document_type"), col("is_valid"),
        col("ocr_accuracy_score"), col("validation_error"),
        size(col("spans")).as("n_spans"))
      .write.mode("overwrite").parquet(path)
    s.read.parquet(path)
  }

  private val pipelineQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- extraction pipeline: driver-oracled against the committed
    // reference-Python goldens (see goldenResult) --------------------------
    "x01_extract_e2e" -> ((s, dir) =>
      goldenResult(ExtractionPipeline.run(docTable(s, dir)).toDF())),
    // integer-only metrics rollup over the per-doc extraction dump (oracled;
    // sums instead of avgs so the compare is float-order-free)
    "x02_extract_metrics" -> ((s, dir) =>
      dumpedResults(s, dir)
        .groupBy(col("document_type"), col("is_valid"))
        .agg(count(lit(1)).as("doc_count"),
             sum(round(col("ocr_accuracy_score") * 100)).cast("long")
               .as("sum_ocr_cents"),
             sum(col("n_spans")).as("sum_spans"),
             sum(when(col("validation_error") =!= "", 1L).otherwise(0L))
               .as("validation_failures"))
        .orderBy(col("document_type"), col("is_valid"))),
    // validation-error TAXONOMY: the observability rollup an extraction
    // fleet alerts on — docs per (document_type, error string), with a
    // deterministic example doc. The error strings are the REAL
    // pydantic-compatible validator messages (parity-pinned), so the
    // taxonomy is an engine artifact the oracle only re-aggregates.
    "x18_error_taxonomy" -> ((s, dir) =>
      dumpedResults(s, dir)
        .groupBy(col("document_type"), col("validation_error"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("example_doc"))
        .orderBy(col("document_type"), col("validation_error"))),

    // OCR-confidence calibration: bucket floor(score·10), per-bucket doc/
    // valid counts — "is high OCR confidence predictive of a valid
    // extraction?" — the north_star's OCR-confidence metric as a table.
    // Both engines floor the identical stored double, so the buckets are
    // exact.
    "x19_confidence_calibration" -> ((s, dir) =>
      dumpedResults(s, dir)
        .groupBy(floor(col("ocr_accuracy_score") * 10).cast("long")
          .as("conf_bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("is_valid"), 1L).otherwise(0L)).as("n_valid"),
          sum(col("n_spans")).cast("long").as("sum_spans"))
        .orderBy(col("conf_bucket"))),

    "x03_classify_counts" -> ((s, dir) =>
      dumpedResults(s, dir)
        .groupBy(col("document_type"))
        .agg(count(lit(1)).as("doc_count"),
             sum(when(col("is_valid"), 1L).otherwise(0L)).as("valid_count"))
        .orderBy(col("document_type"))),
    "x04_extract_donut" -> ((s, dir) =>
      goldenResult(ExtractionPipeline.run(docTable(s, dir), useDonut = true).toDF())),
    // salted path must be bit-identical to the fused path — same golden
    "x05_extract_salted" -> ((s, dir) =>
      goldenResult(graft.pipe.SaltedPipeline.run(docTable(s, dir)).toDF())),
    // classifier chain over the DRIVER's documents table (oracled): trigger
    // markers are planted deterministically by doc_id so every branch of the
    // cleaner.py:404-424 + extractor.py:53-94 precedence chain fires; the
    // DuckDB oracle replicates the chain order-exactly in SQL.
    "x06_classify_driver_docs" -> ((s, dir) =>
      graft.classify.ClassifyQuery.run(s, dir)),
    // Aadhaar/PAN field extraction over driver docs (oracled): planted
    // payloads exercise number reformat, dob normalization + YoB fallback,
    // and gender precedence through the REAL extractors.
    "x07_extract_fields" -> ((s, dir) =>
      graft.classify.ClassifyQuery.runFields(s, dir)),
    // interleave/run structure of the span payload, computed row-locally in
    // one typed pass; the oracle recomputes it with window functions over
    // the exploded (doc_id, ord, kind) dump — independent formulation
    "x08_span_runs" -> ((s, dir) => {
      val docs = docTable(s, dir)
      graft.ops.InterleaveOps.spanKindDump(docs)
        .write.mode("overwrite").parquet(spansDumpPath(dir))
      graft.ops.InterleaveOps.spanRunStats(docs)
    }),
    // multimodal sequence packing: text tokens + 64 tokens per media span
    // (vision-encoder patch budget), packed by the same distributed prefix
    // sum as p33; the oracle windows over the dumped per-doc cost table
    "x09_mm_packing" -> ((s, dir) => {
      graft.ops.InterleaveOps.mmCosts(docTable(s, dir))
        .write.mode("overwrite").parquet(mmCostDumpPath(dir))
      graft.ops.PackingOps.packChunksCost(
        s.read.parquet(mmCostDumpPath(dir)), col("cost"), capacity = 1024)
    }),
    // checkpoint/resume driver-verified end to end (north_rule: "resumable
    // from checkpoint with per-partition lineage + metrics"): run 1 CRASHES
    // (injected) after 2 of 4 bucket groups; run 2 resumes from the
    // manifest and executes ONLY the remaining groups. The rollup over the
    // resumed sink must equal the straight single-job pipeline's — the
    // oracle aggregates the x02 extraction dump, so any doc lost, doubled
    // or altered across the crash/resume boundary fails the driver hash.
    "x10_checkpoint_resume" -> ((s, dir) => {
      val out = s"/tmp/graft_ckpt_driver_${docCountFor(dir)}"
      new scala.reflect.io.Directory(new java.io.File(out)).deleteRecursively()
      dumpedResults(s, dir) // (re)write the dump the oracle reads
      val docs = docTable(s, dir)
      try new graft.pipe.CheckpointRunner(out, buckets = 32, groups = 4)
        .run(docs, failAfterGroups = 2)
      catch { case _: RuntimeException => } // the injected crash
      val resumed = new graft.pipe.CheckpointRunner(out, buckets = 32,
        groups = 4)
      require(resumed.run(docs) == 2, "resume must execute only groups 2,3")
      resumed.results(s).toDF()
        .groupBy(col("document_type"), col("is_valid"))
        .agg(count(lit(1)).as("doc_count"),
             sum(round(col("ocr_accuracy_score") * 100)).cast("long")
               .as("sum_ocr_cents"),
             sum(size(col("spans"))).cast("long").as("sum_spans"),
             sum(when(col("validation_error") =!= "", 1L).otherwise(0L))
               .as("validation_failures"))
        .orderBy(col("document_type"), col("is_valid"))
    }),
    // span-contract audit (the write-time validation an Iceberg committer
    // enforces on the interleaved payload): corruption planted
    // deterministically — doc%7==3 gets its span array REVERSED, doc%7==5
    // gets its media-span offsets negated — then the audit counts order/
    // negative-offset violations per doc. The corrupted offsets are dumped
    // so the oracle recomputes the audit itself with window functions.
    "x11_span_audit" -> ((s, dir) => {
      import s.implicits._
      val corrupted = docTable(s, dir).map { d =>
        val n = d.doc_id.stripPrefix("doc-").toLong
        if (n % 7 == 3) d.copy(spans = d.spans.reverse)
        else if (n % 7 == 5)
          d.copy(spans = d.spans.map(sp =>
            if (sp.kind == "media") sp.copy(offset = -sp.offset - 1) else sp))
        else d
      }
      graft.ops.InterleaveOps.spanOffsetDump(corrupted)
        .write.mode("overwrite").parquet(spanAuditDumpPath(dir))
      graft.ops.InterleaveOps.spanAudit(corrupted)
    }),
    // interleaved→training-text rendering (the tokenizer-ready flattening
    // of the span payload): text verbatim, media → <|kind:ref|> sentinel,
    // concatenated in (offset, ord) order — one row-local typed pass. The
    // oracle re-renders from the full span dump with an ordered string_agg
    // and must reproduce the md5 of every rendered doc exactly.
    "x12_render_interleaved" -> ((s, dir) => {
      val docs = docTable(s, dir)
      graft.ops.InterleaveOps.spanFullDump(docs)
        .write.mode("overwrite").parquet(renderDumpPath(dir))
      graft.ops.InterleaveOps.renderInterleaved(docs).orderBy(col("doc_id"))
    }),
    // HTML boilerplate-strip path driven distributed (north_rule: "HTML
    // boilerplate strip, DOM heuristics"): deterministic chrome is planted
    // around each driver doc's text by doc_id % 4 (script/nav/footer,
    // aside, link-farm block, or bare text), the REAL BoilerplateStrip
    // kernel strips it per-row, and the per-doc line stats are aggregated
    // FROM the dumped (doc_id, ord, line) table — the oracle re-aggregates
    // the same dump with an ordered string_agg, so any disagreement in the
    // distributed aggregation fails the hash. Strip semantics themselves
    // stay property-gated (BoilerplateStripSpec: fused-pass ≡ chained).
    "x13_html_strip" -> ((s, dir) => {
      import s.implicits._
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      docs.flatMap { case (id, text) =>
        val html = (id % 4) match {
          case 0 => "<html><head><script>var x = 1;</script></head><body>" +
            "<nav><a href=\"/\">home</a> <a href=\"/a\">about</a></nav>" +
            s"<p>$text</p><footer>copyright 2024 all rights reserved" +
            "</footer></body></html>"
          case 1 => s"<div><p>$text</p><aside>subscribe to our newsletter" +
            "</aside></div>"
          case 2 => "<article><h1>heading kept</h1>" +
            s"<p>$text</p><div><a href=\"1\">x</a> <a href=\"2\">y</a> ok" +
            "</div></article>"
          case _ => text
        }
        graft.html.BoilerplateStrip.lines(html).iterator.zipWithIndex.map {
          case (line, i) => (id, i.toLong, line)
        }
      }.toDF("doc_id", "ord", "line")
        .write.mode("overwrite").parquet(htmlStripDumpPath(dir))
      s.read.parquet(htmlStripDumpPath(dir))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_lines"),
          sum(length(col("line"))).cast("long").as("n_chars"),
          expr("md5(cast(array_join(transform(array_sort(" +
            "collect_list(struct(ord, line))), x -> x.line), chr(10)) " +
            "as binary))").as("lines_hash"))
        .orderBy(col("doc_id"))
    }),
    // media-ref referential-integrity audit over the interleaved payload
    // (the FK check an Iceberg committer runs between the span table and
    // the media-object catalog): corruption planted deterministically —
    // doc%11==4 gets its media refs rewritten (→ dangling), and catalog
    // rows retired by an md5 rule (→ more dangling; the rewritten docs'
    // ORIGINAL refs become orphans). Both sides dump so the oracle
    // recomputes the audit with NOT EXISTS anti-joins; the engine's
    // anti-joins shuffle ~20-byte ref keys only, never payloads.
    "x14_media_integrity" -> ((s, dir) => {
      import s.implicits._
      val docs = docTable(s, dir)
      docs.flatMap { d =>
        val n = d.doc_id.stripPrefix("doc-").toLong
        d.spans.iterator.filter(_.kind == "media").map { sp =>
          (n, if (n % 11 == 4) sp.media_ref + "#dangling" else sp.media_ref)
        }
      }.toDF("doc_id", "media_ref")
        .write.mode("overwrite").parquet(mediaRefsDumpPath(dir))
      graft.ops.MultimodalOps.mediaTable(docs)
        .map(_.media_ref).distinct()
        .filter(r => graft.ops.TextOps.md5Low63(r + "|retire") % 13 != 2)
        .toDF("media_ref")
        .write.mode("overwrite").parquet(mediaCatalogDumpPath(dir))
      val r = s.read.parquet(mediaRefsDumpPath(dir))
      val m = s.read.parquet(mediaCatalogDumpPath(dir))
      val dangling = r.join(m, Seq("media_ref"), "left_anti")
      val orphaned = m.join(r, Seq("media_ref"), "left_anti")
      r.agg(count(lit(1)).as("n_refs"))
        .crossJoin(m.agg(count(lit(1)).as("n_media")))
        .crossJoin(dangling.agg(count(lit(1)).as("n_dangling_refs"),
          countDistinct(col("doc_id")).as("n_dangling_docs")))
        .crossJoin(orphaned.agg(count(lit(1)).as("n_orphaned")))
    }),
    // composite INTERLEAVED curation chain (the x-side analogue of p30):
    // render stats → keep docs with ≥1 media span and rendered_len ≥ 64 →
    // pack survivors by multimodal token cost (text tokens + 64/media,
    // distributed prefix sum) → per-pack rollup. Both intermediate tables
    // dump so the oracle replays the filter, the running-sum packing and
    // the rollup with window functions over identical bytes.
    "x15_mm_curation" -> ((s, dir) => {
      val docs = docTable(s, dir)
      graft.ops.InterleaveOps.renderInterleaved(docs)
        .write.mode("overwrite").parquet(mmCurationStatsPath(dir))
      graft.ops.InterleaveOps.mmCosts(docs)
        .write.mode("overwrite").parquet(mmCurationCostPath(dir))
      val surv = s.read.parquet(mmCurationStatsPath(dir))
        .filter(col("n_media") >= 1 && col("rendered_len") >= 64)
        .select(col("doc_id"))
      val costs = s.read.parquet(mmCurationCostPath(dir))
        .join(surv, "doc_id")
      graft.ops.PackingOps.packChunksCost(costs, col("cost"),
          capacity = 1024)
        .groupBy(col("start_pack"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("n_tokens"))
        .select(col("start_pack").as("pack"), col("n_docs"), col("n_tokens"))
        .orderBy(col("pack"))
    }),

    // Dataset.observe driver-verified: the per-doc extraction scalars are
    // written through Metrics.observedWrite (the aggregates accumulate
    // task-side INSIDE the sink job — no second scan) and the query's
    // result IS the observed map; the oracle independently re-aggregates
    // the sink bytes, so observe()'s numbers are held to the same hash
    // gate as any other query
    "x16_observed_metrics" -> ((s, dir) => {
      import s.implicits._
      val res = ExtractionPipeline.run(docTable(s, dir)).toDF()
        .select(col("doc_id"), col("is_valid"),
          size(col("spans")).as("n_spans"))
      val m = graft.pipe.Metrics.observedWrite(res,
        observedDumpPath(dir), Seq(
          count(lit(1)).as("n_docs"),
          sum(col("n_spans")).cast("long").as("sum_spans"),
          sum(when(col("is_valid"), 1L).otherwise(0L)).as("n_valid")))
      Seq((m("n_docs").asInstanceOf[Long],
        m("sum_spans").asInstanceOf[Long],
        m("n_valid").asInstanceOf[Long]))
        .toDF("n_docs", "sum_spans", "n_valid")
    }),

    // lineage-vs-sink audit (north_rule: "per-partition lineage + metrics"
    // driver-verified): a clean CheckpointRunner pass writes its per-group
    // lineage rows task-side; the audit independently RECOUNTS each group
    // from the sink bytes and joins the two — every group must agree on
    // doc/span/failure counts (lineage_ok = 1). Both the per-doc recount
    // table and the engine's lineage parquet are the oracle's inputs, so
    // DuckDB re-derives the same audit from identical bytes.
    "x20_lineage_audit" -> ((s, dir) => {
      val out = lineageRunPath(dir)
      new scala.reflect.io.Directory(new java.io.File(out)).deleteRecursively()
      val runner = new graft.pipe.CheckpointRunner(out, buckets = 32,
        groups = 4)
      runner.run(docTable(s, dir))
      s.read.parquet(s"$out/results")
        .select(col("group"), col("doc_id"),
          size(col("spans")).as("n_spans"), col("is_valid"))
        .write.mode("overwrite").parquet(lineageDumpPath(dir))
      val actual = s.read.parquet(lineageDumpPath(dir))
        .groupBy(col("group").cast("int").as("bucket_group"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_spans")).cast("long").as("sum_spans"),
          sum(when(col("is_valid"), 0L).otherwise(1L)).as("n_failures"))
      val lin = runner.lineage(s).toDF()
        .select(col("partition_id").as("bucket_group"),
          col("doc_count"), col("span_count"), col("failures"))
      actual.join(lin, "bucket_group")
        .select(col("bucket_group"), col("n_docs"), col("sum_spans"),
          col("n_failures"),
          when(col("n_docs") === col("doc_count") &&
               col("sum_spans") === col("span_count") &&
               col("n_failures") === col("failures"), 1L).otherwise(0L)
            .as("lineage_ok"))
        .orderBy(col("bucket_group"))
    }),

    // CLIP-style (media, caption) pair mining over the interleaved payload:
    // a media span's caption is the text span immediately following it in
    // render order — the adjacency heuristic image–text contrastive
    // pipelines mine training pairs with. One row-local typed pass; the
    // full span dump goes to parquet so the oracle re-derives the pairing
    // independently with lead() window functions over identical bytes.
    "x17_caption_pairs" -> ((s, dir) => {
      val docs = docTable(s, dir)
      graft.ops.InterleaveOps.spanFullDump(docs)
        .write.mode("overwrite").parquet(captionDumpPath(dir))
      graft.ops.InterleaveOps.captionPairs(docs)
        .orderBy(col("doc_id"), col("ord"))
    }),

    // span-kind transition matrix (the Markov structure of the interleaved
    // payload, corpus-level): row-local consecutive-pair counts + a '^'
    // start marker per doc; only the few (from, to) rows ever shuffle. The
    // oracle rebuilds the matrix with lag() windows over the exploded kind
    // dump — independent formulation over identical bytes.
    "x22_kind_transitions" -> ((s, dir) => {
      val docs = docTable(s, dir)
      graft.ops.InterleaveOps.spanKindDump(docs)
        .write.mode("overwrite").parquet(kindDumpPath(dir))
      graft.ops.InterleaveOps.kindTransitions(docs)
    }),

    // validation-failure PARETO cut: x18 counts every (type, error) cell;
    // this ranks the failures within each type and carries the cumulative
    // coverage in ppm — "which 2 error kinds explain 80% of this type's
    // failures" is read straight off the cum_ppm column, which is what
    // triage actually consumes. Failures only; one keyed agg + one
    // window pass over the tiny (type, error) rollup.
    "x28_error_pareto" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      ExtractionPipeline.run(docTable(s, dir)).toDF()
        .select(col("document_type"), col("validation_error"))
        .where(col("validation_error").isNotNull)
        .write.mode("overwrite").parquet(errorParetoDumpPath(dir))
      val cnt = s.read.parquet(errorParetoDumpPath(dir))
        .groupBy(col("document_type"), col("validation_error"))
        .agg(count(lit(1)).as("n"))
      val ord = Window.partitionBy(col("document_type"))
        .orderBy(col("n").desc, col("validation_error"))
      val tot = Window.partitionBy(col("document_type"))
      cnt.withColumn("rnk", row_number().over(ord).cast("long"))
        .withColumn("cum", sum(col("n")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total", sum(col("n")).over(tot))
        .select(col("document_type"), col("rnk"), col("validation_error"),
          col("n"), expr("cum * 1000000L div total").as("cum_ppm"))
        .orderBy(col("document_type"), col("rnk"))
    }),

    // schema-drift watch over the interleaved payload: exact p50/p90/p99
    // span text lengths per span kind (rank-method percentiles, value at
    // rank ⌈n·k/100⌉) — the alert table for "media captions suddenly
    // doubled" / "text spans collapsed". Rank window runs per kind over
    // the dumped (kind, len) rows; tie order among equal lengths cannot
    // change the value picked at a rank position.
    "x26_span_len_percentiles" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      docTable(s, dir).flatMap(d => d.spans.iterator.map(sp =>
          (sp.kind, Option(sp.text).map(_.length.toLong).getOrElse(0L))))
        .toDF("kind", "len")
        .write.mode("overwrite").parquet(spanLenDumpPath(dir))
      val d = s.read.parquet(spanLenDumpPath(dir))
      val ranked = d
        .withColumn("rn", row_number()
          .over(Window.partitionBy(col("kind")).orderBy(col("len")))
          .cast("long"))
        .withColumn("n",
          count(lit(1)).over(Window.partitionBy(col("kind"))))
      ranked.groupBy(col("kind")).agg(
          max(col("n")).as("n_spans"),
          max(when(expr("rn = (n * 50 + 99) div 100"), col("len")))
            .as("p50_len"),
          max(when(expr("rn = (n * 90 + 99) div 100"), col("len")))
            .as("p90_len"),
          max(when(expr("rn = (n * 99 + 99) div 100"), col("len")))
            .as("p99_len"))
        .orderBy(col("kind"))
    }),

    // Donut-fallback rescue census: per plain-mode type, how many docs
    // the fallback RESCUES (plain-invalid → donut-valid) vs BREAKS
    // (plain-valid → donut-invalid), with the rescue rate in ppm — the
    // one-number justification for paying the fallback kernel's cost on
    // the Unknown route. Directional itemization of x21's flip count;
    // both runs' scalars dump mode-tagged, the oracle re-pivots the
    // identical bytes.
    "x25_donut_rescue" -> ((s, dir) => {
      modeDump(s, dir)
        .groupBy(col("doc_id")).agg(
          max(when(col("mode") === "plain", col("document_type")))
            .as("t_plain"),
          max(when(col("mode") === "plain", col("valid"))).as("v_plain"),
          max(when(col("mode") === "donut", col("valid"))).as("v_donut"))
        .groupBy(col("t_plain").as("document_type")).agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("v_plain") === 0L && col("v_donut") === 1L, 1L)
            .otherwise(0L)).as("n_rescued"),
          sum(when(col("v_plain") === 1L && col("v_donut") === 0L, 1L)
            .otherwise(0L)).as("n_broken"))
        .withColumn("rescue_ppm", expr("n_rescued * 1000000L div n_docs"))
        .orderBy(col("document_type"))
    }),

    // operational skew watchlist: the 5 costliest documents per extracted
    // type under the kernel cost model (text chars + 4096 per media span,
    // the decode surrogate's unit charge). Grouped top-k rides the
    // bounded-heap aggregator (map-side partials — no per-type row_number
    // funnel); the oracle recomputes the ranking from the dumped per-doc
    // costs. This is the itemized version of x23's heavy tail: the table
    // a scheduler reads before picking salt factors (north_rule salting).
    "x24_cost_topk" -> ((s, dir) => {
      import s.implicits._
      // doc_id is the pipeline's "doc-%012d" string — carry its numeric
      // suffix for the long-keyed heap, join back for the display id
      ExtractionPipeline.run(docTable(s, dir)).toDF()
        .select(col("doc_id"),
          substring(col("doc_id"), 5, 12).cast("long").as("doc_num"),
          col("document_type"),
          expr("aggregate(spans, 0L, (acc, sp) -> acc + " +
            "CASE WHEN sp.kind = 'media' THEN 4096L " +
            "ELSE length(coalesce(sp.text, '')) END)").as("cost"))
        .write.mode("overwrite").parquet(costTopkDumpPath(dir))
      val d = s.read.parquet(costTopkDumpPath(dir))
      val top = d.select(col("document_type"), col("doc_num"),
          col("cost").cast("double"))
        .as[(String, Long, Double)]
        .groupByKey(_._1)
        .mapValues(r => (0L, r._2, r._3))
        .agg(new graft.ops.TopK.TopKIds(5).toColumn)
        .toDF("document_type", "top_ids")
        .select(col("document_type"),
          posexplode(col("top_ids")).as(Seq("pos", "doc_num")))
        .select(col("document_type"),
          (col("pos") + 1).cast("long").as("rnk"), col("doc_num"))
      top.join(d.select(col("doc_num"), col("doc_id"), col("cost")),
          "doc_num")
        .select(col("document_type"), col("rnk"), col("doc_id"), col("cost"))
        .orderBy(col("document_type"), col("rnk"))
    }),

    // media-heavy skew census: per-document media-span fraction (ppm)
    // bucketed into deciles (the last bucket absorbs ppm=1_000_000) —
    // the distribution that justifies the salted pipeline (north_rule:
    // "salting for skewed media-heavy documents"): docs / spans / media
    // mass per fraction bucket quantifies exactly how heavy the heavy
    // tail is before choosing a salt factor. Writes its own span-kind
    // dump (never shares x22's — dump paths are 1:1 with queries to keep
    // clobbering impossible); the oracle re-derives the census from the
    // identical bytes. Two partial+final hash aggs, no sort until the
    // 10-row result.
    "x23_media_skew" -> ((s, dir) => {
      graft.ops.InterleaveOps.spanKindDump(docTable(s, dir))
        .write.mode("overwrite").parquet(mediaSkewDumpPath(dir))
      s.read.parquet(mediaSkewDumpPath(dir))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("kind") === "media", 1L).otherwise(0L)).as("n_media"))
        .select(
          expr("least(n_media * 1000000L div n_spans div 100000L, 9L)")
            .as("decile"),
          col("n_spans"), col("n_media"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_spans")).as("sum_spans"),
          sum(col("n_media")).as("sum_media"))
        .orderBy(col("decile"))
    }),

    // span-kind composition per document type: which share of each type's
    // spans is text vs media vs extracted fields, in ppm — the payload-mix
    // table that sizes downstream decode capacity per type (a type whose
    // mix drifts media-heavy needs the salted path). Kind × type explodes
    // once into a dump the oracle re-aggregates from identical bytes; the
    // share window runs over the tiny (type, kind) rollup, never raw spans.
    "x27_type_kind_mix" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      ExtractionPipeline.run(docTable(s, dir)).toDF()
        .select(col("document_type"), explode(col("spans")).as("sp"))
        .select(col("document_type"), col("sp.kind").as("kind"))
        .write.mode("overwrite").parquet(typeKindDumpPath(dir))
      s.read.parquet(typeKindDumpPath(dir))
        .groupBy(col("document_type"), col("kind"))
        .agg(count(lit(1)).as("n_spans"))
        .withColumn("type_total",
          sum(col("n_spans")).over(Window.partitionBy(col("document_type"))))
        .select(col("document_type"), col("kind"), col("n_spans"),
          col("type_total"),
          expr("n_spans * 1000000L div type_total").as("share_ppm"))
        .orderBy(col("document_type"), col("kind"))
    }),

    // inter-span offset-gap census per document type: the spacing
    // structure of the interleaved payload (x22 = kind order, x26 = span
    // lengths, this = offset deltas). Negative gaps would mean
    // out-of-order offsets (x11's corruption class) — n_negative doubles
    // as a standing zero-assertion over the REAL pipeline output. Gaps
    // are row-local in the pipeline; the dump explodes so the oracle can
    // re-derive them from identical bytes with a lag window.
    "x29_offset_gaps" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      ExtractionPipeline.run(docTable(s, dir)).toDF()
        .select(col("doc_id"), col("document_type"),
          posexplode(col("spans")).as(Seq("ord", "sp")))
        .select(col("doc_id"), col("document_type"),
          col("ord").cast("long").as("ord"),
          col("sp.offset").cast("long").as("offset"))
        .write.mode("overwrite").parquet(offsetGapDumpPath(dir))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("ord"))
      s.read.parquet(offsetGapDumpPath(dir))
        .withColumn("gap", col("offset") - lag(col("offset"), 1).over(w))
        .where(col("gap").isNotNull)
        .groupBy(col("document_type"))
        .agg(count(lit(1)).as("n_gaps"),
          min(col("gap")).as("min_gap"), max(col("gap")).as("max_gap"),
          sum(col("gap")).as("sum_gap"),
          sum(when(col("gap") < 0L, 1L).otherwise(0L)).as("n_negative"))
        .orderBy(col("document_type"))
    }),

    // record-field SCHEMA CENSUS over the semi-structured extraction
    // output: which top-level fields each document type's record_json
    // actually carries, and in how many documents — the field-coverage
    // table a downstream schema consumer (or a pydantic-model migration)
    // reads first. Key extraction is engine-native JSON parsing on both
    // sides (json_object_keys here, DuckDB json_keys in the oracle) over
    // the SAME dumped bytes, so the parse semantics themselves are pinned.
    // Empty records ({}) contribute no rows by both engines' convention.
    "x30_field_census" -> ((s, dir) => {
      ExtractionPipeline.run(docTable(s, dir)).toDF()
        .select(col("doc_id"), col("document_type"), col("record_json"))
        .write.mode("overwrite").parquet(recordDumpPath(dir))
      s.read.parquet(recordDumpPath(dir))
        .select(col("document_type"),
          explode(expr("json_object_keys(record_json)")).as("field"))
        .groupBy(col("document_type"), col("field"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("document_type"), col("field"))
    }),

    // field VALUE census (x30's sibling one level down): for the scalar
    // string fields the extractors emit, engine-native JSON path
    // extraction (get_json_object vs DuckDB's ->> semantics) over the
    // SAME dumped record bytes — presence counts, OCTET lengths (byte-
    // exact on both engines, dodging codepoint-vs-UTF-16 drift) and
    // distinct-value cardinality per (type, field). Nested fields
    // (subjects/result) are deliberately out: engines disagree on the
    // text rendering of non-scalar extracts, and that disagreement is a
    // serialization choice, not extraction semantics.
    "x31_field_value_census" -> ((s, dir) => {
      ExtractionPipeline.run(docTable(s, dir)).toDF()
        .select(col("doc_id"), col("document_type"), col("record_json"))
        .write.mode("overwrite").parquet(recordValsDumpPath(dir))
      val fields = scalarRecordFields
      val probes = array(fields.map(f => struct(lit(f).as("field"),
        get_json_object(col("record_json"), s"$$.$f").as("v"))): _*)
      s.read.parquet(recordValsDumpPath(dir))
        .select(col("document_type"), explode(probes).as("p"))
        .select(col("document_type"), col("p.field").as("field"),
          col("p.v").as("v"))
        .where(col("v").isNotNull)
        .groupBy(col("document_type"), col("field"))
        .agg(count(lit(1)).as("n_present"),
          sum(octet_length(col("v"))).cast("long").as("sum_octets"),
          min(octet_length(col("v"))).cast("long").as("min_octets"),
          max(octet_length(col("v"))).cast("long").as("max_octets"),
          countDistinct(col("v")).as("n_distinct"))
        .orderBy(col("document_type"), col("field"))
    }),

    // pipeline-variant A/B audit: the same corpus extracted WITHOUT and
    // WITH the Donut fallback (x01's vs x04's modes), diffed per document —
    // per plain-mode type: docs whose type changed, validity flips, and the
    // net span-count delta. The rollout-gate table you read before flipping
    // a pipeline flag fleet-wide. Both runs' per-doc scalars dump to one
    // mode-tagged table; the oracle recomputes the pivot + diff from
    // identical bytes. One shuffle on doc_id, one on the type.
    "x21_mode_ab_diff" -> ((s, dir) => {
      val per = modeDump(s, dir)
        .groupBy(col("doc_id")).agg(
          max(when(col("mode") === "plain", col("document_type"))).as("t_plain"),
          max(when(col("mode") === "donut", col("document_type"))).as("t_donut"),
          max(when(col("mode") === "plain", col("valid"))).as("v_plain"),
          max(when(col("mode") === "donut", col("valid"))).as("v_donut"),
          max(when(col("mode") === "plain", col("n_spans"))).as("s_plain"),
          max(when(col("mode") === "donut", col("n_spans"))).as("s_donut"))
      per.groupBy(col("t_plain").as("document_type"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("t_donut") =!= col("t_plain"), 1L).otherwise(0L))
            .as("n_type_changed"),
          sum(when(col("v_donut") =!= col("v_plain"), 1L).otherwise(0L))
            .as("n_valid_flips"),
          sum(col("s_donut") - col("s_plain")).as("span_delta"))
        .orderBy(col("document_type"))
    }),

    // character-error-rate census between the two pipeline modes: per
    // document type, how FAR apart the plain and donut record_jsons are
    // (integer levenshtein over a 512-char prefix — the cap bounds the
    // O(n²) comparator at 10^12 docs; x21 counts WHICH fields flipped,
    // this measures edit magnitude, the OCR-quality drift signal)
    "x32_mode_cer" -> ((s, dir) => {
      val per = modeDump(s, dir).groupBy(col("doc_id")).agg(
        max(when(col("mode") === "plain", col("document_type")))
          .as("document_type"),
        max(when(col("mode") === "plain", col("record_json"))).as("r_plain"),
        max(when(col("mode") === "donut", col("record_json"))).as("r_donut"))
      per.select(col("document_type"),
          // identical-string fast path: most docs are mode-identical, so
          // the O(512²) DP comparator only runs on rows whose jsons
          // actually differ — levenshtein(x, x) = 0 by definition, zero
          // semantic change (r4 "What's wrong #2")
          when(col("r_plain") === col("r_donut"), lit(0L))
            .otherwise(levenshtein(substring(col("r_plain"), 1, 512),
              substring(col("r_donut"), 1, 512)).cast("long")).as("lev"),
          greatest(length(substring(col("r_plain"), 1, 512)),
            length(substring(col("r_donut"), 1, 512))).cast("long").as("den"))
        .groupBy(col("document_type"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("lev") === 0, 1L).otherwise(0L)).as("n_identical"),
          sum(col("lev")).as("sum_edits"),
          expr("CAST(sum(lev) * 1000000 DIV sum(den) AS BIGINT)")
            .as("cer_ppm"))
        .orderBy(col("document_type"))
    })
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    pipelineQueries ++ RelationalQueries.queries ++ PipelineOpsQueries.queries

  /** Driver contract entry point (the driver's correctness gate runs Verify
    * at sf0.01, which calls `oracleSqlFor(sfDir)` — the no-arg form keeps the
    * documented contract shape). */
  def oracleSql: Map[String, String] = oracleSqlFor("sf0.01")

  /** Oracles with all dump/golden paths interpolated from the SAME
    * count-keyed helpers the queries use — query and oracle can never read
    * different artifacts (round-2 VERDICT "What's wrong #2"). Integer sums
    * are CAST AS BIGINT: DuckDB `sum()` over INT returns HUGEINT, which
    * pandas renders as float64 (`296.0` vs `296`) and fails the driver's
    * value hash even when every value is equal. */
  def oracleSqlFor(dir: String): Map[String, String] =
    RelationalQueries.oracleSql ++ PipelineOpsQueries.oracleSqlFor(dir) ++
      graft.classify.ClassifyQuery.oracleSql ++ Map(
      "x02_extract_metrics" ->
        s"""SELECT document_type, is_valid, count(*) AS doc_count,
           CAST(sum(round(ocr_accuracy_score * 100)) AS BIGINT) AS sum_ocr_cents,
           CAST(sum(n_spans) AS BIGINT) AS sum_spans,
           CAST(sum(CASE WHEN validation_error <> '' THEN 1 ELSE 0 END) AS BIGINT) AS validation_failures
           FROM read_parquet('${extractDumpPath(dir)}/*.parquet')
           GROUP BY document_type, is_valid ORDER BY document_type, is_valid""",
      "x03_classify_counts" ->
        s"""SELECT document_type, count(*) AS doc_count,
           CAST(sum(CASE WHEN is_valid THEN 1 ELSE 0 END) AS BIGINT) AS valid_count
           FROM read_parquet('${extractDumpPath(dir)}/*.parquet')
           GROUP BY document_type ORDER BY document_type""",
      "x18_error_taxonomy" ->
        s"""SELECT document_type, validation_error,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS example_doc
           FROM read_parquet('${extractDumpPath(dir)}/*.parquet')
           GROUP BY document_type, validation_error
           ORDER BY document_type, validation_error""",
      "x19_confidence_calibration" ->
        s"""SELECT CAST(floor(ocr_accuracy_score * 10) AS BIGINT) AS conf_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN is_valid THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(sum(n_spans) AS BIGINT) AS sum_spans
           FROM read_parquet('${extractDumpPath(dir)}/*.parquet')
           GROUP BY 1 ORDER BY conf_bucket""",
      // same ranked cumulative pivot over the dumped failures
      "x28_error_pareto" ->
        s"""WITH c AS (SELECT document_type, validation_error, count(*) AS n
               FROM read_parquet('${errorParetoDumpPath(dir)}/*.parquet')
               GROUP BY 1, 2),
           r AS (SELECT document_type, validation_error, n,
               row_number() OVER (PARTITION BY document_type
                 ORDER BY n DESC, validation_error) AS rnk,
               sum(n) OVER (PARTITION BY document_type
                 ORDER BY n DESC, validation_error
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(n) OVER (PARTITION BY document_type) AS total
             FROM c)
           SELECT document_type, CAST(rnk AS BIGINT) AS rnk,
             validation_error, CAST(n AS BIGINT) AS n,
             CAST(CAST(cum AS BIGINT) * 1000000 // CAST(total AS BIGINT)
               AS BIGINT) AS cum_ppm
           FROM r ORDER BY document_type, rnk""",
      // same rank-method percentiles over the dumped lengths
      "x26_span_len_percentiles" ->
        s"""WITH d AS (SELECT kind, len
               FROM read_parquet('${spanLenDumpPath(dir)}/*.parquet')),
           ranked AS (SELECT kind, len,
               row_number() OVER (PARTITION BY kind ORDER BY len) AS rn,
               count(*) OVER (PARTITION BY kind) AS n FROM d)
           SELECT kind, CAST(max(n) AS BIGINT) AS n_spans,
             CAST(max(CASE WHEN rn = (n * 50 + 99) // 100 THEN len END)
               AS BIGINT) AS p50_len,
             CAST(max(CASE WHEN rn = (n * 90 + 99) // 100 THEN len END)
               AS BIGINT) AS p90_len,
             CAST(max(CASE WHEN rn = (n * 99 + 99) // 100 THEN len END)
               AS BIGINT) AS p99_len
           FROM ranked GROUP BY kind ORDER BY kind""",
      // same rollup + share arithmetic from the dumped (type, kind) rows
      "x27_type_kind_mix" ->
        s"""WITH per AS (SELECT document_type, kind, count(*) AS n_spans
               FROM read_parquet('${typeKindDumpPath(dir)}/*.parquet')
               GROUP BY document_type, kind),
           tot AS (SELECT document_type,
               CAST(sum(n_spans) AS BIGINT) AS type_total
             FROM per GROUP BY document_type)
           SELECT p.document_type, p.kind,
             CAST(p.n_spans AS BIGINT) AS n_spans, t.type_total,
             CAST(p.n_spans * 1000000 // t.type_total AS BIGINT) AS share_ppm
           FROM per p JOIN tot t USING (document_type)
           ORDER BY p.document_type, p.kind""",
      // same field probes via DuckDB's ->> path semantics over the
      // identical dumped bytes; strlen = octets on both engines
      "x31_field_value_census" ->
        s"""WITH f AS (SELECT unnest([${scalarRecordFields
               .map("'" + _ + "'").mkString(", ")}]) AS field),
           v AS (SELECT document_type, f.field,
                   json_extract_string(record_json, '$$.' || f.field) AS v
                 FROM read_parquet('${recordValsDumpPath(dir)}/*.parquet'), f)
           SELECT document_type, field,
             CAST(count(*) AS BIGINT) AS n_present,
             CAST(sum(strlen(v)) AS BIGINT) AS sum_octets,
             CAST(min(strlen(v)) AS BIGINT) AS min_octets,
             CAST(max(strlen(v)) AS BIGINT) AS max_octets,
             CAST(count(DISTINCT v) AS BIGINT) AS n_distinct
           FROM v WHERE v IS NOT NULL
           GROUP BY document_type, field
           ORDER BY document_type, field""",
      // DuckDB's own JSON parser over the identical dumped record bytes
      "x30_field_census" ->
        s"""SELECT document_type, field, CAST(count(*) AS BIGINT) AS n_docs
           FROM (SELECT document_type,
                   unnest(json_keys(record_json)) AS field
                 FROM read_parquet('${recordDumpPath(dir)}/*.parquet'))
           GROUP BY document_type, field
           ORDER BY document_type, field""",
      // lag-window re-derivation of the gaps from the dumped offsets
      "x29_offset_gaps" ->
        s"""WITH d AS (SELECT doc_id, document_type, ord, "offset"
               FROM read_parquet('${offsetGapDumpPath(dir)}/*.parquet')),
           g AS (SELECT document_type,
               "offset" - lag("offset") OVER (PARTITION BY doc_id
                                              ORDER BY ord) AS gap
             FROM d)
           SELECT document_type, count(*) AS n_gaps,
             CAST(min(gap) AS BIGINT) AS min_gap,
             CAST(max(gap) AS BIGINT) AS max_gap,
             CAST(sum(gap) AS BIGINT) AS sum_gap,
             CAST(sum(CASE WHEN gap < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_negative
           FROM g WHERE gap IS NOT NULL
           GROUP BY document_type ORDER BY document_type""",
      // rescue/break pivot recomputed from the mode-tagged dump
      "x25_donut_rescue" ->
        s"""WITH per AS (SELECT doc_id,
               max(CASE WHEN mode = 'plain' THEN document_type END)
                 AS t_plain,
               max(CASE WHEN mode = 'plain' THEN valid END) AS v_plain,
               max(CASE WHEN mode = 'donut' THEN valid END) AS v_donut
             FROM read_parquet('${modeDumpPath(dir)}/*.parquet')
             GROUP BY doc_id)
           SELECT t_plain AS document_type, count(*) AS n_docs,
             CAST(sum(CASE WHEN v_plain = 0 AND v_donut = 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_rescued,
             CAST(sum(CASE WHEN v_plain = 1 AND v_donut = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_broken,
             CAST(CAST(sum(CASE WHEN v_plain = 0 AND v_donut = 1
                 THEN 1 ELSE 0 END) AS BIGINT) * 1000000 // count(*)
               AS BIGINT) AS rescue_ppm
           FROM per GROUP BY t_plain ORDER BY t_plain""",
      // per-type ranking recomputed from the dumped per-doc costs with
      // the same (cost desc, doc_id asc) total order
      "x24_cost_topk" ->
        s"""WITH d AS (SELECT doc_id, document_type, cost
               FROM read_parquet('${costTopkDumpPath(dir)}/*.parquet')),
           r AS (SELECT document_type, doc_id, cost,
               row_number() OVER (PARTITION BY document_type
                 ORDER BY cost DESC, doc_id) AS rnk FROM d)
           SELECT document_type, CAST(rnk AS BIGINT) AS rnk, doc_id, cost
           FROM r WHERE rnk <= 5 ORDER BY document_type, rnk""",
      // decile census rebuilt from the dumped span kinds with the same
      // floor-divide ppm bucketing
      "x23_media_skew" ->
        s"""WITH per AS (SELECT doc_id, count(*) AS n_spans,
               sum(CASE WHEN kind = 'media' THEN 1 ELSE 0 END) AS n_media
             FROM read_parquet('${mediaSkewDumpPath(dir)}/*.parquet')
             GROUP BY doc_id)
           SELECT CAST(least(n_media * 1000000 // n_spans // 100000, 9)
               AS BIGINT) AS decile,
             count(*) AS n_docs,
             CAST(sum(n_spans) AS BIGINT) AS sum_spans,
             CAST(sum(n_media) AS BIGINT) AS sum_media
           FROM per GROUP BY decile ORDER BY decile""",
      // transition matrix rebuilt with lag() windows over the kind dump
      "x22_kind_transitions" ->
        s"""WITH s AS (SELECT doc_id, ord, kind
               FROM read_parquet('${kindDumpPath(dir)}/*.parquet')),
           t AS (SELECT COALESCE(lag(kind)
                 OVER (PARTITION BY doc_id ORDER BY ord), '^') AS from_kind,
               kind AS to_kind FROM s)
           SELECT from_kind, to_kind, count(*) AS n_transitions
           FROM t GROUP BY from_kind, to_kind
           ORDER BY from_kind, to_kind""",
      // A/B diff recomputed from the mode-tagged dump: pivot per doc, then
      // the same per-type census
      "x21_mode_ab_diff" ->
        s"""WITH per AS (SELECT doc_id,
             max(CASE WHEN mode = 'plain' THEN document_type END) AS t_plain,
             max(CASE WHEN mode = 'donut' THEN document_type END) AS t_donut,
             max(CASE WHEN mode = 'plain' THEN valid END) AS v_plain,
             max(CASE WHEN mode = 'donut' THEN valid END) AS v_donut,
             max(CASE WHEN mode = 'plain' THEN n_spans END) AS s_plain,
             max(CASE WHEN mode = 'donut' THEN n_spans END) AS s_donut
             FROM read_parquet('${modeDumpPath(dir)}/*.parquet')
             GROUP BY doc_id)
           SELECT t_plain AS document_type, count(*) AS n_docs,
             CAST(sum(CASE WHEN t_donut <> t_plain THEN 1 ELSE 0 END) AS BIGINT)
               AS n_type_changed,
             CAST(sum(CASE WHEN v_donut <> v_plain THEN 1 ELSE 0 END) AS BIGINT)
               AS n_valid_flips,
             CAST(sum(s_donut - s_plain) AS BIGINT) AS span_delta
           FROM per GROUP BY t_plain ORDER BY t_plain""",
      // CER recomputed from the mode-tagged record_json dump with DuckDB's
      // levenshtein over the same 512-char prefixes
      "x32_mode_cer" ->
        s"""WITH per AS (SELECT doc_id,
             max(CASE WHEN mode = 'plain' THEN document_type END)
               AS document_type,
             max(CASE WHEN mode = 'plain' THEN record_json END) AS r_plain,
             max(CASE WHEN mode = 'donut' THEN record_json END) AS r_donut
             FROM read_parquet('${modeDumpPath(dir)}/*.parquet')
             GROUP BY doc_id),
           m AS (SELECT document_type,
               levenshtein(substring(r_plain, 1, 512),
                           substring(r_donut, 1, 512)) AS lev,
               greatest(length(substring(r_plain, 1, 512)),
                        length(substring(r_donut, 1, 512))) AS den
             FROM per)
           SELECT document_type, count(*) AS n_docs,
             CAST(sum(CASE WHEN lev = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_identical,
             CAST(sum(lev) AS BIGINT) AS sum_edits,
             CAST(sum(lev) * 1000000 // sum(den) AS BIGINT) AS cer_ppm
           FROM m GROUP BY document_type ORDER BY document_type""",
      // observe() held to the hash gate: re-aggregate the observed sink's
      // actual bytes — the task-side accumulators must match exactly
      "x16_observed_metrics" ->
        s"""SELECT count(*) AS n_docs,
           CAST(sum(n_spans) AS BIGINT) AS sum_spans,
           CAST(sum(CASE WHEN is_valid THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
           FROM read_parquet('${observedDumpPath(dir)}/*.parquet')""",
      // the crash/resume path must reproduce the straight pipeline exactly:
      // same oracle table as x02 (the single-job extraction dump)
      "x10_checkpoint_resume" ->
        s"""SELECT document_type, is_valid, count(*) AS doc_count,
           CAST(sum(round(ocr_accuracy_score * 100)) AS BIGINT) AS sum_ocr_cents,
           CAST(sum(n_spans) AS BIGINT) AS sum_spans,
           CAST(sum(CASE WHEN validation_error <> '' THEN 1 ELSE 0 END) AS BIGINT) AS validation_failures
           FROM read_parquet('${extractDumpPath(dir)}/*.parquet')
           GROUP BY document_type, is_valid ORDER BY document_type, is_valid""",
      // the audit recomputed from the dumped (doc_id, ord, offset) rows —
      // any disagreement between the engine's row-local pass and the
      // window-function formulation fails the driver hash
      "x11_span_audit" ->
        s"""WITH s AS (SELECT doc_id, ord, "offset"
               FROM read_parquet('${spanAuditDumpPath(dir)}/*.parquet')),
           v AS (SELECT doc_id,
               CASE WHEN lag("offset") OVER w IS NOT NULL
                    AND "offset" <= lag("offset") OVER w THEN 1 ELSE 0 END AS viol,
               CASE WHEN "offset" < 0 THEN 1 ELSE 0 END AS neg
             FROM s WINDOW w AS (PARTITION BY doc_id ORDER BY ord))
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                  CAST(sum(viol) AS BIGINT) AS n_order_violations,
                  CAST(sum(neg) AS BIGINT) AS n_negative_offsets,
                  CAST(CASE WHEN sum(viol) = 0 AND sum(neg) = 0
                       THEN 1 ELSE 0 END AS BIGINT) AS is_wellformed
           FROM v GROUP BY doc_id ORDER BY doc_id""",
      "x08_span_runs" ->
        s"""WITH s AS (SELECT doc_id, ord, kind
               FROM read_parquet('${spansDumpPath(dir)}/*.parquet')),
           brk AS (SELECT doc_id, ord, kind,
               CASE WHEN lag(kind) OVER w IS NULL
                    OR lag(kind) OVER w <> kind THEN 1 ELSE 0 END AS b,
               CASE WHEN lag(kind) OVER w = 'text' AND kind = 'media'
                    THEN 1 ELSE 0 END AS adj
             FROM s WINDOW w AS (PARTITION BY doc_id ORDER BY ord)),
           rid AS (SELECT doc_id, ord, kind, adj,
               sum(b) OVER (PARTITION BY doc_id ORDER BY ord) AS run_id
             FROM brk),
           runlen AS (SELECT doc_id, kind, run_id, count(*) AS rl
             FROM rid GROUP BY 1, 2, 3),
           perdoc AS (SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(CASE WHEN kind <> 'media' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_text_spans,
               CAST(sum(CASE WHEN kind = 'media' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_media_spans,
               CAST(max(run_id) AS BIGINT) AS n_runs,
               CAST(sum(adj) AS BIGINT) AS n_text_media_adj
             FROM rid GROUP BY doc_id),
           mx AS (SELECT doc_id,
               CAST(COALESCE(max(CASE WHEN kind <> 'media' THEN rl END), 0)
                    AS BIGINT) AS max_text_run,
               CAST(COALESCE(max(CASE WHEN kind = 'media' THEN rl END), 0)
                    AS BIGINT) AS max_media_run
             FROM runlen GROUP BY doc_id)
           SELECT p.doc_id, n_spans, n_text_spans, n_media_spans, n_runs,
                  max_text_run, max_media_run, n_text_media_adj
           FROM perdoc p JOIN mx USING (doc_id) ORDER BY p.doc_id""",
      "x09_mm_packing" ->
        s"""WITH c AS (SELECT doc_id, CAST(cost AS BIGINT) AS n_tokens,
               CAST(COALESCE(sum(cost) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS global_offset
             FROM read_parquet('${mmCostDumpPath(dir)}/*.parquet'))
           SELECT doc_id, n_tokens, global_offset,
                  CAST(global_offset // 1024 AS BIGINT) AS start_pack,
                  CAST((global_offset + greatest(n_tokens, 1) - 1) // 1024
                       AS BIGINT) AS end_pack
           FROM c ORDER BY doc_id""",
      // independent re-rendering from the exploded span dump: ordered
      // string_agg must reproduce the engine's row-local concatenation
      // byte-for-byte (md5 equality per doc)
      "x12_render_interleaved" ->
        s"""WITH sp AS (SELECT doc_id, ord, kind, text, media_ref, "offset"
               FROM read_parquet('${renderDumpPath(dir)}/*.parquet')),
           r AS (SELECT doc_id,
               string_agg(CASE WHEN kind = 'text' THEN text
                          ELSE '<|' || kind || ':' || media_ref || '|>' END,
                          '' ORDER BY "offset", ord) AS rendered,
               CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(CASE WHEN kind <> 'text' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_media
             FROM sp GROUP BY doc_id)
           SELECT doc_id, n_spans, n_media,
                  CAST(length(rendered) AS BIGINT) AS rendered_len,
                  md5(rendered) AS rendered_hash
           FROM r ORDER BY doc_id""",
      // re-aggregation of the stripped-line dump: ordered string_agg must
      // reproduce the engine's sorted-collect_list concatenation exactly
      "x13_html_strip" ->
        s"""SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(length(line)) AS BIGINT) AS n_chars,
             md5(string_agg(line, chr(10) ORDER BY ord)) AS lines_hash
           FROM read_parquet('${htmlStripDumpPath(dir)}/*.parquet')
           GROUP BY doc_id ORDER BY doc_id""",
      // FK audit recomputed with NOT EXISTS anti-joins over the two dumps
      "x14_media_integrity" ->
        s"""WITH r AS (SELECT doc_id, media_ref
               FROM read_parquet('${mediaRefsDumpPath(dir)}/*.parquet')),
           m AS (SELECT media_ref
               FROM read_parquet('${mediaCatalogDumpPath(dir)}/*.parquet')),
           dang AS (SELECT doc_id, media_ref FROM r WHERE NOT EXISTS
                      (SELECT 1 FROM m WHERE m.media_ref = r.media_ref)),
           orph AS (SELECT media_ref FROM m WHERE NOT EXISTS
                      (SELECT 1 FROM r WHERE r.media_ref = m.media_ref))
           SELECT (SELECT CAST(count(*) AS BIGINT) FROM r) AS n_refs,
                  (SELECT CAST(count(*) AS BIGINT) FROM m) AS n_media,
                  (SELECT CAST(count(*) AS BIGINT) FROM dang)
                    AS n_dangling_refs,
                  (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) FROM dang)
                    AS n_dangling_docs,
                  (SELECT CAST(count(*) AS BIGINT) FROM orph)
                    AS n_orphaned""",
      // curation-chain replay: same filter over the stats dump, running-sum
      // packing over the surviving costs, per-pack rollup
      "x15_mm_curation" ->
        s"""WITH surv AS (SELECT doc_id
               FROM read_parquet('${mmCurationStatsPath(dir)}/*.parquet')
               WHERE n_media >= 1 AND rendered_len >= 64),
           sc AS (SELECT c.doc_id, CAST(c.cost AS BIGINT) AS cost
               FROM read_parquet('${mmCurationCostPath(dir)}/*.parquet') c
               JOIN surv USING (doc_id)),
           o AS (SELECT doc_id, cost,
               CAST(COALESCE(sum(cost) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS off
             FROM sc)
           SELECT CAST(off // 1024 AS BIGINT) AS pack,
                  CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(cost) AS BIGINT) AS n_tokens
           FROM o GROUP BY off // 1024 ORDER BY pack""",
      // lineage audit re-derived in SQL: recount each bucket group from
      // the per-doc sink dump, join the engine's lineage parquet, compare
      "x20_lineage_audit" ->
        s"""WITH actual AS (SELECT CAST("group" AS INTEGER) AS bucket_group,
               count(*) AS n_docs,
               CAST(sum(n_spans) AS BIGINT) AS sum_spans,
               CAST(sum(CASE WHEN is_valid THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_failures
             FROM read_parquet('${lineageDumpPath(dir)}/*.parquet')
             GROUP BY 1),
           lin AS (SELECT partition_id AS bucket_group, doc_count,
               span_count, failures
             FROM read_parquet('${lineageRunPath(dir)}/lineage/*.parquet'))
           SELECT bucket_group, n_docs, sum_spans, n_failures,
             CAST(CASE WHEN n_docs = doc_count AND sum_spans = span_count
                  AND n_failures = failures THEN 1 ELSE 0 END AS BIGINT)
               AS lineage_ok
           FROM actual JOIN lin USING (bucket_group)
           ORDER BY bucket_group""",
      // caption pairing re-derived with lead() in render order over the
      // full span dump — media span followed by a text span forms a pair
      "x17_caption_pairs" ->
        s"""WITH sp AS (SELECT doc_id, kind, text, media_ref,
               row_number() OVER w - 1 AS pos,
               lead(kind) OVER w AS next_kind,
               lead(text) OVER w AS next_text
             FROM read_parquet('${captionDumpPath(dir)}/*.parquet')
             WINDOW w AS (PARTITION BY doc_id ORDER BY "offset", ord))
           SELECT doc_id, CAST(pos AS BIGINT) AS ord, media_ref,
                  CAST(length(next_text) AS BIGINT) AS caption_len,
                  md5(next_text) AS caption_hash
           FROM sp WHERE kind = 'media' AND next_kind = 'text'
           ORDER BY doc_id, ord""") ++
      goldenOracles(dir)

  /** x01/x04/x05 oracles: the committed golden parquets ARE the reference
    * code's own output (fixtures generated by executing the reference's
    * Python — an oracle independent of every line of this engine). Emitted
    * only when a golden exists for the run's doc count, so an off-contract
    * sf degrades to the rows-only check instead of a broken read. */
  private def goldenOracles(dir: String): Map[String, String] = {
    def sql(donut: Boolean): Option[(Boolean, String)] = {
      val p = goldenPath(dir, donut)
      if (new java.io.File(p).exists())
        Some(donut -> s"""SELECT doc_id, document_type, is_valid,
             validation_error, ocr_cents, record_md5, spans_md5
             FROM read_parquet('$p')""")
      else None
    }
    (sql(donut = false), sql(donut = true)) match {
      case (Some((_, plain)), Some((_, donut))) =>
        Map("x01_extract_e2e" -> plain, "x05_extract_salted" -> plain,
            "x04_extract_donut" -> donut)
      case _ => Map.empty
    }
  }
}
