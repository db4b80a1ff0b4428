package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Synthesizer
import graft.pipe.ExtractionPipeline

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Extraction-pipeline queries (x*) run over the deterministic synthesized
  * interleaved doc table (seed 42; doc count scales with the sf dir name) —
  * their correctness gate is the reference-code parity fixtures
  * (ReferenceParitySpec), not DuckDB, so they carry no oracleSql.
  * SQL-expressible queries (q*) run over the driver's parquet tables in
  * `sfDir` and each has an exact DuckDB oracle.
  */
object SparkEntry {

  /** sf dir name → synthesized doc count (sf0.001→200 … sf0.1→20k). */
  def docCountFor(sfDir: String): Long = {
    val m = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
    val scale = m.map(_.group(1).toDouble).getOrElse(0.01)
    math.max((scale * 200000).toLong, 200L)
  }

  def docTable(s: SparkSession, sfDir: String) =
    Synthesizer.docs(s, docCountFor(sfDir), seed = 42L)

  /** Flagship: end-to-end extraction over the interleaved doc table. */
  def entry(spark: SparkSession): DataFrame =
    ExtractionPipeline.run(docTable(spark, "sf0.001")).toDF()

  private val pipelineQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- extraction pipeline (parity-gated; rows-only for the driver) ----
    "x01_extract_e2e" -> ((s, dir) =>
      ExtractionPipeline.run(docTable(s, dir)).toDF()),
    "x02_extract_metrics" -> ((s, dir) =>
      ExtractionPipeline.metrics(ExtractionPipeline.run(docTable(s, dir)))
        .orderBy(col("document_type"), col("is_valid"))),
    "x03_classify_counts" -> ((s, dir) =>
      ExtractionPipeline.run(docTable(s, dir)).toDF()
        .groupBy(col("document_type"))
        .agg(count(lit(1)).as("doc_count"),
             sum(when(col("is_valid"), 1L).otherwise(0L)).as("valid_count"))
        .orderBy(col("document_type"))),
    "x04_extract_donut" -> ((s, dir) =>
      ExtractionPipeline.run(docTable(s, dir), useDonut = true).toDF()),
    "x05_extract_salted" -> ((s, dir) =>
      graft.pipe.SaltedPipeline.run(docTable(s, dir)).toDF())
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    pipelineQueries ++ RelationalQueries.queries ++ PipelineOpsQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ PipelineOpsQueries.oracleSql
}
