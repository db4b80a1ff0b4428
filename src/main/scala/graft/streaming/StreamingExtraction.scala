package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.kernel.Backends
import graft.model.{Doc, DocResult}
import graft.pipe.ExtractionPipeline

/** Structured Streaming surface (readStream → transforms → writeStream).
  *
  * The extraction pipeline is per-document stateless, so the same kernel
  * functions run unchanged on a streaming Dataset[Doc] — micro-batches are
  * the streaming analogue of the reference's Celery queue (app/tasks.py):
  * arrival-ordered work units, per-worker model reuse, progress via the
  * streaming query listener instead of Redis task states.
  */
object StreamingExtraction {

  /** Streaming extraction: same map/mapPartitions chain as the batch path.
    * Works on any streaming Dataset[Doc] (file source, Kafka-decoded,
    * MemoryStream in tests). */
  def extract(docs: Dataset[Doc], useDonut: Boolean = false,
              backendName: String = "deterministic"): Dataset[DocResult] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      val backend = Backends.ocr(backendName)
      val donut = () => Backends.donut(backendName)
      it.map { d =>
        ExtractionPipeline.extractDoc(
          ExtractionPipeline.ocrDoc(d, backend), useDonut, donut)
      }
    }
  }

  /** Event-time windowed extraction metrics with a watermark: doc counts
    * and validity by document_type per processing window. `ts` must be an
    * event-time column on the input. */
  def windowedMetrics(results: DataFrame, tsCol: String = "ts",
                      watermark: String = "10 minutes",
                      windowLen: String = "5 minutes"): DataFrame =
    results
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("document_type"))
      .agg(count(lit(1)).as("doc_count"),
        sum(when(col("is_valid"), 1L).otherwise(0L)).as("valid_count"))
}
