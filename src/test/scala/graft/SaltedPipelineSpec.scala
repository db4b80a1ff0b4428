package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.Synthesizer
import graft.pipe.{ExtractionPipeline, SaltedPipeline}

/** The salted (skew-spreading) path must produce exactly the fused path's
  * output — including bit-identical float scores — on a corpus that
  * contains heavy (10–50 media span) documents. */
class SaltedPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("salted pipeline output equals fused pipeline output") {
    // seed range chosen to include several 'heavy' docs (~1% of corpus)
    val docs = Synthesizer.docs(spark, 800, 42L)
    val heavyCount = docs.collect().count(_.spans.length >= 8)
    assert(heavyCount > 0, "test corpus must contain heavy docs")

    val fused = ExtractionPipeline.run(docs).toDF()
      .select(col("doc_id"), col("record_json"), to_json(col("spans")).as("sp"),
        col("is_valid"), col("ocr_accuracy_score"))
    val salted = SaltedPipeline.run(docs).toDF()
      .select(col("doc_id"), col("record_json"), to_json(col("spans")).as("sp"),
        col("is_valid"), col("ocr_accuracy_score"))

    assert(salted.count() === fused.count())
    assert(fused.join(salted, fused.columns.toSeq, "left_anti").count() === 0)
    assert(salted.join(fused, fused.columns.toSeq, "left_anti").count() === 0)
  }
}
