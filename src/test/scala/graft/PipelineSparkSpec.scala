package graft

import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.Synthesizer
import graft.pipe.{CheckpointRunner, ExtractionPipeline}

/** Distributed-execution invariants: the span-sequence output must be
  * identical at any parallelism (BASELINE invariant — span order is
  * row-local), and the checkpoint runner must resume after a crash with
  * byte-identical results. */
class PipelineSparkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def resultsAt(partitions: Int, count: Long = 400) = {
    val docs = Synthesizer.docs(spark, count, seed = 42L, partitions = partitions)
    ExtractionPipeline.run(docs).toDF()
      .select(col("doc_id"), col("record_json"), to_json(col("spans")).as("spans_json"),
        col("is_valid"), col("validation_error"))
  }

  test("span-sequence equality across parallelism levels (anti-join empty both ways)") {
    val a = resultsAt(3)
    val b = resultsAt(17)
    assert(a.count() === 400)
    val cols = a.columns.map(col).toSeq
    assert(a.join(b, a.columns.toSeq, "left_anti").count() === 0)
    assert(b.join(a, b.columns.toSeq, "left_anti").count() === 0)
  }

  test("repartition does not change results") {
    val docs = Synthesizer.docs(spark, 300, 42L, partitions = 4)
    val base = ExtractionPipeline.run(docs).toDF()
      .select(col("doc_id"), col("record_json"))
    val repart = ExtractionPipeline.run(docs.repartition(13)).toDF()
      .select(col("doc_id"), col("record_json"))
    assert(base.join(repart, Seq("doc_id", "record_json"), "left_anti").count() === 0)
    assert(base.count() === repart.count())
  }

  test("spark pipeline output matches the reference-oracle fixtures end-to-end") {
    import com.fasterxml.jackson.databind.ObjectMapper
    val mapper = new ObjectMapper()
    val url = getClass.getClassLoader.getResource("fixtures/expected.json")
    val root = mapper.readTree(url)
    val expected = (0 until root.size()).map { i =>
      val e = root.get(i)
      (e.get("doc_id").asText(), e.get("record_json").asText(),
        e.get("is_valid").asBoolean())
    }
    import spark.implicits._
    val expectedDf = expected.toDF("doc_id", "record_json", "is_valid")
    val got = ExtractionPipeline.run(
      Synthesizer.docs(spark, root.size().toLong, 42L)).toDF()
      .select(col("doc_id"), col("record_json"), col("is_valid"))
    val mismatch = got.join(expectedDf,
      Seq("doc_id", "record_json", "is_valid"), "left_anti")
    assert(got.count() === root.size().toLong)
    assert(mismatch.count() === 0)
  }

  test("checkpoint runner resumes after a crash with identical output") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val docs = Synthesizer.docs(spark, 300, 42L)

    // crash after 2 of 4 groups
    val crashing = new CheckpointRunner(dir, buckets = 32, groups = 4)
    intercept[RuntimeException] { crashing.run(docs, failAfterGroups = 2) }
    assert(crashing.completedGroups().size === 2)

    // resume completes only the remaining groups
    val resumed = new CheckpointRunner(dir, buckets = 32, groups = 4)
    assert(resumed.run(docs) === 2)
    assert(resumed.completedGroups() === Set(0, 1, 2, 3))

    // re-run is a no-op
    assert(new CheckpointRunner(dir, buckets = 32, groups = 4).run(docs) === 0)

    // JSON-lines run log (utils/logger.py analogue): every line parses,
    // lifecycle events recorded across crash + resume + no-op runs
    val logLines = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(s"$dir/logs/run.jsonl"))
    assert(logLines.size >= 7) // 3 starts + 4 group-completes + ends/error
    logLines.forEach { l =>
      assert(l.startsWith("{\"timestamp\":\"") && l.endsWith("}"), l)
      assert(l.contains("\"level\":\"") && l.contains("\"message\":\""), l)
    }
    assert(logLines.asScala.exists(_.contains("injected failure")))
    assert(logLines.asScala.count(_.contains("group complete")) === 4)
    assert(logLines.asScala.exists(_.contains("run finished")))

    // output identical to the single-shot fused pipeline
    val ckpt = resumed.results(spark).toDF()
      .select(col("doc_id"), col("record_json"))
    val direct = ExtractionPipeline.run(docs).toDF()
      .select(col("doc_id"), col("record_json"))
    assert(ckpt.count() === 300)
    assert(ckpt.join(direct, Seq("doc_id", "record_json"), "left_anti").count() === 0)

    // lineage covers all docs
    val lineage = resumed.lineage(spark)
    assert(lineage.toDF().agg(sum(col("doc_count"))).collect()(0).getLong(0) === 300L)
  }

  test("extraction plan is a single narrow stage (no shuffle)") {
    val docs = Synthesizer.docs(spark, 10, 42L)
    val plan = ExtractionPipeline.run(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in plan:\n$plan")
  }
}
