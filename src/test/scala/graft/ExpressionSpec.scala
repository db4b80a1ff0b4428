package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.functions.{functions => gf, GraftExtensions}

/** Custom Catalyst expressions: Column API, SQL registration, codegen
  * execution, and parity with the Scala reference implementations. */
class ExpressionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("py_title expression matches PyText.title through codegen") {
    import spark.implicits._
    val in = Seq("ramesh kumar", "o'neil 2nd-gen", "ABC DEF", "a1b2", "")
    val out = in.toDF("s").select(gf.py_title(col("s"))).as[String].collect()
    assert(out.toSeq === in.map(graft.text.PyText.title))
  }

  test("py_round2 expression is banker's rounding (not Spark HALF_UP)") {
    import spark.implicits._
    val out = Seq(0.125, 2.675).toDF("d")
      .select(gf.py_round2(col("d"))).as[Double].collect()
    assert(out.toSeq === Seq(0.12, 2.67))
    // Spark's own round() gives 0.13 / 2.68 here — the trap SURVEY.md §7.6 names
  }

  test("SQL registration via GraftExtensions descriptors") {
    GraftExtensions.registerInto(spark)
    val r = spark.sql("SELECT py_title('visvesvaraya tech') AS t, py_round2(CAST(0.125 AS DOUBLE)) AS r")
      .collect()(0)
    assert(r.getString(0) === "Visvesvaraya Tech")
    assert(r.getDouble(1) === 0.12)
  }

  test("expression stays inside WholeStageCodegen") {
    val plan = spark.range(10)
      .select(gf.py_title(org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("x"), col("id"))))
      .queryExecution.executedPlan.toString
    // "*(1)" is the WholeStageCodegen marker in the compact plan string
    assert(plan.trim.startsWith("*(1) Project [py_title("), plan)
  }
}
