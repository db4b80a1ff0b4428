package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the Python-parity scalar functions that
  * column pipelines need (SURVEY.md §2.2 "Functions, not UDFs"): a custom
  * `Expression` with `doGenCode` stays inside whole-stage codegen — no
  * lambda boxing, no Row marshaling — unlike a Scala `udf()`.
  */
object PyFuncs {
  /** Called from generated code. */
  def title(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.text.PyText.title(s.toString))
  def round2(d: Double): Double = graft.text.PyText.round2(d)
}

/** Python `str.title()` as a codegen'd unary expression
  * (semantics: graft.text.PyText.title — cleaner.py:34 parity). */
case class PyTitle(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"py_title requires STRING, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    PyFuncs.title(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PyFuncs.title($c)")
  override protected def withNewChildInternal(newChild: Expression): PyTitle =
    copy(child = newChild)
  override def prettyName: String = "py_title"
}

/** Python `round(x, 2)` (banker's, exact binary value) as a codegen'd
  * expression (extractor.py:114 parity; Spark's `round` is HALF_UP). */
case class PyRound2(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"py_round2 requires DOUBLE, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    PyFuncs.round2(input.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PyFuncs.round2($c)")
  override protected def withNewChildInternal(newChild: Expression): PyRound2 =
    copy(child = newChild)
  override def prettyName: String = "py_round2"
}

/** Column-API access without SQL registration (Spark 4: Column↔Expression
  * bridging goes through GraftColumnBridge). */
object functions {
  import org.apache.spark.sql.GraftColumnBridge._
  def py_title(c: Column): Column = column(PyTitle(expression(c)))
  def py_round2(c: Column): Column = column(PyRound2(expression(c)))
}

/** `SparkSessionExtensions` hook: spark.sql.extensions=graft.functions.GraftExtensions
  * registers the functions for SQL users. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.pyTitleDesc)
    ext.injectFunction(GraftExtensions.pyRound2Desc)
  }
}
object GraftExtensions {
  val pyTitleDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("py_title"),
      new ExpressionInfo(classOf[PyTitle].getName, "py_title"),
      (args: Seq[Expression]) => PyTitle(args.head))
  val pyRound2Desc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("py_round2"),
      new ExpressionInfo(classOf[PyRound2].getName, "py_round2"),
      (args: Seq[Expression]) => PyRound2(args.head))

  /** Register into an already-running session (tests / REPL). */
  def registerInto(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(pyTitleDesc._1, pyTitleDesc._2, pyTitleDesc._3)
    reg.registerFunction(pyRound2Desc._1, pyRound2Desc._2, pyRound2Desc._3)
  }
}
