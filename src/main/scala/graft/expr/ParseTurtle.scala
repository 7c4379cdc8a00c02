package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

import graft.turtle.Turtle

/** `parse_turtle(text)` — a native Catalyst GENERATOR (like `explode`):
  * one input document → N rows `(subj, pred, obj)` in N-Triples term
  * syntax, without materializing an intermediate array (the preferred
  * custom-operator form per SURVEY.md §2.6/§7.3; the reference's
  * `Document::parse_str` + `build_triples` lifecycle behind a SQL surface).
  *
  * CodegenFallback: the parser is a per-row black box; whole-stage codegen
  * still fuses everything around the generate node.
  */
case class ParseTurtle(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("subj", StringType, nullable = false),
    StructField("pred", StringType, nullable = false),
    StructField("obj", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_turtle requires a string column, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else Turtle.parseToTriples(v.toString) match {
      case Right(ts) =>
        ts.iterator.map { t =>
          InternalRow(
            UTF8String.fromString(t.subj.render),
            UTF8String.fromString(t.pred),
            UTF8String.fromString(t.obj.render))
        }
      case Left(e) =>
        throw new IllegalArgumentException(s"parse_turtle: ${e.message} at ${e.span}")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ParseTurtle =
    copy(child = newChild)
}

/** Registration: per-session (temp function) or via
  * `spark.sql.extensions=graft.expr.GraftExtensions`.
  */
object TurtleFunctions {
  val Info = new ExpressionInfo(classOf[ParseTurtle].getName, "parse_turtle")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "parse_turtle", exprs => ParseTurtle(exprs.head), "built-in")
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("parse_turtle"),
      TurtleFunctions.Info,
      (exprs: Seq[Expression]) => ParseTurtle(exprs.head)))
  }
}
