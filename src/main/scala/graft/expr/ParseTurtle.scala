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

/** `parse_turtle_safe(text)` — the LENIENT sibling of [[ParseTurtle]]:
  * instead of throwing, a malformed document yields exactly one row
  * `(null, null, null, err)` while well-formed documents yield their
  * triples with `err = null`. This matches the reference's diagnostic-sink
  * behaviour (`/root/reference/examples/simple.rs:27-37`: errors are
  * reported with their span, the process survives) — one bad page out of
  * 10^12 must not kill the job.
  */
case class ParseTurtleSafe(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("subj", StringType, nullable = true),
    StructField("pred", StringType, nullable = true),
    StructField("obj", StringType, nullable = true),
    StructField("err", StringType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_turtle_safe requires a string column, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else Turtle.parseToTriples(v.toString) match {
      case Right(ts) =>
        ts.iterator.map { t =>
          InternalRow(
            UTF8String.fromString(t.subj.render),
            UTF8String.fromString(t.pred),
            UTF8String.fromString(t.obj.render),
            null)
        }
      case Left(e) =>
        Iterator.single(InternalRow(null, null, null,
          UTF8String.fromString(s"${e.message} at ${e.span}")))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ParseTurtleSafe =
    copy(child = newChild)
}

/** Registration: per-session (temp function) or via
  * `spark.sql.extensions=graft.expr.GraftExtensions`.
  */
object TurtleFunctions {
  val Info = new ExpressionInfo(classOf[ParseTurtle].getName, "parse_turtle")
  val SafeInfo = new ExpressionInfo(classOf[ParseTurtleSafe].getName, "parse_turtle_safe")

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "parse_turtle", exprs => ParseTurtle(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "parse_turtle_safe", exprs => ParseTurtleSafe(exprs.head), "built-in")
  }

  /** SQL-surface 2 of 3 (SURVEY §2.6): a plain `functions.udf` returning
    * the triple array, for users who want `explode(parse_turtle_udf(col))`
    * without registering a Generator. The Generator forms above are
    * strictly better (no intermediate array materialization) — this
    * wrapper exists because it is the documented contract.
    */
  val parseTurtleUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (text: String) =>
      if (text == null) Array.empty[(String, String, String)]
      else Turtle.parseToTriples(text) match {
        case Right(ts) => ts.map(t => (t.subj.render, t.pred, t.obj.render)).toArray
        case Left(e)   => throw new IllegalArgumentException(s"parse_turtle: ${e.message} at ${e.span}")
      }
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("parse_turtle"),
      TurtleFunctions.Info,
      (exprs: Seq[Expression]) => ParseTurtle(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("parse_turtle_safe"),
      TurtleFunctions.SafeInfo,
      (exprs: Seq[Expression]) => ParseTurtleSafe(exprs.head)))
  }
}
