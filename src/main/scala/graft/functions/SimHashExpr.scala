package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: row-local 32-bit SimHash of a text
  * column (SURVEY.md §2.8; companions: LongDotExpr, QuantizeExpr).
  * Delegates the kernel to `graft.util.SimHash.of` — the pure mirror
  * of the batch aggregate form, pinned bit-for-bit by DedupSpec.
  *
  * Why not a Scala `udf`: the streaming near-dup join hashes every
  * arriving document row-locally; a ScalaUDF sits outside whole-stage
  * codegen and pays an encoder round-trip per row. This expression
  * participates in codegen (the generated code calls the static
  * kernel directly — the md5/vote loop itself is not worth inlining
  * as source text) and nullSafeEval/nullSafeCodeGen give the batch
  * operator's null semantics for free: null text → null hash, never
  * an NPE that would kill the streaming query. */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash32 needs string, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    graft.util.SimHash.of(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.util.SimHash.of($c.toString());")

  override protected def withNewChildInternal(
      newChild: Expression): SimHashExpr = copy(child = newChild)
}
