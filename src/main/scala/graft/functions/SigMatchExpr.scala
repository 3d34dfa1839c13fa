package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native Catalyst expression: positional agreement count of two
  * string arrays — how many indices hold equal non-null values
  * (companions: LongDotExpr, ArrayCountInExpr). The inner loop of
  * every minhash verification: one tight two-pointer walk in
  * whole-stage codegen.
  *
  * Semantics replicate the original
  * `size(filter(zip_with(a, b, _ === _), x => x))` exactly: positions
  * past the shorter array compare as null (zip_with pads) and a null
  * element never equals anything, so both count nothing; null array
  * in → null out (size(null) was null under the non-legacy default).
  * The unrolled element_at/CASE chain tried first generated a method
  * past the JIT huge-method limit and ran as interpreted bytecode —
  * measurably SLOWER than the lambda it replaced (q17 1.2 → 2.0 s);
  * this loop keeps the generated method tiny. */
case class SigMatchExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sig_match"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(_: StringType, _), ArrayType(_: StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sig_match needs two array<string>, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigMatchExpr.matchCount(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SigMatchExpr.matchCount($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SigMatchExpr =
    copy(left = newLeft, right = newRight)
}

object SigMatchExpr {
  /** Shared by eval and generated code: positions where both sides
    * are non-null and equal. */
  def matchCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var c = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) &&
          a.getUTF8String(i).equals(b.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}
