package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: gear content-defined cut positions of a
  * text column (companions: SimHashExpr, LongDotExpr, QuantizeExpr).
  * Delegates to the static [[graft.util.GearCdc]] kernel — one
  * primitive-long pass per row.
  *
  * Why not the declarative form: the cut predicate is a windowed sum
  * over the trailing 32 chars, and as nested higher-order functions
  * (filter ∘ aggregate) it evaluates interpreted at ~30 expression
  * allocations per (position, k) term — measured 173 s for the sf0.1
  * corpus where this expression does the identical arithmetic in
  * ~0.5 s. The generated code calls the static kernel directly, so
  * the surrounding projection stays inside whole-stage codegen, and
  * nullSafeEval gives null-text → null-cuts without an NPE. */
case class GearCutsExpr(child: Expression, maskBits: Int, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "gear_cuts"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        if (maskBits >= 1 && maskBits <= 31 && window >= 1 && window <= 32)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"gear_cuts needs maskBits in [1,31] and window in [1,32], " +
            s"got ($maskBits, $window)")
      case other => TypeCheckResult.TypeCheckFailure(
        s"gear_cuts needs string, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    graft.util.GearCdc.cutsArray(v.asInstanceOf[UTF8String], maskBits, window)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.util.GearCdc.cutsArray($c, $maskBits, $window);")

  override protected def withNewChildInternal(
      newChild: Expression): GearCutsExpr = copy(child = newChild)
}
