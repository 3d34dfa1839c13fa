package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: exact integer dot product of two BIGINT
  * arrays (SURVEY.md §2.8 custom codegen expression; template:
  * CidrMatchExpr).
  *
  * Why not `aggregate(zip_with(...))`: Spark's array higher-order
  * functions evaluate their lambda interpreted — per element, per row
  * (the repo's measured ~10x pitfall, BASELINE.md). This expression
  * compiles to a tight primitive `long` loop inside whole-stage
  * codegen: no lambda dispatch, no boxing, no intermediate zipped
  * array allocation. The similarity operators call it once per
  * candidate pair, which makes it the inner loop of every ANN plan.
  *
  * Mismatched lengths use the shorter prefix (vectors here are
  * fixed-dimension, so this never triggers); null in → null out.
  */
case class LongDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_q"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var acc = 0L
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $acc += $a.getLong($i) * $b.getLong($i);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LongDotExpr =
    copy(left = newLeft, right = newRight)
}
