package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: quantize a FLOAT array to exact BIGINT
  * — floor(x * scale + 0.5) per element (SURVEY.md §2.8; companion to
  * LongDotExpr).
  *
  * Why not `transform(v, e => floor(e*s + 0.5).cast(long))`: array
  * lambdas run interpreted per element per row, and quantization runs
  * once over EVERY corpus vector before any similarity math — at 10^9
  * embeddings the lambda dispatch is a real scan cost. This compiles
  * to a primitive loop in whole-stage codegen.
  *
  * Arithmetic parity: Spark's analyzer rewrites `e * 10000 + 0.5` to
  * `cast(e as double) * cast(10000 as double) + 0.5` — BOTH operands
  * promote to double (not a float multiply). This expression does the
  * same double math, so quantized values are bit-identical to the HOF
  * path and to the DuckDB oracle (pinned by spec). Null in → null out.
  */
case class QuantizeExpr(child: Expression, scale: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantize_q"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_q needs array<float>, got $other")
    }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(arr.getFloat(i).toDouble * scale + 0.5).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val gad = classOf[GenericArrayData].getName
      s"""
        final int $n = $a.numElements();
        final long[] $out = new long[$n];
        for (int $i = 0; $i < $n; $i++) {
          $out[$i] = (long) java.lang.Math.floor(
            ((double) $a.getFloat($i)) * ((double) $scale) + 0.5);
        }
        ${ev.value} = new $gad($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeExpr =
    copy(child = newChild)
}
