package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: distinct winnowing (MOSS) fingerprints
  * of a text column — `winnow_fp(text, k, w) → array<string>` of the
  * per-window minimum k-gram hashes. Delegates to the static
  * [[graft.util.WinnowFp]] kernel — one O(n) primitive-int pass per
  * row (monotone-deque sliding minimum).
  *
  * Why not the declarative form: selecting window minima from every
  * character position is per-document work, but expressing it as
  * explode(one row per char) + min().over(Window.partitionBy(doc_id))
  * forces a hash(doc_id) exchange carrying ~30–40 bytes PER CHARACTER
  * of corpus text once the bench-scale fan-out pre-partition no-ops
  * at cluster scale — the one shape in the dedup family that let text
  * volume ride past the projection. As a unary expression the
  * fingerprinting is map-only and fused into the scan; only the
  * 8-byte fingerprints reach the pair join. Same pattern (and same
  * measured ~two-orders-of-magnitude reasoning) as [[GearCutsExpr]].
  */
case class WinnowFpExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fp"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        if (k >= 1 && w >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"winnow_fp needs k >= 1 and w >= 1, got ($k, $w)")
      case other => TypeCheckResult.TypeCheckFailure(
        s"winnow_fp needs string, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    graft.util.WinnowFp.fingerprints(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.util.WinnowFp.fingerprints($c, $k, $w);")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFpExpr = copy(child = newChild)
}
