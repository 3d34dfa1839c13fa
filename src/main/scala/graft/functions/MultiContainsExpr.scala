package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.util.AhoCorasick

/** Native Catalyst expression: ordinals (ascending) of every term from
  * a FIXED list that occurs in the text — multi-pattern matching in
  * ONE Aho–Corasick pass (companions: SimHashExpr, GearCutsExpr,
  * UnicodeNormExpr). The alternative — a `contains`/`rlike` chain —
  * rescans the text once per term, so a thousand-term blocklist costs
  * a thousand scans per document; the automaton costs one, regardless
  * of list size.
  *
  * The automaton is built ONCE at plan construction from the term
  * list (plan-time constants; an empty term fails construction) and
  * rides into generated code as a reference object, so the per-row
  * work is the bare text walk. Matching is case-exact — compose with
  * `lower()` for the usual case-folded screen (keeps Spark↔DuckDB
  * lowering parity in the caller's hands). null text → null. */
case class MultiContainsExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  @transient private lazy val ac: AhoCorasick = AhoCorasick(terms)
  // fail fast on an invalid term list at construction, not first row —
  // the cheap precondition only (every Catalyst tree transform copies
  // this node; a full throwaway automaton build per copy would run the
  // trie+BFS construction dozens of times per query compile)
  require(terms.forall(t => t != null && t.nonEmpty),
    "banned terms must be non-empty")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "multi_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"multi_contains needs string, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    MultiContainsExpr.matched(ac, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ahoCorasick", ac,
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MultiContainsExpr.matched($acRef, $c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MultiContainsExpr = copy(child = newChild)
}

object MultiContainsExpr {
  /** Shared by eval and generated code: one automaton walk → the
    * matched ordinals as a primitive unsafe array. */
  def matched(ac: AhoCorasick, text: UTF8String): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(ac.distinctTerms(text.toString))
}
