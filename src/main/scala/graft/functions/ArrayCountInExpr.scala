package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: how many elements of a string array are
  * members of a FIXED term set (companions: MultiContainsExpr,
  * LongDotExpr). The alternative — `size(filter(arr, t =>
  * array_contains(lit(terms), t)))` — runs ArrayFilter, a
  * CodegenFallback higher-order function that dispatches an
  * interpreted lambda (itself scanning the term list linearly) per
  * element per row; this expression is one hashed-set probe per
  * element inside whole-stage codegen. Duplicates count every
  * occurrence (multiset semantics, unlike array_intersect). Null
  * elements are not counted (array_contains yields null there, which
  * the old filter dropped); null array → null. */
case class ArrayCountInExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(4, terms.size * 2))
    terms.foreach(t => if (t != null) s.add(UTF8String.fromString(t)))
    s
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_count_in"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"array_count_in needs array<string>, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    ArrayCountInExpr.countIn(set, v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("termSet", set,
      classOf[java.util.HashSet[_]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ArrayCountInExpr.countIn($setRef, $c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ArrayCountInExpr = copy(child = newChild)
}

object ArrayCountInExpr {
  /** Shared by eval and generated code: one pass, one set probe per
    * non-null element. */
  def countIn(set: java.util.HashSet[UTF8String], arr: ArrayData): Int = {
    val n = arr.numElements()
    var i = 0
    var c = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}
