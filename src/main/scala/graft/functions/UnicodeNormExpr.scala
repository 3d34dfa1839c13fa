package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization (UAX #15) of a
  * text column (companions: SimHashExpr, GearCutsExpr). Spark has no
  * built-in for this; without it, canonically-equivalent duplicates —
  * composed U+00E9 vs decomposed e+U+0301, the classic cross-scraper
  * artifact — survive byte-exact dedup even though every Unicode-aware
  * renderer shows the same text. NFKC additionally folds compatibility
  * variants (ligatures, full-width ASCII, circled digits), the
  * aggressive form for near-dup shingling.
  *
  * The form is a plan-time constant (parsed once via
  * `UnicodeNorm.formOf` — an invalid name fails at construction), so
  * the generated code references a cached enum constant and calls the
  * static kernel; the expression participates in whole-stage codegen
  * and fuses into the scan like the other kernels. null text → null. */
case class UnicodeNormExpr(child: Expression, formName: String)
    extends UnaryExpression {

  @transient private lazy val form: Normalizer.Form =
    graft.util.UnicodeNorm.formOf(formName)
  // fail fast on a bad form at construction, not first evaluation
  graft.util.UnicodeNorm.formOf(formName)

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_norm"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unicode_norm needs string, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(graft.util.UnicodeNorm.normalize(
      v.asInstanceOf[UTF8String].toString, form))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // getCanonicalName: the nested enum's Java-source type name is
    // java.text.Normalizer.Form (getName's $-form won't compile)
    val formRef = ctx.addReferenceObj("unicodeNormForm", form,
      classOf[Normalizer.Form].getCanonicalName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.util.UnicodeNorm.normalize($c.toString(), $formRef));
         |""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormExpr = copy(child = newChild)
}
