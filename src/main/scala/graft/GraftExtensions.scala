package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions registration for the engine's native codegen
  * expressions, giving `spark.sql(...)` users the same surface as the
  * DataFrame API (SURVEY §2.8 — the extension point the reference
  * exposes as its SerializableFunction/CombineFn registry):
  *
  *   - `dot_q(a, b)` — exact BIGINT-array dot product (LongDotExpr),
  *     the ANN/similarity inner loop
  *   - `quantize_vec(v[, scale])` — float vector -> exact integer
  *     vector, floor(x*scale + 0.5) (QuantizeExpr); scale defaults to
  *     the engine-wide `Similarity.Scale`
  *   - `simhash32(text)` — row-local 32-bit SimHash (SimHashExpr),
  *     the streaming near-dup kernel
  *   - `unicode_norm(text[, form])` — UAX #15 normalization
  *     (UnicodeNormExpr), form a string literal NFC/NFD/NFKC/NFKD
  *     (default NFC); the unicode-equivalence dedup key
  *   - `multi_contains(text, array('t1', …))` — matched blocklist
  *     ordinals in one Aho–Corasick pass (MultiContainsExpr); the
  *     term array must fold to plan-time constants (the automaton is
  *     built once at plan construction)
  *
  * Install at session build (works with spark-submit / Connect too):
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  * `CidrMatchExpr` is deliberately NOT registered: it closes over a
  * broadcast radix trie, which has no SQL-literal form — SQL callers
  * use the `Functions.cidrContains` Column API instead. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import graft.functions.{LongDotExpr, MultiContainsExpr, QuantizeExpr, SimHashExpr, UnicodeNormExpr}

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Rule[LogicalPlan]: bound levenshtein comparisons -> banded
    // threshold form (see LevenshteinThresholdRule scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinThresholdRule)
    ext.injectFunction((FunctionIdentifier("dot_q"),
      new ExpressionInfo(classOf[LongDotExpr].getName, "dot_q"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => LongDotExpr(a, b)
        case _ => throw new IllegalArgumentException("dot_q(a, b)")
      }))
    ext.injectFunction((FunctionIdentifier("quantize_vec"),
      new ExpressionInfo(classOf[QuantizeExpr].getName, "quantize_vec"),
      (args: Seq[Expression]) => args match {
        case Seq(v) => QuantizeExpr(v, graft.operators.Similarity.Scale)
        case Seq(v, Literal(s: Int, IntegerType)) => QuantizeExpr(v, s)
        case _ => throw new IllegalArgumentException(
          "quantize_vec(vector[, integer-literal scale])")
      }))
    ext.injectFunction((FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "simhash32"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => SimHashExpr(t)
        case _ => throw new IllegalArgumentException("simhash32(text)")
      }))
    ext.injectFunction((FunctionIdentifier("multi_contains"),
      new ExpressionInfo(classOf[MultiContainsExpr].getName,
        "multi_contains"),
      (args: Seq[Expression]) => args match {
        case Seq(t, arr) if arr.foldable && (arr.dataType match {
            case org.apache.spark.sql.types.ArrayType(
              _: org.apache.spark.sql.types.StringType, _) => true
            case _ => false
          }) =>
          val folded = arr.eval()
          if (folded == null) throw new IllegalArgumentException(
            "multi_contains: the term array must not be null")
          val terms = folded
            .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toObjectArray(org.apache.spark.sql.types.StringType)
            .map(v => if (v == null) null else v.toString).toSeq
          MultiContainsExpr(t, terms)
        case _ => throw new IllegalArgumentException(
          "multi_contains(text, array('term', ...)) — the term array " +
            "must be a plan-time constant ARRAY<STRING>")
      }))
    ext.injectFunction((FunctionIdentifier("unicode_norm"),
      new ExpressionInfo(classOf[UnicodeNormExpr].getName, "unicode_norm"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => UnicodeNormExpr(t, "NFC")
        case Seq(t, Literal(f: org.apache.spark.unsafe.types.UTF8String, _)) =>
          UnicodeNormExpr(t, f.toString)
        case _ => throw new IllegalArgumentException(
          "unicode_norm(text[, 'NFC'|'NFD'|'NFKC'|'NFKD'])")
      }))
  }
}
