package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bound levenshtein comparisons get the threshold
  * form automatically.
  *
  * `levenshtein(a, b) <= k` computes the FULL O(|a|·|b|) dynamic
  * program and then throws most of it away; Spark's threshold variant
  * `levenshtein(a, b, k)` abandons a row as soon as the running
  * distance exceeds k (returning -1), which is the difference between
  * scanning the whole DP table and a banded scan — a large constant
  * factor on wide joins like name-similarity clustering (q33). The
  * rewrite is exact:
  *
  *   lev(a,b) <= k   ===   0 <= lev(a,b,k) AND lev(a,b,k) <= k
  *   lev(a,b) <  k   ===   rewrite of <= (k-1), k >= 1
  *
  * (threshold form returns -1 precisely when the true distance
  * exceeds k, so the [0, k] band check reproduces the original
  * predicate; null semantics are unchanged since both forms are null
  * iff an input is null). Only literal non-negative int bounds are
  * rewritten — a column-valued bound would change the DP band per
  * row, which the expression supports but the win is the common
  * constant case.
  *
  * Installed by [[graft.GraftExtensions]] via injectOptimizerRule —
  * the SURVEY §2.8 `Rule[LogicalPlan]` extension point. */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  private def banded(a: Expression, b: Expression, k: Int): Expression = {
    val lev = Levenshtein(a, b, Some(Literal(k)))
    And(GreaterThanOrEqual(lev, Literal(0)), LessThanOrEqual(lev, Literal(k)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 0 =>
        banded(a, b, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 0 =>
        banded(a, b, k)
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 1 =>
        banded(a, b, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 1 =>
        banded(a, b, k - 1)
    }
}
