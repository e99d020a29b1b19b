package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Injected optimizer rule: bound edit-distance comparisons run banded.
  *
  * Users naturally write `levenshtein(a, b) <= k`; Spark then computes
  * the FULL O(|a|·|b|) dynamic program per row even though only the
  * k-band around the diagonal can matter. Spark's own `Levenshtein`
  * carries an optional threshold arg (O(k·min(|a|,|b|)) with early exit)
  * — this rule rewrites the comparison into that form:
  *
  *   levenshtein(a, b) <= k   →   levenshtein(a, b, k) >= 0
  *   levenshtein(a, b) <  k   →   levenshtein(a, b, k-1) >= 0
  *
  * (banded levenshtein returns -1 iff the true distance exceeds the
  * threshold, so `>= 0` is exactly the original predicate). On fuzzy
  * joins over 100-char strings with k=2 this is a ~50× kernel saving on
  * every candidate pair. Fires only on non-negative integer literals;
  * both comparison orientations are handled.
  */
object RewriteBandedLevenshtein extends Rule[LogicalPlan] {

  private def banded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
          if k >= 0 =>
        banded(l, r, k)
      case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
          if k >= 1 =>
        banded(l, r, k - 1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
          if k >= 0 =>
        banded(l, r, k)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
          if k >= 1 =>
        banded(l, r, k - 1)
    }
}
