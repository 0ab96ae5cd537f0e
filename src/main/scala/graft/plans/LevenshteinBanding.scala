package graft.plans

import graft.functions.BoundedLevenshtein
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: a thresholded edit-distance predicate
  *
  * {{{ levenshtein(a, b) <= k }}}   (and its <, flipped-side forms)
  *
  * computes the FULL O(|a|·|b|) distance only to compare it against
  * k. Rewrite to `bounded_levenshtein(a, b, k) >= 0`, the banded
  * O(|a|·k) DP with early exit ([[BoundedLevenshtein]]) — the same
  * boolean (−1 encodes "exceeds k", and NULL propagation matches the
  * builtin's). Only fires on an un-thresholded builtin with a
  * non-negative integer literal bound; `levenshtein` used as a
  * projected value is untouched.
  *
  * Injected via `graft.extensions.GraftExtensions`.
  */
object LevenshteinBanding extends Rule[LogicalPlan] {

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
  }

  private def banded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(BoundedLevenshtein(l, r, Literal(k)), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(l, r, None), IntLit(k)) if k >= 0 =>
        banded(l, r, k)
      case GreaterThanOrEqual(IntLit(k), Levenshtein(l, r, None)) if k >= 0 =>
        banded(l, r, k)
      case LessThan(Levenshtein(l, r, None), IntLit(k)) if k >= 1 =>
        banded(l, r, k - 1)
      case GreaterThan(IntLit(k), Levenshtein(l, r, None)) if k >= 1 =>
        banded(l, r, k - 1)
    }
}
