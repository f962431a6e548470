package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule: rewrite unthresholded levenshtein
  * comparisons in boolean contexts into the banded (thresholded) form —
  * `levenshtein(a, b) <= k` becomes `levenshtein(a, b, k) >= 0`, which
  * Spark evaluates with an early-exit DP in O(k·n) instead of the full
  * O(n²) matrix. On a 100 TB near-dup rescoring pass over long
  * documents this is the difference between distance computation
  * bounded by the threshold and bounded by document length.
  *
  * Soundness: the thresholded expression returns the exact distance
  * when it is ≤ k and -1 otherwise, so `banded >= 0  ⟺  dist <= k`;
  * NULL inputs yield NULL in both forms, so three-valued logic under
  * NOT/AND/OR is preserved. Only Filter/Join conditions are touched —
  * a Project output must keep the true distance. Rewritten nodes carry
  * `threshold = Some(_)` and no longer match, so the rule is a
  * fixpoint after one pass.
  *
  * Install on a live session via
  * `spark.experimental.extraOptimizations`, or at build time through
  * [[graft.functions.expressions.GraftExtensions]].
  */
object ThresholdedLevenshtein extends Rule[LogicalPlan] {

  private def banded(lev: Levenshtein, k: Int): Expression =
    GreaterThanOrEqual(lev.copy(threshold = Some(Literal(k))), Literal(0))

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    // lev(a,b) <= k  /  k >= lev(a,b)
    case LessThanOrEqual(lev @ Levenshtein(_, _, None), Literal(k: Int, IntegerType)) if k >= 0 =>
      banded(lev, k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), lev @ Levenshtein(_, _, None)) if k >= 0 =>
      banded(lev, k)
    // lev(a,b) < k  /  k > lev(a,b)   (k >= 1, else statically false — leave it)
    case LessThan(lev @ Levenshtein(_, _, None), Literal(k: Int, IntegerType)) if k >= 1 =>
      banded(lev, k - 1)
    case GreaterThan(Literal(k: Int, IntegerType), lev @ Levenshtein(_, _, None)) if k >= 1 =>
      banded(lev, k - 1)
    // lev(a,b) = k: the banded form still returns the exact distance at k
    case EqualTo(lev @ Levenshtein(_, _, None), lit @ Literal(k: Int, IntegerType)) if k >= 0 =>
      EqualTo(lev.copy(threshold = Some(lit)), lit)
    case EqualTo(lit @ Literal(k: Int, IntegerType), lev @ Levenshtein(_, _, None)) if k >= 0 =>
      EqualTo(lev.copy(threshold = Some(lit)), lit)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) => f.copy(condition = rewrite(cond))
    case j: Join if j.condition.isDefined => j.copy(condition = j.condition.map(rewrite))
  }
}
