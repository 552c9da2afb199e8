package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite `levenshtein(a, b) <= k` filter predicates
  * into
  * {{{ abs(length(a) - length(b)) <= k AND levenshtein(a, b, k) >= 0 }}}
  *
  * Two wins, both with identical semantics (incl. null behavior):
  *  - the length-difference lower bound rejects most candidate pairs
  *    with two int ops, before any edit-distance work;
  *  - the surviving pairs use Spark's *banded* Levenshtein (threshold
  *    variant, returns -1 when distance > k): O(k·n) instead of O(n²)
  *    per comparison.
  *
  * In the blocked similarity join (`etl_similarity_match`) this runs on
  * every candidate pair, which at 100 TB is the dominant cost of
  * stage-2 matching. Injected session-wide by [[GraftExtensions]].
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  // Idempotent by construction: the rewrite turns the threshold-less
  // Levenshtein(…, None) into Levenshtein(…, Some(k)), which no case
  // matches again. Applies wherever the predicate landed after pushdown
  // (Filter node, Join condition, …). Degenerate thresholds (k < 0, or
  // k <= 0 for the strict case) are left untouched: the original
  // predicate is constant-false and other rules may split/reorder the
  // rewritten conjuncts, which would let a negative-threshold
  // Levenshtein be evaluated without its length-diff guard.
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Levenshtein(a, b, None), k @ Literal(kv: Int, IntegerType)) if kv >= 0 =>
      And(
        LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k),
        GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0)))
    case LessThan(Levenshtein(a, b, None), k @ Literal(kv: Int, IntegerType)) if kv > 0 =>
      And(
        LessThan(Abs(Subtract(Length(a), Length(b))), k),
        GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(kv - 1))), Literal(0)))
  }
}
