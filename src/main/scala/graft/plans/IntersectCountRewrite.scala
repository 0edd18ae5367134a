package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Cast, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.dedup.{GramHashesExpr, IntersectCountSortedExpr}

/** Optimizer rule: `size(array_intersect(gram_hashes(a), gram_hashes(b)))`
  * → the codegen'd linear-merge count.
  *
  * `array_intersect` materializes the intersection array (hash-set build +
  * result allocation per row) only for `size` to throw it away; the
  * rewrite is valid because `gram_hashes` output is SORTED DISTINCT by
  * construction — the precondition the merge-count needs — and both forms
  * count the same distinct intersection. The rule fires only when both
  * inputs are literally `gram_hashes` calls (the provable case), so it can
  * never change semantics of arbitrary arrays.
  *
  * Wire-up: `spark.experimental.extraOptimizations` or
  * `GraftExtensions` (injectOptimizerRule) — both paths covered in
  * ExtensionsSpec.
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(l: GramHashesExpr, r: GramHashesExpr), _) =>
        // Size is int; the merge count is long — cast preserves the
        // original expression type for everything downstream
        Cast(IntersectCountSortedExpr(l, r), IntegerType)
    }
}
