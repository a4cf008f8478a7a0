package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{L2Distance, L2SqDistance}

/** Optimizer rule: radius predicates on Euclidean distance drop the sqrt.
  *
  *   l2(a, b) < r   ⇒   l2sq(a, b) < r²     (r ≥ 0 literal)
  *
  * sqrt is monotone on [0, ∞), so the rewrite is exact up to one ulp of
  * `r * r`; it removes a sqrt per row from range-search scans — the same
  * trick the reference gets by comparing squared distances everywhere
  * (/root/reference/src/distance.cpp returns unrooted sums precisely so
  * its callers never pay for sqrt). Injected via
  * [[graft.GraftExtensions]]; fires only on literal, non-negative radii.
  */
object SqrtEliminationRule extends Rule[LogicalPlan] {

  private def sq(r: Double): Literal = Literal(r * r)

  private def rewrite(e: Expression): Expression = e.transformUp {
    case LessThan(L2Distance(a, b), Literal(r: Double, _)) if r >= 0 =>
      LessThan(L2SqDistance(a, b), sq(r))
    case LessThanOrEqual(L2Distance(a, b), Literal(r: Double, _)) if r >= 0 =>
      LessThanOrEqual(L2SqDistance(a, b), sq(r))
    case GreaterThan(Literal(r: Double, _), L2Distance(a, b)) if r >= 0 =>
      GreaterThan(sq(r), L2SqDistance(a, b))
    case GreaterThanOrEqual(Literal(r: Double, _), L2Distance(a, b)) if r >= 0 =>
      GreaterThanOrEqual(sq(r), L2SqDistance(a, b))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions { case e => rewrite(e) }
}
