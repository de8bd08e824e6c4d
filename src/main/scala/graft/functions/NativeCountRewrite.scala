package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY §7 Phase 3): rewrites the interpreted
  * higher-order pattern
  *
  * {{{ size(filter(arr, x -> x = 'term')) }}}
  *
  * (and the flipped `'term' = x` form) into the whole-stage-codegen
  * [[ArrayCountEq]] expression. Users writing idiomatic SQL/Column
  * code get the native counting loop without knowing it exists —
  * the HOF form allocates a filtered array per row and evaluates the
  * lambda interpreted; the rewrite is a straight counting loop.
  *
  * Only applies under modern size-of-null semantics (size(null) =
  * null), which matches [[ArrayCountEq]]'s null behavior.
  *
  * Injected by [[graft.GraftExtensions]] via injectOptimizerRule.
  */
object NativeCountRewrite extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: Seq[NamedExpression]): Boolean = e match {
    case n: NamedLambdaVariable => v.exists(_.exprId == n.exprId)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case s @ Size(ArrayFilter(arr, LambdaFunction(cond, args, _)), false) =>
      cond match {
        case EqualTo(x, l: Literal) if isVar(x, args) => ArrayCountEq(arr, l)
        case EqualTo(l: Literal, x) if isVar(x, args) => ArrayCountEq(arr, l)
        case _ => s
      }
  }
}
