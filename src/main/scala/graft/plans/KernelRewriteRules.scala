package graft.plans

import graft.functions.HashedSortedTokens
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule demonstrating the `Rule[LogicalPlan]` extension tier
  * (SURVEY §7.4 ladder, step (c) lite): queries written with the
  * COMPOSABLE form
  *
  * {{{
  *   sort_array(array_distinct(transform(
  *     filter(split(text, "\\s+"), t => length(t) > 0),
  *     t => xxhash64(t))))
  * }}}
  *
  * are rewritten to the single-pass [[HashedSortedTokens]] kernel, so
  * users of the plain functions API get the fused byte-level loop
  * (no interpreted per-token lambdas, no intermediate arrays) without
  * knowing the kernel exists. Semantics are identical by construction —
  * the kernel's equivalence to exactly this expression tree is pinned
  * in FunctionsSpec.
  *
  * Injected via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`), the deployment-config path
  * (`spark.sql.extensions`).
  */
object TokenHashKernelRule extends Rule[LogicalPlan] {

  /** filter(split(text, "\s+"), t => length(t) > 0) */
  private object WsTokens {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayFilter(
            StringSplit(text, Literal(re, _), Literal(-1, _)),
            LambdaFunction(
              GreaterThan(Length(lv1: NamedLambdaVariable), Literal(0, _)),
              Seq(lv2: NamedLambdaVariable), _))
          if re != null && re.toString == "\\s+" && lv1.exprId == lv2.exprId =>
        Some(text)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case SortArray(
            ArrayDistinct(ArrayTransform(
              WsTokens(text),
              LambdaFunction(
                XxHash64(Seq(hv1: NamedLambdaVariable), 42L),
                Seq(hv2: NamedLambdaVariable), _))),
            Literal(true, _)) if hv1.exprId == hv2.exprId =>
        HashedSortedTokens(text)
    }
}
