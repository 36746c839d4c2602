package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{CosineSimilarityExpr, SelfCosineExpr}

/** Optimizer rule: vec_cosine_native(x, x) => vec_self_cosine(x).
  *
  * A value-exact strength reduction (one accumulator instead of three;
  * see SelfCosineExpr for why folding to literal 1.0 would NOT be
  * exact). Fires only when both sides are semantically the same
  * deterministic expression. Registered through GraftExtensions'
  * injectOptimizerRule — the library's demonstration of the
  * Rule[LogicalPlan] extension surface.
  */
object RewriteSelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarityExpr(a, b) if a.deterministic && a.semanticEquals(b) =>
        SelfCosineExpr(a)
    }
}
