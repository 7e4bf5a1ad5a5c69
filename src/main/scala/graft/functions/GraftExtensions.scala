package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, If,
  IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule (SURVEY.md §2 custom-operator tier (c)):
  * hamming_dist(x, x) is 0 for every non-null x, so fold it before the
  * per-row loop ever runs — null-safely (`null → null`, matching the
  * unfolded expression bit-for-bit) and only for deterministic x.
  * The shape to note for scale: an engine-specific algebraic identity
  * the generic optimizer can't know, installed as a first-class
  * `Rule[LogicalPlan]` instead of a wrapper API users must remember
  * to call. */
object SimplifyVectorIdentities extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case NativeExpressions.HammingDist(a, b)
        if a.deterministic && a.semanticEquals(b) =>
      if (a.nullable) If(IsNull(a), Literal(null, IntegerType), Literal(0))
      else Literal(0)
  }
}

/** SparkSessionExtensions wiring (SURVEY.md §2 custom-operator tier (c),
  * spark_guide registration pattern): installs the engine's native
  * functions into every session built with
  * `.withExtensions(new GraftExtensions)` — or via config
  * `spark.sql.extensions=graft.functions.GraftExtensions` — so SQL text
  * can call `cosine_sim` / `hamming_dist` without per-session
  * registration calls. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[NativeExpressions.CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => NativeExpressions.CosineSim(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("hamming_dist"),
      new ExpressionInfo(classOf[NativeExpressions.HammingDist].getName, "hamming_dist"),
      (exprs: Seq[Expression]) => NativeExpressions.HammingDist(exprs(0), exprs(1))))
    e.injectOptimizerRule(_ => SimplifyVectorIdentities)
    // tier (c) complete: the whole-operator CosineTopK plan node gets a
    // physical strategy in every extended session
    e.injectPlannerStrategy(_ => graft.plans.CosineTopKStrategy)
  }
}
