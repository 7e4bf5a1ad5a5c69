package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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
  }
}
