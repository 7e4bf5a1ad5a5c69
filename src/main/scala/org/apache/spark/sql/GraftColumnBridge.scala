package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters (Spark 4
  * moved Column onto ColumnNode; `classic.ExpressionUtils` is the
  * sanctioned internal shim). Standard extension-library technique for
  * exposing custom Catalyst expressions as user-facing Columns. */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame over a custom LogicalPlan (`Dataset.ofRows` is
    * `private[sql]`) — how an extension library exposes a whole-operator
    * plan node (e.g. `graft.plans.CosineTopK`) as a normal DataFrame. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
