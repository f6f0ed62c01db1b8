package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` constructors needed to surface a
  * custom LogicalPlan as a user-facing DataFrame (the standard pattern
  * for out-of-tree Catalyst operators — same technique used by public
  * Spark extension libraries). Nothing else from the private API is
  * touched. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Spark 4 removed `Column.expr`; the classic converter is the
    * supported path from the public Column to a Catalyst Expression. */
  def expr(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
