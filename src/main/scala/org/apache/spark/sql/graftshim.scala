package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access shim: `Column ⇄ Expression` converters are `private[sql]` in
  * Spark 4 (classic.ExpressionUtils), so custom Catalyst expressions
  * (graft.functions.VectorExpressions) need this one-file bridge in the
  * sql package — the same pattern public Spark extension libraries use.
  * Nothing else may live here. */
object graftshim {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a logical plan (classic.Dataset.ofRows is
    * private[sql]) — needed to hand custom LogicalPlan nodes to the
    * session (graft.plans.AsOfJoinPlan). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
