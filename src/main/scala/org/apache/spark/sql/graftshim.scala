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
}
