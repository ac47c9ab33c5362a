package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Expression<->Column converters — the
  * standard seam for third-party Catalyst expressions on Spark 4 (the
  * classic converters moved behind private[sql] with the Connect split).
  * Only graft.functions uses this. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
