package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ⇄ Expression converters, so graft's
  * native Catalyst expressions (e.g.
  * [[graft.functions.SortedLongIntersectCount]]) can be used as `Column`s
  * from the public DataFrame API. Lives in the `org.apache.spark.sql`
  * package solely to satisfy the access qualifier — the standard extension
  * seam for libraries shipping custom expressions.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
