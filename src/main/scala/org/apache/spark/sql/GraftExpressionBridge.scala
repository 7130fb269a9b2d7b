package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

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

  /** Materialize an analyzed logical sub-plan as a DataFrame — the
    * WindowAuditSpec seam: it executes a Window node's child ALONE to
    * count the rows feeding an unpartitioned window. `Dataset.ofRows`
    * carries the same access qualifier as the converters above.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
