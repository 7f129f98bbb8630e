package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to `private[sql]` Column↔Expression conversions. Spark 4
  * made the public `Column` a thin wrapper over `ColumnNode`; building a
  * Column from a raw Catalyst `Expression` (the supported path for custom
  * native expressions, cf. `org.apache.spark.sql.functions` internals) goes
  * through `classic.ExpressionUtils`, which is package-private. This is the
  * only place the project reaches into Spark's private API surface.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a raw logical plan (`Dataset.ofRows` is private[sql]). */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
