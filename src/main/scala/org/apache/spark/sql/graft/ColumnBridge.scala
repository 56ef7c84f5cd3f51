package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the package-private Column <-> Expression conversions, for
  * wiring graft's native Catalyst expressions into the DataFrame API when
  * the expression carries non-column parameters (e.g. a baked-in plane
  * matrix) and therefore can't go through the function registry. Living
  * in `org.apache.spark.sql` is the standard technique extension
  * libraries use to reach `private[sql]` surface. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap an (already analyzed) logical plan as a DataFrame, REUSING the
    * given tree — so node tags set on it (e.g. the GateHoist passthrough
    * contract) survive into downstream plans built on the frame. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
