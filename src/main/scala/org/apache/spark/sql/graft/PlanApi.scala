package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The `private[sql]` doorways the library needs: turn a custom
  * [[LogicalPlan]] node into a DataFrame on the session, and a public
  * [[Column]] back into its catalyst [[Expression]] (Spark 4 columns
  * wrap ColumnNodes, not expressions). Lives in the
  * `org.apache.spark.sql` namespace solely for that access; contains no
  * logic of its own.
  */
object PlanApi {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
