package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ⇄ Expression converters
  * (Spark 4 moved classic Column internals behind the Connect API
  * split). Lives in the org.apache.spark.sql package solely to reach
  * `classic.ExpressionUtils`; contains no logic.
  */
package object graftbridge {
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)

  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(classic.ClassicConversions.castToImpl(spark), plan)

  def analyzedPlan(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    classic.ClassicConversions.castToImpl(df).queryExecution.analyzed
}
