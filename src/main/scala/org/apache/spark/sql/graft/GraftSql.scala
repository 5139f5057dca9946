package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into `private[sql]` plan construction: build a DataFrame from a
  * custom LogicalPlan (here, graft's TopKPerKeyNode) and a Column from a
  * resolved catalyst Expression (the LevJoinKernelRule's residual-filter
  * composition). Lives under `org.apache.spark.sql` for access, same as
  * other Spark-extension libraries do; no Spark internals are modified. */
object GraftSql {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
