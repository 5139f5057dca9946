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

  /** Inverse of [[column]] — the catalyst expression behind a Column
    * (Spark 4 moved `Column.expr` behind the classic facade). Lets graft
    * build native-expression Columns without the function registry, so
    * library kernels work on sessions that never installed
    * GraftExtensions. */
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Canonicalize -0.0/NaN inside a grouping expression (float/double,
    * including nested struct/array fields) — the normalization Spark's
    * own NormalizeFloatingNumbers rule applies to Window partition keys.
    * Graft's TopKPerKeyNode replaces the Window BEFORE that rule's batch
    * runs on the injectOptimizerRule path, and the rule does not
    * recognize the custom node, so the node's planner strategy applies
    * the same normalization itself (r13) — otherwise SQL-equal float
    * keys (struct<-0.0> vs struct<0.0>) would byte-compare as different
    * groups. No-op for types that need no normalization. */
  def normalizeFloats(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers
      .normalize(e)
}
