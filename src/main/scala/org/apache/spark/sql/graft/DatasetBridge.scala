package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bridge into Spark 4's `private[sql]` Dataset construction — needed to
  * hand a custom LogicalPlan (graft.plans.GroupTopKNode) back to the
  * session as a DataFrame. Companion of [[ColumnBridge]]. */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan

  /** Eager Column → catalyst Expression conversion (UnresolvedAttribute
    * etc. as plain analyzer-resolvable nodes). ColumnBridge.expression's
    * lazy ColumnNodeExpression wrapper is opaque to the analyzer when
    * embedded in a CUSTOM logical plan — its inner UnresolvedAttribute
    * never resolves; this converter unwraps to the real expression tree. */
  def resolvableExpression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
