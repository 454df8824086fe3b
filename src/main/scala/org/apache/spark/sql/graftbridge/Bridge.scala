package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal `private[sql]` bridge for the extension surface (the standard
  * idiom for Spark extension libraries: a tiny object inside an
  * `org.apache.spark.sql` subpackage that re-exposes `Dataset.ofRows`, so
  * custom logical operators defined outside Spark can be wrapped into
  * DataFrames and lowered by injected rules).
  */
object Bridge {
  /** Wrap an analyzed [[LogicalPlan]] as a DataFrame on this session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def planOf(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Wrap a catalyst Expression as a Column (no session, no function
    * registry — the seam custom codegen'd kernels need when they are
    * built inside Column-composition helpers).
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    classic.ExpressionUtils.column(e)

  /** The (possibly unresolved) expression behind a Column. */
  def expressionOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
