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
}
