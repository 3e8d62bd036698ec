package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge — the standard OSS-extension technique
  * for building a DataFrame from a custom LogicalPlan node (Spark keeps
  * `Dataset.ofRows` package-private; every connector/extension library
  * that adds plan nodes hosts a shim like this under the sql package).
  * Nothing else from the internals is touched. */
object Bridge {

  /** Wrap a (resolved) logical plan as a DataFrame on the session. */
  def ofRows(s: org.apache.spark.sql.SparkSession, plan: LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (resolved attributes). */
  def analyzed(df: org.apache.spark.sql.Dataset[_]): LogicalPlan =
    df.queryExecution.analyzed
}
