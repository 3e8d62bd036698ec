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

  /** Block until the async listener bus has delivered every queued
    * event to every queue; returns whether the drain COMPLETED.
    * `LiveListenerBus.waitUntilEmpty` is `private[spark]`, so the
    * deterministic drain lives here — the bench's build-classification
    * honesty guard must not depend on a fixed sleep outlasting an
    * arbitrary bus backlog. A generous explicit timeout (60 s, vs
    * Spark's internal ~10 s no-arg default) bounds a genuinely wedged
    * bus, and the `false` return lets the caller DEGRADE (treat every
    * build as dirty → rebuild per pass, still-honest timings) instead
    * of aborting the whole run on a TimeoutException. */
  def flushListenerBus(s: org.apache.spark.sql.SparkSession): Boolean =
    try { s.sparkContext.listenerBus.waitUntilEmpty(60000L); true }
    catch { case _: java.util.concurrent.TimeoutException => false }

  /** Post an event onto the async listener bus (test plumbing: lets a
    * spec manufacture a multi-second bus backlog and prove the flush
    * above is what keeps build classification deterministic). */
  def postListenerEvent(
      s: org.apache.spark.sql.SparkSession,
      e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
    s.sparkContext.listenerBus.post(e)
}
