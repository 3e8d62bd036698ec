package org.apache.spark.sql.execution.graftexec

import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}

/** `private[execution]` bridge for the prepared-execution fast path
  * (see graftbridge.PreparedCount): exposes Spark's own NON-adaptive
  * preparation rule set — `QueryExecution.preparations(session, None,
  * false)`, i.e. PlanSubqueries + EnsureRequirements + codegen, the
  * exact rules Spark applies when AQE is off — and the one-shot rule
  * executor over a physical tree. Same OSS-extension technique as
  * graftbridge.Bridge: nothing is reimplemented, the shim only hosts
  * two calls inside the access scope Spark gave them. */
object PlainPreparations {

  def rules(session: SparkSession): Seq[Rule[SparkPlan]] =
    QueryExecution.preparations(session, None, false)

  def apply(session: SparkSession, plan: SparkPlan): SparkPlan =
    QueryExecution.prepareForExecution(rules(session), plan)
}
