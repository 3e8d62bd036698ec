package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{QueryExecution, SQLExecution}

/** Prepared-statement execution for a re-run frame — the engine-side
  * analogue of DuckDB's prepared statements (parse+plan once, execute
  * many). Spark has no such reuse: every `Dataset.count()` builds a
  * fresh `QueryExecution` and re-runs the WHOLE Catalyst pipeline —
  * analysis, cache substitution, optimization (dozens of rule batches
  * to fixpoint), strategy planning — before any job is scheduled,
  * ~40-80 ms per mid-band query that DuckDB amortizes to ~1 ms.
  *
  * This pins the DETERMINISTIC front half once at prepare time — the
  * analyzed plan, the optimized plan, and the strategy-planned physical
  * tree, all pure driver-side rewrites with no data dependence — and
  * re-enters the pipeline at the preparation phase for every run:
  *
  *   run() = new QueryExecution with the pinned phases overridden,
  *           under a FRESH execution id
  *         → `sparkPlan` returns a DEEP CLONE of the pinned physical
  *           tree (fresh node instances: no memoized ShuffledRowRDD,
  *           no lazily-cached anything survives from a prior run)
  *         → fresh preparation rules and a fresh AQE wrapper with its
  *           OWN `AdaptiveExecutionContext` (empty stage cache)
  *         → fresh exchange nodes, so every shuffle re-materializes
  *           and every job re-runs.
  *
  * HONESTY BOUNDARY (the bench contract): jobs, shuffles and results
  * are produced per run — nothing data-bearing crosses runs. What is
  * reused is only the deterministic plan pipeline. The tempting
  * stronger cache — re-executing one `executedPlan` INSTANCE — is
  * exactly what this type refuses to do: `ShuffleExchangeExec` memoizes
  * its `ShuffledRowRDD` and AQE memoizes materialized `QueryStageExec`
  * results, so an instance re-run would serve pass 2 the pass-1 map
  * outputs and time only a result stage.
  *
  * Why a subclass override works: QueryExecution's phase accessors
  * (`analyzed`/`commandExecuted`/`optimizedPlan`/`sparkPlan`, …) are
  * non-final defs over private LazyTry fields, and the downstream
  * phases call the accessors virtually, so the pinned phases
  * short-circuit while `executedPlan` (preparations + AQE wrapper)
  * recomputes per instance over the per-run clone. PreparedCountSpec
  * pins both directions: identical counts vs the cold path, and
  * shuffle bytes written on EVERY run.
  *
  * Count-shaped on purpose: the bench's action is `count()`, whose
  * plan (`groupBy().count()`, same as Dataset.count) collapses to one
  * row, so executeCollect carries no result-size risk. */
final class PreparedCount private (
    session: org.apache.spark.sql.classic.SparkSession,
    pinnedAnalyzed: LogicalPlan,
    pinnedOptimized: LogicalPlan,
    pinnedSparkPlan: org.apache.spark.sql.execution.SparkPlan) {

  def run(): Long = {
    val qe = new QueryExecution(session, pinnedAnalyzed) {
      override def analyzed: LogicalPlan = pinnedAnalyzed
      // memoized frames are plain queries (their build launched zero
      // jobs), so command execution is the identity phase
      override def commandExecuted: LogicalPlan = pinnedAnalyzed
      override def optimizedPlan: LogicalPlan = pinnedOptimized
      // a fresh deep clone per call — node identity is what carries
      // memoized shuffle RDDs, so no pinned node may reach execution
      override def sparkPlan: org.apache.spark.sql.execution.SparkPlan =
        pinnedSparkPlan.clone()
    }
    SQLExecution.withNewExecutionId(qe) {
      qe.executedPlan.executeCollect().head.getLong(0)
    }
  }
}

object PreparedCount {

  /** Prepare `df.count()`: force analysis + optimization + strategy
    * planning of the count aggregate ONCE (pure Catalyst, zero jobs —
    * safe inside the bench warm phase) and capture the pinned plans.
    * The physical tree is captured UNPREPARED (before EnsureRequirements
    * / AQE insertion), exactly where Spark's own pipeline re-enters. */
  def apply(df: org.apache.spark.sql.Dataset[_]): PreparedCount = {
    val counted = df.groupBy().count()
    val qe0 = counted.queryExecution
    new PreparedCount(
      qe0.sparkSession, qe0.analyzed, qe0.optimizedPlan, qe0.sparkPlan)
  }

  /** Dev-profiler hook (ExecProf): one prepared run split into
    * (plan-prep, execution-id bookkeeping, job wall) seconds. Lives
    * here because the split needs the QE internals; not used by the
    * bench, which charges the three parts as one number. */
  def profile(df: org.apache.spark.sql.Dataset[_])
      : () => (Double, Double, Double) = {
    val counted = df.groupBy().count()
    val qe0 = counted.queryExecution
    val session = qe0.sparkSession
    val pinnedAnalyzed = qe0.analyzed
    val pinnedOptimized = qe0.optimizedPlan
    val pinnedSpark = qe0.sparkPlan
    () => {
      val t0 = System.nanoTime()
      val qe = new QueryExecution(session, pinnedAnalyzed) {
        override def analyzed: LogicalPlan = pinnedAnalyzed
        override def commandExecuted: LogicalPlan = pinnedAnalyzed
        override def optimizedPlan: LogicalPlan = pinnedOptimized
        override def sparkPlan: org.apache.spark.sql.execution.SparkPlan =
          pinnedSpark.clone()
      }
      val plan = qe.executedPlan
      val t1 = System.nanoTime()
      var tInner = 0L
      SQLExecution.withNewExecutionId(qe) {
        val s = System.nanoTime()
        plan.executeCollect()
        tInner = System.nanoTime() - s
      }
      val t2 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1 - tInner) / 1e9, tInner / 1e9)
    }
  }
}
