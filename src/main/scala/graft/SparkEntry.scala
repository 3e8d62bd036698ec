package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from the ops/ modules; each module owns one tier
  * of SURVEY.md §2's inventory. */
object SparkEntry {

  private lazy val registry: Seq[Q] =
    ops.Relational.all ++ ops.Decode.all ++ ops.Telescope.all ++
      ops.Daq.all ++ ops.TextOps.all ++ ops.Dedup.all ++ ops.Vector.all ++
      ops.Multimodal.all ++ ops.Extras.all ++ ops.Scale.all ++
      ops.More.all ++ ops.Analytics.all ++ ops.Curate.all ++
      ops.Pipeline.all ++ ops.Insights.all ++ ops.Corpus.all ++
      ops.Mart.all ++ ops.Series.all ++ ops.Learn.all ++ ops.Audit.all ++
      ops.Drift.all ++ ops.Biz.all ++ ops.Refine.all ++
      ops.GraphScores.all ++ ops.Doremi.all ++ ops.Inference.all ++
      ops.Causal.all ++ ops.Privacy.all ++ streaming.StreamOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The self-trigger analytic (SURVEY §7.2 step 1): per-event_type hit
    * statistics with a threshold cut inside a time window over `events`. */
  def entry(spark: SparkSession): DataFrame =
    Tables.t(spark, "/root/testdata/sf0.001", "events")
      .filter(
        col("ts") >= lit("2024-01-01").cast("timestamp_ntz") &&
        col("ts") < lit("2024-01-15").cast("timestamp_ntz") &&
        col("value") > 50.0)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_hits"),
        round(avg(col("value")), 6).as("avg_value"),
        round(max(col("value")), 2).as("max_value"))
      .orderBy(col("event_type"))

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
