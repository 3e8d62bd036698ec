package graft
import org.apache.spark.sql.SparkSession

/** Throwaway: per-id physical-plan census over a list of query ids —
  * parquet scans, Generate(explode) nodes, exchanges, reused
  * exchanges, windows — to spot structural waste (a branch recomputing
  * a corpus pass that pruning kept from ReusedExchange, a join that
  * could be a window) across the mid-band in one sweep. */
object PlanStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { id =>
      try {
        val df = SparkEntry.queries(id)(spark, sfDir)
        // run and inspect the SAME QueryExecution so AQE's final plan
        // (with materialized stage reuse) is what gets censused
        val counted = df.groupBy().count()
        counted.collect()
        // AQE's toString appends the initial plan below the final one —
        // census only the final (executed) section
        val p = counted.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        def c(pat: String) = pat.r.findAllIn(p).length
        // AQE reuse = a stage id appearing under more than one parent
        val stages = "(ShuffleQueryStage|BroadcastQueryStage) (\\d+)".r
          .findAllMatchIn(p).map(_.group(2)).toSeq
        val reused = stages.size - stages.distinct.size
        println(f"[plan] $id%-28s scans=${c("Scan parquet")}%2d " +
          f"gen=${c("Generate ")}%2d exch=${c("Exchange ")}%2d " +
          f"stages=${stages.distinct.size}%2d reused=$reused%2d " +
          f"win=${c("Window")}%2d " +
          f"smj=${c("SortMergeJoin")}%2d bhj=${c("BroadcastHashJoin")}%2d")
      } catch { case e: Throwable =>
        println(s"[plan] $id ERR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
