package graft
import org.apache.spark.sql.SparkSession

/** Throwaway (r17): dump `explain("formatted")` for named query ids to
  * files — the before/after plan evidence the optimization round
  * commits under plans/r17/. Usage:
  *   SPARK_GRAFT_PLAN_SUFFIX=before Test/runMain graft.PlanText q_x q_y
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_PLAN_DIR
  * (default plans/r17), SPARK_GRAFT_PLAN_SUFFIX (default "plan"). */
object PlanText {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r17")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "plan")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    args.foreach { id =>
      try {
        val df = SparkEntry.queries(id)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$dir/${id}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plantext] wrote $dir/${id}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[plantext] $id FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
