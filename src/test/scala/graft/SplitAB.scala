package graft
import org.apache.spark.sql.SparkSession

/** Throwaway (r17): A/B spark.sql.files.openCostInBytes on the warm
  * mid-band — does splitting small parquet inputs to core-count tasks
  * un-serialize the compute-heavy scans? */
object SplitAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val openCost = sys.env.getOrElse("SPARK_GRAFT_OPENCOST", "4194304")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.openCostInBytes", openCost)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000L).selectExpr("sum(id)").collect()
    (1 to 3).foreach { rep =>
      args.foreach { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        println(f"[ab] oc=$openCost rep$rep $n ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
