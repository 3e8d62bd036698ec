package graft
import org.apache.spark.sql.SparkSession

/** Dev-only phase probe: split one registered query's wall time into
  * build (DataFrame construction), analysis, optimization, physical
  * planning, and execution — the complement to JobProf's per-job view.
  * Usage: `sbt "Test/runMain graft.Scratch q_some_id"`. When execution time
  * dwarfs job time, sample the driver stack from a side thread (the
  * round-13 plan-string tax was found exactly that way). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000L).selectExpr("sum(id)").collect()
    ops.Insights.warmShared(spark, sfDir)
    val id = args.headOption.getOrElse("q_scan_parquet")
    (1 to 3).foreach { rep =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(id)(spark, sfDir)
      val t1 = System.nanoTime()
      val qe = df.queryExecution
      qe.assertAnalyzed()
      val t2 = System.nanoTime()
      qe.optimizedPlan
      val t3 = System.nanoTime()
      qe.executedPlan
      val t4 = System.nanoTime()
      val n = df.count()
      val t5 = System.nanoTime()
      def ms(a: Long, b: Long): String = f"${(b - a) / 1e6}%.0f"
      println(s"[scr] rep$rep $id rows=$n build=${ms(t0, t1)} " +
        s"analyze=${ms(t1, t2)} optimize=${ms(t2, t3)} " +
        s"plan=${ms(t3, t4)} exec(count incl its own plan)=${ms(t4, t5)} ms")
    }
    spark.stop()
  }
}
