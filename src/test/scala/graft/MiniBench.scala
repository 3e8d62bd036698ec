package graft
import org.apache.spark.sql.SparkSession
object MiniBench extends App {
  val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", 32)
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  spark.range(2000000L).selectExpr("sum(id)").collect()
  val names = args.toSeq
  (1 to 2).foreach { rep =>
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[mini] rep$rep $n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
  }
  spark.stop()
}
