package graft
import org.apache.spark.sql.SparkSession

/** Throwaway probe: phase breakdown for one query. */
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
    val id = args.headOption.getOrElse("q_graph_triangles")
    (1 to 3).foreach { rep =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries.getOrElse(id,
        (s: SparkSession, d: String) => s.range(1).toDF())(spark, sfDir)
      val t1 = System.nanoTime()
      val qe = df.queryExecution
      qe.assertAnalyzed()
      val t2 = System.nanoTime()
      val opt = qe.optimizedPlan
      val t3 = System.nanoTime()
      val ep = qe.executedPlan
      val t4 = System.nanoTime()
      val n = df.count()
      val t5 = System.nanoTime()
      def ms(a: Long, b: Long): String = f"${(b - a) / 1e6}%.0f"
      println(s"[scr] rep$rep $id rows=$n build=${ms(t0, t1)} " +
        s"analyze=${ms(t1, t2)} optimize=${ms(t2, t3)} " +
        s"plan=${ms(t3, t4)} exec(count with its own re-plan)=${ms(t4, t5)} ms " +
        s"optNodes=${opt.collect { case p => p }.size}")
      if (rep == 3 && id == "q_text_probe") {
        import org.apache.spark.sql.functions._
        val docs = Tables.t(spark, sfDir, "documents")
        def tm(nm: String)(f: => Any): Unit = {
          val a = System.nanoTime(); f
          println(f"[scr]   $nm ${(System.nanoTime() - a) / 1e6}%.0f ms")
        }
        tm("scan text cols")(docs.select(col("doc_id"), col("text")).agg(count(lit(1))).collect())
        tm("split+size")(docs.select(size(split(col("text"), " ")).as("n")).agg(sum(col("n"))).collect())
        tm("split+size 2")(docs.select(size(split(col("text"), " ")).as("n")).agg(sum(col("n"))).collect())
        tm("explode+count")(docs.select(explode(split(col("text"), " ")).as("w")).groupBy(col("w")).agg(count(lit(1))).agg(count(lit(1))).collect())
        tm("explode+count 2")(docs.select(explode(split(col("text"), " ")).as("w")).groupBy(col("w")).agg(count(lit(1))).agg(count(lit(1))).collect())
        val toks = docs.select(col("doc_id"), split(col("text"), " ").as("toks")).persist()
        tm("cache toks")(toks.count())
        tm("cached explode+count")(toks.select(explode(col("toks")).as("w")).groupBy(col("w")).agg(count(lit(1))).agg(count(lit(1))).collect())
        tm("cached explode+count 2")(toks.select(explode(col("toks")).as("w")).groupBy(col("w")).agg(count(lit(1))).agg(count(lit(1))).collect())
      }
    }
    spark.stop()
  }
}
