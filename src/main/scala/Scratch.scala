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
      val df = SparkEntry.queries(id)(spark, sfDir)
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
      if (rep == 3 && id == "q_graph_triangles") {
        import org.apache.spark.sql.functions._
        val und = ops.Insights.undirectedLinkEdges(spark, sfDir)
        val deg = ops.Insights.linkDegrees(spark, sfDir)
        val tri = ops.Insights.closedTriangles(spark, sfDir)
        def tm(nm: String)(f: => Unit): Unit = {
          val a = System.nanoTime(); f
          println(f"[scr]   $nm ${(System.nanoTime() - a) / 1e6}%.0f ms")
        }
        tm("und.count")(und.agg(count(lit(1))).collect())
        tm("deg.sum")(deg.agg(sum(expr("deg * (deg - 1) div 2"))).collect())
        tm("tri.count")(tri.agg(count(lit(1))).collect())
        tm("und.count2")(und.agg(count(lit(1))).collect())
        tm("tri.count2")(tri.agg(count(lit(1))).collect())
        println("[scr]   tri rows=" + tri.count() +
          " parts=" + tri.rdd.getNumPartitions)
        val cq = tri.agg(count(lit(1)))
        val a0 = System.nanoTime()
        cq.queryExecution.assertAnalyzed()
        val a1 = System.nanoTime()
        cq.queryExecution.optimizedPlan
        val a2 = System.nanoTime()
        cq.queryExecution.executedPlan
        val a3 = System.nanoTime()
        cq.collect()
        val a4 = System.nanoTime()
        cq.collect()
        val a5 = System.nanoTime()
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val cq2 = tri.agg(count(lit(1)))
        cq2.collect()
        val a6 = System.nanoTime()
        cq2.collect()
        val a7 = System.nanoTime()
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        println(f"[scr]   noAQE exec1=${(a6-a5)/1e6}%.0f exec2=${(a7-a6)/1e6}%.0f ms")
        // job/task timeline for one more AQE-on count
        val tl = scala.collection.mutable.ArrayBuffer[String]()
        val lsn2 = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            tl.synchronized { tl += s"jobStart ${e.jobId} t=${e.time}" }
          override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            tl.synchronized { tl += s"jobEnd   ${e.jobId} t=${e.time}" }
          override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            tl.synchronized { tl += s"task     stage=${e.stageId} dur=${e.taskInfo.duration}ms" }
        }
        spark.sparkContext.addSparkListener(lsn2)
        spark.conf.set("spark.sql.ui.explainMode", "simple")
        val c0 = System.nanoTime()
        tri.agg(count(lit(1))).collect()
        val c1 = System.nanoTime()
        tri.agg(count(lit(1))).collect()
        val c2 = System.nanoTime()
        println(f"[scr]   simpleMode exec1=${(c1-c0)/1e6}%.0f exec2=${(c2-c1)/1e6}%.0f ms")
        val b0 = System.nanoTime()
        val mainT = Thread.currentThread()
        val sampler = new Thread(() => {
          (1 to 6).foreach { i =>
            Thread.sleep(120)
            val st = mainT.getStackTrace.take(14).mkString("\n      ")
            println(s"[stack $i]\n      " + st)
          }
        })
        sampler.setDaemon(true); sampler.start()
        tri.agg(count(lit(1))).collect()
        val b1 = System.nanoTime()
        Thread.sleep(300)
        println(f"[scr]   timed exec=${(b1-b0)/1e6}%.0f ms t0=${b0/1000000}")
        tl.foreach(l => println("[scr]   " + l))
        println(f"[scr]   cnt-phases analyze=${(a1-a0)/1e6}%.0f opt=${(a2-a1)/1e6}%.0f plan=${(a3-a2)/1e6}%.0f exec1=${(a4-a3)/1e6}%.0f exec2=${(a5-a4)/1e6}%.0f ms")
        spark.sparkContext.getRDDStorageInfo.foreach(i =>
          println(s"[scr]   rdd parts=${i.numCachedPartitions}/${i.numPartitions} mem=${i.memSize} name=${i.name.linesIterator.next()}"))
      }
    }
    spark.stop()
  }
}
