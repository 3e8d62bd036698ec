package graft
import org.apache.spark.sql.SparkSession

/** r17: the 4th ratio-vs-scale point (~sf1). Rolls a named id subset
  * over an arbitrary data dir with the Bench protocol's shape — same
  * warm phase (shared fixpoints, table pre-touch, format fixtures),
  * two separated full sweeps, each id charged min(pass1, pass2), the
  * timed action a bench-parity count() — WITHOUT the prepared-plan
  * memo (every pass rebuilds from the registry fn and pays the whole
  * Catalyst pipeline, which only makes the Spark side SLOWER than the
  * official protocol: conservative for a ratio claim). Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_scale10 \
  *     sbt "Test/runMain graft.ScaleRoll q_a q_b ..."
  * Prints one JSON line {"total":..,"n":..,"queries":{..}}. */
object ScaleRoll {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query ids")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_scale10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.streaming.runtime",
      org.apache.logging.log4j.Level.ERROR)
    spark.range(2000000L).selectExpr("sum(id)").collect()
    Tables.names.foreach(n =>
      try Tables.t(spark, sfDir, n) catch { case _: Throwable => () })
    try ops.Scale.warm(spark, sfDir) catch { case _: Throwable => () }
    try ops.Extras.warm(spark, sfDir) catch { case _: Throwable => () }
    Seq[(String, (SparkSession, String) => Unit)](
      "dedup" -> ops.Dedup.warmShared _,
      "graph" -> ops.Insights.warmShared _,
      "peels" -> ops.GraphScores.warmShared _,
      "daygrid" -> ops.Series.warmShared _,
      "anchor_nn" -> ops.Vector.warmShared _,
      "landmark_bfs" -> ops.Causal.warmShared _,
      "bigram_models" -> ops.Corpus.warmShared _,
      "mixture_models" -> ops.Doremi.warmShared _,
      "curate_stages" -> ops.TextOps.warmShared _,
      "quality_scores" -> ops.Learn.warmShared _,
      "kmeans" -> ops.Pipeline.warmShared _,
      "phash" -> ops.Multimodal.warmShared _).foreach { case (n, f) =>
      val t0 = System.nanoTime()
      try {
        f(spark, sfDir)
        System.err.println(
          f"[roll] warmed $n in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      } catch { case e: Throwable =>
        System.err.println(s"[roll] warm $n FAILED: ${e.getMessage}")
      }
    }
    def sweep(): Map[String, Double] = args.map { id =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(id)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[roll] $id FAILED: ${e.getMessage}")
      }
      id -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val p1 = sweep(); val p2 = sweep()
    val res = p1.map { case (k, v) => k -> math.min(v, p2(k)) }
    def f3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"total":${f3(res.values.sum)},"n":${res.size},""" +
      s""""queries":{${res.toSeq.sortBy(-_._2).map { case (k, v) =>
        "\"" + k + "\":" + f3(v) }.mkString(",")}},"sf":"$sfDir"}""")
    spark.stop()
  }
}
