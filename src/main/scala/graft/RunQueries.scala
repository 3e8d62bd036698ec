package graft

/** Dev loop: run a subset of registered queries at one sf dir, dump
  * each result + its oracle SQL in the driver's Verify layout, so
  * `tools/check.py <sfDir> /tmp/xtest` replays the DuckDB compare for
  * just those ids. Usage:
  *   sbt "runMain graft.RunQueries q_mix_sample q_join_dpp"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_OUT
  * (default /tmp/xtest). */
object RunQueries {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass one or more query ids")
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = sys.env.getOrElse("SPARK_GRAFT_OUT", "/tmp/xtest")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val sqls = scala.collection.mutable.LinkedHashMap[String, String]()
    args.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$n")
      println(f"[runq] $n done in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      SparkEntry.oracleSql.get(n).foreach(sqls += n -> _)
    }
    val json = sqls.map { case (k, v) =>
      "\"" + k + "\": \"" + v.replace("\\", "\\\\")
        .replace("\"", "\\\"").replace("\n", "\\n") + "\""
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
