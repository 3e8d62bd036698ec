package graft
import org.apache.spark.sql.SparkSession

// throwaway probe (deleted before commit): replicate Bench's warm state,
// then time the four regressed queries and report storage usage.
object XProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000L).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).collect() catch { case _: Throwable => () }
    try ops.Scale.warm(spark, sfDir) catch { case _: Throwable => () }
    try ops.Extras.warm(spark, sfDir) catch { case _: Throwable => () }
    val warms = Seq(
      "dedup" -> (() => ops.Dedup.warmShared(spark, sfDir)),
      "graph" -> (() => ops.Insights.warmShared(spark, sfDir)),
      "peels" -> (() => ops.GraphScores.warmShared(spark, sfDir)),
      "daygrid" -> (() => ops.Series.warmShared(spark, sfDir)),
      "anchor_nn" -> (() => ops.Vector.warmShared(spark, sfDir)),
      "landmark_bfs" -> (() => ops.Causal.warmShared(spark, sfDir)),
      "bigram" -> (() => ops.Corpus.warmShared(spark, sfDir)),
      "mixture" -> (() => ops.Doremi.warmShared(spark, sfDir)),
      "curate" -> (() => ops.TextOps.warmShared(spark, sfDir)),
      "quality" -> (() => ops.Learn.warmShared(spark, sfDir)),
      "phash" -> (() => ops.Multimodal.warmShared(spark, sfDir)))
    warms.foreach { case (n, f) =>
      val t0 = System.nanoTime()
      try f() catch { case e: Throwable => println(s"warm $n FAILED: $e") }
      println(f"warm $n: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    // storage usage after warm
    val rdds = spark.sparkContext.getPersistentRDDs
    val statuses = spark.sparkContext.getExecutorMemoryStatus
    statuses.foreach { case (id, (max, rem)) =>
      println(f"executor $id: max ${max / 1e9}%.2f GB, free ${rem / 1e9}%.2f GB, used ${(max - rem) / 1e9}%.2f GB")
    }
    println(s"persistent RDDs: ${rdds.size}")
    System.gc(); Thread.sleep(1000); System.gc()
    println("gc done")
    val ids = Seq("q_agg_equidepth", "q_basket_lift", "q_embed_pca",
      "q_dedup_semantic_audit", "q_quality_calibrate", "q_quality_kappa",
      "q_mix_doremi_rounds", "q_multimodal_phash_pairs", "q_dedup_ngram")
    ids.foreach { id =>
      val t0 = System.nanoTime()
      SparkEntry.queries(id)(spark, sfDir).count()
      println(f"$id: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // second pass to separate build cost from steady-state
    ids.foreach { id =>
      val t0 = System.nanoTime()
      SparkEntry.queries(id)(spark, sfDir).count()
      println(f"$id (2nd): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
