package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// throwaway probe: basket_lift variants on the 10x dir
object XProbe2 {
  def main(args: Array[String]): Unit = {
    val d10 = sys.props("java.io.tmpdir") + "/graft_scale10"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000L).selectExpr("sum(id)").collect()
    def time(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // current (with localCheckpoint)
    time("with_checkpoint")(
      SparkEntry.queries("q_basket_lift")(spark, d10).count())
    // variant without checkpoint: inline copy
    def noCk(): Unit = {
      val li = Tables.t(spark, d10, "lineitem")
      val pt = Tables.t(spark, d10, "part")
      val lines = li
        .join(broadcast(pt.select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand")).distinct()
      val nOrders = Tables.t(spark, d10, "orders")
        .agg(count(lit(1)).as("n_orders"))
      val brandCounts = lines.groupBy(col("p_brand").as("bc_brand"))
        .agg(count(lit(1)).as("n_brand"))
      val pairs = lines.select(col("ok"), col("p_brand").as("ba"))
        .join(lines.select(col("ok").as("rok"), col("p_brand").as("bb")),
          col("ok") === col("rok") && col("ba") < col("bb"))
        .groupBy(col("ba"), col("bb"))
        .agg(count(lit(1)).as("n_both"))
      pairs.filter(col("n_both") >= 20)
        .join(broadcast(brandCounts).withColumnRenamed("bc_brand", "ka"),
          col("ba") === col("ka"))
        .withColumnRenamed("n_brand", "na")
        .join(broadcast(brandCounts).withColumnRenamed("bc_brand", "kb"),
          col("bb") === col("kb"))
        .withColumnRenamed("n_brand", "nb")
        .crossJoin(broadcast(nOrders))
        .select(col("ba"), col("bb"), col("n_both"),
          round(col("n_both").cast("double") * col("n_orders") /
            (col("na") * col("nb")), 6).as("lift"))
        .orderBy(col("lift").desc, col("ba"), col("bb"))
        .limit(20).count()
    }
    time("no_checkpoint")(noCk())
    time("with_checkpoint_2nd")(
      SparkEntry.queries("q_basket_lift")(spark, d10).count())
    time("no_checkpoint_2nd")(noCk())
    spark.stop()
  }
}
