import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object XProbe extends App {
  val s = SparkSession.builder().master("local[8]")
    .config("spark.sql.shuffle.partitions", 8)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()
  s.sparkContext.setLogLevel("ERROR")
  val d = "/root/testdata/sf0.1"
  val rows = graft.Tables.t(s, d, "events").select(
    when(col("event_type") === "error", 1L).otherwise(0L).as("y"),
    hour(col("ts")).cast("long").as("f_hour"),
    floor(col("value") * 100 + 0.5).cast("long").as("f_cents"))
  val stacked = rows.selectExpr(
    "stack(2, 'hour', f_hour, 'cents', f_cents) AS (feature, x)", "y")
  val grid = stacked.groupBy(col("feature"), col("x"))
    .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
  val wCum = Window.partitionBy(col("feature")).orderBy(col("x"))
    .rowsBetween(Window.unboundedPreceding, Window.currentRow)
  val wAll = Window.partitionBy(col("feature"))
    .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
  val scored = grid
    .withColumn("nl", sum(col("n")).over(wCum))
    .withColumn("pl", sum(col("pos")).over(wCum))
    .withColumn("nn", sum(col("n")).over(wAll))
    .withColumn("pp", sum(col("pos")).over(wAll))
    .filter(col("nl") < col("nn"))
    .selectExpr("feature", "x AS threshold", "nl", "pl", "nn", "pp",
      """(CAST(nl AS DOUBLE)
          - CAST(CAST(pl AS DECIMAL(38,0)) * pl
                 + CAST(nl - pl AS DECIMAL(38,0)) * (nl - pl)
              AS DOUBLE) / nl
          + CAST(nn - nl AS DOUBLE)
          - CAST(CAST(pp - pl AS DECIMAL(38,0)) * (pp - pl)
                 + CAST((nn - nl) - (pp - pl) AS DECIMAL(38,0))
                   * ((nn - nl) - (pp - pl))
              AS DOUBLE) / (nn - nl)) / nn AS gini""")
  scored.orderBy(col("gini"), col("feature"), col("threshold"))
    .limit(8).collect().foreach { r =>
      val g = r.getAs[Double]("gini")
      println(s"${r.get(0)} ${r.get(1)} nl=${r.get(2)} pl=${r.get(3)} " +
        s"nn=${r.get(4)} pp=${r.get(5)} $g ${java.lang.Double.doubleToLongBits(g).toHexString}")
    }
  s.stop()
}
