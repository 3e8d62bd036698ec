package graft
import org.apache.spark.sql.SparkSession
object SizeCheck extends App {
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", 32)
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  val d = "/root/testdata/sf0.1"
  ops.Corpus.warmShared(spark, d)
  ops.Doremi.warmShared(spark, d)
  ops.Insights.warmShared(spark, d)
  val infos = spark.sparkContext.getRDDStorageInfo
  var tot = 0L
  infos.sortBy(-_.memSize).foreach { i =>
    println(f"${i.memSize/1048576.0}%9.1f MB  disk=${i.diskSize/1048576.0}%7.1f MB  ${i.name}")
    tot += i.memSize
  }
  println(f"TOTAL cached: ${tot/1048576.0}%.1f MB in ${infos.length} RDDs")
  spark.stop()
}
